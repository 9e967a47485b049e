"""Field models and the volume renderer."""

from sanerf_tpu.models.fields import NerfModel, init_params, make_model
from sanerf_tpu.models.renderer import default_aabb, render_rays, render_staged, run_rays
