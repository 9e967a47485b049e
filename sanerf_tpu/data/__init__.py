"""Data providers: rays, synthetic fixtures, COLMAP/LLFF/LERF loaders."""

from sanerf_tpu.data.rays import RayBatch, full_frame_rays, get_incoherent_mask, sample_rays
from sanerf_tpu.data.synthetic import SyntheticSphereDataset, ray_sphere_shade
