"""Real-checkpoint fidelity smokes — SKIPPED unless the artifact exists.

This environment ships no pretrained weights; the converters are validated
against synthetic state dicts (tests/test_convert_nerf.py,
tests/test_sam_torch_parity.py). The first environment that has the real
artifacts proves end-to-end fidelity with ZERO new code by setting:

  SANERF_SAM_CKPT=/path/to/sam_vit_h_4b8939.pth   (SURVEY §7 hard part 2)
  SANERF_NERF_CKPT=/path/to/reference_trainer.pth (SURVEY §7 hard part 5)

and running `pytest tests/test_real_checkpoints.py -v`.
"""

import os

import numpy as np
import pytest

SAM_CKPT = os.environ.get("SANERF_SAM_CKPT", "")
NERF_CKPT = os.environ.get("SANERF_NERF_CKPT", "")


@pytest.mark.skipif(not os.path.isfile(SAM_CKPT),
                    reason="set SANERF_SAM_CKPT=/path/to/sam_vit_h_4b8939.pth")
def test_real_sam_checkpoint_encodes_and_decodes():
    """Convert the real ViT-H checkpoint, encode an image, decode a click."""
    import jax

    from sanerf_tpu.models.sam.convert import convert_checkpoint
    from sanerf_tpu.models.sam.predictor import SamPredictor

    cfg, params = convert_checkpoint(SAM_CKPT, "vit_h")
    sam = SamPredictor(cfg, params)
    rng = np.random.default_rng(0)
    img = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
    sam.set_image(img)
    assert sam.features.shape == (1, 64, 64, 256)
    assert np.isfinite(np.asarray(sam.features)).all()
    masks, iou, low = sam.predict(np.array([[256.0, 256.0]]),
                                  np.ones(1, np.int32),
                                  multimask_output=True)
    assert masks.shape == (3, 512, 512) and np.isfinite(iou).all()


@pytest.mark.skipif(not os.path.isfile(NERF_CKPT),
                    reason="set SANERF_NERF_CKPT=/path/to/reference .pth")
def test_real_nerf_checkpoint_converts_and_renders():
    """Convert a real reference Trainer checkpoint and render a frame with
    finite output through the hashgrid-family renderer."""
    import jax
    import jax.numpy as jnp

    from sanerf_tpu.config import ModelConfig, RenderConfig
    from sanerf_tpu.models import fields
    from sanerf_tpu.models.convert_nerf import convert_nerf_checkpoint
    from sanerf_tpu.models.renderer import render_staged

    # reference defaults: bound=128, contract, (128, 64, 32) hierarchy
    rc = RenderConfig()
    mc = ModelConfig(field_type="hashgrid")
    model = fields.make_model(mc, rc)
    params = convert_nerf_checkpoint(NERF_CKPT, model)

    rng = np.random.default_rng(1)
    ro = jnp.asarray(rng.normal(0, 0.5, (256, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1.0, (256, 3)).astype(np.float32))
    out = render_staged(model, params, ro, rd)
    img = np.asarray(out["image"])
    assert img.shape == (256, 3) and np.isfinite(img).all()
