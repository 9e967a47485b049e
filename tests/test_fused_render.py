"""Parity tests: fused Pallas render pipeline vs the XLA run_rays path.

The fused pipeline (ops/fused_render.py) must reproduce the inference
semantics of models/renderer.py:run_rays (training=False, perturb=False)
— same proposal resampling, contraction, field MLP, compositing, and view
branch. Runs in Pallas interpret mode on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_tpu.config import ModelConfig, RenderConfig
from sanerf_tpu.models import fields, renderer
from sanerf_tpu.ops import sample_pdf
from sanerf_tpu.ops.fused_render import FusedRenderer, _resample


def _small_model(num_steps=(16, 8, 4)):
    rc = RenderConfig(num_steps=num_steps, bound=4.0, contract=True)
    mc = ModelConfig(
        field_type="mlp",
        mlp_field_width=32, mlp_field_depth=4,
        mlp_prop_width=16, mlp_prop_depth=2,
        mlp_enc_freqs=4, mlp_prop_enc_freqs=3,
    )
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(0))
    return model, params


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    rays_d = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-9
    # look roughly at the origin so rays traverse density
    rays_d = (-rays_o + 0.3 * rays_d).astype(np.float32)
    return jnp.asarray(rays_o), jnp.asarray(rays_d)


def test_resample_matches_sample_pdf():
    rng = np.random.default_rng(1)
    R, T0, K = 16, 16, 9
    bins = np.sort(rng.uniform(0, 1, (R, T0 + 1)), axis=1).astype(np.float32)
    bins[:, 0], bins[:, -1] = 0.0, 1.0
    weights = rng.uniform(0, 1, (R, T0)).astype(np.float32)
    weights[3] = 0.0  # degenerate ray
    ref = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), K, None)
    got = _resample(jnp.asarray(weights), jnp.asarray(bins), K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_resample_uniform_prev():
    rng = np.random.default_rng(2)
    R, T0, K = 8, 16, 9
    bins = np.broadcast_to(np.linspace(0, 1, T0 + 1, dtype=np.float32),
                           (R, T0 + 1))
    weights = rng.uniform(0, 1, (R, T0)).astype(np.float32)
    ref = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), K, None)
    got = _resample(jnp.asarray(weights), None, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_steps", [(16, 8, 4), (16, 4), (8,)])
def test_fused_matches_run_rays(num_steps):
    model, params = _small_model(num_steps)
    rays_o, rays_d = _rays(24)

    ref = renderer.run_rays(model, params, rays_o, rays_d, bg_color=1.0)
    fr = FusedRenderer(model, params, bg_color=1.0, blocks=(8,) * len(num_steps))
    got = fr(rays_o, rays_d)

    np.testing.assert_allclose(np.asarray(got["weights_sum"]),
                               np.asarray(ref["weights_sum"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["image"]),
                               np.asarray(ref["image"]), rtol=2e-3, atol=2e-3)


def test_fused_bf16_params_close():
    model, params = _small_model((16, 8, 4))
    bf = fields.cast_params(params, jnp.bfloat16)
    rays_o, rays_d = _rays(16, seed=3)
    ref = renderer.run_rays(model, bf, rays_o, rays_d, bg_color=1.0)
    fr = FusedRenderer(model, bf, bg_color=1.0, blocks=(8, 8, 8))
    got = fr(rays_o, rays_d)
    np.testing.assert_allclose(np.asarray(got["image"]),
                               np.asarray(ref["image"]), rtol=0.05, atol=0.05)


def test_fused_pads_ray_count():
    model, params = _small_model((8, 4))
    rays_o, rays_d = _rays(13, seed=4)  # not a multiple of any block
    fr = FusedRenderer(model, params, blocks=(8, 8))
    got = fr(rays_o, rays_d)
    assert got["image"].shape == (13, 3)
    assert got["depth"].shape == (13,)
    assert np.isfinite(np.asarray(got["image"])).all()
