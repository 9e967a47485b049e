"""Coarse-to-fine encode annealing (TrainConfig.anneal_iters, BARF-style).

The reference has no annealing; this is a TPU-rebuild addition targeting
the measured held-out failure of coordinate/grid fields on sparse views
(README quality-gate table: 18.4 dB train vs 13.4 dB held-out for bare
CP). Contract under test: at alpha=1 — and on every path that never
injects `enc_alpha` (eval, fused inference) — outputs are IDENTICAL to
the un-annealed encode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.config import ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.models import fields
from sanerf_tpu.ops import cpgrid
from sanerf_tpu.ops.freq import anneal_band_weights, freq_encode
from sanerf_tpu.train import state as state_lib


def test_band_weights_schedule():
    w = np.asarray(anneal_band_weights(jnp.asarray(1.0), 6))
    np.testing.assert_allclose(w, np.ones(6))
    w0 = np.asarray(anneal_band_weights(jnp.asarray(0.0), 6))
    np.testing.assert_allclose(w0, np.zeros(6))
    # half-open: monotone non-increasing over bands, in [0, 1]
    wh = np.asarray(anneal_band_weights(jnp.asarray(0.5), 6))
    assert (np.diff(wh) <= 1e-6).all() and wh.min() >= 0 and wh.max() <= 1
    assert wh[0] == 1.0 and wh[-1] == 0.0


def test_freq_encode_weighted_matches_unweighted_at_alpha_1():
    x = jax.random.normal(jax.random.key(0), (64, 3))
    a = freq_encode(x, 5)
    b = freq_encode(x, 5, band_weights=anneal_band_weights(jnp.asarray(1.0), 5))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # alpha=0 zeroes every sin/cos column, keeps the identity passthrough
    c = np.asarray(freq_encode(
        x, 5, band_weights=anneal_band_weights(jnp.asarray(0.0), 5)))
    np.testing.assert_allclose(c[:, :3], np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(c[:, 3:], 0.0, atol=1e-7)


def test_level_weights_schedule():
    w = np.asarray(cpgrid.anneal_level_weights(jnp.asarray(1.0), 4))
    np.testing.assert_allclose(w, np.ones(4))
    w0 = np.asarray(cpgrid.anneal_level_weights(jnp.asarray(0.0), 4))
    np.testing.assert_allclose(w0, [1.0, 0.0, 0.0, 0.0])  # coarsest stays on


def _tiny(anneal_iters, cp_levels=2):
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_cp_rank=8, mlp_cp_res=32,
                     mlp_cp_levels=cp_levels, mlp_enc_freqs=4,
                     mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,),
                     with_sam=False)
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(0))
    tc = TrainConfig(iters=10, num_rays=64, adaptive_num_rays=False,
                     anneal_iters=anneal_iters, use_native_loader=False)
    return model, params, tc


def test_position_features_alpha_1_is_identity():
    model, params, _ = _tiny(anneal_iters=0)
    x = jax.random.uniform(jax.random.key(1), (128, 3), minval=-2.0,
                           maxval=2.0)
    base = fields.position_features(model, params, x)
    full = fields.position_features(
        model, {**params, "enc_alpha": jnp.asarray(1.0)}, x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(full),
                               rtol=1e-6, atol=1e-6)
    # alpha early in training: fine CP level and high PE bands are gated
    early = np.asarray(fields.position_features(
        model, {**params, "enc_alpha": jnp.asarray(0.25)}, x))
    assert not np.allclose(early, np.asarray(base))
    F = 3 * (1 + 2 * model.cfg.mlp_enc_freqs)
    np.testing.assert_allclose(early[:, F - 6 :F], 0.0, atol=1e-7)  # top band
    np.testing.assert_allclose(early[:, -4:], 0.0, atol=1e-7)  # finest level


def test_annealed_train_step_runs_and_grids_update():
    model, params, tc = _tiny(anneal_iters=8)
    state = state_lib.create_train_state(model, tc, jax.random.key(1),
                                         params=params)
    step = state_lib.make_rgb_train_step(model, tc)
    o = jnp.zeros((64, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (64, 1))
    batch = {"rays_o": o, "rays_d": d, "images": jnp.zeros((64, 3)) + 0.5}
    for i in range(3):
        state, aux = step(state, batch, jax.random.key(2 + i))
        assert np.isfinite(float(aux["loss"]))
    # the coarse CP level trains from step 0; params never gain the alpha key
    assert "enc_alpha" not in state.params
    moved = np.abs(np.asarray(state.params["cp_lines"][0])
                   - np.asarray(params["cp_lines"][0])).max()
    assert moved > 0.0


def test_anneal_past_schedule_matches_plain_step():
    """At step >= anneal_iters the injected alpha is exactly 1.0, so the
    loss equals the un-annealed loss bit-for-bit."""
    model, params, tc = _tiny(anneal_iters=5)
    o = jnp.zeros((32, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (32, 1))
    batch = {"rays_o": o, "rays_d": d, "images": jnp.zeros((32, 3)) + 0.5}
    gt = batch["images"]
    key = jax.random.key(7)
    loss_plain, _ = state_lib.rgb_loss_fn(
        model, tc, params, batch, gt, jnp.ones(()), key, True)
    loss_a1, _ = state_lib.rgb_loss_fn(
        model, tc, params, batch, gt, jnp.ones(()), key, True,
        enc_alpha=jnp.asarray(1.0))
    np.testing.assert_allclose(float(loss_plain), float(loss_a1), rtol=1e-6)
