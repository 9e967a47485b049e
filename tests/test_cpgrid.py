"""CP line-grid encoder: one-hot-matmul == gather oracle, gradients, and
the cp-augmented MLP field family end to end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.config import ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.models import fields, renderer
from sanerf_tpu.ops import cpgrid


def test_matmul_matches_gather_oracle():
    lines = cpgrid.init_lines(jax.random.key(0), res=32, rank=8)
    x = jax.random.uniform(jax.random.key(1), (512, 3), minval=-2.0,
                           maxval=2.0)
    a = cpgrid.line_features(lines, x, bound=2.0)
    b = cpgrid.line_features_ref(lines, x, bound=2.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_gather_lookup_matches_onehot_values_and_grads():
    """grid_lookup="gather" (the production training path) is the same
    function as the one-hot contraction, including table gradients and the
    multi-res ladder dispatch."""
    lines = cpgrid.init_lines(jax.random.key(4), res=48, rank=8)
    x = jax.random.uniform(jax.random.key(5), (640, 3), minval=-2.0,
                           maxval=2.0)
    a = cpgrid.line_features_gather(lines, x, bound=2.0)
    b = cpgrid.line_features(lines, x, bound=2.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)

    def grads(fn):
        return jax.grad(lambda l: jnp.sum(fn(l, x, 2.0) ** 2))(lines)

    np.testing.assert_allclose(
        np.asarray(grads(cpgrid.line_features_gather)),
        np.asarray(grads(cpgrid.line_features)), rtol=1e-4, atol=1e-5)

    ladder = cpgrid.init_lines_multi(jax.random.key(6), res=64, rank=8,
                                     levels=2)
    mg = cpgrid.line_features_multi(ladder, x, 2.0, lookup="gather")
    mo = cpgrid.line_features_multi(ladder, x, 2.0, lookup="onehot")
    np.testing.assert_allclose(np.asarray(mg), np.asarray(mo),
                               rtol=1e-5, atol=1e-6)


def test_boundary_points_and_grads():
    lines = cpgrid.init_lines(jax.random.key(0), res=16, rank=4)
    # exactly on the domain edges and grid nodes
    x = jnp.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0], [0.0, 0.0, 0.0],
                   [2.0, -2.0, 0.5]])
    out = cpgrid.line_features(lines, x, bound=2.0)
    assert np.isfinite(np.asarray(out)).all()

    # gradient wrt the tables is the transposed one-hot matmul: exact
    def loss(lines):
        return jnp.sum(cpgrid.line_features(lines, x, 2.0) ** 2)

    g = jax.grad(loss)(lines)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one touched entry
    i = int(jnp.argmax(jnp.abs(g[0, :, 0])))
    eps = 1e-3
    lp = lines.at[0, i, 0].add(eps)
    lm = lines.at[0, i, 0].add(-eps)
    fd = (loss(lp) - loss(lm)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, i, 0]), float(fd), rtol=1e-2)

    # gradient wrt positions flows through the interp weights
    gx = jax.grad(lambda q: jnp.sum(
        cpgrid.line_features(lines, q, 2.0) ** 2))(x)
    assert np.isfinite(np.asarray(gx)).all()


def test_cp_field_family_forward_and_train_step():
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_cp_rank=8, mlp_cp_res=16,
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,),
                     with_sam=True, sam_feat_dim=16, mlp_sam_width=16,
                     mlp_sam_depth=2, mlp_sam_feat_dim=16,
                     samvit_mlp_hidden=16)
    model = fields.make_model(mc, rc)
    assert model.grid_out_dim == (3 * (1 + 2 * 4)) + 8
    params = fields.init_params(model, jax.random.key(0))
    assert params["cp_lines"].shape == (3, 16, 8)

    o = jnp.zeros((64, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (64, 1))
    out = renderer.run_rays(model, params, o, d, return_feats=True)
    assert np.isfinite(np.asarray(out["image"])).all()
    assert np.isfinite(np.asarray(out["samvit"])).all()

    # cp_lines receive gradients through a real stage-1 train step
    # (stage 1 trains without the SAM head, matching the reference recipe)
    from sanerf_tpu.train import state as state_lib

    mc1 = dataclasses.replace(mc, with_sam=False)
    model1 = fields.make_model(mc1, rc)
    params1 = fields.init_params(model1, jax.random.key(0))
    tc = TrainConfig(iters=10, num_rays=64, adaptive_num_rays=False,
                     use_native_loader=False)
    state = state_lib.create_train_state(model1, tc, jax.random.key(1),
                                         params=params1)
    step = state_lib.make_rgb_train_step(model1, tc)
    batch = {"rays_o": o, "rays_d": d,
             "images": jnp.zeros((64, 3)) + 0.5}
    state2, aux = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(aux["loss"]))
    moved = np.abs(np.asarray(state2.params["cp_lines"])
                   - np.asarray(params1["cp_lines"])).max()
    assert moved > 0.0


def test_line_tv_gradient_matches_autodiff():
    lines = cpgrid.init_lines(jax.random.key(5), res=12, rank=3)
    w = 0.7

    def tv_loss(l):
        d = l[:, 1:, :] - l[:, :-1, :]
        return w * jnp.sum(d * d)

    g_auto = jax.grad(tv_loss)(lines)
    g_ours = cpgrid.grad_total_variation(lines, w)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_auto),
                               rtol=1e-6, atol=1e-7)

    # wired through the model-level dispatcher for the cp-augmented family
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_cp_rank=3, mlp_cp_res=12,
                     mlp_enc_freqs=3, mlp_field_width=16, mlp_field_depth=2,
                     prop_resolutions=(16,))
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(6))
    contrib = fields.apply_total_variation(
        model, params, jnp.zeros((8, 3)), w)
    assert set(contrib) == {"cp_lines"}
    assert contrib["cp_lines"].shape == params["cp_lines"].shape


def test_cp_fused_fast_path_matches_xla_path():
    """run_rays with cp_fused=True (fused kernels, interpret mode on CPU)
    == the XLA path for a cp-augmented model."""
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True,
                      cp_fused=True)
    rc_slow = dataclasses.replace(rc, use_fused_mlp=False)
    mc = ModelConfig(field_type="mlp", mlp_cp_rank=8, mlp_cp_res=16,
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,))
    model_f = fields.make_model(mc, rc)
    model_s = fields.make_model(mc, rc_slow)
    params = fields.init_params(model_f, jax.random.key(0))
    o = jnp.zeros((32, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jax.random.normal(jax.random.key(1), (32, 3))
    fast = renderer.run_rays(model_f, params, o, d)
    slow = renderer.run_rays(model_s, params, o, d)
    np.testing.assert_allclose(np.asarray(fast["image"]),
                               np.asarray(slow["image"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(fast["depth"]),
                               np.asarray(slow["depth"]),
                               rtol=2e-3, atol=2e-3)


def test_multires_lines_match_per_level_oracle():
    lines = cpgrid.init_lines_multi(jax.random.key(9), res=32, rank=8,
                                    levels=2)
    assert [l.shape for l in lines] == [(3, 16, 4), (3, 32, 4)]
    x = jax.random.uniform(jax.random.key(10), (256, 3), minval=-2.0,
                           maxval=2.0)
    got = cpgrid.line_features_multi(lines, x, bound=2.0)
    want = jnp.concatenate(
        [cpgrid.line_features_ref(l, x, 2.0) for l in lines], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_multires_cp_field_train_and_tv():
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_cp_rank=8, mlp_cp_res=32,
                     mlp_cp_levels=2,
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,))
    model = fields.make_model(mc, rc)
    assert model.grid_out_dim == (3 * (1 + 2 * 4)) + 8
    params = fields.init_params(model, jax.random.key(0))
    assert isinstance(params["cp_lines"], list)

    o = jnp.zeros((64, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (64, 1))
    out = renderer.run_rays(model, params, o, d)
    assert np.isfinite(np.asarray(out["image"])).all()

    contrib = fields.apply_total_variation(model, params,
                                           jnp.zeros((8, 3)), 0.5)
    assert [g.shape for g in contrib["cp_lines"]] == \
        [l.shape for l in params["cp_lines"]]

    from sanerf_tpu.train import state as state_lib
    tc = TrainConfig(iters=10, num_rays=64, adaptive_num_rays=False,
                     lambda_tv=1e-3, use_native_loader=False)
    state = state_lib.create_train_state(model, tc, jax.random.key(1),
                                         params=params)
    step = state_lib.make_rgb_train_step(model, tc)
    batch = {"rays_o": o, "rays_d": d, "images": jnp.zeros((64, 3)) + 0.5}
    state2, aux = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(aux["loss"]))
    for i, (new, old) in enumerate(zip(state2.params["cp_lines"],
                                       params["cp_lines"])):
        assert float(jnp.abs(new - old).max()) > 0.0, i


def test_multires_cp_fused_matches_xla_path():
    """cp_fused with a 2-level CP ladder (interpret mode on CPU) == the
    XLA path."""
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True,
                      cp_fused=True)
    rc_slow = dataclasses.replace(rc, use_fused_mlp=False)
    mc = ModelConfig(field_type="mlp", mlp_cp_rank=8, mlp_cp_res=32,
                     mlp_cp_levels=2,
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,))
    model_f = fields.make_model(mc, rc)
    model_s = fields.make_model(mc, rc_slow)
    params = fields.init_params(model_f, jax.random.key(0))
    o = jnp.zeros((32, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (32, 1))
    a = renderer.run_rays(model_f, params, o, d)
    b = renderer.run_rays(model_s, params, o, d)
    np.testing.assert_allclose(np.asarray(a["image"]),
                               np.asarray(b["image"]), atol=2e-3)
