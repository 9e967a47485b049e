"""Direct-density sigma grids (TensoRF §4.1): the component-sum of
dedicated CP/VM tables adds straight into the density logit — no MLP in
the sigma path. Covers the logit math, gradient flow, regularizer/lr/
upsample integration, fast-path routing, and the trainer end to end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.config import ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.models import fields, renderer
from sanerf_tpu.ops import cpgrid, vmgrid

RC = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True,
                  max_ray_batch=1024)
MC = ModelConfig(field_type="mlp", mlp_sigma_cp_rank=6, mlp_sigma_cp_res=24,
                 mlp_sigma_vm_rank=3, mlp_sigma_vm_res=16,
                 mlp_enc_freqs=3, mlp_field_width=16, mlp_field_depth=4,
                 mlp_prop_enc_freqs=2, mlp_prop_width=16, mlp_prop_depth=2,
                 prop_resolutions=(16,))


def _model(mc=MC):
    return fields.make_model(mc, RC)


def test_sigma_grid_logit_matches_component_sum():
    """sigma_grid_logit == sum of CP products + sum of VM mode features,
    computed against the gather oracles."""
    model = _model()
    params = fields.init_params(model, jax.random.key(0))
    assert params["sigma_cp_lines"].shape == (3, 24, 6)
    assert params["sigma_vm_planes"].shape == (3, 16, 16, 3)
    x = jax.random.uniform(jax.random.key(1), (257, 3), minval=-4.0,
                           maxval=4.0)
    got = fields.sigma_grid_logit(model, params, x)
    want = (jnp.sum(cpgrid.line_features_ref(
                params["sigma_cp_lines"], x, model.bound), axis=-1)
            + jnp.sum(vmgrid.vm_features_ref(
                params["sigma_vm_planes"], params["sigma_vm_lines"], x,
                model.bound), axis=-1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sigma_adds_to_density_logit():
    """common_forward's sigma equals activation(mlp_head + grid_sum); with
    the tables zeroed it reduces to the grid-free density."""
    model = _model()
    params = fields.init_params(model, jax.random.key(2))
    x = jax.random.uniform(jax.random.key(3), (64, 3), minval=-2.0,
                           maxval=2.0)
    sigma, _, _, _ = fields.common_forward(model, params, x)

    zeroed = dict(params)
    zeroed["sigma_cp_lines"] = jnp.zeros_like(params["sigma_cp_lines"])
    zeroed["sigma_vm_planes"] = jnp.zeros_like(params["sigma_vm_planes"])
    zeroed["sigma_vm_lines"] = jnp.zeros_like(params["sigma_vm_lines"])
    sigma0, _, _, _ = fields.common_forward(model, zeroed, x)

    sg = fields.sigma_grid_logit(model, params, x)
    assert float(jnp.max(jnp.abs(sg))) > 0
    # invert the shifted softplus via its logit recovery is overkill —
    # instead check against an explicit recomposition
    f, _ = fields.apply_skip_mlp(
        params["grid_mlp"],
        fields.position_features(model, params, x,
                                 dtype=params["grid_mlp"][0]["w"].dtype),
        (model.cfg.mlp_field_depth // 2,), False)
    want = fields.density_activation(model, f[..., 0] + sg)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    want0 = fields.density_activation(model, f[..., 0])
    np.testing.assert_allclose(np.asarray(sigma0), np.asarray(want0),
                               rtol=1e-5, atol=1e-6)


def test_sigma_tables_receive_gradient():
    model = _model()
    params = fields.init_params(model, jax.random.key(4))
    x = jax.random.uniform(jax.random.key(5), (128, 3), minval=-2.0,
                           maxval=2.0)

    def loss(p):
        sigma, _, _, _ = fields.common_forward(model, p, x)
        return jnp.mean(sigma)

    g = jax.grad(loss)(params)
    for k in ("sigma_cp_lines", "sigma_vm_planes", "sigma_vm_lines"):
        assert float(jnp.max(jnp.abs(g[k]))) > 0, k


def test_sigma_tables_in_regularizers_and_lr_mask():
    from sanerf_tpu.train import state as state_lib

    model = _model()
    params = fields.init_params(model, jax.random.key(6))
    x01 = jax.random.uniform(jax.random.key(7), (32, 3))
    tv = fields.apply_total_variation(model, params, x01, 1e-3)
    l1 = fields.apply_l1_sparsity(model, params, 1e-4)
    for k in ("sigma_cp_lines", "sigma_vm_planes", "sigma_vm_lines"):
        assert k in tv and tv[k].shape == params[k].shape
        assert k in l1 and l1[k].shape == params[k].shape
        assert k in state_lib.GRID_LR_KEYS
    # TV gradient matches autodiff of the explicit TV loss on the CP table
    def tv_loss(t):
        d = t[:, 1:, :] - t[:, :-1, :]
        return 1e-3 * jnp.sum(d * d)

    np.testing.assert_allclose(
        np.asarray(tv["sigma_cp_lines"]),
        np.asarray(jax.grad(tv_loss)(params["sigma_cp_lines"])),
        rtol=1e-5, atol=1e-7)


def test_sigma_tables_follow_upsample_schedule():
    from sanerf_tpu.train import state as state_lib

    tc = TrainConfig(grid_upsample_steps=(10, 20))
    assert state_lib.grid_upsample_targets(tc, MC, 0) == {
        "sigma_cp": 8, "sigma_vm": 8}
    assert state_lib.grid_upsample_targets(tc, MC, 25) == {
        "sigma_cp": 24, "sigma_vm": 16}

    model = _model()
    params = fields.init_params(model, jax.random.key(8))
    x = jax.random.uniform(jax.random.key(9), (129, 3), minval=-4.0,
                           maxval=4.0)
    before = fields.sigma_grid_logit(model, params, x)
    up = fields.resize_grid_tables(model, params,
                                   {"sigma_cp": 47, "sigma_vm": 31})
    assert fields.grid_resolutions(up) == {"sigma_cp": 47, "sigma_vm": 31}
    after = fields.sigma_grid_logit(model, up, x)
    # 24 -> 47 and 16 -> 31 nest the old knots: identical function
    np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                               rtol=1e-5, atol=1e-6)


def test_sigma_grid_model_renders_identically_with_use_fused_mlp():
    """Routing: sigma-grid models are excluded from the fused fast path
    (the kernels don't consume sigma tables yet), so use_fused_mlp=True
    must give IDENTICAL output — same-path, not tolerance, parity."""
    model = _model()
    params = fields.init_params(model, jax.random.key(10))
    n = 64
    rays_o = jnp.zeros((n, 3)).at[:, 2].set(-3.0)
    z = jax.random.normal(jax.random.key(11), (n, 3)) * 0.1
    rays_d = (z + jnp.array([0.0, 0.0, 1.0]))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    out_a = renderer.run_rays(model, params, rays_o, rays_d)
    fast_rc = dataclasses.replace(RC, use_fused_mlp=True)
    model_b = fields.make_model(MC, fast_rc)
    out_b = renderer.run_rays(model_b, params, rays_o, rays_d)
    np.testing.assert_array_equal(np.asarray(out_a["image"]),
                                  np.asarray(out_b["image"]))


def test_sigma_fused_fast_path_matches_xla_path():
    """run_rays with cp_fused=True routes sigma-grid models through the
    fused kernels (in-kernel _sigma_block, interpret mode on CPU) and must
    match the XLA path — both the direct run_tmlp kernel and the composite
    epilogue (last_bt) consume the sigma sum."""
    rc = dataclasses.replace(RC, cp_fused=True)
    rc_slow = dataclasses.replace(RC, use_fused_mlp=False)
    # cover sigma WITH appearance grids (operand ordering) and without
    for mc in (MC,
               dataclasses.replace(MC, mlp_cp_rank=8, mlp_cp_res=16,
                                   mlp_vm_rank=2, mlp_vm_res=8)):
        model_f = fields.make_model(mc, rc)
        model_s = fields.make_model(mc, rc_slow)
        params = fields.init_params(model_f, jax.random.key(12))
        o = jnp.zeros((32, 3)) + jnp.array([0.0, 0.0, 2.0])
        d = jax.random.normal(jax.random.key(13), (32, 3))
        fast = renderer.run_rays(model_f, params, o, d)
        slow = renderer.run_rays(model_s, params, o, d)
        np.testing.assert_allclose(np.asarray(fast["image"]),
                                   np.asarray(slow["image"]),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(fast["depth"]),
                                   np.asarray(slow["depth"]),
                                   rtol=2e-3, atol=2e-3)


def test_sigma_grid_trains_end_to_end():
    """Trainer smoke with sigma grids + upsample schedule: finite loss,
    tables move, checkpoint round-trips."""
    import tempfile

    from sanerf_tpu.config import Config
    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.train.trainer import Trainer

    tc = TrainConfig(iters=8, num_rays=64, adaptive_num_rays=False,
                     grid_upsample_steps=(4,), lambda_tv=1e-4,
                     lambda_l1_grid=1e-5, eval_cnt=1, save_cnt=1,
                     use_native_loader=False)
    cfg = Config(render=RC, model=MC, train=tc)
    with tempfile.TemporaryDirectory() as ws:
        model = _model()
        tr = Trainer("sg", cfg, model, workspace=ws, use_checkpoint="scratch")
        init_cp = np.asarray(tr.state.params.get("sigma_cp_lines",
                                                 jnp.zeros(1))).copy()
        ds = SyntheticSphereDataset(H=16, W=16, n_views=4)
        tr.train(ds, max_epoch=2, steps_per_epoch=4)
        res = fields.grid_resolutions(tr.state.params)
        assert res["sigma_cp"] == 24 and res["sigma_vm"] == 16
        moved = np.abs(np.asarray(tr.state.params["sigma_cp_lines"])).max()
        assert np.isfinite(moved)
        tr2 = Trainer("sg", cfg, model, workspace=ws, use_checkpoint="latest")
        assert fields.grid_resolutions(tr2.state.params) == res
