"""VM plane-grid encoder: matmul+VPU reduction == gather oracle,
gradients, TV dispatch, and the vm-augmented MLP field family end to end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.config import ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.models import fields, renderer
from sanerf_tpu.ops import vmgrid


def test_vm_matches_gather_oracle():
    planes, lines = vmgrid.init_vm(jax.random.key(0), res=16, rank=6)
    x = jax.random.uniform(jax.random.key(1), (512, 3), minval=-2.0,
                           maxval=2.0)
    a = vmgrid.vm_features(planes, lines, x, bound=2.0)
    b = vmgrid.vm_features_ref(planes, lines, x, bound=2.0)
    assert a.shape == (512, 18)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_vm_mixed_line_res_matches_oracle():
    planes, lines = vmgrid.init_vm(jax.random.key(2), res=8, rank=4,
                                   line_res=32)
    x = jax.random.uniform(jax.random.key(3), (128, 3), minval=-1.5,
                           maxval=1.5)
    a = vmgrid.vm_features(planes, lines, x, bound=2.0)
    b = vmgrid.vm_features_ref(planes, lines, x, bound=2.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_vm_gather_matches_onehot_values_and_grads():
    """The production training lookup (grid_lookup="gather") is the same
    function as the one-hot contraction — values and table gradients."""
    planes, lines = vmgrid.init_vm(jax.random.key(7), res=24, rank=5,
                                   line_res=48)
    x = jax.random.uniform(jax.random.key(8), (640, 3), minval=-2.0,
                           maxval=2.0)
    a = vmgrid.vm_features_gather(planes, lines, x, bound=2.0)
    b = vmgrid.vm_features(planes, lines, x, bound=2.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        return jax.grad(
            lambda p, l: jnp.sum(fn(p, l, x, 2.0) ** 2), argnums=(0, 1)
        )(planes, lines)

    ga = loss(vmgrid.vm_features_gather)
    gb = loss(vmgrid.vm_features)
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-4, atol=1e-5)


def test_vm_boundary_points_and_grads():
    planes, lines = vmgrid.init_vm(jax.random.key(0), res=8, rank=3)
    x = jnp.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0], [0.0, 0.0, 0.0],
                   [2.0, -2.0, 0.5]])
    out = vmgrid.vm_features(planes, lines, x, bound=2.0)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.sum(vmgrid.vm_features(p, lines, x, 2.0) ** 2)

    g = jax.grad(loss)(planes)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on the most-touched plane entry
    flat = np.abs(np.asarray(g[0])).reshape(-1)
    i, j, k = np.unravel_index(int(flat.argmax()), g[0].shape)
    eps = 1e-3
    fd = (loss(planes.at[0, i, j, k].add(eps))
          - loss(planes.at[0, i, j, k].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[0, i, j, k]), float(fd), rtol=1e-2)

    gx = jax.grad(lambda q: jnp.sum(
        vmgrid.vm_features(planes, lines, q, 2.0) ** 2))(x)
    assert np.isfinite(np.asarray(gx)).all()


def test_plane_tv_gradient_matches_autodiff():
    planes, lines = vmgrid.init_vm(jax.random.key(5), res=10, rank=3)
    w = 0.7

    def tv_loss(p):
        dr = p[:, 1:, :, :] - p[:, :-1, :, :]
        dc = p[:, :, 1:, :] - p[:, :, :-1, :]
        return w * (jnp.sum(dr * dr) + jnp.sum(dc * dc))

    g_auto = jax.grad(tv_loss)(planes)
    g_ours = vmgrid.grad_total_variation_planes(planes, w)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_auto),
                               rtol=1e-6, atol=1e-7)

    # model-level dispatch covers planes AND vm lines
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_vm_rank=3, mlp_vm_res=10,
                     mlp_enc_freqs=3, mlp_field_width=16, mlp_field_depth=2,
                     prop_resolutions=(16,))
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(6))
    contrib = fields.apply_total_variation(
        model, params, jnp.zeros((8, 3)), w)
    assert set(contrib) == {"vm_planes", "vm_lines"}
    assert contrib["vm_planes"].shape == params["vm_planes"].shape
    assert contrib["vm_lines"].shape == params["vm_lines"].shape


def test_l1_sparsity_gradient_matches_autodiff():
    """apply_l1_sparsity == jax.grad of weight * mean|table| over every
    factorized table (TensoRF's L1 term), for both single- and multi-level
    grids; the hashgrid family gets no contribution (WD covers it)."""
    w = 0.3
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_vm_rank=4, mlp_vm_res=10,
                     mlp_cp_rank=6, mlp_cp_res=12, mlp_cp_levels=2,
                     mlp_enc_freqs=3, mlp_field_width=16, mlp_field_depth=2,
                     prop_resolutions=(16,))
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(7))
    tables = {k: params[k] for k in ("cp_lines", "vm_planes", "vm_lines")}

    def l1_loss(t):
        return w * sum(jnp.mean(jnp.abs(x)) for x in jax.tree.leaves(t))

    g_auto = jax.grad(l1_loss)(tables)
    g_ours = fields.apply_l1_sparsity(model, params, w)
    assert set(g_ours) == set(tables)
    for a, b in zip(jax.tree.leaves(g_auto), jax.tree.leaves(g_ours)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-8)

    hg = fields.make_model(ModelConfig(field_type="hashgrid"), rc)
    assert fields.apply_l1_sparsity(
        hg, fields.init_params(hg, jax.random.key(8)), w) == {}


def test_linresize_preserves_function_exactly_on_nested_knots():
    """R -> 2R-1 places every old knot on a new knot, so the resized
    piecewise-linear table represents the IDENTICAL continuous function:
    vm/cp features at arbitrary points are unchanged (the property that
    makes TensoRF upsampling loss-spike-free)."""
    from sanerf_tpu.ops import cpgrid

    planes, lines = vmgrid.init_vm(jax.random.key(3), res=9, rank=4)
    x = jax.random.uniform(jax.random.key(4), (257, 3), minval=-4.0,
                           maxval=4.0)
    before = vmgrid.vm_features_gather(planes, lines, x, 4.0)
    p2, l2 = vmgrid.resize_vm(planes, lines, 17)
    assert p2.shape == (3, 17, 17, 4) and l2.shape == (3, 17, 4)
    after = vmgrid.vm_features_gather(p2, l2, x, 4.0)
    np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                               rtol=1e-5, atol=1e-6)

    cl = cpgrid.init_lines(jax.random.key(5), res=9, rank=6)
    b = cpgrid.line_features_gather(cl, x, 4.0)
    a = cpgrid.line_features_gather(cpgrid.linresize(cl, 17), x, 4.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_grid_upsample_schedule_end_to_end():
    """Trainer applies grid_upsample_steps at epoch boundaries: tables
    start at final_res >> N, double through the milestones, finish at the
    configured resolution, and the loss stays finite across every
    reshape/retrace."""
    from sanerf_tpu.config import Config
    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.train import state as state_lib
    from sanerf_tpu.train.trainer import Trainer

    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True,
                      max_ray_batch=1024)
    mc = ModelConfig(field_type="mlp", mlp_cp_rank=4, mlp_cp_res=32,
                     mlp_vm_rank=4, mlp_vm_res=32,
                     mlp_enc_freqs=3, mlp_field_width=16, mlp_field_depth=4,
                     mlp_prop_enc_freqs=2, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,))
    # targets: step 0 -> 8, >=4 -> 16, >=8 -> 32
    assert state_lib.grid_upsample_targets(
        TrainConfig(grid_upsample_steps=(4, 8)), mc, 0) == {"cp": 8, "vm": 8}
    assert state_lib.grid_upsample_targets(
        TrainConfig(grid_upsample_steps=(4, 8)), mc, 5) == {"cp": 16, "vm": 16}
    assert state_lib.grid_upsample_targets(
        TrainConfig(grid_upsample_steps=(4, 8)), mc, 8) == {"cp": 32, "vm": 32}

    tc = TrainConfig(iters=12, num_rays=64, adaptive_num_rays=False,
                     grid_upsample_steps=(4, 8), eval_cnt=1, save_cnt=1,
                     use_native_loader=False)
    cfg = Config(render=rc, model=mc, train=tc)
    import tempfile

    with tempfile.TemporaryDirectory() as ws:
        model = fields.make_model(mc, rc)
        tr = Trainer("up", cfg, model, workspace=ws, use_checkpoint="scratch")
        ds = SyntheticSphereDataset(H=16, W=16, n_views=4)
        seen = []
        orig = tr._maybe_resize_grids

        def spy():
            orig()
            seen.append(fields.grid_resolutions(tr.state.params))

        tr._maybe_resize_grids = spy
        tr.train(ds, max_epoch=3, steps_per_epoch=4)
        # initial call + one per epoch; coarse -> mid -> final
        assert seen[0] == {"cp": 8, "vm": 8}, seen
        assert seen[-1] == {"cp": 32, "vm": 32}, seen
        assert {"cp": 16, "vm": 16} in seen, seen
        assert fields.grid_resolutions(tr.state.params) == {"cp": 32, "vm": 32}


def test_vm_multi_level_matches_per_level_concat():
    from sanerf_tpu.ops import cpgrid

    planes, lines = vmgrid.init_vm_multi(jax.random.key(11), res=32, rank=8,
                                         levels=2)
    assert [p.shape[1] for p in planes] == [16, 32]
    assert all(p.shape[3] == 4 for p in planes)
    x = jax.random.uniform(jax.random.key(12), (128, 3), minval=-2.0,
                           maxval=2.0)
    got = vmgrid.vm_features_multi(planes, lines, x, bound=2.0)
    want = jnp.concatenate(
        [vmgrid.vm_features_ref(p, l, x, 2.0) for p, l in zip(planes, lines)],
        axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # annealing gates the fine level off at alpha ~ 0
    w = cpgrid.anneal_level_weights(jnp.asarray(0.05), 2)
    gated = vmgrid.vm_features_multi(planes, lines, x, 2.0, level_weights=w)
    assert np.allclose(np.asarray(gated[:, 12:]), 0.0)  # fine level closed
    np.testing.assert_allclose(np.asarray(gated[:, :12]),
                               np.asarray(want[:, :12]), rtol=1e-5, atol=1e-6)


def test_vm_multi_level_field_family_end_to_end():
    """Multi-level VM through the model: init shapes, forward, TV
    contribution on list params, and a real train step (grid_lr_mult's
    masked scale must mirror the list structure)."""
    from sanerf_tpu.train import state as state_lib

    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_vm_rank=4, mlp_vm_res=16,
                     mlp_vm_levels=2, mlp_enc_freqs=3, mlp_field_width=16,
                     mlp_field_depth=2, mlp_prop_enc_freqs=3,
                     mlp_prop_width=16, mlp_prop_depth=2,
                     prop_resolutions=(16,))
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(13))
    assert isinstance(params["vm_planes"], list)
    assert [p.shape[1] for p in params["vm_planes"]] == [16, 16]  # min_res=16
    contrib = fields.apply_total_variation(model, params,
                                           jnp.zeros((8, 3)), 0.1)
    assert isinstance(contrib["vm_planes"], list)
    assert [g.shape for g in contrib["vm_planes"]] == \
        [p.shape for p in params["vm_planes"]]

    o = jnp.zeros((32, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (32, 1))
    out = renderer.run_rays(model, params, o, d)
    assert np.isfinite(np.asarray(out["image"])).all()

    tc = TrainConfig(iters=4, num_rays=32, adaptive_num_rays=False,
                     lambda_tv=1e-3, grid_lr_mult=10.0,
                     use_native_loader=False)
    st = state_lib.create_train_state(model, tc, jax.random.key(14),
                                      params=params)
    step = state_lib.make_rgb_train_step(model, tc)
    batch = {"rays_o": o, "rays_d": d,
             "images": jnp.zeros((32, 3)) + 0.5}
    before = [np.asarray(p).copy() for p in st.params["vm_planes"]]
    st, aux = step(st, batch, jax.random.key(15))
    after = [np.asarray(p) for p in st.params["vm_planes"]]
    assert np.isfinite(float(aux["loss"]))
    assert all(not np.allclose(b, a) for b, a in zip(before, after))


def test_grid_lookup_modes_agree_through_position_features():
    """auto/gather/onehot are the same function at the model level (the
    production dispatch point, fields.position_features)."""
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    base = ModelConfig(field_type="mlp", mlp_vm_rank=4, mlp_vm_res=12,
                       mlp_cp_rank=6, mlp_cp_res=16, mlp_enc_freqs=3,
                       mlp_field_width=16, mlp_field_depth=2,
                       prop_resolutions=(16,))
    x = jax.random.uniform(jax.random.key(9), (96, 3), minval=-3.0,
                           maxval=3.0)
    outs = []
    params = None
    for mode in ("auto", "gather", "onehot"):
        mc = dataclasses.replace(base, grid_lookup=mode)
        model = fields.make_model(mc, rc)
        if params is None:
            params = fields.init_params(model, jax.random.key(10))
        outs.append(np.asarray(
            fields.position_features(model, params, x)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[1], outs[2], rtol=1e-5, atol=1e-6)


def test_vm_field_family_forward_and_train_step():
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_vm_rank=4, mlp_vm_res=8,
                     mlp_cp_rank=6, mlp_cp_res=16,  # CP + VM compose
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,))
    model = fields.make_model(mc, rc)
    assert model.grid_out_dim == (3 * (1 + 2 * 4)) + 6 + 3 * 4
    params = fields.init_params(model, jax.random.key(0))
    assert params["vm_planes"].shape == (3, 8, 8, 4)
    assert params["vm_lines"].shape == (3, 8, 4)

    o = jnp.zeros((64, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (64, 1))
    out = renderer.run_rays(model, params, o, d)
    assert np.isfinite(np.asarray(out["image"])).all()

    # vm params receive gradients through a real stage-1 train step
    from sanerf_tpu.train import state as state_lib

    tc = TrainConfig(iters=10, num_rays=64, adaptive_num_rays=False,
                     lambda_l1_grid=1e-3,  # L1 wiring rides the real step
                     use_native_loader=False)
    state = state_lib.create_train_state(model, tc, jax.random.key(1),
                                         params=params)
    step = state_lib.make_rgb_train_step(model, tc)
    batch = {"rays_o": o, "rays_d": d,
             "images": jnp.zeros((64, 3)) + 0.5}
    state2, aux = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(aux["loss"]))
    for k in ("vm_planes", "vm_lines", "cp_lines"):
        moved = np.abs(np.asarray(state2.params[k])
                       - np.asarray(params[k])).max()
        assert moved > 0.0, k


def test_vm_model_excluded_from_fused_fast_path():
    """The fused kernels don't consume planes; run_rays must route VM
    models through the XLA path even with use_fused_mlp=True (the
    default) — outputs identical to an explicit use_fused_mlp=False."""
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    rc_slow = dataclasses.replace(rc, use_fused_mlp=False)
    mc = ModelConfig(field_type="mlp", mlp_vm_rank=4, mlp_vm_res=8,
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,))
    model = fields.make_model(mc, rc)
    model_slow = fields.make_model(mc, rc_slow)
    params = fields.init_params(model, jax.random.key(0))
    o = jnp.zeros((32, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (32, 1))
    a = renderer.run_rays(model, params, o, d)
    b = renderer.run_rays(model_slow, params, o, d)
    np.testing.assert_allclose(np.asarray(a["image"]),
                               np.asarray(b["image"]), atol=1e-5)


def test_grid_lr_mult_scales_table_updates_only():
    """grid_lr_mult multiplies the post-Adam step on CP/VM tables and
    leaves MLP updates untouched."""
    from sanerf_tpu.train import state as state_lib

    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_vm_rank=4, mlp_vm_res=8,
                     mlp_cp_rank=6, mlp_cp_res=16,
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,))
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(0))
    grads = jax.tree.map(jnp.ones_like, params)

    def step_sizes(mult):
        tc = TrainConfig(iters=100, grad_clip=0.0, grid_lr_mult=mult,
                         use_native_loader=False)
        tx = state_lib.make_optimizer(tc)
        upd, _ = tx.update(grads, tx.init(params), params)
        return upd

    u1, u10 = step_sizes(1.0), step_sizes(10.0)
    for k in ("cp_lines", "vm_planes", "vm_lines"):
        np.testing.assert_allclose(np.asarray(u10[k]),
                                   10.0 * np.asarray(u1[k]), rtol=1e-6)
    mlp1 = np.asarray(u1["grid_mlp"][0]["w"])
    mlp10 = np.asarray(u10["grid_mlp"][0]["w"])
    np.testing.assert_allclose(mlp10, mlp1, rtol=1e-7)


def test_vm_fused_fast_path_matches_xla_path():
    """run_rays with cp_fused=True on a CP+VM model (fused kernels,
    interpret mode on CPU) == the XLA path: the in-kernel `_vm_block`
    two-step plane contraction reproduces vmgrid.vm_features."""
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True,
                      cp_fused=True)
    rc_slow = dataclasses.replace(rc, use_fused_mlp=False)
    mc = ModelConfig(field_type="mlp", mlp_vm_rank=4, mlp_vm_res=8,
                     mlp_cp_rank=6, mlp_cp_res=16,
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


def test_vm_block_matches_vm_features_direct():
    """Direct kernel-block parity: run_tmlp with vm tables (interpret) vs
    an XLA reference MLP fed [freq, vm] features."""
    from sanerf_tpu.models.fields import position_features
    from sanerf_tpu.ops import fused_mlp_t

    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", mlp_vm_rank=3, mlp_vm_res=8,
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,))
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(3))
    x = jax.random.uniform(jax.random.key(4), (64, 3), minval=-1.9,
                           maxval=1.9)

    outT = fused_mlp_t.run_tmlp(
        x, params["grid_mlp"], mc.mlp_enc_freqs, model.bound,
        (mc.mlp_field_depth // 2,), leaky=True, block=64,
        vm_planes=params["vm_planes"], vm_lines=params["vm_lines"])

    h = position_features(model, params, x)
    ref, _ = fields.apply_skip_mlp(params["grid_mlp"], h,
                                   (mc.mlp_field_depth // 2,))
    np.testing.assert_allclose(np.asarray(outT[: ref.shape[1]].T),
                               np.asarray(ref), rtol=2e-2, atol=2e-3)


def test_vm_multi_level_fused_fast_path_matches_xla_path():
    """run_rays with cp_fused=True on a multi-level VM ladder (+ CP +
    sigma tables): the fused kernels consume the FULL ladder in-kernel
    (one `_vm_block` per level, coarse -> fine) — outputs match the XLA
    path. This is the 18.57 dB quality recipe's routing: depth-3 decoder
    over CP/VM ladders must stay on the fast path."""
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True,
                      cp_fused=True)
    rc_slow = dataclasses.replace(rc, use_fused_mlp=False)
    mc = ModelConfig(field_type="mlp", mlp_vm_rank=4, mlp_vm_res=16,
                     mlp_vm_levels=2, mlp_cp_rank=6, mlp_cp_res=16,
                     mlp_sigma_cp_rank=4, mlp_sigma_cp_res=16,
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=3,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16,
                     mlp_prop_depth=2, prop_resolutions=(16,))
    model_f = fields.make_model(mc, rc)
    model_s = fields.make_model(mc, rc_slow)
    params = fields.init_params(model_f, jax.random.key(7))
    assert isinstance(params["vm_planes"], list)
    o = jnp.zeros((32, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (32, 1))
    a = renderer.run_rays(model_f, params, o, d)
    b = renderer.run_rays(model_s, params, o, d)
    np.testing.assert_allclose(np.asarray(a["image"]),
                               np.asarray(b["image"]), atol=2e-3)
    # feature frames exercise the non-epilogue fused path too
    a = renderer.run_rays(model_f, params, o, d, return_feats=False)
    b = renderer.run_rays(model_s, params, o, d, return_feats=False)
    np.testing.assert_allclose(np.asarray(a["depth"]),
                               np.asarray(b["depth"]), atol=2e-3)


def test_grid_vmem_budget_guards_fused_path():
    """Models whose factorized tables exceed RenderConfig.grid_vmem_budget
    must NOT take the fused fast path even with cp_fused=True (the kernels
    pin tables in ~16 MB/core VMEM; oversized models route to the XLA
    lookup). grid_table_bytes accounts ladders level-by-level."""
    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True,
                      cp_fused=True)
    big = ModelConfig(field_type="mlp", mlp_vm_rank=32, mlp_vm_res=1024,
                      mlp_vm_levels=4, mlp_enc_freqs=4, mlp_field_width=32,
                      mlp_field_depth=3, mlp_prop_enc_freqs=3,
                      mlp_prop_width=16, mlp_prop_depth=2,
                      prop_resolutions=(16,))
    small = dataclasses.replace(big, mlp_vm_res=32)
    m_big = fields.make_model(big, rc)
    m_small = fields.make_model(small, rc)
    # finest level alone: 3 * (1024^2 + 1024) * 8 * 2B > 48 MB
    assert m_big.grid_table_bytes > 6 * 2 ** 20
    assert m_small.grid_table_bytes <= 6 * 2 ** 20
    # routing: the big model's fused render must equal the XLA path
    # because it IS the XLA path (and not crash trying to pin 48 MB)
    params = fields.init_params(m_big, jax.random.key(0))
    o = jnp.zeros((16, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (16, 1))
    a = renderer.run_rays(m_big, params, o, d)
    b = renderer.run_rays(
        fields.make_model(
            big, dataclasses.replace(rc, use_fused_mlp=False)),
        params, o, d)
    np.testing.assert_array_equal(np.asarray(a["image"]),
                                  np.asarray(b["image"]))
