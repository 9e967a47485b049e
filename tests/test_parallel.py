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
    from jax.experimental.shard_map import shard_map

    def shard_grads(params, batch):
        def loss_fn(p):
            out = renderer.run_rays(model, p, batch["rays_o"], batch["rays_d"],
                                    training=True, perturb=False)
            return jnp.mean((out["image"] - batch["images"]) ** 2)
        return jax.lax.pmean(jax.grad(loss_fn)(params), "data")

    spec = {k: P("data") for k in dev}
    g_dp = jax.jit(shard_map(shard_grads, mesh=mesh, in_specs=(P(), spec),
                             out_specs=P(), check_rep=False))(params, dev)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


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
