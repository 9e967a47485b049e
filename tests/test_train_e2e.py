"""End-to-end training tests: synthetic-scene convergence, checkpoint
resume, and the stage handoff (partial load + freeze)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.data.synthetic import SyntheticSphereDataset
from sanerf_tpu.models import fields, renderer
from sanerf_tpu.train import checkpoints as ckpt_lib
from sanerf_tpu.train import state as state_lib
from sanerf_tpu.train.trainer import Trainer

RC = RenderConfig(num_steps=(16, 8), bound=4.0, contract=True, max_ray_batch=2048)
MC = ModelConfig(
    field_type="hashgrid",
    grid_num_levels=8, grid_log2_hashmap=13, grid_desired_resolution=128,
    prop_num_levels=4, prop_log2_hashmap=10, prop_resolutions=(64,),
)
MC_MLP = ModelConfig(
    field_type="mlp", prop_resolutions=(64,),
    mlp_enc_freqs=6, mlp_field_width=64, mlp_field_depth=4,
    mlp_prop_enc_freqs=4, mlp_prop_width=32, mlp_prop_depth=2,
)
TC = TrainConfig(iters=300, lr=1e-2, num_rays=1024, adaptive_num_rays=False,
                 lambda_distort=0.01)


@pytest.fixture(scope="module")
def sphere_ds():
    return SyntheticSphereDataset(H=48, W=48, n_views=12)


@pytest.mark.parametrize("mc", [MC, MC_MLP], ids=["hashgrid", "mlp"])
def test_rgb_training_converges(mc, sphere_ds):
    """A tiny NeRF must learn the synthetic sphere: PSNR after 400 steps
    clearly above the initial render (SURVEY.md §4 convergence gate). The
    two-ring fixture is harder than a single ring; the tiny test models
    reach ~16-20 dB in 400 steps."""
    model = fields.make_model(mc, RC)
    params = fields.init_params(model, jax.random.key(0))
    state = state_lib.create_train_state(model, TC, jax.random.key(0), params=params)
    step_fn = state_lib.make_rgb_train_step(model, TC)

    rng = np.random.default_rng(0)
    key = jax.random.key(1)

    def eval_psnr(p):
        frame = sphere_ds.frame(0)
        out = renderer.render_staged(
            model, p, jnp.asarray(frame["rays_o"]), jnp.asarray(frame["rays_d"]),
            cam_near_far=jnp.asarray(frame["cam_near_far"]),
        )
        mse = float(jnp.mean((out["image"] - jnp.asarray(frame["images"])) ** 2))
        return -10 * np.log10(mse)

    psnr0 = eval_psnr(state.params)
    aux = None
    for i in range(400):
        batch = sphere_ds.collate_train(rng, TC.num_rays)
        key, sub = jax.random.split(key)
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if isinstance(v, np.ndarray)}
        state, aux = step_fn(state, dev_batch, sub,
                             update_proposal=state_lib.update_proposal_now(TC, i))
    psnr1 = eval_psnr(state.params)
    assert np.isfinite(float(aux["loss"]))
    assert psnr1 > psnr0 + 5.0, f"no convergence: {psnr0:.2f} -> {psnr1:.2f}"
    assert psnr1 > 15.0, f"final PSNR too low: {psnr1:.2f}"


def test_trainer_loop_and_checkpoint_resume(tmp_path, sphere_ds):
    cfg = Config(workspace=str(tmp_path / "ws"), render=RC, model=MC,
                 train=dataclasses.replace(TC, iters=60, save_cnt=2, eval_cnt=1,
                                           num_rays=512))
    model = fields.make_model(MC, RC)
    tr = Trainer("t", cfg, model, workspace=cfg.workspace, use_checkpoint="scratch")
    tr.train(sphere_ds, valid_dataset=None, max_epoch=2, steps_per_epoch=30)
    assert tr.global_step == 60
    ckpts = tr.ckpt_mgr.list_checkpoints()
    assert len(ckpts) >= 1

    # resume in a fresh trainer
    tr2 = Trainer("t", cfg, model, workspace=cfg.workspace, use_checkpoint="latest")
    assert tr2.global_step == 60
    # params actually restored
    a = jax.tree.leaves(tr.state.params)[0]
    b = jax.tree.leaves(tr2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_rolling_retention(tmp_path):
    model = fields.make_model(MC, RC)
    params = fields.init_params(model, jax.random.key(0))
    mgr = ckpt_lib.CheckpointManager(str(tmp_path), "x", max_keep=2)
    for s in range(5):
        mgr.save(s, params, full=False)
    assert len(mgr.list_checkpoints()) == 2
    assert "step00000004" in mgr.list_checkpoints()[-1]


def test_partial_load_and_freeze(tmp_path):
    """Stage handoff: stage-1 params load into a with_sam model; loaded
    leaves are frozen, new heads train (main.py:255-262 semantics)."""
    model1 = fields.make_model(MC, RC)
    params1 = fields.init_params(model1, jax.random.key(0))
    mgr = ckpt_lib.CheckpointManager(str(tmp_path), "s1", max_keep=2)
    path = mgr.save(100, params1, full=False)

    mc2 = dataclasses.replace(MC, with_sam=True, sam_use_view_direction=True,
                              s_grid_num_levels=4, s_grid_log2_hashmap=10,
                              s_grid_desired_resolution=64)
    model2 = fields.make_model(mc2, RC)
    params2 = fields.init_params(model2, jax.random.key(1))
    merged, trainable = ckpt_lib.load_partial_and_freeze(path, params2)

    # grid weights came from stage 1
    np.testing.assert_allclose(np.asarray(merged["grid"]), np.asarray(params1["grid"]))
    # frozen exactly where loaded
    assert trainable["grid"] is False
    assert trainable["grid_mlp"][0]["w"] is False
    assert trainable["s_grid"] is True
    assert trainable["samvit_mlp"][0]["w"] is True

    # masked optimizer keeps frozen params fixed
    tc = dataclasses.replace(TC, iters=10)
    state = state_lib.create_train_state(model2, tc, jax.random.key(2),
                                         params=merged, trainable=trainable)
    tx = state_lib.make_optimizer(tc, trainable)
    grads = jax.tree.map(jnp.ones_like, merged)
    updates, _ = tx.update(grads, state.opt_state, merged)
    assert float(jnp.sum(jnp.abs(updates["grid"]))) == 0.0
    assert float(jnp.sum(jnp.abs(updates["s_grid"]))) > 0.0


def test_flatten_roundtrip():
    model = fields.make_model(MC, RC)
    params = fields.init_params(model, jax.random.key(0))
    flat = ckpt_lib.flatten_tree(params, "params/")
    zeros = jax.tree.map(jnp.zeros_like, params)
    back = ckpt_lib.unflatten_like(zeros, flat, "params/")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
