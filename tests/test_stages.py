"""Stage-2 (SAM distillation) and stage-3 (mask field) end-to-end tests on
the synthetic scene, with the full freeze handoff from stage 1."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_tpu.config import Config, MaskTrainConfig, ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.data.synthetic import SyntheticSphereDataset
from sanerf_tpu.models import fields
from sanerf_tpu.train import checkpoints as ckpt_lib
from sanerf_tpu.train.distill import Cache, SamDistillTrainer
from sanerf_tpu.train.mask_trainer import MaskTrainer
from sanerf_tpu.train.trainer import Trainer

RC = RenderConfig(num_steps=(12, 6), bound=4.0, contract=True, max_ray_batch=4096)
MC1 = ModelConfig(field_type="mlp", prop_resolutions=(32,),
                  mlp_enc_freqs=5, mlp_field_width=48, mlp_field_depth=4,
                  mlp_prop_enc_freqs=3, mlp_prop_width=16, mlp_prop_depth=2,
                  mlp_sam_width=32, mlp_sam_depth=2, mlp_sam_feat_dim=32,
                  mlp_mask_width=32, mlp_mask_depth=2, mlp_mask_feat_dim=16,
                  sam_feat_dim=64, samvit_mlp_hidden=64)
TC = TrainConfig(iters=200, num_rays=512, adaptive_num_rays=False, save_cnt=1,
                 eval_cnt=1)


@pytest.fixture(scope="module")
def stage1(tmp_path_factory):
    """Train a tiny stage-1 model and save its checkpoint."""
    ws = str(tmp_path_factory.mktemp("s1"))
    ds = SyntheticSphereDataset(H=32, W=32, n_views=8)
    cfg = Config(workspace=ws, render=RC, model=MC1, train=TC)
    model = fields.make_model(MC1, RC)
    tr = Trainer("s1", cfg, model, workspace=ws, use_checkpoint="scratch")
    tr.train(ds, max_epoch=2, steps_per_epoch=60)
    return ws, tr.ckpt_mgr.list_checkpoints()[-1], ds


def test_cache_ring_buffer():
    c = Cache(3)
    rng = np.random.default_rng(0)
    assert not c.full()
    for i in range(5):
        c.insert(i)
    assert c.full() and len(c.data) == 3
    assert set(c.data) == {2, 3, 4}  # ring overwrote 0, 1
    assert c.get(rng) in {2, 3, 4}


def test_sam_distillation_learns(stage1):
    ws, ckpt, ds = stage1
    mc2 = dataclasses.replace(MC1, with_sam=True, sam_use_view_direction=True)
    model2 = fields.make_model(mc2, RC)
    params2 = fields.init_params(model2, jax.random.key(1))
    merged, trainable = ckpt_lib.load_partial_and_freeze(ckpt, params2)

    cfg2 = Config(
        workspace=ws + "_sam", render=RC, model=mc2,
        train=dataclasses.replace(TC, iters=80, lr=5e-3),
        sam=dataclasses.replace(Config().sam, cache_size=8, cache_interval=2,
                                online_resolution=32),
    )

    # fake teacher: fixed random projection of the downsampled render, so the
    # target is a deterministic function of the image (learnable)
    proj = np.random.default_rng(0).standard_normal((3, mc2.sam_feat_dim)).astype(np.float32) * 0.3

    def teacher(img_uint8):
        import cv2
        small = cv2.resize(img_uint8.astype(np.float32) / 255.0, (64, 64))
        return jnp.asarray(small @ proj)

    tr = SamDistillTrainer(
        "s2", cfg2, model2, teacher=teacher, workspace=cfg2.workspace,
        use_checkpoint="scratch", trainable=trainable, init_params=merged,
    )
    # record initial loss then train
    mse0 = tr.eval_feature_mse(ds, n_frames=2)
    tr.train(ds, max_epoch=2, steps_per_epoch=40)
    mse1 = tr.eval_feature_mse(ds, n_frames=2)
    assert np.isfinite(mse1)
    assert mse1 < mse0 * 0.8, f"distillation did not learn: {mse0:.4f} -> {mse1:.4f}"
    # backbone stayed frozen
    flat0 = ckpt_lib.flatten_tree(merged, "")
    flat1 = ckpt_lib.flatten_tree(tr.state.params, "")
    np.testing.assert_allclose(flat1["grid_mlp/0/w"], flat0["grid_mlp/0/w"])
    assert not np.allclose(flat1["samvit_mlp/0/w"], flat0["samvit_mlp/0/w"])


def test_mask_training_learns(stage1):
    ws, ckpt, ds = stage1
    mc3 = dataclasses.replace(MC1, with_mask=True, mask_mlp_type="default", n_inst=2)
    model3 = fields.make_model(mc3, RC)
    params3 = fields.init_params(model3, jax.random.key(2))
    merged, trainable = ckpt_lib.load_partial_and_freeze(ckpt, params3)

    cfg3 = Config(
        workspace=ws + "_mask", render=RC, model=mc3,
        train=dataclasses.replace(TC, iters=150, lr=1e-2, num_rays=512),
        mask=MaskTrainConfig(),
    )
    tr = MaskTrainer(
        "s3", cfg3, model3, workspace=cfg3.workspace, use_checkpoint="scratch",
        trainable=trainable, init_params=merged,
    )
    miou0 = tr.evaluate_mask(ds, n_frames=2)
    tr.train(ds, max_epoch=3, steps_per_epoch=50)
    miou1 = tr.evaluate_mask(ds, n_frames=2)
    assert miou1 > max(miou0, 0.6), f"mask field did not learn: {miou0:.3f} -> {miou1:.3f}"
    # density branch frozen
    flat0 = ckpt_lib.flatten_tree(merged, "")
    flat1 = ckpt_lib.flatten_tree(tr.state.params, "")
    np.testing.assert_allclose(flat1["grid_mlp/0/w"], flat0["grid_mlp/0/w"])


def test_mask_training_with_similarity_losses(stage1):
    """Mixed sampling + rgb-similarity + label-regularization paths execute
    and stay finite (the full train_mask.sh flag soup)."""
    ws, ckpt, ds = stage1
    mc3 = dataclasses.replace(MC1, with_mask=True, mask_mlp_type="default", n_inst=2)
    model3 = fields.make_model(mc3, RC)
    merged, trainable = ckpt_lib.load_partial_and_freeze(
        ckpt, fields.init_params(model3, jax.random.key(3))
    )
    cfg3 = Config(
        workspace=ws + "_mask2", render=RC, model=mc3,
        train=dataclasses.replace(TC, iters=20, num_rays=256),
        mask=MaskTrainConfig(rgb_similarity_loss_weight=1.0, rgb_similarity_iter=0,
                             mixed_sampling=True, num_local_sample=2,
                             local_sample_patch_size=4,
                             incoherent_uncertainty_weight=0.5),
    )

    # provider-style collate with local patches + incoherent masks
    class DS(SyntheticSphereDataset):
        def collate_mask(self, rng, num_rays):
            b = super().collate_mask(rng, num_rays)
            mcfg = cfg3.mask
            from sanerf_tpu.data.rays import sample_rays
            parts = [b]
            for _ in range(mcfg.num_local_sample):
                rb = sample_rays(self.poses[b["index"]], self.intrinsics,
                                 self.H, self.W, N=mcfg.local_sample_patch_size**2,
                                 patch_size=mcfg.local_sample_patch_size, rng=rng)
                parts.append({
                    "rays_o": rb.rays_o, "rays_d": rb.rays_d,
                    "masks": self.masks[b["index"]].reshape(-1)[rb.inds],
                    "inds_coarse": rb.inds_coarse,
                })
            out = {
                "rays_o": np.concatenate([p["rays_o"] for p in parts]),
                "rays_d": np.concatenate([p["rays_d"] for p in parts]),
                "masks": np.concatenate([p["masks"] for p in parts]),
                "inds_coarse": np.concatenate([p["inds_coarse"] for p in parts]),
                "index": b["index"], "H": self.H, "W": self.W,
            }
            out["incoherent_masks"] = np.zeros(len(out["masks"]), np.float32)
            return out

    ds2 = DS(H=32, W=32, n_views=4)
    tr = MaskTrainer("s3b", cfg3, model3, workspace=cfg3.workspace,
                     use_checkpoint="scratch", trainable=trainable,
                     init_params=merged)
    tr.train(ds2, max_epoch=1, steps_per_epoch=10)
    assert tr.global_step == 10
