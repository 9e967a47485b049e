"""Open-vocabulary segmentation (the X-Decoder-capability module):
relevancy math, text-encoder plumbing, and an end-to-end language-field
distillation + text-query test on the synthetic scene."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_tpu.apps.open_vocab import (
    LangDistillTrainer,
    PrecomputedTextEncoder,
    make_region_teacher,
    relevancy,
    text_query_mask,
)
from sanerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.data.synthetic import SyntheticSphereDataset
from sanerf_tpu.models import fields
from sanerf_tpu.models.renderer import run_rays
from sanerf_tpu.train import checkpoints as ckpt_lib
from sanerf_tpu.train.trainer import Trainer

RC = RenderConfig(num_steps=(12, 6), bound=4.0, contract=True,
                  max_ray_batch=4096)
MC1 = ModelConfig(field_type="mlp", prop_resolutions=(32,),
                  mlp_enc_freqs=5, mlp_field_width=48, mlp_field_depth=4,
                  mlp_prop_enc_freqs=3, mlp_prop_width=16, mlp_prop_depth=2,
                  mlp_sam_width=32, mlp_sam_depth=2, mlp_sam_feat_dim=16,
                  sam_feat_dim=8, samvit_mlp_hidden=32)
TC = TrainConfig(iters=200, num_rays=512, adaptive_num_rays=False,
                 save_cnt=1, eval_cnt=1)


def test_relevancy_orders_and_bounds():
    d = 8
    rng = np.random.default_rng(0)
    text = rng.standard_normal(d).astype(np.float32)
    text /= np.linalg.norm(text)
    negs = rng.standard_normal((3, d)).astype(np.float32)
    negs /= np.linalg.norm(negs, axis=-1, keepdims=True)
    # a feature equal to the text embedding wins against every negative
    feats = np.stack([text, negs[0], rng.standard_normal(d).astype(np.float32)])
    rel = np.asarray(relevancy(jnp.asarray(feats), jnp.asarray(text),
                               jnp.asarray(negs)))
    assert rel.shape == (3,)
    assert np.all((rel > 0) & (rel < 1))
    assert rel[0] > 0.5          # the query itself is relevant
    assert rel[1] < 0.5          # a canonical negative is not
    assert rel[0] > rel[2] > rel[1] or rel[2] <= rel[1]

    # any leading shape works (maps)
    grid = np.tile(text, (4, 5, 1))
    relmap = np.asarray(relevancy(jnp.asarray(grid), jnp.asarray(text),
                                  jnp.asarray(negs)))
    assert relmap.shape == (4, 5) and np.all(relmap > 0.5)


def test_precomputed_text_encoder(tmp_path):
    d = 8
    rng = np.random.default_rng(1)
    table = {"a chair": rng.standard_normal(d).astype(np.float32),
             "object": rng.standard_normal(d).astype(np.float32)}
    path = tmp_path / "vocab.npz"
    np.savez(path, **table)
    enc = PrecomputedTextEncoder(str(path))
    out = enc.encode(["A Chair ", "object"])  # normalization + case folding
    assert out.shape == (2, d)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    with pytest.raises(KeyError):
        enc.encode(["a banana"])


def test_text_query_mask_plain_path():
    d = 8
    rng = np.random.default_rng(2)
    vocab = rng.standard_normal((2, d)).astype(np.float32)
    vocab /= np.linalg.norm(vocab, axis=-1, keepdims=True)
    fmap = np.tile(vocab[0], (6, 6, 1)).astype(np.float32)
    fmap[2:4, 2:4] = vocab[1]  # a 2x2 "object" region
    mask, rel, peak = text_query_mask(
        jnp.asarray(fmap), jnp.asarray(vocab[1]),
        negatives=jnp.asarray(vocab[:1]))
    assert mask.shape == (6, 6)
    assert mask[2:4, 2:4].all() and mask.sum() == 4
    assert 2 <= peak[0] < 4 and 2 <= peak[1] < 4


@pytest.fixture(scope="module")
def stage1(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("ov_s1"))
    ds = SyntheticSphereDataset(H=32, W=32, n_views=8)
    cfg = Config(workspace=ws, render=RC, model=MC1, train=TC)
    model = fields.make_model(MC1, RC)
    tr = Trainer("s1", cfg, model, workspace=ws, use_checkpoint="scratch")
    tr.train(ds, max_epoch=2, steps_per_epoch=60)
    return ws, tr.ckpt_mgr.list_checkpoints()[-1], ds


def test_lang_distillation_and_text_query(stage1):
    """End to end: distill a 2-word language field from a synthetic
    region teacher (sphere vs background), then a text query for the
    sphere embedding must segment the sphere on a rendered view."""
    ws, ckpt, ds = stage1
    mc2 = dataclasses.replace(MC1, with_sam=True, sam_use_view_direction=True)
    model2 = fields.make_model(mc2, RC)
    params2 = fields.init_params(model2, jax.random.key(1))
    merged, trainable = ckpt_lib.load_partial_and_freeze(ckpt, params2)

    d = mc2.sam_feat_dim
    rng = np.random.default_rng(3)
    vocab = rng.standard_normal((2, d)).astype(np.float32)
    vocab /= np.linalg.norm(vocab, axis=-1, keepdims=True)

    # region teacher: the synthetic sphere is bright, the background dark
    def regions(img_uint8):
        return (img_uint8.mean(-1) > 40).astype(np.int32)

    teacher = make_region_teacher(regions, vocab, grid=32)

    cfg2 = Config(
        workspace=ws + "_lang", render=RC, model=mc2,
        train=dataclasses.replace(TC, iters=120, lr=5e-3),
        sam=dataclasses.replace(Config().sam, cache_size=8, cache_interval=2,
                                online_resolution=32),
    )
    tr = LangDistillTrainer(
        "lang", cfg2, model2, teacher=teacher, workspace=cfg2.workspace,
        use_checkpoint="scratch", trainable=trainable, init_params=merged,
    )
    mse0 = tr.eval_feature_mse(ds, n_frames=2)
    tr.train(ds, max_epoch=2, steps_per_epoch=60)
    mse1 = tr.eval_feature_mse(ds, n_frames=2)
    assert mse1 < mse0 * 0.8, f"lang distill did not learn: {mse0} -> {mse1}"

    # text query on a rendered view
    batch = ds.collate_sam(np.random.default_rng(0), index=0)
    out = run_rays(model2, tr.state.params,
                   jnp.asarray(batch["rays_o_lr"]),
                   jnp.asarray(batch["rays_d_lr"]), return_feats=True)
    h, w = batch["h"], batch["w"]
    fmap = out["samvit"].reshape(h, w, -1)
    mask, rel, peak = text_query_mask(
        fmap, jnp.asarray(vocab[1]), negatives=jnp.asarray(vocab[:1]))

    # ground truth: the sphere region of the rendered RGB frame
    full = run_rays(model2, tr.state.params,
                    jnp.asarray(batch["rays_o"]),
                    jnp.asarray(batch["rays_d"]))
    H, W = batch["H"], batch["W"]
    rgb = np.asarray(full["image"]).reshape(H, W, 3)
    import cv2

    gt = cv2.resize(((rgb.mean(-1) > 40 / 255)).astype(np.uint8), (w, h),
                    interpolation=cv2.INTER_NEAREST).astype(bool)
    inter = (mask & gt).sum()
    union = (mask | gt).sum()
    iou = inter / max(union, 1)
    assert iou > 0.5, f"text query IoU too low: {iou:.3f}"
    # the relevancy peak sits on the object
    assert gt[int(peak[1]), int(peak[0])]
