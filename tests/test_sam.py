"""SAM module tests: shapes, window partition roundtrip, attention math,
converter roundtrip on a synthetic torch-layout checkpoint."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_tpu.models.sam import (
    common, convert, image_encoder, mask_decoder, prompt_encoder, predictor,
    transformer,
)

TINY_VIT = image_encoder.ViTConfig(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
    window_size=2, global_attn_indexes=(1,), out_chans=32,
)
TINY_PROMPT = prompt_encoder.PromptConfig(
    embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64),
    mask_in_chans=4,
)
TINY_TW = transformer.TwoWayConfig(depth=2, embedding_dim=32, num_heads=2, mlp_dim=64)
TINY_DEC = mask_decoder.DecoderConfig(transformer=TINY_TW, embed_dim=32,
                                      iou_head_hidden=32)
TINY_SAM = predictor.SamConfig(vit=TINY_VIT, prompt=TINY_PROMPT, decoder=TINY_DEC)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 4)).astype(np.float32))
    win, padded = image_encoder.window_partition(x, 3)
    back = image_encoder.window_unpartition(win, 3, padded, (7, 9))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)


def test_attention_is_softmax_attention(rng):
    """Without rel-pos, the ViT block attention equals reference softmax
    attention computed in numpy."""
    C, heads = 8, 2
    p = {
        "qkv": {"w": jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32)),
                 "b": jnp.zeros((3 * C,))},
        "proj": {"w": jnp.eye(C), "b": jnp.zeros((C,))},
    }
    x = jnp.asarray(rng.standard_normal((1, 2, 2, C)).astype(np.float32))
    got = np.asarray(image_encoder.attention(p, x, heads, use_rel_pos=False))

    xf = np.asarray(x).reshape(4, C)
    qkv = xf @ np.asarray(p["qkv"]["w"])
    q, k, v = qkv[:, :C], qkv[:, C : 2 * C], qkv[:, 2 * C :]
    hd = C // heads
    out = np.zeros((4, C))
    for h in range(heads):
        qh, kh, vh = (a[:, h * hd : (h + 1) * hd] for a in (q, k, v))
        logits = qh @ kh.T / np.sqrt(hd)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        out[:, h * hd : (h + 1) * hd] = w @ vh
    np.testing.assert_allclose(got.reshape(4, C), out, rtol=1e-4, atol=1e-5)


def test_vit_encoder_shapes(rng):
    params = image_encoder.init_params(TINY_VIT, jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    out = image_encoder.encode(TINY_VIT, params, x)
    assert out.shape == (1, 4, 4, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rel_pos_interpolation():
    rel = jnp.asarray(np.linspace(0, 1, 5)[:, None].astype(np.float32))
    out = image_encoder._get_rel_pos(4, 4, rel)  # needs 7 positions
    assert out.shape == (4, 4, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_prompt_encoder_points():
    params = prompt_encoder.init_params(TINY_PROMPT, jax.random.key(0))
    coords = jnp.asarray([[[10.0, 20.0], [30.0, 40.0]]])
    labels = jnp.asarray([[1, 0]])
    out = prompt_encoder.encode_points(params, TINY_PROMPT, coords, labels)
    assert out.shape == (1, 3, 32)  # +1 padding point
    # padding point equals not_a_point embedding
    np.testing.assert_allclose(
        np.asarray(out[0, 2]), np.asarray(params["not_a_point"]), rtol=1e-5
    )


def test_dense_pe_shape():
    params = prompt_encoder.init_params(TINY_PROMPT, jax.random.key(0))
    pe = prompt_encoder.dense_pe(params, TINY_PROMPT)
    assert pe.shape == (16, 32)


def test_decoder_shapes(rng):
    params = mask_decoder.init_params(TINY_DEC, jax.random.key(0))
    feats = jnp.asarray(rng.standard_normal((1, 4, 4, 32)).astype(np.float32))
    pe = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
    sparse = jnp.asarray(rng.standard_normal((1, 3, 32)).astype(np.float32))
    dense = jnp.asarray(rng.standard_normal((1, 16, 32)).astype(np.float32))
    masks, iou = mask_decoder.predict_masks(TINY_DEC, params, feats, pe, sparse, dense)
    assert masks.shape == (1, 4, 16, 16)
    assert iou.shape == (1, 4)
    m1, i1 = mask_decoder.select_masks(masks, iou, False)
    assert m1.shape == (1, 1, 16, 16)
    m3, i3 = mask_decoder.select_masks(masks, iou, True)
    assert m3.shape == (1, 3, 16, 16)


def test_conv_transpose_equals_torch(rng):
    import torch

    cin, cout = 6, 4
    w_t = rng.standard_normal((cin, cout, 2, 2)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    x = rng.standard_normal((1, 5, 7, cin)).astype(np.float32)

    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w_t),
        torch.from_numpy(b), stride=2,
    ).numpy().transpose(0, 2, 3, 1)

    p = {"w": jnp.asarray(w_t.transpose(0, 2, 3, 1)), "b": jnp.asarray(b)}
    got = np.asarray(common.conv_transpose2d(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def _synthetic_torch_sd(cfg, rng):
    """Build a torch-layout random state_dict matching the official SAM keys."""
    sd = {}
    vit, d = cfg.vit, cfg.decoder.embed_dim
    ed = vit.embed_dim

    def lin(pre, i, o, bias=True):
        sd[pre + ".weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            sd[pre + ".bias"] = rng.standard_normal((o,)).astype(np.float32)

    def conv(pre, i, o, k, bias=True):
        sd[pre + ".weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        if bias:
            sd[pre + ".bias"] = rng.standard_normal((o,)).astype(np.float32)

    def convt(pre, i, o, k):
        sd[pre + ".weight"] = rng.standard_normal((i, o, k, k)).astype(np.float32)
        sd[pre + ".bias"] = rng.standard_normal((o,)).astype(np.float32)

    def ln(pre, n):
        sd[pre + ".weight"] = rng.standard_normal((n,)).astype(np.float32)
        sd[pre + ".bias"] = rng.standard_normal((n,)).astype(np.float32)

    conv("image_encoder.patch_embed.proj", 3, ed, vit.patch_size)
    sd["image_encoder.pos_embed"] = rng.standard_normal(
        (1, vit.grid, vit.grid, ed)).astype(np.float32)
    hd = ed // vit.num_heads
    for i in range(vit.depth):
        pre = f"image_encoder.blocks.{i}"
        ln(pre + ".norm1", ed)
        lin(pre + ".attn.qkv", ed, 3 * ed)
        lin(pre + ".attn.proj", ed, ed)
        size = vit.window_size if i not in vit.global_attn_indexes else vit.grid
        sd[pre + ".attn.rel_pos_h"] = rng.standard_normal((2 * size - 1, hd)).astype(np.float32)
        sd[pre + ".attn.rel_pos_w"] = rng.standard_normal((2 * size - 1, hd)).astype(np.float32)
        ln(pre + ".norm2", ed)
        lin(pre + ".mlp.lin1", ed, 4 * ed)
        lin(pre + ".mlp.lin2", 4 * ed, ed)
    conv("image_encoder.neck.0", ed, vit.out_chans, 1, bias=False)
    ln("image_encoder.neck.1", vit.out_chans)
    conv("image_encoder.neck.2", vit.out_chans, vit.out_chans, 3, bias=False)
    ln("image_encoder.neck.3", vit.out_chans)

    pd = cfg.prompt.embed_dim
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = (
        rng.standard_normal((2, pd // 2)).astype(np.float32))
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = (
            rng.standard_normal((1, pd)).astype(np.float32))
    sd["prompt_encoder.not_a_point_embed.weight"] = rng.standard_normal((1, pd)).astype(np.float32)
    sd["prompt_encoder.no_mask_embed.weight"] = rng.standard_normal((1, pd)).astype(np.float32)
    mc = cfg.prompt.mask_in_chans
    conv("prompt_encoder.mask_downscaling.0", 1, mc // 4, 2)
    ln("prompt_encoder.mask_downscaling.1", mc // 4)
    conv("prompt_encoder.mask_downscaling.3", mc // 4, mc, 2)
    ln("prompt_encoder.mask_downscaling.4", mc)
    conv("prompt_encoder.mask_downscaling.6", mc, pd, 1)

    nmt = cfg.decoder.num_mask_tokens
    sd["mask_decoder.iou_token.weight"] = rng.standard_normal((1, d)).astype(np.float32)
    sd["mask_decoder.mask_tokens.weight"] = rng.standard_normal((nmt, d)).astype(np.float32)
    dd = d // cfg.decoder.transformer.attn_downsample
    for i in range(cfg.decoder.transformer.depth):
        pre = f"mask_decoder.transformer.layers.{i}"
        for a, idim in (("self_attn", d), ("cross_attn_token_to_image", dd),
                        ("cross_attn_image_to_token", dd)):
            lin(f"{pre}.{a}.q_proj", d, idim)
            lin(f"{pre}.{a}.k_proj", d, idim)
            lin(f"{pre}.{a}.v_proj", d, idim)
            lin(f"{pre}.{a}.out_proj", idim, d)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            ln(f"{pre}.{n}", d)
        lin(pre + ".mlp.lin1", d, cfg.decoder.transformer.mlp_dim)
        lin(pre + ".mlp.lin2", cfg.decoder.transformer.mlp_dim, d)
    for a in ("mask_decoder.transformer.final_attn_token_to_image",):
        lin(a + ".q_proj", d, dd)
        lin(a + ".k_proj", d, dd)
        lin(a + ".v_proj", d, dd)
        lin(a + ".out_proj", dd, d)
    ln("mask_decoder.transformer.norm_final_attn", d)
    convt("mask_decoder.output_upscaling.0", d, d // 4, 2)
    ln("mask_decoder.output_upscaling.1", d // 4)
    convt("mask_decoder.output_upscaling.3", d // 4, d // 8, 2)
    for i in range(nmt):
        lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.0", d, d)
        lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.1", d, d)
        lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.2", d, d // 8)
    lin("mask_decoder.iou_prediction_head.layers.0", d, cfg.decoder.iou_head_hidden)
    lin("mask_decoder.iou_prediction_head.layers.1",
        cfg.decoder.iou_head_hidden, cfg.decoder.iou_head_hidden)
    lin("mask_decoder.iou_prediction_head.layers.2", cfg.decoder.iou_head_hidden, nmt)
    return sd


def test_converter_and_full_pipeline(rng):
    """Convert a synthetic torch-layout checkpoint and run the FULL predictor
    pipeline (set_image -> click -> mask)."""
    sd = _synthetic_torch_sd(TINY_SAM, rng)
    params = convert.convert_state_dict(sd, TINY_SAM)
    # scale down: random N(0,1) weights explode through 2 ViT layers
    params = jax.tree.map(lambda x: jnp.asarray(x) * 0.05, params)

    pred = predictor.SamPredictor(TINY_SAM, params)
    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    pred.set_image(img)
    assert pred.features.shape == (1, 4, 4, 32)
    masks, iou, low_res = pred.predict(
        np.array([[32.0, 24.0]]), np.array([1]), multimask_output=True
    )
    assert masks.shape == (3, 48, 64) and masks.dtype == bool
    assert iou.shape == (3,)
    assert low_res.shape == (3, 16, 16)


def test_feature_injection_path(rng):
    """The NeRF feature-injection path (fake set_image, utils.py:1422-1433)."""
    params = predictor.init_params(TINY_SAM, jax.random.key(0))
    pred = predictor.SamPredictor(TINY_SAM, params)
    feats = rng.standard_normal((2, 2, 32)).astype(np.float32)  # low-res render
    pred.set_features(feats, H=48, W=48)
    assert pred.features.shape == (1, 4, 4, 32)
    # zero-padded beyond the resized region (2x2 -> 4x4 resize = no pad here);
    # use an asymmetric map to check padding
    pred.set_features(rng.standard_normal((2, 1, 32)).astype(np.float32), 64, 32)
    f = np.asarray(pred.features[0])
    assert np.all(f[:, 2:, :] == 0)  # padded columns
    masks, iou, _ = pred.predict(np.array([[16.0, 32.0]]), np.array([1]))
    assert masks.shape == (1, 64, 32)
