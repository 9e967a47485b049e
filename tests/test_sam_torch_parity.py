"""SAM ViT port fidelity vs torch oracles (VERDICT r1 item 4).

The hardest-to-port piece of the SAM image encoder is the decomposed
relative-position windowed attention. The reference consumes the official
`segment_anything` package (utils.py:1085-1087); the real `sam_vit_h_*.pth`
checkpoint is not present in this environment, so fidelity is established
structurally: each numerical building block — and the full tiny encoder
through the converter — is compared against a torch implementation of the
official SAM formulas (segment_anything/modeling/image_encoder.py:
get_rel_pos, add_decomposed_rel_pos, Attention.forward, Block.forward,
ImageEncoderViT.forward) re-created here as the oracle.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from sanerf_tpu.models.sam import common, convert, image_encoder

TINY_VIT = image_encoder.ViTConfig(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
    window_size=2, global_attn_indexes=(1,), out_chans=32,
)


# -- torch oracles (official SAM math) --------------------------------------


def torch_get_rel_pos(q_size, k_size, rel_pos):
    """segment_anything/modeling/image_encoder.py get_rel_pos."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos_resized = TF.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist, mode="linear",
        )
        rel_pos_resized = rel_pos_resized.reshape(-1, max_rel_dist).permute(1, 0)
    else:
        rel_pos_resized = rel_pos
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos_resized[relative_coords.long()]


def torch_add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    """segment_anything/modeling/image_encoder.py add_decomposed_rel_pos."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = torch_get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = torch_get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (
        attn.view(B, q_h, q_w, k_h, k_w)
        + rel_h[:, :, :, :, None]
        + rel_w[:, :, :, None, :]
    ).view(B, q_h * q_w, k_h * k_w)
    return attn


def torch_attention(x, qkv_w, qkv_b, proj_w, proj_b, rel_h, rel_w, num_heads):
    """Official Attention.forward on a [B, H, W, C] grid."""
    B, H, W, C = x.shape
    hd = C // num_heads
    qkv = (x.reshape(B, H * W, C) @ qkv_w.t() + qkv_b)
    qkv = qkv.reshape(B, H * W, 3, num_heads, -1).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.reshape(3, B * num_heads, H * W, -1).unbind(0)
    attn = (q * hd**-0.5) @ k.transpose(-2, -1)
    attn = torch_add_decomposed_rel_pos(attn, q, rel_h, rel_w, (H, W), (H, W))
    attn = attn.softmax(dim=-1)
    x = (attn @ v).view(B, num_heads, H, W, -1).permute(0, 2, 3, 1, 4)
    x = x.reshape(B, H, W, -1)
    return x @ proj_w.t() + proj_b


def torch_window_partition(x, window_size):
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h > 0 or pad_w > 0:
        x = TF.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(
        -1, window_size, window_size, C)
    return windows, (Hp, Wp)


def torch_window_unpartition(windows, window_size, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.view(B, Hp // window_size, Wp // window_size, window_size,
                     window_size, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, Hp, Wp, -1)
    return x[:, :H, :W, :].contiguous()


def torch_encoder(sd, cfg, x):
    """Official ImageEncoderViT.forward from a torch state_dict (the same
    dict layout `_synthetic_torch_sd` / convert_state_dict use)."""
    t = lambda k: torch.from_numpy(np.asarray(sd["image_encoder." + k]))
    x = TF.conv2d(x.permute(0, 3, 1, 2), t("patch_embed.proj.weight"),
                  t("patch_embed.proj.bias"), stride=cfg.patch_size)
    x = x.permute(0, 2, 3, 1)
    x = x + t("pos_embed")
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        shortcut = x
        h = TF.layer_norm(x, (cfg.embed_dim,), t(pre + ".norm1.weight"),
                          t(pre + ".norm1.bias"), eps=1e-6)
        windowed = i not in cfg.global_attn_indexes and cfg.window_size > 0
        if windowed:
            Horig, Worig = h.shape[1], h.shape[2]
            h, pad_hw = torch_window_partition(h, cfg.window_size)
        h = torch_attention(
            h, t(pre + ".attn.qkv.weight"), t(pre + ".attn.qkv.bias"),
            t(pre + ".attn.proj.weight"), t(pre + ".attn.proj.bias"),
            t(pre + ".attn.rel_pos_h"), t(pre + ".attn.rel_pos_w"),
            cfg.num_heads)
        if windowed:
            h = torch_window_unpartition(h, cfg.window_size, pad_hw,
                                         (Horig, Worig))
        x = shortcut + h
        h = TF.layer_norm(x, (cfg.embed_dim,), t(pre + ".norm2.weight"),
                          t(pre + ".norm2.bias"), eps=1e-6)
        h = TF.gelu(h @ t(pre + ".mlp.lin1.weight").t() + t(pre + ".mlp.lin1.bias"))
        h = h @ t(pre + ".mlp.lin2.weight").t() + t(pre + ".mlp.lin2.bias")
        x = x + h

    def ln2d(name, y):
        w, b = t(name + ".weight"), t(name + ".bias")
        mu = y.mean(-1, keepdim=True)
        var = ((y - mu) ** 2).mean(-1, keepdim=True)
        return w * (y - mu) / torch.sqrt(var + 1e-6) + b

    x = TF.conv2d(x.permute(0, 3, 1, 2), t("neck.0.weight"), None)
    x = ln2d("neck.1", x.permute(0, 2, 3, 1))
    x = TF.conv2d(x.permute(0, 3, 1, 2), t("neck.2.weight"), None, padding=1)
    x = ln2d("neck.3", x.permute(0, 2, 3, 1))
    return x


# -- tests -------------------------------------------------------------------


@pytest.mark.parametrize("q_size,k_size,n_rel", [
    (7, 7, 13),   # exact-size path
    (7, 7, 9),    # interpolation path
    (5, 9, 11),   # asymmetric q/k sizes
    (9, 5, 23),
])
def test_get_rel_pos_equals_torch(rng, q_size, k_size, n_rel):
    rel = rng.standard_normal((n_rel, 6)).astype(np.float32)
    ref = torch_get_rel_pos(q_size, k_size, torch.from_numpy(rel)).numpy()
    got = np.asarray(image_encoder._get_rel_pos(q_size, k_size, jnp.asarray(rel)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_attention_equals_torch(rng):
    """Decomposed rel-pos attention on a non-square token grid."""
    B, H, W, C, heads = 2, 6, 4, 16, 2
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    qkv_w = rng.standard_normal((3 * C, C)).astype(np.float32)
    qkv_b = rng.standard_normal((3 * C,)).astype(np.float32)
    proj_w = rng.standard_normal((C, C)).astype(np.float32)
    proj_b = rng.standard_normal((C,)).astype(np.float32)
    hd = C // heads
    rel_h = rng.standard_normal((2 * H - 1, hd)).astype(np.float32)
    rel_w = rng.standard_normal((2 * W - 1, hd)).astype(np.float32)

    ref = torch_attention(
        torch.from_numpy(x), torch.from_numpy(qkv_w), torch.from_numpy(qkv_b),
        torch.from_numpy(proj_w), torch.from_numpy(proj_b),
        torch.from_numpy(rel_h), torch.from_numpy(rel_w), heads).numpy()

    p = {
        "qkv": {"w": jnp.asarray(qkv_w.T), "b": jnp.asarray(qkv_b)},
        "proj": {"w": jnp.asarray(proj_w.T), "b": jnp.asarray(proj_b)},
        "rel_pos_h": jnp.asarray(rel_h),
        "rel_pos_w": jnp.asarray(rel_w),
    }
    got = np.asarray(image_encoder.attention(p, jnp.asarray(x), heads, True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-5)


def test_windowed_attention_block_equals_torch(rng):
    """window partition -> attention -> unpartition end-to-end, with a grid
    that needs padding (5x7 tokens, window 4)."""
    B, H, W, C, heads, win = 1, 5, 7, 8, 2, 4
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    qkv_w = rng.standard_normal((3 * C, C)).astype(np.float32)
    qkv_b = rng.standard_normal((3 * C,)).astype(np.float32)
    proj_w = rng.standard_normal((C, C)).astype(np.float32)
    proj_b = rng.standard_normal((C,)).astype(np.float32)
    hd = C // heads
    rel_h = rng.standard_normal((2 * win - 1, hd)).astype(np.float32)
    rel_w = rng.standard_normal((2 * win - 1, hd)).astype(np.float32)

    xt, pad_hw = torch_window_partition(torch.from_numpy(x), win)
    ht = torch_attention(
        xt, torch.from_numpy(qkv_w), torch.from_numpy(qkv_b),
        torch.from_numpy(proj_w), torch.from_numpy(proj_b),
        torch.from_numpy(rel_h), torch.from_numpy(rel_w), heads)
    ref = torch_window_unpartition(ht, win, pad_hw, (H, W)).numpy()

    p = {
        "qkv": {"w": jnp.asarray(qkv_w.T), "b": jnp.asarray(qkv_b)},
        "proj": {"w": jnp.asarray(proj_w.T), "b": jnp.asarray(proj_b)},
        "rel_pos_h": jnp.asarray(rel_h),
        "rel_pos_w": jnp.asarray(rel_w),
    }
    hj, padded = image_encoder.window_partition(jnp.asarray(x), win)
    hj = image_encoder.attention(p, hj, heads, True)
    got = np.asarray(image_encoder.window_unpartition(hj, win, padded, (H, W)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_tiny_encoder_equals_torch(rng):
    """Full tiny ViT (windowed + global blocks + neck) through the converter
    vs the official forward from the same torch state_dict."""
    from tests.test_sam import TINY_SAM, _synthetic_torch_sd

    sd = _synthetic_torch_sd(TINY_SAM, rng)
    # random pos_embed/rel_pos are ~N(0,1); scale down so softmax stays soft
    for k in list(sd):
        if "rel_pos" in k or "pos_embed" in k:
            sd[k] = (0.1 * sd[k]).astype(np.float32)
        if k.startswith("image_encoder") and k.endswith(".weight") and sd[k].ndim >= 2:
            sd[k] = (sd[k] / np.sqrt(sd[k][0].size)).astype(np.float32)
    params = convert.convert_state_dict(sd, TINY_SAM)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ref = torch_encoder(sd, TINY_SAM.vit, torch.from_numpy(x)).numpy()
    got = np.asarray(image_encoder.encode(TINY_SAM.vit, params["image_encoder"],
                                          jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)
