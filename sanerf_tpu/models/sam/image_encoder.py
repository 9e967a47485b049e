"""SAM ViT image encoder (ViT-H/L/B) in pure JAX, TPU-layout.

The frozen teacher of the distillation pipeline: 1024x1024 input ->
[64, 64, 256] feature map (channels-last here; the torch reference emits
[1, 256, 64, 64]). Architecture per the public SAM release (Kirillov et al.
2023) which the reference consumes as `sam_model_registry_baseline["vit_h"]`
(main.py:264-267):

- PatchEmbed conv 16x16/16, absolute positional embedding.
- `depth` transformer blocks: windowed attention (window 14, zero-padded)
  except at `global_attn_indexes`; decomposed relative positional bias on
  the H and W axes; GELU MLP (ratio 4).
- Neck: 1x1 conv -> LayerNorm2d -> 3x3 conv -> LayerNorm2d to 256 channels.

TPU notes: channels-last everywhere (NHWC convs hit the MXU natively);
window partition is a reshape/transpose (no data-dependent shapes); the
whole encoder jits into one program. Use bf16 params for inference via
`jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)` — matmuls still
accumulate fp32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.models.sam import common
from sanerf_tpu.models.sam.common import Params


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    use_rel_pos: bool = True

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size  # 64


VIT_H = ViTConfig()
VIT_L = ViTConfig(embed_dim=1024, depth=24, num_heads=16,
                  global_attn_indexes=(5, 11, 17, 23))
VIT_B = ViTConfig(embed_dim=768, depth=12, num_heads=12,
                  global_attn_indexes=(2, 5, 8, 11))


def init_params(cfg: ViTConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, cfg.depth + 8))
    head_dim = cfg.embed_dim // cfg.num_heads
    grid = cfg.grid

    def block(k, window: bool):
        ks = iter(jax.random.split(k, 8))
        # rel-pos tables sized for the attention resolution
        size = cfg.window_size if window else grid
        p = {
            "norm1": common.init_layer_norm(cfg.embed_dim),
            "qkv": common.init_linear(next(ks), cfg.embed_dim, 3 * cfg.embed_dim),
            "proj": common.init_linear(next(ks), cfg.embed_dim, cfg.embed_dim),
            "norm2": common.init_layer_norm(cfg.embed_dim),
            "mlp": common.init_mlp_block(
                next(ks), cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
            ),
        }
        if cfg.use_rel_pos:
            p["rel_pos_h"] = jnp.zeros((2 * size - 1, head_dim))
            p["rel_pos_w"] = jnp.zeros((2 * size - 1, head_dim))
        return p

    params: Params = {
        "patch_embed": common.init_conv(
            next(keys), cfg.patch_size, cfg.in_chans, cfg.embed_dim
        ),
        "pos_embed": jnp.zeros((1, grid, grid, cfg.embed_dim)),
        "blocks": [
            block(next(keys), window=(i not in cfg.global_attn_indexes))
            for i in range(cfg.depth)
        ],
        "neck": {
            "conv1": common.init_conv(next(keys), 1, cfg.embed_dim, cfg.out_chans, bias=False),
            "ln1": common.init_layer_norm(cfg.out_chans),
            "conv2": common.init_conv(next(keys), 3, cfg.out_chans, cfg.out_chans, bias=False),
            "ln2": common.init_layer_norm(cfg.out_chans),
        },
    }
    return params


# -- windowed attention pieces ----------------------------------------------


def window_partition(x: jax.Array, window: int):
    """[B, H, W, C] -> [B*nW, win, win, C] with zero padding; returns padded
    (Hp, Wp) for the inverse."""
    B, H, W, C = x.shape
    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(x: jax.Array, window: int, padded: Tuple[int, int],
                       orig: Tuple[int, int]):
    Hp, Wp = padded
    H, W = orig
    B = x.shape[0] // ((Hp // window) * (Wp // window))
    x = x.reshape(B, Hp // window, Wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select (interpolating if needed) relative positional embeddings for
    the (q, k) size pair — matches SAM's get_rel_pos."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # linear resize to the needed number of relative positions, matching
        # torch F.interpolate(mode="linear") [align_corners=False]: sample
        # centers map as src = (i + 0.5) * L_in/L_out - 0.5, edge-clamped
        L_in = rel_pos.shape[0]
        src = (jnp.arange(max_rel_dist) + 0.5) * (L_in / max_rel_dist) - 0.5
        src = jnp.clip(src, 0.0, L_in - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, L_in - 1)
        frac = (src - lo)[:, None]
        rel_pos = rel_pos[lo] * (1.0 - frac) + rel_pos[hi] * frac
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def attention(p: Params, x: jax.Array, num_heads: int, use_rel_pos: bool) -> jax.Array:
    """Multi-head self-attention over a [B, H, W, C] token grid with
    decomposed relative position bias."""
    B, H, W, C = x.shape
    head_dim = C // num_heads
    qkv = common.linear(p["qkv"], x.reshape(B, H * W, C))
    qkv = qkv.reshape(B, H * W, 3, num_heads, head_dim)
    q, k, v = jnp.moveaxis(qkv, 2, 0)  # [B, HW, heads, hd]
    q = q.transpose(0, 2, 1, 3)  # [B, heads, HW, hd]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    scale = head_dim**-0.5
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                      preferred_element_type=jnp.float32)

    if use_rel_pos:
        Rh = _get_rel_pos(H, H, p["rel_pos_h"])  # [H, H, hd]
        Rw = _get_rel_pos(W, W, p["rel_pos_w"])  # [W, W, hd]
        q_grid = q.reshape(B, num_heads, H, W, head_dim)
        rel_h = jnp.einsum("bnhwc,hkc->bnhwk", q_grid, Rh)
        rel_w = jnp.einsum("bnhwc,wkc->bnhwk", q_grid, Rw)
        attn = attn.reshape(B, num_heads, H, W, H, W)
        attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
        attn = attn.reshape(B, num_heads, H * W, H * W)

    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
    return common.linear(p["proj"], out)


def encode(cfg: ViTConfig, params: Params, x: jax.Array) -> jax.Array:
    """[B, 1024, 1024, 3] (normalized) -> [B, 64, 64, 256] feature map."""
    x = common.conv2d(params["patch_embed"], x, stride=cfg.patch_size, padding="VALID")
    x = x + params["pos_embed"]

    for i, bp in enumerate(params["blocks"]):
        shortcut = x
        h = common.layer_norm(bp["norm1"], x)
        windowed = i not in cfg.global_attn_indexes and cfg.window_size > 0
        if windowed:
            h, padded = window_partition(h, cfg.window_size)
            h = attention(bp, h, cfg.num_heads, cfg.use_rel_pos)
            h = window_unpartition(h, cfg.window_size, padded, (x.shape[1], x.shape[2]))
        else:
            h = attention(bp, h, cfg.num_heads, cfg.use_rel_pos)
        x = shortcut + h
        x = x + common.mlp_block(bp["mlp"], common.layer_norm(bp["norm2"], x))

    n = params["neck"]
    x = common.conv2d(n["conv1"], x, padding="VALID")
    x = common.layer_norm_2d(n["ln1"], x)
    x = common.conv2d(n["conv2"], x, padding="SAME")
    x = common.layer_norm_2d(n["ln2"], x)
    return x


# image normalization constants (SAM preprocess)
PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def preprocess(img: jax.Array, img_size: int = 1024) -> jax.Array:
    """Normalize a [H, W, 3] uint8/float image and zero-pad to square
    img_size (SAM's preprocess)."""
    x = (img.astype(jnp.float32) - PIXEL_MEAN) / PIXEL_STD
    h, w = x.shape[0], x.shape[1]
    x = jnp.pad(x, ((0, img_size - h), (0, img_size - w), (0, 0)))
    return x[None]
