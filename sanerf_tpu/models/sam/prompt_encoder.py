"""SAM prompt encoder: points / boxes / masks -> sparse + dense embeddings.

Pure-JAX port of the public SAM prompt encoder consumed by the reference via
`segment_anything_hq` (SURVEY.md §2.2). The interactive path only exercises
point prompts (utils.py:1467-1471 `predict_torch(coords, labels, ...)`), but
boxes and dense mask prompts are implemented for capability parity
(sam_project.py uses boxes=None, masks=None too).
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
class PromptConfig:
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16


def init_params(cfg: PromptConfig, key) -> Params:
    ks = jax.random.split(key, 12)
    d = cfg.embed_dim
    return {
        # random gaussian matrix for Fourier position encoding (scale=1)
        "pe_gaussian": jax.random.normal(ks[0], (2, d // 2)),
        # 0: negative point, 1: positive point, 2: box top-left, 3: box bottom-right
        "point_embeddings": [jax.random.normal(ks[1 + i], (d,)) * 1.0 for i in range(4)],
        "not_a_point": jax.random.normal(ks[5], (d,)),
        "no_mask": jax.random.normal(ks[6], (d,)),
        "mask_down": {
            "conv1": common.init_conv(ks[7], 2, 1, cfg.mask_in_chans // 4),
            "ln1": common.init_layer_norm(cfg.mask_in_chans // 4),
            "conv2": common.init_conv(ks[8], 2, cfg.mask_in_chans // 4, cfg.mask_in_chans),
            "ln2": common.init_layer_norm(cfg.mask_in_chans),
            "conv3": common.init_conv(ks[9], 1, cfg.mask_in_chans, d),
        },
    }


def _pe_encode(params: Params, coords01: jax.Array) -> jax.Array:
    """Fourier position encoding of [0,1] coords (PositionEmbeddingRandom)."""
    c = 2.0 * coords01 - 1.0
    c = jnp.dot(c, params["pe_gaussian"], preferred_element_type=jnp.float32)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(params: Params, cfg: PromptConfig) -> jax.Array:
    """Positional encoding of the 64x64 image-embedding grid -> [HW, C]."""
    h, w = cfg.image_embedding_size
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(
        [jnp.broadcast_to(gx[None, :], (h, w)), jnp.broadcast_to(gy[:, None], (h, w))],
        axis=-1,
    )  # [h, w, 2] with (x, y) order
    return _pe_encode(params, grid.reshape(-1, 2))


def encode_points(
    params: Params,
    cfg: PromptConfig,
    coords: jax.Array,  # [B, N, 2] pixel coords in input-image space (x, y)
    labels: jax.Array,  # [B, N] 1=fg, 0=bg, -1=padding
    pad_with_no_box: bool = True,
) -> jax.Array:
    """-> sparse embeddings [B, N(+1), C]. When no box accompanies the
    points, SAM appends a padding point (label -1)."""
    if pad_with_no_box:
        pad_c = jnp.zeros((coords.shape[0], 1, 2))
        pad_l = -jnp.ones((labels.shape[0], 1), labels.dtype)
        coords = jnp.concatenate([coords, pad_c], axis=1)
        labels = jnp.concatenate([labels, pad_l], axis=1)
    coords01 = (coords + 0.5) / jnp.asarray(
        [cfg.input_image_size[1], cfg.input_image_size[0]], jnp.float32
    )
    pe = _pe_encode(params, coords01)  # [B, N, C]
    lab = labels[..., None]
    pe = jnp.where(lab == -1, 0.0, pe)  # padding points carry no PE
    out = pe + jnp.where(lab == -1, params["not_a_point"], 0.0)
    out = out + jnp.where(lab == 0, params["point_embeddings"][0], 0.0)
    out = out + jnp.where(lab == 1, params["point_embeddings"][1], 0.0)
    return out


def encode_boxes(params: Params, cfg: PromptConfig, boxes: jax.Array) -> jax.Array:
    """boxes [B, 4] (x0,y0,x1,y1) -> [B, 2, C] corner embeddings."""
    coords = boxes.reshape(-1, 2, 2) + 0.5
    coords01 = coords / jnp.asarray(
        [cfg.input_image_size[1], cfg.input_image_size[0]], jnp.float32
    )
    pe = _pe_encode(params, coords01)
    pe = pe.at[:, 0, :].add(params["point_embeddings"][2])
    pe = pe.at[:, 1, :].add(params["point_embeddings"][3])
    return pe


def encode_masks(params: Params, cfg: PromptConfig, masks: jax.Array) -> jax.Array:
    """Dense mask prompt [B, 4h, 4w, 1] -> [B, h*w, C] via the downscaler."""
    p = params["mask_down"]
    x = common.conv2d(p["conv1"], masks, stride=2, padding="VALID")
    x = jax.nn.gelu(common.layer_norm_2d(p["ln1"], x), approximate=False)
    x = common.conv2d(p["conv2"], x, stride=2, padding="VALID")
    x = jax.nn.gelu(common.layer_norm_2d(p["ln2"], x), approximate=False)
    x = common.conv2d(p["conv3"], x, padding="VALID")
    return x.reshape(x.shape[0], -1, x.shape[-1])


def no_mask_dense(params: Params, cfg: PromptConfig, batch: int) -> jax.Array:
    """Dense embedding when no mask prompt is given: learned constant."""
    h, w = cfg.image_embedding_size
    return jnp.broadcast_to(
        params["no_mask"][None, None, :], (batch, h * w, params["no_mask"].shape[0])
    )
