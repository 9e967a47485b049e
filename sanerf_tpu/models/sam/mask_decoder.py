"""SAM mask decoder: tokens + image features -> masks + IoU predictions.

Pure-JAX port of the public SAM decoder the reference drives through
`predict_torch` (utils.py:1467-1471). Components: learned iou + mask tokens,
the two-way transformer trunk, a 4x transpose-conv upscaler, per-mask
hypernetwork MLPs, and the IoU head.

TPU notes: everything is channels-last; the token counts are static (5
tokens + prompts), so one jit signature serves every click of the
interactive loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from sanerf_tpu.models.sam import common, transformer
from sanerf_tpu.models.sam.common import Params
from sanerf_tpu.models.sam.transformer import TwoWayConfig


@dataclass(frozen=True)
class DecoderConfig:
    transformer: TwoWayConfig = TwoWayConfig()
    num_multimask_outputs: int = 3
    embed_dim: int = 256
    iou_head_depth: int = 3
    iou_head_hidden: int = 256

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


def init_params(cfg: DecoderConfig, key) -> Params:
    ks = jax.random.split(key, 10 + cfg.num_mask_tokens)
    d = cfg.embed_dim
    nmt = cfg.num_mask_tokens
    return {
        "iou_token": jax.random.normal(ks[0], (d,)),
        "mask_tokens": jax.random.normal(ks[1], (nmt, d)),
        "transformer": transformer.init_params(cfg.transformer, ks[2]),
        "upscale": {
            "convt1": common.init_conv_transpose(ks[3], 2, d, d // 4),
            "ln1": common.init_layer_norm(d // 4),
            "convt2": common.init_conv_transpose(ks[4], 2, d // 4, d // 8),
        },
        "hyper_mlps": [
            common.init_mlp(ks[5 + i], d, d, d // 8, 3) for i in range(nmt)
        ],
        "iou_head": common.init_mlp(
            ks[5 + nmt], d, cfg.iou_head_hidden, nmt, cfg.iou_head_depth
        ),
    }


def predict_masks(
    cfg: DecoderConfig,
    params: Params,
    image_embeddings: jax.Array,  # [B, H, W, C] (64, 64, 256)
    image_pe: jax.Array,  # [HW, C]
    sparse_prompt: jax.Array,  # [B, Np, C]
    dense_prompt: jax.Array,  # [B, HW, C]
) -> Tuple[jax.Array, jax.Array]:
    """Returns (masks [B, nmt, 4H, 4W], iou_pred [B, nmt])."""
    B, H, W, C = image_embeddings.shape
    nmt = cfg.num_mask_tokens

    output_tokens = jnp.concatenate(
        [params["iou_token"][None, :], params["mask_tokens"]], axis=0
    )  # [1+nmt, C]
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None], (B, 1 + nmt, C)), sparse_prompt],
        axis=1,
    )

    src = image_embeddings.reshape(B, H * W, C) + dense_prompt
    pe = jnp.broadcast_to(image_pe[None], (B, H * W, C))

    hs, src = transformer.apply(cfg.transformer, params["transformer"], src, pe, tokens)
    iou_tok = hs[:, 0, :]
    mask_toks = hs[:, 1 : 1 + nmt, :]

    # upscale image features 4x
    up = params["upscale"]
    x = src.reshape(B, H, W, C)
    x = common.conv_transpose2d(up["convt1"], x, stride=2)
    x = jax.nn.gelu(common.layer_norm_2d(up["ln1"], x), approximate=False)
    x = common.conv_transpose2d(up["convt2"], x, stride=2)
    x = jax.nn.gelu(x, approximate=False)  # [B, 4H, 4W, C/8]

    hyper = jnp.stack(
        [common.mlp(params["hyper_mlps"][i], mask_toks[:, i, :]) for i in range(nmt)],
        axis=1,
    )  # [B, nmt, C/8]
    masks = jnp.einsum(
        "bnc,bhwc->bnhw", hyper, x, preferred_element_type=jnp.float32
    )
    iou_pred = common.mlp(params["iou_head"], iou_tok)
    return masks, iou_pred


def select_masks(
    masks: jax.Array, iou_pred: jax.Array, multimask_output: bool
) -> Tuple[jax.Array, jax.Array]:
    """SAM's output selection: slice 0 for single-mask, 1: for multimask."""
    if multimask_output:
        return masks[:, 1:], iou_pred[:, 1:]
    return masks[:, :1], iou_pred[:, :1]
