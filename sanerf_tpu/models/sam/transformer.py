"""SAM two-way transformer (prompt tokens <-> image embedding).

Pure-JAX implementation of the mask decoder's cross-attention trunk
(Kirillov et al. 2023): `depth` blocks of [token self-attn, token->image
cross-attn, token MLP, image->token cross-attn] with a final token->image
attention, all with pre-/post-LN per the public architecture. Cross
attention downsamples heads' dim by `attn_downsample` (=2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from sanerf_tpu.models.sam import common
from sanerf_tpu.models.sam.common import Params


@dataclass(frozen=True)
class TwoWayConfig:
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attn_downsample: int = 2


def init_attn(key, dim: int, internal_dim: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "q": common.init_linear(ks[0], dim, internal_dim),
        "k": common.init_linear(ks[1], dim, internal_dim),
        "v": common.init_linear(ks[2], dim, internal_dim),
        "out": common.init_linear(ks[3], internal_dim, dim),
    }


def attn(p: Params, q, k, v, num_heads: int):
    """Standard MHA over token sequences [B, N, C]."""
    q = common.linear(p["q"], q)
    k = common.linear(p["k"], k)
    v = common.linear(p["v"], v)
    B, Nq, C = q.shape
    Nk = k.shape[1]
    hd = C // num_heads
    q = q.reshape(B, Nq, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Nk, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Nk, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(hd)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
    return common.linear(p["out"], out)


def init_block(cfg: TwoWayConfig, key, skip_first_layer_pe: bool) -> Params:
    ks = jax.random.split(key, 8)
    d, dd = cfg.embedding_dim, cfg.embedding_dim // cfg.attn_downsample
    return {
        "self_attn": init_attn(ks[0], d, d),
        "norm1": common.init_layer_norm(d),
        "cross_t2i": init_attn(ks[1], d, dd),
        "norm2": common.init_layer_norm(d),
        "mlp": common.init_mlp_block(ks[2], d, cfg.mlp_dim),
        "norm3": common.init_layer_norm(d),
        "cross_i2t": init_attn(ks[3], d, dd),
        "norm4": common.init_layer_norm(d),
    }


def init_params(cfg: TwoWayConfig, key) -> Params:
    ks = jax.random.split(key, cfg.depth + 2)
    return {
        "blocks": [init_block(cfg, ks[i], skip_first_layer_pe=(i == 0))
                   for i in range(cfg.depth)],
        "final_attn": init_attn(
            ks[-2], cfg.embedding_dim, cfg.embedding_dim // cfg.attn_downsample
        ),
        "final_norm": common.init_layer_norm(cfg.embedding_dim),
    }


def apply(
    cfg: TwoWayConfig,
    params: Params,
    image_embedding: jax.Array,  # [B, HW, C]
    image_pe: jax.Array,  # [B, HW, C]
    point_embedding: jax.Array,  # [B, Nt, C]
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens [B, Nt, C], image features [B, HW, C])."""
    queries = point_embedding
    keys = image_embedding
    ln = common.layer_norm

    for i, bp in enumerate(params["blocks"]):
        # token self-attention (first block attends raw embeddings)
        if i == 0:
            queries = queries + attn(
                bp["self_attn"], queries, queries, queries, cfg.num_heads
            )
        else:
            q = queries + point_embedding
            queries = queries + attn(bp["self_attn"], q, q, queries, cfg.num_heads)
        queries = ln(bp["norm1"], queries)

        # tokens -> image
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + attn(bp["cross_t2i"], q, k, keys, cfg.num_heads)
        queries = ln(bp["norm2"], queries)

        # token MLP
        queries = ln(bp["norm3"], queries + common.mlp_block(bp["mlp"], queries))

        # image -> tokens
        q = queries + point_embedding
        k = keys + image_pe
        keys = keys + attn(bp["cross_i2t"], k, q, queries, cfg.num_heads)
        keys = ln(bp["norm4"], keys)

    q = queries + point_embedding
    k = keys + image_pe
    queries = queries + attn(params["final_attn"], q, k, keys, cfg.num_heads)
    queries = ln(params["final_norm"], queries)
    return queries, keys
