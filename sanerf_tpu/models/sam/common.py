"""Shared SAM building blocks: norms, MLP blocks, convs, init.

Pure-pytree implementations (params = nested dicts, apply = pure fns) of the
standard SAM layers. The reference consumes SAM through the external
`segment_anything_hq` package (SURVEY.md §2.2 "External model dependency");
this package is our from-scratch JAX implementation of the same
architecture, with a torch-checkpoint converter (convert.py) for
`sam_vit_h_4b8939.pth`.

All matmuls run with preferred_element_type=float32 so bf16 params still
accumulate in fp32 on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# -- init helpers -----------------------------------------------------------


def trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def init_linear(key, d_in, d_out, bias=True, std: Optional[float] = None) -> Params:
    wkey, _ = jax.random.split(key)
    if std is None:
        # torch default
        bound = 1.0 / np.sqrt(d_in)
        w = jax.random.uniform(wkey, (d_in, d_out), jnp.float32, -bound, bound)
    else:
        w = trunc_normal(wkey, (d_in, d_out), std)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.dot(x.astype(p["w"].dtype), p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def init_layer_norm(dim) -> Params:
    return {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return p["w"] * (x - mu) * jax.lax.rsqrt(var + eps) + p["b"]


def layer_norm_2d(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Channels-last input [..., H, W, C], normalized over C (SAM's
    LayerNorm2d normalizes the channel dim)."""
    return layer_norm(p, x, eps)


def init_conv(key, k: int, c_in: int, c_out: int, bias=True) -> Params:
    fan_in = c_in * k * k
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(key, (k, k, c_in, c_out), jnp.float32, -bound, bound)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv2d(p: Params, x: jax.Array, stride: int = 1, padding="SAME") -> jax.Array:
    """x: [B, H, W, C] channels-last (TPU-native layout). Computes in the
    weight dtype (bf16 inference) with fp32 accumulation."""
    y = jax.lax.conv_general_dilated(
        x.astype(p["w"].dtype), p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"]
    return y


def init_conv_transpose(key, k: int, c_in: int, c_out: int, bias=True) -> Params:
    """Weight layout [c_in, k, k, c_out] (torch ConvTranspose2d is
    [c_in, c_out, k, k]; converter permutes (0, 2, 3, 1))."""
    fan_in = c_in  # torch convT fan_in = c_in * k*k / (k*k groups...) ~ c_in*k*k? use c_in*k*k
    bound = 1.0 / np.sqrt(c_in * k * k)
    w = jax.random.uniform(key, (c_in, k, k, c_out), jnp.float32, -bound, bound)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv_transpose2d(p: Params, x: jax.Array, stride: int = 2) -> jax.Array:
    """2x upscaling transpose conv with kernel == stride (SAM's upscaler).

    With k == s the transpose conv has no output overlap, so it is exactly a
    per-pixel matmul + pixel shuffle: out[2i+di, 2j+dj, o] = sum_c x[i,j,c] *
    W[c, di, dj, o]. One einsum on the MXU; also sidesteps the
    torch-vs-lax transposed-conv kernel-flip convention entirely.
    """
    B, H, W, C = x.shape
    k = p["w"].shape[1]
    y = jnp.einsum(
        "bhwc,cklo->bhkwlo", x.astype(p["w"].dtype), p["w"],
        preferred_element_type=jnp.float32,
    )
    y = y.reshape(B, H * k, W * k, p["w"].shape[-1])
    if "b" in p:
        y = y + p["b"]
    return y


def init_mlp_block(key, dim, hidden) -> Params:
    k1, k2 = jax.random.split(key)
    return {"lin1": init_linear(k1, dim, hidden), "lin2": init_linear(k2, hidden, dim)}


def mlp_block(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["lin2"], jax.nn.gelu(linear(p["lin1"], x), approximate=False))


def init_mlp(key, d_in, d_hidden, d_out, n_layers) -> Params:
    keys = jax.random.split(key, n_layers)
    dims = [d_in] + [d_hidden] * (n_layers - 1) + [d_out]
    return {
        "layers": [init_linear(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)],
    }


def mlp(p: Params, x: jax.Array, sigmoid_output: bool = False) -> jax.Array:
    """SAM's small MLP head (relu between layers)."""
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x
