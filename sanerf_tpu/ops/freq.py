"""Classic NeRF sin/cos positional encoding.

Replaces the reference CUDA extension `freqencoder` (freqencoder/src/
freqencoder.cu `kernel_freq`, freqencoder/freq.py). The reference builds this
kernel and exposes it via `get_encoder('frequency')` (encoding.py:60-62) but
never instantiates it from NeRFNetwork; we keep it for capability parity.

Output layout matches freqencoder.cu:30-57 and the torch fallback
`FreqEncoder_torch` (encoding.py:6-44): `[x, sin(2^0 x), cos(2^0 x), ...,
sin(2^{F-1} x), cos(2^{F-1} x)]`, frequency-major per input dim.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("degree", "out_dtype"), inline=True)
def freq_encode(x: jax.Array, degree: int = 4,
                out_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """[..., D] -> [..., D * (1 + 2*degree)].

    TPU formulation: one [., D] @ [D, F] matmul + a masked sin, instead of
    2*degree+1 concatenated [., D] slices — narrow trailing dims tile-pad
    42x on TPU (an elementwise [., nb, D] broadcast form profiled even
    worse: 104 ms/frame of padded-layout mul+convert). Layout matches the
    reference torch fallback (encoding.py:36-41):
    [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{deg-1} x), cos(2^{deg-1} x)],
    using cos(z) = sin(z + pi/2).

    Precision: DEFAULT (3-pass bf16 on TPU, ~f32-accurate) — the phases here
    stay below 2^degree * pi * |x|, a few radians for contracted inputs, so
    the old HIGHEST (6-pass) setting only halved the op's throughput
    (profiled 74 GB/s / 86 ms per frame). `out_dtype` (bf16 at inference)
    halves the materialized [., F] tensor; the sin computes in f32 first.
    """
    x = x.astype(jnp.float32)
    D = x.shape[-1]
    F = D * (1 + 2 * degree)
    # projection: column block d of the output reads x_d scaled
    proj = np.zeros((D, F), np.float32)
    phase = np.zeros((F,), np.float32)
    is_linear = np.zeros((F,), bool)
    proj[:, :D] = np.eye(D)
    is_linear[:D] = True
    col = D
    for f in range(degree):
        proj[:, col : col + D] = (2.0**f) * np.eye(D)  # sin block
        col += D
        proj[:, col : col + D] = (2.0**f) * np.eye(D)  # cos block
        phase[col : col + D] = np.pi / 2
        col += D
    z = jnp.dot(x, jnp.asarray(proj), preferred_element_type=jnp.float32)
    out = jnp.where(jnp.asarray(is_linear), z, jnp.sin(z + jnp.asarray(phase)))
    return out.astype(out_dtype) if out_dtype is not None else out


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * 2 * degree
