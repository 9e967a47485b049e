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
                out_dtype: Optional[jnp.dtype] = None,
                band_weights: Optional[jax.Array] = None) -> jax.Array:
    """[..., D] -> [..., D * (1 + 2*degree)].

    TPU formulation: one [., D] @ [D, F] matmul + a masked sin, instead of
    2*degree+1 concatenated [., D] slices — narrow trailing dims tile-pad
    42x on TPU (an elementwise [., nb, D] broadcast form profiled even
    worse: 104 ms/frame of padded-layout mul+convert). Layout matches the
    reference torch fallback (encoding.py:36-41):
    [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{deg-1} x), cos(2^{deg-1} x)],
    using cos(z) = sin(z + pi/2).

    Precision: HIGH (3-pass bf16 on TPU, ~f32-accurate operands). DEFAULT
    would be SINGLE-pass bf16: operand rounding of x at 2^-9 relative turns
    into multi-radian phase error in the top bands (freq 9 at |x|<=2 reaches
    ~2^9*2*pi ~= 3.2e3 rad; bf16 rounding of x alone is ~2*pi there) —
    silently corrupting the encode on the TPU training path while CPU tests
    (which run DEFAULT as f32) stay green. 3-pass keeps phase error below
    ~2e-3 rad at ~half HIGHEST's cost. `out_dtype` (bf16 at inference)
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
    z = jnp.dot(x, jnp.asarray(proj), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH)
    out = jnp.where(jnp.asarray(is_linear), z, jnp.sin(z + jnp.asarray(phase)))
    if band_weights is not None:
        # coarse-to-fine gating (BARF, arXiv:2104.06405 eq. 14): scale band
        # f's sin AND cos columns by band_weights[f]; identity columns stay.
        # Column order is frequency-major (see layout above), so the weight
        # vector is [1]*D ++ repeat(band_weights, 2*D).
        w = jnp.concatenate([
            jnp.ones((D,), jnp.float32),
            jnp.repeat(band_weights.astype(jnp.float32), 2 * D),
        ])
        out = out * w
    return out.astype(out_dtype) if out_dtype is not None else out


def anneal_band_weights(alpha: jax.Array, degree: int) -> jax.Array:
    """BARF's cosine easing window per frequency band: band j opens as the
    progress `alpha` in [0, 1] sweeps past j/degree —
    w_j = (1 - cos(pi * clip(alpha*degree - j, 0, 1))) / 2. At alpha=1 every
    weight is exactly 1 (the un-annealed encode)."""
    j = jnp.arange(degree, dtype=jnp.float32)
    t = jnp.clip(alpha * degree - j, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * t))


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * 2 * degree
