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

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("degree",))
def freq_encode(x: jax.Array, degree: int = 4) -> jax.Array:
    """[..., D] -> [..., D * (1 + 2*degree)].

    TPU formulation: one [., D] @ [D, F] matmul + a masked sin, instead of
    2*degree+1 concatenated [., D] slices — narrow trailing dims tile-pad
    42x on TPU, and the profiled concat alone cost ~10% of a frame. Layout
    matches the reference torch fallback (encoding.py:36-41):
    [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{deg-1} x), cos(2^{deg-1} x)],
    using cos(z) = sin(z + pi/2).
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
    # HIGHEST precision: TPU matmuls default to bf16 passes, and the PE
    # phase z reaches ~2^L rad — bf16 rounding there corrupts sin(z)
    z = jnp.dot(x, jnp.asarray(proj), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return jnp.where(jnp.asarray(is_linear), z, jnp.sin(z + jnp.asarray(phase)))


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * 2 * degree
