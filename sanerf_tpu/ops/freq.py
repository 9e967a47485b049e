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


@functools.partial(jax.jit, static_argnames=("degree",))
def freq_encode(x: jax.Array, degree: int = 4) -> jax.Array:
    """[..., D] -> [..., D * (1 + 2*degree)]."""
    x = x.astype(jnp.float32)
    out = [x]
    for f in range(degree):
        xf = x * (2.0**f)
        out.append(jnp.sin(xf))
        out.append(jnp.cos(xf))
    # interleave to per-dim blocks [x_d, sin.., cos..] matching encoding.py:36-41
    # encoding.py appends sin(freq*x) then cos(freq*x) over whole x per freq,
    # i.e. layout is [x(all dims), sin_f0(all dims), cos_f0(all dims), ...]
    return jnp.concatenate(out, axis=-1)


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * 2 * degree
