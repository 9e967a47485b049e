"""Alpha compositing for dense fixed-length samples.

Reference: nerf/renderer.py:309-345. A pure cumsum/exp formulation — on TPU
this is a single fused VPU chain; no ray compaction or early termination
(the proposal hierarchy already bounds samples per ray at 32 on the final
level, so dense compositing is cheaper than data-dependent control flow).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def cumsum_lanes(x: jax.Array, strict: bool = False) -> jax.Array:
    """Cumulative sum over the trailing (lane) axis via a triangular-ones
    matmul on the MXU. XLA lowers jnp.cumsum to reduce_window, profiled at
    ~50 GB/s (16 ms/frame); as an [N, T] @ [T, T] HIGHEST-precision dot the
    same result costs ~0.3 ms for T<=129. Differentiable (it's a dot)."""
    T = x.shape[-1]
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    m = ((i < j) if strict else (i <= j)).astype(x.dtype)
    return jnp.dot(x, m, preferred_element_type=x.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def compute_weights(
    real_bins: jax.Array,
    sigmas: jax.Array,
    opaque_background: bool = False,
) -> jax.Array:
    """sigma -> compositing weights.

    Args:
      real_bins: [N, T+1] metric bin edges along the ray.
      sigmas: [N, T] densities.
      opaque_background: force the last sample opaque (the
        `background == 'last_sample'` mode, renderer.py:314-316).

    Returns weights [N, T].
    """
    return compute_weights_from_deltas(
        real_bins[..., 1:] - real_bins[..., :-1], sigmas, opaque_background)


def compute_weights_from_deltas(
    deltas: jax.Array,
    sigmas: jax.Array,
    opaque_background: bool = False,
) -> jax.Array:
    """compute_weights when the caller already has the metric deltas (the
    ray-geometry kernels emit them directly)."""
    ds = deltas * sigmas
    if opaque_background:
        # alphas see an opaque last sample; the transmittance cumsum keeps
        # the FINITE ds (the strict-triangular matmul would turn inf into
        # inf*0 = NaN in masked columns, and the last column never needs it)
        last = jnp.arange(ds.shape[-1]) == ds.shape[-1] - 1
        ds_a = jnp.where(last, jnp.inf, ds)
    else:
        ds_a = ds
    alphas = 1.0 - jnp.exp(-ds_a)
    trans = jnp.exp(-cumsum_lanes(ds, strict=True))
    weights = alphas * trans
    return jnp.nan_to_num(weights)


def composite(
    weights: jax.Array, rays_t: jax.Array, values: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Composite depth and per-sample values (renderer.py:332-345).

    Returns (weights_sum [N], depth [N], value_sum [N, C]).
    """
    weights_sum = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * rays_t, axis=-1)
    value_sum = jnp.sum(weights[..., None] * values, axis=-2)
    return weights_sum, depth, value_sum
