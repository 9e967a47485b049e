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
    deltas = real_bins[..., 1:] - real_bins[..., :-1]  # [N, T]
    ds = deltas * sigmas
    if opaque_background:
        ds = jnp.concatenate([ds[..., :-1], jnp.full_like(ds[..., -1:], jnp.inf)], axis=-1)
    alphas = 1.0 - jnp.exp(-ds)
    trans = jnp.cumsum(ds[..., :-1], axis=-1)
    trans = jnp.concatenate([jnp.zeros_like(trans[..., :1]), trans], axis=-1)
    trans = jnp.exp(-trans)
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
