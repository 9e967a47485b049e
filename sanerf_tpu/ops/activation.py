"""Density activations.

`trunc_exp` — exp with input-clamped gradient, the reference's density
activation (activation.py:3-18 `_trunc_exp`: forward fp32 exp(x), backward
`g * exp(clamp(x, -15, 15))`), used by the hashgrid family for parity.

`shifted_softplus` — the MLP-flagship density activation. The deep
Fourier-feature MLP is unstable under exp: d sigma/d logit = sigma, so a
hot region's gradients grow with its own density and a single overshoot
spirals the whole shared field into a dead (all-negative-logit) basin —
observed repeatedly at 12-14k steps even with global-norm clip 1.0.
Softplus has gradient <= 1 everywhere (the spiral cannot start), still
reaches sigma in the hundreds (alpha ~= 1 at any realistic step size),
and is what mip-NeRF 360-style MLP fields train with. Hash tables don't
need this: each entry sees sparse, local gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shifted_softplus(x: jax.Array) -> jax.Array:
    """softplus(x - 1): starts slightly transparent at init (f~0 ->
    sigma~0.31), exactly mip-NeRF 360's density parametrization."""
    return jax.nn.softplus(x.astype(jnp.float32) - 1.0)


@jax.custom_vjp
def trunc_exp(x: jax.Array) -> jax.Array:
    # forward input clamp: exp(15) ~ 3.3e6 density saturates any ray within
    # machine epsilon of alpha=1; without it a hot optimizer step can push
    # the density head past exp(88) -> inf -> NaN loss (observed on TPU)
    return jnp.exp(jnp.clip(x.astype(jnp.float32), -15.0, 15.0))


def _trunc_exp_fwd(x):
    return trunc_exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x.astype(jnp.float32), -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
