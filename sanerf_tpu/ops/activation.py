"""Density activation: exp with input-clamped gradient.

Reference: activation.py:3-18 `_trunc_exp` — forward is fp32 exp(x), backward
is `g * exp(clamp(x, -15, 15))`, which prevents fp16/overflow blow-ups in the
density branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
