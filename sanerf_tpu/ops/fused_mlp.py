"""Fused field-MLP Pallas kernel: encoding + all layers in one pass.

The interactive-path hot op. The XLA version round-trips every layer's
activations through HBM ([2.1M, 256] bf16 = 1 GB per layer per direction —
profiled at ~20 ms/layer, 7% MXU); this kernel keeps the whole stack in
VMEM:

  grid over point blocks; per block:
    x [B, 3] -> Fourier features (sin on the VPU, matmul-formulated like
    ops/freq.py) -> L x (matmul on the MXU + ReLU) with an optional input
    skip concat -> out [B, out_dim]

  weights for all layers live in VMEM for the whole kernel (<= ~1.3 MB
  bf16 for the 8x256 field), so HBM traffic is exactly input + output.

Inference-only (the training step uses the XLA path where autodiff and
remat matter more than latency); used by the renderer when
`model.cfg.use_fused_kernels` and not under grad.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_mlp_weights(
    layers: Sequence[dict],
    enc_dim: int,
    skip_layers: Tuple[int, ...] = (),
    dtype=jnp.bfloat16,
):
    """Stack per-layer weight matrices into one zero-padded [L, K, W] array.

    Row layout per layer l: rows [0, in_l) hold W_l; for skip layers the
    reference concatenates [h, enc], so rows [0, W) map h and rows
    [W, W+enc_dim) map enc. K = max padded input dim; out columns pad to W.
    """
    L = len(layers)
    widths = [np.asarray(l["w"]).shape for l in layers]
    W = max(s[1] for s in widths)  # hidden width (>= out_dim)
    K = _round_up(max(s[0] for s in widths), 128)
    stack = np.zeros((L, K, _round_up(W, 128)), np.float32)
    for i, l in enumerate(layers):
        w = np.asarray(l["w"], np.float32)
        stack[i, : w.shape[0], : w.shape[1]] = w
    return jnp.asarray(stack, dtype)


def make_enc_mats(enc_freqs: int, scale: float):
    """Fourier-encoding projection/phase/mask (matmul formulation, matching
    ops/freq.py exactly), padded to lane width."""
    D = 3
    F = D * (1 + 2 * enc_freqs)
    Fp = _round_up(F, 128)
    proj = np.zeros((8, Fp), np.float32)  # 3 rows used; 8 = sublane pad
    phase = np.zeros((Fp,), np.float32)
    linear_mask = np.zeros((Fp,), np.float32)
    proj[:D, :D] = np.eye(D) * scale
    linear_mask[:D] = 1.0
    col = D
    for f in range(enc_freqs):
        proj[:D, col : col + D] = (2.0**f) * np.eye(D) * scale
        col += D
        proj[:D, col : col + D] = (2.0**f) * np.eye(D) * scale
        phase[col : col + D] = np.pi / 2
        col += D
    return (jnp.asarray(proj), jnp.asarray(phase), jnp.asarray(linear_mask), F)


@functools.partial(
    jax.jit,
    static_argnames=("n_layers", "enc_dim", "hidden", "out_dim", "skip_layer",
                     "block"),
)
def fused_field_mlp(
    x: jax.Array,  # [N, 3] coordinates (already in [-bound, bound])
    wstack: jax.Array,  # [L, K, Wp] packed weights (bf16)
    proj: jax.Array,  # [8, Fp]
    phase: jax.Array,  # [Fp]
    linear_mask: jax.Array,  # [Fp]
    n_layers: int,
    enc_dim: int,
    hidden: int,
    out_dim: int,
    skip_layer: int = -1,
    block: int = 2048,
) -> jax.Array:
    """-> [N, out_dim] f32. Zero-pads N to the block size internally."""
    N = x.shape[0]
    Np = _round_up(max(N, block), block)
    if Np != N:
        x = jnp.concatenate([x, jnp.zeros((Np - N, 3), x.dtype)], 0)
    # pad coords into 8 lanes so the in-kernel [B, 8] @ [8, Fp] is tiled
    x8 = jnp.concatenate([x, jnp.zeros((Np, 5), x.dtype)], 1)

    L, K, Wp = wstack.shape
    Fp = proj.shape[1]

    def kernel(x_ref, w_ref, proj_ref, phase_ref, lmask_ref, out_ref):
        xb = x_ref[:].astype(jnp.float32)  # [B, 8]
        # HIGHEST precision: the PE phase needs full f32 (see ops/freq.py)
        z = jnp.dot(xb, proj_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [B, Fp]
        lm = lmask_ref[:]
        enc = lm * z + (1.0 - lm) * jnp.sin(z + phase_ref[:])
        enc = enc.astype(wstack.dtype)

        h = None
        for l in range(n_layers):
            if l == 0:
                inp = enc  # [B, Fp] (rows beyond enc_dim are zero)
            elif l == skip_layer:
                # [h, enc] concat, padded to K columns
                inp = jnp.concatenate([h, enc], axis=1)[:, :K]
            else:
                inp = h
            kin = inp.shape[1]
            acc = jnp.dot(inp, w_ref[l, :kin, :],
                          preferred_element_type=jnp.float32)
            if l != n_layers - 1:
                if skip_layer >= 0:
                    # SkipConnMLP uses LeakyReLU(0.01) (network.py:72)
                    acc = jnp.where(acc >= 0, acc, 0.01 * acc)
                else:
                    acc = jnp.maximum(acc, 0.0)
            h = acc.astype(wstack.dtype)
        out_ref[:] = h.astype(jnp.float32)

    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        grid=(Np // block,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, K, Wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Wp), jnp.float32),
    )(x8, wstack, proj, phase, linear_mask)
    return out[:N, :out_dim]


class FusedFieldMLP:
    """Packed-weight wrapper bound to one MLP parameter tree."""

    def __init__(self, layers, enc_freqs: int, bound: float,
                 skip_layers: Tuple[int, ...] = (), dtype=jnp.bfloat16):
        self.n_layers = len(layers)
        self.skip_layer = skip_layers[0] if skip_layers else -1
        w0 = np.asarray(layers[0]["w"])
        self.enc_dim = w0.shape[0]
        self.hidden = max(np.asarray(l["w"]).shape[1] for l in layers)
        self.out_dim = np.asarray(layers[-1]["w"]).shape[1]
        self.wstack = pack_mlp_weights(layers, self.enc_dim, skip_layers, dtype)
        self.proj, self.phase, self.lmask, F = make_enc_mats(
            (self.enc_dim // 3 - 1) // 2, float(np.pi / bound)
        )
        assert F == self.enc_dim, (F, self.enc_dim)

    def __call__(self, x: jax.Array, block: int = 2048) -> jax.Array:
        return fused_field_mlp(
            x, self.wstack, self.proj, self.phase, self.lmask,
            n_layers=self.n_layers, enc_dim=self.enc_dim, hidden=self.hidden,
            out_dim=self.out_dim, skip_layer=self.skip_layer, block=block,
        )
