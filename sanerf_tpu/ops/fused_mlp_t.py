"""Transposed-layout fused field MLP: encode + full chain in one Pallas
kernel, activations [width, B] with POINTS IN LANES.

Why transposed (profiled on v5e, 512^2 frame):
- The XLA dot chain is HBM-floor-bound: every [N, 256] activation round-
  trips HBM between layers (~64 GB/frame -> >=84 ms no matter the MFU).
  Keeping the chain in VMEM needs a fused kernel.
- The first fused attempt (ops/fused_mlp.py) kept point-major [B, F]
  layout: the Fourier encode's sin ran on a 128-lane-PADDED tensor (F=39
  real lanes of 128 -> 3.3x wasted VPU work, ~96 ms/frame) and its
  [B, 8] @ [8, F] HIGHEST-precision dot cost another ~55 ms.
- Transposing fixes both structurally: activations are [width, B], the
  encode is [F, B] — every row is DENSE in lanes, sin does exactly F*B
  work; all matmuls are plain 2-D [out, in] @ [in, B] MXU ops; skip
  connections become a second dot over the encoding rows (no concat).

Inputs arrive pre-transposed ([8, N] coordinates, a cheap XLA transpose of
[N, 3]) and the output stays transposed ([out_pad, N], out_pad = 8/16
sublanes instead of a 128-lane-padded [N, out] tensor — 8x less HBM).

Replaces the hot path of gridencoder+MLP for the TPU-native MLP field
family (reference consumption: nerf/network.py:221-229, 248-259).
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


def make_enc_consts(enc_freqs: int, scale: float):
    """Transposed Fourier-encode constants (ops/freq.py column order, rows
    here): projT [Fp, 8], phase/linear-mask column vectors [Fp, 1]."""
    D = 3
    F = D * (1 + 2 * enc_freqs)
    Fp = _round_up(F, 8)
    projT = np.zeros((Fp, 8), np.float32)
    phase = np.zeros((Fp, 1), np.float32)
    lmask = np.zeros((Fp, 1), np.float32)
    projT[:D, :D] = np.eye(D) * scale
    lmask[:D] = 1.0
    row = D
    for f in range(enc_freqs):
        projT[row : row + D, :D] = (2.0**f) * np.eye(D) * scale
        row += D
        projT[row : row + D, :D] = (2.0**f) * np.eye(D) * scale
        phase[row : row + D] = np.pi / 2
        row += D
    return jnp.asarray(projT), jnp.asarray(phase), jnp.asarray(lmask), F


def make_ad_consts(enc_freqs: int, scale: float):
    """Angle-doubling encode constants: the base-frequency slab generator
    and the slab-layout row map.

    Direct sin on the full [F, B] encoding costs ~12 VPU ops per row; with
    sin/cos computed once at the base frequency and higher frequencies via
    the doubling recurrence (s' = 2sc, c' = c^2 - s^2) the transcendental
    work drops to ONE masked sin on an [8, B] slab plus 4 cheap elementwise
    ops per extra frequency. Rows are organized in 8-aligned slabs
    [lin x3, pad5][s_f x3, c_f x3, pad2]... so every in-kernel concat is
    sublane-aligned (unaligned concats crash Mosaic).

    Returns (z0_projT [8, 3], z0_phase [8, 1], row_map) where row_map maps
    each slab row to the tight make_enc_consts column (or -1 for padding).
    """
    z0_projT = np.zeros((8, 3), np.float32)
    z0_phase = np.zeros((8, 1), np.float32)
    z0_projT[:3, :3] = np.eye(3) * scale
    z0_projT[3:6, :3] = np.eye(3) * scale
    z0_phase[3:6] = np.pi / 2
    # tight column order (ops/freq.py): [x,y,z, s0(3), c0(3), s1(3), c1(3)..]
    row_map = [0, 1, 2, -1, -1, -1, -1, -1]  # lin slab
    for f in range(enc_freqs):
        base = 3 + 6 * f
        row_map += [base, base + 1, base + 2,          # s_f
                    base + 3, base + 4, base + 5,      # c_f
                    -1, -1]
    return (jnp.asarray(z0_projT), jnp.asarray(z0_phase), tuple(row_map))


def _ad_encode(xT, z0_projT, z0_phase, n_freqs: int):
    """xT [3 or 8, B] -> [8*(n_freqs+1), B] slab-layout encoding."""
    z0 = jnp.dot(z0_projT, xT,
                 preferred_element_type=jnp.float32)  # [8, B] base args
    slabs = [z0]  # lin slab: rows 0-2 = scale*x (weights zero the rest)
    s_c = jnp.sin(z0 + z0_phase)  # rows 0-2 = sin, 3-5 = cos (phase pi/2)
    slabs.append(s_c)
    for _ in range(1, n_freqs):
        s = s_c[0:3]
        c = s_c[3:6]
        s_c = jnp.concatenate(
            [2.0 * s * c, c * c - s * s, s_c[6:8]], axis=0)
        slabs.append(s_c)
    return jnp.concatenate(slabs, axis=0)


def pack_tmlp(layers, enc_pad: int, skip_layers: Sequence[int] = (),
              dtype=jnp.bfloat16):
    """Pack [in, out]-layout layers into one transposed stack [L, Np, Kp].

    Row r, col c of layer l holds W_l[c, r] (i.e. each slab is W_l^T).
    Skip layers store their hidden-input block at cols [0, hidden) and
    their encoding block at cols [hidden, hidden + enc_pad) — the kernel
    contracts the two blocks with separate dots instead of concatenating
    activations. Returns (stack, dims) with dims[l] = (kin_h, kin_e, kout):
    kin_e > 0 marks a skip layer.
    """
    dims = []
    prev = None
    n = len(layers)
    for l, p in enumerate(layers):
        w = np.asarray(p["w"], np.float32)
        if l == 0:
            dims.append((enc_pad, 0, w.shape[1]))
        elif l in skip_layers:
            hidden = prev
            assert w.shape[0] > hidden
            dims.append((hidden, enc_pad, w.shape[1]))
        else:
            dims.append((w.shape[0], 0, w.shape[1]))
        prev = w.shape[1]
    Np = _round_up(max(d[2] for d in dims), 8)
    Kp = _round_up(max(d[0] + d[1] for d in dims), 8)
    stack = np.zeros((n, Np, Kp), np.float32)
    has_bias = any("b" in p for p in layers)
    bias = np.zeros((n, Np, 1), np.float32) if has_bias else None
    for l, p in enumerate(layers):
        w = np.asarray(p["w"], np.float32)
        kin_h, kin_e, kout = dims[l]
        if kin_e:  # skip layer: [hidden + enc_real, out] -> two blocks
            hidden = kin_h
            stack[l, :kout, :hidden] = w[:hidden].T
            enc_real = w.shape[0] - hidden
            stack[l, :kout, hidden : hidden + enc_real] = w[hidden:].T
        else:
            stack[l, :kout, : w.shape[0]] = w.T
        if has_bias:
            bias[l, :kout, 0] = np.asarray(p.get("b", np.zeros(kout)), np.float32)
    return (jnp.asarray(stack, dtype),
            None if bias is None else jnp.asarray(bias),
            tuple(dims))


def tmlp_dims(shapes: Sequence[Tuple[int, int]], enc_pad: int,
              skip_layers: Sequence[int] = ()):
    """Static dims (kin_h, kin_e, kout) per layer from [in, out] shapes."""
    dims = []
    prev = None
    for l, (fin, fout) in enumerate(shapes):
        if l == 0:
            dims.append((enc_pad, 0, fout))
        elif l in skip_layers:
            dims.append((prev, enc_pad, fout))
        else:
            dims.append((fin, 0, fout))
        prev = fout
    return tuple(dims)


def pack_tmlp_traced(layers, enc_pad: int, skip_layers: Sequence[int] = (),
                     dtype=jnp.bfloat16, enc_row_map=None):
    """Traceable variant of pack_tmlp: pure jnp pad/transpose/stack, so the
    stack can be built inside a jitted function from traced params (XLA
    const-folds / hoists it — the weights are ~1 MB).

    `enc_row_map` (angle-doubling layout): for every padded encoding row,
    the tight encoding column its weight comes from, or -1 for a padding
    row (weight zero). Applied to layer 0 and to skip layers' encoding
    blocks."""

    def expand_enc(w_e):
        # [out, F_tight] -> [out, len(row_map)] with zeros at padding rows
        idx = np.asarray(enc_row_map)
        safe = np.clip(idx, 0, w_e.shape[1] - 1)
        mask = (idx >= 0).astype(w_e.dtype)
        return w_e[:, safe] * mask[None, :]

    shapes = [tuple(np.asarray(p["w"].shape)) for p in layers]
    dims = tmlp_dims(shapes, enc_pad, skip_layers)
    Np = _round_up(max(d[2] for d in dims), 8)
    Kp = _round_up(max(d[0] + d[1] for d in dims), 8)
    slabs, bias_rows = [], []
    has_bias = any("b" in p for p in layers)
    for l, p in enumerate(layers):
        w = jnp.asarray(p["w"]).T  # [out, in]
        kin_h, kin_e, kout = dims[l]
        if l == 0 and enc_row_map is not None:
            w = expand_enc(w)
        if kin_e:  # split the skip layer's input block at the hidden width
            hidden = kin_h
            wh, we = w[:, :hidden], w[:, hidden:]
            if enc_row_map is not None:
                we = expand_enc(we)
            w = jnp.concatenate(
                [wh, we, jnp.zeros((w.shape[0], kin_e - we.shape[1]), w.dtype)],
                axis=1)
        slab = jnp.zeros((Np, Kp), w.dtype)
        slab = slab.at[: w.shape[0], : w.shape[1]].set(w)
        slabs.append(slab)
        if has_bias:
            b = jnp.asarray(p.get("b", jnp.zeros((kout,))))
            bias_rows.append(
                jnp.concatenate([b, jnp.zeros((Np - kout,), b.dtype)])[:, None])
    stack = jnp.stack(slabs).astype(dtype)
    bias = jnp.stack(bias_rows).astype(jnp.float32) if has_bias else None
    return stack, bias, dims


def run_tmlp(x, layers, enc_freqs: int, bound: float,
             skip_layers: Sequence[int] = (), leaky: bool = False,
             block: int = 2048, interpret: Optional[bool] = None,
             transposed: bool = False, angle_double: bool = True) -> jax.Array:
    """One-shot traceable entry: x [N, 3] (or [3, N] with `transposed`) ->
    [out_pad, N] f32 transposed outputs. Packs in-trace (pack_tmlp_traced);
    usable inside run_rays. Feeding [3, N] avoids both the XLA transpose
    and the 8-row zero-pad concat (a 3-sublane block loads fine).

    `angle_double` computes the Fourier features with one base-frequency
    sin and the doubling recurrence instead of a dense sin over every
    encoding row (see make_ad_consts) — ~3x less transcendental work, at
    the cost of slightly wider (8-aligned slab) first-layer weights."""
    dtype = layers[0]["w"].dtype
    if not jnp.issubdtype(dtype, jnp.floating):
        dtype = jnp.float32
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if angle_double:
        z0_projT, z0_phase, row_map = make_ad_consts(
            enc_freqs, float(np.pi / bound))
        wstack, bias, dims = pack_tmlp_traced(
            layers, len(row_map), skip_layers, dtype, enc_row_map=row_map)
        out_rows = _round_up(dims[-1][2], 8)
        if transposed:
            xT = x.astype(jnp.float32)
        else:
            xT = jnp.concatenate(
                [x.T.astype(jnp.float32),
                 jnp.zeros((5, x.shape[0]), jnp.float32)], axis=0)
        lmask = jnp.zeros((1, 1), jnp.float32)  # unused on this path
        if xT.shape[0] > 3:  # 8-row padded feed: pad the projector's cols
            z0_projT = jnp.concatenate(
                [z0_projT, jnp.zeros((8, xT.shape[0] - 3), jnp.float32)],
                axis=1)
        return _run_tmlp(xT, wstack, bias, z0_projT,
                         z0_phase, lmask, dims, leaky, block, out_rows,
                         interpret, ad_freqs=enc_freqs)
    projT, phase, lmask, _ = make_enc_consts(enc_freqs, float(np.pi / bound))
    wstack, bias, dims = pack_tmlp_traced(layers, projT.shape[0], skip_layers,
                                          dtype)
    out_rows = _round_up(dims[-1][2], 8)
    if transposed:
        xT = x.astype(jnp.float32)
        projT = projT[:, :3]
    else:
        xT = jnp.concatenate(
            [x.T.astype(jnp.float32), jnp.zeros((5, x.shape[0]), jnp.float32)],
            axis=0)
    return _run_tmlp(xT, wstack, bias, projT, phase, lmask, dims, leaky,
                     block, out_rows, interpret)


def _tmlp_kernel(dims: Tuple[Tuple[int, int, int], ...], leaky: bool,
                 has_bias: bool, out_rows: int, ad_freqs: int = 0):
    n = len(dims)

    def kernel(xT_ref, w_ref, projT_ref, phase_ref, lmask_ref, *rest):
        # pallas arg order: inputs (incl. optional bias), then outputs
        b_ref = rest[0] if has_bias else None
        out_ref = rest[-1]
        xT = xT_ref[:].astype(jnp.float32)  # [8 or 3, B]
        if ad_freqs:
            enc = _ad_encode(xT, projT_ref[:], phase_ref[:], ad_freqs)
        else:
            z = jnp.dot(projT_ref[:], xT, preferred_element_type=jnp.float32)
            lm = lmask_ref[:]
            enc = lm * z + (1.0 - lm) * jnp.sin(z + phase_ref[:])  # [Fp, B]
        enc = enc.astype(w_ref.dtype)
        h = enc
        for l, (kin_h, kin_e, kout) in enumerate(dims):
            acc = jnp.dot(w_ref[l, :kout, :kin_h], h,
                          preferred_element_type=jnp.float32)
            if kin_e:
                acc = acc + jnp.dot(
                    w_ref[l, :kout, kin_h : kin_h + kin_e], enc,
                    preferred_element_type=jnp.float32)
            if has_bias:
                acc = acc + b_ref[l, :kout, :]
            if l == n - 1:
                out_ref[:kout] = acc
                if out_rows > kout:
                    out_ref[kout:] = jnp.zeros_like(out_ref[kout:])
                return
            if leaky:
                acc = jnp.where(acc >= 0, acc, 0.01 * acc)
            else:
                acc = jnp.maximum(acc, 0.0)
            h = acc.astype(w_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dims", "leaky", "block", "out_rows", "interpret",
                     "ad_freqs"),
)
def _run_tmlp(xT, wstack, bias, projT, phase, lmask, dims, leaky,
              block, out_rows, interpret, ad_freqs=0):
    N = xT.shape[1]
    rows = xT.shape[0]  # 8 (padded) or 3 (transposed feed)
    Np = _round_up(max(N, block), block)
    if Np != N:
        xT = jnp.concatenate([xT, jnp.zeros((rows, Np - N), xT.dtype)], axis=1)
    has_bias = bias is not None
    kern = _tmlp_kernel(dims, leaky, has_bias, out_rows, ad_freqs)
    in_specs = [
        pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(wstack.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(projT.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(phase.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(lmask.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xT, wstack, projT, phase, lmask]
    if has_bias:
        in_specs.append(pl.BlockSpec(bias.shape, lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    out = pl.pallas_call(
        kern,
        grid=(Np // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_rows, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, Np), jnp.float32),
        interpret=interpret,
        **({} if interpret else
           dict(compiler_params=pltpu.CompilerParams(
               vmem_limit_bytes=100 * 1024 * 1024))),
    )(*args)
    return out[:, :N]


class TransposedFieldMLP:
    """Packed encode+MLP pipeline in transposed layout.

    Usage:
        tm = TransposedFieldMLP(layers, enc_freqs, bound, skip_layers=(4,),
                                leaky=True)
        outT = tm(x)   # x [N, 3] -> [out_pad, N] f32 (row 0 = sigma, ...)
    """

    def __init__(self, layers, enc_freqs: int, bound: float,
                 skip_layers: Sequence[int] = (), leaky: bool = False,
                 block: int = 2048, dtype=jnp.bfloat16,
                 interpret: Optional[bool] = None):
        self.projT, self.phase, self.lmask, self.enc_real = make_enc_consts(
            enc_freqs, float(np.pi / bound))
        enc_pad = self.projT.shape[0]
        self.wstack, self.bias, self.dims = pack_tmlp(
            layers, enc_pad, skip_layers, dtype)
        self.leaky = leaky
        self.block = block
        self.out_dim = self.dims[-1][2]
        self.out_rows = _round_up(self.out_dim, 8)
        self.interpret = (jax.default_backend() == "cpu") if interpret is None \
            else interpret

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [N, 3] raw coordinates -> [out_pad, N] f32 (transposed)."""
        xT = jnp.concatenate(
            [x.T.astype(jnp.float32), jnp.zeros((5, x.shape[0]), jnp.float32)],
            axis=0)
        return _run_tmlp(xT, self.wstack, self.bias, self.projT, self.phase,
                         self.lmask, self.dims, self.leaky, self.block,
                         self.out_rows, self.interpret)
