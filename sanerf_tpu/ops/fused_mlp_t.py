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
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _divisor_block(n: int, unit: int, want: int) -> int:
    """Largest multiple of `unit` that is <= max(want, unit) AND divides
    `n`, or 0 if none exists. Feeding pallas a block that divides the
    point count exactly skips the pad-to-block concatenates — profiled
    ~7 ms/frame of pure HBM copy at 512^2 (the [3, N*T] f32 coordinate
    tensor is 75 MB; XLA loopifies the dl/ts/rays8 pads too)."""
    if n % unit:
        return 0
    m = n // unit
    k = max(1, min(m, want // unit))
    while m % k:
        k -= 1
    return k * unit


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


def extend_row_map_cp(row_map, n_cp: int):
    """Append CP-feature rows to the angle-doubling slab row map: the
    position feature is [freq_tight, cp] (fields.position_features), so the
    CP rows map to tight columns F..F+K-1, 8-padded."""
    F = max(r for r in row_map if r >= 0) + 1
    ext = list(row_map) + list(range(F, F + n_cp))
    while len(ext) % 8:
        ext.append(-1)
    return tuple(ext)


def _scale_off(R: int, bound: float):
    """[-bound, bound] -> [0, R-1] grid-coordinate affine."""
    return (R - 1) / (2.0 * bound), (R - 1) / 2.0


def _prep_grids(cp_lines, vm_planes, vm_lines, row_map, bound: float, dtype,
                sigma_cp_lines=None, sigma_vm_planes=None,
                sigma_vm_lines=None):
    """Normalize the factorized-grid tables into kernel operands.

    Returns (operand arrays, grid_info, extended row map) where grid_info
    = (cp level infos (R, K, scale, offset)..., vm level infos..., padded
    total rows, sigma-cp info or None, sigma-vm info or None). Operands:
    per-CP-level [3, K_i, R_i] transposed tables, then — per VM ladder
    level (coarse -> fine, single arrays accepted as a 1-level ladder) —
    [3, K, R, R] mode-major planes (axis order [m, k, row-axis (m+1)%3,
    col-axis (m+2)%3]) and [3, K, Rl] lines; then the DIRECT-density
    sigma tables in the same transposed forms. The appended feature rows
    follow position_features' concat order: [freq, cp levels..., vm
    levels x modes...]; the sigma tables add NO feature rows — their
    component-sum goes straight into the density output row
    (fields.sigma_grid_logit, TensoRF §4.1)."""
    ops = []
    cp_infos = ()
    k_total = 0
    if cp_lines is not None:
        levels = (list(cp_lines) if isinstance(cp_lines, (list, tuple))
                  else [cp_lines])
        k_total += sum(int(l.shape[2]) for l in levels)
        ops += [jnp.swapaxes(l, 1, 2).astype(dtype) for l in levels]
        cp_infos = tuple(
            (int(l.shape[1]), int(l.shape[2]), *_scale_off(l.shape[1], bound))
            for l in levels)
    vm_infos = ()
    if vm_planes is not None:
        plist = (list(vm_planes) if isinstance(vm_planes, (list, tuple))
                 else [vm_planes])
        llist = (list(vm_lines) if isinstance(vm_lines, (list, tuple))
                 else [vm_lines])
        for p, l in zip(plist, llist):
            _, R, _, K = p.shape
            Rl = l.shape[1]
            k_total += 3 * K
            ops.append(jnp.transpose(p, (0, 3, 1, 2)).astype(dtype))
            ops.append(jnp.swapaxes(l, 1, 2).astype(dtype))
            vm_infos += ((int(R), int(Rl), int(K), *_scale_off(R, bound),
                          *_scale_off(Rl, bound)),)
    sig_cp = None
    if sigma_cp_lines is not None:
        l = sigma_cp_lines
        # STACK the sigma rows onto a feature CP level with the same
        # resolution (same R -> identical grid-coordinate affine, so the
        # level's one-hot AND its MXU dot serve both tables): the separate
        # [Ks, R] @ [R, B] dot pads Ks up to the 128-row MXU tile — at the
        # serving student's CP96 + sigmaCP32 shapes stacking makes one
        # exactly-128-row dot per axis instead of two padded ones (half
        # the MACs, half the one-hot VPU builds).
        stk = next((i for i, li in enumerate(cp_infos)
                    if li[0] == int(l.shape[1])), None)
        if stk is not None:
            ops[stk] = jnp.concatenate(
                [ops[stk], jnp.swapaxes(l, 1, 2).astype(dtype)], axis=1)
            sig_cp = ("stk", stk, int(l.shape[2]))
        else:
            ops.append(jnp.swapaxes(l, 1, 2).astype(dtype))
            sig_cp = (int(l.shape[1]), int(l.shape[2]),
                      *_scale_off(l.shape[1], bound))
    sig_vm = None
    if sigma_vm_planes is not None:
        _, R, _, K = sigma_vm_planes.shape
        Rl = sigma_vm_lines.shape[1]
        ops.append(jnp.transpose(sigma_vm_planes, (0, 3, 1, 2)).astype(dtype))
        ops.append(jnp.swapaxes(sigma_vm_lines, 1, 2).astype(dtype))
        sig_vm = (int(R), int(Rl), int(K), *_scale_off(R, bound),
                  *_scale_off(Rl, bound))
    base_rows = len(row_map)
    row_map = extend_row_map_cp(row_map, k_total)
    info = (cp_infos, vm_infos, len(row_map) - base_rows, sig_cp, sig_vm)
    return ops, info, row_map


def _is_stacked_sig(sig_cp) -> bool:
    return isinstance(sig_cp, tuple) and len(sig_cp) and sig_cp[0] == "stk"


def _n_grid_ops(grid_info) -> int:
    """Number of pallas operands the grid_info describes (unpack helper
    for the kernels' *rest argument list). A sigma-CP table stacked onto
    a feature level rides that level's operand (no extra operand)."""
    cp_infos, vm_infos, _, sig_cp, sig_vm = grid_info
    return (len(cp_infos) + 2 * len(vm_infos)
            + (1 if sig_cp is not None and not _is_stacked_sig(sig_cp) else 0)
            + (2 if sig_vm is not None else 0))


def _prep_cp(cp_lines, row_map, bound: float, dtype):
    """Back-compat wrapper: CP-only grid prep."""
    return _prep_grids(cp_lines, None, None, row_map, bound, dtype)


def _cp_level(xT, cp_ref, level_info, f32_dots: bool):
    """In-kernel CP line features for ONE resolution level, transposed
    layout: tight [K, B] block (ops/cpgrid.py math — 1-D interpolation as
    a 2-nonzero one-hot [R, B] built from an iota compare, contracted
    with the resident [K, R] line table on the MXU)."""
    R, K, s, o = level_info
    B = xT.shape[1]
    u = jnp.clip(xT[:3] * s + o, 0.0, R - 1.0)  # [3, B] grid coords
    # 1-D interpolation one-hot as the HAT function max(0, 1 - |u - r|):
    # identical 2-nonzero columns, ~2x fewer VPU passes than the
    # floor/frac + two-iota-compare build (f32 math: bf16 can't carry u;
    # tpu.iota is integer-only, so build i32 and convert)
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0).astype(jnp.float32)
    feat = None
    for a in range(3):
        W = jnp.maximum(0.0, 1.0 - jnp.abs(iota - u[a : a + 1]))  # [R, B]
        la = cp_ref[a]  # [K, R]
        if f32_dots:
            la = la.astype(jnp.float32)
        else:
            W = W.astype(la.dtype)
        fa_feat = jax.lax.dot_general(
            la, W, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [K, B]
        feat = fa_feat if feat is None else feat * fa_feat
    return feat


def _vm_block(xT, p_ref, l_ref, vm_info, f32_dots: bool):
    """In-kernel VM plane+line features, transposed layout: tight [3K, B].

    Per mode m the bilinear plane sample is two contractions (see
    ops/vmgrid.py): an [R, R] plane slab against the col-axis one-hot
    [R, B] on the MXU, then a sublane-masked reduction against the
    row-axis one-hot on the VPU — per output feature k, so the [R, B]
    intermediate lives one k at a time in VMEM instead of an [R*K, B]
    slab. Line features ride the CP machinery (one [K, Rl] @ [Rl, B]
    dot per mode)."""
    R, Rl, K, s, o, sl, ol = vm_info
    B = xT.shape[1]

    def onehots(scale, off, res):
        u = jnp.clip(xT[:3] * scale + off, 0.0, res - 1.0)  # [3, B]
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (res, B), 0).astype(jnp.float32)
        # hat-function build (see _cp_level)
        return [jnp.maximum(0.0, 1.0 - jnp.abs(iota - u[a : a + 1]))
                for a in range(3)]

    Wp = onehots(s, o, R)
    Wl = onehots(sl, ol, Rl)
    feats = []
    for m in range(3):
        a, b = (m + 1) % 3, (m + 2) % 3
        lm = l_ref[m]  # [K, Rl]
        Wlm = Wl[m]
        Wa, Wb = Wp[a], Wp[b]
        if f32_dots:
            lm = lm.astype(jnp.float32)
        else:
            Wlm = Wlm.astype(lm.dtype)
            Wa = Wa.astype(lm.dtype)
            Wb = Wb.astype(lm.dtype)
        lf = jax.lax.dot_general(
            lm, Wlm, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [K, B]
        # k-CHUNKED plane contraction (round-4 hardware retune): one
        # [ck*R, R] @ [R, B] MXU dot per chunk instead of K separate
        # [R, R] @ [R, B] dots — same MACs, 4-8x fewer/bigger MXU ops.
        # Chunk size bounds the [ck*R, B] f32 slab in VMEM (~512 rows).
        c = min(K, max(1, 512 // R))
        Waf = Wa.astype(jnp.float32)
        rows = []
        for k0 in range(0, K, c):
            ck = min(c, K - k0)
            P = p_ref[m, k0:k0 + ck]  # [ck, R, R]: rows=axis a, cols=axis b
            if f32_dots:
                P = P.astype(jnp.float32)
            Z = jax.lax.dot_general(
                P.reshape(ck * R, R), Wb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [ck*R, B]
            rows.append(jnp.sum(Z.reshape(ck, R, B) * Waf[None], axis=1))
        pf = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
        feats.append(pf * lf)
    return feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=0)


def _grid_blocks(xT, refs, grid_info, f32_dots: bool):
    """-> (feat [Kp, B] | None, sigma [1, B] | None), every table read
    once: feature rows are the concatenated CP levels (coarse -> fine)
    then the VM modes, zero-padded to the 8-aligned row count the
    extended row map reserved; sigma is the DIRECT-density component sum
    (fields.sigma_grid_logit in-kernel — TensoRF §4.1). A sigma-CP table
    stacked onto a feature level (_prep_grids, same R) comes out of that
    level's single product as its trailing rows — one one-hot build and
    one MXU dot per axis serve both heads."""
    cp_infos, vm_infos, Kp, sig_cp, sig_vm = grid_info
    B = xT.shape[1]
    stk = sig_cp if _is_stacked_sig(sig_cp) else None
    feats = []
    sig = None
    for i, (r, li) in enumerate(zip(refs, cp_infos)):
        rows = _cp_level(xT, r, li, f32_dots)  # [K(+Ks if stacked), B]
        if stk is not None and stk[1] == i:
            K = li[1]
            feats.append(rows[:K])
            sig = jnp.sum(rows[K:], axis=0, keepdims=True)
        else:
            feats.append(rows)
    K = sum(li[1] for li in cp_infos)
    base = len(cp_infos)
    for j, vi in enumerate(vm_infos):  # VM ladder coarse -> fine
        feats.append(_vm_block(xT, refs[base + 2 * j],
                               refs[base + 2 * j + 1], vi, f32_dots))
        K += 3 * vi[2]
    pos = base + 2 * len(vm_infos)
    if sig_cp is not None and stk is None:
        f = _cp_level(xT, refs[pos], sig_cp, f32_dots)  # [Ks, B]
        s = jnp.sum(f, axis=0, keepdims=True)
        sig = s if sig is None else sig + s
        pos += 1
    if sig_vm is not None:
        f = _vm_block(xT, refs[pos], refs[pos + 1], sig_vm, f32_dots)
        s = jnp.sum(f, axis=0, keepdims=True)
        sig = s if sig is None else sig + s
    if Kp == 0:
        return None, sig
    if Kp > K:
        feats.append(jnp.zeros((Kp - K, B), feats[0].dtype))
    feat = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=0)
    return feat, sig


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
             transposed: bool = False, angle_double: bool = True,
             cp_lines=None, vm_planes=None, vm_lines=None,
             sigma_cp_lines=None, sigma_vm_planes=None,
             sigma_vm_lines=None) -> jax.Array:
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
    any_grid = (cp_lines is not None or vm_planes is not None
                or sigma_cp_lines is not None or sigma_vm_planes is not None)
    if any_grid:
        assert angle_double, "grid features require the angle-doubling encode"
    if angle_double:
        z0_projT, z0_phase, row_map = make_ad_consts(
            enc_freqs, float(np.pi / bound))
        cpT = cp_info = None
        if any_grid:
            cpT, cp_info, row_map = _prep_grids(
                cp_lines, vm_planes, vm_lines, row_map, bound, dtype,
                sigma_cp_lines=sigma_cp_lines,
                sigma_vm_planes=sigma_vm_planes,
                sigma_vm_lines=sigma_vm_lines)
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
                         interpret, ad_freqs=enc_freqs, cpT=cpT,
                         cp_info=cp_info)
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


def _encode_and_chain(dims, leaky, has_bias, ad_freqs, xT, w_ref, projT_ref,
                      phase_ref, lmask_ref, b_ref, f32_dots: bool = False,
                      last_bt: bool = False, cp=None, sig=None):
    """Shared kernel body: Fourier encode + the full MLP chain.
    Returns the LAST layer's f32 accumulator [kout, B] — or [B, kout] with
    `last_bt` (the last dot contracts over the LHS activation's leading dim
    instead of transposing the result afterwards: MXU handles transposed
    contractions natively, an explicit [kout, B] -> [B, kout] transpose per
    block profiled ~13 ms/frame).

    `sig` ([1, B] from _sigma_block, optional) adds the direct-density
    grid sum into the sigma output row (row 0 / col 0) before return.

    `f32_dots` (interpret/CPU mode): the CPU backend's DotThunk cannot
    execute bf16 x bf16 = f32 dots outside a fusion — cast operands to f32
    there; the TPU path keeps bf16 MXU feeds."""
    n = len(dims)
    act_dtype = jnp.float32 if f32_dots else w_ref.dtype
    wl = (lambda s: s.astype(jnp.float32)) if f32_dots else (lambda s: s)
    if ad_freqs:
        enc = _ad_encode(xT, projT_ref[:], phase_ref[:], ad_freqs)
    else:
        z = jnp.dot(projT_ref[:], xT, preferred_element_type=jnp.float32)
        lm = lmask_ref[:]
        enc = lm * z + (1.0 - lm) * jnp.sin(z + phase_ref[:])  # [Fp, B]
    if cp is not None:
        enc = jnp.concatenate([enc, cp.astype(enc.dtype)], axis=0)
    enc = enc.astype(act_dtype)
    h = enc
    for l, (kin_h, kin_e, kout) in enumerate(dims):
        if l == n - 1 and last_bt:
            assert not kin_e, "transposed last layer cannot be a skip layer"
            # [kin, B] x [kout, kin] -> [B, kout]: contract dim 0 of h with
            # dim 1 of the weight slab
            acc = jax.lax.dot_general(
                h, wl(w_ref[l, :kout, :kin_h]),
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if has_bias:
                acc = acc + b_ref[l, :kout, :].T
            if sig is not None:
                # [1, B] -> [B, 1] via the proven (X, 1, Y)->(X, Y, 1)
                # transpose pattern (same op the composite epilogue uses
                # for w_flat), then a lane-0 masked add
                B = acc.shape[0]
                sigT = jnp.transpose(
                    sig.reshape(1, 1, B), (0, 2, 1)).reshape(B, 1)
                col = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
                acc = acc + jnp.where(col == 0, sigT, 0.0)
            return acc
        acc = jnp.dot(wl(w_ref[l, :kout, :kin_h]), h,
                      preferred_element_type=jnp.float32)
        if kin_e:
            acc = acc + jnp.dot(
                wl(w_ref[l, :kout, kin_h : kin_h + kin_e]), enc,
                preferred_element_type=jnp.float32)
        if has_bias:
            acc = acc + b_ref[l, :kout, :]
        if l == n - 1:
            if sig is not None:
                row = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
                acc = acc + jnp.where(row == 0, sig, 0.0)
            return acc
        if leaky:
            acc = jnp.where(acc >= 0, acc, 0.01 * acc)
        else:
            acc = jnp.maximum(acc, 0.0)
        h = acc.astype(act_dtype)
    raise AssertionError


def _tmlp_kernel(dims: Tuple[Tuple[int, int, int], ...], leaky: bool,
                 has_bias: bool, out_rows: int, ad_freqs: int = 0,
                 cp_info=None, f32_dots: bool = False):
    n = len(dims)

    def kernel(xT_ref, w_ref, projT_ref, phase_ref, lmask_ref, *rest):
        # pallas arg order: inputs (incl. optional bias, cp lines), then
        # outputs
        pos = 0
        b_ref = None
        if has_bias:
            b_ref = rest[pos]
            pos += 1
        cp_refs = None
        if cp_info is not None:
            n_ops = _n_grid_ops(cp_info)
            cp_refs = rest[pos : pos + n_ops]
            pos += n_ops
        out_ref = rest[-1]
        xT = xT_ref[:].astype(jnp.float32)  # [8 or 3, B]
        cp, sig = ((None, None) if cp_info is None
                   else _grid_blocks(xT, cp_refs, cp_info, f32_dots))
        acc = _encode_and_chain(dims, leaky, has_bias, ad_freqs, xT, w_ref,
                                projT_ref, phase_ref, lmask_ref, b_ref,
                                f32_dots=f32_dots, cp=cp, sig=sig)
        kout = dims[-1][2]
        out_ref[:kout] = acc
        if out_rows > kout:
            out_ref[kout:] = jnp.zeros_like(out_ref[kout:])

    return kernel


def _sh_components_rt(x, y, z, degree: int):
    """Real-SH components on [R, 1] column vectors (ops/sh.py coefficients,
    shencoder.cu ordering), degrees 1-4."""
    one = jnp.ones_like(x)
    comps = [0.28209479177387814 * one]
    if degree >= 2:
        comps += [-0.48860251190291987 * y,
                  0.48860251190291987 * z,
                  -0.48860251190291987 * x]
    if degree >= 3:
        xy, xz, yz = x * y, x * z, y * z
        x2, y2, z2 = x * x, y * y, z * z
        comps += [1.0925484305920792 * xy,
                  -1.0925484305920792 * yz,
                  0.94617469575755997 * z2 - 0.31539156525251999,
                  -1.0925484305920792 * xz,
                  0.54627421529603959 * x2 - 0.54627421529603959 * y2]
    if degree >= 4:
        comps += [0.59004358992664352 * y * (-3.0 * x2 + y2),
                  2.8906114426405538 * xy * z,
                  0.45704579946446572 * y * (1.0 - 5.0 * z2),
                  0.3731763325901154 * z * (5.0 * z2 - 3.0),
                  0.45704579946446572 * x * (1.0 - 5.0 * z2),
                  1.4453057213202769 * z * (x2 - y2),
                  0.59004358992664352 * x * (-x2 + 3.0 * y2)]
    return comps


def pack_view_weights(view_layers, geo_dim: int, sh_dim: int, kout: int,
                      dtype=jnp.bfloat16):
    """Pack the per-RAY view MLP for the composite kernel's epilogue.

    The first layer's input [geo(15), sh(16)] splits into two mats so the
    kernel never concatenates: `vgeo` [kout, H] consumes the field-sum rows
    directly (row 0 — the composited sigma, not part of f_image — gets zero
    weight), `vsh` [sh_pad, H] the SH block. Remaining layers pad to one
    [L-1, Hp, Hp] stack (bias-free, fields init_mlp(bias=False))."""
    W1 = jnp.asarray(view_layers[0]["w"])  # [geo+sh, H]
    H = W1.shape[1]
    vgeo = jnp.zeros((kout, H), jnp.float32).at[1 : 1 + geo_dim].set(
        W1[:geo_dim])
    sh_pad = _round_up(sh_dim, 8)
    vsh = jnp.zeros((sh_pad, H), jnp.float32).at[:sh_dim].set(W1[geo_dim:])
    Hp = _round_up(H, 8)
    rest = []
    for p in view_layers[1:]:
        w = jnp.asarray(p["w"])  # [H, out]
        slab = jnp.zeros((Hp, Hp), jnp.float32)
        rest.append(slab.at[: w.shape[0], : w.shape[1]].set(w))
    return (vgeo.astype(dtype), vsh.astype(dtype),
            jnp.stack(rest).astype(dtype),
            (H, len(rest), sh_dim))


def _tmlp_composite_kernel(dims, leaky: bool, has_bias: bool, T: int,
                           opaque: bool, ad_freqs: int = 0,
                           f32_dots: bool = False,
                           view: Optional[Tuple[int, int, int]] = None,
                           cp_info=None, pack_q: int = 1):
    """Field chain + in-VMEM alpha compositing epilogue.

    The block covers R = B // T whole rays. After the last layer the
    [kout, B] activations pivot to [R, T, kout] (2-D transpose + leading
    split — both Mosaic-supported), weights come from the sigma lane via
    the MLP-family density activation (shifted softplus) + the
    triangular-matmul exclusive cumsum (ops/composite.py
    semantics), and the kernel emits per-RAY sums: the [kout, N*T] field
    tensor (0.5 GB/frame at 512^2) never exists in HBM.

    With `view = (n_rest, sh_dim, degree)` the per-RAY view branch runs in
    the same epilogue: SH components are evaluated on [R, 1] columns from
    the packed ray directions, the first view layer accumulates as
    gsum @ vgeo plus sh_dim rank-1 outer-product dots (no lane concat —
    Mosaic rejects assembling a [R, 16] SH tensor from computed columns),
    and the remaining layers are [R, H] @ [H, H] dots. The final RGB lands
    in aux lanes 2..4 (sigmoid applied; background blend stays in XLA)."""

    def kernel(xT_ref, dl_ref, ts_ref, w_ref, projT_ref, phase_ref,
               lmask_ref, *rest):
        pos = 0
        b_ref = None
        if has_bias:
            b_ref = rest[pos]
            pos += 1
        cp_refs = None
        if cp_info is not None:
            n_ops = _n_grid_ops(cp_info)
            cp_refs = rest[pos : pos + n_ops]
            pos += n_ops
        if view is not None:
            rays_ref, vgeo_ref, vsh_ref, vrest_ref = rest[pos : pos + 4]
            pos += 4
        gsum_ref, aux_ref = rest[-2], rest[-1]
        xT = xT_ref[:].astype(jnp.float32)  # [3 or 8, B]
        cp, sig = ((None, None) if cp_info is None
                   else _grid_blocks(xT, cp_refs, cp_info, f32_dots))
        acc = _encode_and_chain(dims, leaky, has_bias, ad_freqs, xT, w_ref,
                                projT_ref, phase_ref, lmask_ref, b_ref,
                                f32_dots, last_bt=True, cp=cp,
                                sig=sig)  # [B, kout]
        kout = dims[-1][2]
        B = acc.shape[0]
        R = B // T
        q = pack_q
        if q > 1:
            # PACKED epilogue: q rays' samples share one 128-lane row, so
            # the transcendental-heavy weights pipeline (softplus, two
            # exps, the cumsum matmul) runs at q*T/128 lane utilization
            # instead of T/128 (T=32: 25% -> 100%). dl/ts arrive
            # pre-packed [Rq, q*T, 1] from the ray kernels (_pack_rows) —
            # a (R, T) -> (Rq, qT) repack is a forbidden sublane->lane
            # merge in-kernel, but the producer has the planes in VMEM.
            Rq, qT = R // q, q * T
            hq = acc.reshape(Rq, qT, kout)
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kout), 2) == 0
            sigma_raw = jnp.sum(jnp.where(lane0, hq, 0.0), axis=2)  # [Rq,qT]
            s = sigma_raw - 1.0
            sigma = jnp.maximum(s, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(s)))
            dl = dl_ref[:, :, 0]  # [Rq, qT] natural load
            ds = dl * sigma
            lane_t = jax.lax.broadcasted_iota(jnp.int32, (Rq, qT), 1)
            if opaque:
                ds_a = jnp.where(lane_t % T == T - 1, jnp.inf, ds)
            else:
                ds_a = ds
            alphas = 1.0 - jnp.exp(-ds_a)
            i = jax.lax.broadcasted_iota(jnp.int32, (qT, qT), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (qT, qT), 1)
            # block-diagonal strict-upper triangle: rays don't mix
            tri = ((i < j) & (i // T == j // T)).astype(jnp.float32)
            cum = jnp.dot(ds, tri, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            w = alphas * jnp.exp(-cum)
            w = jnp.where(jnp.isnan(w), 0.0, w)  # [Rq, qT]
            # back to flat [B, 1] (lane->sublane pivot + leading merge),
            # then per-ray sums via leading-split + middle-axis reductions
            w_flat = jnp.transpose(
                w.reshape(Rq, 1, qT), (0, 2, 1)).reshape(B, 1)
            gsum = jnp.sum((acc * w_flat).reshape(R, T, kout), axis=1)
            wts = w * ts_ref[:, :, 0]
            wts_flat = jnp.transpose(
                wts.reshape(Rq, 1, qT), (0, 2, 1)).reshape(B, 1)
            depth = jnp.sum(wts_flat.reshape(R, T, 1), axis=1)  # [R, 1]
            wsum = jnp.sum(w_flat.reshape(R, T, 1), axis=1)
        else:
            h3 = acc.reshape(R, T, kout)  # whole rays per block
            # sigma from lane 0 via a masked lane-reduction (slice+squeeze
            # of a computed-layout value is not reliably supported)
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kout), 2) == 0
            sigma_raw = jnp.sum(jnp.where(lane0, h3, 0.0), axis=2)  # [R, T]
            # MLP-family density: shifted softplus, matching
            # fields.density_activation (this kernel only serves the MLP
            # fast path). Stable form = jax.nn.softplus's
            # max(x,0)+log1p(exp(-|x|)).
            s = sigma_raw - 1.0
            sigma = jnp.maximum(s, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(s)))
            dl = dl_ref[:]
            ds = dl * sigma
            if opaque:
                last = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1) == T - 1
                ds_a = jnp.where(last, jnp.inf, ds)
            else:
                ds_a = ds
            alphas = 1.0 - jnp.exp(-ds_a)
            i = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
            tri = (i < j).astype(jnp.float32)
            cum = jnp.dot(ds, tri, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            w = alphas * jnp.exp(-cum)
            w = jnp.where(jnp.isnan(w), 0.0, w)  # [R, T]
            # lane -> sublane pivot for the broadcast multiply
            w3 = jnp.transpose(w.reshape(R, 1, T), (0, 2, 1))  # [R, T, 1]
            gsum = jnp.sum(h3 * w3, axis=1)  # [R, kout]
            depth = jnp.sum(w * ts_ref[:], axis=1, keepdims=True)  # [R, 1]
            wsum = jnp.sum(w, axis=1, keepdims=True)
        gsum_ref[:, :kout] = gsum
        if gsum_ref.shape[1] > kout:
            gsum_ref[:, kout:] = jnp.zeros_like(gsum_ref[:, kout:])
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 8), 1)
        aux = (jnp.where(col == 0, depth, 0.0)
               + jnp.where(col == 1, wsum, 0.0))
        if view is not None:
            n_rest, sh_dim, degree = view
            vw = ((lambda s: s.astype(jnp.float32)) if f32_dots
                  else (lambda s: s))
            rays = rays_ref[:].astype(jnp.float32)  # [R, 8] (o, d, nf)
            dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
            inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-20)
            comps = _sh_components_rt(dx * inv, dy * inv, dz * inv, degree)
            gs = gsum.astype(vgeo_ref.dtype) if not f32_dots else gsum
            h = jax.lax.dot_general(
                gs, vw(vgeo_ref[:]), dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [R, H]
            # assemble the [R, sh_pad] SH row with lane selects (Mosaic
            # rejects lane-concat of computed columns but broadcasts +
            # selects are native), then ONE [R, sh_pad] @ [sh_pad, H] dot —
            # NOT sh_dim rank-1 MXU dots, which serialized ~16 tiny matmuls
            # per block and dominated the frame (56 ms -> see commit)
            sh_pad = vsh_ref.shape[0]
            shlane = jax.lax.broadcasted_iota(
                jnp.int32, (R, sh_pad), 1)
            shm = jnp.zeros((R, sh_pad), jnp.float32)
            for k in range(sh_dim):
                shm = shm + jnp.where(shlane == k, comps[k], 0.0)
            shm = (wsum * shm).astype(gs.dtype)
            h = h + jax.lax.dot_general(
                shm, vw(vsh_ref[:]),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for l in range(n_rest):
                a = jnp.maximum(h, 0.0).astype(gs.dtype)
                h = jax.lax.dot_general(
                    a, vw(vrest_ref[l]),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, h.shape[1]), 1)
            for c in range(3):
                ch = jnp.sum(jnp.where(lane == c, h, 0.0), axis=1,
                             keepdims=True)  # [R, 1]
                rgb_c = 1.0 / (1.0 + jnp.exp(-ch))
                aux = aux + jnp.where(col == 2 + c, rgb_c, 0.0)
        aux_ref[:] = aux

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dims", "leaky", "T", "opaque", "block", "out_rows",
                     "interpret", "ad_freqs", "view", "cp_info", "pack_q"),
)
def _run_tmlp_composite(xT, dl, ts, wstack, bias, projT, phase, lmask, dims,
                        leaky, T, opaque, block, out_rows, interpret,
                        ad_freqs=0, rays8=None, vgeo=None, vsh=None,
                        vrest=None, view=None, cpT=None, cp_info=None,
                        pack_q=1):
    NT = xT.shape[1]
    N = NT // T
    rows = xT.shape[0]
    q = pack_q
    assert block % (T * q) == 0, (block, T, q)
    NTp = _round_up(max(NT, block), block)
    if NTp != NT:
        # padded rays: dl = 0 -> w = 0 -> zero sums (harmless rows)
        xT = jnp.concatenate([xT, jnp.zeros((rows, NTp - NT), xT.dtype)], 1)
        if q > 1:  # dl/ts pre-packed [N//q, q*T, 1]
            pad = (NTp - NT) // (T * q)
            dl = jnp.concatenate(
                [dl, jnp.zeros((pad, q * T, 1), dl.dtype)], 0)
            ts = jnp.concatenate(
                [ts, jnp.zeros((pad, q * T, 1), ts.dtype)], 0)
        else:
            dl = jnp.concatenate(
                [dl, jnp.zeros(((NTp - NT) // T, T), dl.dtype)], 0)
            ts = jnp.concatenate(
                [ts, jnp.zeros(((NTp - NT) // T, T), ts.dtype)], 0)
        if rays8 is not None:
            rays8 = jnp.concatenate(
                [rays8, jnp.zeros(((NTp - NT) // T, rays8.shape[1]),
                                  rays8.dtype)], 0)
    R = block // T
    has_bias = bias is not None
    kern = _tmlp_composite_kernel(dims, leaky, has_bias, T, opaque, ad_freqs,
                                  f32_dots=interpret, view=view,
                                  cp_info=cp_info, pack_q=q)
    if q > 1:
        dlts_spec = pl.BlockSpec((R // q, q * T, 1), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        dlts_spec = pl.BlockSpec((R, T), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        dlts_spec,
        dlts_spec,
        pl.BlockSpec(wstack.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(projT.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(phase.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(lmask.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xT, dl, ts, wstack, projT, phase, lmask]
    if has_bias:
        in_specs.append(pl.BlockSpec(bias.shape, lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    if cp_info is not None:
        for t in cpT:
            in_specs.append(pl.BlockSpec(
                t.shape, lambda i, nd=t.ndim: (0,) * nd,
                memory_space=pltpu.VMEM))
            args.append(t)
    if view is not None:
        in_specs += [
            pl.BlockSpec((R, rays8.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vgeo.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vsh.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vrest.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [rays8, vgeo, vsh, vrest]
    gsum, aux = pl.pallas_call(
        kern,
        grid=(NTp // block,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((R, out_rows), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NTp // T, out_rows), jnp.float32),
            jax.ShapeDtypeStruct((NTp // T, 8), jnp.float32),
        ),
        interpret=interpret,
        **({} if interpret else
           dict(compiler_params=pltpu.CompilerParams(
               vmem_limit_bytes=100 * 1024 * 1024))),
    )(*args)
    return gsum[:N], aux[:N]


def run_tmlp_composite(xT, dl, ts, layers, enc_freqs: int, bound: float,
                       skip_layers: Sequence[int] = (), leaky: bool = False,
                       opaque: bool = True, block: int = 2048,
                       interpret: Optional[bool] = None,
                       angle_double: bool = True,
                       rays8=None, view_layers=None, sh_degree: int = 4,
                       cp_lines=None, vm_planes=None, vm_lines=None,
                       sigma_cp_lines=None, sigma_vm_planes=None,
                       sigma_vm_lines=None,
                       pack_q: int = 1, T: Optional[int] = None):
    """Final-level field query + alpha composite as ONE kernel.

    xT: [3, N*T] contracted sample coordinates (dims-first, the ray-kernel
    feed); dl/ts: [N, T] metric deltas / midpoints. Returns
    (gsum [N, out_rows] per-ray weighted field sums — col 0 is the
    composited sigma (unused), cols 1:1+geo the geo-feature sums —
    depth [N], weights_sum [N]).

    With `rays8` ([N, 8] packed rays, dirs in cols 3:6) and `view_layers`
    (the per-ray view MLP), the kernel also runs SH encode + the view MLP
    in its epilogue and the return gains `rgb` [N, 3] (sigmoid applied,
    background NOT blended): (gsum, depth, weights_sum, rgb).

    With `pack_q` > 1 the epilogue runs lane-packed (q rays per 128-lane
    row): dl/ts must then be the ray kernels' pre-packed [N//q, q*T, 1]
    outputs (ray_level0/ray_level pack_q=...) and `T` must be passed
    explicitly."""
    dtype = layers[0]["w"].dtype
    if not jnp.issubdtype(dtype, jnp.floating):
        dtype = jnp.float32
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if pack_q > 1:
        assert T is not None and dl.ndim == 3 and dl.shape[1] == pack_q * T
    else:
        T = dl.shape[1]
    # whole rays per block; on hardware the xT block's lane dim must also
    # be a multiple of 128 (Mosaic block-shape rule — interpret mode does
    # not enforce it, so e.g. T=24 -> block 4080 only fails on-chip).
    # Prefer a block that DIVIDES the point count: the pad-to-block
    # concatenates below copy the whole 75 MB coordinate tensor otherwise
    unit = T * pack_q
    if not interpret:
        unit = unit * 128 // math.gcd(unit, 128)
    exact = _divisor_block(xT.shape[1], unit, block)
    block = exact if exact else max(block // unit, 1) * unit
    view = None
    vgeo = vsh = vrest = None
    if view_layers is not None:
        assert rays8 is not None
        sh_dim = sh_degree * sh_degree
        kout_field = layers[-1]["w"].shape[1]  # sigma + geo rows (16)
        vgeo, vsh, vrest, (_Hv, n_rest, _) = pack_view_weights(
            view_layers, kout_field - 1, sh_dim, kout_field, dtype=dtype)
        view = (n_rest, sh_dim, sh_degree)
    any_grid = (cp_lines is not None or vm_planes is not None
                or sigma_cp_lines is not None or sigma_vm_planes is not None)
    if any_grid:
        assert angle_double, "grid features require the angle-doubling encode"
    if angle_double:
        z0_projT, z0_phase, row_map = make_ad_consts(
            enc_freqs, float(np.pi / bound))
        cpT = cp_info = None
        if any_grid:
            cpT, cp_info, row_map = _prep_grids(
                cp_lines, vm_planes, vm_lines, row_map, bound, dtype,
                sigma_cp_lines=sigma_cp_lines,
                sigma_vm_planes=sigma_vm_planes,
                sigma_vm_lines=sigma_vm_lines)
        wstack, bias, dims = pack_tmlp_traced(
            layers, len(row_map), skip_layers, dtype, enc_row_map=row_map)
        lmask = jnp.zeros((1, 1), jnp.float32)  # unused on this path
        gsum, aux = _run_tmlp_composite(
            xT.astype(jnp.float32), dl, ts, wstack, bias, z0_projT, z0_phase,
            lmask, dims, leaky, T, opaque, block,
            _round_up(dims[-1][2], 8), interpret, ad_freqs=enc_freqs,
            rays8=rays8, vgeo=vgeo, vsh=vsh, vrest=vrest, view=view,
            cpT=cpT, cp_info=cp_info, pack_q=pack_q)
    else:
        projT, phase, lmask, _ = make_enc_consts(
            enc_freqs, float(np.pi / bound))
        wstack, bias, dims = pack_tmlp_traced(
            layers, projT.shape[0], skip_layers, dtype)
        gsum, aux = _run_tmlp_composite(
            xT.astype(jnp.float32), dl, ts, wstack, bias, projT[:, :3], phase,
            lmask, dims, leaky, T, opaque, block,
            _round_up(dims[-1][2], 8), interpret,
            rays8=rays8, vgeo=vgeo, vsh=vsh, vrest=vrest, view=view,
            pack_q=pack_q)
    if view is not None:
        return gsum, aux[:, 0], aux[:, 1], aux[:, 2:5]
    return gsum, aux[:, 0], aux[:, 1]


@functools.partial(
    jax.jit,
    static_argnames=("dims", "leaky", "block", "out_rows", "interpret",
                     "ad_freqs", "cp_info"),
)
def _run_tmlp(xT, wstack, bias, projT, phase, lmask, dims, leaky,
              block, out_rows, interpret, ad_freqs=0, cpT=None,
              cp_info=None):
    N = xT.shape[1]
    rows = xT.shape[0]  # 8 (padded) or 3 (transposed feed)
    Np = _round_up(max(N, block), block)
    if Np != N:
        xT = jnp.concatenate([xT, jnp.zeros((rows, Np - N), xT.dtype)], axis=1)
    has_bias = bias is not None
    kern = _tmlp_kernel(dims, leaky, has_bias, out_rows, ad_freqs,
                        cp_info=cp_info, f32_dots=interpret)
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
    if cp_info is not None:
        for t in cpT:
            in_specs.append(pl.BlockSpec(
                t.shape, lambda i, nd=t.ndim: (0,) * nd,
                memory_space=pltpu.VMEM))
            args.append(t)
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
