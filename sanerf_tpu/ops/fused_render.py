"""Fused TPU inference renderer: the whole proposal->field->composite
pipeline as one Pallas kernel per sampling level.

Why (measured on v5e, 512^2 frame at num_steps=(128,64,32)):
- The XLA `run_rays` path costs ~395 ms of device time (~11% MFU) even
  though its MLP GEMMs run at 185 TFLOP/s in isolation. The frame drowns in
  HBM round trips: f32 [2.1M, 256] activations per layer, sample_pdf's
  [N, T, K] broadcast tensors, and relayouts between ray-major and
  point-major shapes.
- Here each level's entire computation lives in VMEM. HBM traffic becomes
  rays in, per-ray weights/bins between levels, pixels out.

Layout strategy, per grid block of R rays:
- ray-space math (bins, deltas, compositing) in [R, T] with T in lanes;
- point-space math (encode, MLP) in [P=R*T, C] row-major point-major form,
  so [R, T] <-> [P, 1] reshapes are the only relayouts (<= P elements);
- cumulative sums (transmittance, CDF) lower to triangular matmuls on the
  MXU instead of sequential scans;
- inverse-CDF resampling is gather-free: the piecewise-linear inverse CDF
  F^-1(u) = b0 + sum_i db_i * clamp((u - c_i)/dc_i, 0, 1) evaluates as one
  [R, K, T0] broadcast with a lane reduction (exactly equal to the masked
  one-hot interpolation in ops/sampling.py:sample_pdf for a sorted CDF).

Semantics match `models/renderer.py:run_rays` at inference (training=False,
perturb=False), which itself rebuilds nerf/renderer.py:221-464. Inference
only - no VJP; the training step keeps the differentiable XLA path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sanerf_tpu.ops.fused_mlp import make_enc_mats
from sanerf_tpu.ops.sampling import near_far_from_aabb, spacing_fn

_HIGHEST = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# in-kernel math helpers (all shapes static)
# ---------------------------------------------------------------------------


def _spacing_inv(x):
    """Inverse of the mixed linear+lindisp warp (ops/sampling.py:78)."""
    return jnp.where(x < 0.5, 2.0 * x, 1.0 / jnp.maximum(2.0 - 2.0 * x, 1e-12))


def _contract_planes(x, y, z):
    """mip-NeRF-360 L-inf contraction on [R, T] coordinate planes.

    Mirrors ops/sampling.py:contract including the argmax-first tie-break
    (x wins over y wins over z)."""
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    mag = jnp.maximum(jnp.maximum(ax, ay), az)
    inv = 1.0 / jnp.maximum(mag, 1e-12)
    dom = (2.0 - inv) * inv
    is_x = ax == mag
    is_y = (ay == mag) & ~is_x
    is_z = ~(is_x | is_y)
    inside = mag < 1.0
    cx = jnp.where(inside, x, x * jnp.where(is_x, dom, inv))
    cy = jnp.where(inside, y, y * jnp.where(is_y, dom, inv))
    cz = jnp.where(inside, z, z * jnp.where(is_z, dom, inv))
    return cx, cy, cz


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _cummat(T: int, strict: bool):
    """Triangular ones matrix so that x @ M = cumsum over lanes (MXU)."""
    i = _iota2((T, T), 0)
    j = _iota2((T, T), 1)
    return ((i < j) if strict else (i <= j)).astype(jnp.float32)


def _encode_points(X8, proj_ref, phase_ref, lmask_ref, dtype):
    """[P, 8] padded coords -> [P, Fp] Fourier features (matches
    ops/freq.py layout; proj/phase from fused_mlp.make_enc_mats)."""
    z = jnp.dot(X8, proj_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32, precision=_HIGHEST)
    lm = lmask_ref[:]
    enc = lm * z + (1.0 - lm) * jnp.sin(z + phase_ref[:])
    return enc.astype(dtype)


def _mlp_stack(enc, w_ref, dims: Tuple[Tuple[int, int], ...], skip_layer: int,
               leaky: bool):
    """Run a packed MLP stack fully in VMEM. `dims` is one (kin, kout) pair
    per layer (the last layer's kout is lane-padded; its extra weight
    columns are zero). Returns f32 [P, kout_last]."""
    L = len(dims)
    h = None
    for l, (kin, kout) in enumerate(dims):
        if l == 0:
            inp = enc
        elif l == skip_layer:
            inp = jnp.concatenate([h, enc], axis=1)
        else:
            inp = h
        assert inp.shape[1] == kin, (l, inp.shape, kin)
        acc = jnp.dot(inp, w_ref[l, :kin, :kout],
                      preferred_element_type=jnp.float32)
        if l == L - 1:
            return acc
        if leaky:
            acc = jnp.where(acc >= 0, acc, 0.01 * acc)
        else:
            acc = jnp.maximum(acc, 0.0)
        h = acc.astype(w_ref.dtype)
    raise AssertionError


def _to_sublanes(a):
    """[R, T] (T in lanes) -> [R, T, 1] (T in sublanes).

    Mosaic rejects both the direct reshape and an expand of a
    computed-layout value; inserting the axis in the SUBLANE position
    ([R, 1, T], lane dim untouched) then transposing the trailing pair is
    supported."""
    R, T = a.shape
    return jnp.transpose(a.reshape(R, 1, T), (0, 2, 1))


def _level_geometry(rays, bins):
    """Per-level ray geometry in lane space.

    rays: [R, 8] (o3, d3, s_near, s_far); bins: [R, T+1] s-space edges.
    Returns (ts [R, T], deltas [R, T], X8 [P, 8] contracted coords)."""
    R, Tp1 = bins.shape
    T = Tp1 - 1
    P = R * T
    sn, sf = rays[:, 6:7], rays[:, 7:8]
    s = sn * (1.0 - bins) + sf * bins
    rb = _spacing_inv(s)  # [R, T+1] metric edges
    ts = 0.5 * (rb[:, 1:] + rb[:, :-1])
    dl = rb[:, 1:] - rb[:, :-1]
    x = rays[:, 0:1] + rays[:, 3:4] * ts
    y = rays[:, 1:2] + rays[:, 4:5] * ts
    z = rays[:, 2:3] + rays[:, 5:6] * ts
    cx, cy, cz = _contract_planes(x, y, z)
    # lane->sublane pivot without unsupported casts: place the 3 planes on
    # sublane rows of [R, 8, T] via broadcast+select (Mosaic rejects both
    # the direct [R, T]->[P, 1] flatten and a sublane-axis concat of
    # mismatched-offset operands), then transpose the trailing pair and
    # merge the leading dims - both supported
    sel = _iota2((R, 8, T), 1)
    bc = lambda a: jnp.broadcast_to(a.reshape(R, 1, T), (R, 8, T))
    X3 = jnp.where(sel == 0, bc(cx), 0.0)
    X3 = X3 + jnp.where(sel == 1, bc(cy), 0.0)
    X3 = X3 + jnp.where(sel == 2, bc(cz), 0.0)
    X3 = jnp.transpose(X3, (0, 2, 1))  # [R, T, 8]
    return ts, dl, X3.reshape(P, 8)


def _weights_lane(dl, sigma_raw, opaque: bool):
    """trunc_exp + alpha compositing weights in [R, T] lane space
    (ops/composite.py:compute_weights + ops/activation.py:trunc_exp)."""
    R, T = dl.shape
    sigma = jnp.exp(jnp.clip(sigma_raw, -15.0, 15.0))
    ds = dl * sigma
    if opaque:
        last = _iota2((R, T), 1) == T - 1
        ds_a = jnp.where(last, jnp.inf, ds)
    else:
        ds_a = ds
    alphas = 1.0 - jnp.exp(-ds_a)
    # exclusive cumsum of the FINITE ds via strict-triangular matmul
    cum = jnp.dot(ds, _cummat(T, strict=True),
                  preferred_element_type=jnp.float32, precision=_HIGHEST)
    w = alphas * jnp.exp(-cum)
    return jnp.where(jnp.isnan(w), 0.0, w)


def _resample(weights_prev, bins_prev, K: int):
    """Inverse-CDF resampling to K new s-space edges (deterministic u).

    weights_prev: [R, T0]; bins_prev: [R, T0+1] (or None = uniform [0,1]).
    Exactly ops/sampling.py:sample_pdf with key=None."""
    R, T0 = weights_prev.shape
    w = weights_prev + 0.01
    pdf = w / jnp.sum(w, axis=1, keepdims=True)
    cum = jnp.dot(pdf, _cummat(T0, strict=False),
                  preferred_element_type=jnp.float32, precision=_HIGHEST)
    cdf = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.float32), jnp.minimum(cum, 1.0)], axis=1)
    c_lo = cdf[:, :T0]  # [R, T0]
    dc = cdf[:, 1:] - c_lo
    recip = 1.0 / jnp.maximum(dc, 1e-12)
    # u_j = (j + 0.5)/K, j = 0..K-1 (linspace(0.5/K, 1-0.5/K, K))
    u = (_iota2((1, K, 1), 1).astype(jnp.float32) + 0.5) / K
    # [R, K, T0]: contribution of interval i to edge j, lanes = T0
    frac = jnp.clip((u - c_lo[:, None, :]) * recip[:, None, :], 0.0, 1.0)
    if bins_prev is None:
        return jnp.sum(frac, axis=2) / T0  # uniform: b0=0, db=1/T0
    db = bins_prev[:, 1:] - bins_prev[:, :-1]
    return bins_prev[:, 0:1] + jnp.sum(frac * db[:, None, :], axis=2)


def _sh4(dx, dy, dz):
    """SH degree-4 closed forms on [R, 1] direction columns -> [R, 16]
    (ops/sh.py coefficients, shencoder.cu ordering)."""
    x, y, z = dx, dy, dz
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    one = jnp.ones_like(x)
    cols = [
        0.28209479177387814 * one,
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * z2 - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        0.59004358992664352 * y * (-3.0 * x2 + y2),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z2),
        0.3731763325901154 * z * (5.0 * z2 - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z2),
        1.4453057213202769 * z * (x2 - y2),
        0.59004358992664352 * x * (-x2 + 3.0 * y2),
    ]
    return jnp.concatenate(cols, axis=1)


# ---------------------------------------------------------------------------
# pipeline spec + packing
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PipeSpec:
    """Static (hashable) shape/config info for the fused pipeline."""

    num_steps: Tuple[int, ...]
    blocks: Tuple[int, ...]  # rays per grid block, one per level
    prop_dims: Tuple[Tuple[int, int], ...]  # shared by all prop MLPs
    field_dims: Tuple[Tuple[int, int], ...]
    field_skip: int
    field_out_pad: int
    view_dims: Tuple[Tuple[int, int], ...]
    geom_dim: int
    opaque: bool
    bg: float
    min_near: float
    interpret: bool


def _pack_stack(layers, dims: Tuple[Tuple[int, int], ...],
                dtype=jnp.bfloat16) -> jax.Array:
    """Stack per-layer weights into one zero-padded [L, K, N] array laid out
    for `_mlp_stack`'s padded inputs: rows [0, w_rows) hold the layer's
    weight; for a skip layer this places the encoding block at rows
    [hidden, hidden + enc_dim), matching concat([h, enc_padded])."""
    K = _round_up(max(k for k, _ in dims), 128)
    N = _round_up(max(np.asarray(p["w"]).shape[1] for p in layers), 128)
    stack = np.zeros((len(layers), K, N), np.float32)
    for l, p in enumerate(layers):
        assert "b" not in p, "fused pipeline expects bias-free MLPs"
        w = np.asarray(p["w"], np.float32)
        stack[l, : w.shape[0], : w.shape[1]] = w
    return jnp.asarray(stack, dtype)


def _mlp_dims(layers, enc_pad: int, skip_layers=(),
              out_pad: int = 128) -> Tuple[Tuple[int, int], ...]:
    """(kin, kout) per layer in the packed stack: layer 0 reads the padded
    encoding; hidden layers read the previous layer's (unpadded) width;
    skip layers read [hidden, enc_pad]; the last layer's kout is padded to
    `out_pad` (extra weight columns are zero in the stack)."""
    dims = []
    prev_out = None
    n = len(layers)
    for l, p in enumerate(layers):
        w = np.asarray(p["w"])
        if l == 0:
            kin = enc_pad
        elif l in skip_layers:
            kin = prev_out + enc_pad
        else:
            kin = prev_out
        kout = out_pad if l == n - 1 else w.shape[1]
        dims.append((kin, kout))
        prev_out = w.shape[1]
    return tuple(dims)


def pack_pipeline(model, params, *, bg_color: float = 1.0,
                  blocks: Optional[Tuple[int, ...]] = None,
                  interpret: Optional[bool] = None):
    """Pack an MLP-family model's params for the fused pipeline.

    Returns (spec, packed) where packed is a dict of device arrays.
    """
    mc, rc = model.cfg, model.render_cfg
    assert model.is_mlp_field, "fused pipeline supports the MLP field family"
    num_steps = tuple(rc.num_steps)
    n_props = len(num_steps) - 1
    # extra prop nets beyond the active levels are fine (run_rays only
    # queries props[0..n_levels-2])
    assert n_props <= len(params["prop"]), (num_steps, len(params["prop"]))

    bound = model.bound
    fp_proj, fp_phase, fp_lmask, _ = make_enc_mats(
        mc.mlp_enc_freqs, float(np.pi / bound))
    pp_proj, pp_phase, pp_lmask, _ = make_enc_mats(
        mc.mlp_prop_enc_freqs, float(np.pi / bound))

    enc_pad_f = fp_proj.shape[1]
    enc_pad_p = pp_proj.shape[1]
    skip = (mc.mlp_field_depth // 2,)
    field_dims = _mlp_dims(params["grid_mlp"], enc_pad_f, skip)
    prop_dims = _mlp_dims(params["prop"][0]["mlp"], enc_pad_p)
    view_dims = _mlp_dims(params["view_mlp"], 128)
    field_w = _pack_stack(params["grid_mlp"], field_dims)
    prop_ws = tuple(
        _pack_stack(p["mlp"], prop_dims) for p in params["prop"])
    view_w = _pack_stack(params["view_mlp"], view_dims)
    spec = PipeSpec(
        num_steps=num_steps,
        blocks=tuple(blocks) if blocks else _default_blocks(num_steps),
        prop_dims=prop_dims,
        field_dims=field_dims,
        field_skip=skip[0],
        field_out_pad=128,
        view_dims=view_dims,
        geom_dim=mc.geom_feat_dim,
        opaque=rc.background == "last_sample",
        bg=float(bg_color),
        min_near=rc.min_near,
        interpret=(jax.default_backend() == "cpu") if interpret is None
        else interpret,
    )
    packed = {
        "field_w": field_w,
        "prop_w": prop_ws,
        "view_w": view_w,
        "f_proj": fp_proj, "f_phase": fp_phase, "f_lmask": fp_lmask,
        "p_proj": pp_proj, "p_phase": pp_phase, "p_lmask": pp_lmask,
    }
    return spec, packed


def _default_blocks(num_steps: Tuple[int, ...]) -> Tuple[int, ...]:
    """~8K points per grid block, rays multiple of 8."""
    return tuple(max(8, min(256, 8192 // T)) for T in num_steps)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _prop0_kernel(spec: PipeSpec):
    T = spec.num_steps[0]
    R = spec.blocks[0]

    def kernel(rays_ref, w_ref, proj_ref, phase_ref, lmask_ref, wout_ref):
        rays = rays_ref[:]
        edges = _iota2((R, T + 1), 1).astype(jnp.float32) / T
        ts, dl, X8 = _level_geometry(rays, edges)
        enc = _encode_points(X8, proj_ref, phase_ref, lmask_ref, w_ref.dtype)
        hout = _mlp_stack(enc, w_ref, spec.prop_dims, -1, False)
        sig = hout[:, 0:1].reshape(R, T)
        wout_ref[:] = _weights_lane(dl, sig, spec.opaque)

    return kernel


def _mid_kernel(spec: PipeSpec, level: int):
    T0 = spec.num_steps[level - 1]
    T = spec.num_steps[level]
    R = spec.blocks[level]
    first_mid = level == 1

    def kernel(rays_ref, wprev_ref, bprev_ref, w_ref, proj_ref, phase_ref,
               lmask_ref, bout_ref, wout_ref):
        rays = rays_ref[:]
        bins_prev = None if first_mid else bprev_ref[:]
        bins = _resample(wprev_ref[:], bins_prev, T + 1)
        ts, dl, X8 = _level_geometry(rays, bins)
        enc = _encode_points(X8, proj_ref, phase_ref, lmask_ref, w_ref.dtype)
        hout = _mlp_stack(enc, w_ref, spec.prop_dims, -1, False)
        sig = hout[:, 0:1].reshape(R, T)
        bout_ref[:] = bins
        wout_ref[:] = _weights_lane(dl, sig, spec.opaque)

    return kernel


def _final_kernel(spec: PipeSpec):
    n_levels = len(spec.num_steps)
    T0 = spec.num_steps[-2] if n_levels > 1 else None
    T = spec.num_steps[-1]
    R = spec.blocks[-1]
    single = n_levels == 1
    first_mid = n_levels == 2  # previous level was the uniform one

    def kernel(rays_ref, wprev_ref, bprev_ref, w_ref, vw_ref, proj_ref,
               phase_ref, lmask_ref, out_ref):
        rays = rays_ref[:]
        if single:
            bins = _iota2((R, T + 1), 1).astype(jnp.float32) / T
        else:
            bins_prev = None if first_mid else bprev_ref[:]
            bins = _resample(wprev_ref[:], bins_prev, T + 1)
        ts, dl, X8 = _level_geometry(rays, bins)
        enc = _encode_points(X8, proj_ref, phase_ref, lmask_ref, w_ref.dtype)
        hout = _mlp_stack(enc, w_ref, spec.field_dims, spec.field_skip,
                          True)  # [P, 128] f32
        sig = hout[:, 0:1].reshape(R, T)
        w = _weights_lane(dl, sig, spec.opaque)  # [R, T]

        wsum = jnp.sum(w, axis=1, keepdims=True)  # [R, 1]
        depth = jnp.sum(w * ts, axis=1, keepdims=True)

        # composite per-point field outputs: geo_feat lives in cols 1:16.
        # multiply in 3-D ([R, T, C] x [R, T, 1]) - no lane->sublane pivot
        hout3 = hout.reshape(R, T, spec.field_out_pad)
        gsum = jnp.sum(hout3 * _to_sublanes(w), axis=1)  # [R, 128]

        # view branch: [geo_feat_sum(15), sh16] -> view MLP -> sigmoid
        dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
        rn = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        sh = _sh4(dx * rn, dy * rn, dz * rn)  # [R, 16]
        geo = gsum[:, 1:1 + spec.geom_dim]  # [R, 15]
        vin = jnp.concatenate(
            [geo, sh, jnp.zeros((R, 128 - spec.geom_dim - 16), jnp.float32)],
            axis=1).astype(vw_ref.dtype)
        rgb_l = _mlp_stack(vin, vw_ref, spec.view_dims, -1, False)
        rgb = jax.nn.sigmoid(rgb_l[:, 0:3])
        image = rgb + (1.0 - wsum) * spec.bg

        out_ref[:] = jnp.concatenate(
            [image, depth, wsum, jnp.zeros((R, 3), jnp.float32)], axis=1)

    return kernel


# ---------------------------------------------------------------------------
# host-side pipeline
# ---------------------------------------------------------------------------


def _vmem_params():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _row_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (nd - 1),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnums=0)
def _render_fused(spec: PipeSpec, packed: Dict[str, Any], rays_o, rays_d,
                  aabb) -> Dict[str, jax.Array]:
    N = rays_o.shape[0]
    n_levels = len(spec.num_steps)
    align = int(np.lcm.reduce(np.asarray(spec.blocks, np.int64)))
    M = _round_up(N, align)
    if M != N:
        rays_o = jnp.concatenate(
            [rays_o, jnp.broadcast_to(rays_o[-1:], (M - N, 3))], 0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.broadcast_to(rays_d[-1:], (M - N, 3))], 0)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, spec.min_near)
    rays8 = jnp.concatenate(
        [rays_o, rays_d, spacing_fn(nears), spacing_fn(fars)],
        axis=1).astype(jnp.float32)

    interp = spec.interpret
    kw = dict(interpret=True) if interp else dict(
        compiler_params=_vmem_params())

    # level 0: uniform bins -> prop weights
    T0 = spec.num_steps[0]
    R0 = spec.blocks[0]
    w_prev = pl.pallas_call(
        _prop0_kernel(spec),
        grid=(M // R0,),
        in_specs=[
            _row_spec((R0, 8)),
            _const_spec(packed["prop_w"][0].shape),
            _const_spec(packed["p_proj"].shape),
            _const_spec(packed["p_phase"].shape),
            _const_spec(packed["p_lmask"].shape),
        ],
        out_specs=_row_spec((R0, T0)),
        out_shape=jax.ShapeDtypeStruct((M, T0), jnp.float32),
        **kw,
    )(rays8, packed["prop_w"][0], packed["p_proj"], packed["p_phase"],
      packed["p_lmask"])
    b_prev = jnp.zeros((M, T0 + 1), jnp.float32)  # unused by first mid/final

    # middle proposal levels
    for level in range(1, n_levels - 1):
        T = spec.num_steps[level]
        R = spec.blocks[level]
        Tp = spec.num_steps[level - 1]
        b_prev, w_prev = pl.pallas_call(
            _mid_kernel(spec, level),
            grid=(M // R,),
            in_specs=[
                _row_spec((R, 8)),
                _row_spec((R, Tp)),
                _row_spec((R, Tp + 1)),
                _const_spec(packed["prop_w"][level].shape),
                _const_spec(packed["p_proj"].shape),
                _const_spec(packed["p_phase"].shape),
                _const_spec(packed["p_lmask"].shape),
            ],
            out_specs=(_row_spec((R, T + 1)), _row_spec((R, T))),
            out_shape=(
                jax.ShapeDtypeStruct((M, T + 1), jnp.float32),
                jax.ShapeDtypeStruct((M, T), jnp.float32),
            ),
            **kw,
        )(rays8, w_prev, b_prev, packed["prop_w"][level], packed["p_proj"],
          packed["p_phase"], packed["p_lmask"])

    # final level
    R = spec.blocks[-1]
    Tp = spec.num_steps[-2] if n_levels > 1 else 1
    out = pl.pallas_call(
        _final_kernel(spec),
        grid=(M // R,),
        in_specs=[
            _row_spec((R, 8)),
            _row_spec((R, Tp)),
            _row_spec((R, Tp + 1)),
            _const_spec(packed["field_w"].shape),
            _const_spec(packed["view_w"].shape),
            _const_spec(packed["f_proj"].shape),
            _const_spec(packed["f_phase"].shape),
            _const_spec(packed["f_lmask"].shape),
        ],
        out_specs=_row_spec((R, 8)),
        out_shape=jax.ShapeDtypeStruct((M, 8), jnp.float32),
        **kw,
    )(rays8, w_prev, b_prev, packed["field_w"], packed["view_w"],
      packed["f_proj"], packed["f_phase"], packed["f_lmask"])

    return {
        "image": out[:N, 0:3],
        "depth": out[:N, 3],
        "weights_sum": out[:N, 4],
    }


class FusedRenderer:
    """Packed-weight fused inference renderer for the MLP field family.

    Usage:
        fr = FusedRenderer(model, params)          # params may be bf16
        out = fr(rays_o, rays_d)                   # {image, depth, weights_sum}
    """

    def __init__(self, model, params, *, bg_color: float = 1.0,
                 blocks: Optional[Tuple[int, ...]] = None,
                 interpret: Optional[bool] = None):
        self.model = model
        self.spec, self.packed = pack_pipeline(
            model, params, bg_color=bg_color, blocks=blocks,
            interpret=interpret)
        b = model.render_cfg.bound
        self.default_aabb = jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)

    def __call__(self, rays_o, rays_d, aabb=None) -> Dict[str, jax.Array]:
        if aabb is None:
            aabb = self.default_aabb
        return _render_fused(self.spec, self.packed, rays_o, rays_d, aabb)
