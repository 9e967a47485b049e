"""Per-level ray-geometry kernels: resample + spacing + contraction in VMEM.

Each proposal level's inter-level glue — inverse-CDF resampling of bin
edges, the s-space -> metric spacing warp, midpoint/delta computation, and
the mip-NeRF-360 contraction of the sample coordinates — runs as ONE
Pallas kernel per level, emitting exactly what the transposed field MLP
kernel (ops/fused_mlp_t.py) consumes: contracted coordinates in dims-first
[3, N, T] layout (per-plane stores, no relayout anywhere).

Replaces, on the inference fast path, the XLA-side uniform_bins /
sample_pdf ([N, T, T0] broadcast passes) / spacing / broadcast-multiply
coordinate build / contract_T chain, plus the operand-staging
dynamic-update-slice copies XLA inserted around them (profiled ~25
ms/frame together).

Math mirrors ops/sampling.py exactly (sample_pdf's affine-clamp identity,
spacing_fn_inv, contract's argmax-first tie-break); parity is asserted in
tests/test_ray_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# in-kernel math helpers (all shapes static, Mosaic-layout friendly)
# ---------------------------------------------------------------------------


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


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


def _cummat(T: int, strict: bool):
    """Triangular ones matrix so that x @ M = cumsum over lanes (MXU)."""
    i = _iota2((T, T), 0)
    j = _iota2((T, T), 1)
    return ((i < j) if strict else (i <= j)).astype(jnp.float32)


def _resample(weights_prev, bins_prev, K: int, u_jitter=None):
    """Inverse-CDF resampling to K new s-space edges.

    weights_prev: [R, T0]; bins_prev: [R, T0+1] (or None = uniform [0,1]);
    u_jitter: optional [R, K] stratified offsets (the perturb path — adds
    the same (uniform-0.5)/K draw ops/sampling.py:sample_pdf uses, so the
    fast path matches the XLA path bit-for-bit given the same key).
    Without jitter this is exactly sample_pdf with key=None: gather-free —
    the piecewise-linear inverse CDF F^-1(u) = b0 + sum_i db_i *
    clamp((u - c_i)/dc_i, 0, 1) evaluates as one [R, K, T0] broadcast with
    a lane reduction."""
    R, T0 = weights_prev.shape
    w = weights_prev + 0.01
    pdf = w / jnp.sum(w, axis=1, keepdims=True)
    cum = jnp.dot(pdf, _cummat(T0, strict=False),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    cdf = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.float32), jnp.minimum(cum, 1.0)], axis=1)
    c_lo = cdf[:, :T0]  # [R, T0]
    dc = cdf[:, 1:] - c_lo
    recip = 1.0 / jnp.maximum(dc, 1e-12)
    # u_j = (j + 0.5)/K, j = 0..K-1 (linspace(0.5/K, 1-0.5/K, K))
    u = (_iota2((1, K, 1), 1).astype(jnp.float32) + 0.5) / K
    if u_jitter is not None:
        # lane->sublane pivot: reshape keeps the lane dim, then the trailing
        # transpose is supported (Mosaic rejects the direct [R,K]->[R,K,1])
        u = u + jnp.transpose(u_jitter.reshape(R, 1, K), (0, 2, 1))
    # [R, K, T0]: contribution of interval i to edge j, lanes = T0
    frac = jnp.clip((u - c_lo[:, None, :]) * recip[:, None, :], 0.0, 1.0)
    if bins_prev is None:
        return jnp.sum(frac, axis=2) / T0  # uniform: b0=0, db=1/T0
    db = bins_prev[:, 1:] - bins_prev[:, :-1]
    return bins_prev[:, 0:1] + jnp.sum(frac * db[:, None, :], axis=2)


def _level_body(rays, bins, R: int, T: int, contract: bool):
    """rays [R, 8] (o3, d3, s_near, s_far); bins [R, T+1] s-space edges ->
    (ts [R, T], dl [R, T], cx, cy, cz [R, T] contracted planes)."""
    sn, sf = rays[:, 6:7], rays[:, 7:8]
    s = sn * (1.0 - bins) + sf * bins
    rb = _spacing_inv(s)
    ts = 0.5 * (rb[:, 1:] + rb[:, :-1])
    dl = rb[:, 1:] - rb[:, :-1]
    x = rays[:, 0:1] + rays[:, 3:4] * ts
    y = rays[:, 1:2] + rays[:, 4:5] * ts
    z = rays[:, 2:3] + rays[:, 5:6] * ts
    if contract:
        x, y, z = _contract_planes(x, y, z)
    return ts, dl, x, y, z


def _store_planes(x3_ref, cx, cy, cz):
    x3_ref[0] = cx
    x3_ref[1] = cy
    x3_ref[2] = cz


def _pack_rows(v, R: int, T: int, q: int):
    """(R, T) plane -> (R//q, q*T, 1): q rays' samples share one lane row
    (the packed-epilogue feed). Chain of Mosaic-supported relayouts only:
    the reshape+transpose lane->sublane pivot (same as the jitter path
    above), then a leading-dim merge/split that keeps the lane dim (=1)."""
    v3 = jnp.transpose(v.reshape(R, 1, T), (0, 2, 1))  # (R, T, 1)
    return v3.reshape(R // q, q * T, 1)


def _store_packed(ts_p_ref, dl_p_ref, ts, dl, R, T, q):
    ts_p_ref[:] = _pack_rows(ts, R, T, q)
    dl_p_ref[:] = _pack_rows(dl, R, T, q)


def _ray0_kernel(R: int, T: int, contract: bool, jittered: bool,
                 pack_q: int = 0):
    def kernel(rays_ref, *refs):
        jit_ref, (bins_ref, ts_ref, dl_ref, x3_ref, *packed) = (
            (refs[0], refs[1:]) if jittered else (None, refs))
        rays = rays_ref[:]
        bins = _iota2((R, T + 1), 1).astype(jnp.float32) / T
        if jittered:
            # matches ops/sampling.py:uniform_bins with a key: per-edge
            # (uniform-0.5)/T offsets, clipped back into [0, 1]
            bins = jnp.clip(bins + jit_ref[:], 0.0, 1.0)
        ts, dl, cx, cy, cz = _level_body(rays, bins, R, T, contract)
        bins_ref[:] = bins
        ts_ref[:] = ts
        dl_ref[:] = dl
        _store_planes(x3_ref, cx, cy, cz)
        if pack_q:
            _store_packed(packed[0], packed[1], ts, dl, R, T, pack_q)

    return kernel


def _ray_kernel(R: int, T0: int, T: int, contract: bool, uniform_prev: bool,
                jittered: bool, pack_q: int = 0):
    def kernel(rays_ref, wprev_ref, bprev_ref, *refs):
        jit_ref, (bins_ref, ts_ref, dl_ref, x3_ref, *packed) = (
            (refs[0], refs[1:]) if jittered else (None, refs))
        rays = rays_ref[:]
        bins_prev = None if uniform_prev else bprev_ref[:]
        u_jit = jit_ref[:] if jittered else None
        bins = _resample(wprev_ref[:], bins_prev, T + 1, u_jit)
        ts, dl, cx, cy, cz = _level_body(rays, bins, R, T, contract)
        bins_ref[:] = bins
        ts_ref[:] = ts
        dl_ref[:] = dl
        _store_planes(x3_ref, cx, cy, cz)
        if pack_q:
            _store_packed(packed[0], packed[1], ts, dl, R, T, pack_q)

    return kernel


def _specs(R, T, n_rays, pack_q: int = 0):
    out_specs = [
        pl.BlockSpec((R, T + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, R, T), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_rays, T + 1), jnp.float32),
        jax.ShapeDtypeStruct((n_rays, T), jnp.float32),
        jax.ShapeDtypeStruct((n_rays, T), jnp.float32),
        jax.ShapeDtypeStruct((3, n_rays, T), jnp.float32),
    ]
    if pack_q:
        for _ in range(2):  # ts_p, dl_p
            out_specs.append(pl.BlockSpec(
                (R // pack_q, pack_q * T, 1), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(
                (n_rays // pack_q, pack_q * T, 1), jnp.float32))
    return tuple(out_specs), tuple(out_shape)


def _pick_block(n_rays: int, block: int, pack_q: int = 0) -> int:
    r = min(block, n_rays)
    while n_rays % r or (pack_q and r % pack_q):
        r //= 2
        assert r, (n_rays, block, pack_q)
    return r


def pick_pack_q(T: int, n_rays: int) -> int:
    """Lane-packing factor for the composite epilogue: the largest power
    of two q with q*T <= 128 (q rays' samples share a 128-lane row; powers
    of two keep q | n_rays for the usual ray counts). 1 = no packing."""
    q = 1
    while 2 * q * T <= 128:
        q *= 2
    while q > 1 and n_rays % q:
        q //= 2
    return q


def _flatten_kernel(R: int, T: int):
    def kernel(x_ref, o_ref):
        x = x_ref[:]  # (3, R, T)
        # Each step is a Mosaic-supported relayout (probed round 2; see the
        # repo's Mosaic notes): two sublane-side 3-D transposes, a leading-
        # dim merge that keeps the lane dim, then one 2-D transpose. They
        # stay distinct lax primitives in the jaxpr, so Pallas lowers them
        # one by one instead of a fused (1, 2, 0) transpose.
        a = jnp.transpose(x, (1, 0, 2))  # (R, 3, T)
        b = jnp.transpose(a, (0, 2, 1))  # (R, T, 3)
        c = b.reshape(R * T, 3)
        o_ref[:] = jnp.transpose(c, (1, 0))  # (3, R*T)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_rays", "interpret"))
def flatten3_nt(x3: jax.Array, block_rays: int = 512,
                interpret: bool = False) -> jax.Array:
    """[3, N, T] -> [3, N*T] retile as a VMEM kernel.

    XLA lowers this reshape to a windowed dynamic-update-slice loop
    (~4 ms/100 MB profiled — the ray kernels' dims-first [3, N, T] output
    and the fused MLP kernels' flat [3, N*T] input tile differently, so
    the merge is a physical relayout either way). Doing the pivot
    per-block in VMEM replaces the HBM-streaming loop with block-local
    transposes. Opt-in via RenderConfig.flatten_kernel until the Mosaic
    transpose chain gets its hardware compile check."""
    _, N, T = x3.shape
    R = _pick_block(N, block_rays)
    return pl.pallas_call(
        _flatten_kernel(R, T),
        grid=(N // R,),
        in_specs=[pl.BlockSpec((3, R, T), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, R * T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, N * T), x3.dtype),
        interpret=interpret,
    )(x3)


@functools.partial(
    jax.jit, static_argnames=("T", "contract", "block_rays", "interpret",
                              "pack_q"))
def ray_level0(rays8: jax.Array, T: int, contract: bool = True,
               block_rays: int = 512, interpret: bool = False,
               jitter: Optional[jax.Array] = None, pack_q: int = 0):
    """Level-0 geometry: uniform bins. rays8 [N, 8] = [o, d, s_near, s_far];
    jitter: optional [N, T+1] per-edge offsets ((uniform-0.5)/T, the
    perturb path). -> (bins [N, T+1], ts [N, T], dl [N, T], x3 [3, N, T]);
    with pack_q > 0, also ts_p/dl_p [N//q, q*T, 1] (q rays per lane row,
    the packed composite-epilogue feed)."""
    N = rays8.shape[0]
    R = _pick_block(N, block_rays, pack_q)
    out_specs, out_shape = _specs(R, T, N, pack_q)
    kw = {} if interpret else dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))
    in_specs = [pl.BlockSpec((R, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [rays8]
    if jitter is not None:
        in_specs.append(pl.BlockSpec((R, T + 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jitter)
    return pl.pallas_call(
        _ray0_kernel(R, T, contract, jitter is not None, pack_q),
        grid=(N // R,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kw,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=("T", "contract", "uniform_prev", "block_rays",
                     "interpret", "pack_q"))
def ray_level(rays8: jax.Array, w_prev: jax.Array, bins_prev: jax.Array,
              T: int, contract: bool = True, uniform_prev: bool = False,
              block_rays: int = 512, interpret: bool = False,
              jitter: Optional[jax.Array] = None, pack_q: int = 0):
    """Level i>0: inverse-CDF resample against the previous level's weights,
    then geometry. `uniform_prev` marks the previous bins as the analytic
    uniform grid (level 1, only valid when level 0 was NOT jittered).
    jitter: optional [N, T+1] stratified-u offsets ((uniform-0.5)/(T+1),
    matching sample_pdf's perturb draw). pack_q as in ray_level0."""
    N = rays8.shape[0]
    T0 = w_prev.shape[1]
    R = _pick_block(N, block_rays, pack_q)
    out_specs, out_shape = _specs(R, T, N, pack_q)
    kw = {} if interpret else dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))
    in_specs = [
        pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, T0), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, T0 + 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [rays8, w_prev, bins_prev]
    if jitter is not None:
        in_specs.append(pl.BlockSpec((R, T + 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jitter)
    return pl.pallas_call(
        _ray_kernel(R, T0, T, contract, uniform_prev, jitter is not None,
                    pack_q),
        grid=(N // R,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kw,
    )(*args)
