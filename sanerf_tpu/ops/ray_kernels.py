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
spacing_fn_inv, contract's argmax-first tie-break); the in-kernel
formulations are the ones already parity-proven in ops/fused_render.py
(_resample, _contract_planes, triangular-matmul cumsum).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sanerf_tpu.ops.fused_render import (
    _contract_planes,
    _iota2,
    _resample,
    _spacing_inv,
)


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


def _ray0_kernel(R: int, T: int, contract: bool):
    def kernel(rays_ref, bins_ref, ts_ref, dl_ref, x3_ref):
        rays = rays_ref[:]
        bins = _iota2((R, T + 1), 1).astype(jnp.float32) / T
        ts, dl, cx, cy, cz = _level_body(rays, bins, R, T, contract)
        bins_ref[:] = bins
        ts_ref[:] = ts
        dl_ref[:] = dl
        _store_planes(x3_ref, cx, cy, cz)

    return kernel


def _ray_kernel(R: int, T0: int, T: int, contract: bool, uniform_prev: bool):
    def kernel(rays_ref, wprev_ref, bprev_ref, bins_ref, ts_ref, dl_ref,
               x3_ref):
        rays = rays_ref[:]
        bins_prev = None if uniform_prev else bprev_ref[:]
        bins = _resample(wprev_ref[:], bins_prev, T + 1)
        ts, dl, cx, cy, cz = _level_body(rays, bins, R, T, contract)
        bins_ref[:] = bins
        ts_ref[:] = ts
        dl_ref[:] = dl
        _store_planes(x3_ref, cx, cy, cz)

    return kernel


def _specs(R, T, n_rays):
    out_specs = (
        pl.BlockSpec((R, T + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, R, T), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((n_rays, T + 1), jnp.float32),
        jax.ShapeDtypeStruct((n_rays, T), jnp.float32),
        jax.ShapeDtypeStruct((n_rays, T), jnp.float32),
        jax.ShapeDtypeStruct((3, n_rays, T), jnp.float32),
    )
    return out_specs, out_shape


def _pick_block(n_rays: int, block: int) -> int:
    r = min(block, n_rays)
    while n_rays % r:
        r //= 2
    return r


@functools.partial(
    jax.jit, static_argnames=("T", "contract", "block_rays", "interpret"))
def ray_level0(rays8: jax.Array, T: int, contract: bool = True,
               block_rays: int = 512, interpret: bool = False):
    """Level-0 geometry: uniform bins. rays8 [N, 8] = [o, d, s_near, s_far].
    -> (bins [N, T+1], ts [N, T], dl [N, T], x3 [3, N, T])."""
    N = rays8.shape[0]
    R = _pick_block(N, block_rays)
    out_specs, out_shape = _specs(R, T, N)
    kw = {} if interpret else dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))
    return pl.pallas_call(
        _ray0_kernel(R, T, contract),
        grid=(N // R,),
        in_specs=[pl.BlockSpec((R, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kw,
    )(rays8)


@functools.partial(
    jax.jit,
    static_argnames=("T", "contract", "uniform_prev", "block_rays",
                     "interpret"))
def ray_level(rays8: jax.Array, w_prev: jax.Array, bins_prev: jax.Array,
              T: int, contract: bool = True, uniform_prev: bool = False,
              block_rays: int = 512, interpret: bool = False):
    """Level i>0: inverse-CDF resample against the previous level's weights,
    then geometry. `uniform_prev` marks the previous bins as the analytic
    uniform grid (level 1), matching sample_pdf's closed form."""
    N = rays8.shape[0]
    T0 = w_prev.shape[1]
    R = _pick_block(N, block_rays)
    out_specs, out_shape = _specs(R, T, N)
    kw = {} if interpret else dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))
    return pl.pallas_call(
        _ray_kernel(R, T0, T, contract, uniform_prev),
        grid=(N // R,),
        in_specs=[
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, T0), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, T0 + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kw,
    )(rays8, w_prev, bins_prev)
