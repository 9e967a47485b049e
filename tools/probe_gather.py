"""Hash-table gather throughput probes on the real TPU chip.

The measurement behind the import-distillation design decision
(models/import_distill.py): every formulation of the per-point table
gather the instant-ngp hash encoder needs (gridencoder.cu:82-201) tops
out at ~10-100 M rows/s on a v5e chip — XLA gathers and in-kernel Pallas
dynamic slices alike — while one 512^2 frame through the reference's
3-grid hierarchy needs ~1.6e9 lookups. That is a >100x gap to the 30 FPS
target with no kernel-level fix (TPUs have no per-lane dynamic
addressing), so converted hash-grid checkpoints are instead refit into
the MLP family once at import time.

Measured 2026-08-17 (v5e via relay, median of 3, RTT-corrected):
    xla take [2^19, 2]                  ~23 M rows/s
    xla take [2^19, 8]                  ~23 M rows/s
    xla take [2^19, 128]                ~21 M rows/s
    xla flat 1-D gather                 ~11 M rows/s
    pallas dynslice loop (VMEM table)   ~13 M rows/s
    pallas dynslice loop unroll8        ~13 M rows/s
    pallas jnp.take in-kernel           Mosaic lowering failure
    pallas prefetch row-block (8 rows)  ~100 M rows/s (block-granular only)

Run: python tools/probe_gather.py   (needs the TPU; ~2 min)
"""

import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T = 2 ** 19          # table rows (reference RGB grid level size)
M = 2 ** 21          # lookups per call (2M)
C = 2                # channels

key = jax.random.key(0)
table = jax.random.normal(key, (T, C), jnp.float32)
table8 = jax.random.normal(key, (T, 8), jnp.float32)
table128 = jax.random.normal(key, (T, 128), jnp.float32)
idx = jax.random.randint(jax.random.key(1), (M,), 0, T, jnp.int32)


def bench(name, fn, *args, iters=3):
    try:
        f = jax.jit(fn)
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # force
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        dt = (time.time() - t0) / iters - 0.0275  # relay RTT
        print(f"{name:38s} {dt*1e3:8.1f} ms  {M/dt/1e6:8.1f} M rows/s")
    except Exception as e:
        print(f"{name:38s} FAILED: {type(e).__name__}: {str(e)[:120]}")


bench("xla take [2^19,2]", lambda t, i: jnp.take(t, i, axis=0), table, idx)
bench("xla index [2^19,2]", lambda t, i: t[i], table, idx)
bench("xla take unsafe [2^19,2]",
      lambda t, i: jnp.take(t, i, axis=0, mode="fill", fill_value=0.0),
      table, idx)
bench("xla take [2^19,8]", lambda t, i: jnp.take(t, i, axis=0), table8, idx)
bench("xla take [2^19,128]", lambda t, i: jnp.take(t, i, axis=0), table128, idx)
bench("xla take sorted idx",
      lambda t, i: jnp.take(t, i, axis=0), table, jnp.sort(idx))
# flat-1D gather (per-scalar)
bench("xla flat [2^19*2] x2",
      lambda t, i: jnp.take(t.ravel(), jnp.stack([2 * i, 2 * i + 1], -1)),
      table, idx)

# ---- Pallas in-kernel variants ----
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2 ** 15  # lookups per grid step


def k_dynloop(idx_ref, tab_ref, out_ref):
    def body(j, _):
        r = tab_ref[pl.ds(idx_ref[j, 0], 1), :]
        out_ref[pl.ds(j, 1), :] = r
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


def pallas_dynloop(tab, i):
    i2 = i.reshape(M // BLK, BLK, 1)
    return pl.pallas_call(
        k_dynloop,
        grid=(M // BLK,),
        in_specs=[pl.BlockSpec((1, BLK, 1), lambda g: (g, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, BLK, C), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M // BLK, BLK, C), jnp.float32),
    )(i2, tab)


def k_dynloop_vmem(idx_ref, tab_ref, out_ref):
    def body(j, _):
        out_ref[pl.ds(j, 1), :] = tab_ref[pl.ds(idx_ref[j, 0], 1), :]
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


def pallas_dynloop_vmem(tab, i):
    i2 = i.reshape(M // BLK, BLK, 1)
    return pl.pallas_call(
        k_dynloop_vmem,
        grid=(M // BLK,),
        in_specs=[pl.BlockSpec((1, BLK, 1), lambda g: (g, 0, 0)),
                  pl.BlockSpec((T, C), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((1, BLK, C), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M // BLK, BLK, C), jnp.float32),
    )(i2, tab)


def k_take(idx_ref, tab_ref, out_ref):
    out_ref[:, :] = jnp.take(tab_ref[:, :], idx_ref[:, 0], axis=0)


def pallas_take(tab, i):
    i2 = i.reshape(M // BLK, BLK, 1)
    return pl.pallas_call(
        k_take,
        grid=(M // BLK,),
        in_specs=[pl.BlockSpec((1, BLK, 1), lambda g: (g, 0, 0)),
                  pl.BlockSpec((T, C), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((1, BLK, C), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M // BLK, BLK, C), jnp.float32),
    )(i2, tab)


def k_take_small(idx_ref, tab_ref, out_ref):
    # table block fits easily in VMEM: [4096, 128]
    out_ref[:, :] = jnp.take(tab_ref[:, :], idx_ref[:, 0], axis=0)


def pallas_take_small(tab, i):
    i2 = (i % 4096).reshape(M // BLK, BLK, 1)
    return pl.pallas_call(
        k_take_small,
        grid=(M // BLK,),
        in_specs=[pl.BlockSpec((1, BLK, 1), lambda g: (g, 0, 0)),
                  pl.BlockSpec((4096, 128), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((1, BLK, 128), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M // BLK, BLK, 128), jnp.float32),
    )(tab[:4096], i2)


bench("pallas dynslice loop (ANY tab)", pallas_dynloop, table, idx)
bench("pallas dynslice loop (VMEM tab)", pallas_dynloop_vmem, table, idx)
bench("pallas jnp.take (VMEM tab 2^19)", pallas_take, table, idx)
bench("pallas jnp.take (VMEM tab 4096x128)", pallas_take_small, table128, idx)

# ---- round 2: block-prefetch + unrolled variants ----
def bench2(name, fn, *args, iters=3, rows=M):
    try:
        f = jax.jit(fn)
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        dt = (time.time() - t0) / iters - 0.0275
        print(f"{name:40s} {dt*1e3:8.1f} ms  {rows/dt/1e6:8.1f} M rows/s",
              flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)


# A: scalar dynamic-slice loop, whole table in VMEM
def k_loop(idx_ref, tab_ref, out_ref):
    def body(j, _):
        out_ref[pl.ds(j, 1), :] = tab_ref[pl.ds(idx_ref[j, 0], 1), :]
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


def p_loop(tab, i):
    return pl.pallas_call(
        k_loop,
        grid=(M // BLK,),
        in_specs=[pl.BlockSpec((BLK, 1), lambda g: (g, 0)),
                  pl.BlockSpec((T, C), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((BLK, C), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
    )(i, tab)


# B: vectorized jnp.take inside the kernel
def k2_take(idx_ref, tab_ref, out_ref):
    out_ref[:, :] = jnp.take(tab_ref[:, :], idx_ref[:, 0], axis=0,
                             mode="fill", fill_value=0.0)


def p2_take(tab, i):
    return pl.pallas_call(
        k2_take,
        grid=(M // BLK,),
        in_specs=[pl.BlockSpec((BLK, 1), lambda g: (g, 0)),
                  pl.BlockSpec((T, C), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((BLK, C), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
    )(i, tab)


# C: take_along_axis with lane-dim table copies? Just try dynamic_slice
# vector: gather via one-hot matmul on 512-row table chunks is FLOP-bound;
# skip. Instead: 8-sublane-packed loop (8 lookups per iteration via
# separate dynamic slices, unrolled).
def k_loop8(idx_ref, tab_ref, out_ref):
    def body(j, _):
        for u in range(8):
            out_ref[pl.ds(8 * j + u, 1), :] = (
                tab_ref[pl.ds(idx_ref[8 * j + u, 0], 1), :])
        return 0
    jax.lax.fori_loop(0, BLK // 8, body, 0)


def p_loop8(tab, i):
    return pl.pallas_call(
        k_loop8,
        grid=(M // BLK,),
        in_specs=[pl.BlockSpec((BLK, 1), lambda g: (g, 0)),
                  pl.BlockSpec((T, C), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((BLK, C), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
    )(i, tab)


# D: PrefetchScalarGridSpec row-block gather: grid step g copies the table
# ROW BLOCK selected by prefetched scalar — tests block-granularity gather
# (useful if we sort points by cell).  Block = 8 rows.
def k_blk(sidx_ref, tab_ref, out_ref):
    out_ref[:, :] = tab_ref[:, :]


def p_blk(tab, i):
    n = M // 8
    si = (i[:n, 0] // 8)
    return pl.pallas_call(
        k_blk,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[pl.BlockSpec((8, C), lambda g, s: (s[g], 0))],
            out_specs=pl.BlockSpec((8, C), lambda g, s: (g, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
    )(si, tab)


bench2("pallas dynslice loop (VMEM tab)", p_loop, table, idx)
bench2("pallas dynslice loop unroll8", p_loop8, table, idx)
bench2("pallas jnp.take vector (VMEM tab)", p2_take, table, idx)
bench2("pallas prefetch row-block (8 rows)", p_blk, table, idx, rows=M // 8)
