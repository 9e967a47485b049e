"""Microbench the fused composite kernel at the serving-student shape.

Times `run_tmlp_composite` (and ablated variants) standalone on synthetic
inputs at the benched frame's exact sizes, so the 25 ms the frame profile
attributes to the kernel decomposes into: field MLP chain, in-kernel CP
grid block, composite epilogue, view epilogue. Each variant is a fresh
compile; times are chained-dispatch device times (one block at the end).

Usage: python tools/kbench.py [--rays 262144] [--t 24] [--block 4096]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timed(fn, *args, n=8, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) * 1000 / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=512 * 512)
    ap.add_argument("--t", type=int, default=24)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--cp", type=int, default=96)
    ap.add_argument("--cp_res", type=int, default=256)
    ap.add_argument("--sig", type=int, default=32)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--freqs", type=int, default=6)
    ap.add_argument("--bound", type=float, default=128.0)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sanerf_tpu.ops.fused_mlp_t import run_tmlp, run_tmlp_composite

    N, T = args.rays, args.t
    B = N * T
    key = jax.random.key(0)
    ks = jax.random.split(key, 12)
    bound = args.bound
    enc_freqs = args.freqs
    w, d = args.width, args.depth

    def mk(shape, k):
        return (jax.random.normal(k, shape) * 0.1).astype(jnp.bfloat16)

    # depth-d decoder with the skip at depth//2 (fields layout), bias-free
    enc_dim = 3 * (1 + 2 * enc_freqs) + args.cp
    layers = []
    fin = enc_dim
    skip = (d // 2,)
    for l in range(d):
        fi = fin if l == 0 else w
        if l in skip and l:
            fi = w + enc_dim
        fo = 16 if l == d - 1 else w
        layers.append({"w": mk((fi, fo), ks[l])})
    view_layers = [{"w": mk((31, 32), ks[6])}, {"w": mk((32, 32), ks[7])},
                   {"w": mk((32, 3), ks[8])}]
    cp_lines = mk((3, args.cp_res, args.cp), ks[9])
    sig_lines = mk((3, args.cp_res, args.sig), ks[10])

    xT = jax.random.uniform(ks[11], (3, B), jnp.float32, -2.0, 2.0)
    dl = jnp.full((N, T), 0.05, jnp.float32)
    ts = jnp.cumsum(dl, axis=1)
    rays8 = jnp.concatenate(
        [jnp.zeros((N, 3)), jax.random.normal(key, (N, 3)),
         jnp.zeros((N, 2))], axis=1).astype(jnp.float32)

    common = dict(enc_freqs=enc_freqs, bound=bound, skip_layers=skip,
                  leaky=True, opaque=True, block=args.block)

    rows = {}

    def run(name, **kw):
        try:
            ms = timed(run_tmlp_composite, xT, dl, ts, layers, n=args.n,
                       **{**common, **kw})
            rows[name] = round(ms, 2)
            print(f"{name:28s} {ms:7.2f} ms", flush=True)
        except Exception as e:
            rows[name] = None
            print(f"{name:28s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    # the benched configuration (grids + view epilogue)
    run("full(grids+view)", rays8=rays8, view_layers=view_layers,
        cp_lines=cp_lines, sigma_cp_lines=sig_lines)
    run("no_view(grids)", cp_lines=cp_lines, sigma_cp_lines=sig_lines)
    run("no_grids(view)", rays8=rays8, view_layers=view_layers)
    run("mlp_only", )
    # field chain without the composite epilogue (plain run_tmlp)
    try:
        ms = timed(run_tmlp, xT, layers, enc_freqs, bound, n=args.n,
                   skip_layers=skip, leaky=True, block=args.block,
                   transposed=True, cp_lines=cp_lines,
                   sigma_cp_lines=sig_lines)
        rows["tmlp_nocomp(grids)"] = round(ms, 2)
        print(f"{'tmlp_nocomp(grids)':28s} {ms:7.2f} ms", flush=True)
    except Exception as e:
        print(f"tmlp_nocomp FAILED: {e}", flush=True)
    # block sweep on the full config
    for blk in (2048, 8192, 16384):
        run(f"full@block{blk}", rays8=rays8, view_layers=view_layers,
            cp_lines=cp_lines, sigma_cp_lines=sig_lines, block=blk)

    print(json.dumps({"rays": N, "T": T, **rows}))


if __name__ == "__main__":
    main()
