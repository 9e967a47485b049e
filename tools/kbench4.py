"""Single-process A/B: kbench-style eager run_tmlp_composite (reads ~9.5 ms)
vs kbench3-style pre-packed _run_tmlp_composite (read ~30 ms in a separate
process). Same synthetic operands, same shapes; isolates whether the gap is
(a) real and call-path-dependent, (b) a _build_session side effect, or
(c) cross-process/chip variance.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timed(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) * 1000 / n


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sanerf_tpu.ops import fused_mlp_t as ft

    N, T = 512 * 512, 24
    B = N * T
    d, w, cp, cp_res, sig, enc_freqs, bound = 3, 128, 96, 256, 32, 10, 128.0
    key = jax.random.key(0)
    ks = jax.random.split(key, 12)

    def mk(shape, k):
        return (jax.random.normal(k, shape) * 0.1).astype(jnp.bfloat16)

    enc_dim = 3 * (1 + 2 * enc_freqs) + cp
    skip = (d // 2,)
    layers = []
    fin = enc_dim
    for l in range(d):
        fi = fin if l == 0 else w
        if l in skip and l:
            fi = w + enc_dim
        fo = 16 if l == d - 1 else w
        layers.append({"w": mk((fi, fo), ks[l])})
    view_layers = [{"w": mk((31, 32), ks[6])}, {"w": mk((32, 32), ks[7])},
                   {"w": mk((32, 3), ks[8])}]
    cp_lines = mk((3, cp_res, cp), ks[9])
    sig_lines = mk((3, cp_res, sig), ks[10])
    xT = jax.random.uniform(ks[11], (3, B), jnp.float32, -2.0, 2.0)
    dl = jnp.full((N, T), 0.05, jnp.float32)
    ts = jnp.cumsum(dl, axis=1)
    rays8 = jnp.concatenate(
        [jnp.zeros((N, 3)), jax.random.normal(key, (N, 3)),
         jnp.zeros((N, 2))], axis=1).astype(jnp.float32)

    # ---- A: kbench-style eager wrapper call ----
    def call_a():
        return ft.run_tmlp_composite(
            xT, dl, ts, layers, enc_freqs, bound, skip, leaky=True,
            opaque=True, block=4096, rays8=rays8, view_layers=view_layers,
            sh_degree=4, cp_lines=cp_lines, sigma_cp_lines=sig_lines)

    ms_a = timed(call_a)
    print(f"A kbench-style eager wrapper     {ms_a:7.2f} ms", flush=True)

    # ---- B: kbench3-style pre-packed inner call ----
    import math

    dtype = jnp.bfloat16
    z0_projT, z0_phase, row_map = ft.make_ad_consts(
        enc_freqs, float(np.pi / bound))
    cpT, cp_info, row_map = ft._prep_grids(
        cp_lines, None, None, row_map, bound, dtype,
        sigma_cp_lines=sig_lines)
    wstack, bias, dims = ft.pack_tmlp_traced(
        layers, len(row_map), skip, dtype, enc_row_map=row_map)
    vgeo, vsh, vrest, (_H, n_rest, _) = ft.pack_view_weights(
        view_layers, 15, 16, 16, dtype=dtype)
    view = (n_rest, 16, 4)
    lmask = jnp.zeros((1, 1), jnp.float32)
    out_rows = 16
    unit = T * 128 // math.gcd(T, 128)
    block = ft._divisor_block(B, unit, 4096)
    print(f"   block={block} dims={dims}", flush=True)

    def call_b():
        return ft._run_tmlp_composite(
            xT, dl, ts, wstack, None, z0_projT, z0_phase, lmask, dims,
            True, T, True, block, out_rows, False, ad_freqs=enc_freqs,
            rays8=rays8, vgeo=vgeo, vsh=vsh, vrest=vrest, view=view,
            cpT=tuple(cpT), cp_info=cp_info)

    ms_b = timed(call_b)
    print(f"B pre-packed inner jit           {ms_b:7.2f} ms", flush=True)

    # ---- C: build the bench session, re-measure both ----
    from bench import _build_session

    session, has_asset = _build_session((32, 24))
    print(f"   session built (asset={has_asset})", flush=True)
    ms_a2 = timed(call_a)
    print(f"C A again after session build    {ms_a2:7.2f} ms", flush=True)
    ms_b2 = timed(call_b)
    print(f"D B again after session build    {ms_b2:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
