"""Isolate WHY the composite kernel reads ~25 ms inside the frame jit but
~10 ms standalone (kbench/kbench2 round-5 findings).

Variants, all at the served-asset shapes (freqs=10, d3 w128 skip@1,
CP96+sigma32 stacked, view MLP, T=24, N=512^2):

  inner          _run_tmlp_composite (its own jit) with PRE-PACKED concrete
                 operands — the fast standalone case.
  outer-packed   an outer jit whose ARGS are the packed operands; calls
                 _run_tmlp_composite inside. If fast -> hoisting the pack
                 out of the frame jit fixes the frame.
  outer-raw      an outer jit whose args are the RAW param pytree; packs
                 in-trace (the frame's current situation). Expected slow.

Prints chained-dispatch device ms for each.
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
    from bench import _build_session

    session, has_asset = _build_session((32, 24))
    assert has_asset
    model, params = session._bench_model, session._bench_params

    N, T = 512 * 512, 24
    B = N * T
    key = jax.random.key(0)
    xT = jax.random.uniform(key, (3, B), jnp.float32, -2.0, 2.0)
    dl = jnp.full((N, T), 0.05, jnp.float32)
    ts = jnp.cumsum(dl, axis=1)
    rays8 = jnp.concatenate(
        [jnp.zeros((N, 3)), jax.random.normal(key, (N, 3)),
         jnp.zeros((N, 2))], axis=1).astype(jnp.float32)

    enc_freqs = model.cfg.mlp_enc_freqs
    bound = model.bound
    skip = (model.cfg.mlp_field_depth // 2,)
    block_cfg = model.render_cfg.fused_block
    sh_degree = model.cfg.sh_degree
    layers = params["grid_mlp"]
    view_layers = params["view_mlp"]
    cp_lines = params.get("cp_lines")
    sigma_cp = params.get("sigma_cp_lines")
    dtype = layers[0]["w"].dtype

    # ---- pre-pack (eager), mirroring run_tmlp_composite's trace ----
    import math

    z0_projT, z0_phase, row_map = ft.make_ad_consts(
        enc_freqs, float(np.pi / bound))
    cpT, cp_info, row_map = ft._prep_grids(
        cp_lines, None, None, row_map, bound, dtype,
        sigma_cp_lines=sigma_cp)
    wstack, bias, dims = ft.pack_tmlp_traced(
        layers, len(row_map), skip, dtype, enc_row_map=row_map)
    sh_dim = sh_degree * sh_degree
    kout_field = layers[-1]["w"].shape[1]
    vgeo, vsh, vrest, (_H, n_rest, _) = ft.pack_view_weights(
        view_layers, kout_field - 1, sh_dim, kout_field, dtype=dtype)
    view = (n_rest, sh_dim, sh_degree)
    lmask = jnp.zeros((1, 1), jnp.float32)
    out_rows = ft._round_up(dims[-1][2], 8)
    unit = T * 128 // math.gcd(T, 128)
    exact = ft._divisor_block(B, unit, block_cfg)
    block = exact if exact else max(block_cfg // unit, 1) * unit
    print(f"block={block} dims={dims} cp_info={cp_info}", flush=True)

    packed = dict(wstack=wstack, cpT=tuple(cpT), vgeo=vgeo, vsh=vsh,
                  vrest=vrest, z0_projT=z0_projT, z0_phase=z0_phase,
                  lmask=lmask)
    packed = jax.device_put(packed)

    def inner_call(pk, x):
        return ft._run_tmlp_composite(
            x, dl, ts, pk["wstack"], None, pk["z0_projT"], pk["z0_phase"],
            pk["lmask"], dims, True, T, True, block, out_rows, False,
            ad_freqs=enc_freqs, rays8=rays8, vgeo=pk["vgeo"], vsh=pk["vsh"],
            vrest=pk["vrest"], view=view, cpT=pk["cpT"], cp_info=cp_info)

    ms = timed(lambda: inner_call(packed, xT))
    print(f"inner (pre-packed, own jit)     {ms:7.2f} ms", flush=True)

    jo = jax.jit(inner_call)
    ms = timed(lambda: jo(packed, xT))
    print(f"outer-packed (packed jit args)  {ms:7.2f} ms", flush=True)

    def raw_call(p, x):
        return ft.run_tmlp_composite(
            x, dl, ts, p["grid_mlp"], enc_freqs, bound, skip, leaky=True,
            opaque=True, block=block_cfg, rays8=rays8,
            view_layers=p["view_mlp"], sh_degree=sh_degree,
            cp_lines=p.get("cp_lines"),
            sigma_cp_lines=p.get("sigma_cp_lines"))

    jr = jax.jit(raw_call)
    ms = timed(lambda: jr(params, xT))
    print(f"outer-raw (pack in-trace)       {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
