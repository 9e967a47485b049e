"""Why does the composite kernel read 25 ms in-frame but ~10 ms standalone?

Reproduces the frame's exact context in isolation steps:
  A. standalone eager (kbench.py style), asset shapes (enc_freqs=10)
  B. same but wrapped in ONE jit with traced params (the frame's context)
  C. B + the xT produced by a reshape of a [3, N, T] pallas output
     (the ray-kernel feed) instead of a fresh device array
  D. the real thing: run_rays on the asset model (fast_epi path)
Prints chained-dispatch ms for each.
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

    from sanerf_tpu.ops.fused_mlp_t import run_tmlp_composite
    from bench import _build_session

    # the served model + params (exact asset)
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

    def call(p, x):
        return run_tmlp_composite(
            x, dl, ts, p["grid_mlp"], model.cfg.mlp_enc_freqs, model.bound,
            (model.cfg.mlp_field_depth // 2,), leaky=True, opaque=True,
            block=model.render_cfg.fused_block, rays8=rays8,
            view_layers=p["view_mlp"], sh_degree=model.cfg.sh_degree,
            cp_lines=p.get("cp_lines"),
            sigma_cp_lines=p.get("sigma_cp_lines"))

    ms_a = timed(lambda: call(params, xT))
    print(f"A standalone eager, asset params   {ms_a:7.2f} ms", flush=True)

    jc = jax.jit(call)
    ms_b = timed(lambda: jc(params, xT))
    print(f"B one jit, traced params           {ms_b:7.2f} ms", flush=True)

    from sanerf_tpu.ops.ray_kernels import ray_level0

    s_nears = jnp.full((N, 1), 0.3)
    s_fars = jnp.full((N, 1), 0.9)
    r8 = jnp.concatenate([rays8[:, :6], s_nears, s_fars], axis=1)

    def call_c(p, r):
        bins, rays_t, dls, x3 = ray_level0(r, T, True, interpret=False)
        x = x3.reshape(3, N * T)
        return run_tmlp_composite(
            x, dls, rays_t, p["grid_mlp"], model.cfg.mlp_enc_freqs,
            model.bound, (model.cfg.mlp_field_depth // 2,), leaky=True,
            opaque=True, block=model.render_cfg.fused_block, rays8=r,
            view_layers=p["view_mlp"], sh_degree=model.cfg.sh_degree,
            cp_lines=p.get("cp_lines"),
            sigma_cp_lines=p.get("sigma_cp_lines"))

    jcc = jax.jit(call_c)
    ms_c = timed(lambda: jcc(params, r8))
    print(f"C jit, xT from ray-kernel reshape  {ms_c:7.2f} ms", flush=True)

    from sanerf_tpu.models import renderer

    ro = jnp.zeros((N, 3)) + jnp.asarray([0.0, 0.0, 2.0])
    rd = rays8[:, 3:6] / jnp.linalg.norm(rays8[:, 3:6], axis=-1, keepdims=True)
    jr = jax.jit(lambda p: renderer.run_rays(model, p, ro, rd)["image"])
    ms_d = timed(lambda: jr(params))
    print(f"D run_rays (fast_epi, asset model) {ms_d:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
