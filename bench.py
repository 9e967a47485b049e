"""Headline benchmark: interactive segmentation frame rate AND latency.

Measures the reference's north-star workload (readme.md:5, SURVEY.md §3.3):
one interactive frame = 512x512 RGB render + low-res (32x32) SAM-feature
render + 3D-point reprojection + SAM prompt-decoder mask + overlay.
Reference: 5 FPS on a V100.

The benched loop IS the product loop: frames go through
`InteractiveSession.step` -> `FramePipeline` — exactly what the GUI runs
(VERDICT r2 items 2/weak-2). Reported:
  - value (fps): double-buffered steady-state throughput (the GUI cadence);
  - latency_ms: click-to-pixels latency of a SYNC frame (dispatch + fetch
    of the same frame, no pipelining);
  - full_hierarchy_fps: same loop at the reference's full (128, 64, 32)
    sampling hierarchy (apples-to-apples vs the V100's 5 fps; the primary
    number uses the quality-gated (32, 24) inference hierarchy).

Prints ONE JSON line:
  {"metric": "interactive_fps_512", "value": N, "unit": "fps",
   "vs_baseline": N/5, "latency_ms": L, "full_hierarchy_fps": F}
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 5.0  # V100, readme.md:5


def _build_session(num_steps, rc_overrides=None, mc_overrides=None, size=512):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sanerf_tpu.apps.interactive import InteractiveSession
    from sanerf_tpu.config import Config, ModelConfig, RenderConfig
    from sanerf_tpu.models import fields
    from sanerf_tpu.models.sam import SamConfig, SamPredictor
    from sanerf_tpu.models.sam import predictor as sam_predictor_mod

    rc = RenderConfig(num_steps=num_steps, bound=128.0, contract=True,
                      max_ray_batch=512 * 512)
    mc = ModelConfig(field_type="mlp", with_sam=True,
                     sam_use_view_direction=True)
    if rc_overrides:
        rc = dataclasses.replace(rc, **rc_overrides)
    if mc_overrides:
        mc = dataclasses.replace(mc, **mc_overrides)
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(0))
    params = fields.cast_params(params, jnp.bfloat16)  # bf16 inference path

    # SAM prompt decoder (randomly initialized — decode cost is
    # weight-independent), bf16 like production inference
    sam_cfg = SamConfig()
    sam_params = sam_predictor_mod.init_params(sam_cfg, jax.random.key(1))
    # drop the unused ViT-H encoder (641M params) — the interactive loop
    # only runs the prompt encoder + mask decoder on rendered features
    sam_params["image_encoder"] = jax.tree.map(
        lambda x: x[:0] if hasattr(x, "shape") and x.ndim else x,
        sam_params["image_encoder"],
    )
    sam_params = fields.cast_params(sam_params, jnp.bfloat16)
    sam = SamPredictor(sam_cfg, sam_params)
    return InteractiveSession(Config(), model, params, sam, H=size, W=size)


def _drive(session, n_frames=7, sync=False):
    """Time steady-state frames through the product loop (one click set)."""
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)
    intr = session.intrinsics_for(pose)

    def frame():
        return session.step(pose, intr, pipelined=not sync)

    # warm-up / compile; then place one prompt point (the reference's
    # interactive workload always has an active prompt)
    t0 = time.time()
    frame()
    compile_s = time.time() - t0
    if not session.points_3d:
        session.points_3d.append(np.zeros(3, np.float32))
    frame()  # second warm frame (relay variance)
    times = []
    for _ in range(n_frames):
        t0 = time.time()
        frame()
        times.append(time.time() - t0)
    return float(np.median(times)), compile_s


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # primary: quality-gated (32, 24) inference hierarchy (-0.076 dB vs the
    # (128, 64, 32) training hierarchy held-out on the trained w128
    # flagship, textured fixture; (48, 32) was -0.014 — one proposal level
    # suffices to place the final samples at inference)
    session = _build_session((32, 24))
    dt, compile_s = _drive(session)
    fps = 1.0 / dt
    lat, _ = _drive(session, n_frames=5, sync=True)

    # apples-to-apples: the reference's full sampling hierarchy
    session_full = _build_session((128, 64, 32))
    dt_full, _ = _drive(session_full, n_frames=5)
    fps_full = 1.0 / dt_full

    result = {
        "metric": "interactive_fps_512",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "latency_ms": round(lat * 1000, 1),
        "full_hierarchy_fps": round(fps_full, 3),
    }
    print(json.dumps(result))
    print(
        f"# median frame {dt*1000:.0f} ms (sync latency {lat*1000:.0f} ms; "
        f"full hierarchy {dt_full*1000:.0f} ms) | compile {compile_s:.0f} s | "
        f"device {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
