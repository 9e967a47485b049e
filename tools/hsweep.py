"""Hierarchy + student-shape sweep for the 30 fps attack.

In ONE process (so relay/chip conditions are comparable):
  - probes tunnel RTT (tools/relay_probe.py) for attribution,
  - for each inference hierarchy: builds the ASSET session, measures
    pipelined fps + sync latency + held-out-ring PSNR through the same
    serving path (the bench.py protocol),
  - for each candidate slimmer student SHAPE: measures fps with random
    params (fps is weight-value independent; quality comes later from
    tools/distill_serving.py if the shape wins).

Usage: python tools/hsweep.py [--hierarchies 32,24 24,16 ...]
                              [--shapes w64cp64 ...] [--frames 7]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from bench import _build_session, _drive, _eval_psnr  # noqa: E402

SHAPES = {
    # name -> ModelConfig overrides (all serve through cp_fused)
    "w96cp96": {"mlp_field_width": 96, "mlp_field_depth": 3,
                "mlp_cp_rank": 96, "mlp_cp_res": 256,
                "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 256},
    "w64cp64": {"mlp_field_width": 64, "mlp_field_depth": 3,
                "mlp_cp_rank": 64, "mlp_cp_res": 256,
                "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 256},
    "w128cp64r128": {"mlp_field_width": 128, "mlp_field_depth": 3,
                     "mlp_cp_rank": 64, "mlp_cp_res": 128,
                     "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 128},
    # separate the levers: rank 64 at full res-256 tables
    "w128cp64r256": {"mlp_field_width": 128, "mlp_field_depth": 3,
                     "mlp_cp_rank": 64, "mlp_cp_res": 256,
                     "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 256},
    # proposal-net slimming (its small dots run <20% MXU tile utilization)
    "slim_propd2": {"mlp_field_width": 128, "mlp_field_depth": 3,
                    "mlp_cp_rank": 64, "mlp_cp_res": 128,
                    "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 128,
                    "mlp_prop_depth": 2},
    "slim_propd2w32": {"mlp_field_width": 128, "mlp_field_depth": 3,
                       "mlp_cp_rank": 64, "mlp_cp_res": 128,
                       "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 128,
                       "mlp_prop_depth": 2, "mlp_prop_width": 32},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hierarchies", nargs="+",
                    default=["32,24", "32,16", "24,16", "24,12", "16,12"])
    ap.add_argument("--shapes", nargs="+", default=[])
    ap.add_argument("--shape_steps", default="24,16")
    ap.add_argument("--frames", type=int, default=7)
    ap.add_argument("--skip_psnr", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from tools.relay_probe import probe_device_frame, probe_rtt

    rtt = probe_rtt()
    print(f"relay rtt {rtt:.1f} ms", flush=True)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)

    def measure(sess, has_asset, label, compile_s0=None):
        """Device frame time (relay-immune: chained dispatch through the
        donated spp accumulator) + a wall fps reading for reference."""
        t0 = time.time()
        dt, compile_s = _drive(sess, n_frames=args.frames)
        dev = probe_device_frame(sess, pose, sess.intrinsics_for(pose),
                                 n=args.frames * 2)
        psnr = (None if args.skip_psnr or not has_asset
                else _eval_psnr(sess))
        return {"cfg": label, "device_ms": round(dev, 1),
                "device_fps": round(1000.0 / max(dev, 1e-9), 2),
                "wall_ms": round(dt * 1000, 1),
                "psnr": None if psnr is None else round(psnr, 3),
                "compile_s": round(compile_s, 0)}

    rows = []
    for spec in args.hierarchies:
        steps = tuple(int(s) for s in spec.split(","))
        try:
            sess, has_asset = _build_session(steps)
            rows.append(measure(sess, has_asset, f"asset@{spec}"))
            print(json.dumps(rows[-1]), flush=True)
        except Exception as e:
            print(f"asset@{spec} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)

    sh_steps = tuple(int(s) for s in args.shape_steps.split(","))
    for name in args.shapes:
        mc_over = SHAPES[name]
        try:
            sess, _ = _build_session(sh_steps, {"cp_fused": True}, mc_over,
                                     use_asset=False)
            rows.append(measure(sess, False, f"{name}@{args.shape_steps}"))
            print(json.dumps(rows[-1]), flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)

    print("\n== hsweep summary (rtt %.1f ms) ==" % rtt)
    for r in rows:
        print("  " + json.dumps(r))


if __name__ == "__main__":
    main()
