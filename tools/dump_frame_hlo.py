"""Dump the optimized HLO of the benched `_frame_program` and grep the
expensive non-kernel ops (the profile's dynamic-update-slice / concat /
select rows) with their shapes — ground truth for what the XLA glue is.

Usage: python tools/dump_frame_hlo.py [--steps 32,24] [--size 512]
                                      [--grep dynamic-update-slice ...]
"""

import argparse
import re
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default="32,24")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="/tmp/frame_hlo.txt")
    ap.add_argument("--grep", nargs="*", default=[
        "dynamic-update-slice", "concatenate", "select", " dot(",
        "transpose", "copy("])
    args = ap.parse_args()
    steps = tuple(int(s) for s in args.steps.split(","))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import _build_session

    session, _ = _build_session(steps, size=args.size)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)
    intr = session.intrinsics_for(pose)
    session.step(pose, intr, pipelined=False)  # compile + cache
    pipe = session._pipe(args.size, args.size)
    # the jitted callable caches its executable; pull the optimized HLO
    import sanerf_tpu.apps.frame_pipeline as fp

    # re-trace through lower() — the executable comes from the persistent
    # compilation cache, so this is cheap
    K = pipe.max_points
    packed = np.zeros((28 + 4 * K,), np.float32)
    packed[:16] = pose.reshape(-1)
    packed[16:20] = intr
    # mirror the session's actual static args (mesh/overlay/transport) so
    # the dump IS the benched executable, not a second cache entry
    lowered = fp._frame_program.lower(
        pipe.model, pipe.params, pipe.sam_cfg, pipe.sam_params,
        packed, pipe._acc, None, hw=pipe.hw, feat_hw=pipe.feat_hw,
        input_hw=pipe.input_hw, mode="image", perturb=False,
        with_overlay=pipe.overlay, mesh=pipe.mesh, mesh_axis=pipe.mesh_axis,
        fetch_format=pipe.fetch_format, use_aabb=False)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out}: {len(txt)} bytes")
    pats = [re.compile(g) for g in args.grep]
    for line in txt.splitlines():
        s = line.strip()
        if any(p.search(s) for p in pats) and "fusion" not in s.split("=")[0]:
            if len(s) > 300:
                s = s[:300] + " ..."
            print(s)


if __name__ == "__main__":
    main()
