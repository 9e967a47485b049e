"""Per-op device profile of the benched interactive frame.

Builds the exact session bench.py serves (the committed serving asset,
quality-gated (32, 16) hierarchy by default) and prints tools/trace.py's
ranked device-op table for one pipelined `InteractiveSession.step` — the
ground truth for where the frame's device milliseconds go.

Usage: python tools/trace_frame.py [--steps 32,24] [--size 512] [--no-asset]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")  # repo root

from bench import _build_session  # noqa: E402
from tools.trace import trace_report  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default="32,16")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--no-asset", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    steps = tuple(int(s) for s in args.steps.split(","))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    session, has_asset = _build_session(steps, size=args.size,
                                        use_asset=not args.no_asset)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)
    intr = session.intrinsics_for(pose)
    session.step(pose, intr, pipelined=False)  # compile
    session.points_3d.append(np.zeros(3, np.float32))
    session.step(pose, intr, pipelined=False)

    def fn():
        session.step(pose, intr, pipelined=False)

    trace_report(
        fn,
        f"frame {args.size}^2 steps={steps} "
        f"asset={'yes' if has_asset else 'no'}",
        top=args.top)


if __name__ == "__main__":
    main()
