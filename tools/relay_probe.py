"""Separate the interactive frame's DEVICE time from the tunnel's RTT.

The TPU is reached through a relay whose RTT and bandwidth swing between
sessions (observed 27-90+ ms; BENCH fps moved 10.6-21 fps with NO code
change). This probe measures the three independent quantities the wall
numbers are made of, so perf work aims at the device and the README can
state which part of a regression is environmental:

  rtt_ms       tunnel round-trip for a tiny (4 B) fetch
  xfer_ms      device->host copy of one packed display buffer (393 KB at
               512^2 yuv420) MINUS rtt -> tunnel bandwidth
  device_ms    per-frame device compute: N frame programs chained through
               the donated spp accumulator, ONE block at the end
               (total - rtt)/N. Dispatches are async; the device stream
               serializes the programs, so this is pure device time.

Usage: python tools/relay_probe.py [--steps 32,24] [--frames 16]
Prints one JSON line; bench.py embeds the same measurements.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root


def probe_rtt(n: int = 12) -> float:
    """Median ms for a tiny dispatch+fetch round trip (fresh array each
    time — np.asarray memoizes `_value`, a repeat fetch reads ~0)."""
    import jax.numpy as jnp

    x = jnp.zeros((1,), jnp.float32)
    float(np.asarray(x + 1.0)[0])  # compile
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(x + float(i))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def probe_transfer(nbytes: int, n: int = 8) -> float:
    """Median ms to fetch `nbytes` of fresh device data (includes one rtt)."""
    import jax.numpy as jnp

    x = jnp.zeros((nbytes,), jnp.uint8)
    np.asarray(x + np.uint8(1))  # compile
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(x + np.uint8(i + 1))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def probe_device_frame(session, pose, intr, n: int = 16) -> float:
    """Per-frame DEVICE time of the exact benched frame program: dispatch n
    frames back-to-back with NO per-frame fetch (the device stream
    serializes them; the donated acc chains them), block once."""
    import jax

    pipe = session._pipe(session.H, session.W)
    p3, act = pipe.pad_points(session.points_3d)
    frames = []
    # warm (compile + first-dispatch overheads)
    frames.append(pipe._dispatch(pose, intr, p3, act, None, 1.0, 0, None,
                                 "image", False))
    jax.block_until_ready(frames[-1][0])
    rtt = probe_rtt(4)
    t0 = time.perf_counter()
    for _ in range(n):
        frames.append(pipe._dispatch(pose, intr, p3, act, None, 1.0, 0,
                                     None, "image", False))
    jax.block_until_ready(frames[-1][0])
    total = (time.perf_counter() - t0) * 1000
    return max(0.0, (total - rtt) / n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default="32,16")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()
    steps = tuple(int(s) for s in args.steps.split(","))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import _build_session

    session, has_asset = _build_session(steps, size=args.size)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)
    intr = session.intrinsics_for(pose)
    session.step(pose, intr, pipelined=False)  # compile
    session.points_3d.append(np.zeros(3, np.float32))
    session.step(pose, intr, pipelined=False)

    rtt = probe_rtt()
    xfer = probe_transfer(args.size * args.size * 3 // 2)  # yuv420 bytes
    dev = probe_device_frame(session, pose, intr, n=args.frames)

    # wall numbers for the same session, for the split story
    t0 = time.perf_counter()
    session.step(pose, intr, pipelined=False)
    sync_ms = (time.perf_counter() - t0) * 1000

    print(json.dumps({
        "steps": list(steps),
        "rtt_ms": round(rtt, 1),
        "xfer_ms": round(xfer, 1),
        "xfer_mbps": round(args.size * args.size * 1.5 / 1e6
                           / max(1e-9, (xfer - rtt) / 1000), 1),
        "device_ms": round(dev, 1),
        "device_fps": round(1000.0 / max(dev, 1e-9), 2),
        "sync_wall_ms": round(sync_ms, 1),
        "asset": bool(has_asset),
    }))


if __name__ == "__main__":
    main()
