"""Capture a TPU trace of a callable and print per-op device times.

The profiling workhorse behind the round-2 perf work: wraps
jax.profiler.start_trace and parses the xplane.pb with xprof's
framework_op_stats converter, printing a ranked table of device ops with
self-time, achieved FLOP rate and memory bandwidth. Slow
dynamic-update-slice loops at ~100 GB/s in this table indicate XLA
"loopified" a relayout or an oversized fusion.

Usage:
    from tools.trace import trace_report
    trace_report(lambda: np.asarray(jitted_fn(x)[:1, :1]), "my op")

Force a small host fetch inside fn — dispatch is async and
block_until_ready can read ~0 through the relay.
"""
import glob
import json
import os
import shutil

import jax
import numpy as np


def _find_xplane(logdir):
    hits = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    return hits[0] if hits else None


def trace_report(fn, name="fn", top=30, logdir="/tmp/xtrace"):
    """Run fn once traced; print the top device ops by self time."""
    shutil.rmtree(logdir, ignore_errors=True)
    fn()  # warm
    jax.profiler.start_trace(logdir)
    fn()
    jax.profiler.stop_trace()
    xp = _find_xplane(logdir)
    if xp is None:
        print("no xplane.pb found")
        return None
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xp], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data) if isinstance(data, str) else data
    table = obj[0]
    cols = [c["id"] for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        d = dict(zip(cols, [c.get("v") for c in r["c"]]))
        if d.get("host_or_device") == "Device":
            rows.append(d)
    rows.sort(key=lambda d: -d["total_self_time"])
    tot = sum(d["total_self_time"] for d in rows)
    print(f"== {name}: device total {tot/1000:.1f} ms ==")
    for d in rows[:top]:
        op = d["operation"]
        if len(op) > 74:
            op = op[:71] + "..."
        fl = d.get("measured_flop_rate") or 0
        bw = d.get("measured_memory_bw") or 0
        print(f"{d['total_self_time']/1000.:8.2f} ms  x{int(d['occurrences']):<5} "
              f"{(d.get('bound_by') or '?'):8.8} {fl/1e3:7.1f} TF/s {bw:6.0f} GB/s  {op}",
              flush=True)
    return rows
