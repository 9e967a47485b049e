"""Package a serving-student workspace as the committed bench asset.

Reads <workspace>/serving_meta.json + its latest checkpoint and writes
assets/serving_student.{json,npz} — the ONE artifact bench.py serves for
fps, psnr_db, latency and (with tools/mask_asset.py) mask_miou. Records
provenance (teacher, distill report, this tool's arguments) in the json.

Usage: python tools/pack_asset.py /tmp/slim64 [--out assets/serving_student]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workspace")
    ap.add_argument("--name", default="ngp")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "serving_student"))
    args = ap.parse_args(argv)

    from sanerf_tpu.train.checkpoints import CheckpointManager

    with open(os.path.join(args.workspace, "serving_meta.json")) as f:
        meta = json.load(f)
    mgr = CheckpointManager(args.workspace, name=args.name)
    path = mgr.resolve("latest")
    assert path, f"no checkpoint under {args.workspace}"
    flat, ck_meta = CheckpointManager.load_file(path)
    out = {k: v for k, v in flat.items() if k.startswith("params/")}
    np.savez(args.out + ".npz", **out)
    with open(args.out + ".json", "w") as f:
        json.dump({
            "model_config": meta["model_config"],
            "render_config": meta["render_config"],
            "provenance": {
                "workspace": args.workspace,
                "checkpoint": os.path.basename(path),
                "teacher": meta.get("teacher") or meta.get("teacher_step"),
                "report": meta.get("report"),
            },
        }, f, indent=1, default=str)
    print(f"packed {args.out}.npz ({len(out)} leaves) from {path}")


if __name__ == "__main__":
    main()
