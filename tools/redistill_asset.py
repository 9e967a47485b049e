"""Re-distill the committed serving asset into a slimmer serving shape.

tools/hsweep.py measured the 512^2 interactive frame at 34.2 ms (29.3 fps)
for the cp64@128 student shape vs 51.5 ms for the served cp96@256 asset —
the CP table block dominates the fused kernel. This tool fits a slim
student to the CURRENT asset (teacher = assets/serving_student.*, the one
trained artifact that survives between hardware rounds) so the fps shape
can ship without waiting for a fresh multi-hour teacher run; when a better
teacher exists (tools/quality_gate.py 20k hashgrid), distill from that
instead (tools/distill_serving.py).

Usage: python tools/redistill_asset.py --out_workspace /tmp/slim64 \
           [--cp_rank 64 --cp_res 128] [--width 128] [--prop_depth 2]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_workspace", required=True)
    ap.add_argument("--out_name", default="ngp")
    ap.add_argument("--teacher", default="asset",
                    choices=["asset", "qg_hashgrid", "qg_mlp"],
                    help="'asset' = the committed serving asset; "
                         "'qg_hashgrid'/'qg_mlp' = a tools/quality_gate.py "
                         "workspace (its exact fixture protocol configs)")
    ap.add_argument("--teacher_workspace", default="/tmp/qg20k/hashgrid")
    ap.add_argument("--teacher_name", default=None,
                    help="checkpoint prefix (default: quality_gate family "
                         "name inferred from --teacher)")
    ap.add_argument("--cp_rank", type=int, default=64)
    ap.add_argument("--cp_res", type=int, default=128)
    ap.add_argument("--sigma_cp_rank", type=int, default=32)
    ap.add_argument("--sigma_cp_res", type=int, default=128)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--prop_width", type=int, default=None)
    ap.add_argument("--prop_depth", type=int, default=None)
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--points", type=int, default=1 << 22)
    ap.add_argument("--batch", type=int, default=1 << 15)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import _load_asset
    from sanerf_tpu.models import fields, import_distill
    from sanerf_tpu.train.checkpoints import CheckpointManager, unflatten_like

    if args.teacher == "asset":
        asset = _load_asset()
        assert asset is not None, "assets/serving_student.* missing"
        mc, rc, flat = asset
        mc = dataclasses.replace(mc, with_sam=False)
        teacher = fields.make_model(mc, rc)
        template = fields.init_params(teacher, jax.random.key(0))
        tparams = unflatten_like(template, {k[len("params/"):]: v
                                            for k, v in flat.items()
                                            if k.startswith("params/")}, "")
        teacher_src = "assets/serving_student"
    else:
        # a tools/quality_gate.py workspace: rebuild its EXACT fixture
        # protocol configs (run_family) so checkpoint shapes match
        from sanerf_tpu.config import ModelConfig, RenderConfig

        fam = "hashgrid" if args.teacher == "qg_hashgrid" else "mlp"
        mc = ModelConfig(field_type=fam, prop_resolutions=(128, 256))
        rc = RenderConfig(num_steps=(128, 64, 32), bound=4.0, contract=True,
                          min_near=0.5, max_ray_batch=65536)
        teacher = fields.make_model(mc, rc)
        template = fields.init_params(teacher, jax.random.key(0))
        mgr_t = CheckpointManager(args.teacher_workspace,
                                  name=args.teacher_name or fam)
        restored = mgr_t.load("latest", template, model_only=True)
        assert restored is not None, f"no ckpt in {args.teacher_workspace}"
        params_t, ema_t, _, meta_t = restored
        tparams = ema_t if ema_t is not None else params_t
        teacher_src = (f"{args.teacher_workspace} "
                       f"(step {meta_t.get('step')})")
    print(f"[redistill] teacher = {args.teacher}: {teacher_src}")

    if args.teacher != "asset" and args.depth is None:
        args.depth = 3  # the measured-best serving decoder depth
    student = fields.make_model(import_distill.student_config(
        mc, cp_rank=args.cp_rank, cp_res=args.cp_res,
        sigma_cp_rank=args.sigma_cp_rank, sigma_cp_res=args.sigma_cp_res,
        depth=args.depth, width=args.width,
        prop_width=args.prop_width, prop_depth=args.prop_depth), rc)

    sm, sp, report = import_distill.distill_to_mlp(
        teacher, tparams, key=jax.random.key(args.seed),
        n_points=args.points, batch=args.batch, iters=args.iters,
        lr=args.lr, student_model=student, render_check=2)
    mgr = CheckpointManager(args.out_workspace, name=args.out_name)
    path = mgr.save(0, sp, ema_params=sp, full=False)
    with open(os.path.join(args.out_workspace, "serving_meta.json"), "w") as f:
        json.dump({"model_config": dataclasses.asdict(sm.cfg),
                   "render_config": dataclasses.asdict(rc),
                   "teacher": teacher_src,
                   "report": {k: (v if not isinstance(v, dict) else
                                  {kk: round(float(vv), 6)
                                   for kk, vv in v.items()})
                              for k, v in report.items()}}, f, indent=1,
                  default=str)
    print(json.dumps({"checkpoint": path,
                      "render_psnr_vs_teacher": report.get("render_psnr"),
                      "losses": {k: round(float(v), 6)
                                 for k, v in report["losses"].items()}}))


if __name__ == "__main__":
    main()
