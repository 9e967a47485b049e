"""Serving distillation: quality-grid checkpoint -> fused-path student.

The hi-res grid recipe (scripts/train_rgb_grids.sh) trains the best
held-out quality, but its finest VM planes (~48 MB bf16 at 1024^2) exceed
the ~16 MB/core VMEM the cp_fused kernels pin tables into, so run_rays
serves it through the XLA lookup path (RenderConfig.grid_vmem_budget).
This tool closes the loop the TPU-native way — convert the REPRESENTATION
once, like tools/import_checkpoint.py does for reference hash grids:
fit a serving student (default: the same config with the tables stripped,
i.e. the pure fused-MLP flagship; optionally small VMEM-sized tables via
--serve_* flags) to the quality teacher on a density-importance point
set, and save a standard workspace checkpoint that renders at full fused
speed.

Usage — pass the SAME flags the teacher was trained with (the checkpoint
stores params only), plus the serving overrides:

    python tools/distill_serving.py <data_or_dot> --workspace trial_grids \
        --mlp_depth 3 --cp_rank 96 --cp_res 2048 --cp_levels 4 \
        --vm_rank 32 --vm_res 1024 --vm_levels 4 \
        --sigma_cp_rank 96 --sigma_cp_res 2048 \
        --out_workspace trial_serving \
        [--serve_depth 8] [--serve_cp_rank 16 --serve_cp_res 512] \
        [--distill_iters 8000]

Reference context: the reference serves the model it trains (nerf/gui.py)
because CUDA hash gathers are cheap there; on TPU the train-for-quality /
distill-for-serving split is the design that keeps both axes at their
hardware optimum.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sanerf_tpu.apps.main import build_parser, config_from_args  # noqa: E402


def main(argv=None):
    ap = build_parser()
    ap.add_argument("--out_workspace", required=True,
                    help="workspace for the serving checkpoint")
    ap.add_argument("--out_name", default="ngp")
    ap.add_argument("--teacher_name", default=None,
                    help="teacher checkpoint name prefix in the workspace "
                         "(default: same as --out_name; quality_gate "
                         "workspaces use the family name, e.g. 'mlp')")
    ap.add_argument("--distill_iters", type=int, default=8000)
    ap.add_argument("--distill_points", type=int, default=1 << 22)
    ap.add_argument("--distill_batch", type=int, default=1 << 15)
    ap.add_argument("--distill_lr", type=float, default=2e-3)
    ap.add_argument("--serve_depth", type=int, default=None,
                    help="serving field depth (default: teacher's)")
    ap.add_argument("--serve_cp_rank", type=int, default=0,
                    help="serving CP rank (default 0: tables stripped)")
    ap.add_argument("--serve_cp_res", type=int, default=512)
    ap.add_argument("--serve_cp_levels", type=int, default=1)
    ap.add_argument("--serve_vm_rank", type=int, default=0)
    ap.add_argument("--serve_vm_res", type=int, default=128)
    ap.add_argument("--serve_vm_levels", type=int, default=1)
    ap.add_argument("--serve_sigma_cp_rank", type=int, default=0)
    ap.add_argument("--serve_sigma_cp_res", type=int, default=512)
    ap.add_argument("--serve_width", type=int, default=None,
                    help="serving field MLP width (default: teacher's; the "
                         "fused chain's MXU cost scales ~linearly in width)")
    ap.add_argument("--serve_prop_width", type=int, default=None,
                    help="serving proposal-net width (its small dots run "
                         "below MXU tile utilization — slimming cuts real "
                         "frame ms at matched sample placement)")
    ap.add_argument("--serve_prop_depth", type=int, default=None)
    ap.add_argument("--render_check", type=int, default=2,
                    help="orbit frames for the fidelity PSNR (0 = skip)")
    args = ap.parse_args(argv)

    import jax

    from sanerf_tpu.models import fields, import_distill
    from sanerf_tpu.train.checkpoints import CheckpointManager

    cfg = config_from_args(args)
    teacher = fields.make_model(cfg.model, cfg.render)
    template = fields.init_params(teacher, jax.random.key(0))
    mgr = CheckpointManager(args.workspace,
                            name=args.teacher_name or args.out_name)
    restored = mgr.load(args.ckpt, template, model_only=True)
    if restored is None:
        raise SystemExit(f"no checkpoint in {args.workspace} "
                         f"(mode={args.ckpt})")
    params, ema, _, meta = restored
    tparams = ema if ema is not None else params
    print(f"[serve] teacher step {meta.get('step')} | grid tables "
          f"{teacher.grid_table_bytes / 2**20:.1f} MiB "
          f"(budget {cfg.render.grid_vmem_budget / 2**20:.1f})")

    student = fields.make_model(import_distill.student_config(
        cfg.model,
        cp_rank=args.serve_cp_rank, cp_res=args.serve_cp_res,
        cp_levels=args.serve_cp_levels,
        vm_rank=args.serve_vm_rank, vm_res=args.serve_vm_res,
        vm_levels=args.serve_vm_levels,
        sigma_cp_rank=args.serve_sigma_cp_rank,
        sigma_cp_res=args.serve_sigma_cp_res,
        depth=args.serve_depth, width=args.serve_width,
        prop_width=args.serve_prop_width,
        prop_depth=args.serve_prop_depth), cfg.render)
    assert student.grid_table_bytes <= cfg.render.grid_vmem_budget, (
        "serving student still exceeds the VMEM budget "
        f"({student.grid_table_bytes / 2**20:.1f} MiB)")

    sm, sp, report = import_distill.distill_to_mlp(
        teacher, tparams, key=jax.random.key(args.seed),
        n_points=args.distill_points, batch=args.distill_batch,
        iters=args.distill_iters, lr=args.distill_lr,
        student_model=student, render_check=args.render_check)
    out_mgr = CheckpointManager(args.out_workspace, name=args.out_name)
    path = out_mgr.save(0, sp, ema_params=sp, full=False)
    out = {"checkpoint": path, "family": "mlp-serving", **{
        k: v for k, v in report.items() if k != "losses"}}
    out["losses"] = {k: round(float(v), 6)
                     for k, v in report["losses"].items()}
    # asset metadata: everything bench.py needs to rebuild and serve the
    # student standalone (the one-artifact fps+dB measurement)
    import dataclasses as _dc

    meta_path = os.path.join(args.out_workspace, "serving_meta.json")
    with open(meta_path, "w") as f:
        json.dump({
            "model_config": _dc.asdict(sm.cfg),
            "render_config": _dc.asdict(cfg.render),
            "teacher_step": meta.get("step"),
            "report": {k: v for k, v in out.items() if k != "checkpoint"},
        }, f, indent=1, default=str)
    out["meta"] = meta_path
    print(json.dumps(out))


if __name__ == "__main__":
    main()
