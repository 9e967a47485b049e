"""Field-family quality gate on the adversarial textured fixture.

Trains BOTH field families (the TPU-flagship Fourier-feature MLP and the
reference-faithful multiresolution hash grid) on the hardest synthetic
scene this environment can produce — high-frequency procedural textures on
three mutually occluding spheres over a fine-checkered floor
(data/synthetic.py:ray_textured_scene) — and reports held-out-view PSNR
side by side. This is the only field-family parity evidence possible
without real Mip-360/LLFF data (BASELINE.md: parity "must be established
by running the reference recipes"); state that limitation wherever the
numbers are quoted.

Run on the TPU:
    python tools/quality_gate.py --iters 20000 --H 128
Quick sanity (CPU):
    JAX_PLATFORMS=cpu python tools/quality_gate.py --iters 200 --H 32

Also the capacity gate for perf work: pass --mlp_width to measure how much
field width the MLP family actually needs at matched quality.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_family(field_type: str, args, mlp_width: int | None = None) -> dict:
    import jax
    import numpy as np

    from sanerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.models import fields
    from sanerf_tpu.train.trainer import Trainer

    # min_near 0.5 is geometry-derived for the fixture (closest in-frustum
    # content is >1.1 units from every ring camera): the reference gets the
    # same guard from per-view sparse-depth near/far (colmap_provider.py:
    # 554-600); without it inward-ring cameras admit mutually-invisible
    # near-plane billboards that ace train views and score ~7 dB held-out
    rc = RenderConfig(num_steps=tuple(args.num_steps), bound=4.0,
                      contract=True, min_near=args.min_near,
                      max_ray_batch=args.H * args.H)
    mc = ModelConfig(field_type=field_type,
                     prop_resolutions=(128, 256))
    if mlp_width is not None:
        mc = dataclasses.replace(mc, mlp_field_width=mlp_width)
    if args.mlp_depth is not None and field_type == "mlp":
        # TensoRF pairs big grids with a SHALLOW decoder (2-layer) — the
        # 8-layer chain is the pure-Fourier flagship's; gate both.
        mc = dataclasses.replace(mc, mlp_field_depth=args.mlp_depth)
    if field_type == "mlp" and args.cp_rank:
        mc = dataclasses.replace(mc, mlp_cp_rank=args.cp_rank,
                                 mlp_cp_res=args.cp_res,
                                 mlp_cp_levels=args.cp_levels)
    if field_type == "mlp" and args.vm_rank:
        mc = dataclasses.replace(mc, mlp_vm_rank=args.vm_rank,
                                 mlp_vm_res=args.vm_res,
                                 mlp_vm_levels=args.vm_levels)
    if field_type == "mlp" and args.sigma_cp_rank:
        mc = dataclasses.replace(mc, mlp_sigma_cp_rank=args.sigma_cp_rank,
                                 mlp_sigma_cp_res=args.sigma_cp_res)
    if field_type == "mlp" and args.sigma_vm_rank:
        mc = dataclasses.replace(mc, mlp_sigma_vm_rank=args.sigma_vm_rank,
                                 mlp_sigma_vm_res=args.sigma_vm_res)
    tc = TrainConfig(iters=args.iters, num_rays=args.num_rays,
                     adaptive_num_rays=False, lambda_distort=args.distort,
                     lambda_tv=args.tv, lambda_l1_grid=args.l1,
                     grid_upsample_steps=tuple(args.upsample_steps),
                     grid_lr_mult=args.grid_lr_mult,
                     lr=args.lr, eval_cnt=1, save_cnt=args.save_cnt,
                     anneal_iters=args.anneal_iters,
                     use_native_loader=not args.no_native)
    cfg = Config(workspace=f"{args.workspace}/{field_type}"
                 + (f"_w{mlp_width}" if mlp_width else "")
                 + (f"_d{args.mlp_depth}" if field_type == "mlp"
                    and args.mlp_depth is not None else "")
                 + (f"_cp{args.cp_rank}" if field_type == "mlp"
                    and args.cp_rank else "")
                 + (f"_vm{args.vm_rank}" if field_type == "mlp"
                    and args.vm_rank else "")
                 + (f"_scp{args.sigma_cp_rank}" if field_type == "mlp"
                    and args.sigma_cp_rank else "")
                 + (f"_svm{args.sigma_vm_rank}" if field_type == "mlp"
                    and args.sigma_vm_rank else ""),
                 render=rc, model=mc, train=tc)

    train_ds = SyntheticSphereDataset(H=args.H, W=args.H, n_views=args.views,
                                      scene="textured")
    # held-out ring: different radius/height than both training rings
    eval_ds = SyntheticSphereDataset(H=args.H, W=args.H, n_views=8,
                                     radius=1.8, scene="textured",
                                     training=False)
    # circle_poses(height=0.5 / 1.1) at radius 1.8/1.35 differ from the
    # training rings at 2.0/1.5 -> genuinely novel views
    from sanerf_tpu.train.metrics import PSNRMeter, SSIMMeter

    model = fields.make_model(mc, rc)
    tr = Trainer(field_type, cfg, model, workspace=cfg.workspace,
                 use_checkpoint="latest" if args.resume else "scratch",
                 metrics=[PSNRMeter(), SSIMMeter()])
    t0 = time.time()
    steps_per_epoch = min(500, args.iters)
    tr.train(train_ds, valid_dataset=None,
             max_epoch=max(1, args.iters // steps_per_epoch),
             steps_per_epoch=steps_per_epoch)
    wall = time.time() - t0
    res = tr.evaluate_one_epoch(eval_ds, save_artifacts=args.save_artifacts)
    out = {"field": field_type, "width": mlp_width,
           "cp_rank": args.cp_rank if field_type == "mlp" else None,
           "vm_rank": args.vm_rank if field_type == "mlp" else None,
           "sigma_cp": args.sigma_cp_rank if field_type == "mlp" else None,
           "sigma_vm": args.sigma_vm_rank if field_type == "mlp" else None,
           "psnr": float(res["PSNRMeter"]),
           "ssim": round(float(res["SSIMMeter"]), 4),
           "train_s": round(wall, 1), "iters": args.iters}
    print(json.dumps(out))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--H", type=int, default=128)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--num_rays", type=int, default=1024)
    ap.add_argument("--min_near", type=float, default=0.5)
    # 5e-3: the 8-layer Fourier MLP explodes mid-run at the hash-grid lr
    # of 1e-2 (max|w| drifts to ~60 then the density field dies); hash
    # tables tolerate 1e-2 because each entry sees sparse gradients
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--distort", type=float, default=0.02)
    ap.add_argument("--num_steps", type=int, nargs="+", default=[128, 64, 32])
    ap.add_argument("--families", nargs="+", default=["mlp", "hashgrid"])
    ap.add_argument("--mlp_width", type=int, default=None)
    ap.add_argument("--mlp_depth", type=int, default=None,
                    help="field MLP depth override (mlp family)")
    ap.add_argument("--cp_rank", type=int, default=0,
                    help="CP line-grid rank for the mlp family (0 = off)")
    ap.add_argument("--cp_res", type=int, default=256)
    ap.add_argument("--cp_levels", type=int, default=1,
                    help="multi-res CP ladder levels (rank splits across)")
    ap.add_argument("--vm_rank", type=int, default=0,
                    help="VM plane-grid per-mode rank for the mlp family "
                         "(0 = off)")
    ap.add_argument("--vm_res", type=int, default=64)
    ap.add_argument("--vm_levels", type=int, default=1,
                    help="multi-res VM ladder levels (rank splits across)")
    ap.add_argument("--sigma_cp_rank", type=int, default=0,
                    help="direct-density CP grid rank (TensoRF §4.1)")
    ap.add_argument("--sigma_cp_res", type=int, default=256)
    ap.add_argument("--sigma_vm_rank", type=int, default=0,
                    help="direct-density VM grid per-mode rank")
    ap.add_argument("--sigma_vm_res", type=int, default=128)
    ap.add_argument("--grid_lr_mult", type=float, default=10.0,
                    help="lr multiplier for CP/VM grid tables")
    ap.add_argument("--upsample_steps", type=int, nargs="*", default=[],
                    help="grid_upsample_steps milestones (TensoRF "
                         "coarse-to-fine table upsampling)")
    ap.add_argument("--l1", type=float, default=0.0,
                    help="lambda_l1_grid (L1 sparsity on CP/VM tables)")
    ap.add_argument("--tv", type=float, default=0.0,
                    help="lambda_tv (reaches CP lines for the mlp family)")
    ap.add_argument("--anneal_iters", type=int, default=0,
                    help="coarse-to-fine encode annealing (BARF-style; "
                         "mlp family only, 0 = off)")
    ap.add_argument("--workspace", default="/tmp/quality_gate")
    ap.add_argument("--save_artifacts", action="store_true")
    ap.add_argument("--no_native", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the workspace's latest checkpoint "
                         "(relay-drop recovery for multi-hour runs)")
    ap.add_argument("--save_cnt", type=int, default=1,
                    help="checkpoint count over the run (set ~= epoch count "
                         "for per-epoch crash safety on long runs)")
    args = ap.parse_args(argv)

    results = []
    for fam in args.families:
        results.append(run_family(
            fam, args, mlp_width=args.mlp_width if fam == "mlp" else None))
    print("== quality gate ==")
    for r in results:
        print(f"  {r['field']:<10} psnr={r['psnr']:.2f} dB "
              f"({r['train_s']}s / {r['iters']} iters)")
    if len(results) == 2:
        delta = results[0]["psnr"] - results[1]["psnr"]
        print(f"  delta (first - second) = {delta:+.2f} dB")
    return results


if __name__ == "__main__":
    main()
