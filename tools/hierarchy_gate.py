"""Inference-hierarchy quality gate: held-out-ring PSNR of a trained
checkpoint under candidate `num_steps` hierarchies.

The proposal hierarchy needs fewer levels/samples at inference than at
training (the field is already converged; one proposal level suffices to
place the final samples). This tool measures exactly what a hierarchy
swap costs so bench.py's primary number stays quality-gated.

Round-3 result on the trained w128 flagship (textured fixture, 4
held-out views at 128²):

    (128, 64, 32)  14.835 dB   (training hierarchy)
    (48, 32)       14.821 dB   (-0.014)
    (32, 24)       14.759 dB   (-0.076)  <- bench.py primary
    (32, 16)       14.634 dB   (-0.201)

Usage:
    python tools/hierarchy_gate.py /path/ckpt.npz --width 128 \
        --hierarchies 128,64,32 48,32 32,24
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--field_type", default="mlp",
                    choices=["mlp", "hashgrid"])
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--cp_rank", type=int, default=0)
    ap.add_argument("--cp_res", type=int, default=256)
    ap.add_argument("--vm_rank", type=int, default=0)
    ap.add_argument("--vm_res", type=int, default=64)
    ap.add_argument("--H", type=int, default=128)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--min_near", type=float, default=0.5)
    ap.add_argument("--hierarchies", nargs="+",
                    default=["128,64,32", "48,32", "32,24"])
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sanerf_tpu.config import ModelConfig, RenderConfig
    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.models import fields, renderer
    from sanerf_tpu.train.checkpoints import CheckpointManager, unflatten_like
    from sanerf_tpu.train.metrics import PSNRMeter

    mc = ModelConfig(field_type=args.field_type,
                     prop_resolutions=(128, 256))
    if args.width is not None:
        mc = dataclasses.replace(mc, mlp_field_width=args.width)
    if args.cp_rank:
        mc = dataclasses.replace(mc, mlp_cp_rank=args.cp_rank,
                                 mlp_cp_res=args.cp_res)
    if args.vm_rank:
        mc = dataclasses.replace(mc, mlp_vm_rank=args.vm_rank,
                                 mlp_vm_res=args.vm_res)
    eval_ds = SyntheticSphereDataset(H=args.H, W=args.H, n_views=args.views,
                                     radius=1.8, scene="textured",
                                     training=False)
    flat, _ = CheckpointManager.load_file(args.ckpt)
    prefix = ("ema_params/" if any(k.startswith("ema_params/") for k in flat)
              else "params/")

    results = []
    for spec in args.hierarchies:
        steps = tuple(int(s) for s in spec.split(","))
        rc = RenderConfig(num_steps=steps, bound=4.0, contract=True,
                          min_near=args.min_near,
                          max_ray_batch=args.H * args.H)
        model = fields.make_model(mc, rc)
        params = unflatten_like(fields.init_params(model, jax.random.key(0)),
                                flat, prefix)
        meter = PSNRMeter()
        t0 = time.time()
        for i in range(len(eval_ds)):
            fr = eval_ds.frame(i)
            out = renderer.render_staged(
                model, params, jnp.asarray(fr["rays_o"]),
                jnp.asarray(fr["rays_d"]),
                cam_near_far=jnp.asarray(fr["cam_near_far"]))
            meter.update(np.asarray(out["image"]).reshape(
                1, args.H, args.H, 3),
                fr["images"].reshape(1, args.H, args.H, 3))
        r = {"num_steps": steps, "psnr": round(float(meter.measure()), 3),
             "eval_s": round(time.time() - t0, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]["psnr"]
    for r in results[1:]:
        print(f"  {r['num_steps']}: {r['psnr'] - base:+.3f} dB vs "
              f"{results[0]['num_steps']}")
    return results


if __name__ == "__main__":
    main()
