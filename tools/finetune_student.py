"""Short RGB finetune of a serving-student workspace on the fixture.

Distillation fits the student to the TEACHER's field; a brief finetune on
the actual training rings recovers the last fraction of a dB the
field-matching objective leaves behind (round-4 evidence: the cp96 student
finetuned past its own teacher, 18.92 -> 19.03). Trains ALL student params
(field + tables + heads + prop) with the standard RGB objective at a low
lr, then saves back into the workspace (a new checkpoint step) so
tools/eval_student.py and tools/pack_asset.py pick it up.

Usage: python tools/finetune_student.py /tmp/slim64 [--iters 3000]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workspace")
    ap.add_argument("--name", default="ngp")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--grid_lr_mult", type=float, default=10.0)
    ap.add_argument("--num_rays", type=int, default=1024)
    ap.add_argument("--H", type=int, default=128)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--distort", type=float, default=0.02)
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sanerf_tpu.config import (Config, ModelConfig, RenderConfig,
                                   TrainConfig, config_from_dict)
    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.models import fields
    from sanerf_tpu.train.checkpoints import CheckpointManager
    from sanerf_tpu.train.metrics import PSNRMeter, SSIMMeter
    from sanerf_tpu.train.trainer import Trainer

    with open(os.path.join(args.workspace, "serving_meta.json")) as f:
        meta = json.load(f)
    mc = config_from_dict(ModelConfig, meta["model_config"])
    rc = config_from_dict(RenderConfig, meta["render_config"])
    rc = dataclasses.replace(rc, max_ray_batch=args.H * args.H)
    model = fields.make_model(mc, rc)
    template = fields.init_params(model, jax.random.key(0))
    mgr = CheckpointManager(args.workspace, name=args.name)
    params, ema, _, ck_meta = mgr.load("latest", template, model_only=True)
    init = ema if ema is not None else params
    start_step = int(ck_meta.get("step", 0))

    tc = TrainConfig(iters=args.iters, lr=args.lr, num_rays=args.num_rays,
                     adaptive_num_rays=False, lambda_distort=args.distort,
                     grid_lr_mult=args.grid_lr_mult, eval_cnt=1, save_cnt=1)
    cfg = Config(workspace=args.workspace, render=rc, model=mc, train=tc)
    train_ds = SyntheticSphereDataset(H=args.H, W=args.H, n_views=args.views,
                                      scene="textured")
    eval_ds = SyntheticSphereDataset(H=args.H, W=args.H, n_views=8,
                                     radius=1.8, scene="textured",
                                     training=False)
    tr = Trainer(args.name, cfg, model, workspace=args.workspace,
                 use_checkpoint="scratch", init_params=init,
                 metrics=[PSNRMeter(), SSIMMeter()])
    tr.global_step = start_step  # save under a later step than the distill
    steps_per_epoch = min(500, args.iters)
    tr.train(train_ds, valid_dataset=None,
             max_epoch=max(1, args.iters // steps_per_epoch),
             steps_per_epoch=steps_per_epoch)
    res = tr.evaluate_one_epoch(eval_ds)
    out = {"workspace": args.workspace,
           "finetune_iters": args.iters,
           "psnr": round(float(res["PSNRMeter"]), 3),
           "ssim": round(float(res["SSIMMeter"]), 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
