"""Train the stage-3 mask head ON the serving student and ship it as an
asset, so bench.py can report an interactive-segmentation mIoU from the
SAME artifact that produces fps and psnr_db (VERDICT r4 item 6 — "today
every quality number is RGB; the product's output is masks").

Protocol: freeze every serving-student param (the bench asset,
assets/serving_student.*), add the stage-3 mask field (m_grid + mask_mlp,
reference nerf/utils.py:941-1070 workload) with n_inst=5 — the textured
fixture's full label set (0 bg, 1 floor, 2-4 spheres,
data/synthetic.py:masks) — train on the quality-gate training rings, and
save ONLY the mask params to assets/serving_student_mask.npz. bench.py
then renders the held-out third ring through the serving path
(render_staged, bf16, the benched inference hierarchy) and reports
mask_miou alongside fps/psnr_db.

Usage (on the TPU): python tools/mask_asset.py [--iters 1000]
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
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--num_rays", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--H", type=int, default=128)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--n_inst", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "serving_student_mask"))
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import ASSET, _load_asset
    from sanerf_tpu.config import Config, MaskTrainConfig, TrainConfig
    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.models import fields
    from sanerf_tpu.train import checkpoints as ckpt_lib
    from sanerf_tpu.train.mask_trainer import MaskTrainer

    asset = _load_asset()
    assert asset is not None, "assets/serving_student.* missing"
    mc, rc, flat = asset
    # the fixture protocol (tools/quality_gate.py): bound 4, min_near 0.5
    rc = dataclasses.replace(rc, bound=4.0, min_near=0.5,
                             max_ray_batch=args.H * args.H)
    mc = dataclasses.replace(mc, with_sam=False, with_mask=True,
                             mask_mlp_type="default", n_inst=args.n_inst)
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(0))
    tmpl = ckpt_lib.flatten_tree(params, "")
    loaded = set()
    for k, v in flat.items():
        if k.startswith("params/"):
            k2 = k[len("params/"):]
            if k2 in tmpl and tmpl[k2].shape == v.shape:
                tmpl[k2] = v
                loaded.add(k2)
    merged = ckpt_lib.unflatten_like(params, tmpl, "")
    # freeze everything the asset provided; train the new mask head only
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    trainable = jax.tree_util.tree_unflatten(
        treedef, [ckpt_lib._path_str(p) not in loaded for p, _ in leaves])
    n_train = sum(jax.tree_util.tree_leaves(trainable))
    print(f"loaded {len(loaded)} asset leaves; training {n_train} mask leaves")

    cfg = Config(workspace="/tmp/mask_asset", render=rc, model=mc,
                 train=TrainConfig(iters=args.iters, lr=args.lr,
                                   num_rays=args.num_rays,
                                   adaptive_num_rays=False,
                                   eval_cnt=1, save_cnt=1),
                 # label_regularization is a PATCH smoothness prior; this
                 # tool trains on uniform random rays (no patch structure),
                 # so the regularizer is vacuous here — weight 0 (the
                 # reference applies it over local 16x16 patches,
                 # utils.py:1028-1030, which collate_mask doesn't sample)
                 mask=MaskTrainConfig(label_regularization_weight=0.0))
    train_ds = SyntheticSphereDataset(H=args.H, W=args.H, n_views=args.views,
                                      scene="textured")
    eval_ds = SyntheticSphereDataset(H=args.H, W=args.H, n_views=8,
                                     radius=1.8, scene="textured",
                                     training=False)
    tr = MaskTrainer("mask_asset", cfg, model, workspace=cfg.workspace,
                     use_checkpoint="scratch", trainable=trainable,
                     init_params=merged)
    miou0 = tr.evaluate_mask(eval_ds)
    steps_per_epoch = min(250, args.iters)
    tr.train(train_ds, max_epoch=max(1, args.iters // steps_per_epoch),
             steps_per_epoch=steps_per_epoch)
    miou1 = tr.evaluate_mask(eval_ds)
    print(f"held-out mIoU {miou0:.4f} -> {miou1:.4f}")

    # ship ONLY the trained mask leaves (the RGB params stay in the main
    # asset; bench.py overlays both)
    flat1 = ckpt_lib.flatten_tree(tr.state.params, "")
    out = {f"params/{k}": np.asarray(v) for k, v in flat1.items()
           if k not in loaded}
    np.savez(args.out + ".npz", **out)
    with open(args.out + ".json", "w") as f:
        json.dump({"n_inst": args.n_inst,
                   "mask_mlp_type": mc.mask_mlp_type,
                   "held_out_miou": round(float(miou1), 4),
                   "iters": args.iters,
                   "model_config": dataclasses.asdict(mc)}, f, indent=1)
    print(f"saved {args.out}.npz ({len(out)} leaves)")


if __name__ == "__main__":
    main()
