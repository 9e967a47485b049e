"""Batch experiment drivers: loop scenes/objects and run the pipeline.

Rebuild of the reference's L7 drivers (batch_train_rgb_3dfront.py,
batch_train_mask.py, batch_eval_{rgb,feat,mask}.py, batch_generate_mask.py):
one module with subcommands that read the scene registry
(scene_list.json / scenes_metadata_v2.json) and invoke the pipeline
in-process (the reference shells out `os.system('python main.py ...')`,
batch_train_mask.py:89-114).

Includes the reference's data-dependent iteration heuristic for mask
training: iterations scale with the number of valid labeled views
(batch_train_mask.py:64-82).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

from sanerf_tpu.apps.main import build_parser, config_from_args, run


def load_scene_list(path: str, data_type: str) -> List[str]:
    """scene_list.json: {data_type: [scene, ...]} registry."""
    with open(path) as f:
        registry = json.load(f)
    return registry.get(data_type, registry if isinstance(registry, list) else [])


def mask_iters_heuristic(valid_json: str, base: int = 250, per_view: int = 10,
                         cap: int = 1000) -> int:
    """Iteration count from the number of valid labeled views
    (batch_train_mask.py:64-82)."""
    if not os.path.exists(valid_json):
        return base
    with open(valid_json) as f:
        valid = json.load(f)
    n = sum(1 for v in valid.values() if v)
    return min(cap, base + per_view * n)


def _run_for_scene(scene: str, data_root: str, extra_flags: List[str]):
    argv = [os.path.join(data_root, scene)] + extra_flags
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    return run(cfg)


def cmd_train_rgb(args, scenes):
    for scene in scenes:
        _run_for_scene(scene, args.data_root, [
            "--workspace", os.path.join(args.out_root, f"{scene}_rgb"),
            "--data_type", args.data_type, "--iters", str(args.iters),
            "--scene_name", scene, "--enable_cam_center", "--random_image_batch",
        ])


def cmd_train_sam(args, scenes):
    for scene in scenes:
        rgb_ws = os.path.join(args.out_root, f"{scene}_rgb")
        ckpts = sorted(
            os.path.join(rgb_ws, "checkpoints", f)
            for f in os.listdir(os.path.join(rgb_ws, "checkpoints"))
            if f.endswith(".npz") and "best" not in f
        )
        _run_for_scene(scene, args.data_root, [
            "--workspace", os.path.join(args.out_root, f"{scene}_sam"),
            "--data_type", args.data_type, "--with_sam",
            "--sam_use_view_direction", "--iters", "5000",
            "--init_ckpt", ckpts[-1], "--scene_name", scene,
        ])


def cmd_train_mask(args, scenes):
    with open(args.metadata) as f:
        metadata = json.load(f)
    for scene in scenes:
        objects = list(metadata.get(scene, {}).keys()) or [args.object_name]
        rgb_ws = os.path.join(args.out_root, f"{scene}_rgb")
        ckpts = sorted(
            os.path.join(rgb_ws, "checkpoints", f)
            for f in os.listdir(os.path.join(rgb_ws, "checkpoints"))
            if f.endswith(".npz") and "best" not in f
        )
        for obj in objects:
            mask_dir = os.path.join(args.data_root, scene, obj)
            iters = mask_iters_heuristic(os.path.join(mask_dir, "valid.json"))
            _run_for_scene(scene, args.data_root, [
                "--workspace", os.path.join(args.out_root, f"{scene}_{obj}_mask"),
                "--data_type", args.data_type, "--with_mask",
                "--init_ckpt", ckpts[-1], "--iters", str(iters),
                "--mask_folder_name", obj, "--scene_name", scene,
                "--object_name", obj, "--error_map", "--mixed_sampling",
            ])


def cmd_eval(args, scenes, kind: str):
    for scene in scenes:
        suffix = {"rgb": "_rgb", "feat": "_sam", "mask": f"_{args.object_name}_mask"}[kind]
        flags = [
            "--workspace", os.path.join(args.out_root, f"{scene}{suffix}"),
            "--data_type", args.data_type, "--test", "--scene_name", scene,
            "--val_type", "val_split",
        ]
        if kind == "feat":
            flags += ["--with_sam", "--sam_use_view_direction"]
        if kind == "mask":
            flags += ["--with_mask", "--mask_folder_name", args.object_name,
                      "--object_name", args.object_name]
        _run_for_scene(scene, args.data_root, flags)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("command", choices=["train-rgb", "train-sam", "train-mask",
                                       "eval-rgb", "eval-feat", "eval-mask",
                                       "generate-mask"])
    p.add_argument("--scene_list", default="scene_list.json")
    p.add_argument("--metadata", default="scenes_metadata_v2.json")
    p.add_argument("--data_type", default="mip")
    p.add_argument("--data_root", default="data")
    p.add_argument("--out_root", default="trials")
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--object_name", default="table_whole")
    p.add_argument("--scenes", nargs="*", default=None)
    args = p.parse_args(argv)

    scenes = args.scenes or load_scene_list(args.scene_list, args.data_type)
    if args.command == "train-rgb":
        cmd_train_rgb(args, scenes)
    elif args.command == "train-sam":
        cmd_train_sam(args, scenes)
    elif args.command == "train-mask":
        cmd_train_mask(args, scenes)
    elif args.command.startswith("eval-"):
        cmd_eval(args, scenes, args.command.split("-")[1])
    elif args.command == "generate-mask":
        from sanerf_tpu.apps import sam_project

        for scene in scenes:
            sam_project.main([
                os.path.join(args.data_root, scene), "--scene_name", scene,
                "--object_name", args.object_name,
                "--workspace", os.path.join(args.out_root, f"{scene}_sam"),
            ])


if __name__ == "__main__":
    main()
