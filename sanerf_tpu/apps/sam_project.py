"""Offline mask-label generator: 3D prompt points -> per-view SAM masks.

Rebuild of the reference's sam_project.py: given hand-picked 3D points per
object (scenes_metadata.json), for every training view

1. project the points through the camera (w2c pinhole, project_to_2d,
   sam_project.py:434-455);
2. depth-test against the rendered depth (threshold 0.05,
   sam_project.py:185);
3. prompt SAM — either on the real image (teacher encoder) or on
   NeRF-rendered features (`use_nerf_feature`, sam_project.py:39-57,
   208-212);
4. write `<frame>_masks.npy`, an overlay png, and `valid.json` recording
   per-view visibility (sam_project.py:124-268).

The output directory feeds stage-3 mask training (provider mask loading).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from sanerf_tpu.config import Config


def project_to_2d(points_w: np.ndarray, pose: np.ndarray, intrinsics: np.ndarray,
                  H: int, W: int):
    """World points -> pixel coords + view depth (sam_project.py:434-455).

    Returns (xy [P, 2] float, z [P] depth along -view, on_screen [P] bool).
    """
    fx, fy, cx, cy = intrinsics
    cam = (points_w - pose[:3, 3]) @ pose[:3, :3]  # = R^T (p - t)
    z = -cam[:, 2]
    safe = np.maximum(z, 1e-6)
    x = cam[:, 0] / safe * fx + cx - 0.5
    y = -cam[:, 1] / safe * fy + cy - 0.5
    on = (z > 1e-6) & (x >= 0) & (x < W) & (y >= 0) & (y < H)
    return np.stack([x, y], -1), z, on


def project_to_3d(px: np.ndarray, depth: np.ndarray, pose: np.ndarray,
                  intrinsics: np.ndarray):
    """Pixels + depth -> world points (sam_project.py:406-432)."""
    fx, fy, cx, cy = intrinsics
    d = np.stack(
        [(px[:, 0] + 0.5 - cx) / fx, -(px[:, 1] + 0.5 - cy) / fy,
         -np.ones(len(px))], -1,
    )
    return pose[:3, 3] + (d @ pose[:3, :3].T) * depth[:, None]


def generate_masks(
    cfg: Config,
    dataset,
    points_3d: np.ndarray,  # [P, 3] prompt points (positive)
    sam_predictor,
    out_dir: str,
    *,
    negative_points: Optional[np.ndarray] = None,
    trainer=None,  # provides render_pose for depth tests / nerf features
    use_nerf_feature: bool = False,
    depth_threshold: float = 0.05,
    min_visible: int = 1,
) -> Dict[str, bool]:
    """Run the projection + prompting loop over every view in `dataset`."""
    os.makedirs(out_dir, exist_ok=True)
    valid: Dict[str, bool] = {}
    H, W = dataset.H, dataset.W

    for idx in range(len(dataset)):
        frame = dataset.frame(idx)
        name = frame.get("name", f"{idx:04d}")
        pose = frame["pose"]

        depth_map = None
        if trainer is not None:
            out = trainer.render_pose(pose, dataset.intrinsics, H, W)
            depth_map = out["depth"].reshape(H, W)

        xy, z, on = project_to_2d(points_3d, pose, dataset.intrinsics, H, W)
        keep = on.copy()
        if depth_map is not None:
            for k in range(len(xy)):
                if not on[k]:
                    continue
                d = depth_map[int(xy[k, 1]), int(xy[k, 0])]
                if abs(z[k] - d) > depth_threshold:  # occluded (sam_project.py:185)
                    keep[k] = False
        pts = xy[keep]
        labels = np.ones(len(pts), np.int32)
        if negative_points is not None and len(negative_points):
            nxy, nz, non = project_to_2d(negative_points, pose, dataset.intrinsics, H, W)
            pts = np.concatenate([pts, nxy[non]])
            labels = np.concatenate([labels, np.zeros(int(non.sum()), np.int32)])

        visible = int(keep.sum())
        valid[name] = visible >= min_visible
        if not valid[name]:
            np.save(os.path.join(out_dir, f"{name}_masks.npy"),
                    np.full((H, W), -1, np.int64))
            continue

        if use_nerf_feature and trainer is not None:
            lr_h = max(4, int(H / 1024 * 64))
            intr_lr = dataset.intrinsics * (lr_h / H)
            intr_lr[2:] = lr_h / 2
            feat_out = trainer.render_pose(pose, intr_lr, lr_h, lr_h,
                                           return_feats=True)
            feats = feat_out["samvit"].reshape(lr_h, lr_h, -1)
            sam_predictor.set_features(feats, H, W)
        else:
            img = (np.clip(frame["images"].reshape(H, W, -1)[..., :3], 0, 1)
                   * 255).astype(np.uint8)
            sam_predictor.set_image(img)

        masks, iou, _ = sam_predictor.predict(pts, labels, multimask_output=False)
        mask = masks[0]
        labels_map = np.where(mask, 1, 0).astype(np.int64)
        np.save(os.path.join(out_dir, f"{name}_masks.npy"), labels_map)

        if "images" in frame:
            _save_overlay(
                os.path.join(out_dir, f"{name}_overlay.png"),
                frame["images"].reshape(H, W, -1)[..., :3], mask, pts,
            )

    with open(os.path.join(out_dir, "valid.json"), "w") as f:
        json.dump(valid, f, indent=1)
    return valid


def _save_overlay(path, rgb, mask, pts):
    from sanerf_tpu.apps.interactive import overlay_mask_and_points
    import PIL.Image as Image

    out = overlay_mask_and_points(rgb.astype(np.float32), mask, pts)
    Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8)).save(path)


def load_scene_metadata(path: str, scene: str, obj: str):
    """Read 3D prompt points from scenes_metadata.json (positive points,
    negative labels, crucial indices — sam_project.py registry format)."""
    with open(path) as f:
        meta = json.load(f)
    entry = meta[scene][obj] if isinstance(meta.get(scene), dict) else meta[obj]
    pts = np.asarray(entry.get("points", entry.get("positive_points", [])), np.float32)
    neg = np.asarray(entry.get("negative_points", []), np.float32)
    return pts, neg


def main(argv=None):
    import argparse

    from sanerf_tpu.apps.main import build_parser, config_from_args, build_sam_predictor
    from sanerf_tpu.data.provider import SceneDataset
    from sanerf_tpu.models import fields
    from sanerf_tpu.train.trainer import Trainer

    p = build_parser()
    p.add_argument("--scenes_metadata", type=str, default="scenes_metadata.json")
    p.add_argument("--mask_out", type=str, default=None)
    p.add_argument("--use_nerf_feature", action="store_true")
    p.add_argument("--sam_type", type=str, default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"])
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    model = fields.make_model(cfg.model, cfg.render)
    trainer = Trainer("ngp", cfg, model, workspace=cfg.workspace,
                      use_checkpoint=cfg.ckpt)
    sam = build_sam_predictor(cfg)
    ds = SceneDataset(cfg, "train")
    pts, neg = load_scene_metadata(args.scenes_metadata, cfg.data.scene_name,
                                   cfg.data.object_name)
    out_dir = args.mask_out or os.path.join(cfg.data.path, cfg.data.object_name)
    generate_masks(cfg, ds, pts, sam, out_dir, negative_points=neg,
                   trainer=trainer, use_nerf_feature=args.use_nerf_feature)


if __name__ == "__main__":
    main()
