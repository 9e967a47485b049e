#!/usr/bin/env python
"""video/images -> COLMAP -> transforms.json (dataset prep).

Rebuild of the reference scripts/colmap2nerf.py capability: shell out to the
`colmap` binary for feature extraction + mapping, then convert the sparse
model into a transforms.json usable by the llff/3dfront providers.
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_colmap(images_dir: str, out_dir: str, matcher: str = "exhaustive"):
    db = os.path.join(out_dir, "database.db")
    sparse = os.path.join(out_dir, "sparse")
    os.makedirs(sparse, exist_ok=True)
    subprocess.check_call(["colmap", "feature_extractor", "--database_path", db,
                           "--image_path", images_dir,
                           "--ImageReader.camera_model", "PINHOLE",
                           "--ImageReader.single_camera", "1"])
    subprocess.check_call(["colmap", f"{matcher}_matcher", "--database_path", db])
    subprocess.check_call(["colmap", "mapper", "--database_path", db,
                           "--image_path", images_dir, "--output_path", sparse])
    return os.path.join(sparse, "0")


def sparse_to_transforms(sparse_dir: str, images_rel: str = "images") -> dict:
    from sanerf_tpu.data import colmap_utils

    cams, images, pts, _, _ = colmap_utils.read_model(sparse_dir)
    cam = next(iter(cams.values()))
    frames = []
    for k in sorted(images, key=lambda k: images[k].name):
        im = images[k]
        c2w = im.cam_to_world()
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1  # OpenCV -> OpenGL
        frames.append({
            "file_path": f"{images_rel}/{im.name}",
            "transform_matrix": c2w.tolist(),
        })
    return {
        "fl_x": cam.fx, "fl_y": cam.fy, "cx": cam.cx, "cy": cam.cy,
        "w": cam.width, "h": cam.height, "frames": frames,
    }


def extract_video(video: str, out_dir: str, fps: int = 2):
    os.makedirs(out_dir, exist_ok=True)
    subprocess.check_call(["ffmpeg", "-i", video, "-vf", f"fps={fps}",
                           os.path.join(out_dir, "%04d.png")])


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--images", default=None)
    p.add_argument("--video", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--fps", type=int, default=2)
    p.add_argument("--matcher", default="exhaustive",
                   choices=["exhaustive", "sequential"])
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    images_dir = args.images or os.path.join(args.out, "images")
    if args.video:
        extract_video(args.video, images_dir, args.fps)
    sparse = run_colmap(images_dir, args.out, args.matcher)
    tf = sparse_to_transforms(sparse)
    with open(os.path.join(args.out, "transforms.json"), "w") as f:
        json.dump(tf, f, indent=1)
    print(f"wrote {args.out}/transforms.json ({len(tf['frames'])} frames)")
