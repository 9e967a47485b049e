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


def sparse_to_transforms(sparse_dir: str, images_rel: str = "images",
                         images_dir: str = None, skip_early: int = 0) -> dict:
    from sanerf_tpu.data import colmap_utils

    cams, images, pts, _, _ = colmap_utils.read_model(sparse_dir)
    cam = next(iter(cams.values()))
    frames = []
    for k in sorted(images, key=lambda k: images[k].name)[skip_early:]:
        im = images[k]
        c2w = im.cam_to_world()
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1  # OpenCV -> OpenGL
        frame = {
            "file_path": f"{images_rel}/{im.name}",
            "transform_matrix": c2w.tolist(),
        }
        if images_dir is not None:
            frame["sharpness"] = sharpness(os.path.join(images_dir, im.name))
        frames.append(frame)
    return {
        "fl_x": cam.fx, "fl_y": cam.fy, "cx": cam.cx, "cy": cam.cy,
        "w": cam.width, "h": cam.height, "frames": frames,
    }


def extract_video(video: str, out_dir: str, fps: int = 2,
                  time_slice: str = ""):
    """video -> frames via ffmpeg (reference colmap2nerf.py run_ffmpeg,
    scripts/colmap2nerf.py:53-75: fps filter + optional between(t,a,b)
    time-slice select)."""
    os.makedirs(out_dir, exist_ok=True)
    vf = f"fps={fps}"
    if time_slice:
        start, end = time_slice.split(",")
        vf += f",select='between(t\\,{start}\\,{end})'"
    subprocess.check_call(["ffmpeg", "-i", video, "-qscale:v", "1",
                           "-qmin", "1", "-vf", vf,
                           os.path.join(out_dir, "%04d.png")])


def sharpness(path: str) -> float:
    """Variance-of-Laplacian sharpness score recorded per frame
    (reference colmap2nerf.py:110-113) — lets downstream tooling drop
    motion-blurred video frames."""
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            return 0.0
        return float(cv2.Laplacian(img, cv2.CV_64F).var())
    except ImportError:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("L"), np.float64)
        lap = (-4 * img
               + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1))
        return float(lap[1:-1, 1:-1].var())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--images", default=None)
    p.add_argument("--video", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--fps", type=int, default=2)
    p.add_argument("--time_slice", default="",
                   help="'t1,t2' seconds window of the video to extract")
    p.add_argument("--skip_early", type=int, default=0,
                   help="skip this many frames from the start")
    p.add_argument("--sharpness", action="store_true",
                   help="record a variance-of-Laplacian score per frame")
    p.add_argument("--matcher", default=None,
                   choices=["exhaustive", "sequential"],
                   help="default: sequential for --video, exhaustive else")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    images_dir = args.images or os.path.join(args.out, "images")
    matcher = args.matcher or ("sequential" if args.video else "exhaustive")
    if args.video:
        extract_video(args.video, images_dir, args.fps, args.time_slice)
    sparse = run_colmap(images_dir, args.out, matcher)
    tf = sparse_to_transforms(
        sparse, images_dir=images_dir if args.sharpness else None,
        skip_early=args.skip_early)
    with open(os.path.join(args.out, "transforms.json"), "w") as f:
        json.dump(tf, f, indent=1)
    print(f"wrote {args.out}/transforms.json ({len(tf['frames'])} frames)")
