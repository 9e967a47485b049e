#!/usr/bin/env python
"""LLFF poses_bounds.npy -> transforms.json (reference scripts/llff2nerf.py)."""
import argparse
import json
import os

import numpy as np


def llff_to_transforms(root: str, images_rel: str = "images") -> dict:
    pb = np.load(os.path.join(root, "poses_bounds.npy"))  # [N, 17]
    poses = pb[:, :15].reshape(-1, 3, 5)
    h, w, f = poses[0, :, 4]
    names = sorted(os.listdir(os.path.join(root, images_rel)))
    frames = []
    for i in range(len(poses)):
        # LLFF [down right back] -> OpenGL [right up back]
        m = np.eye(4)
        m[:3, :4] = poses[i, :, :4]
        m = m[:, [1, 0, 2, 3]]
        m[:, 1] *= -1
        frames.append({
            "file_path": f"{images_rel}/{names[i]}",
            "transform_matrix": m.tolist(),
        })
    return {"fl_x": float(f), "fl_y": float(f), "cx": w / 2, "cy": h / 2,
            "w": int(w), "h": int(h), "frames": frames}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--images", default="images")
    args = p.parse_args()
    tf = llff_to_transforms(args.path, args.images)
    with open(os.path.join(args.path, "transforms.json"), "w") as f:
        json.dump(tf, f, indent=1)
    print(f"wrote transforms.json ({len(tf['frames'])} frames)")
