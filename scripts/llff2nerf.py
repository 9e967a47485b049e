#!/usr/bin/env python
"""LLFF poses_bounds.npy -> instant-ngp-style transforms_*.json.

Full-capability rewrite of the reference's scripts/llff2nerf.py (193 lines):
pose convention conversion, up-vector re-orientation, scene centering at the
mutual closest point of all camera optical axes, 4/avg-radius scaling, and
train/val/test splits via --hold. The pairwise closest-point accumulation is
vectorized over all N^2 ray pairs instead of the reference's Python double
loop (llff2nerf.py:126-137).
"""
import argparse
import glob
import json
import os

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg")


def rot_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation matrix taking unit direction a to b (Rodrigues).

    Mirrors the reference's rotmat (llff2nerf.py:25-34) incl. the
    antiparallel fallback via a tiny perturbation.
    """
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-10:  # antiparallel: axis is ill-defined, jitter
        return rot_between(a + np.random.uniform(-1e-2, 1e-2, 3), b)
    v = np.cross(a, b)
    s2 = float(np.dot(v, v))
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + K + K @ K * ((1 - c) / (s2 + 1e-10))


def pairwise_focus(origins: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Weighted mean of the closest points between every pair of camera
    optical axes — the scene's empirical focus point.

    Same math as the reference's closest_point_2_lines accumulation
    (llff2nerf.py:10-23, 126-137), vectorized: for rays (o_a, d_a),
    (o_b, d_b) the mutual-perpendicular feet are o + t*d with
    t_a = det([o_b-o_a, d_b, c]) / |c|^2 (c = d_a x d_b), parameters
    clamped to <= 0 (cameras look inward along -axis here), weighted by
    |c|^2 so near-parallel pairs contribute nothing.
    """
    n = len(origins)
    d = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    ia, ib = np.triu_indices(n, k=1)
    oa, ob = origins[ia], origins[ib]
    da, db = d[ia], d[ib]
    c = np.cross(da, db)                      # [P, 3]
    denom = np.einsum("pi,pi->p", c, c)       # |c|^2
    t = ob - oa
    det = lambda u, v, w: np.einsum("pi,pi->p", u, np.cross(v, w))
    ta = np.minimum(det(t, db, c) / (denom + 1e-10), 0.0)
    tb = np.minimum(det(t, da, c) / (denom + 1e-10), 0.0)
    mid = 0.5 * (oa + ta[:, None] * da + ob + tb[:, None] * db)
    w = np.where(denom > 0.01, denom, 0.0)
    tot = w.sum()
    if tot <= 0:
        return origins.mean(0)
    return (mid * w[:, None]).sum(0) / tot


def llff_to_transforms(root: str, images_rel: str = "images",
                       downscale: float = 1.0, hold: int = 8) -> dict:
    """Returns {'train': ..., 'val': ..., 'test': ..., 'all': ...} of
    transforms dicts ready to json-dump."""
    pb = np.load(os.path.join(root, "poses_bounds.npy"))  # [N, 17]
    raw = pb[:, :15].reshape(-1, 3, 5)
    h, w, fl = raw[0, :, 4]
    h, w, fl = h // downscale, w // downscale, fl / downscale

    files = sorted(
        f for f in glob.glob(os.path.join(root, images_rel, "*"))
        if f.lower().endswith(IMG_EXTS))
    names = [os.path.relpath(f, root) for f in files]
    n = len(raw)
    if names and len(names) != n:
        raise SystemExit(
            f"{len(names)} images in {images_rel}/ but {n} poses")
    if not names:  # pose-only conversion still works
        names = [f"{images_rel}/{i:04d}.png" for i in range(n)]

    # LLFF stores [down right back]; invert pose_utils.py's permutation to
    # OpenGL [right up back], then apply the same world re-orientation the
    # colmap pipeline uses (flip y/z cols, swap y/z rows, negate z row) —
    # reference llff2nerf.py:103-116.
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :] = np.concatenate(
        [raw[..., 1:2], raw[..., 0:1], -raw[..., 2:3], raw[..., 3:4]], -1)
    poses[:, :3, 1] *= -1
    poses[:, :3, 2] *= -1
    poses = poses[:, [1, 0, 2, 3], :]
    poses[:, 2, :] *= -1

    # rotate the average camera-up to world +z (llff2nerf.py:118-124)
    up = poses[:, :3, 1].sum(0)
    R = np.eye(4)
    R[:3, :3] = rot_between(up, np.array([0.0, 0.0, 1.0]))
    poses = R @ poses

    # center at the mutual focus of the optical axes, scale to radius 4
    focus = pairwise_focus(poses[:, :3, 3], poses[:, :3, 2])
    poses[:, :3, 3] -= focus
    avglen = np.linalg.norm(poses[:, :3, 3], axis=-1).mean()
    poses[:, :3, 3] *= 4.0 / avglen

    def pack(ids):
        return {
            "w": int(w), "h": int(h),
            "fl_x": float(fl), "fl_y": float(fl),
            "cx": int(w) // 2, "cy": int(h) // 2,
            "aabb_scale": 2,
            "frames": [{"file_path": names[i],
                        "transform_matrix": poses[i].tolist()}
                       for i in ids],
        }

    all_ids = np.arange(n)
    test_ids = all_ids[::hold] if hold > 0 else np.array([], dtype=int)
    train_ids = np.setdiff1d(all_ids, test_ids)
    return {
        "train": pack(train_ids),
        "val": pack(test_ids[::10]),
        "test": pack(test_ids),
        "all": pack(all_ids),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path", help="LLFF scene root (poses_bounds.npy inside)")
    p.add_argument("--images", default="images_8",
                   help="images subfolder matching the pose resolution")
    p.add_argument("--downscale", type=float, default=8,
                   help="intrinsics downscale vs poses_bounds resolution")
    p.add_argument("--hold", type=int, default=8,
                   help="hold out every Nth image for val/test (0: none)")
    args = p.parse_args(argv)

    out = llff_to_transforms(args.path, args.images, args.downscale,
                             args.hold)
    for split, fname in [("train", "transforms_train.json"),
                         ("val", "transforms_val.json"),
                         ("test", "transforms_test.json"),
                         ("all", "transforms.json")]:
        path = os.path.join(args.path, fname)
        with open(path, "w") as f:
            json.dump(out[split], f, indent=2)
        print(f"wrote {fname} ({len(out[split]['frames'])} frames)")


if __name__ == "__main__":
    main()
