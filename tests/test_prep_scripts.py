"""Dataset-prep script coverage: scripts/llff2nerf.py (reference
scripts/llff2nerf.py) — pose conversion, re-orientation, centering,
scaling, and the --hold splits, on a synthetic LLFF fixture."""

import importlib.util
import json
import os

import numpy as np
import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load(name):
    path = os.path.join(_ROOT, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def llff2nerf():
    return _load("llff2nerf")


def test_rot_between(llff2nerf):
    rng = np.random.default_rng(0)
    for _ in range(8):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        R = llff2nerf.rot_between(a, b)
        np.testing.assert_allclose(R @ (a / np.linalg.norm(a)),
                                   b / np.linalg.norm(b), atol=1e-8)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
    # antiparallel fallback still produces a rotation
    R = llff2nerf.rot_between(np.array([0.0, 0.0, 1.0]),
                              np.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_pairwise_focus_recovers_common_point(llff2nerf):
    """Rays through a common point (looking AWAY along +d, so the point is
    at negative parameter, matching the <=0 clamp) focus at that point."""
    rng = np.random.default_rng(1)
    target = np.array([0.3, -0.2, 0.5])
    d = rng.normal(size=(24, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = target + d * rng.uniform(1.0, 3.0, size=(24, 1))  # target at t<0
    focus = llff2nerf.pairwise_focus(o, d)
    np.testing.assert_allclose(focus, target, atol=1e-6)


def _write_fixture(root, n=12):
    """Synthetic LLFF scene: inward ring encoded in the raw [down right
    back] x5 layout (last col h,w,f), plus an images dir."""
    rng = np.random.default_rng(2)
    raw = np.zeros((n, 3, 5))
    # tilted up-hint: keeps the average up generic (the exact +/-z case
    # falls into rot_between's jittered antiparallel branch, which is only
    # ~1e-2 accurate by design — reference llff2nerf.py:29-30)
    hint = np.array([0.3, 0.2, 0.93]) / np.linalg.norm([0.3, 0.2, 0.93])
    for i in range(n):
        th = 2 * np.pi * i / n
        pos = np.array([3 * np.cos(th), 3 * np.sin(th), 1.0])
        back = pos / np.linalg.norm(pos)            # looks at origin
        right = np.cross(hint, back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        raw[i, :, 0] = -up                          # LLFF 'down'
        raw[i, :, 1] = right
        raw[i, :, 2] = back
        raw[i, :, 3] = pos + rng.normal(scale=0.01, size=3)
        raw[i, :, 4] = (480, 640, 500)              # h, w, f
    bounds = np.stack([np.full(n, 2.0), np.full(n, 6.0)], -1)
    np.save(os.path.join(root, "poses_bounds.npy"),
            np.concatenate([raw.reshape(n, 15), bounds], -1))
    os.makedirs(os.path.join(root, "images_8"))
    for i in range(n):
        open(os.path.join(root, "images_8", f"im{i:03d}.png"), "wb").close()
    return n


def test_llff2nerf_end_to_end(llff2nerf, tmp_path):
    root = str(tmp_path)
    n = _write_fixture(root)
    llff2nerf.main([root, "--images", "images_8", "--downscale", "8",
                    "--hold", "4"])

    out = {s: json.load(open(os.path.join(root, f)))
           for s, f in [("train", "transforms_train.json"),
                        ("val", "transforms_val.json"),
                        ("test", "transforms_test.json"),
                        ("all", "transforms.json")]}
    n_test = len(range(0, n, 4))
    assert len(out["test"]["frames"]) == n_test
    assert len(out["train"]["frames"]) == n - n_test
    assert len(out["all"]["frames"]) == n
    # splits are disjoint and cover all images
    tr = {f["file_path"] for f in out["train"]["frames"]}
    te = {f["file_path"] for f in out["test"]["frames"]}
    assert not tr & te and len(tr | te) == n
    assert all(p.startswith("images_8/") for p in tr | te)

    # downscaled intrinsics
    assert out["all"]["w"] == 80 and out["all"]["h"] == 60
    assert abs(out["all"]["fl_x"] - 62.5) < 1e-9

    poses = np.array([f["transform_matrix"] for f in out["all"]["frames"]])
    # scaled to mean radius 4 around the focus point
    np.testing.assert_allclose(
        np.linalg.norm(poses[:, :3, 3], axis=-1).mean(), 4.0, atol=1e-6)
    # average camera-up re-oriented to world +z
    up = poses[:, :3, 1].sum(0)
    np.testing.assert_allclose(up / np.linalg.norm(up), [0, 0, 1],
                               atol=1e-6)
    # cameras still look at the (now centered) scene: optical axes pass
    # near the origin
    back = poses[:, :3, 2]
    o = poses[:, :3, 3]
    closest = o - back * np.einsum("ni,ni->n", o, back)[:, None]
    assert np.linalg.norm(closest, axis=-1).max() < 0.5
