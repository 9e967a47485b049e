"""Dataset provider tests on synthetic on-disk fixtures: COLMAP binary
model roundtrip, transforms.json flavor, splits, and the three collates."""

import dataclasses
import json
import os
import struct

import numpy as np
import pytest

from sanerf_tpu.config import Config, DataConfig, MaskTrainConfig, ModelConfig
from sanerf_tpu.data import colmap_utils
from sanerf_tpu.data.provider import SceneDataset
from sanerf_tpu.utils import camera as cam_util


def _write_colmap_binary(sparse_dir, poses_w2c, fx, W, H, pts3d):
    os.makedirs(sparse_dir, exist_ok=True)
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))  # PINHOLE
        f.write(struct.pack("<4d", fx, fx, W / 2, H / 2))
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(poses_w2c)))
        for i, m in enumerate(poses_w2c):
            q = colmap_utils.rotmat2qvec(m[:3, :3])
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *m[:3, 3]))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # two 2D points
            for j in range(2):
                f.write(struct.pack("<2d", 10.0 + j, 20.0 + j))
                f.write(struct.pack("<q", j))  # point3d ids 0, 1
    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts3d)))
        for i, p in enumerate(pts3d):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", *p))
            f.write(struct.pack("<3B", 255, 128, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


@pytest.fixture
def colmap_scene(tmp_path):
    import cv2

    root = str(tmp_path / "scene")
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    W = H = 32
    gl_poses = cam_util.circle_poses(radius=3.0, n=20)
    w2c = []
    for p in gl_poses:
        cv = p.copy()
        cv[:3, 1] *= -1
        cv[:3, 2] *= -1  # OpenGL c2w -> OpenCV c2w
        w2c.append(np.linalg.inv(cv))
    pts3d = np.random.default_rng(0).uniform(-0.5, 0.5, (50, 3))
    _write_colmap_binary(os.path.join(root, "sparse", "0"), w2c, 40.0, W, H, pts3d)
    for i in range(20):
        img = np.full((H, W, 3), i * 10 % 255, np.uint8)
        cv2.imwrite(os.path.join(root, "images", f"img_{i:03d}.png"), img)
    return root


def test_colmap_reader_roundtrip(colmap_scene):
    cams, images, pts, rgb, id_map = colmap_utils.read_model(
        os.path.join(colmap_scene, "sparse", "0")
    )
    assert len(cams) == 1 and cams[1].model == "PINHOLE"
    assert len(images) == 20
    assert pts.shape == (50, 3) and rgb.shape == (50, 3)
    im = images[1]
    assert im.name == "img_000.png"
    assert im.xys.shape == (2, 2)
    np.testing.assert_array_equal(im.point3d_ids, [0, 1])
    # quaternion roundtrip through the writer
    R = im.rotmat()
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_colmap_dataset_loads(colmap_scene):
    cfg = Config(data=DataConfig(path=colmap_scene, data_type="mip",
                                 enable_cam_center=True))
    ds = SceneDataset(cfg, "train")
    assert len(ds) == 18  # every 16th (indices 0, 16) held out for val
    assert ds.images.shape[1:] == (32, 32, 3)
    assert ds.poses.shape == (len(ds), 4, 4)
    # auto-scaled to unit-ish radius
    assert np.abs(ds.poses[:, :3, 3]).max() <= 1.0 + 1e-5
    assert ds.pts_aabb is not None and ds.pts_aabb.shape == (6,)
    # rotations stay orthonormal through the convention pipeline
    for p in ds.poses[:4]:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-5)

    val = SceneDataset(cfg, "val")
    assert len(val) == 2  # indices 0 and 16
    assert set(val.names) == {"img_000.png", "img_016.png"}


def test_colmap_collates(colmap_scene):
    cfg = Config(data=DataConfig(path=colmap_scene, data_type="mip"))
    ds = SceneDataset(cfg, "train")
    rng = np.random.default_rng(0)
    b = ds.collate_train(rng, 64)
    assert b["rays_o"].shape == (64, 3) and b["images"].shape == (64, 3)

    b = ds.collate_sam(rng)
    res = cfg.sam.online_resolution
    lr = int(res / 1024 * 64)
    assert b["rays_o"].shape == (res * res, 3)
    assert b["rays_o_lr"].shape == (lr * lr, 3)
    assert b["h"] == lr

    f = ds.frame(0)
    assert f["rays_o"].shape == (32 * 32, 3)
    assert f["images"].shape == (32 * 32, 3)


def test_colmap_test_trajectories(colmap_scene):
    for traj, n in (("circle", 100), ("interp", 80)):
        cfg = Config(data=DataConfig(path=colmap_scene, data_type="mip",
                                     camera_traj=traj))
        ds = SceneDataset(cfg, "test")
        assert len(ds) == n
        assert ds.images is None


def test_cam_near_far(colmap_scene):
    cfg = Config(data=DataConfig(path=colmap_scene, data_type="mip",
                                 enable_cam_near_far=True))
    ds = SceneDataset(cfg, "train")
    assert ds.cam_near_far is not None
    assert ds.cam_near_far.shape == (len(ds), 2)
    assert np.all(ds.cam_near_far[:, 0] < ds.cam_near_far[:, 1])
    b = ds.collate_train(np.random.default_rng(0), 16)
    assert b["cam_near_far"].shape == (16, 2)


@pytest.fixture
def transforms_scene(tmp_path):
    import cv2

    root = str(tmp_path / "tscene")
    os.makedirs(root, exist_ok=True)
    poses = cam_util.circle_poses(radius=2.0, n=6)
    frames = []
    for i, p in enumerate(poses):
        fp = f"r_{i}.png"
        cv2.imwrite(os.path.join(root, fp), np.full((24, 24, 3), 100, np.uint8))
        frames.append({"file_path": f"r_{i}", "transform_matrix": p.tolist()})
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    return root


def test_transforms_dataset(transforms_scene):
    cfg = Config(data=DataConfig(path=transforms_scene, data_type="llff",
                                 val_type="val_all"))
    ds = SceneDataset(cfg, "train")
    assert len(ds) == 6
    assert ds.images.shape == (6, 24, 24, 3)
    f = 0.5 * 24 / np.tan(0.4)
    np.testing.assert_allclose(ds.intrinsics[0], f, rtol=1e-5)


def test_mask_loading(colmap_scene):
    # write instance masks for every image + valid.json
    mask_dir = os.path.join(colmap_scene, "obj_masks")
    os.makedirs(mask_dir, exist_ok=True)
    valid = {}
    for i in range(20):
        m = np.full((32, 32), -1, np.int64)
        m[8:24, 8:24] = 1
        m[:8] = 0
        np.save(os.path.join(mask_dir, f"img_{i:03d}.png_masks.npy"), m)
        valid[f"img_{i:03d}.png"] = True
    with open(os.path.join(mask_dir, "valid.json"), "w") as f:
        json.dump(valid, f)

    cfg = Config(
        data=DataConfig(path=colmap_scene, data_type="mip"),
        model=ModelConfig(with_mask=True, n_inst=2),
        mask=MaskTrainConfig(mask_folder_name="obj_masks", mixed_sampling=True,
                             num_local_sample=2, local_sample_patch_size=4,
                             error_map=True),
    )
    ds = SceneDataset(cfg, "train")
    assert ds.masks is not None and ds.masks.shape == (len(ds), 32, 32)
    assert ds.incoherent_masks is not None
    rng = np.random.default_rng(0)
    b = ds.collate_mask(rng, 64)
    n_total = 64 + 2 * 16
    assert b["rays_o"].shape == (n_total, 3)
    assert b["masks"].shape == (n_total,)
    assert set(np.unique(b["masks"])) <= {-1, 0, 1}
    assert b["error_maps"].shape == (n_total,)
    # error map EMA update
    before = ds.error_map[b["index"]][b["inds_coarse"][:5]].copy()
    ds.update_error_map(b["index"], b["inds_coarse"][:5], np.ones(5, np.float32))
    after = ds.error_map[b["index"]][b["inds_coarse"][:5]]
    np.testing.assert_allclose(after, 0.1 * before + 0.9, rtol=1e-5)


@pytest.fixture
def pano_scene(tmp_path):
    """Reference pano layout: images/ + pose/*.txt + intrinsic/
    intrinsic_color.txt (colmap_provider.py:357-423)."""
    import cv2

    root = str(tmp_path / "pscene")
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "pose"))
    os.makedirs(os.path.join(root, "intrinsic"))
    K = np.array([[40.0, 0, 12.0, 0], [0, 40.0, 9.0, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
    np.savetxt(os.path.join(root, "intrinsic", "intrinsic_color.txt"), K)
    poses = cam_util.circle_poses(radius=2.0, n=5)
    for i, p in enumerate(poses):
        # stored poses are OpenCV-convention: invert the y/z flip the
        # loader applies
        m = p.copy()
        m[:, 1:3] = -m[:, 1:3]
        np.savetxt(os.path.join(root, "pose", f"f_{i}.txt"), m)
        cv2.imwrite(os.path.join(root, "images", f"f_{i}.png"),
                    np.full((18, 24, 3), 90, np.uint8))
    # one pose without an image: must be filtered out
    np.savetxt(os.path.join(root, "pose", "f_9.txt"), np.eye(4))
    return root


def test_pano_dataset(pano_scene):
    cfg = Config(data=DataConfig(path=pano_scene, data_type="pano",
                                 val_type="val_all"))
    ds = SceneDataset(cfg, "train")
    assert len(ds) == 5  # orphan pose filtered
    assert ds.images.shape == (5, 18, 24, 3)
    np.testing.assert_allclose(ds.intrinsics, [40, 40, 12, 9], rtol=1e-6)
    # AABB from camera centers exists and is ordered
    assert ds.pts_aabb.shape == (6,)
    assert np.all(ds.pts_aabb[:3] <= ds.pts_aabb[3:])
    # the y/z column flip round-trips: cameras at unit radius after
    # auto-scale look inward
    assert np.isfinite(ds.poses).all()
    b = ds.collate_train(np.random.default_rng(0), 8)
    assert b["rays_o"].shape == (8, 3)


def test_lerf_fixed_near_far(transforms_scene):
    cfg = Config(data=DataConfig(path=transforms_scene, data_type="lerf",
                                 val_type="val_all"))
    ds = SceneDataset(cfg, "train")
    assert ds.cam_near_far is not None
    np.testing.assert_allclose(
        ds.cam_near_far, np.tile([[0.01, 8.0]], (len(ds), 1)))
    b = ds.collate_train(np.random.default_rng(0), 8)
    assert b["cam_near_far"].shape == (8, 2)
