"""Native C++ dataloader tests: build, correctness vs the numpy ray math,
prefetch behavior, throughput sanity."""

import numpy as np
import pytest

from sanerf_tpu.data import native_loader
from sanerf_tpu.data.rays import sample_rays
from sanerf_tpu.data.synthetic import SyntheticSphereDataset

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def scene():
    return SyntheticSphereDataset(H=48, W=48, n_views=6)


def test_batches_match_numpy_ray_math(scene):
    s = native_loader.NativeRaySampler(
        scene.poses, scene.intrinsics, scene.images, num_rays=256, seed=7,
    )
    try:
        for _ in range(4):
            b = s.next_batch()
            i = b["index"]
            assert 0 <= i < 6
            # origins = camera center
            np.testing.assert_allclose(
                b["rays_o"], np.broadcast_to(scene.poses[i][:3, 3], (256, 3)),
                rtol=1e-6,
            )
            # each sampled ray must be exactly one of the image's pixel rays:
            # recover the pixel from the direction and compare rgb
            pose = scene.poses[i]
            fx, fy, cx, cy = scene.intrinsics
            d_cam = b["rays_d"] @ pose[:3, :3]  # back to camera frame
            px = np.round(d_cam[:, 0] / -d_cam[:, 2] * fx + cx - 0.5).astype(int)
            py = np.round(-d_cam[:, 1] / -d_cam[:, 2] * fy + cy - 0.5).astype(int)
            assert px.min() >= 0 and px.max() < 48
            assert py.min() >= 0 and py.max() < 48
            np.testing.assert_allclose(
                b["images"], scene.images[i][py, px], atol=1 / 255 + 1e-6
            )
    finally:
        s.close()


def test_direction_convention_matches_sample_rays(scene):
    """A native ray through pixel p equals sample_rays' ray through p."""
    s = native_loader.NativeRaySampler(
        scene.poses, scene.intrinsics, scene.images, num_rays=64, seed=3,
    )
    try:
        b = s.next_batch()
        i = b["index"]
        pose = scene.poses[i]
        fx, fy, cx, cy = scene.intrinsics
        d_cam = b["rays_d"] @ pose[:3, :3]
        px = np.round(d_cam[:, 0] / -d_cam[:, 2] * fx + cx - 0.5).astype(int)
        py = np.round(-d_cam[:, 1] / -d_cam[:, 2] * fy + cy - 0.5).astype(int)
        coords = np.stack([py, px], -1)
        rb = sample_rays(pose, scene.intrinsics, 48, 48, coords=coords)
        np.testing.assert_allclose(b["rays_d"], rb.rays_d, rtol=1e-5, atol=1e-6)
    finally:
        s.close()


def test_prefetch_ring_fills(scene):
    import time

    s = native_loader.NativeRaySampler(
        scene.poses, scene.intrinsics, scene.images, num_rays=128,
        prefetch_depth=3, n_threads=2,
    )
    try:
        time.sleep(0.3)
        assert s.ready_count() == 3  # ring full while consumer idle
        s.next_batch()
        time.sleep(0.2)
        assert s.ready_count() == 3  # refilled
    finally:
        s.close()


def test_throughput_exceeds_python(scene):
    """The native path must beat the numpy collate (it exists for speed)."""
    import time

    n = 8192
    s = native_loader.NativeRaySampler(
        scene.poses, scene.intrinsics, scene.images, num_rays=n, n_threads=4,
        prefetch_depth=8,
    )
    try:
        s.next_batch()
        t0 = time.time()
        for _ in range(50):
            s.next_batch()
        native_dt = time.time() - t0

        rng = np.random.default_rng(0)
        t0 = time.time()
        for _ in range(50):
            scene.collate_train(rng, n)
        py_dt = time.time() - t0
        assert native_dt < py_dt, (native_dt, py_dt)
    finally:
        s.close()
