"""The adversarial textured fixture + the field-family quality-gate tool.

The REAL gate (20k iters at 128^2, both families, held-out PSNR within
~1 dB) runs on the TPU via `python tools/quality_gate.py` — results are
recorded in README.md. Here: the fixture's closed-form properties and a
tiny smoke of the gate harness on the CPU backend.
"""

import os
import sys

import numpy as np
import pytest

from sanerf_tpu.data.rays import sample_rays
from sanerf_tpu.data.synthetic import (
    SyntheticSphereDataset, ray_textured_scene,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_textured_scene_properties(rng):
    ds = SyntheticSphereDataset(H=48, W=48, n_views=4, scene="textured")
    assert ds.images.shape == (4, 48, 48, 3)
    assert np.isfinite(ds.images).all()
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    # multiple objects visible: floor + at least two spheres in most views
    ids = set(np.unique(ds.instances))
    assert {1, 2}.issubset(ids) and len(ids) >= 4
    # high-frequency content: neighboring-pixel deltas far above the easy
    # Lambertian sphere fixture's
    easy = SyntheticSphereDataset(H=48, W=48, n_views=4, scene="sphere")
    hf = np.abs(np.diff(ds.images, axis=2)).mean()
    hf_easy = np.abs(np.diff(easy.images, axis=2)).mean()
    assert hf > 2 * hf_easy, (hf, hf_easy)


def test_textured_scene_depth_consistent(rng):
    """depth * |d| along the ray lands on the reported surface."""
    ds = SyntheticSphereDataset(H=32, W=32, n_views=2, scene="textured")
    rb = sample_rays(ds.poses[0], ds.intrinsics, 32, 32, N=-1)
    rgb, depth, inst = ray_textured_scene(rb.rays_o, rb.rays_d)
    hit = inst >= 2  # spheres
    p = rb.rays_o[hit] + rb.rays_d[hit] * depth[hit][:, None]
    centers = np.asarray([[0.0, 0.0, 0.0], [0.55, -0.15, 0.35],
                          [-0.5, -0.25, -0.3]], np.float32)
    radii = np.asarray([0.5, 0.3, 0.35], np.float32)
    c = centers[inst[hit] - 2]
    r = radii[inst[hit] - 2]
    np.testing.assert_allclose(np.linalg.norm(p - c, axis=-1), r, atol=1e-3)


def test_quality_gate_harness_smoke(tmp_path):
    """The gate tool end-to-end at toy scale (both families, finite PSNR)."""
    import quality_gate

    results = quality_gate.main([
        "--iters", "60", "--H", "24", "--views", "4", "--num_rays", "256",
        "--num_steps", "12", "6", "--workspace", str(tmp_path),
        "--no_native",
    ])
    assert len(results) == 2
    for r in results:  # harness smoke: runs + finite (quality needs iters)
        assert np.isfinite(r["psnr"]) and r["psnr"] > 0.0, r
