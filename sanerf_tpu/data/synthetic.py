"""Procedural synthetic scenes for tests and convergence gates.

The reference has no test data; this module provides what SURVEY.md §4 calls
for: an analytic scene (Lambertian sphere on white background) whose ground
truth is ray-traced in closed form, so end-to-end training can be gated on
"PSNR > X after N steps" without any external dataset.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from sanerf_tpu.data.rays import RayBatch, sample_rays
from sanerf_tpu.utils.camera import circle_poses, fov_to_focal


def ray_sphere_shade(
    rays_o: np.ndarray,
    rays_d: np.ndarray,
    center=(0.0, 0.0, 0.0),
    radius: float = 0.5,
    light=(0.577, 0.577, 0.577),
    albedo=(0.8, 0.3, 0.2),
    bg: float = 1.0,
):
    """Closed-form Lambertian sphere render. Returns (rgb [N,3], depth [N])."""
    c = np.asarray(center, np.float32)
    oc = rays_o - c
    dnorm = np.linalg.norm(rays_d, axis=-1)
    d = rays_d / dnorm[:, None]
    b = np.sum(oc * d, -1)
    disc = b * b - (np.sum(oc * oc, -1) - radius * radius)
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0
    p = rays_o + d * t[:, None]
    n = (p - c) / radius
    lam = np.clip(n @ np.asarray(light, np.float32), 0.1, 1.0)
    rgb = np.where(
        hit[:, None], lam[:, None] * np.asarray(albedo, np.float32), bg
    ).astype(np.float32)
    # depth in the renderer's convention: t along the UNNORMALIZED ray
    depth = np.where(hit, t / dnorm, 0.0).astype(np.float32)
    return rgb, depth


@dataclass
class SyntheticSphereDataset:
    """Drop-in provider: circle of poses around a shaded sphere."""

    H: int = 64
    W: int = 64
    n_views: int = 16
    radius: float = 2.0
    fovy: float = 50.0
    training: bool = True
    poses: np.ndarray = field(init=False)
    intrinsics: np.ndarray = field(init=False)
    images: np.ndarray = field(init=False)
    depths: np.ndarray = field(init=False)

    def __post_init__(self):
        # two interleaved rings at different heights/radii: a single ring of
        # same-distance cameras is geometrically degenerate and lets NeRF
        # collapse to near-plane billboards (perfect train views, garbage
        # novel views)
        lo = circle_poses(radius=self.radius, height=0.5, n=(self.n_views + 1) // 2)
        hi = circle_poses(radius=self.radius * 0.75, height=1.1,
                          n=self.n_views // 2)
        poses = np.empty((self.n_views, 4, 4), np.float32)
        poses[0::2] = lo
        poses[1::2] = hi
        self.poses = poses
        f = fov_to_focal(self.fovy, self.H)
        self.intrinsics = np.array([f, f, self.W / 2, self.H / 2], np.float32)
        imgs, deps = [], []
        for pose in self.poses:
            rb = sample_rays(pose, self.intrinsics, self.H, self.W, N=-1)
            rgb, depth = ray_sphere_shade(rb.rays_o, rb.rays_d)
            imgs.append(rgb.reshape(self.H, self.W, 3))
            deps.append(depth.reshape(self.H, self.W))
        self.images = np.stack(imgs)
        self.depths = np.stack(deps)

    def __len__(self):
        return self.n_views

    def collate_train(self, rng: np.random.Generator, num_rays: int) -> Dict:
        idx = int(rng.integers(0, self.n_views))
        rb = sample_rays(
            self.poses[idx], self.intrinsics, self.H, self.W, N=num_rays, rng=rng
        )
        gt = self.images[idx].reshape(-1, 3)[rb.inds]
        return {
            "rays_o": rb.rays_o,
            "rays_d": rb.rays_d,
            "images": gt,
            "index": idx,
            "H": self.H,
            "W": self.W,
        }

    def frame(self, idx: int) -> Dict:
        rb = sample_rays(self.poses[idx], self.intrinsics, self.H, self.W, N=-1)
        return {
            "rays_o": rb.rays_o,
            "rays_d": rb.rays_d,
            "images": self.images[idx].reshape(-1, 3),
            "masks": self.masks[idx].reshape(-1),
            "index": idx,
            "H": self.H,
            "W": self.W,
            "pose": self.poses[idx],
            "name": f"{idx:04d}",
        }

    @property
    def masks(self) -> np.ndarray:
        """Instance labels: 1 = sphere, 0 = background (all labeled)."""
        return (self.depths > 0).astype(np.int64)

    @property
    def error_map(self):
        return None

    def collate_sam(self, rng: np.random.Generator) -> Dict:
        """Stage-2-style batch on the synthetic scene (square camera at the
        native resolution; low-res rays at the 64/1024 SAM scale)."""
        i = int(rng.integers(0, self.n_views))
        rb = sample_rays(self.poses[i], self.intrinsics, self.H, self.W, N=-1)
        lr = max(4, int(self.H / 1024 * 64))
        intr_lr = self.intrinsics * (lr / self.H)
        intr_lr[2:] = lr / 2
        rb_lr = sample_rays(self.poses[i], intr_lr, lr, lr, N=-1)
        return {
            "rays_o": rb.rays_o, "rays_d": rb.rays_d,
            "rays_o_lr": rb_lr.rays_o, "rays_d_lr": rb_lr.rays_d,
            "H": self.H, "W": self.W, "h": lr, "w": lr, "index": i,
        }

    def collate_mask(self, rng: np.random.Generator, num_rays: int) -> Dict:
        i = int(rng.integers(0, self.n_views))
        rb = sample_rays(self.poses[i], self.intrinsics, self.H, self.W,
                         N=num_rays, rng=rng)
        return {
            "rays_o": rb.rays_o, "rays_d": rb.rays_d,
            "masks": self.masks[i].reshape(-1)[rb.inds],
            "inds": rb.inds, "inds_coarse": rb.inds_coarse,
            "index": i, "H": self.H, "W": self.W,
        }
