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


def _sphere_hit(rays_o, d, center, radius):
    """t of the near intersection along unit dirs d (inf = miss)."""
    oc = rays_o - np.asarray(center, np.float32)
    b = np.sum(oc * d, -1)
    disc = b * b - (np.sum(oc * oc, -1) - radius * radius)
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    return np.where((disc > 0) & (t > 1e-4), t, np.inf)


def ray_textured_scene(rays_o, rays_d, bg: float = 1.0,
                       light=(0.577, 0.577, 0.577)):
    """Closed-form render of the ADVERSARIAL quality fixture: three
    mutually occluding spheres with high-frequency procedural textures over
    a fine-checkered floor plane. This is the hardest scene this
    environment can gate on (no real Mip-360/LLFF data exists here —
    BASELINE.md's parity caveat): the textures live near the sampling
    Nyquist rate, the regime where coordinate MLPs classically lose to hash
    grids (readme.md:28, scripts/run1.sh recipes).

    Returns (rgb [N, 3], depth [N], instance [N] int: 0 bg, 1 floor,
    2..4 spheres).
    """
    spheres = [
        ((0.0, 0.0, 0.0), 0.5),
        ((0.55, -0.15, 0.35), 0.3),
        ((-0.5, -0.25, -0.3), 0.35),
    ]
    dnorm = np.linalg.norm(rays_d, axis=-1)
    d = rays_d / dnorm[:, None]
    N = rays_o.shape[0]
    best_t = np.full(N, np.inf, np.float32)
    best_id = np.zeros(N, np.int64)

    # floor plane y = -0.62, bounded extent
    dy = d[:, 1]
    t_pl = np.where(np.abs(dy) > 1e-6, (-0.62 - rays_o[:, 1]) / dy, np.inf)
    p_pl = rays_o + d * t_pl[:, None]
    ok = (t_pl > 1e-4) & (np.abs(p_pl[:, 0]) < 2.2) & (np.abs(p_pl[:, 2]) < 2.2)
    t_pl = np.where(ok, t_pl, np.inf)
    best_t, best_id = np.where(t_pl < best_t, t_pl, best_t), np.where(
        t_pl < best_t, 1, best_id)

    for k, (c, r) in enumerate(spheres):
        t = _sphere_hit(rays_o, d, c, r)
        hit = t < best_t
        best_t = np.where(hit, t, best_t)
        best_id = np.where(hit, k + 2, best_id)

    p = rays_o + d * best_t[:, None]
    rgb = np.full((N, 3), bg, np.float32)
    L = np.asarray(light, np.float32)

    # floor: fine checker (hard edges, ~Nyquist at 64^2 over the extent)
    m = best_id == 1
    if m.any():
        cx = np.floor(p[m, 0] * 6.0) + np.floor(p[m, 2] * 6.0)
        check = (cx % 2 == 0).astype(np.float32)
        albedo = np.stack([0.15 + 0.7 * check,
                           0.2 + 0.5 * check,
                           0.25 + 0.35 * check], -1)
        rgb[m] = albedo  # flat-lit floor (normal = +y, fixed lambert)
        rgb[m] *= max(L[1], 0.35)

    texs = [
        # high-frequency smooth stripes, distinct phase per channel
        lambda q: np.stack([0.5 + 0.45 * np.sin(24.0 * q[:, 0] + 2.0 * q[:, 1]),
                            0.5 + 0.45 * np.sin(24.0 * q[:, 1]),
                            0.5 + 0.45 * np.sin(24.0 * q[:, 2] + 1.0)], -1),
        # hard 3-D checker
        lambda q: np.where(
            ((np.floor(q[:, 0] * 14) + np.floor(q[:, 1] * 14)
              + np.floor(q[:, 2] * 14)) % 2 == 0)[:, None],
            np.asarray([0.85, 0.25, 0.2], np.float32),
            np.asarray([0.95, 0.9, 0.85], np.float32)),
        # smooth dots
        lambda q: np.stack([0.3 + 0.3 * np.cos(20 * q[:, 0]) * np.cos(20 * q[:, 1]),
                            0.6 + 0.35 * np.cos(20 * q[:, 1]) * np.cos(20 * q[:, 2]),
                            0.35 + 0.25 * np.cos(20 * q[:, 0] + 20 * q[:, 2])], -1),
    ]
    for k, (c, r) in enumerate(spheres):
        m = best_id == k + 2
        if not m.any():
            continue
        n = (p[m] - np.asarray(c, np.float32)) / r
        lam = np.clip(n @ L, 0.15, 1.0)
        rgb[m] = np.clip(texs[k](p[m]), 0.0, 1.0) * lam[:, None]

    depth = np.where(np.isfinite(best_t), best_t / dnorm, 0.0).astype(np.float32)
    return np.clip(rgb, 0.0, 1.0), depth, best_id


@dataclass
class SyntheticSphereDataset:
    """Drop-in provider: circle of poses around a shaded sphere."""

    H: int = 64
    W: int = 64
    n_views: int = 16
    radius: float = 2.0
    fovy: float = 50.0
    training: bool = True
    # 'sphere' = the easy Lambertian fixture; 'textured' = the adversarial
    # high-frequency multi-object fixture (ray_textured_scene)
    scene: str = "sphere"
    poses: np.ndarray = field(init=False)
    intrinsics: np.ndarray = field(init=False)
    images: np.ndarray = field(init=False)
    depths: np.ndarray = field(init=False)
    instances: np.ndarray = field(init=False)

    def _shade(self, rays_o, rays_d):
        if self.scene == "textured":
            return ray_textured_scene(rays_o, rays_d)
        rgb, depth = ray_sphere_shade(rays_o, rays_d)
        return rgb, depth, (depth > 0).astype(np.int64)

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
        imgs, deps, insts = [], [], []
        for pose in self.poses:
            rb = sample_rays(pose, self.intrinsics, self.H, self.W, N=-1)
            rgb, depth, inst = self._shade(rb.rays_o, rb.rays_d)
            imgs.append(rgb.reshape(self.H, self.W, 3))
            deps.append(depth.reshape(self.H, self.W))
            insts.append(inst.reshape(self.H, self.W))
        self.images = np.stack(imgs)
        self.depths = np.stack(deps)
        self.instances = np.stack(insts)
        # per-view near/far from the exact depths — the same guard the
        # reference derives from sparse COLMAP depth (colmap_provider.py:
        # 554-600). Without it, inward-looking ring cameras admit a
        # billboard collapse: density sheets just past the global near
        # plane reproduce every TRAIN view perfectly (each camera only
        # sees its own sheet) and score ~11 dB on held-out views.
        nf = []
        for dep in self.depths:
            hit = dep[dep > 0]
            near = 0.9 * float(hit.min()) if hit.size else 0.05
            far = 1.25 * float(hit.max()) if hit.size else 10.0
            nf.append([near, far])
        self.cam_near_far = np.asarray(nf, np.float32)

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
            "cam_near_far": self.cam_near_far[idx : idx + 1],
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
            "cam_near_far": self.cam_near_far[idx : idx + 1],
            "index": idx,
            "H": self.H,
            "W": self.W,
            "pose": self.poses[idx],
            "name": f"{idx:04d}",
        }

    @property
    def masks(self) -> np.ndarray:
        """Instance labels (all pixels labeled): sphere scene: 1 = sphere,
        0 = background; textured scene: 0 bg, 1 floor, 2..4 spheres."""
        return self.instances.astype(np.int64)

    @property
    def error_map(self):
        return None

    def collate_sam(self, rng: np.random.Generator,
                    index: Optional[int] = None) -> Dict:
        """Stage-2-style batch on the synthetic scene (square camera at the
        native resolution; low-res rays at the 64/1024 SAM scale).
        `index` pins the pose (fixed-view eval protocol)."""
        i = int(rng.integers(0, self.n_views)) if index is None else index
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
            "cam_near_far": self.cam_near_far[i : i + 1],
            "inds": rb.inds, "inds_coarse": rb.inds_coarse,
            "index": i, "H": self.H, "W": self.W,
        }
