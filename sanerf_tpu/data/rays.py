"""Ray generation and pixel sampling.

Two implementations by design:

- `sample_rays` (numpy, host): per-step training-batch construction — index
  sampling (uniform / coords / patch / importance) is tiny, branchy work
  that belongs on the host; only the final [N, 3] ray arrays ship to the
  device. Mirrors `get_rays` (nerf/utils.py:145-279).
- `full_frame_rays` (jnp, jitted): whole-image rays for eval / the
  interactive viewer, generated on-device (512^2 rays/frame stay in HBM).

Conventions (nerf/utils.py:247-258): pixel centers at +0.5; directions
x=(i-cx)/fx, y=-(j-cy)/fy, z=-1 (OpenGL, NOT normalized so composited
t is metric depth); rotate by c2w; origin = translation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class RayBatch:
    rays_o: np.ndarray  # [N, 3]
    rays_d: np.ndarray  # [N, 3]
    inds: np.ndarray  # [N] flat pixel indices
    i: np.ndarray  # [N] pixel x
    j: np.ndarray  # [N] pixel y
    inds_coarse: Optional[np.ndarray] = None  # [N] coarse-map indices


def _dirs_from_pixels(i, j, intrinsics):
    fx, fy, cx, cy = intrinsics
    xs = (i - cx) / fx
    ys = -(j - cy) / fy
    zs = -np.ones_like(i)
    return np.stack([xs, ys, zs], axis=-1).astype(np.float32)


def sample_rays(
    pose: np.ndarray,
    intrinsics: np.ndarray,
    H: int,
    W: int,
    N: int = -1,
    *,
    rng: Optional[np.random.Generator] = None,
    coords: Optional[np.ndarray] = None,
    patch_size: int = 1,
    importance_map: Optional[np.ndarray] = None,  # [S*S] sampling weights
    importance_size: int = 128,
    patch_from_map: bool = False,
    coarse_size: int = 128,
) -> RayBatch:
    """Sample N rays from one camera.

    Modes (mirroring nerf/utils.py:174-236):
      - coords given: exact pixels.
      - patch_size > 1: N//p^2 random patches (or one map-guided patch when
        `patch_from_map` with `importance_map`).
      - importance_map (patch_size==1): multinomial over the coarse map with
        sub-cell jitter; returns `inds_coarse` for EMA error updates.
      - else uniform random pixels (with replacement).
    N <= 0 -> all pixels in scanline order.
    """
    rng = rng or np.random.default_rng()

    inds_coarse = None
    if coords is not None:
        inds = coords[:, 0] * W + coords[:, 1]
    elif N <= 0:
        inds = np.arange(H * W)
    elif patch_size > 1:
        if importance_map is not None and patch_from_map:
            # one patch centered on a hot coarse cell (utils.py:180-194)
            p = importance_map / importance_map.sum()
            c = rng.choice(importance_map.size, p=p)
            cx_, cy_ = c // importance_size, c % importance_size
            sx, sy = H / importance_size, W / importance_size
            x0 = int(np.clip(cx_ * sx - patch_size // 2, 0, H - patch_size - 1))
            y0 = int(np.clip(cy_ * sy - patch_size // 2, 0, W - patch_size - 1))
            xs0 = np.array([x0])
            ys0 = np.array([y0])
        else:
            num_patch = N // (patch_size**2)
            xs0 = rng.integers(0, H - patch_size, num_patch)
            ys0 = rng.integers(0, W - patch_size, num_patch)
        pi, pj = np.meshgrid(np.arange(patch_size), np.arange(patch_size), indexing="ij")
        off = np.stack([pi.ravel(), pj.ravel()], -1)  # [p^2, 2]
        xy = np.stack([xs0, ys0], -1)[:, None, :] + off[None]  # [P, p^2, 2]
        xy = xy.reshape(-1, 2)
        inds = xy[:, 0] * W + xy[:, 1]
    elif importance_map is not None:
        p = importance_map.astype(np.float64)
        p = p / p.sum()
        inds_coarse = rng.choice(p.size, size=N, replace=False, p=p)
        ix, iy = inds_coarse // importance_size, inds_coarse % importance_size
        sx, sy = H / importance_size, W / importance_size
        ix = np.minimum((ix * sx + rng.random(N) * sx).astype(np.int64), H - 1)
        iy = np.minimum((iy * sy + rng.random(N) * sy).astype(np.int64), W - 1)
        inds = ix * W + iy
    else:
        inds = rng.integers(0, H * W, N)

    jj, ii = np.divmod(inds, W)  # row, col
    i = ii.astype(np.float32) + 0.5
    j = jj.astype(np.float32) + 0.5

    dirs = _dirs_from_pixels(i, j, np.asarray(intrinsics, np.float32))
    rays_d = dirs @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape).astype(np.float32)

    if inds_coarse is None:
        # coarse indices for every mode (utils.py:269-275)
        cx_ = (jj * (coarse_size / H)).astype(np.int64)
        cy_ = (ii * (coarse_size / W)).astype(np.int64)
        inds_coarse = cx_ * coarse_size + cy_

    return RayBatch(
        rays_o=rays_o.astype(np.float32),
        rays_d=rays_d.astype(np.float32),
        inds=inds.astype(np.int64),
        i=ii.astype(np.int64),
        j=jj.astype(np.int64),
        inds_coarse=inds_coarse,
    )


@functools.partial(jax.jit, static_argnames=("H", "W"))
def full_frame_rays(pose: jax.Array, intrinsics: jax.Array, H: int, W: int):
    """All H*W rays for a pose, on device, scanline order. Returns
    (rays_o [HW,3], rays_d [HW,3])."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    xs = (i.ravel() - cx) / fx
    ys = -(j.ravel() - cy) / fy
    zs = -jnp.ones_like(xs)
    dirs = jnp.stack([xs, ys, zs], axis=-1)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_incoherent_mask(mask: np.ndarray, sfact: int = 2, keep_size: bool = True) -> np.ndarray:
    """Boundary/uncertainty detector: down-up-sample residual thresholded at
    0.01 (nerf/utils.py:283-298). mask: [H, W] or [H, W, C] float."""
    import cv2

    squeeze = mask.ndim == 2
    m = mask.astype(np.float32)
    if squeeze:
        m = m[..., None]
    h, w = m.shape[:2]
    small = cv2.resize(m, (w // sfact, h // sfact), interpolation=cv2.INTER_LINEAR)
    if small.ndim == 2:
        small = small[..., None]
    recover = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
    if recover.ndim == 2:
        recover = recover[..., None]
    residue = np.abs(m - recover)
    uncertain = cv2.resize(residue, (w // sfact, h // sfact), interpolation=cv2.INTER_LINEAR)
    if uncertain.ndim == 2:
        uncertain = uncertain[..., None]
    uncertain = (uncertain >= 0.01).astype(np.float32)
    if keep_size:
        uncertain = cv2.resize(uncertain, (w, h), interpolation=cv2.INTER_NEAREST)
        if uncertain.ndim == 2:
            uncertain = uncertain[..., None]
    return uncertain[..., 0] if squeeze else uncertain
