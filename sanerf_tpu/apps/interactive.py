"""Interactive 3D segmentation session: the north-star loop.

Rebuild of the reference's interactive path (SURVEY.md §3.3,
utils.py:1243-1475 + gui.py state): per frame,

1. render the RGB frame (staged) + the low-res SAM feature map;
2. a click lifts the pixel to 3D through the rendered depth
   (p = o + d * depth) and toggles against the persistent 3D point list
   (distance < 0.01 removes, else appends, utils.py:1318-1345);
3. every frame, all 3D points reproject through the current camera
   (w2c pinhole with the x-flip, utils.py:1357-1366) and are kept only if
   on-screen and unoccluded (|z - depth| <= 0.05, utils.py:1368-1384);
4. the surviving 2D points prompt the SAM decoder on the rendered features
   (the fake-set_image injection, utils.py:1409-1475);
5. the mask overlays the RGB frame.

Headless by design: the GUI (apps/gui.py) is a thin view over this session,
so the same loop runs in tests and benchmarks without a display.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.config import Config
from sanerf_tpu.data.rays import full_frame_rays
from sanerf_tpu.models import renderer
from sanerf_tpu.models.fields import NerfModel, Params
from sanerf_tpu.utils.camera import fov_to_focal


@dataclass
class FrameResult:
    rgb: np.ndarray  # [H, W, 3]
    depth: np.ndarray  # [H, W]
    mask: Optional[np.ndarray] = None  # [H, W] bool
    points_2d: Optional[np.ndarray] = None  # [P, 2] (x, y)
    composed: Optional[np.ndarray] = None  # rgb with overlays


class InteractiveSession:
    def __init__(self, cfg: Config, model: NerfModel, params: Params,
                 sam_predictor=None, H: int = 512, W: int = 512):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.sam = sam_predictor
        self.H, self.W = H, W
        # low-res feature map size: 64 per 1024 of render res (utils.py:1094)
        self.h = max(4, int(H / 1024 * 64))
        self.w = max(4, int(W / 1024 * 64))
        self.points_3d: List[np.ndarray] = []  # persistent click memory

    # -- rendering -------------------------------------------------------------

    def render_frame(self, pose: np.ndarray, intrinsics: np.ndarray,
                     downscale: int = 1, aabb=None, bg_color: float = 1.0,
                     key=None) -> Tuple[np.ndarray, np.ndarray]:
        """RGB + depth at (H/downscale, W/downscale), upscaled back
        (dynamic-resolution mode, utils.py:1698-1702). `aabb` is the live
        GUI-editable inference box (gui.py:317-320), `key` enables
        perturbed sampling for spp accumulation (gui.py:185-190)."""
        H, W = self.H // downscale, self.W // downscale
        intr = np.asarray(intrinsics, np.float32) / downscale
        ro, rd = full_frame_rays(jnp.asarray(pose), jnp.asarray(intr), H, W)
        out = renderer.render_frame(
            self.model, self.params, ro, rd, bg_color=bg_color,
            aabb=None if aabb is None else jnp.asarray(aabb, jnp.float32),
            key=key)
        rgb = np.asarray(out["image"]).reshape(H, W, 3)
        depth = np.asarray(out["depth"]).reshape(H, W)
        if downscale > 1:
            import cv2

            rgb = cv2.resize(rgb, (self.W, self.H), interpolation=cv2.INTER_LINEAR)
            depth = cv2.resize(depth, (self.W, self.H), interpolation=cv2.INTER_NEAREST)
        return rgb, depth

    def render_features(self, pose: np.ndarray, intrinsics: np.ndarray) -> np.ndarray:
        """Low-res SAM feature map [h, w, 256] (utils.py:1308-1315)."""
        intr = np.asarray(intrinsics, np.float32) * (self.h / self.H)
        intr[2] = self.w / 2
        intr[3] = self.h / 2
        ro, rd = full_frame_rays(jnp.asarray(pose), jnp.asarray(intr), self.h, self.w)
        out = renderer.render_rays(self.model, self.params, ro, rd, return_feats=True)
        return np.asarray(out["samvit"]).reshape(self.h, self.w, -1)

    # -- 3D point memory ---------------------------------------------------------

    def toggle_point(self, px: float, py: float, pose: np.ndarray, depth: np.ndarray,
                     pixel_radius: float = 8.0):
        """Click at pixel (px, py): lift to 3D and toggle (utils.py:1318-1345).

        Removal matches in SCREEN space first (within `pixel_radius` px of an
        existing point's reprojection): the reference's 0.01 world-distance
        test assumes full-resolution depth, but under the adaptive-downscale
        viewer the re-lifted point can differ by more than that at the same
        click position.
        """
        intr = self.intrinsics_for(pose)
        if self.points_3d:
            pts2d_all = self._project_all(pose, intr)
            d2 = np.hypot(pts2d_all[:, 0] - px, pts2d_all[:, 1] - py)
            k = int(np.argmin(d2)) if len(d2) else -1
            if k >= 0 and d2[k] < pixel_radius:
                self.points_3d.pop(k)
                return
        j, i = int(np.clip(py, 0, self.H - 1)), int(np.clip(px, 0, self.W - 1))
        d = float(depth[j, i])
        if d <= 0:
            return
        fx, fy, cx, cy = intr
        direction = np.array(
            [(px + 0.5 - cx) / fx, -(py + 0.5 - cy) / fy, -1.0], np.float32
        )
        world = pose[:3, 3] + (pose[:3, :3] @ direction) * d
        for k, p in enumerate(self.points_3d):
            if np.linalg.norm(p - world) < 0.01:  # reference semantics
                self.points_3d.pop(k)
                return
        self.points_3d.append(world)

    def _project_all(self, pose: np.ndarray, intrinsics: np.ndarray) -> np.ndarray:
        """Reproject ALL 3D points (no occlusion test), [P, 2]."""
        fx, fy, cx, cy = intrinsics
        pts = np.stack(self.points_3d)
        cam = (pts - pose[:3, 3]) @ pose[:3, :3]
        z = np.maximum(-cam[:, 2], 1e-6)
        x = cam[:, 0] / z * fx + cx - 0.5
        y = -cam[:, 1] / z * fy + cy - 0.5
        return np.stack([x, y], -1)

    def intrinsics_for(self, pose) -> np.ndarray:
        f = fov_to_focal(60.0, self.H)
        return np.array([f, f, self.W / 2, self.H / 2], np.float32)

    def project_points(self, pose: np.ndarray, intrinsics: np.ndarray,
                       depth: np.ndarray) -> np.ndarray:
        """Reproject the 3D memory into the current view with screen-bounds
        and depth-occlusion tests (utils.py:1357-1384). Returns [P, 2]."""
        if not self.points_3d:
            return np.zeros((0, 2), np.float32)
        fx, fy, cx, cy = intrinsics
        w2c_R = pose[:3, :3].T
        pts = np.stack(self.points_3d)  # [P, 3]
        cam = (pts - pose[:3, 3]) @ w2c_R.T  # camera frame (OpenGL)
        z = -cam[:, 2]  # positive depth along the view
        valid = z > 1e-6
        x = cam[:, 0] / np.maximum(z, 1e-6) * fx + cx - 0.5
        y = -cam[:, 1] / np.maximum(z, 1e-6) * fy + cy - 0.5
        on_screen = (x >= 0) & (x < self.W) & (y >= 0) & (y < self.H) & valid
        keep = []
        for k in range(len(pts)):
            if not on_screen[k]:
                continue
            d = depth[int(y[k]), int(x[k])]
            if abs(z[k] - d) <= 0.05:  # occlusion test (utils.py:1380)
                keep.append([x[k], y[k]])
        return np.asarray(keep, np.float32).reshape(-1, 2)

    # -- the frame loop -----------------------------------------------------------

    def step(self, pose: np.ndarray, intrinsics: Optional[np.ndarray] = None,
             click: Optional[Tuple[float, float]] = None,
             downscale: int = 1, aabb=None, bg_color: float = 1.0,
             mode: str = "image", key=None) -> FrameResult:
        """One interactive frame: render, (optional) click, reproject,
        segment, overlay (the test_step flow, utils.py:1243-1407).
        `mode`: 'image' or 'depth' (the GUI display-mode radio,
        gui.py:252-258)."""
        intr = (np.asarray(intrinsics, np.float32) if intrinsics is not None
                else self.intrinsics_for(pose))
        rgb, depth = self.render_frame(pose, intr, downscale, aabb=aabb,
                                       bg_color=bg_color, key=key)
        if mode == "depth":
            d = depth / max(float(depth.max()), 1e-6)
            rgb = np.repeat(d[..., None], 3, axis=-1).astype(np.float32)

        if click is not None:
            self.toggle_point(click[0], click[1], pose, depth)

        mask = None
        pts2d = self.project_points(pose, intr, depth)
        if len(pts2d) and self.sam is not None:
            feats = self.render_features(pose, intr)
            self.sam.set_features(feats, self.H, self.W)
            masks, iou, _ = self.sam.predict(
                pts2d, np.ones(len(pts2d), np.int32), multimask_output=False
            )
            mask = masks[0]

        composed = overlay_mask_and_points(rgb, mask, pts2d)
        return FrameResult(rgb=rgb, depth=depth, mask=mask, points_2d=pts2d,
                           composed=composed)


def overlay_mask_and_points(rgb: np.ndarray, mask: Optional[np.ndarray],
                            pts2d: np.ndarray) -> np.ndarray:
    """Blend the mask (utils.py:1396-1399 overlay_mask/overlay_point)."""
    out = rgb.copy()
    if mask is not None:
        color = np.array([0.2, 0.5, 1.0], np.float32)
        out[mask] = 0.5 * out[mask] + 0.5 * color
    for x, y in np.asarray(pts2d).reshape(-1, 2):
        j, i = int(y), int(x)
        out[max(0, j - 2) : j + 3, max(0, i - 2) : i + 3] = [1.0, 0.2, 0.2]
    return out
