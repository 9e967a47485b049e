"""Interactive 3D segmentation session: the north-star loop.

Rebuild of the reference's interactive path (SURVEY.md §3.3,
utils.py:1243-1475 + gui.py state). Per frame,

1. the persistent 3D click memory reprojects through the current camera
   (w2c pinhole with the x-flip, utils.py:1357-1366) with screen-bounds
   and depth-occlusion tests (|z - depth| <= 0.05, utils.py:1368-1384);
2. surviving 2D points prompt the SAM decoder on the low-res rendered
   feature map (the fake-set_image injection, utils.py:1409-1475);
3. the mask + point markers overlay the RGB frame.

All of that runs inside ONE device program per frame
(`apps/frame_pipeline.py:_frame_program`), double-buffered — the host
uploads a pose and fetches uint8 pixels. Host-side state is only the 3D
point list itself: a click lifts the pixel to 3D through the previous
frame's depth (fetched lazily, p = o + d * depth) and toggles against the
list (utils.py:1318-1345).

Headless by design: the GUI (apps/gui.py) is a thin view over this
session, so the same loop runs in tests, benchmarks, and the window.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import numpy as np

from sanerf_tpu.config import Config
from sanerf_tpu.apps.frame_pipeline import FramePipeline
from sanerf_tpu.models.fields import NerfModel, Params
from sanerf_tpu.utils.camera import fov_to_focal


@dataclass
class FrameResult:
    rgb_u8: np.ndarray  # [H, W, 3] u8 display image (mode + overlays applied)
    depth: np.ndarray  # [H/ds, W/ds] DEVICE array — np.asarray() lazily
    mask: Optional[np.ndarray] = None  # [H/ds, W/ds] bool DEVICE array
    points_2d: Optional[np.ndarray] = None  # [P, 2] full-res (x, y), host
    _rgb_f32: Optional[np.ndarray] = None

    @property
    def rgb(self) -> np.ndarray:
        """[H, W, 3] f32 display image, converted from the u8 frame on
        first access (the conversion costs ~4 ms/frame at 512^2 — paid
        only by consumers that want floats, not by the frame loop)."""
        if self._rgb_f32 is None:
            self._rgb_f32 = self.rgb_u8.astype(np.float32) / 255.0
        return self._rgb_f32

    @property
    def composed(self) -> np.ndarray:  # alias of rgb (overlay included)
        return self.rgb


class InteractiveSession:
    def __init__(self, cfg: Config, model: NerfModel, params: Params,
                 sam_predictor=None, H: int = 512, W: int = 512, mesh=None,
                 fetch_format: str = "yuv420"):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.sam = sam_predictor
        self.mesh = mesh  # optional jax.sharding.Mesh: frames render sharded
        # display transport: 'yuv420' (default) halves the per-frame fetch
        # bytes via BT.601 4:2:0 — the standard remote-display encoding;
        # through the TPU relay the pixel fetch is the same order as the
        # frame's device compute. 'rgb8' fetches exact pixels.
        self.fetch_format = fetch_format
        self.H, self.W = H, W
        # low-res feature map size: 64 per 1024 of render res (utils.py:1094)
        self.h = max(4, int(H / 1024 * 64))
        self.w = max(4, int(W / 1024 * 64))
        self.points_3d: List[np.ndarray] = []  # persistent click memory
        self._pipes = {}  # (H, W) -> FramePipeline (one per downscale)
        # depth + pose of the frame the user is LOOKING AT (on the
        # pipelined path that frame is `depth` dispatches old — a click on
        # it must lift through its own camera, not the current one)
        self._last_depth = None
        self._last_pose = None
        self._last_ds = 1

    @property
    def dispatch_count(self) -> int:
        return sum(p.dispatch_count for p in self._pipes.values())

    def _pipe(self, Hs: int, Ws: int) -> FramePipeline:
        pipe = self._pipes.get((Hs, Ws))
        if pipe is None:
            sam_cfg = None if self.sam is None else self.sam.cfg
            sam_params = None if self.sam is None else self.sam.params
            pipe = FramePipeline(self.model, self.params, sam_cfg, sam_params,
                                 Hs, Ws, self.h, self.w, mesh=self.mesh,
                                 fetch_format=self.fetch_format)
            self._pipes[(Hs, Ws)] = pipe
        pipe.params = self.params  # live-training updates flow through
        return pipe

    # -- 3D point memory ---------------------------------------------------------

    def toggle_point(self, px: float, py: float, pose: np.ndarray,
                     depth: np.ndarray, pixel_radius: float = 8.0,
                     depth_scale: int = 1):
        """Click at pixel (px, py): lift to 3D and toggle (utils.py:1318-1345).

        `depth` may be at a downscaled resolution (`depth_scale`); the lift
        uses full-res intrinsics so the 3D point is scale-invariant.
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
        depth = np.asarray(depth)
        j = int(np.clip(py / depth_scale, 0, depth.shape[0] - 1))
        i = int(np.clip(px / depth_scale, 0, depth.shape[1] - 1))
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

    # -- the frame loop -----------------------------------------------------------

    def step(self, pose: np.ndarray, intrinsics: Optional[np.ndarray] = None,
             click: Optional[Tuple[float, float]] = None,
             downscale: int = 1, aabb=None, bg_color: float = 1.0,
             mode: str = "image", key=None, spp: int = 0,
             pipelined: bool = True) -> FrameResult:
        """One interactive frame = ONE device dispatch (the test_step flow,
        utils.py:1243-1407, fused into `_frame_program`).

        `mode`: 'image' or 'depth' (the GUI display-mode radio,
        gui.py:252-258). `key` enables perturbed sampling; `spp` is the
        number of frames already accumulated on device (0 restarts).
        `pipelined=False` fetches the frame it dispatches (no latency
        pipelining) — used when the caller needs this exact frame.
        """
        intr = (np.asarray(intrinsics, np.float32) if intrinsics is not None
                else self.intrinsics_for(pose))
        ds = max(1, int(downscale))
        Hs, Ws = max(1, self.H // ds), max(1, self.W // ds)
        intr_ds = intr / ds
        pipe = self._pipe(Hs, Ws)

        if click is not None:
            # lift through the DISPLAYED frame's depth + pose (the user
            # clicked on that frame; under pipelining it is `depth`
            # dispatches old and its camera may differ from the current
            # one). First click with no frame yet renders one synchronously.
            if (self._last_depth is None
                    or self._last_depth.shape != (Hs, Ws)):
                p3, act = pipe.pad_points(self.points_3d)
                out = pipe.render_sync(pose, intr_ds, p3, act, aabb=aabb,
                                       bg_color=bg_color, mode=mode)
                self._last_depth = out[1]
                self._last_pose = pipe.last_pose
            self.toggle_point(click[0], click[1],
                              np.asarray(self._last_pose, np.float32),
                              np.asarray(self._last_depth),
                              depth_scale=ds)

        p3, act = pipe.pad_points(self.points_3d)
        # click frames fetch synchronously: the double-buffered previous
        # frame predates the toggle, and a click deserves immediate feedback
        render = (pipe.render if pipelined and click is None
                  else pipe.render_sync)
        u8, depth_dev, mask_dev, pts2d_dev, valid_dev = render(
            pose, intr_ds, p3, act, aabb=aabb, bg_color=bg_color,
            spp=spp, key=key, mode=mode, perturb=key is not None)
        # the returned tuple (incl. depth) belongs to the DISPLAYED frame;
        # pipe.last_pose is that frame's camera
        self._last_depth = depth_dev
        self._last_pose = pipe.last_pose
        self._last_ds = ds

        if ds > 1:
            import cv2

            u8 = cv2.resize(u8, (self.W, self.H),
                            interpolation=cv2.INTER_LINEAR)

        pts2d = np.zeros((0, 2), np.float32)
        mask = None
        if self.points_3d:
            valid = np.asarray(valid_dev).astype(bool)
            pts2d = np.asarray(pts2d_dev)[valid] * ds  # full-res coords
            mask = mask_dev  # device array; np.asarray() on demand
        return FrameResult(rgb_u8=u8, depth=depth_dev, mask=mask,
                           points_2d=pts2d)


def overlay_mask_and_points(rgb: np.ndarray, mask: Optional[np.ndarray],
                            pts2d: np.ndarray) -> np.ndarray:
    """Host-side overlay (utils.py:1396-1399) — kept for offline tools;
    the interactive path draws overlays inside `_frame_program`."""
    out = rgb.copy()
    if mask is not None:
        color = np.array([0.2, 0.5, 1.0], np.float32)
        out[np.asarray(mask)] = 0.5 * out[np.asarray(mask)] + 0.5 * color
    for x, y in np.asarray(pts2d).reshape(-1, 2):
        j, i = int(y), int(x)
        out[max(0, j - 2) : j + 3, max(0, i - 2) : i + 3] = [1.0, 0.2, 0.2]
    return out
