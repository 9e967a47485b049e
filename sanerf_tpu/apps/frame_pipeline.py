"""The interactive segmentation frame as ONE device program, with a
double-buffered driver. This IS the product path: `InteractiveSession`
(apps/interactive.py), the GUI viewer, and bench.py all drive frames
through `FramePipeline` — the benched loop and the user-visible loop are
the same code (the reference's GUI loop is its product, nerf/gui.py:438-445).

The reference runs per frame: 512^2 staged RGB render -> 32^2 feature
render -> 3D-point reprojection + occlusion test (host) -> SAM prompt
decode -> overlay (utils.py:1243-1407), each a separate dispatch with host
round-trips between. On a tunneled TPU every dispatch costs ~27 ms of
relay RTT; here the WHOLE frame — ray generation from the pose, RGB +
feature renders, reprojection/occlusion of the persistent 3D click memory,
the SAM decode, spp accumulation, display-mode transform, and mask/point
overlays — is one jitted program. Per frame the host uploads a pose
(64 B) and fetches uint8 pixels; everything else stays on device.

`FramePipeline` additionally double-buffers: frame N+1 is dispatched
before frame N's pixels are fetched, so device compute and the host
fetch/display overlap — the steady-state frame time approaches
max(device_time, fetch_time) instead of their sum.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sanerf_tpu.data.rays import full_frame_rays
from sanerf_tpu.models import renderer
from sanerf_tpu.models.fields import NerfModel
from sanerf_tpu.models.sam import SamConfig
from sanerf_tpu.models.sam.predictor import decode_fused

#: occlusion tolerance for reprojected 3D points (utils.py:1380)
OCCLUSION_EPS = 0.05


def _rgb_to_yuv420(disp):
    """[H, W, 3] f32 display (0..1) -> (Y [H, W] u8, CbCr [H/2, W/2, 2] u8),
    BT.601 LIMITED range (Y 16-235) with 2x2 mean chroma subsampling — the
    standard remote-display/video transport, and exactly the I420
    convention OpenCV decodes, so the host-side inverse is one
    `cv2.cvtColor` (~0.2 ms at 512^2 vs ~9 ms for the numpy math). Halves
    the per-frame fetch bytes (3 B/px -> 1.5 B/px), which through the TPU
    relay is the same order as the frame's device compute."""
    rgb = jnp.clip(disp, 0.0, 1.0) * 255.0
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 16.0 + 0.256788 * r + 0.504129 * g + 0.097906 * b
    cb = 128.0 - 0.148223 * r - 0.290993 * g + 0.439216 * b
    cr = 128.0 + 0.439216 * r - 0.367788 * g - 0.071427 * b
    H, W = y.shape
    cbcr = jnp.stack([cb, cr], axis=-1)
    cbcr = cbcr.reshape(H // 2, 2, W // 2, 2, 2).mean(axis=(1, 3))
    to_u8 = lambda a: jnp.clip(jnp.round(a), 0.0, 255.0).astype(jnp.uint8)
    return to_u8(y), to_u8(cbcr)


def yuv420_to_rgb8(y: np.ndarray, cbcr: np.ndarray) -> np.ndarray:
    """Host-side inverse of `_rgb_to_yuv420`: (Y [H, W] u8,
    CbCr [H/2, W/2, 2] u8) -> [H, W, 3] u8. Fast path: assemble the planar
    I420 buffer (the planes are already its exact bytes) and let
    `cv2.cvtColor` do the SIMD limited-range BT.601 decode; numpy fallback
    (nearest-neighbor chroma upsample) where cv2 is absent or the
    resolution doesn't tile I420 rows."""
    H, W = y.shape
    if H % 4 == 0 and W % 2 == 0:
        try:
            import cv2

            buf = np.empty((H * 3 // 2, W), np.uint8)
            buf[:H] = y
            buf[H : H + H // 4] = cbcr[..., 0].reshape(H // 4, W)
            buf[H + H // 4 :] = cbcr[..., 1].reshape(H // 4, W)
            return cv2.cvtColor(buf, cv2.COLOR_YUV2RGB_I420)
        except ImportError:
            pass
    yf = 1.164383 * (y.astype(np.float32) - 16.0)
    cb = (cbcr[..., 0].astype(np.float32) - 128.0).repeat(2, 0).repeat(2, 1)
    cr = (cbcr[..., 1].astype(np.float32) - 128.0).repeat(2, 0).repeat(2, 1)
    r = yf + 1.596027 * cr
    g = yf - 0.391762 * cb - 0.812968 * cr
    b = yf + 2.017232 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _pack_display(disp, pts2d, valid, W: int):
    """Device-side packing of EVERYTHING the host needs per frame into ONE
    u8 buffer: the I420 planes (rows 0..3H/2 — byte-exact cv2 input) plus
    trailing metadata rows carrying the reprojected prompt points (f32
    bitcast to bytes) and their validity. Through the TPU relay every
    fetched array is its own RPC with full round-trip latency; the packed
    buffer makes the steady-state frame exactly one upload + one dispatch
    + one fetch."""
    y, cbcr = _rgb_to_yuv420(disp)
    H = y.shape[0]
    cb = cbcr[..., 0].reshape(H // 4, W)
    cr = cbcr[..., 1].reshape(H // 4, W)
    pb = jax.lax.bitcast_convert_type(
        pts2d.astype(jnp.float32), jnp.uint8).reshape(-1)  # [K*8]
    vb = valid.astype(jnp.uint8)  # [K]
    n = pb.size + vb.size
    rows = -(-n // W)
    meta = jnp.concatenate(
        [pb, vb, jnp.zeros((rows * W - n,), jnp.uint8)]).reshape(rows, W)
    return jnp.concatenate([y, cb, cr, meta], axis=0)


def unpack_display(buf: np.ndarray, H: int, W: int, K: int):
    """Host-side inverse of `_pack_display`:
    -> (rgb u8 [H, W, 3], pts2d f32 [K, 2], valid bool [K])."""
    q = H // 4
    meta = np.ascontiguousarray(buf[H + 2 * q :]).reshape(-1)[: K * 8 + K]
    pts2d = np.frombuffer(
        meta[: K * 8].tobytes(), np.float32).reshape(K, 2).copy()
    valid = meta[K * 8 :] > 0
    try:
        import cv2

        rgb = cv2.cvtColor(np.ascontiguousarray(buf[: H * 3 // 2]),
                           cv2.COLOR_YUV2RGB_I420)
    except ImportError:
        cbcr = np.stack([buf[H : H + q].reshape(H // 2, W // 2),
                         buf[H + q : H + 2 * q].reshape(H // 2, W // 2)], -1)
        rgb = yuv420_to_rgb8(buf[:H], cbcr)
    return rgb, pts2d, valid


def project_points_device(points3d, active, pose, intr, depth, H, W):
    """Reproject the 3D click memory through the current camera with
    screen-bounds + depth-occlusion tests, all on device
    (utils.py:1357-1384 done as [K]-vector math instead of a host loop).

    Returns (pts2d [K, 2] (x, y), valid [K] bool)."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    R, t = pose[:3, :3], pose[:3, 3]
    cam = (points3d - t) @ R  # w2c applied to row vectors
    z = -cam[:, 2]  # positive depth along the view (OpenGL)
    safe_z = jnp.maximum(z, 1e-6)
    x = cam[:, 0] / safe_z * fx + cx - 0.5
    y = -cam[:, 1] / safe_z * fy + cy - 0.5
    on_screen = (z > 1e-6) & (x >= 0) & (x < W) & (y >= 0) & (y < H)
    ix = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
    iy = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
    d = depth[iy, ix]  # K tiny gathers
    valid = on_screen & (jnp.abs(z - d) <= OCCLUSION_EPS) & (active > 0)
    return jnp.stack([x, y], axis=-1), valid


@functools.lru_cache(maxsize=None)
def _shard_render(model: NerfModel, mesh: Mesh, axis: str,
                  return_feats: bool, perturb: bool):
    """shard_map'd `run_rays` for the interactive frame: rays split over
    the mesh's chips (the scaling-book recipe — annotate the batch axis,
    let the compiler keep everything else local), params/aabb/bg
    replicated, per-ray outputs concatenated back on the ray axis. The
    stratified-jitter key is folded with the chip index so sharded spp
    frames stay decorrelated across shards."""

    def fn(params, ro, rd, key, bg, aabb):
        k = jax.random.fold_in(key, jax.lax.axis_index(axis)) \
            if perturb else None
        out = renderer.run_rays(model, params, ro, rd, k, perturb=perturb,
                                bg_color=bg, aabb=aabb,
                                return_feats=return_feats)
        keep = ("samvit",) if return_feats else ("image", "depth")
        return {n: out[n] for n in keep}

    out_spec = {n: P(axis)
                for n in (("samvit",) if return_feats else ("image", "depth"))}
    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(), P()),
        out_specs=out_spec, check_vma=False)


@functools.partial(
    jax.jit,
    static_argnames=("model", "sam_cfg", "hw", "feat_hw", "input_hw",
                     "mode", "perturb", "with_overlay", "mesh", "mesh_axis",
                     "fetch_format", "use_aabb"),
    donate_argnames=("acc",),
)
def _frame_program(
    model: NerfModel,
    params,
    sam_cfg: Optional[SamConfig],
    sam_params,
    packed,          # [28 + 4K] f32: every small per-frame input in ONE
                     # upload — pose(16) | intr(4) | points3d(3K) |
                     # active(K) | aabb(6) | bg(1) | spp(1). Through the
                     # TPU relay each host->device transfer is its own
                     # RPC; packing turns ~7 per-frame uploads into 1.
    acc,             # [H, W, 3] f32 running sum of raw frames (spp)
    key,             # PRNG key (used when perturb)
    hw: Tuple[int, int],
    feat_hw: Tuple[int, int],
    input_hw: Tuple[int, int],
    mode: str,             # 'image' | 'depth'
    perturb: bool,
    with_overlay: bool,
    use_aabb: bool = False,
    mesh: Optional[Mesh] = None,
    mesh_axis: str = "data",
    fetch_format: str = "rgb8",   # 'rgb8' | 'yuv420' display transport
):
    H, W = hw
    K = (packed.shape[0] - 28) // 4
    pose = packed[:16].reshape(4, 4)
    intr = packed[16:20]
    points3d = packed[20 : 20 + 3 * K].reshape(K, 3)
    points_active = packed[20 + 3 * K : 20 + 4 * K]
    aabb = packed[20 + 4 * K : 26 + 4 * K] if use_aabb else None
    bg_color = packed[26 + 4 * K]
    spp = packed[27 + 4 * K]
    rays_o, rays_d = full_frame_rays(pose, intr, H, W)
    if mesh is None:
        out = renderer.run_rays(
            model, params, rays_o, rays_d, key if perturb else None,
            perturb=perturb, bg_color=bg_color, aabb=aabb)
        img, depth = out["image"], out["depth"]
    else:
        # multi-chip interactive rendering: the frame's rays shard over
        # the mesh inside this one program; everything downstream (spp,
        # reprojection, SAM decode, overlays) stays in the same jit and
        # GSPMD keeps it row-sharded
        out = _shard_render(model, mesh, mesh_axis, False, perturb)(
            params, rays_o, rays_d,
            key if key is not None else jax.random.key(0),
            jnp.asarray(bg_color, jnp.float32),
            aabb if aabb is not None else renderer.default_aabb(model))
        img, depth = out["image"], out["depth"]
    img = img.reshape(H, W, 3)
    depth = depth.reshape(H, W)

    # spp accumulation on-device (gui.py:185-190): acc holds the SUM of raw
    # frames; spp==0 restarts without uploading a zero buffer
    live = (spp > 0).astype(jnp.float32)
    acc_new = acc * live + img
    disp = acc_new / (spp + 1).astype(jnp.float32)

    # 3D click memory -> 2D prompts (device-side reprojection + occlusion)
    pts2d, valid = project_points_device(
        points3d, points_active, pose, intr, depth, H, W)

    mask = None
    if sam_cfg is not None:
        h, w = feat_hw
        # feature intrinsics derive from the render intrinsics; the ratio
        # h/H makes this downscale-invariant (fx_ds * h/H_ds == fx_full*h/H)
        intr_lr = jnp.asarray(
            [intr[0] * h / H, intr[1] * w / W, w / 2.0, h / 2.0], jnp.float32)
        ro_lr, rd_lr = full_frame_rays(pose, intr_lr, h, w)
        if mesh is None:
            feat = renderer.run_rays(model, params, ro_lr, rd_lr,
                                     return_feats=True, aabb=aabb)
        else:
            feat = _shard_render(model, mesh, mesh_axis, True, False)(
                params, ro_lr, rd_lr, jax.random.key(0),
                jnp.asarray(1.0, jnp.float32),
                aabb if aabb is not None else renderer.default_aabb(model))
        fv = feat["samvit"].reshape(h, w, -1)
        labels = jnp.where(valid, 1, -1).astype(jnp.int32)[None]  # [1, K]
        masks, _iou = decode_fused(
            sam_cfg, sam_params, fv, pts2d[None], labels,
            feat_hw=feat_hw, out_hw=hw, input_hw=input_hw,
        )
        mask = jnp.logical_and(masks[0, 0] > 0.0, jnp.any(valid))

    if mode == "depth":
        # grayscale depth display (gui.py:252-258 display-mode radio)
        dnorm = depth / jnp.maximum(jnp.max(depth), 1e-6)
        disp = jnp.repeat(dnorm[..., None], 3, axis=-1)

    if with_overlay:
        if mask is not None:
            overlay = jnp.asarray([0.2, 0.45, 0.9], jnp.float32)
            disp = jnp.where(mask[..., None], 0.5 * disp + 0.5 * overlay, disp)
        # red click markers (5x5), drawn on device (the host never needs
        # the projected points except on a click)
        ii = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        jj = jnp.arange(H, dtype=jnp.float32)[None, :, None]
        px = pts2d[:, 0][:, None, None]
        py = pts2d[:, 1][:, None, None]
        marker = jnp.any(
            (jnp.abs(ii - px) <= 2) & (jnp.abs(jj - py) <= 2)
            & valid[:, None, None], axis=0)
        disp = jnp.where(marker[..., None],
                         jnp.asarray([1.0, 0.2, 0.2], jnp.float32), disp)

    if fetch_format == "yuv420":
        # half the fetch bytes AND one buffer: I420 planes + pts2d/valid
        # metadata rows, so the whole frame is a single device->host copy
        pix = _pack_display(disp, pts2d, valid, W)
    else:
        pix = (jnp.clip(disp, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return pix, depth, mask, acc_new, pts2d, valid


class FramePipeline:
    """Double-buffered interactive frame driver over `_frame_program`.

    pipeline = FramePipeline(model, params, sam_cfg, sam_params, H, W, h, w)
    frame = pipeline.render(pose, intr, points3d, active, ...)

    `render` dispatches the new frame, then fetches the PREVIOUS frame's
    pixels — one frame of latency for ~2x throughput through a relay.
    `render_sync` fetches the same frame (no added latency) for callers
    that need it. Both return
    (u8 [H, W, 3] np, depth (device), mask (device|None),
     pts2d (device [K, 2]), valid (device [K])).
    """

    def __init__(self, model, params, sam_cfg, sam_params, H, W, h=32, w=32,
                 max_points: int = 8, overlay: bool = True,
                 mesh: Optional[Mesh] = None, mesh_axis: str = "data",
                 fetch_format: str = "rgb8", depth: int = 2):
        self.model = model
        self.params = params
        self.sam_cfg = sam_cfg
        self.sam_params = sam_params
        self.hw = (H, W)
        self.feat_hw = (h, w)
        if mesh is not None:
            n = int(mesh.devices.size)
            if H * W % n or h * w % n:
                raise ValueError(
                    f"frame {H}x{W} / feature {h}x{w} ray counts must divide "
                    f"the {n}-device mesh")
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        grid = 64 if sam_cfg is None else sam_cfg.prompt.image_embedding_size[0]
        scale = grid / max(h, w)
        self.input_hw = (int(round(h * scale)) * 16, int(round(w * scale)) * 16)
        self.max_points = max_points
        self.overlay = overlay
        # the packed 4:2:0 buffer needs I420-tileable dims (H % 4, W % 2);
        # odd sizes (adaptive downscale) fall back to exact rgb8
        self.fetch_format = (fetch_format
                             if fetch_format == "rgb8" or (H % 4 == 0 and W % 2 == 0)
                             else "rgb8")
        # pipeline depth: how many dispatched-but-unfetched frames ride in
        # flight. depth=1 is classic double buffering (fetch N-1 at
        # dispatch N); the default depth=2 (triple buffering) fetches N-2,
        # giving the async device->host copy a FULL frame time to cross
        # the TPU relay before anyone blocks on it — measured on the
        # tunneled v5e: a blocking 512^2 fetch costs ~34 ms of RTT, of
        # which depth=1 still exposes ~14 ms/frame; at depth=2 the copy is
        # already host-cached and the fetch is free. On the pipelined path
        # the DISPLAYED frame is `depth` frames old; `last_pose` carries
        # the pose that frame was rendered from so click lifts use the
        # camera the user is actually looking through (render_sync frames
        # are exact by construction).
        self.depth = max(1, int(depth))
        # oldest-first in-flight frames: [device_tuple, fetched|None, pose]
        self._pending = []
        self._acc = jnp.zeros((H, W, 3), jnp.float32)
        self.dispatch_count = 0  # tests assert one dispatch per frame
        self.last_pose = None  # pose of the frame `render`/`render_sync`
        #                        last RETURNED (== what the user sees)

    def pad_points(self, points3d, active_count=None):
        """Host 3D point list -> padded host arrays ([K, 3] f32, [K] i32).
        (Host-side: the values ride the packed per-frame upload.)"""
        k = self.max_points
        p = np.zeros((k, 3), np.float32)
        a = np.zeros((k,), np.int32)
        n = 0 if points3d is None else min(len(points3d), k)
        if n:
            p[:n] = np.asarray(points3d, np.float32)[:n]
            a[:n] = 1
        return p, a

    def _dispatch(self, pose, intr, points3d, active, aabb, bg_color, spp,
                  key, mode, perturb):
        self.dispatch_count += 1
        K = self.max_points
        packed = np.zeros((28 + 4 * K,), np.float32)
        packed[:16] = np.asarray(pose, np.float32).reshape(-1)
        packed[16:20] = np.asarray(intr, np.float32)
        if points3d is not None:
            packed[20 : 20 + 3 * K] = np.asarray(
                points3d, np.float32).reshape(-1)
        if active is not None:
            packed[20 + 3 * K : 20 + 4 * K] = np.asarray(active, np.float32)
        if aabb is not None:
            packed[20 + 4 * K : 26 + 4 * K] = np.asarray(aabb, np.float32)
        packed[26 + 4 * K] = bg_color
        packed[27 + 4 * K] = spp
        pix, depth, mask, self._acc, pts2d, valid = _frame_program(
            self.model, self.params, self.sam_cfg, self.sam_params,
            packed, self._acc, key,
            hw=self.hw, feat_hw=self.feat_hw, input_hw=self.input_hw,
            mode=mode, perturb=perturb, with_overlay=self.overlay,
            use_aabb=aabb is not None,
            mesh=self.mesh, mesh_axis=self.mesh_axis,
            fetch_format=self.fetch_format,
        )
        return pix, depth, mask, pts2d, valid

    def _start_fetch(self, frame):
        """Queue the async device->host copy of the display outputs NOW —
        i.e. immediately after the frame's own program in the device
        stream. Transfers serialize with compute through the relay, so a
        copy queued after the NEXT frame's dispatch would wait out that
        frame's entire device time (profiled: +46 ms/frame at 512^2);
        queued here it completes the moment its producer does.

        The yuv420 transport queues exactly ONE copy (the packed buffer
        carries pixels + pts2d + valid); rgb8 additionally queues the tiny
        point arrays."""
        pix, depth, mask, pts2d, valid = frame
        arrs = ((pix,) if self.fetch_format == "yuv420"
                else (pix, pts2d, valid))
        for a in arrs:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass

    def _fetch(self, frame):
        """Materialize ONLY the display pixels; everything else stays
        on-device.

        (Fetching depth f32 + mask alongside the uint8 frame profiled at
        ~50 ms/frame through the relay — the u8-only fetch runs at device
        speed.) Depth is needed on the host only when a click lifts to 3D,
        the mask only for export — callers np.asarray() those lazily.

        yuv420 frames decode back to RGB u8 here (and their pts2d/valid
        come out of the packed buffer as host arrays), so callers always
        see the same API regardless of the transport."""
        pix, depth, mask, pts2d, valid = frame
        if self.fetch_format == "yuv420":
            H, W = self.hw
            u8, pts2d, valid = unpack_display(
                np.asarray(pix), H, W, self.max_points)
        else:
            u8 = np.asarray(pix)
        return u8, depth, mask, pts2d, valid

    def _fetch_entry(self, entry):
        """Fetch an in-flight entry's host tuple once; repeat returns reuse
        the memo (the fill path returns the same oldest frame up to `depth`
        times — without the memo each repeat would pay the np.asarray copy
        and yuv420 unpack again)."""
        if entry[1] is None:
            entry[1] = self._fetch(entry[0])
        self.last_pose = entry[2]
        return entry[1]

    def render(self, pose, intr, points3d=None, active=None, aabb=None,
               bg_color=1.0, spp=0, key=None, mode="image", perturb=False):
        """Pipelined: dispatch this frame, return the OLDEST in-flight one.
        During pipeline fill the oldest frame repeats (f1, f1, f2, ...) so
        the displayed sequence stays monotonic — never jumps backwards."""
        new = self._dispatch(pose, intr, points3d, active, aabb, bg_color,
                             spp, key, mode, perturb)
        self._start_fetch(new)
        self._pending.append([new, None, np.asarray(pose, np.float32).copy()])
        if len(self._pending) > self.depth:
            return self._fetch_entry(self._pending.pop(0))
        return self._fetch_entry(self._pending[0])

    def render_sync(self, pose, intr, points3d=None, active=None, aabb=None,
                    bg_color=1.0, spp=0, key=None, mode="image",
                    perturb=False):
        self._pending = []
        new = self._dispatch(pose, intr, points3d, active, aabb, bg_color,
                             spp, key, mode, perturb)
        self._start_fetch(new)
        return self._fetch_entry(
            [new, None, np.asarray(pose, np.float32).copy()])

    def flush(self):
        if self._pending:
            out = self._fetch_entry(self._pending[-1])
            self._pending = []
            return out
        return None
