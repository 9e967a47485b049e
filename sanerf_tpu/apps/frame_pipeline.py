"""The interactive segmentation frame as ONE device program, with a
double-buffered driver.

The reference GUI loop (nerf/gui.py:438-445 + utils.py:1243-1407) runs per
frame: 512^2 staged RGB render -> 32^2 feature render -> SAM prompt decode
-> overlay, each a separate dispatch with host round-trips between. On a
tunneled TPU every dispatch costs ~27 ms of relay RTT; fusing the whole
frame into one jitted program leaves exactly one dispatch and one host
fetch per frame.

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

from sanerf_tpu.models import renderer
from sanerf_tpu.models.fields import NerfModel
from sanerf_tpu.models.sam import SamConfig
from sanerf_tpu.models.sam.predictor import decode_fused


@functools.partial(
    jax.jit,
    static_argnames=("model", "sam_cfg", "hw", "feat_hw", "input_hw",
                     "with_mask_overlay"),
)
def _frame_program(
    model: NerfModel,
    params,
    sam_cfg: Optional[SamConfig],
    sam_params,
    rays_o, rays_d,          # [H*W, 3] full-res
    rays_o_lr, rays_d_lr,    # [h*w, 3] feature-res (ignored without SAM)
    clicks,                  # [1, K, 2] f32 (padded; label -1 = inactive)
    click_labels,            # [1, K] i32
    hw: Tuple[int, int],
    feat_hw: Tuple[int, int],
    input_hw: Tuple[int, int],
    with_mask_overlay: bool,
):
    H, W = hw
    out = renderer.run_rays(model, params, rays_o, rays_d, bg_color=1.0)
    img = out["image"].reshape(H, W, 3)
    mask = None
    if sam_cfg is not None:
        h, w = feat_hw
        feat = renderer.run_rays(model, params, rays_o_lr, rays_d_lr,
                                 return_feats=True)
        fv = feat["samvit"].reshape(h, w, -1)
        masks, _iou = decode_fused(
            sam_cfg, sam_params, fv, clicks, click_labels,
            feat_hw=feat_hw, out_hw=hw, input_hw=input_hw,
        )
        mask = masks[0, 0] > 0.0  # [H, W] bool
        # no-active-click frames render without a mask
        any_click = jnp.any(click_labels >= 0)
        mask = jnp.logical_and(mask, any_click)
        if with_mask_overlay:
            overlay = jnp.asarray([0.2, 0.45, 0.9], jnp.float32)
            img = jnp.where(mask[..., None], 0.5 * img + 0.5 * overlay, img)
    u8 = (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    depth = out["depth"].reshape(H, W)
    return u8, depth, mask


class FramePipeline:
    """Double-buffered interactive frame driver.

    pipeline = FramePipeline(model, params, sam_cfg, sam_params, H, W, h, w)
    u8, depth, mask = pipeline.render(ro, rd, ro_lr, rd_lr, clicks, labels)

    `render` dispatches the new frame, then fetches the PREVIOUS frame's
    pixels — one frame of latency for ~2x throughput through a relay.
    `render_sync` fetches the same frame (no added latency) for callers
    that need it.
    """

    def __init__(self, model, params, sam_cfg, sam_params, H, W, h=32, w=32,
                 max_clicks: int = 8, overlay: bool = True):
        self.model = model
        self.params = params
        self.sam_cfg = sam_cfg
        self.sam_params = sam_params
        self.hw = (H, W)
        self.feat_hw = (h, w)
        nh = int(round(max(h, w) * 64 / max(h, w))) * 16
        self.input_hw = (nh, nh)
        self.max_clicks = max_clicks
        self.overlay = overlay
        self._pending = None

    def _pad_clicks(self, clicks, labels):
        k = self.max_clicks
        c = np.zeros((1, k, 2), np.float32)
        l = np.full((1, k), -1, np.int32)
        n = 0 if clicks is None else min(len(clicks), k)
        if n:
            c[0, :n] = np.asarray(clicks, np.float32)[:n]
            l[0, :n] = np.asarray(labels, np.int32)[:n]
        return jnp.asarray(c), jnp.asarray(l)

    def _dispatch(self, ro, rd, ro_lr, rd_lr, clicks, labels):
        c, l = self._pad_clicks(clicks, labels)
        return _frame_program(
            self.model, self.params, self.sam_cfg, self.sam_params,
            ro, rd, ro_lr, rd_lr, c, l,
            self.hw, self.feat_hw, self.input_hw, self.overlay,
        )

    @staticmethod
    def _fetch(frame):
        """Fetch ONLY the display pixels; depth/mask stay on-device.

        Host transfers serialize with device compute through the relay
        (profiled: fetching depth f32 + mask alongside the uint8 frame cost
        ~50 ms/frame — the u8-only fetch runs at device speed). Depth is
        needed on the host only when a click lifts to 3D, the mask only for
        export — callers np.asarray() those lazily."""
        u8, depth, mask = frame
        return np.asarray(u8), depth, mask

    def render(self, ro, rd, ro_lr=None, rd_lr=None, clicks=None, labels=None):
        """Pipelined: dispatch this frame, return the previous one (or this
        one on the first call)."""
        new = self._dispatch(ro, rd, ro_lr, rd_lr, clicks, labels)
        prev, self._pending = self._pending, new
        return self._fetch(prev if prev is not None else new)

    def render_sync(self, ro, rd, ro_lr=None, rd_lr=None, clicks=None,
                    labels=None):
        self._pending = None
        return self._fetch(
            self._dispatch(ro, rd, ro_lr, rd_lr, clicks, labels))

    def flush(self):
        if self._pending is not None:
            out = self._fetch(self._pending)
            self._pending = None
            return out
        return None
