"""SamPredictor equivalent: image/feature -> interactive mask prediction.

Mirrors the `SamPredictor` surface the reference uses (SURVEY.md §2.2):
- `set_image(img)`: resize-longest-side to 1024, normalize, pad, run the
  ViT encoder; stores `features` (the distillation ground truth,
  utils.py:1085-1087).
- `set_features(feats, H, W)`: the NeRF-rendered feature injection — the
  "fake set_image" of utils.py:1409-1475: bilinear-resize the rendered
  feature map so its longest side is <=64, zero-pad to 64x64, set predictor
  state with the virtual input size.
- `predict(point_coords, point_labels, multimask_output)`: prompt-encode,
  decode, upsample to the original resolution, threshold at 0.

All device math is jitted with static shapes; the number of prompt points is
padded to a small bucket so repeated clicks reuse one executable.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.models.sam import image_encoder, mask_decoder, prompt_encoder
from sanerf_tpu.models.sam.image_encoder import ViTConfig
from sanerf_tpu.models.sam.mask_decoder import DecoderConfig
from sanerf_tpu.models.sam.prompt_encoder import PromptConfig


@dataclass(frozen=True)
class SamConfig:
    vit: ViTConfig = ViTConfig()  # vit_h default
    prompt: PromptConfig = PromptConfig()
    decoder: DecoderConfig = DecoderConfig()
    mask_threshold: float = 0.0


def init_params(cfg: SamConfig, key) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "image_encoder": image_encoder.init_params(cfg.vit, k1),
        "prompt_encoder": prompt_encoder.init_params(cfg.prompt, k2),
        "mask_decoder": mask_decoder.init_params(cfg.decoder, k3),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_image(cfg: SamConfig, params, x: jax.Array) -> jax.Array:
    """[1, 1024, 1024, 3] normalized -> [1, 64, 64, 256]."""
    return image_encoder.encode(cfg.vit, params["image_encoder"], x)


@functools.partial(jax.jit, static_argnames=("cfg", "multimask_output"))
def decode(
    cfg: SamConfig,
    params,
    features: jax.Array,  # [1, 64, 64, 256]
    point_coords: jax.Array,  # [B, N, 2] input-space (x, y)
    point_labels: jax.Array,  # [B, N]
    multimask_output: bool = False,
):
    pe = params["prompt_encoder"]
    sparse = prompt_encoder.encode_points(pe, cfg.prompt, point_coords, point_labels)
    dense = prompt_encoder.no_mask_dense(pe, cfg.prompt, sparse.shape[0])
    image_pe = prompt_encoder.dense_pe(pe, cfg.prompt)
    feats = jnp.broadcast_to(
        features, (sparse.shape[0],) + tuple(features.shape[1:])
    )
    masks, iou = mask_decoder.predict_masks(
        cfg.decoder, params["mask_decoder"], feats, image_pe, sparse, dense
    )
    return mask_decoder.select_masks(masks, iou, multimask_output)


@functools.partial(
    jax.jit, static_argnames=("cfg", "multimask_output", "feat_hw", "out_hw",
                              "input_hw"),
)
def decode_fused(
    cfg: SamConfig,
    params,
    feats: jax.Array,  # [h, w, 256] rendered feature map (device)
    point_coords: jax.Array,  # [B, N, 2] ORIGINAL-image (x, y)
    point_labels: jax.Array,  # [B, N]
    feat_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
    input_hw: Tuple[int, int],
    multimask_output: bool = False,
):
    """The whole interactive decode as ONE program: feature injection
    (resize<=64 + zero-pad), coord transform, prompt encode, mask decode,
    and upsample-to-original — no intermediate host round-trips. This is the
    latency-critical path of the GUI loop (SURVEY.md §3.3); the step-by-step
    `SamPredictor.predict` costs ~150 ms in dispatch/host transfers that
    this fuses away."""
    grid = cfg.prompt.image_embedding_size[0]
    h, w = feat_hw
    oh, ow = out_hw
    ih, iw = input_hw
    scale = grid / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    f = jax.image.resize(feats, (nh, nw, feats.shape[-1]), "bilinear")
    f = jnp.pad(f, ((0, grid - nh), (0, grid - nw), (0, 0)))[None]

    coords = point_coords * jnp.asarray([iw / ow, ih / oh], jnp.float32)
    masks, iou = decode(cfg, params, f, coords, point_labels, multimask_output)

    target = cfg.vit.img_size
    B, M = masks.shape[:2]
    up = jax.image.resize(masks, (B, M, target, target), "bilinear")
    up = up[:, :, :ih, :iw]
    full = jax.image.resize(up, (B, M, oh, ow), "bilinear")
    return full > cfg.mask_threshold, iou


class SamPredictor:
    """Stateful convenience wrapper (mirrors segment_anything's predictor)."""

    def __init__(self, cfg: SamConfig, params):
        self.cfg = cfg
        self.params = params
        self.reset()

    def reset(self):
        self.features = None
        self.original_size: Optional[Tuple[int, int]] = None
        self.input_size: Optional[Tuple[int, int]] = None

    # -- image / feature state ------------------------------------------------

    def set_image(self, image: np.ndarray):
        """image: [H, W, 3] uint8 RGB."""
        import cv2

        h, w = image.shape[:2]
        target = self.cfg.vit.img_size
        scale = target / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        x = image_encoder.preprocess(jnp.asarray(resized), target)
        self.features = encode_image(self.cfg, self.params, x)
        self.original_size = (h, w)
        self.input_size = (nh, nw)

    def set_features(self, feats: np.ndarray, H: int, W: int):
        """Inject NeRF-rendered features (utils.py:1422-1433).

        feats: [h, w, 256] rendered feature map for an [H, W] frame. Resized
        so the longest side is 64 (matching SAM's 1024-input convention),
        zero-padded to 64x64.
        """
        feats = jnp.asarray(feats)
        h, w = feats.shape[:2]
        grid = self.cfg.prompt.image_embedding_size[0]  # 64
        scale = grid / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        f = jax.image.resize(feats, (nh, nw, feats.shape[-1]), "bilinear")
        f = jnp.pad(f, ((0, grid - nh), (0, grid - nw), (0, 0)))
        self.features = f[None]
        self.original_size = (H, W)
        # virtual input size consistent with the 16x patch stride
        self.input_size = (nh * 16, nw * 16)

    # -- prediction -------------------------------------------------------------

    def transform_coords(self, coords: np.ndarray) -> np.ndarray:
        """Original-image (x, y) pixels -> model input space
        (ResizeLongestSide.apply_coords)."""
        oh, ow = self.original_size
        ih, iw = self.input_size
        out = np.asarray(coords, np.float32).copy()
        out[..., 0] *= iw / ow
        out[..., 1] *= ih / oh
        return out

    def predict(
        self,
        point_coords: np.ndarray,  # [N, 2] original-space (x, y)
        point_labels: np.ndarray,  # [N]
        multimask_output: bool = False,
        return_logits: bool = False,
    ):
        """-> (masks [M, H, W] bool, iou [M], low_res_logits [M, 256, 256])."""
        assert self.features is not None, "call set_image/set_features first"
        coords = self.transform_coords(point_coords)[None]  # [1, N, 2]
        labels = np.asarray(point_labels, np.int32)[None]
        masks, iou = decode(
            self.cfg, self.params, self.features, jnp.asarray(coords),
            jnp.asarray(labels), multimask_output,
        )
        low_res = masks  # [1, M, 256, 256]
        full = self.postprocess(masks)
        out = np.asarray(full[0])
        if not return_logits:
            out = out > self.cfg.mask_threshold
        return out, np.asarray(iou[0]), np.asarray(low_res[0])

    def predict_batch(
        self,
        point_coords: np.ndarray,  # [B, N, 2] original-space (x, y)
        point_labels: Optional[np.ndarray] = None,  # [B, N]
        multimask_output: bool = True,
        chunk: int = 16,
    ):
        """B independent prompts decoded in ONE device call per chunk
        (the reference's `points_per_batch` batching, auto_generator.py:
        242-250 `predict_torch(in_points[:, None, :], ...)` — the round-2
        build decoded grid points one at a time in a Python loop).

        Returns (mask_logits [B, M, H, W] np.float32, iou [B, M] np).
        `chunk` bounds device memory for the 256->H,W upsample chain.
        """
        assert self.features is not None, "call set_image/set_features first"
        coords = self.transform_coords(np.asarray(point_coords, np.float32))
        B, N = coords.shape[:2]
        if point_labels is None:
            point_labels = np.ones((B, N), np.int32)
        out_masks, out_iou = [], []
        for s in range(0, B, chunk):
            c = jnp.asarray(coords[s:s + chunk])
            l = jnp.asarray(np.asarray(point_labels, np.int32)[s:s + chunk])
            masks, iou = decode(self.cfg, self.params, self.features, c, l,
                                multimask_output)
            out_masks.append(np.asarray(self.postprocess(masks)))
            out_iou.append(np.asarray(iou))
        return np.concatenate(out_masks), np.concatenate(out_iou)

    def postprocess(self, masks: jax.Array) -> jax.Array:
        """[B, M, 256, 256] logits -> [B, M, H, W] at the original size:
        upscale to the padded input square, crop the valid region, resize."""
        B, M = masks.shape[:2]
        target = self.cfg.vit.img_size
        up = jax.image.resize(masks, (B, M, target, target), "bilinear")
        ih, iw = self.input_size
        up = up[:, :, :ih, :iw]
        oh, ow = self.original_size
        return jax.image.resize(up, (B, M, oh, ow), "bilinear")
