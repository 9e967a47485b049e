"""Automatic mask generation: dense grid prompts -> NMS -> RLE masks.

Rebuild of the reference's vendored `SamAutomaticMaskGenerator`
(auto_generator.py / debug.py): prompt SAM with a regular point grid,
filter by predicted IoU and stability, de-duplicate with box NMS, and
return RLE-encoded masks. The `precomputed_features` path (debug.py's
`Auto_Generator._process_crop`, debug.py:139-157) accepts NeRF-rendered
feature maps instead of running the ViT encoder.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """[n^2, 2] evenly spaced points in [0,1]^2."""
    offset = 1.0 / (2 * n_per_side)
    ticks = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(ticks, ticks)
    return np.stack([gx.ravel(), gy.ravel()], -1)


def mask_to_rle(mask: np.ndarray) -> Dict:
    """Binary mask -> uncompressed RLE (column-major, SAM convention)."""
    flat = np.asarray(mask, bool).T.ravel()
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(idx).tolist()
    if flat[0]:
        counts = [0] + counts
    return {"size": list(mask.shape), "counts": counts}


def rle_to_mask(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    out = np.zeros(h * w, bool)
    pos, val = 0, False
    for c in rle["counts"]:
        out[pos : pos + c] = val
        pos += c
        val = not val
    return out.reshape(w, h).T


def mask_stability_score(logits: np.ndarray, threshold: float,
                         offset: float = 1.0) -> float:
    """IoU between masks thresholded at +/- offset around the cutoff."""
    hi = np.sum(logits > threshold + offset)
    lo = np.sum(logits > threshold - offset)
    return float(hi / lo) if lo else 0.0


def box_from_mask(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.zeros(4)
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float64)


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.7) -> List[int]:
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a + b - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return keep


class AutomaticMaskGenerator:
    """Grid-prompted dense segmentation over an image or a precomputed
    (NeRF-rendered) feature map."""

    def __init__(
        self,
        predictor,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        box_nms_thresh: float = 0.7,
        min_mask_region_area: int = 0,
    ):
        self.predictor = predictor
        self.point_grid = build_point_grid(points_per_side)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area

    def generate(self, image: Optional[np.ndarray] = None,
                 features: Optional[np.ndarray] = None,
                 hw: Optional[tuple] = None) -> List[Dict]:
        """image: uint8 [H, W, 3]; OR features [h, w, 256] + hw=(H, W)
        (the debug.py precomputed-features path)."""
        if features is not None:
            H, W = hw
            self.predictor.set_features(features, H, W)
        else:
            H, W = image.shape[:2]
            self.predictor.set_image(image)

        coords = self.point_grid * np.array([W, H])
        records = []
        for start in range(0, len(coords), self.points_per_batch):
            chunk = coords[start : start + self.points_per_batch]
            for pt in chunk:
                masks, ious, low_res = self.predictor.predict(
                    pt[None], np.ones(1, np.int32), multimask_output=True,
                    return_logits=True,
                )
                for m in range(masks.shape[0]):
                    if ious[m] < self.pred_iou_thresh:
                        continue
                    stab = mask_stability_score(
                        masks[m], self.predictor.cfg.mask_threshold
                    )
                    if stab < self.stability_score_thresh:
                        continue
                    mask = masks[m] > self.predictor.cfg.mask_threshold
                    if self.min_mask_region_area and mask.sum() < self.min_mask_region_area:
                        continue
                    records.append({
                        "mask": mask,
                        "iou": float(ious[m]),
                        "stability": stab,
                        "point": pt,
                    })

        if not records:
            return []
        boxes = np.stack([box_from_mask(r["mask"]) for r in records])
        scores = np.asarray([r["iou"] for r in records])
        keep = box_nms(boxes, scores, self.box_nms_thresh)
        out = []
        for i in keep:
            r = records[i]
            out.append({
                "segmentation": mask_to_rle(r["mask"]),
                "area": int(r["mask"].sum()),
                "bbox": boxes[i].tolist(),
                "predicted_iou": r["iou"],
                "stability_score": r["stability"],
                "point_coords": [r["point"].tolist()],
            })
        return out
