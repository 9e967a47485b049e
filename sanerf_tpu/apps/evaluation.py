"""Batch mask-quality evaluation: mIoU / accuracy against GT masks.

Rebuild of the reference evaluation.py: iterate curated eval views
(scenes_test_view.json), load predicted masks via per-method adapters
(`ours` = argmax of saved `_mask.npy`, evaluation.py:9-14; SA3D and ISRF
baseline adapters, evaluation.py:16-37), and report IoU / accuracy
(eval_iou/eval_acc, evaluation.py:133-154).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List

import numpy as np


def eval_iou(pred: np.ndarray, gt: np.ndarray) -> float:
    """Binary IoU over valid (gt != -1) pixels (evaluation.py:133-144)."""
    valid = gt != -1
    p, g = pred[valid] > 0, gt[valid] > 0
    union = np.sum(p | g)
    return float(np.sum(p & g) / union) if union else 1.0


def eval_acc(pred: np.ndarray, gt: np.ndarray) -> float:
    valid = gt != -1
    return float(np.mean((pred[valid] > 0) == (gt[valid] > 0))) if valid.any() else 1.0


def load_ours(result_dir: str, name: str) -> np.ndarray:
    """Our saved logits/labels: `<name>_mask.npy` (argmax if logits)."""
    m = np.load(os.path.join(result_dir, f"{name}_mask.npy"))
    if m.ndim == 3:
        m = np.argmax(m, -1)
    return m


def load_sa3d(result_dir: str, name: str) -> np.ndarray:
    """SA3D baseline adapter (evaluation.py:16-26): per-view segmentation
    png where nonzero = object."""
    import cv2

    img = cv2.imread(os.path.join(result_dir, f"{name}.png"), cv2.IMREAD_GRAYSCALE)
    return (img > 0).astype(np.int64)


def load_isrf(result_dir: str, name: str) -> np.ndarray:
    """ISRF baseline adapter (evaluation.py:28-37)."""
    import cv2

    img = cv2.imread(os.path.join(result_dir, f"{name}_mask.png"),
                     cv2.IMREAD_GRAYSCALE)
    return (img > 127).astype(np.int64)


ADAPTERS: Dict[str, Callable] = {"ours": load_ours, "sa3d": load_sa3d,
                                 "isrf": load_isrf}


def evaluate_scene(
    gt_dir: str,
    result_dir: str,
    view_names: List[str],
    method: str = "ours",
) -> Dict[str, float]:
    """mIoU + accuracy over the named eval views."""
    loader = ADAPTERS[method]
    ious, accs = [], []
    for name in view_names:
        gt_path = os.path.join(gt_dir, f"{name}_masks.npy")
        if not os.path.exists(gt_path):
            continue
        gt = np.load(gt_path)
        pred = loader(result_dir, name)
        if pred.shape != gt.shape:
            import cv2

            pred = cv2.resize(pred.astype(np.uint8), gt.shape[::-1],
                              interpolation=cv2.INTER_NEAREST).astype(np.int64)
        ious.append(eval_iou(pred, gt))
        accs.append(eval_acc(pred, gt))
    return {
        "miou": float(np.mean(ious)) if ious else float("nan"),
        "acc": float(np.mean(accs)) if accs else float("nan"),
        "n_views": len(ious),
    }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--result_dir", required=True)
    p.add_argument("--method", default="ours", choices=list(ADAPTERS))
    p.add_argument("--test_view_json", default="scenes_test_view.json")
    p.add_argument("--scene_name", default=None)
    args = p.parse_args(argv)

    if os.path.exists(args.test_view_json) and args.scene_name:
        with open(args.test_view_json) as f:
            views = json.load(f)[args.scene_name]
    else:
        views = sorted(
            os.path.splitext(f)[0].replace("_masks", "")
            for f in os.listdir(args.gt_dir) if f.endswith("_masks.npy")
        )
    res = evaluate_scene(args.gt_dir, args.result_dir, views, args.method)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
