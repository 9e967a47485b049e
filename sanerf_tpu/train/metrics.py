"""Evaluation meters: PSNR / SSIM / LPIPS / mean-IoU.

Same `.update/.measure/.write/.report/.clear` protocol as the reference
meters (nerf/utils.py:329-512) so the Trainer and eval drivers are
interchangeable. PSNR and SSIM are computed natively (numpy/scipy) instead
of via torchmetrics; LPIPS requires pretrained VGG weights (the `lpips` pip
package, absent in this environment) and degrades gracefully to
unavailable.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class PSNRMeter:
    """Peak signal-to-noise ratio over [0,1] images (utils.py:329-370)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.V, self.N = 0.0, 0

    def update(self, preds: np.ndarray, truths: np.ndarray):
        preds = np.asarray(preds, np.float64)
        truths = np.asarray(truths, np.float64)
        mse = np.mean((preds - truths) ** 2)
        self.V += -10.0 * np.log10(mse + 1e-12)
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def write(self, writer, global_step: int, prefix: str = ""):
        writer.add_scalar(f"{prefix}/PSNR", self.measure(), global_step)

    def report(self) -> str:
        return f"PSNR = {self.measure():.6f}"


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def ssim(
    img0: np.ndarray, img1: np.ndarray, max_val: float = 1.0,
    k1: float = 0.01, k2: float = 0.03,
) -> float:
    """Standard single-scale SSIM with an 11x11 Gaussian window (the
    torchmetrics default the reference wraps, utils.py:421-463)."""
    from scipy.signal import convolve2d

    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    kernel = _gaussian_kernel()

    def filt(x):
        return convolve2d(x, kernel, mode="valid")

    vals = []
    img0 = np.atleast_3d(np.asarray(img0, np.float64))
    img1 = np.atleast_3d(np.asarray(img1, np.float64))
    for c in range(img0.shape[-1]):
        x, y = img0[..., c], img1[..., c]
        mx, my = filt(x), filt(y)
        mxx, myy, mxy = filt(x * x), filt(y * y), filt(x * y)
        vx, vy = mxx - mx * mx, myy - my * my
        cov = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
            (mx * mx + my * my + c1) * (vx + vy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


class SSIMMeter:
    def __init__(self):
        self.clear()

    def clear(self):
        self.V, self.N = 0.0, 0

    def update(self, preds: np.ndarray, truths: np.ndarray):
        self.V += ssim(preds, truths)
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def write(self, writer, global_step: int, prefix: str = ""):
        writer.add_scalar(f"{prefix}/SSIM", self.measure(), global_step)

    def report(self) -> str:
        return f"SSIM = {self.measure():.6f}"


class LPIPSMeter:
    """Learned perceptual similarity (utils.py:373-418). Requires the
    `lpips` package + pretrained VGG; unavailable in offline environments —
    `available` gates use and `measure()` returns nan when disabled."""

    def __init__(self, net: str = "vgg"):
        self.clear()
        try:
            import lpips  # noqa: F401
            import torch

            self._fn = lpips.LPIPS(net=net)
            self._torch = torch
            self.available = True
        except Exception:
            self._fn = None
            self.available = False

    def clear(self):
        self.V, self.N = 0.0, 0

    def update(self, preds: np.ndarray, truths: np.ndarray):
        if not self.available:
            return
        t = self._torch
        p = t.from_numpy(np.asarray(preds, np.float32)).permute(2, 0, 1)[None] * 2 - 1
        g = t.from_numpy(np.asarray(truths, np.float32)).permute(2, 0, 1)[None] * 2 - 1
        with t.no_grad():
            self.V += float(self._fn(p, g).item())
        self.N += 1

    def measure(self) -> float:
        if not self.available or self.N == 0:
            return float("nan")
        return self.V / self.N

    def write(self, writer, global_step: int, prefix: str = ""):
        writer.add_scalar(f"{prefix}/LPIPS", self.measure(), global_step)

    def report(self) -> str:
        if not self.available:
            return "LPIPS = n/a (no pretrained weights)"
        return f"LPIPS = {self.measure():.6f}"


class MeanIoUMeter:
    """Per-class IoU averaged over classes and frames (utils.py:466-512)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.V, self.N = 0.0, 0

    def update(self, preds: np.ndarray, truths: np.ndarray):
        preds = np.asarray(preds).reshape(-1)
        truths = np.asarray(truths).reshape(-1)
        valid = truths != -1
        preds, truths = preds[valid], truths[valid]
        classes = np.unique(truths)
        ious = []
        for c in classes:
            inter = np.sum((preds == c) & (truths == c))
            union = np.sum((preds == c) | (truths == c))
            if union > 0:
                ious.append(inter / union)
        if ious:
            self.V += float(np.mean(ious))
            self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def write(self, writer, global_step: int, prefix: str = ""):
        writer.add_scalar(f"{prefix}/mIoU", self.measure(), global_step)

    def report(self) -> str:
        return f"mIoU = {self.measure():.6f}"
