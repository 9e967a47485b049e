"""ctypes bindings for the native (C++) prefetching ray-batch sampler.

Builds native/dataloader.cpp on first use (g++, cached .so next to the
source — the same build-at-import strategy as the reference's JIT CUDA
extensions, gridencoder/backend.py:31-38) and exposes `NativeRaySampler`, a
drop-in for the provider's `collate_train` hot path with a background
prefetch ring. Falls back cleanly when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "dataloader.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libsanerf_data.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _SO,
    ]
    subprocess.check_call(cmd)
    return _SO


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and dlopen the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            return None
        lib.snl_create.restype = ctypes.c_void_p
        lib.snl_create.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.snl_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.snl_ready_count.restype = ctypes.c_int
        lib.snl_ready_count.argtypes = [ctypes.c_void_p]
        lib.snl_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


class NativeRaySampler:
    """Background-threaded uniform ray-batch sampler over preloaded images.

    poses: [M, 4, 4] OpenGL c2w; intrinsics: [4] or [M, 4];
    images: [M, H, W, 3] float in [0,1] or uint8.
    """

    def __init__(self, poses: np.ndarray, intrinsics: np.ndarray,
                 images: np.ndarray, num_rays: int, seed: int = 0,
                 prefetch_depth: int = 4, n_threads: int = 2):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native dataloader unavailable (no g++?)")
        self._lib = lib
        M, H, W = images.shape[:3]
        self.num_rays = num_rays
        self.H, self.W = H, W
        if images.dtype != np.uint8:
            images = (np.clip(images, 0, 1) * 255).astype(np.uint8)
        intr = np.asarray(intrinsics, np.float32)
        if intr.ndim == 1:
            intr = np.broadcast_to(intr, (M, 4))
        self._poses = np.ascontiguousarray(poses, np.float32).reshape(M, 16)
        self._intr = np.ascontiguousarray(intr, np.float32)
        self._imgs = np.ascontiguousarray(images)
        self._handle = lib.snl_create(
            self._poses.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._intr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            M, H, W, num_rays, max(1, seed), prefetch_depth, n_threads,
        )

    def next_batch(self) -> Dict[str, np.ndarray]:
        n = self.num_rays
        rays_o = np.empty((n, 3), np.float32)
        rays_d = np.empty((n, 3), np.float32)
        rgb = np.empty((n, 3), np.float32)
        idx = ctypes.c_int(0)
        self._lib.snl_next(
            self._handle,
            rays_o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rays_d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(idx),
        )
        return {
            "rays_o": rays_o, "rays_d": rays_d, "images": rgb,
            "index": int(idx.value), "H": self.H, "W": self.W,
        }

    # provider-compatible signature (rng unused: native RNG)
    def collate_train(self, rng=None, num_rays: Optional[int] = None):
        return self.next_batch()

    def ready_count(self) -> int:
        return int(self._lib.snl_ready_count(self._handle))

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.snl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
