"""Checkpointing: flat-npz pytree snapshots with rolling retention,
best-by-metric tracking, and the cross-stage partial-load + freeze handoff.

Reproduces the reference semantics (nerf/utils.py:2041-2166, main.py:255-262):
- `save(..., full=True)` stores model + EMA + optimizer + step (the torch
  version adds scaler/scheduler; our schedule is a pure fn of step).
- rolling window of `max_keep` checkpoints (utils.py:2066-2072).
- best checkpoint holds EMA weights (utils.py:2076-2097).
- `load_partial_and_freeze` merges a stage-1 checkpoint into fresh params
  and returns a boolean trainable mask marking exactly the loaded leaves
  frozen — the mechanism that makes stage 2/3 train only the new heads.

Format: a single .npz whose keys are '/'-joined tree paths (portable, no
framework-specific serialization), plus a JSON meta entry.
"""

from __future__ import annotations

import json
import os
import re
from glob import glob
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from sanerf_tpu.models.fields import Params


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[prefix + _path_str(path)] = np.asarray(leaf)
    return flat


def unflatten_like(template: Any, flat: Dict[str, np.ndarray], prefix: str = "") -> Any:
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = prefix + _path_str(path)
        if key in flat:
            new_leaves.append(np.asarray(flat[key]).reshape(np.shape(leaf)))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class CheckpointManager:
    """Workspace checkpoint directory with the reference's retention and
    resume-mode policies (`latest | latest_model | best | scratch | <path>`,
    utils.py:659-679)."""

    def __init__(self, workspace: str, name: str = "ngp", max_keep: int = 2):
        self.dir = os.path.join(workspace, "checkpoints")
        self.name = name
        self.max_keep = max_keep
        os.makedirs(self.dir, exist_ok=True)

    # -- save ---------------------------------------------------------------

    def save(
        self,
        step: int,
        params: Params,
        ema_params: Optional[Params] = None,
        opt_state: Any = None,
        stats: Optional[Dict] = None,
        full: bool = True,
        best: bool = False,
    ) -> str:
        flat = flatten_tree(params, "params/")
        if ema_params is not None:
            flat.update(flatten_tree(ema_params, "ema/"))
        if full and opt_state is not None:
            flat.update(flatten_tree(opt_state, "opt/"))
        meta = {"step": int(step), "stats": stats or {}}
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
        if best:
            path = os.path.join(self.dir, f"{self.name}_best.npz")
        else:
            path = os.path.join(self.dir, f"{self.name}_step{step:08d}.npz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)  # atomic
        if not best:
            self._prune()
        return path

    def _prune(self):
        ckpts = self.list_checkpoints()
        for old in ckpts[: -self.max_keep]:
            os.remove(old)

    def list_checkpoints(self):
        return sorted(glob(os.path.join(self.dir, f"{self.name}_step*.npz")))

    # -- load ---------------------------------------------------------------

    def resolve(self, mode: str = "latest") -> Optional[str]:
        if mode in ("latest", "latest_model"):
            ckpts = self.list_checkpoints()
            return ckpts[-1] if ckpts else None
        if mode == "best":
            best = os.path.join(self.dir, f"{self.name}_best.npz")
            if os.path.exists(best):
                return best
            ckpts = self.list_checkpoints()
            return ckpts[-1] if ckpts else None
        if mode == "scratch":
            return None
        return mode if os.path.exists(mode) else None

    @staticmethod
    def load_file(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        meta = {}
        if "__meta__" in flat:
            meta = json.loads(flat.pop("__meta__").tobytes().decode())
        return flat, meta

    def load(
        self,
        mode: str,
        params_template: Params,
        opt_state_template: Any = None,
        model_only: bool = False,
    ):
        """Restore (params, ema, opt_state, meta) from a checkpoint; missing
        keys keep template values (non-strict load, utils.py:2122-2141)."""
        path = self.resolve(mode)
        if path is None:
            return None
        flat, meta = self.load_file(path)
        params = unflatten_like(params_template, flat, "params/")
        ema = unflatten_like(params_template, flat, "ema/") if any(
            k.startswith("ema/") for k in flat
        ) else params
        opt_state = None
        if not model_only and opt_state_template is not None and any(
            k.startswith("opt/") for k in flat
        ):
            opt_state = unflatten_like(opt_state_template, flat, "opt/")
        return params, ema, opt_state, meta


def load_partial_and_freeze(
    init_ckpt: str, params: Params
) -> Tuple[Params, Params]:
    """Stage handoff (main.py:255-262): merge every leaf present in the
    checkpoint into `params`, and return (params, trainable_mask) with the
    loaded leaves marked frozen so only the new heads train."""
    flat, _ = CheckpointManager.load_file(init_ckpt)
    loaded_keys = {k[len("params/"):] for k in flat if k.startswith("params/")}

    merged = unflatten_like(params, flat, "params/")
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(params)
    mask_leaves = [
        _path_str(path) not in loaded_keys for path, _ in leaves_with_path
    ]
    trainable = jax.tree_util.tree_unflatten(treedef, mask_leaves)
    return merged, trainable
