"""Reference NeRFNetwork `.pth` checkpoint -> sanerf_tpu param tree.

Maps the torch state_dict of /root/reference/nerf/network.py (NeRFNetwork:
`grid`/`s_grid`/`m_grid` GridEncoders, `grid_mlp`/`view_mlp` MLPs,
`samvit_mlp` Sequential(SkipConnMLP, LayerNorm), `mask_mlp` in its three
variants, `prop_encoders`/`prop_mlp` pairs — network.py:102-219) onto the
hashgrid-family param tree of models/fields.py.

The hash-table layout matches bit-for-bit: ops/hashgrid.build_spec mirrors
gridencoder/grid.py:103-137 (same per-level sizing, 8-row alignment, and
combined-table offsets), so `*.embeddings` tensors copy over unchanged.
torch nn.Linear weights are [out, in] and transpose to our [in, out].

Enables output-fidelity checks of the hashgrid field family against
reference-trained checkpoints (SURVEY.md §7 "Checkpoint compatibility
story"; VERDICT r1 item 5).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from sanerf_tpu.models.fields import NerfModel

Params = Dict


class ConversionError(ValueError):
    pass


def _w(sd: Dict, key: str) -> np.ndarray:
    if key not in sd:
        raise ConversionError(f"missing key in state_dict: {key}")
    return np.asarray(sd.pop(key), np.float32)


def _mlp(sd: Dict, prefix: str, n_layers: int, bias: bool) -> List[Params]:
    layers = []
    for l in range(n_layers):
        p = {"w": jnp.asarray(_w(sd, f"{prefix}.net.{l}.weight").T)}
        if bias:
            p["b"] = jnp.asarray(_w(sd, f"{prefix}.net.{l}.bias"))
        layers.append(p)
    return layers


def _grid(sd: Dict, key: str, expect_shape) -> jnp.ndarray:
    emb = _w(sd, key)
    if tuple(emb.shape) != tuple(expect_shape):
        raise ConversionError(
            f"{key}: table shape {emb.shape} != spec {tuple(expect_shape)} — "
            "grid config mismatch (num_levels/level_dim/log2_hashmap/"
            "desired_resolution)")
    return jnp.asarray(emb)


def convert_nerf_state_dict(sd: Dict, model: NerfModel) -> Params:
    """torch state_dict (or a reference Trainer checkpoint dict with a
    'model' entry, utils.py:2041-2060) -> param tree for `model`.

    `model` must be the hashgrid field family with a config matching the
    checkpoint's architecture; shape mismatches raise ConversionError.
    """
    if "model" in sd and not any("." in k for k in sd):
        sd = sd["model"]
    sd = {k: v for k, v in sd.items()}  # we pop as we consume
    c = model.cfg
    if model.is_mlp_field:
        raise ConversionError(
            "reference checkpoints hold hash tables; build the model with "
            "field_type='hashgrid' to convert")

    n_gm = c.grid_mlp_layers if hasattr(c, "grid_mlp_layers") else 3
    params: Params = {
        "grid": _grid(sd, "grid.embeddings",
                      (model.grid_spec.total_params, model.grid_spec.level_dim)),
        "grid_mlp": _mlp(sd, "grid_mlp", n_gm, bias=False),
        "view_mlp": _mlp(sd, "view_mlp", 3, bias=False),
        "prop": [],
    }
    for i, spec in enumerate(model.prop_specs):
        params["prop"].append({
            "grid": _grid(sd, f"prop_encoders.{i}.embeddings",
                          (spec.total_params, spec.level_dim)),
            "mlp": _mlp(sd, f"prop_mlp.{i}", 2, bias=False),
        })

    if c.with_sam:
        params["s_grid"] = _grid(
            sd, "s_grid.embeddings",
            (model.s_grid_spec.total_params, model.s_grid_spec.level_dim))
        params["samvit_mlp"] = _mlp(sd, "samvit_mlp.0", c.samvit_mlp_layers,
                                    bias=True)
        params["samvit_norm"] = {
            "w": jnp.asarray(_w(sd, "samvit_mlp.1.weight")),
            "b": jnp.asarray(_w(sd, "samvit_mlp.1.bias")),
        }

    if c.with_mask:
        if c.mask_mlp_type == "default":
            params["m_grid"] = _grid(
                sd, "m_grid.embeddings",
                (model.m_grid_spec.total_params, model.m_grid_spec.level_dim))
            params["mask_mlp"] = _mlp(sd, "mask_mlp.0", 3, bias=False)
        elif c.mask_mlp_type == "lightweight_mask":
            params["m_grid"] = _grid(
                sd, "m_grid.embeddings",
                (model.m_grid_spec.total_params, model.m_grid_spec.level_dim))
            params["mask_mlp"] = _mlp(sd, "mask_mlp", 3, bias=False)
        elif c.mask_mlp_type == "adaptive":
            layers = []
            i = 0
            while f"mask_mlp.{i}.weight" in sd:
                layers.append({"w": jnp.asarray(_w(sd, f"mask_mlp.{i}.weight").T)})
                i += 1
            if not layers:
                raise ConversionError("no mask_mlp.{i}.weight keys found")
            params["mask_mlp"] = layers

    leftovers = [k for k in sd
                 if not k.endswith(".offsets")  # GridEncoder buffers
                 and "aabb" not in k and "mean_count" not in k]
    if leftovers:
        raise ConversionError(f"unconsumed state_dict keys: {sorted(leftovers)[:8]}")
    return params


def convert_nerf_checkpoint(path: str, model: NerfModel) -> Params:
    """Load a reference `.pth` (torch.save'd Trainer checkpoint or bare
    state_dict) and convert. Requires torch for deserialization."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}
    return convert_nerf_state_dict(sd, model)
