"""Encoder factory: name -> (params, apply_fn, out_dim).

API parity with the reference's `get_encoder` (encoding.py:47-79), which
maps 'hashgrid'/'tiledgrid'/'sh'/'frequency'/'frequency_torch'/'None' to an
encoder module + output dim. Here encoders are (init, apply) pairs over
param pytrees; table-free encoders return empty params.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from sanerf_tpu.config import HashGridConfig
from sanerf_tpu.ops import hashgrid
from sanerf_tpu.ops.freq import freq_encode, freq_output_dim
from sanerf_tpu.ops.sh import sh_encode, sh_output_dim


def get_encoder(
    encoding: str = "hashgrid",
    input_dim: int = 3,
    *,
    # frequency
    multires: int = 6,
    # sh
    degree: int = 4,
    # grid encoders
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: Optional[int] = 2048,
    interpolation: str = "linear",
    align_corners: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[Any, Callable, int]:
    """Returns (params, apply(params, x, bound=1), output_dim)."""
    if encoding is None or encoding == "None":
        return None, lambda p, x, bound=1.0: x, input_dim

    if encoding in ("frequency", "frequency_torch"):
        deg = multires

        def apply_freq(p, x, bound=1.0):
            return freq_encode(x, deg)

        return None, apply_freq, freq_output_dim(input_dim, deg)

    if encoding == "sh":
        def apply_sh(p, x, bound=1.0):
            return sh_encode(x, degree)

        return None, apply_sh, sh_output_dim(degree)

    if encoding in ("hashgrid", "tiledgrid"):
        spec = hashgrid.build_spec(
            HashGridConfig(
                input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
                base_resolution=base_resolution,
                log2_hashmap_size=log2_hashmap_size,
                desired_resolution=desired_resolution,
                gridtype="hash" if encoding == "hashgrid" else "tiled",
                interpolation=interpolation, align_corners=align_corners,
            )
        )
        params = hashgrid.init_params(key if key is not None else jax.random.key(0), spec)

        def apply_grid(p, x, bound=1.0):
            return hashgrid.hash_encode(x, p, spec, bound)

        return params, apply_grid, spec.output_dim

    raise ValueError(f"unknown encoding {encoding!r}")
