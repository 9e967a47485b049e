"""Multi-host (multi-process) scaling helpers.

The reference references torch.distributed/NCCL but never initializes it
(SURVEY.md §2.3). Here multi-host is first-class but thin: jax.distributed
bootstraps the process group, the global mesh spans all hosts' devices (DP
over ICI within a slice, DCN across slices), and the data pipeline shards
*views* across processes so each host only loads and samples its slice of
the scene (DCN carries no training traffic — gradients ride ICI collectives
inside the jitted step).

Single-process usage is unchanged; these helpers no-op gracefully.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bootstrap jax.distributed (no-op when single-process / already up)."""
    import jax

    if jax.process_count() > 1:
        return
    if coordinator_address is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_shard_indices(n_items: int) -> np.ndarray:
    """Round-robin split of dataset view indices across processes, so each
    host preloads only its share of images (multi-host input pipeline;
    gradients still average globally via pmean)."""
    import jax

    return np.arange(jax.process_index(), n_items, jax.process_count())


def local_batch_size(global_batch: int) -> int:
    import jax

    assert global_batch % jax.process_count() == 0, (
        f"global batch {global_batch} must divide process count"
    )
    return global_batch // jax.process_count()


def global_mesh(axis: str = "data"):
    """1-D mesh over ALL processes' devices (jax.devices() is global after
    jax.distributed.initialize): DP over ICI within a slice, DCN across
    slices — XLA routes the psum hierarchically."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def distribute_batch(batch: dict, mesh, axis: str = "data") -> dict:
    """Assemble per-process local batch shards into global jax.Arrays
    sharded on the leading (ray) axis. Each host samples only its own rays
    (process_shard_indices); this stitches them into the global batch the
    shard_map step consumes — no host ever materializes the full batch."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_rays = next(
        (np.asarray(v).shape[0] for v in batch.values()
         if np.ndim(v) >= 1 and np.asarray(v).shape[0] > 1), None)
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if k == "cam_near_far" and v.shape[0] == 1 and n_rays:
            # per-VIEW metadata differs across processes (each host samples
            # its own views), so a replicated [1, 2] would be ill-defined
            # globally — broadcast to per-ray so it shards with the rays
            v = np.broadcast_to(v, (n_rays,) + v.shape[1:]).copy()
        spec = P(axis) if v.ndim >= 1 and v.shape[0] > 1 else P()
        sharding = NamedSharding(mesh, spec)
        if v.ndim >= 1 and v.shape[0] > 1:
            global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                sharding, v, global_shape)
        else:
            out[k] = jax.make_array_from_process_local_data(
                sharding, v, v.shape)
    return out
