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
