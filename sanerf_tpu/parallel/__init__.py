"""Multi-chip scaling: data-parallel mesh, sharded train/render steps."""

from sanerf_tpu.parallel.multihost import initialize, local_batch_size, process_shard_indices
from sanerf_tpu.parallel.dp import (
    make_dp_render,
    make_dp_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
)
