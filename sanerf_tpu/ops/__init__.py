"""TPU-native compute ops: encoders, sampling, compositing, losses.

This package is the replacement of the reference's three CUDA extensions
(gridencoder / shencoder / freqencoder) plus its CUDA loss dependency
(torch_efficient_distloss) — see SURVEY.md §2.1.
"""

from sanerf_tpu.ops.activation import trunc_exp
from sanerf_tpu.ops.composite import (
    composite,
    compute_weights,
    compute_weights_from_deltas,
    cumsum_lanes,
)
from sanerf_tpu.ops.freq import freq_encode, freq_output_dim
from sanerf_tpu.ops.hashgrid import (
    HashGridSpec,
    build_spec,
    grad_total_variation,
    grad_weight_decay,
    hash_encode,
    hash_encode_01,
    init_params,
)
from sanerf_tpu.ops.losses import (
    distort_loss,
    entropy_loss,
    label_regularization,
    proposal_loss,
    rgb_similarity_loss,
)
from sanerf_tpu.ops.sampling import (
    contract,
    contract_T,
    near_far_from_aabb,
    sample_pdf,
    searchsorted_right,
    spacing_fn,
    spacing_fn_inv,
    uncontract,
    uniform_bins,
)
from sanerf_tpu.ops.sh import sh_encode, sh_output_dim
