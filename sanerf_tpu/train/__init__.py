"""Training orchestration: state, steps, trainer, checkpoints, metrics."""

from sanerf_tpu.train.checkpoints import CheckpointManager, load_partial_and_freeze
from sanerf_tpu.train.metrics import LPIPSMeter, MeanIoUMeter, PSNRMeter, SSIMMeter
from sanerf_tpu.train.state import (
    TrainState,
    adaptive_num_rays,
    create_train_state,
    make_rgb_train_step,
    update_proposal_now,
)
from sanerf_tpu.train.trainer import Trainer
