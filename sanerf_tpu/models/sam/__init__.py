"""SAM in JAX: ViT image encoder, prompt encoder, mask decoder, predictor.

From-scratch implementation of the Segment Anything architecture the
reference consumes via the external `segment_anything_hq` package
(SURVEY.md §2.2), with a torch-checkpoint converter for the official
weights (sam_vit_h_4b8939.pth).
"""

from sanerf_tpu.models.sam.convert import convert_checkpoint, sam_config_for
from sanerf_tpu.models.sam.image_encoder import VIT_B, VIT_H, VIT_L, ViTConfig
from sanerf_tpu.models.sam.predictor import SamConfig, SamPredictor, init_params
