"""TPU-native model zoo (flax.linen, NHWC, bf16-ready).

Parity surface with the reference model inventory (SURVEY.md §2):
  segmentation : UNet, UNet++, DeepLabv3+, UperNet, ViT finetune (FloodViT head)
  cd           : siam-diff, siam-conc, SNUNet-ECAM, BiT-CD, HFA-Net,
                 ChangeFormer(V6), ADHR-CDNet, TransUNet-CD
  recurrent    : ConvLSTM (lax.scan over time)
  ssl          : ViT encoder + MAE wrapper (FloodViT pretraining)
"""

from .factory import (
    initialize_cd_model,
    initialize_recurrent_model,
    initialize_segmentation_model,
)
