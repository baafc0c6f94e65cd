from .blocks import MSRB, LeakyResBlock, ResBlock
from .inference import (
    fold_inference_params,
    fold_inference_params_cnn,
    tactile_sr_cnn_infer,
    tactile_sr_infer,
)
from .layers import BatchNorm, Conv, Dense
from .tactile_sr import TAXEL_CNT, TactileSR, TactileSRCNN
from .tpsf_net import TPSFNet

__all__ = [
    "MSRB",
    "ResBlock",
    "LeakyResBlock",
    "BatchNorm",
    "Conv",
    "Dense",
    "TactileSR",
    "TactileSRCNN",
    "TPSFNet",
    "TAXEL_CNT",
    "fold_inference_params",
    "fold_inference_params_cnn",
    "tactile_sr_infer",
    "tactile_sr_cnn_infer",
]
