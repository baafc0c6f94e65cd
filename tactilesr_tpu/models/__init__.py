from .blocks import MSRB, LeakyResBlock, ResBlock
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
]
