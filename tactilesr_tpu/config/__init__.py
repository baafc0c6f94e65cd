from .default import (
    common_config,
    device,
    root_path,
    tactileSeqs_config,
    tactileSR_config,
    tPSFNet_config,
)
from .parser import ConfigArgumentParser, save_args

__all__ = [
    "common_config",
    "tPSFNet_config",
    "tactileSR_config",
    "tactileSeqs_config",
    "root_path",
    "device",
    "ConfigArgumentParser",
    "save_args",
]
