from .export_torch import (
    export_checkpoint_file,
    export_tactile_sr,
    export_tactile_srcnn,
    export_tpsf_net,
)
from .torch_convert import (
    convert_checkpoint_file,
    convert_tactile_sr,
    convert_tactile_srcnn,
    convert_tpsf_net,
    load_torch_state_dict,
)

__all__ = [
    "convert_checkpoint_file",
    "convert_tactile_sr",
    "convert_tactile_srcnn",
    "convert_tpsf_net",
    "export_checkpoint_file",
    "export_tactile_sr",
    "export_tactile_srcnn",
    "export_tpsf_net",
    "load_torch_state_dict",
]
