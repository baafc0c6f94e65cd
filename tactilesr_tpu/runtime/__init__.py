from .checkpoint import (
    CheckpointManager,
    load_checkpoint_file,
    merge_pytree_strict_false,
    save_checkpoint_file,
)
from .device import (
    parse_device_memory,
    select_device_with_most_free_memory,
    test_device,
)
from .history import HistoryBuffer, MetricStorage
from .hooks import (
    CheckpointHook,
    EvalHook,
    HookBase,
    LoggerHook,
    LRUpdateHook,
    ProfilerHook,
)
from .logger import ScalarWriter, setup_logger
from .misc import collect_env, set_random_seed
from .optim import adam_l2, scale_updates_by_lr
from .schedule import ConstantLR, LRWarmupSchedule, ReduceLROnPlateau, StepLR
from .trainer import Trainer, TrainState, masked_mse

__all__ = [
    "Trainer",
    "TrainState",
    "masked_mse",
    "HookBase",
    "EvalHook",
    "CheckpointHook",
    "LoggerHook",
    "LRUpdateHook",
    "ProfilerHook",
    "MetricStorage",
    "HistoryBuffer",
    "LRWarmupSchedule",
    "StepLR",
    "ConstantLR",
    "ReduceLROnPlateau",
    "adam_l2",
    "scale_updates_by_lr",
    "CheckpointManager",
    "save_checkpoint_file",
    "load_checkpoint_file",
    "merge_pytree_strict_false",
    "setup_logger",
    "ScalarWriter",
    "collect_env",
    "set_random_seed",
    "parse_device_memory",
    "select_device_with_most_free_memory",
    "test_device",
]
