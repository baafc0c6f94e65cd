from .builtin import CheckpointHook, EvalHook, LoggerHook, LRUpdateHook
from .hookbase import HookBase
from .profiler import ProfilerHook

__all__ = [
    "HookBase",
    "CheckpointHook",
    "EvalHook",
    "LoggerHook",
    "LRUpdateHook",
    "ProfilerHook",
]
