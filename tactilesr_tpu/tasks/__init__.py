from . import sr_task, tpsf_task

__all__ = ["sr_task", "tpsf_task"]
