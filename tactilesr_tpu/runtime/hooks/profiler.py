"""Profiler hook: capture a jax trace window during training.

The reference's observability is wall-clock only (data_time/iter_time); this
adds the TPU-native upgrade the SURVEY calls for -- an optional
``jax.profiler`` trace (viewable in TensorBoard / Perfetto) over a chosen
iteration window.
"""

from __future__ import annotations

import logging
import os

from .hookbase import HookBase

logger = logging.getLogger("tactilesr_tpu")

__all__ = ["ProfilerHook"]


class ProfilerHook(HookBase):
    """Trace iterations [start_iter, start_iter + num_iters)."""

    priority = 4

    def __init__(self, trace_dir: str, start_iter: int = 10, num_iters: int = 5):
        self._trace_dir = trace_dir
        self._start = start_iter
        self._stop = start_iter + num_iters
        self._active = False

    def before_iter(self) -> None:
        if self.trainer.cur_iter == self._start and not self._active:
            import jax

            os.makedirs(self._trace_dir, exist_ok=True)
            jax.profiler.start_trace(self._trace_dir)
            self._active = True
            logger.info("profiler trace started -> %s", self._trace_dir)

    def after_iter(self) -> None:
        if self._active and self.trainer.cur_iter + 1 >= self._stop:
            import jax

            self.trainer.flush_metrics()  # drain async work into the trace
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler trace stopped (%d iters)", self._stop - self._start)

    def after_train(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
