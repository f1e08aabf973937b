"""Logging + TensorBoard + profiling.

Reference: code/utils/utils.py:173-183 (logger/writer),
SURVEY §5.1 (the reference has no tracing — ``jax.profiler`` hooks here are
a superset).
"""
from __future__ import annotations

import logging
import os


def init_logger(log_path: str | None, name: str = "hiast_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("[%(asctime)s-%(levelname)s]: %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_path:
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
        fh = logging.FileHandler(log_path, mode="a")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def init_writer(tensorboard_dir: str | None):
    if not tensorboard_dir:
        return None
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(tensorboard_dir, flush_secs=10)
    except ImportError:
        return None


class Profiler:
    """Optional jax.profiler trace window around a configured iteration span."""

    def __init__(self, cfg, work_dir: str):
        p = cfg.runtime.profile
        self.enabled = p.enabled
        self.start_iter = p.start_iter
        self.stop_iter = p.start_iter + p.num_iters
        self.trace_dir = os.path.join(work_dir, "profile")
        self._active = False

    def step(self, iteration: int) -> None:
        if not self.enabled:
            return
        import jax

        if iteration == self.start_iter and not self._active:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif iteration >= self.stop_iter and self._active:
            jax.profiler.stop_trace()
            self._active = False
