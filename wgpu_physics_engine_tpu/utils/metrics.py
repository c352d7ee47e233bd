"""Metrics & logging (SURVEY §5: the reference declares env_logger but never
initializes it; its only live telemetry is an egui FPS label and a debug
println. This module is the real observability story.)

* standard-library ``logging`` integration (``get_logger``)
* :class:`Meter` — rolling counters (fps, particle-steps/s, frames) that
  scenes and loops can report into, with a one-line summary format
* :func:`log_run_header` — environment/device banner for reproducibility
"""

from __future__ import annotations

import collections
import logging
import time
from typing import Deque, Dict


def get_logger(name: str = "wpe_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class Meter:
    """Rolling-window throughput meter."""

    def __init__(self, window: int = 120):
        self._events: Dict[str, Deque] = collections.defaultdict(
            lambda: collections.deque(maxlen=window))
        self.totals: Dict[str, float] = collections.defaultdict(float)

    def add(self, key: str, value: float = 1.0) -> None:
        self._events[key].append((time.time(), value))
        self.totals[key] += value

    def rate(self, key: str) -> float:
        """Events-value per second over the window."""
        ev = self._events.get(key)
        if not ev or len(ev) < 2:
            return 0.0
        dt = ev[-1][0] - ev[0][0]
        return sum(v for _, v in ev) / dt if dt > 0 else 0.0

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {self.rate(k):.3g}/s (total {self.totals[k]:.3g})"
            for k in sorted(self._events))


def log_run_header(logger: logging.Logger | None = None) -> None:
    import jax

    logger = logger or get_logger()
    logger.info("jax %s | backend %s | devices %s",
                jax.__version__, jax.default_backend(),
                [str(d) for d in jax.devices()])
