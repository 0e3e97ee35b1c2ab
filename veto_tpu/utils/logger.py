"""Logging + smoothed training meters.

Functional replacement for pysgg/utils/logger.py:17-126 and
metric_logger.py:13-66: a color console + file logger, a window-smoothed
metric aggregator with ETA, and a JSONL metrics writer standing in for the
reference's TensorBoard-via-logging-handler quirk (a custom logging level 4
that a handler converted into TB writes) — here metrics land in
``<output_dir>/metrics.jsonl`` which any dashboard can tail.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from collections import defaultdict, deque
from typing import Dict, Optional


def setup_logger(name: str, output_dir: Optional[str] = None,
                 rank: int = 0) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    if rank == 0:  # reference logs only on rank 0 (logger.py:53-55)
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s"))
        logger.addHandler(ch)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(output_dir, "log.txt"))
            fh.setFormatter(logging.Formatter(
                "%(asctime)s %(name)s %(levelname)s: %(message)s"))
            logger.addHandler(fh)
    return logger


class SmoothedValue:
    """Window-median/average of a scalar stream (metric_logger.py:13-36)."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        self.deque.append(value)
        self.count += 1
        self.total += value

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  ", window_size: int = 20):
        self.meters: Dict[str, SmoothedValue] = defaultdict(
            lambda: SmoothedValue(window_size)
        )
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {m.median:.4f} ({m.global_avg:.4f})"
            for name, m in self.meters.items()
        )

    def eta_string(self, iteration: int, max_iter: int) -> str:
        if "time" not in self.meters:
            return "?"
        secs = self.meters["time"].global_avg * (max_iter - iteration)
        return time.strftime("%H:%M:%S", time.gmtime(secs)) if secs < 86400 else (
            f"{secs / 86400:.1f}d"
        )


class JSONLWriter:
    """Append-only metrics sink replacing the TFBoard handler.

    ``tensorboard=True`` additionally mirrors every scalar into a real
    TensorBoard event file (utils/tb_writer.py, stdlib-only)."""

    def __init__(self, output_dir: str, filename: str = "metrics.jsonl",
                 tensorboard: bool = False):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self._tb = None
        if tensorboard:
            from .tb_writer import TBWriter

            self._tb = TBWriter(os.path.join(output_dir, "tb"))

    def write(self, step: int, metrics: Dict[str, float]):
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v  # non-scalar entries pass through verbatim
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass  # non-scalar entries stay JSONL-only
            self._tb.flush()
