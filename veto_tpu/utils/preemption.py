"""Preemption-aware shutdown: SIGTERM → checkpoint → clean exit.

TPU pods are preemptible; the maintenance notice arrives as SIGTERM.
SURVEY §5 names "preemption-aware save on TPU" as a rebuild requirement
the reference lacks (torch.distributed training simply dies).  The guard
converts the signal into a cooperative flag the training loop polls once
per iteration — checkpointing mid-step would corrupt donated buffers, so
the loop finishes the in-flight step, saves, and exits cleanly.
"""

from __future__ import annotations

import signal
from typing import Iterable

__all__ = ["PreemptionGuard"]


class PreemptionGuard:
    """Installable signal → flag adapter.

    Usage::

        guard = PreemptionGuard().install()
        for it, batch in enumerate(loader):
            state, metrics = step(state, batch)
            if guard.requested:
                ckpt.save(it + 1, state)
                break
        guard.restore()
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._requested = False
        self._prev: dict = {}

    def _handler(self, signum, frame):  # pragma: no cover - trivial
        self._requested = True

    def install(self) -> "PreemptionGuard":
        for s in self._signals:
            self._prev[s] = signal.signal(s, self._handler)
        return self

    @property
    def requested(self) -> bool:
        return self._requested

    def restore(self) -> None:
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
