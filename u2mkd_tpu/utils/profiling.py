"""Profiling / tracing hooks.

The reference's tracing story is a DEBUG flag of cuda-synchronize wall-time
prints around each kernel (``sptr/functional.py:7,27-35``) plus the
``InferTime`` callback (SURVEY §5.1). TPU-native equivalent: the XLA
profiler (``jax.profiler``) for device traces plus a lightweight host-side
step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture an XLA profiler trace (viewable in TensorBoard/XProf) around
    a code block. No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Host-side step latency tracker with warmup trim (the ``InferTime``
    behavior: mean over [10:-3], reference ``core/callbacks.py:203-220``)."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.times.append(time.time() - self._t0)

    def mean_ms(self, batch_size: int = 1) -> Optional[float]:
        t = self.times[10:-3] if len(self.times) > 13 else self.times
        if not t:
            return None
        return float(sum(t) / len(t) / batch_size * 1000)


def annotate(name: str):
    """Named trace region (shows up in the XLA profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
