r"""Tracing and wall-clock profiling utilities.

The reference's only profiling is per-epoch wall-clock durations logged to
W&B (``/root/reference/dair_pll/experiment.py:65-68,407-410,636-639``).
This module keeps those duration scalars (they flow through the experiment
logger) and adds the TPU-native instruments:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable trace of device execution.
* :class:`Timer` — monotonic wall-clock section timer.
* :func:`device_timeit` — robust on-device timing of a jitted callable
  (forces completion via host fetch, median-of-runs; see ``bench.py``).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict


class Timer:
    """Accumulating wall-clock timer for named sections."""

    def __init__(self) -> None:
        self.durations: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        start = time.monotonic()
        try:
            yield
        finally:
            self.durations[name] = (self.durations.get(name, 0.0) +
                                    time.monotonic() - start)


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Records a ``jax.profiler`` device trace into ``log_dir``.

    View with TensorBoard's profile plugin. No-op when disabled (or when
    the backend does not support profiling).
    """
    if not enabled:
        yield
        return
    import jax
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def device_timeit(fn: Callable[[], Any], n: int = 8,
                  warmup: int = 1) -> float:
    """Median wall-clock seconds of a device callable.

    Forces completion with a host fetch of the first output leaf —
    ``block_until_ready`` alone is unreliable through tunneled device
    transports.
    """
    import jax
    import jax.numpy as jnp

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))

    for _ in range(warmup):
        force(fn())
    times = []
    for _ in range(n):
        start = time.monotonic()
        force(fn())
        times.append(time.monotonic() - start)
    times.sort()
    return times[len(times) // 2]
