"""First-class tracing/profiling.

The reference has only ad-hoc wall-clock prints (SURVEY.md §5:
video_blend.py:116,137-139, commented-out GPU memory probes).  Here:
``trace`` wraps a block in a jax.profiler trace (viewable in
TensorBoard/XProf), and ``phase_timer`` collects per-phase wall times
with device synchronization so the numbers mean something under async
dispatch.
"""
from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

import jax


class PhaseTimes:
    """Accumulated per-phase wall times.  Thread-safe: the pipelined
    keyframe runner times batch k+1's prep (prep thread) concurrently
    with batch k's denoise (main thread)."""

    def __init__(self):
        self.times: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    def add(self, name: str, dt: float) -> None:
        with self._lock:
            self.times[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = [
            f"  {k:<28s} {v:8.3f}s  x{self.counts[k]}"
            for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])
        ]
        return "phase times:\n" + "\n".join(lines)


def force_fetch(x):
    """Return ``x`` after forcing a real device round-trip on its first
    array leaf.  ``jax.block_until_ready`` resolves WITHOUT waiting on
    the remote axon backend (PERF.md round-5 methodology trap), so
    truthful phase attribution needs an actual one-element fetch; all
    leaves of a single jitted call complete together, so one leaf
    suffices."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[0])
            break
    return x


@contextlib.contextmanager
def phase_timer(phases: PhaseTimes, name: str, sync: bool = True):
    """Time a phase; block on device completion so async dispatch does not
    attribute work to the wrong phase."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                jax.block_until_ready(jax.device_put(0))
            except Exception:
                pass
        phases.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
