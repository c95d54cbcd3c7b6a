"""Tracing / profiling utilities (SURVEY.md §5: the reference has none —
only tqdm bars; here: JAX profiler traces, named scopes, a step timer with
TFLOP/s accounting, and a NaN/Inf guard for debugging runs)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)

__all__ = ["trace", "StepTimer", "named_scope", "check_finite"]

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)


class StepTimer:
    """Rolling step-time + throughput tracker.

    ``flops_per_step`` (optional) is the analytic cost of one step; when set,
    ``stats()`` reports achieved TFLOP/s (model FLOPs, not hardware FLOPs).
    """

    def __init__(self, flops_per_step: Optional[float] = None,
                 window: int = 50):
        self.flops = flops_per_step
        self.window = window
        self.times = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        avg = sum(self.times) / len(self.times)
        out = {"step_time_s": avg, "steps_per_s": 1.0 / avg}
        if self.flops:
            out["tflops_per_s"] = self.flops / avg / 1e12
        return out


def check_finite(tree, name: str = "tree") -> None:
    """Host-side NaN/Inf sweep (debug aid; the trainer's NaN-loss hard fail
    mirrors reference base_runner.py:382-383)."""
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:8]}")
