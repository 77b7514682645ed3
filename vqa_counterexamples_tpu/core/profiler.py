"""Tracing / profiling hooks.

The reference's observability is wall-clock meters with explicit
``torch.cuda.synchronize`` (``vqa/lib/engine.py:17,25,37-54``).  Here:

* ``StepTimer`` — per-step wall timing that blocks on the step's outputs
  (the JAX analogue of the reference's synchronize-before-reading-clock);
* ``trace`` — context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory for a window of steps;
* ``annotate`` — named trace regions (`jax.profiler.TraceAnnotation`).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

from .meters import AvgMeter


def hard_sync(outputs) -> None:
    """Block until the computation producing ``outputs`` has ACTUALLY run.

    ``jax.block_until_ready`` is not trustworthy on every platform: on the
    tunneled single-chip runtime used for development it can return when
    the execution is *scheduled*, not finished — measured 2026-08-18: a
    ResNet-152 B=80 forward "blocks" in ~1 ms while a scalar readback of
    the same output takes ~90 ms (the real execution time; ~70x
    inflation).  A host readback of one element cannot lie — the buffer
    must exist to be read.  Chained-state training loops self-throttle and
    were barely affected (~3%); independent-dispatch loops (extraction)
    were wildly inflated.  Every throughput measurement in this repo goes
    through this function.
    """
    leaves = jax.tree_util.tree_leaves(outputs)
    if leaves:
        jax.device_get(jnp.ravel(leaves[-1])[0])


class StepTimer:
    """Updates batch/data-time meters around a jitted step, forcing device
    completion so the timings are honest."""

    def __init__(self):
        self.batch_time = AvgMeter()
        self.data_time = AvgMeter()
        self._end = time.time()

    def data_ready(self, n: int = 1):
        self.data_time.update(time.time() - self._end, n=n)

    def step_done(self, outputs, n: int = 1):
        hard_sync(outputs)
        self.batch_time.update(time.time() - self._end, n=n)
        self._end = time.time()
        return self.batch_time.val


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace: ``with annotate('gather'): ...``."""
    return jax.profiler.TraceAnnotation(name)
