"""core/profiler StepTimer semantics."""

import time

import jax.numpy as jnp

from vqa_counterexamples_tpu.core.profiler import StepTimer


def test_step_timer_measures_and_accumulates():
    timer = StepTimer()
    timer.data_ready(n=4)
    time.sleep(0.01)
    out = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    dt = timer.step_done(out, n=4)
    assert dt >= 0.01
    assert timer.batch_time.count == 4
    assert timer.data_time.count == 4
    timer.data_ready(n=4)
    timer.step_done(jnp.ones(()), n=4)
    assert timer.batch_time.count == 8
