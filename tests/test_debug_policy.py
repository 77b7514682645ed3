"""core/debug sanitizer switches + core/policy dtype scoping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_counterexamples_tpu.core import debug, policy


def test_check_numerics_catches_nan():
    debug.check_numerics(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    finally:
        debug.check_numerics(False)


def test_strict_shapes():
    debug.strict_shapes(True)
    try:
        with pytest.raises(ValueError):
            _ = jnp.ones((3, 4)) + jnp.ones((4,))
    finally:
        debug.strict_shapes(False)


def test_policy_scope_casts_and_restores():
    x = jnp.ones((4, 4))
    assert policy.cast_in(x).dtype == jnp.float32
    with policy.compute_dtype_scope("bfloat16"):
        assert policy.cast_in(x).dtype == jnp.bfloat16
        # matmul under the policy still accumulates f32 via the ops
        from vqa_counterexamples_tpu.ops.fusion import tucker_rank_fusion
        out = tucker_rank_fusion(
            x, x, jnp.ones((4, 8)), jnp.zeros((8,)), jnp.ones((4, 8)),
            jnp.zeros((8,)), rank=2)
        assert out.dtype == jnp.float32
    assert policy.cast_in(x).dtype == jnp.float32


def test_policy_bf16_matches_f32_loosely():
    rng = np.random.default_rng(0)
    xv = jnp.asarray(rng.normal(size=(16, 12)), jnp.float32)
    wv = jnp.asarray(rng.normal(size=(12, 8)), jnp.float32)
    from vqa_counterexamples_tpu.ops.fusion import tucker_rank_fusion
    args = (xv, xv, wv, jnp.zeros((8,)), wv, jnp.zeros((8,)))
    ref = tucker_rank_fusion(*args, rank=2)
    with policy.compute_dtype_scope("bfloat16"):
        out = tucker_rank_fusion(*args, rank=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2,
                               atol=3e-2)
