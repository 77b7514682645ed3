"""8-bit dropout masks (core/rng.keep_mask).

``jax.random.bernoulli`` materializes 32 random bits per element; the
(B, 196, 2048) attention-input mask was the single hottest op of the
MutanAtt train step (411 MB/step of u32 at B=256).  ``keep_mask`` draws
8 bits per element and thresholds at 1/256 resolution — exact for the
reference dropout rates (0.5, 0.25) — returning an unbiased inverse scale.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_counterexamples_tpu.core import rng as rng_lib


@pytest.mark.parametrize("keep_prob", [0.5, 0.75, 0.9])
def test_keep_rate_and_unbiasedness(keep_prob):
    key = jax.random.key(0)
    mask, scale = rng_lib.keep_mask(key, keep_prob, (200_000,))
    assert mask.dtype == jnp.bool_
    rate = float(jnp.mean(mask))
    assert rate == pytest.approx(keep_prob, abs=0.01)
    # E[mask * scale] == 1 by construction: scale is 1/threshold-prob
    thresh = int(round(keep_prob * 256))
    assert scale == pytest.approx(256.0 / thresh)


def test_exact_for_reference_rates():
    # rates 0.25/0.5 quantize exactly: scale equals 1/(1-rate)
    _, s50 = rng_lib.keep_mask(jax.random.key(1), 0.5, (8,))
    _, s75 = rng_lib.keep_mask(jax.random.key(1), 0.75, (8,))
    assert s50 == 2.0
    assert s75 == pytest.approx(1.0 / 0.75)


def test_env_fallback_to_bernoulli(monkeypatch):
    monkeypatch.setenv("VQACX_DROPOUT_BITS", "32")
    key = jax.random.key(2)
    mask, scale = rng_lib.keep_mask(key, 0.5, (4096,))
    ref = jax.random.bernoulli(key, 0.5, (4096,))
    assert scale == 2.0
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref))


def test_degenerate_prob_falls_back(monkeypatch):
    monkeypatch.delenv("VQACX_DROPOUT_BITS", raising=False)
    # keep_prob ~ 1.0 rounds to 256 -> bernoulli path (mask nearly all True)
    mask, scale = rng_lib.keep_mask(jax.random.key(3), 0.999, (10_000,))
    assert float(jnp.mean(mask)) > 0.99
    assert scale == pytest.approx(1.0 / 0.999)


def test_bf16_activation_stays_bf16():
    from vqa_counterexamples_tpu.models.common import dropout

    class Mod:
        def make_rng(self, name):
            return jax.random.key(4)

    x = jnp.ones((64, 64), jnp.bfloat16)
    y = dropout(Mod(), x, 0.5, deterministic=False)
    assert y.dtype == jnp.bfloat16
    kept = np.asarray(y) != 0
    assert np.all(np.asarray(y)[kept] == 2.0)
