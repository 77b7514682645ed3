"""Corpus-sharded gather over the 8-device mesh matches a plain take."""

import jax.numpy as jnp
import numpy as np

from vqa_counterexamples_tpu.parallel import make_mesh
from vqa_counterexamples_tpu.parallel.gather import sharded_gather


def test_sharded_gather_matches_take():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 64, size=(10, 5)), jnp.int32)
    mesh = make_mesh({"data": 8})
    out = sharded_gather(feats, idx, mesh)
    ref = jnp.take(feats, idx, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_sharded_gather_repeated_indices():
    feats = jnp.arange(32.0)[:, None] * jnp.ones((1, 4))
    idx = jnp.asarray([0, 31, 7, 7, 0], jnp.int32)
    mesh = make_mesh({"data": 8})
    out = sharded_gather(feats, idx, mesh)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [0, 31, 7, 7, 0])
