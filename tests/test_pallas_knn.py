"""Fused distance+top-k Pallas kernel vs the XLA exact path (interpreter)."""

import jax.numpy as jnp
import numpy as np

from vqa_counterexamples_tpu.ops import topk
from vqa_counterexamples_tpu.ops.pallas.knn_kernel import knn_chunk_pallas


def test_knn_kernel_matches_exact():
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.normal(size=(300, 32)), jnp.float32)
    queries = corpus[:24]
    d_ref, i_ref = topk.knn_chunk(queries, corpus, 5)
    d_pal, i_pal = knn_chunk_pallas(queries, corpus, 5, tile_n=128,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))
    # self-distance is ~0 with f32 cancellation noise in both paths
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               rtol=1e-4, atol=5e-3)


def test_knn_kernel_unaligned_corpus():
    """Corpus not a multiple of the tile: padded columns must never win."""
    rng = np.random.default_rng(1)
    corpus = jnp.asarray(rng.normal(size=(197, 16)), jnp.float32)
    queries = jnp.asarray(rng.normal(size=(9, 16)), jnp.float32)
    d_ref, i_ref = topk.knn_chunk(queries, corpus, 7)
    d_pal, i_pal = knn_chunk_pallas(queries, corpus, 7, tile_n=128,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))
    assert int(np.asarray(i_pal).max()) < 197
