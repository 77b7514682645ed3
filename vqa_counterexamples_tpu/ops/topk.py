"""Brute-force k-nearest-neighbor search as sharded MXU matmul + top-k.

Replaces the reference's sklearn ``NearestNeighbors`` (``knn.py:41-53``, CPU
ball-tree) with the TPU-native recipe: squared-L2 distances via one GEMM
(||q||^2 - 2 q.f + ||f||^2), ``lax.top_k`` per query chunk, and — for corpora
sharded over a mesh axis — local top-k per shard followed by an all-gather
merge, so the big (N, 2048) matrix never has to fit on one chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _chunk_neg_sqdist(queries: jax.Array, corpus: jax.Array,
                      corpus_sqnorm: jax.Array) -> jax.Array:
    """-(||q - f||^2) for a chunk: (Bq, D) x (N, D) -> (Bq, N)."""
    dots = jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32)
    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    return 2.0 * dots - q_sq - corpus_sqnorm[None, :]


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def knn_chunk(queries: jax.Array, corpus: jax.Array, k: int,
              approx: bool = False):
    """k-NN of each query row against the full corpus (single device).

    Returns (distances, indices), distances ascending euclidean — the same
    contract as sklearn ``kneighbors`` (so index 0 is the query itself when
    querying the corpus against itself, reference knn.py:47-53).

    ``approx=True`` uses the TPU-native ``lax.approx_max_k`` (recall target
    0.999) — much faster than the exact sort-based top-k on wide corpora.
    """
    corpus_sqnorm = jnp.sum(corpus.astype(jnp.float32) ** 2, axis=1)
    neg_sq = _chunk_neg_sqdist(queries, corpus, corpus_sqnorm)
    if approx:
        neg_top, idx = jax.lax.approx_max_k(neg_sq, k, recall_target=0.999)
    else:
        neg_top, idx = jax.lax.top_k(neg_sq, k)
    dist = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    return dist, idx


def knn(features, k: int = 25, queries=None, batch_size: int = 1024,
        approx: bool = False, engine: str = "xla", mesh=None,
        mesh_axis: str = "data"):
    """Host-driver over query chunks; features stay device-resident.

    ``queries`` defaults to ``features`` (self-kNN, the extract->knn pipeline
    case).  Pads the final chunk to keep shapes static under jit.

    ``engine``: 'xla' (default) or 'pallas' — the fused distance+top-k kernel
    (ops/pallas/knn_kernel.py) that never materializes the (Bq, N) distance
    matrix in HBM.  ``approx`` applies to the xla engine only.

    ``mesh``: shard the corpus rows over ``mesh_axis`` and run the
    local-top-k + all-gather merge (``sharded_knn_chunk``) — each device
    holds N/P rows, so corpora larger than one chip's HBM still fit.  The
    corpus is padded to divide evenly with rows pushed to infinite distance.
    """
    import numpy as np

    if mesh is not None:
        n_shards = mesh.shape[mesh_axis]
        feats_host = np.asarray(features, np.float32)
        pad_rows = -feats_host.shape[0] % n_shards
        if pad_rows:
            # pad with far-away rows (huge norm -> -inf score, never top-k)
            far = np.full((pad_rows, feats_host.shape[1]), 1e4, np.float32)
            feats_host = np.concatenate([feats_host, far], axis=0)
        assert feats_host.shape[0] // n_shards >= k, \
            "each corpus shard must hold at least k rows"
        corpus = jax.device_put(
            feats_host, jax.sharding.NamedSharding(mesh, P(mesh_axis, None)))
    else:
        corpus = jnp.asarray(features)
    qs = (jnp.asarray(features) if queries is None
          else jnp.asarray(queries))
    n = qs.shape[0]
    if engine == "pallas":
        from .pallas.knn_kernel import knn_chunk_pallas
        batch_size = min(batch_size, 256)  # VMEM budget (q + tile + topk)
    all_dist, all_idx = [], []
    size = min(batch_size, n)
    # full-size windows via a traced-start dynamic_slice (ops/chunking.py):
    # a static qs[start:start+batch] is a distinct compiled program per
    # offset — at COCO query counts that is ~80 remote compiles
    from .chunking import row_slice, windows

    for s, off in windows(n, size):
        chunk = row_slice(qs, jnp.int32(s), size)
        if mesh is not None:
            dist, idx = sharded_knn_chunk(chunk, corpus, k, mesh,
                                          axis=mesh_axis)
        elif engine == "pallas":
            dist, idx = knn_chunk_pallas(chunk, corpus, k)
        else:
            dist, idx = knn_chunk(chunk, corpus, k, approx=approx)
        if off:
            dist, idx = dist[off:], idx[off:]
        all_dist.append(np.asarray(dist))
        all_idx.append(np.asarray(idx))
    return np.concatenate(all_dist, 0), np.concatenate(all_idx, 0)


def sharded_knn_chunk(queries: jax.Array, corpus: jax.Array, k: int,
                      mesh, axis: str = "data"):
    """k-NN with the corpus sharded over a mesh axis.

    Each device holds an (N/P, D) shard: it computes a local top-k against its
    shard, then the (dist, local_idx) candidates are all-gathered over ICI and
    merged with a second top-k.  Communication is O(P * Bq * k), not O(N).
    """
    n_total = corpus.shape[0]
    n_shards = mesh.shape[axis]
    assert n_total % n_shards == 0, "corpus must divide evenly over the mesh"
    shard_rows = n_total // n_shards

    def local_then_merge(q, c_shard):
        c_sqnorm = jnp.sum(c_shard.astype(jnp.float32) ** 2, axis=1)
        neg_sq = _chunk_neg_sqdist(q, c_shard, c_sqnorm)
        loc_top, loc_idx = jax.lax.top_k(neg_sq, k)
        my_shard = jax.lax.axis_index(axis)
        glob_idx = loc_idx + my_shard * shard_rows
        # gather every shard's k candidates: (P, Bq, k)
        all_top = jax.lax.all_gather(loc_top, axis)
        all_idx = jax.lax.all_gather(glob_idx, axis)
        cat_top = jnp.moveaxis(all_top, 0, 1).reshape(q.shape[0], -1)
        cat_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q.shape[0], -1)
        best, pos = jax.lax.top_k(cat_top, k)
        idx = jnp.take_along_axis(cat_idx, pos, axis=1)
        return jnp.sqrt(jnp.maximum(-best, 0.0)), idx

    fn = jax.shard_map(
        local_then_merge, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False)
    return fn(queries, corpus)
