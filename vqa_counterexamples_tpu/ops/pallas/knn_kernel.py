"""Pallas TPU kernel: fused distance + running top-k for exact kNN.

The XLA path (ops/topk.knn_chunk) materializes the full (Bq, N) negative
squared-distance matrix in HBM (1.4 GB per 4096-query chunk on COCO) and runs
a sort-based top-k over 82k-wide rows.  This kernel walks the corpus in tiles:
each grid step computes the (Bq, TILE_N) distance block with one MXU matmul
and folds it into a running (Bq, K) top-k held in VMEM scratch — the full
distance matrix never exists, and HBM traffic is one read of the corpus per
query chunk.

``lax.top_k`` has no Pallas TPU lowering, so top-k is hand-rolled as K rounds
of (max, first-argmax-via-min-iota, mask) on the VPU — K is small (25) and
static, so the rounds unroll.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _row_topk(x: jax.Array, idx: jax.Array, k: int):
    """Top-k along axis 1 by iterative max extraction.

    x (B, T) values, idx (B, T) the global index carried with each value.
    Returns (vals (B, k), idxs (B, k)) sorted descending.  Ties resolve to
    the smallest index (matching lax.top_k).
    """
    big = jnp.int32(2 ** 30)
    vals, idxs = [], []
    cur = x
    for _ in range(k):
        m = jnp.max(cur, axis=1, keepdims=True)               # (B, 1)
        ismax = cur == m
        first = jnp.min(jnp.where(ismax, idx, big), axis=1,
                        keepdims=True)                        # (B, 1)
        vals.append(m)
        idxs.append(first)
        cur = jnp.where(ismax & (idx == first), _NEG_INF, cur)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


def _make_kernel(k: int, tile_n: int, n_total: int):
    def kernel(q_ref, qsq_ref, c_ref, csq_ref, vals_ref, idx_ref,
               run_vals, run_idx):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            run_vals[:] = jnp.full_like(run_vals, _NEG_INF)
            run_idx[:] = jnp.zeros_like(run_idx)

        # -(||q - c||^2) for this corpus tile: (Bq, TILE_N)
        dots = jnp.dot(q_ref[:], c_ref[:].T,
                       preferred_element_type=jnp.float32)
        neg_sq = 2.0 * dots - qsq_ref[:] - csq_ref[:]

        # mask padding columns beyond the real corpus
        col = t * tile_n + jax.lax.broadcasted_iota(
            jnp.int32, neg_sq.shape, 1)
        neg_sq = jnp.where(col < n_total, neg_sq, _NEG_INF)

        tile_vals, tile_idx = _row_topk(neg_sq, col, k)

        cat_vals = jnp.concatenate([run_vals[:, :k], tile_vals], axis=1)
        cat_idx = jnp.concatenate([run_idx[:, :k], tile_idx], axis=1)
        best_vals, best_idx = _row_topk(cat_vals, cat_idx, k)
        run_vals[:, :k] = best_vals
        run_idx[:, :k] = best_idx

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            vals_ref[:] = run_vals[:]
            idx_ref[:] = run_idx[:]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_n", "interpret"))
def knn_chunk_pallas(queries: jax.Array, corpus: jax.Array, k: int,
                     tile_n: int = 512, interpret: bool = False):
    """Exact top-k nearest corpus rows per query (ascending distances),
    same contract as ops.topk.knn_chunk."""
    bq, dim = queries.shape
    n = corpus.shape[0]
    pk = _round_up(k, 128)          # lane-aligned running buffers
    pn = _round_up(n, tile_n)
    pd = _round_up(dim, 128)
    pb = _round_up(bq, 8)

    q = jnp.pad(queries.astype(jnp.float32), ((0, pb - bq), (0, pd - dim)))
    c = jnp.pad(corpus.astype(jnp.float32), ((0, pn - n), (0, pd - dim)))
    qsq = jnp.sum(q * q, axis=1, keepdims=True)          # (pb, 1)
    csq = jnp.sum(c * c, axis=1)[None, :]                # (1, pn)

    grid = (pn // tile_n,)
    vals, idx = pl.pallas_call(
        _make_kernel(k, tile_n, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pb, pd), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, pd), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((pb, pk), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, pk), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((pb, pk), jnp.float32),
                   jax.ShapeDtypeStruct((pb, pk), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((pb, pk), jnp.float32),
                        pltpu.VMEM((pb, pk), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * pb * pn * pd,
            bytes_accessed=(pb * pd + pn * pd + 2 * pb * pk) * 4,
            transcendentals=0),
    )(q, qsq, c, csq)
    dist = jnp.sqrt(jnp.maximum(-vals[:bq, :k], 0.0))
    return dist, idx[:bq, :k]
