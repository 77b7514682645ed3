"""Pallas TPU kernel: fused distance + running top-k for exact kNN.

The XLA path (ops/topk.knn_chunk) materializes the full (Bq, N) negative
squared-distance matrix in HBM (1.4 GB per 4096-query chunk on COCO) and runs
a sort-based top-k over 82k-wide rows.  This kernel walks the corpus in tiles:
each grid step computes the (Bq, TILE_N) distance block with one MXU matmul
and folds it into a running (Bq, k) top-k held in VMEM scratch — the full
distance matrix never exists, and HBM traffic is one read of the corpus per
query chunk.

Merge step: concat(running values, tile top-k) -> lax.top_k over 2k columns.
Global indices are carried alongside values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(k: int, tile_n: int, n_total: int):
    def kernel(q_ref, qsq_ref, c_ref, csq_ref, vals_ref, idx_ref,
               run_vals, run_idx):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            run_vals[:] = jnp.full_like(run_vals, -jnp.inf)
            run_idx[:] = jnp.zeros_like(run_idx)

        # -(||q - c||^2) for this corpus tile: (Bq, TILE_N)
        dots = jnp.dot(q_ref[:], c_ref[:].T,
                       preferred_element_type=jnp.float32)
        neg_sq = 2.0 * dots - qsq_ref[:] - csq_ref[:]

        # mask padding columns beyond the real corpus
        col = t * tile_n + jax.lax.broadcasted_iota(
            jnp.int32, neg_sq.shape, 1)
        neg_sq = jnp.where(col < n_total, neg_sq, -jnp.inf)

        tile_vals, tile_loc = jax.lax.top_k(neg_sq, k)
        tile_idx = t * tile_n + tile_loc

        cat_vals = jnp.concatenate([run_vals[:], tile_vals], axis=1)
        cat_idx = jnp.concatenate([run_idx[:], tile_idx], axis=1)
        best_vals, pos = jax.lax.top_k(cat_vals, k)
        run_vals[:] = best_vals
        run_idx[:] = jnp.take_along_axis(cat_idx, pos, axis=1)

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            vals_ref[:] = run_vals[:]
            idx_ref[:] = run_idx[:]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_n", "interpret"))
def knn_chunk_pallas(queries: jax.Array, corpus: jax.Array, k: int,
                     tile_n: int = 2048, interpret: bool = False):
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
        _make_kernel(pk, tile_n, n),
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
