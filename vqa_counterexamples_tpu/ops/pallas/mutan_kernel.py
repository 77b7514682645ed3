"""Pallas TPU kernel for MUTAN rank-R Tucker fusion.

Computes ``sum_r (x_v @ Wv_r + bv_r) * (x_q @ Wq_r + bq_r)`` without ever
materializing the two (B, R*dmm) projection tensors in HBM: the grid walks
(batch-tile, rank) with the rank axis innermost, each step runs two
(TILE_B, dh) x (dh, dmm) MXU matmuls whose products stay in VMEM and
accumulate straight into the output tile.  vs the XLA path
(ops/fusion.py) this trades 2x (B, R*dmm) HBM round-trips for R revisits of
the small output tile — a bandwidth win for the B*25-row CX workload.

All dims are zero-padded to lane multiples (128) outside the kernel; padding
columns multiply to zero so the result is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(xv_ref, xq_ref, wv_ref, bv_ref, wq_ref, bq_ref, out_ref):
    # weight/bias blocks arrive as (1, dh, dmm) / (1, 1, dmm): drop axis 0
    r = pl.program_id(1)
    hv = jnp.dot(xv_ref[:], wv_ref[0],
                 preferred_element_type=jnp.float32) + bv_ref[0]
    hq = jnp.dot(xq_ref[:], wq_ref[0],
                 preferred_element_type=jnp.float32) + bq_ref[0]
    prod = hv * hq

    @pl.when(r == 0)
    def _():
        out_ref[:] = prod

    @pl.when(r > 0)
    def _():
        out_ref[:] = out_ref[:] + prod


@functools.partial(jax.jit,
                   static_argnames=("rank", "tile_b", "interpret"))
def tucker_rank_fusion_pallas(x_v: jax.Array, x_q: jax.Array,
                              w_v: jax.Array, b_v: jax.Array,
                              w_q: jax.Array, b_q: jax.Array,
                              rank: int, tile_b: int = 256,
                              interpret: bool = False) -> jax.Array:
    """Drop-in replacement for ops.fusion.tucker_rank_fusion (same layout:
    w_* is (dh, R*dmm) with rank-major column blocks).

    Measured on TPU v5e (on-device loop, f32, dh=dmm=360, R=10):
    B=1600: 144us (XLA fused path: 130us); B=12800: 553us vs XLA 1139us —
    2.1x, because XLA round-trips the two (B, R*dmm) projections through HBM
    while this kernel keeps them in VMEM.  Use via
    ops.fusion.tucker_rank_fusion_auto, which switches at PALLAS_MIN_BATCH.
    ``interpret=True`` runs the Mosaic interpreter (CPU tests).
    """
    batch, dhv = x_v.shape
    dhq = x_q.shape[1]
    dmm = w_v.shape[1] // rank

    pb = _round_up(batch, tile_b)
    phv = _round_up(dhv, 128)
    phq = _round_up(dhq, 128)
    pmm = _round_up(dmm, 128)

    xv = jnp.pad(x_v, ((0, pb - batch), (0, phv - dhv)))
    xq = jnp.pad(x_q, ((0, pb - batch), (0, phq - dhq)))
    # (dh, R*dmm) -> (R, dh_pad, dmm_pad)
    wv = jnp.pad(w_v.reshape(dhv, rank, dmm),
                 ((0, phv - dhv), (0, 0), (0, pmm - dmm))).transpose(1, 0, 2)
    wq = jnp.pad(w_q.reshape(dhq, rank, dmm),
                 ((0, phq - dhq), (0, 0), (0, pmm - dmm))).transpose(1, 0, 2)
    bv = jnp.pad(b_v.reshape(rank, dmm), ((0, 0), (0, pmm - dmm)))
    bq = jnp.pad(b_q.reshape(rank, dmm), ((0, 0), (0, pmm - dmm)))
    bv = bv[:, None, :]  # (R, 1, dmm_pad) so a (1, dmm) block broadcasts
    bq = bq[:, None, :]

    grid = (pb // tile_b, rank)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, phv), lambda i, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, phq), lambda i, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, phv, pmm), lambda i, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pmm), lambda i, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, phq, pmm), lambda i, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pmm), lambda i, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, pmm), lambda i, r: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pb, pmm), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * pb * rank * (phv + phq) * pmm,
            bytes_accessed=(pb * (phv + phq) + rank * (phv + phq) * pmm
                            + pb * pmm) * 4,
            transcendentals=0),
    )(xv, xq, wv, bv, wq, bq)
    return out[:batch, :dmm]


