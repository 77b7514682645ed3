"""Bilinear multimodal fusion ops, MXU-first.

The reference MUTAN fusion (``vqa/models/fusion.py:100-116``) runs a Python
loop of R=10 pairs of linears with an elementwise product and a stacked sum:

    x_mm = sum_r (x_v @ Wv_r + bv_r) * (x_q @ Wq_r + bq_r)

On TPU that loop is one pair of large matmuls: stack the R projection weights
into ``(dim_hv, R*dim_mm)`` so each projection is a single MXU-tiled GEMM, then
reduce the rank axis with a fused multiply-sum (XLA fuses the elementwise part
into the matmul epilogue).  ~20x fewer kernel launches than the reference and
the GEMMs are big enough to saturate the systolic array at B*25 rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def tucker_rank_fusion(x_v: jax.Array, x_q: jax.Array,
                       w_v: jax.Array, b_v: jax.Array,
                       w_q: jax.Array, b_q: jax.Array,
                       rank: int) -> jax.Array:
    """sum_r (x_v @ w_v[r] + b_v[r]) * (x_q @ w_q[r] + b_q[r]).

    Args:
      x_v: (B, dim_hv) visual embedding.
      x_q: (B, dim_hq) question embedding.
      w_v: (dim_hv, R*dim_mm) stacked visual projections (rank-major blocks).
      b_v: (R*dim_mm,) stacked bias.
      w_q/b_q: same for the question side.
      rank: R, the Tucker decomposition rank.

    Returns (B, dim_mm).
    """
    from ..core.policy import cast_in

    batch = x_v.shape[0]
    dim_mm = w_v.shape[1] // rank
    xv, wv = cast_in(x_v, w_v)
    xq, wq = cast_in(x_q, w_q)
    hv = (jnp.dot(xv, wv, preferred_element_type=jnp.float32)
          + b_v).reshape(batch, rank, dim_mm)
    hq = (jnp.dot(xq, wq, preferred_element_type=jnp.float32)
          + b_q).reshape(batch, rank, dim_mm)
    return jnp.sum(hv * hq, axis=1)


def stack_rank_weights(w_list, b_list):
    """Stack per-rank (din, dmm) weights into the fused layout above."""
    w = jnp.concatenate([w for w in w_list], axis=1)
    b = jnp.concatenate([b for b in b_list], axis=0)
    return w, b


# Below this many rows XLA's fused einsum path wins (intermediates stay in
# registers/VMEM); above it XLA spills the (B, R*dmm) projections to HBM and
# the Pallas kernel is ~2x faster (see ops/pallas/mutan_kernel.py timings).
PALLAS_MIN_BATCH = 4096


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _tucker_pallas_vjp(x_v, x_q, w_v, b_v, w_q, b_q, rank):
    from .pallas.mutan_kernel import tucker_rank_fusion_pallas

    return tucker_rank_fusion_pallas(x_v, x_q, w_v, b_v, w_q, b_q,
                                     rank=rank, tile_b=800)


def _tucker_fwd(x_v, x_q, w_v, b_v, w_q, b_q, rank):
    return (_tucker_pallas_vjp(x_v, x_q, w_v, b_v, w_q, b_q, rank),
            (x_v, x_q, w_v, b_v, w_q, b_q))


def _tucker_bwd(rank, res, g):
    """Backward via recomputed projections (einsum form): cheaper to redo the
    two GEMMs than to have saved the (B, R*dmm) intermediates in HBM."""
    x_v, x_q, w_v, b_v, w_q, b_q = res
    batch = x_v.shape[0]
    dmm = w_v.shape[1] // rank
    hv = (x_v @ w_v + b_v).reshape(batch, rank, dmm)
    hq = (x_q @ w_q + b_q).reshape(batch, rank, dmm)
    g_hv = (g[:, None, :] * hq).reshape(batch, rank * dmm)
    g_hq = (g[:, None, :] * hv).reshape(batch, rank * dmm)
    return (g_hv @ w_v.T, g_hq @ w_q.T,
            x_v.T @ g_hv, jnp.sum(g_hv, axis=0),
            x_q.T @ g_hq, jnp.sum(g_hq, axis=0))


_tucker_pallas_vjp.defvjp(_tucker_fwd, _tucker_bwd)


def tucker_rank_fusion_auto(x_v: jax.Array, x_q: jax.Array,
                            w_v: jax.Array, b_v: jax.Array,
                            w_q: jax.Array, b_q: jax.Array,
                            rank: int) -> jax.Array:
    """Dispatch between the XLA einsum path and the Pallas kernel by batch
    size (static at trace time) and backend.

    The Pallas path is opt-in (VQACX_ENABLE_PALLAS=1): it is 2.1x faster at
    B>=~8k, but a kernel fault inside a long-lived training job wedges the
    chip, so the default stays on the always-safe XLA path until the kernel
    has soak time under autodiff at every shape we ship.
    """
    import os

    from ..core.policy import host_init_active

    enabled = (os.environ.get("VQACX_ENABLE_PALLAS", "0") == "1"
               and not host_init_active())
    on_tpu = jax.devices()[0].platform == "tpu"
    if enabled and on_tpu and x_v.shape[0] >= PALLAS_MIN_BATCH:
        return _tucker_pallas_vjp(x_v, x_q, w_v, b_v, w_q, b_q, rank)
    return tucker_rank_fusion(x_v, x_q, w_v, b_v, w_q, b_q, rank)
