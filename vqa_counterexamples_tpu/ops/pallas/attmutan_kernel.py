"""Pallas TPU kernel for the folded-weight MUTAN attention fusion.

The MutanAtt attention stage fuses every spatial position against the
question: ``x_mm[b,k,m] = sum_r (x_v[b,k] @ w_hv)[r,m] * hq[b,r,m]`` over
K=196 positions (models/fusion.py fuse_candidates).  The XLA folded form
(``weff[b] = sum_r w3[:,r,:] * hq[b,r,:]`` then ``x_v[b] @ weff[b]``) wins
on FLOPs but materializes the (B, dim_hv, dim_mm) ``weff`` tensor in HBM
(81 MB bf16 at B=256) and XLA re-tiles it between the build einsum and the
batched GEMM — the B=512 trace shows the weff/x_mm einsum-and-copy chain
at ~2.7 ms of the 22.4 ms step while the necessary GEMM FLOPs are ~0.5 ms.

This kernel walks examples with ``w3`` VMEM-resident: per example it builds
weff in VMEM (5 fused multiply-adds over a (dim_hv, dim_mm) tile), runs the
(K, dim_hv) x (dim_hv, dim_mm) MXU GEMM, and adds the rank-folded bias —
weff never exists in HBM.  The backward recomputes weff (cheap: R
multiply-adds) and accumulates ``dw3``/``db3`` across the grid; ``dx_v``
and ``dhq`` are per-example.

Padding: dim_hv/dim_mm pad to the lane multiple and K to the sublane
multiple with zeros — padded rows/cols contribute exact zeros everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _weff(w3t_ref, hq_row, rank):
    # w3 arrives (R, Dh, M): leading-dim slices are clean tile views —
    # the original (Dh, R, M) middle-dim slices lowered to strided VPU
    # access that dominated the kernel (fwd 7 ms vs 0.5 ms roofline)
    acc = None
    for r in range(rank):
        term = (w3t_ref[r].astype(jnp.float32)
                * hq_row[r][None, :].astype(jnp.float32))
        acc = term if acc is None else acc + term
    return acc  # (Dh, M) f32


def _bias(b3_ref, hq, rank):
    bias = None
    for r in range(rank):
        term = (b3_ref[r].astype(jnp.float32)
                * hq[r].astype(jnp.float32))
        bias = term if bias is None else bias + term
    return bias  # (M,) f32


def _fwd_kernel(rank, tb, xv_ref, w3_ref, b3_ref, hq_ref, out_ref):
    # tb examples per grid step: per-example grids (tb=1, 512 steps)
    # measured overhead-bound — fwd 6.5 ms vs XLA 4.7 ms; batch tiles
    # amortize the per-step cost (a batched dot_general formulation
    # SIGABRTed the Mosaic compiler; unrolled per-example GEMMs lower
    # cleanly)
    for e in range(tb):
        hq = hq_ref[e]
        weff = _weff(w3_ref, hq, rank).astype(jnp.bfloat16)
        bias = _bias(b3_ref, hq, rank)
        x_mm = jnp.dot(xv_ref[e], weff, preferred_element_type=jnp.float32)
        out_ref[e] = (x_mm + bias[None, :]).astype(jnp.bfloat16)


def _bwd_kernel(rank, tb, xv_ref, w3_ref, b3_ref, hq_ref, g_ref,
                dxv_ref, dhq_ref, dw3_ref, db3_ref, dw3_acc, db3_acc):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    # per-example unrolled (batched dot_general SIGABRTed Mosaic); the
    # axis reductions run as dot-with-ones — Mosaic rejects VPU ADD
    # reduces over dims with nonzero layout offsets (sliced w3 views)
    for e in range(tb):
        hq = hq_ref[e]
        weff = _weff(w3_ref, hq, rank).astype(jnp.bfloat16)
        ge = g_ref[e]
        # dx_v = g @ weff^T  (contract m)
        dxv_ref[e] = jax.lax.dot_general(
            ge, weff, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        # dweff = x_v^T @ g  (contract k)
        dweff_e = jax.lax.dot_general(
            xv_ref[e], ge, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (Dh, M) f32
        ones_k = jnp.ones((1, ge.shape[0]), jnp.bfloat16)
        gsum = jnp.dot(ones_k, ge,
                       preferred_element_type=jnp.float32)[0]  # (M,)
        for r in range(rank):
            hr = hq[r].astype(jnp.float32)
            dw3_r = dweff_e * hr[None, :]
            db3_r = gsum * hr

            # dw3/db3 accumulate in persistent VMEM scratch across the
            # grid — a revisited HBM output would re-read+re-write the
            # whole (Dh, R, M) f32 tensor per tile.  Only the first
            # example of the first grid step initializes the scratch.
            if e == 0:
                @pl.when(i == 0)
                def _(r=r, dw3_r=dw3_r, db3_r=db3_r):
                    dw3_acc[r] = dw3_r
                    db3_acc[r] = db3_r

                @pl.when(i > 0)
                def _(r=r, dw3_r=dw3_r, db3_r=db3_r):
                    dw3_acc[r] = dw3_acc[r] + dw3_r
                    db3_acc[r] = db3_acc[r] + db3_r
            else:
                dw3_acc[r] = dw3_acc[r] + dw3_r
                db3_acc[r] = db3_acc[r] + db3_r

            # dhq[r,m] = sum_d w3[d,r,m] * dweff[d,m] + b3[r,m] * gsum[m]
            prod = w3_ref[r].astype(jnp.float32) * dweff_e
            ones_d = jnp.ones((1, prod.shape[0]), jnp.float32)
            dhq_r = (jnp.dot(ones_d, prod,
                             preferred_element_type=jnp.float32)[0]
                     + b3_ref[r].astype(jnp.float32) * gsum)
            dhq_ref[e, r] = dhq_r.astype(jnp.bfloat16)

    @pl.when(i == n - 1)
    def _():
        dw3_ref[...] = dw3_acc[...]
        db3_ref[...] = db3_acc[...]


FWD_TILE_B = 8
BWD_TILE_B = 2


def _pad(x_v, w3, b3, hq, tb):
    b, k, dh = x_v.shape
    rank, m = b3.shape
    pb = _round_up(b, tb)
    pk, pdh, pm = (_round_up(k, SUBLANE), _round_up(dh, LANE),
                   _round_up(m, LANE))
    # padded examples are all-zero: their hq rows are zero, so they add
    # exact zeros to the dw3/db3 accumulators
    xv = jnp.pad(x_v.astype(jnp.bfloat16),
                 ((0, pb - b), (0, pk - k), (0, pdh - dh)))
    # (Dh, R, M) -> (R, Dh, M): in-kernel rank slices become leading-dim
    w3p = jnp.pad(w3.astype(jnp.bfloat16).transpose(1, 0, 2),
                  ((0, 0), (0, pdh - dh), (0, pm - m)))
    b3p = jnp.pad(b3.astype(jnp.bfloat16), ((0, 0), (0, pm - m)))
    hqp = jnp.pad(hq.astype(jnp.bfloat16),
                  ((0, pb - b), (0, 0), (0, pm - m)))
    return xv, w3p, b3p, hqp, (pb, pk, pdh, pm)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(x_v, w3, b3, hq, interpret: bool = False):
    b, k, _ = x_v.shape
    rank, m = b3.shape
    tb = FWD_TILE_B
    xv, w3p, b3p, hqp, (pb, pk, pdh, pm) = _pad(x_v, w3, b3, hq, tb)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rank, tb),
        grid=(pb // tb,),
        in_specs=[
            pl.BlockSpec((tb, pk, pdh), lambda i: (i, 0, 0)),
            pl.BlockSpec((rank, pdh, pm), lambda i: (0, 0, 0)),
            pl.BlockSpec((rank, pm), lambda i: (0, 0)),
            pl.BlockSpec((tb, rank, pm), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, pk, pm), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((pb, pk, pm), jnp.bfloat16),
        interpret=interpret,
    )(xv, w3p, b3p, hqp)
    return out[:b, :k, :m]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(x_v, w3, b3, hq, g, interpret: bool = False):
    b, k, dh = x_v.shape
    rank, m = b3.shape
    tb = BWD_TILE_B
    xv, w3p, b3p, hqp, (pb, pk, pdh, pm) = _pad(x_v, w3, b3, hq, tb)
    gp = jnp.pad(g.astype(jnp.bfloat16),
                 ((0, pb - b), (0, pk - k), (0, pm - m)))
    dxv, dhq, dw3, db3 = pl.pallas_call(
        functools.partial(_bwd_kernel, rank, tb),
        grid=(pb // tb,),
        in_specs=[
            pl.BlockSpec((tb, pk, pdh), lambda i: (i, 0, 0)),
            pl.BlockSpec((rank, pdh, pm), lambda i: (0, 0, 0)),
            pl.BlockSpec((rank, pm), lambda i: (0, 0)),
            pl.BlockSpec((tb, rank, pm), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, pk, pm), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tb, pk, pdh), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, rank, pm), lambda i: (i, 0, 0)),
            pl.BlockSpec((rank, pdh, pm), lambda i: (0, 0, 0)),
            pl.BlockSpec((rank, pm), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pb, pk, pdh), jnp.bfloat16),
            jax.ShapeDtypeStruct((pb, rank, pm), jnp.bfloat16),
            jax.ShapeDtypeStruct((rank, pdh, pm), jnp.float32),
            jax.ShapeDtypeStruct((rank, pm), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rank, pdh, pm), jnp.float32),
            pltpu.VMEM((rank, pm), jnp.float32),
        ],
        interpret=interpret,
    )(xv, w3p, b3p, hqp, gp)
    # dw3 back to the caller's (Dh, R, M) layout
    return (dxv[:b, :k, :dh], dhq[:b, :, :m],
            dw3[:, :dh, :m].transpose(1, 0, 2), db3[:, :m])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def folded_mutan_pallas(x_v, w3, b3, hq, interpret: bool = False):
    """``x_mm[b,k,m] = x_v[b,k] @ (sum_r w3[:,r,:] * hq[b,r,:]) + sum_r
    b3[r,:] * hq[b,r,:]`` without materializing weff in HBM.

    Shapes: x_v (B, K, Dh); w3 (Dh, R, M); b3 (R, M); hq (B, R, M).
    Returns (B, K, M) bf16.  Gradients flow to all four inputs (the
    attention stage is fully trainable in pretraining).
    """
    return _fwd_call(x_v, w3, b3, hq, interpret=interpret)


def _vjp_fwd(x_v, w3, b3, hq, interpret):
    return _fwd_call(x_v, w3, b3, hq, interpret=interpret), (x_v, w3, b3, hq)


def _vjp_bwd(interpret, res, g):
    x_v, w3, b3, hq = res
    dxv, dhq, dw3, db3 = _bwd_call(x_v, w3, b3, hq, g, interpret=interpret)
    return (dxv.astype(x_v.dtype), dw3.astype(w3.dtype),
            db3.astype(b3.dtype), dhq.astype(hq.dtype))


folded_mutan_pallas.defvjp(_vjp_fwd, _vjp_bwd)
