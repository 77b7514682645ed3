"""Pallas TPU kernel fusing NeuralCX's candidate image-feature pipeline.

The scorer's three image-side features all derive from the same gathered
(B, K, dim_v) candidate rows (reference cx.py:289-331 builds them one
candidate at a time inside the Python loop):

    v_other:  v_knns @ W_other
    v_mult:   (v_orig * v_knns) @ W_mult
    v_dist:   ||v_orig - v_knns + eps||_2

At B=768/K=24/dim_v=2048 the XLA lowering moves ~0.9 GB/step over these
75 MB tensors: the gather's output is materialized, relayouted {2,1,0} ->
{0,2,1} (two full copies), the v_mult product is materialized, both
forward GEMMs read their operand from HBM, and the backward dW GEMMs read
both AGAIN (xplane 2026-08-21: gather 0.236 + reshape 0.154 + layout copy
0.293 + v_mult 0.105 + fwd 0.126 + bwd 0.121 + dist 0.033 ~= 1.07 of a
3.09 ms step).  This kernel reads the gathered rows exactly ONCE forward
and ONCE backward: v_mult and the distance live only in VMEM, and the
weight cotangents accumulate across the sequential grid in a VMEM-resident
f32 block.

Layout trick: the caller gathers candidate rows K-MAJOR — ``(K, B, dim_v)``
via ``take(table, idxs[:, 1:].T.reshape(-1))`` — so an example-block of
shape (K, TB, dim_v) pairs with the (TB, dim_v) v_orig block by a free
leading-axis broadcast (no per-group row expansion), the two GEMMs see
K*TB well-shaped MXU rows, and outputs block naturally as (K, TB, .).
The (K, B, H) -> (B, K, H) transpose happens outside, where XLA fuses it
into the elementwise feature-sum chain.

No cotangent flows into the features (they are frozen data — the gather
source is the dataset feature table), so the backward needs only the two
(dim_v, H) weight grads; v_mult is recomputed from the VMEM-resident rows
rather than saved.

Numerics match the XLA path (ops/scorer.py under the bf16 policy): each
GEMM accumulates f32 in the MXU and rounds its own output to the policy
dtype before the sum.  The distance improves on the XLA path: the diff and
the 2048-wide sum of squares run in f32 instead of bf16 (torch
F.pairwise_distance semantics, eps inside the norm — ops/metrics.py:59).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIST_EPS = 1e-6
# the default scoped-VMEM budget is 16 MB; the backward's working set
# (double-buffered (K, TB, dim_v) block + two f32 (dim_v, H) accumulators +
# the recomputed mult) measured 16.95 MB at K=24/TB=16/dim_v=2048 — raise
# the cap so the compiler can use the chip's real VMEM
VMEM_LIMIT = 64 * 1024 * 1024


def _fwd_kernel(xk_ref, xo_ref, woT_ref, wmT_ref, h_ref, d_ref):
    k, tb, dv = xk_ref.shape
    x3 = xk_ref[:]                       # (K, TB, Dv) bf16
    o = xo_ref[:]                        # (TB, Dv) bf16
    m3 = x3 * o[None]
    xf = x3.reshape(k * tb, dv)
    mf = m3.reshape(k * tb, dv)
    out_dt = h_ref.dtype
    # weights arrive TRANSPOSED (H, Dv): bitwise the classic path's
    # (Dv, H) {0,1} slice layout, so the pallas operand constraint never
    # forces a relayout of the w1 param state (the un-transposed form
    # measured ~0.34 ms/step of new f32[14089,300] {0,1}<->{1,0} copies
    # around the Adam update)
    dims_fwd = (((1,), (1,)), ((), ()))
    h = (jax.lax.dot_general(xf, woT_ref[:], dimension_numbers=dims_fwd,
                             preferred_element_type=jnp.float32)
         .astype(out_dt)
         + jax.lax.dot_general(mf, wmT_ref[:], dimension_numbers=dims_fwd,
                               preferred_element_type=jnp.float32)
         .astype(out_dt))
    h_ref[:] = h.reshape(k, tb, -1)
    diff = o[None].astype(jnp.float32) - x3.astype(jnp.float32) + DIST_EPS
    d_ref[:] = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True))


def _bwd_kernel(xk_ref, xo_ref, g_ref, dwoT_ref, dwmT_ref):
    i = pl.program_id(0)
    k, tb, dv = xk_ref.shape
    x3 = xk_ref[:]
    o = xo_ref[:]
    m3 = x3 * o[None]
    xf = x3.reshape(k * tb, dv)
    mf = m3.reshape(k * tb, dv)
    gf = g_ref[:].reshape(k * tb, -1)
    # contract over the K*TB row axis: dW^T = g^T x, f32 MXU accumulation
    dims = (((0,), (0,)), ((), ()))
    dwo = jax.lax.dot_general(gf, xf, dimension_numbers=dims,
                              preferred_element_type=jnp.float32)
    dwm = jax.lax.dot_general(gf, mf, dimension_numbers=dims,
                              preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dwoT_ref[:] = dwo
        dwmT_ref[:] = dwm

    @pl.when(i > 0)
    def _():
        dwoT_ref[:] = dwoT_ref[:] + dwo
        dwmT_ref[:] = dwmT_ref[:] + dwm


def _pick_tile(batch: int) -> int:
    # measured on the v5e headline workload (B=768, K=24, dim_v=2048,
    # 2026-08-21, same-session sweep): tile 16 = 250.1k examples/sec,
    # 32 = 254.1k, 64 = 254.5k, 96 = 251.9k, 128 = 244.0k — 64 is the
    # sweet spot before VMEM pressure degrades pipelining.
    # VQACX_VFEAT_TILE overrides for tuning (resolved at trace time; must
    # divide the padded batch or the auto chain is used).
    import os

    t = int(os.environ.get("VQACX_VFEAT_TILE", "0"))
    if t > 0 and batch % t == 0:
        return t
    for auto in (64, 32, 16):
        if batch % auto == 0:
            return auto
    return 16


def _fwd_call(xk3, xo, woT, wmT, tile_b: int, interpret: bool):
    k, batch, dv = xk3.shape
    h = woT.shape[0]
    grid = (batch // tile_b,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tile_b, dv), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, dv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, dv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, dv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, tile_b, h), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_b, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, batch, h), xk3.dtype),
            jax.ShapeDtypeStruct((k, batch, 1), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * k * batch * dv * h,
            bytes_accessed=(k * batch * dv + batch * dv + 2 * dv * h
                            + k * batch * h) * 2 + k * batch * 4,
            transcendentals=0),
    )(xk3, xo, woT, wmT)


def _bwd_call(xk3, xo, g, tile_b: int, interpret: bool):
    k, batch, dv = xk3.shape
    h = g.shape[-1]
    grid = (batch // tile_b,)
    dwo, dwm = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tile_b, dv), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, dv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_b, h), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((h, dv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, dv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, dv), jnp.float32),
            jax.ShapeDtypeStruct((h, dv), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * k * batch * dv * h,
            bytes_accessed=(k * batch * dv + batch * dv
                            + k * batch * h) * 2 + 2 * dv * h * 4,
            transcendentals=0),
    )(xk3, xo, g)
    return dwo, dwm


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def vfeat_scores_pallas(xk3: jax.Array, xo: jax.Array, w_otherT: jax.Array,
                        w_multT: jax.Array, tile_b: int = 0,
                        interpret: bool = False):
    """Fused v_other/v_mult/v_dist for K-major candidate rows.

    xk3: (K, B, dim_v) gathered candidate feature rows (K-major; frozen
    data — no cotangent is produced for them); xo: (B, dim_v) original
    image rows; w_otherT/w_multT: (H, dim_v) TRANSPOSED first-layer weight
    slices in the compute dtype — bitwise the (dim_v, H) {0,1} layout the
    classic GEMMs read, so passing ``w1_slice.T`` costs nothing and the
    param state keeps its layout; cotangents come back (H, dim_v) and the
    caller-side ``.T`` transposes them for free.  Returns ``h (K, B, H)``
    in xk3's dtype (each GEMM
    f32-accumulated then rounded, summed in the storage dtype — ordering
    matches ops/scorer.py's pdot chain) and ``dist (K, B, 1)`` f32.  The
    caller transposes to (B, K, .); XLA fuses that into the consumers.

    ``tile_b=0`` picks the largest example tile dividing B (B must be a
    multiple of 16 — callers pad the *index* array before the gather so
    no feature-row padding copy is ever paid).  ``interpret`` runs the
    Mosaic interpreter (CPU tests).
    """
    h, dist, _ = _vfeat_fwd_impl(xk3, xo, w_otherT, w_multT, tile_b,
                                 interpret)
    return h, dist


def _vfeat_fwd_impl(xk3, xo, w_otherT, w_multT, tile_b, interpret):
    k, batch, dv = xk3.shape
    tb = tile_b or _pick_tile(batch)
    assert batch % tb == 0, (batch, tb)
    h, dist = _fwd_call(xk3, xo, w_otherT, w_multT, tb, interpret)
    return h, dist, tb


def _vfeat_fwd(xk3, xo, w_otherT, w_multT, tile_b, interpret):
    h, dist, tb = _vfeat_fwd_impl(xk3, xo, w_otherT, w_multT, tile_b,
                                  interpret)
    # zero-size dtype carriers: residuals must be jax values, and the weight
    # cotangents must come back in the weights' own dtype
    wo_proto = jnp.zeros((0,), w_otherT.dtype)
    wm_proto = jnp.zeros((0,), w_multT.dtype)
    del tb  # recomputed in bwd from static shapes
    return (h, dist), (xk3, xo, wo_proto, wm_proto)


def _vfeat_bwd(tile_b, interpret, res, cts):
    xk3, xo, wo_proto, wm_proto = res
    wo_dt, wm_dt = wo_proto.dtype, wm_proto.dtype
    tb = tile_b or _pick_tile(xk3.shape[1])
    g_h, _g_dist = cts  # dist depends only on frozen features: no grads
    g_h = g_h.astype(xk3.dtype)
    dwo, dwm = _bwd_call(xk3, xo, g_h, tb, interpret)
    # features are frozen dataset rows; their cotangents are never consumed
    # (the train step differentiates w.r.t. trainable params only) — the
    # zeros below are DCE'd by XLA.
    return (jnp.zeros_like(xk3), jnp.zeros_like(xo),
            dwo.astype(wo_dt), dwm.astype(wm_dt))


vfeat_scores_pallas.defvjp(_vfeat_fwd, _vfeat_bwd)
