"""Pallas TPU kernel fusing the frozen answer head with its softmax.

NeuralCX's answer-mixture feature needs ``softmax(z @ W_cls + b)`` over the
A=2000 answer vocabulary for every candidate row (reference cx.py:279-282
composed with the frozen classifier).  The XLA path materializes the
(B*K, A) logits in HBM (the classifier GEMM's output) and then reads them
back through the exp/sum fusion — ~2 x 71 MB of traffic at B=768.  This
kernel walks row blocks with W_cls resident in VMEM and emits the softmax
directly; the logits never exist in HBM:

    per block:  l = round_bf16(z_blk @ W_cls) + b      (MXU, f32 accum)
                u = exp(l - rowmax(l)); s = rowsum_f32(u)
                probs_blk = u * round_bf16(1/s)

The consumer contracts probs against the tiny (A, H) mixture matrix
(``ops/scorer.py``); probs is a gradient constant there (the classifier is
frozen and its input stop-gradded), so the kernel needs no VJP — callers
wrap the output in ``stop_gradient`` and the d_ew transpose GEMM reads
probs like any other operand.

A fuller variant that also folded the (A, H) mixture GEMM into the kernel
(output (M, H), custom VJP) measured a net LOSS end-to-end — 194.9k vs
204.2k examples/sec same-session 2026-08-18 — because its backward had to
recompute the classify GEMM + exp per step (~0.25 ms) to rebuild u for
d_ew, outweighing the ~0.15 ms of u-traffic it saved.  Keeping probs in
HBM and the backward in XLA avoids the recompute.

Padding: A pads with bias -1e9 so exp -> 0 exactly; dz pads with zeros;
M pads to the row tile (garbage rows sliced off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128
NEG_BIG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(z_ref, w_ref, b_ref, out_ref):
    l = jnp.dot(z_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    l = l.astype(jnp.bfloat16) + b_ref[:]
    m = jnp.max(l, axis=1, keepdims=True)
    u = jnp.exp(l - m)
    s = jnp.sum(u.astype(jnp.float32), axis=1, keepdims=True)
    out_ref[:] = u * (1.0 / s).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def classify_softmax_pallas(z, w_cls, b_cls, tile_m: int = 256,
                            interpret: bool = False):
    """(M, dz) rows x frozen (dz, A) head -> softmax probs (M, A) bf16.

    Numerics match the jax bf16-policy path: the logits round to bf16 (as
    the policy-typed Dense does), exp runs in bf16, the normalizer
    accumulates f32, and the division applies as a bf16 reciprocal.
    Callers must treat the output as a gradient constant
    (``jax.lax.stop_gradient``) — valid exactly when the head is frozen,
    which is what the model-side gate requires.
    """
    mm, dz = z.shape
    a = w_cls.shape[1]
    pm, pz, pa = (_round_up(mm, tile_m), _round_up(dz, LANE),
                  _round_up(a, LANE))
    zp = jnp.pad(z.astype(jnp.bfloat16), ((0, pm - mm), (0, pz - dz)))
    wp = jnp.pad(w_cls.astype(jnp.bfloat16), ((0, pz - dz), (0, pa - a)))
    # bias pads with a large negative so padded answer columns exp to zero
    # (they would otherwise pollute the row sum)
    bp = jnp.pad(b_cls.astype(jnp.bfloat16), (0, pa - a),
                 constant_values=jnp.bfloat16(NEG_BIG))[None, :]
    out = pl.pallas_call(
        _kernel,
        grid=(pm // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, pz), lambda i: (i, 0)),
            pl.BlockSpec((pz, pa), lambda i: (0, 0)),
            pl.BlockSpec((1, pa), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, pa), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pm, pa), jnp.bfloat16),
        interpret=interpret,
    )(zp, wp, bp)
    return out[:mm, :a]
