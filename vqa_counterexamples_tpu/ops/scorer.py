"""Batched candidate scoring for NeuralCX.

The reference loops over the 24 candidates in Python, each iteration building a
14089-d concat and pushing it through the MLP (``vqa/models/cx.py:289-331``).
Here the whole candidate axis is one batched GEMM, and the first layer is
algebraically decomposed so work that is constant across candidates is done
once per example:

    concat([s_1..s_m, c_1..c_n]) @ W  ==  sum_i s_i @ W_si  +  sum_j c_j @ W_cj

* static features (v_orig, q_emb, z_orig, a_emb_gt): one (B, 7208) GEMM,
  broadcast over candidates;
* the one-hot rank feature's GEMM is the identity: its contribution is just a
  row of W, added as a (K, H) broadcast;
* the scalar v_dist feature is a rank-1 outer product;
* per-candidate features (v_other, v_mult, z_other, a_emb_other): a single
  (B*K, 6856) GEMM.

This turns 24 small launches into 2 large MXU-friendly ones and cuts first-layer
FLOPs ~1.9x (the static half of W is applied once, not 24 times).

Weights are stored exactly as one (14089, H) matrix (checkpoint-compatible with
a straightforward port of the reference layout); slicing below is static so XLA
constant-folds it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng as rng_lib


class FeatureSlices(NamedTuple):
    """Column offsets of each feature block inside the fused first-layer weight.

    Order matches the reference concat (cx.py:309-320):
    v_orig, v_other, v_mult, v_dist, v_rank, q_emb, z_orig, z_other,
    a_emb_gt, a_emb_other.
    """
    dim_v: int
    dim_q: int
    dim_z: int
    dim_a: int
    knn_size: int

    @property
    def input_size(self) -> int:
        return (3 * self.dim_v + 1 + self.knn_size + self.dim_q
                + 2 * self.dim_z + 2 * self.dim_a)

    def offsets(self):
        sizes = [self.dim_v, self.dim_v, self.dim_v, 1, self.knn_size,
                 self.dim_q, self.dim_z, self.dim_z, self.dim_a, self.dim_a]
        names = ["v_orig", "v_other", "v_mult", "v_dist", "v_rank",
                 "q_emb", "z_orig", "z_other", "a_emb_gt", "a_emb_other"]
        out, off = {}, 0
        for name, size in zip(names, sizes):
            out[name] = (off, off + size)
            off += size
        return out


def first_layer_decomposed(w1: jax.Array, b1: jax.Array,
                           slices: FeatureSlices,
                           v_orig: jax.Array, v_knns: jax.Array,
                           v_mult: jax.Array, v_dist: jax.Array,
                           v_rank: jax.Array,
                           q_emb: jax.Array, z_orig: jax.Array,
                           z_knns: jax.Array, a_emb_gt: jax.Array,
                           a_emb_knns: jax.Array = None,
                           a_emb_knns_factored: tuple = None,
                           h_v_fused: jax.Array = None) -> jax.Array:
    """Pre-activation of linear_1 for all candidates at once.

    Shapes: v_orig (B,Dv); v_knns/v_mult (B,K,Dv); v_dist (B,K);
    v_rank (B,K,K); q_emb (B,Dq); z_orig (B,Dz); z_knns (B,K,Dz);
    a_emb_gt (B,Da); a_emb_knns (B,K,Da).  Returns (B, K, H).

    ``a_emb_knns_factored=(logits (B,K,A), table (A,Da))`` supplies the soft
    answer-embedding mixture (cx.py:279-282) in factored form: its only
    consumer is this layer, so ``(softmax(a) @ E) @ W_a`` is re-associated
    as ``softmax(a) @ (E @ W_a)`` — the (A,Da)x(Da,H) product is tiny and
    the big GEMM shrinks from Da=2400 to H columns (~8x fewer FLOPs at
    reference dims, and the backward into E drops from a (A,B*K)x(B*K,Da)
    GEMM to (A,H)x(H,Da)).  Same math, different rounding order.

    Under the bf16 compute policy the softmax itself is folded around the
    GEMM: ``softmax(x) @ M == (exp(x - max) @ M) / sum(exp(x - max))`` —
    the normalized (B*K, A) probs matrix never exists in HBM and the
    division happens on the (B*K, H) output instead (the f32 softmax chain
    cost ~0.37 ms/step at B=512/A=2000: a relayout-to-f32 copy of the
    logits, the divide pass, and a relayout back).  The f32 policy keeps
    the exact reference rounding (softmax then dot).

    ``h_v_fused``: the precomputed v_other + v_mult first-layer
    contribution (B, K, H) from the fused image-feature Pallas kernel
    (ops/pallas/vfeat_kernel.py) — when given, ``v_knns``/``v_mult`` are
    unused (may be None) and their GEMMs are skipped here; the kernel
    already applied the same per-dot rounding.
    """
    offs = slices.offsets()

    def wslice(name):
        lo, hi = offs[name]
        return w1[lo:hi]

    from ..core.policy import cast_in, pdot

    # Static-across-candidates half: one GEMM on the concatenated block.
    w_static = jnp.concatenate(
        [wslice("v_orig"), wslice("q_emb"), wslice("z_orig"),
         wslice("a_emb_gt")], axis=0)
    x_static = jnp.concatenate([v_orig, q_emb, z_orig, a_emb_gt], axis=-1)
    h_static = pdot(x_static, w_static)  # (B, H), policy dtype

    # Per-candidate half: one GEMM over the flattened (B*K) axis.  All the
    # h blocks below come out of ``pdot`` in the policy dtype (f32
    # accumulation inside the MXU, one rounding on the output), so under
    # bf16 the (B*K, H) tensors flowing between first layer, tail, and
    # their backward transposes are bf16-resident — half the HBM traffic
    # of the earlier keep-everything-f32 form.
    if h_v_fused is None:
        cand_names = ["v_other", "v_mult", "z_other"]
        cand_feats = [v_knns, v_mult, z_knns]
    else:
        cand_names = ["z_other"]
        cand_feats = [z_knns]
    h_aemb = 0.0
    if (a_emb_knns_factored is not None
            and isinstance(a_emb_knns_factored[0], str)):
        # fused Pallas answer head: classify -> softmax in one
        # VMEM-resident kernel; the (B*K, A) logits never touch HBM
        # (ops/pallas/mixture_kernel.py).  probs is a gradient constant
        # (frozen head, stop-gradded z), so d_ew stays a plain XLA GEMM.
        _, zk, w_cls, b_cls, table = a_emb_knns_factored
        from ..ops.pallas.mixture_kernel import classify_softmax_pallas
        import os

        interp = os.environ.get("VQACX_FUSED_HEAD") == "interpret"
        ew = pdot(table, wslice("a_emb_other"))  # (A, H)
        Bp, Kp = zk.shape[:2]
        probs = jax.lax.stop_gradient(classify_softmax_pallas(
            cast_in(zk.reshape(Bp * Kp, -1)), w_cls, b_cls, 256, interp))
        h_aemb = pdot(probs, ew).reshape(Bp, Kp, -1)
    elif a_emb_knns_factored is not None:
        logits, table = a_emb_knns_factored
        lt = cast_in(logits)
        ew = pdot(table, wslice("a_emb_other"))  # (A, H)
        # flat (B*K, A) x (A, H) instead of the bka,ah->bkh einsum: the
        # batched form relayouted the (B, K, A) probs {2,1,0}->{0,2,1}
        # before contracting (0.16 ms/step at B=512, A=2000)
        Bp, Kp = logits.shape[:2]
        if lt.dtype == jnp.bfloat16:
            # bf16 policy: softmax folded around the GEMM (see docstring);
            # exp in bf16, the normalizer accumulated f32, division on the
            # H-wide output
            m = jnp.max(lt, axis=-1, keepdims=True)
            u = jnp.exp(lt - m)
            s = jnp.sum(u, axis=-1, keepdims=True, dtype=jnp.float32)
            uh = pdot(u.reshape(Bp * Kp, -1), ew)
            # multiply by a bf16 reciprocal instead of dividing by the f32
            # sum: u and s are gradient constants (the logits are
            # stop-gradded), so this keeps the whole chain — including the
            # backward d_uh = g * r feeding the d_ew transpose GEMM — in
            # bf16 (the f32 divide's backward materialized two (B*K, H)
            # f32 relayout copies, ~0.16 ms/step at B=768)
            r = (1.0 / s.reshape(Bp * Kp, 1)).astype(uh.dtype)
            h_aemb = (uh * r).reshape(Bp, Kp, -1)
        else:
            probs = jax.nn.softmax(lt, axis=-1)
            h_aemb = pdot(probs.reshape(Bp * Kp, -1),
                          ew).reshape(Bp, Kp, -1)
    else:
        cand_names.append("a_emb_other")
        cand_feats.append(a_emb_knns)
    # one dot per feature block, summed: concat([x1,x2,x3]) @ concat(W) ==
    # sum_i x_i @ W_i, but without materializing the (B*K, 6856) concat in
    # HBM (~170 MB/step at reference dims) — the blocks are read where they
    # already live.  (Pre-flattening these to (B*K, D) 2-D dots measured
    # neutral — 160.2k vs 161.3k same-session at B=512 — XLA already
    # flattens the batched contraction.)
    h_cand = h_aemb
    for name, feat in zip(cand_names, cand_feats):
        h_cand = h_cand + pdot(feat, wslice(name))
    if h_v_fused is not None:
        h_cand = h_cand + h_v_fused

    # Rank one-hot: identity GEMM == per-candidate rows of W (or a dense GEMM
    # for the lesion case where v_rank is random instead of one-hot).
    h_rank = cast_in(jnp.einsum("bkr,rh->bkh", v_rank, wslice("v_rank")))

    # Scalar distance feature: rank-1 outer product.
    h_dist = cast_in(v_dist[..., None] * wslice("v_dist")[0][None, None, :])

    return (h_static[:, None, :] + h_cand + h_rank + h_dist + cast_in(b1))


def mlp_tail(h: jax.Array, hidden_ws, hidden_bs, w_out: jax.Array,
             b_out: jax.Array, *, drop_p: float, deterministic: bool,
             rng: jax.Array | None) -> jax.Array:
    """ReLU+dropout stack over (B, K, H) then the scalar head -> (B, K).

    ``h`` is the pre-activation of linear_1; layers 2..n use ``hidden_ws``.
    Dropout placement matches the reference: after every ReLU (cx.py:322-326).
    """
    from ..core.policy import cast_in, pdot

    def drop(x, key):
        if deterministic or drop_p == 0.0:
            return x
        keep, scale = rng_lib.keep_mask(key, 1.0 - drop_p, x.shape)
        return jnp.where(keep, x * scale, 0.0)

    n_drops = 1 + len(hidden_ws)
    keys = (jax.random.split(rng, n_drops) if rng is not None
            else [None] * n_drops)

    h = drop(jax.nn.relu(h), keys[0])
    for i, (w, b) in enumerate(zip(hidden_ws, hidden_bs)):
        # pdot keeps the activations in the policy dtype between layers
        # (and, under bf16, runs the GEMM on the MXU's bf16 path — the
        # tail GEMMs previously ran f32 regardless of policy)
        h = drop(jax.nn.relu(pdot(h, w) + cast_in(b)), keys[i + 1])
    # the scalar head stays f32: the 24-way CE loss reads these scores
    xo, wo = cast_in(h, w_out)
    return (jnp.dot(xo, wo, preferred_element_type=jnp.float32)
            + b_out)[..., 0]


def naive_concat_first_layer(w1, b1, slices: FeatureSlices, **feats):
    """Reference-faithful concat path, used as the test oracle for the
    decomposed kernel (and by the lesion tests)."""
    B, K = feats["v_knns"].shape[:2]

    def tile(x):  # (B, D) -> (B, K, D)
        return jnp.broadcast_to(x[:, None, :], (B, K, x.shape[-1]))

    x = jnp.concatenate([
        tile(feats["v_orig"]), feats["v_knns"], feats["v_mult"],
        feats["v_dist"][..., None], feats["v_rank"], tile(feats["q_emb"]),
        tile(feats["z_orig"]), feats["z_knns"], tile(feats["a_emb_gt"]),
        feats["a_emb_knns"]], axis=-1)
    assert x.shape[-1] == slices.input_size
    return x @ w1 + b1
