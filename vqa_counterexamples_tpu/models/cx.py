"""The counterexample (CX) model zoo — 9 scorers over 24 candidate images.

Flax re-design of reference ``vqa/models/cx.py``.  Shared contract
(cx.py:100): ``forward(image_features[B,K+1,2048], question_wids[B,26],
answer_aids[B]) -> scores[B,K]`` where index 0 of the candidate axis is the
original image and 1..K are its KNNs.

TPU-first changes vs the reference:

* ``vqa_forward`` (cx.py:64-104) flattens the candidate axis into the batch and
  runs seq2vec once per question — kept, but the whole thing is traced into a
  single XLA program (one fused MUTAN GEMM over B*(K+1) rows);
* every per-candidate Python loop (NeuralModel cx.py:289-331, Pairwise
  cx.py:363-374, Similarity cx.py:511-515, Contrastive cx.py:461-466) is a
  batched einsum over the candidate axis;
* NeuralModel's first layer uses the decomposed kernel in ``ops/scorer.py``;
* frozen-VQA semantics (cx.py:59-60, 73-80, 98-102) map to
  ``jax.lax.stop_gradient`` + deterministic (eval-mode) VQA dropout — with
  Adam, zero grads are exactly "requires_grad=False";
* the ``torch.rand`` lesion placeholders (cx.py:266-307) draw from the
  ``'lesion'`` PRNG collection so runs stay reproducible under jit.
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import scorer as scorer_ops
from ..ops.metrics import cosine_similarity, pairwise_distance


def _uniform(module: nn.Module, shape) -> jax.Array:
    """torch.rand placeholder: U[0,1) from the 'lesion' rng collection."""
    return jax.random.uniform(module.make_rng("lesion"), shape)


class RandomBaseline(nn.Module):
    """Uniform random scores (reference cx.py:20-30)."""
    knn_size: int = 24

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        batch = image_features.shape[0]
        return _uniform(self, (batch, self.knn_size))


class DistanceBaseline(nn.Module):
    """Scores = reversed NN-rank order, no params (reference cx.py:33-44)."""
    knn_size: int = 24

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        batch = image_features.shape[0]
        row = jnp.arange(self.knn_size - 1, -1, -1, dtype=jnp.float32)
        return jnp.broadcast_to(row[None, :], (batch, self.knn_size))


class CXModelBase(nn.Module):
    """Holds the VQA backbone and runs it over all K+1 images at once
    (reference cx.py:51-107)."""
    vqa_model: nn.Module
    knn_size: int = 24
    trainable_vqa: bool = False

    def vqa_forward(self, image_features: jax.Array, question_wids: jax.Array,
                    deterministic: bool = True, q_emb: jax.Array = None,
                    v_proj: jax.Array = None,
                 z_emb: jax.Array = None, want_logits: bool = True):
        # K+1 comes from the input shape (the reference asserts it equals
        # knn_size+1, cx.py:65, and mutates knn_size for pairwise eval —
        # shape-derived K serves both without mutation).  With the z cache
        # the raw features are never touched here, so callers on the fused
        # image-feature path may pass ``image_features=None``.
        if image_features is not None:
            batch, k1, _ = image_features.shape
        else:
            assert z_emb is not None, \
                "image_features=None requires the z_emb cache"
            batch, k1 = z_emb.shape[:2]

        # frozen VQA runs in eval mode (no dropout) regardless of CX training
        # (reference cx.py:59-60,78); trainable VQA follows the CX mode.
        vqa_det = True if not self.trainable_vqa else deterministic
        assert z_emb is None or not self.trainable_vqa, \
            "z_emb cache requires a frozen VQA backbone"
        # With a frozen VQA backbone the encoder output is deterministic per
        # question, so callers may pass a precomputed ``q_emb`` table row
        # (engines/cx_engine.precompute_q_emb) and skip the 26-step GRU —
        # bitwise the same activations the encoder would produce (the
        # reference prototyped exactly this caching in cache.ipynb).
        if q_emb is None:
            q_emb = self.vqa_model.encode_question(question_wids, vqa_det)
        if not self.trainable_vqa:
            q_emb = jax.lax.stop_gradient(q_emb)

        fuse_candidates = getattr(self.vqa_model, "fuse_candidates", None)
        if z_emb is not None:
            # precomputed fused embeddings per (example, candidate)
            # (engines/cx_engine.precompute_z_emb) — the caching logic of
            # q_emb/v_proj taken to its conclusion: with a frozen backbone
            # the whole fusion output is a training constant, so the
            # per-step fusion (v_proj gather + rank multiply-sum) collapses
            # to a single (B, K+1, dim_mm) row gather.  Bitwise the
            # activations the in-step fusion would produce.
            z = z_emb.reshape(batch * k1, -1)
        elif fuse_candidates is not None:
            # candidate-aware fusion: the question-side projections run once
            # per example, not once per candidate (reference cx.py:83-87
            # pays them K+1 times via the q duplication).  ``v_proj``:
            # precomputed per-image fusion projections
            # (engines/cx_engine.precompute_v_proj) — valid only for a
            # frozen backbone, where they are training constants.
            z = fuse_candidates(image_features, q_emb, vqa_det,
                                v_proj=v_proj).reshape(batch * k1, -1)
        else:
            assert v_proj is None, "v_proj cache needs fuse_candidates"
            q_dup = jnp.broadcast_to(q_emb[:, None, :],
                                     (batch, k1, q_emb.shape[-1]))
            q_dup = q_dup.reshape(batch * k1, -1)
            z = self.vqa_model.fuse(image_features.reshape(batch * k1, -1),
                                    q_dup, vqa_det)
        z = z.reshape(batch, k1, -1)
        if not self.trainable_vqa:
            z = jax.lax.stop_gradient(z)
        z_orig, z_knns = z[:, 0], z[:, 1:]

        # classify only the K candidate rows: no caller consumes the
        # original image's answer logits (the first return is always `_`),
        # and slicing the 360-wide z before the 2000-wide classifier
        # deletes the (B, K+1, ans) reshape/slice relayout copies the
        # trace showed at ~0.36 ms/step (B=512) when the slice came after.
        # ``want_logits=False``: the caller consumes the answer head fused
        # with the softmax mixture (ops/pallas/mixture_kernel.py) and skips
        # materializing the (B, K, ans) logits entirely.
        a_knns = None
        if want_logits:
            a_knns = self.vqa_model.classify(
                z_knns.reshape(batch * (k1 - 1), -1), vqa_det)
            a_knns = a_knns.reshape(batch, k1 - 1, -1)
            if not self.trainable_vqa:
                a_knns = jax.lax.stop_gradient(a_knns)

        return None, z_orig, a_knns, z_knns, q_emb

    def _fused_head_ok(self) -> bool:
        """Eligibility for the fused classify+softmax+mixture Pallas head
        (ops/pallas/mixture_kernel.py).

        VQACX_FUSED_HEAD: 'auto' (default) = on for single-device TPU runs
        under the bf16 policy, '1' = whenever eligible regardless of device
        count, 'interpret' = force through the Mosaic interpreter (CPU
        tests), '0' = always the jax path.  Hard requirements regardless of
        mode: frozen backbone (the kernel's only cotangent is d_ew) and an
        activation-free answer head (the kernel computes z @ W + b).
        'auto' stays off under a mesh — pallas_call has no GSPMD
        partitioning rule.
        """
        import os

        mode = os.environ.get("VQACX_FUSED_HEAD", "auto")
        if mode == "0" or self.trainable_vqa or self.is_initializing():
            return False
        if "activation" in self.vqa_model.opt.get("classif", {}):
            return False
        from ..core.policy import compute_dtype

        if compute_dtype() != jnp.bfloat16:
            return False
        if mode == "interpret":
            return True
        if jax.devices()[0].platform != "tpu":
            return False
        return mode == "1" or len(jax.devices()) == 1

    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        raise NotImplementedError


class BlackBox(CXModelBase):
    """score_i = -softmax(a_knn_i)[original answer] (reference cx.py:114-136):
    candidates likely to repeat the answer are bad counterexamples."""

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        _, _, a_knns, _, _ = self.vqa_forward(image_features, question_wids,
                                              deterministic, q_emb=q_emb,
            v_proj=v_proj, z_emb=z_emb)
        probs = jax.nn.softmax(a_knns, axis=-1)
        aid = answer_aids[:, None, None].astype(jnp.int32)
        return -jnp.take_along_axis(probs, aid, axis=-1)[..., 0]


class LinearContext(CXModelBase):
    """One linear over the concat of all K fused embeddings
    (reference cx.py:139-156)."""

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        _, _, _, z_knns, _ = self.vqa_forward(image_features, question_wids,
                                              deterministic, q_emb=q_emb,
            v_proj=v_proj, z_emb=z_emb)
        batch = z_knns.shape[0]
        return nn.Dense(self.knn_size, name="linear")(
            z_knns.reshape(batch, -1))


class SemanticBaseline(CXModelBase):
    """lam * (answer-similarity-weighted mass) - (1-lam) * log p(orig answer),
    softmaxed over candidates (reference cx.py:159-210).  The reference does
    this per-example in numpy on host; here it is one fused device computation.
    ``emb_pairs`` is the (A, A) cosine-similarity matrix of the answer
    embedding table (cx.py:173-175)."""
    lam: float = 0.5

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 emb_pairs: jax.Array = None, deterministic: bool = True,
                 q_emb: jax.Array = None, v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        assert emb_pairs is not None, "pass emb_pairs (A, A) cosine matrix"
        _, _, a_knns, _, _ = self.vqa_forward(image_features, question_wids,
                                              deterministic, q_emb=q_emb,
            v_proj=v_proj, z_emb=z_emb)
        nb = jax.nn.softmax(a_knns, axis=-1)                   # (B, K, A)
        sim_rows = emb_pairs[answer_aids.astype(jnp.int32)]    # (B, A)
        weighted_sim = jnp.einsum("ba,bka->bk", sim_rows, nb)
        aid = answer_aids[:, None, None].astype(jnp.int32)
        p_orig = jnp.take_along_axis(nb, aid, axis=-1)[..., 0]  # (B, K)
        # reference subtracts the candidate's own mass on the original answer
        # before mixing (cx.py:196-197), then uses log(p + 1e-8)
        weighted_sim = weighted_sim - p_orig
        logp = jnp.log(p_orig + 1e-8)
        scores = self.lam * weighted_sim - (1.0 - self.lam) * logp
        return jax.nn.softmax(scores, axis=-1)


class NeuralModel(CXModelBase):
    """NeuralCX (reference cx.py:218-333): a per-candidate MLP over the
    14089-d concat [v_orig, v_other, v_orig*v_other, ||v_orig-v_other||,
    rank-one-hot, q_emb, z_orig, z_other, a_emb_gt, a_emb_other], scored for
    all 24 candidates in one decomposed batched GEMM (ops/scorer.py).

    ``model_spec`` lesion flags replicate cx.py:265-307 including the quirk
    that the q_emb lesion only takes effect when z_emb is also lesioned
    (the reference's if/else at cx.py:270-277).
    """
    model_spec: Mapping[str, Any] = None
    dim_h: int = 300
    n_layers: int = 2
    drop_p: float = 0.25
    dim_a: int = 2400

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None,
                 features_table: jax.Array = None,
                 image_idxs: jax.Array = None):
        spec = self.model_spec
        K = self.knn_size
        if image_features is not None:
            batch, k1, _ = image_features.shape
        else:
            # table form (engines pass the feature table + per-example row
            # indices instead of the materialized (B, K+1, dim_v) gather):
            # the fused Pallas image-feature path reads the gathered rows
            # exactly once, K-major (ops/pallas/vfeat_kernel.py)
            assert features_table is not None and image_idxs is not None
            batch, k1 = image_idxs.shape
        assert k1 == K + 1

        dim_v = self.vqa_model.opt["fusion"]["dim_v"]
        dim_q = self.vqa_model.opt["fusion"]["dim_q"]
        dim_z = self.vqa_model.opt["fusion"]["dim_mm"]
        ans_size = len(self.vqa_model.vocab_answers)

        fused_v = (image_features is None and z_emb is not None
                   and self._fused_vfeat_ok())
        if image_features is None and not fused_v:
            # table form without the fused gate (e.g. initialization or an
            # env override): materialize the classic gather and fall through
            image_features = jnp.take(
                features_table, image_idxs.reshape(-1), axis=0, mode="clip"
            ).reshape(batch, k1, -1)

        if not spec["v_emb"]:
            image_features = _uniform(self, (batch, K + 1, dim_v))
            # lesioned features are redrawn per forward — the per-image
            # fusion-projection / per-example fused-embedding caches no
            # longer describe them
            v_proj = None
            z_emb = None
            fused_v = False
        if fused_v:
            v_orig = jnp.take(features_table, image_idxs[:, 0], axis=0,
                              mode="clip")
            v_knns = None
        else:
            v_orig = image_features[:, 0]
            v_knns = image_features[:, 1:]

        a_knns = None
        fused_z = None
        fused_head = spec["a_emb"] and self._fused_head_ok()
        if spec["q_emb"] or spec["z_emb"] or spec["a_emb"]:
            # (reference runs vqa_forward when q_emb or z_emb; it would crash
            # with a_emb=True and both false — we additionally run it then)
            _, z_orig, a_knns, z_knns, q_emb = self.vqa_forward(
                image_features, question_wids, deterministic, q_emb=q_emb,
            v_proj=v_proj, z_emb=z_emb, want_logits=not fused_head)
            if fused_head:
                # the real fused embeddings (pre any z lesion): the answer
                # logits derive from these even when the z feature itself
                # is lesioned (reference computes a from the true forward)
                fused_z = z_knns
            if not spec["q_emb"] and not spec["z_emb"]:
                q_emb = _uniform(self, (batch, dim_q))
                z_orig = _uniform(self, (batch, dim_z))
                z_knns = _uniform(self, (batch, K, dim_z))
        else:
            q_emb = _uniform(self, (batch, dim_q))
            z_orig = _uniform(self, (batch, dim_z))
            z_knns = _uniform(self, (batch, K, dim_z))

        answer_embedding = self.param(
            "answer_embedding", nn.initializers.normal(stddev=1.0),
            (ans_size, self.dim_a))
        a_emb_knns = a_emb_factored = None
        if spec["a_emb"]:
            # one-hot contraction instead of a row gather: the gather's
            # scatter-add transpose into the (2000, 2400) trainable table
            # dominates the answer-embedding backward (xplane: 0.29 ms/step
            # at B=384); the one-hot GEMM's transpose is a dense
            # (ans, B) x (B, dim_a) MXU matmul.  Exact same rows (multiply
            # by {0,1}, sum of one nonzero term per row).
            onehot_gt = jax.nn.one_hot(answer_aids.astype(jnp.int32),
                                       ans_size, dtype=jnp.float32)
            a_emb_gt = jnp.dot(onehot_gt, answer_embedding,
                               preferred_element_type=jnp.float32)
            # soft mixture of answer embeddings (reference bmm, cx.py:279-282)
            # — consumed only by the scorer's first layer, so it is passed in
            # factored (logits, table) form; the softmax happens inside the
            # re-associated contraction (ops/scorer.py first_layer_decomposed,
            # folded around the GEMM under the bf16 policy).  With the fused
            # Pallas head, the frozen classifier weights ride along and the
            # (B, K, ans) logits are never materialized at all.
            if fused_head:
                w_cls, b_cls = self.vqa_model.classif_params()
                a_emb_factored = ("fused", fused_z, w_cls, b_cls,
                                  answer_embedding)
            else:
                a_emb_factored = (a_knns, answer_embedding)
        else:
            a_emb_gt = _uniform(self, (batch, self.dim_a))
            a_emb_knns = _uniform(self, (batch, K, self.dim_a))

        if fused_v:
            # one K-major gather feeds the fused Pallas kernel; the
            # (B, K, dim_v) candidate rows, the v_mult product and the
            # distance never exist in HBM (ops/pallas/vfeat_kernel.py)
            v_mult = None
            v_dist = None  # computed with h_v_fused below, after w1 exists
        elif spec["v_mult"]:
            v_mult = v_orig[:, None, :] * v_knns
        else:
            v_mult = jnp.zeros((batch, K, dim_v))
        if fused_v:
            pass
        elif spec["v_dist"]:
            v_dist = pairwise_distance(v_orig[:, None, :], v_knns,
                                       keepdims=False)
        else:
            v_dist = jnp.zeros((batch, K))
        if spec["v_rank"]:
            v_rank = jnp.broadcast_to(jnp.eye(K)[None], (batch, K, K))
        else:
            # reference resamples rand per candidate inside the loop
            v_rank = _uniform(self, (batch, K, K))

        slices = scorer_ops.FeatureSlices(dim_v=dim_v, dim_q=dim_q,
                                          dim_z=dim_z, dim_a=self.dim_a,
                                          knn_size=K)
        w1 = self.param("linear_1_w", nn.initializers.lecun_normal(),
                        (slices.input_size, self.dim_h))
        b1 = self.param("linear_1_b", nn.initializers.zeros, (self.dim_h,))

        h_v_fused = None
        if fused_v:
            h_v_fused, v_dist = self._fused_vfeat(
                features_table, image_idxs, v_orig, w1, slices, batch, K)

        h = scorer_ops.first_layer_decomposed(
            w1, b1, slices, v_orig=v_orig, v_knns=v_knns, v_mult=v_mult,
            v_dist=v_dist, v_rank=v_rank, q_emb=q_emb, z_orig=z_orig,
            z_knns=z_knns, a_emb_gt=a_emb_gt, a_emb_knns=a_emb_knns,
            a_emb_knns_factored=a_emb_factored, h_v_fused=h_v_fused)

        hidden_ws, hidden_bs = [], []
        for layer in range(2, self.n_layers + 1):
            hidden_ws.append(self.param(f"linear_{layer}_w",
                                        nn.initializers.lecun_normal(),
                                        (self.dim_h, self.dim_h)))
            hidden_bs.append(self.param(f"linear_{layer}_b",
                                        nn.initializers.zeros, (self.dim_h,)))
        w_out = self.param("out_w", nn.initializers.lecun_normal(),
                           (self.dim_h, 1))
        b_out = self.param("out_b", nn.initializers.zeros, (1,))

        rng = None if (deterministic or self.drop_p == 0.0) \
            else self.make_rng("dropout")
        return scorer_ops.mlp_tail(h, hidden_ws, hidden_bs, w_out, b_out,
                                   drop_p=self.drop_p,
                                   deterministic=deterministic, rng=rng)

    def _fused_vfeat_ok(self) -> bool:
        """Eligibility for the fused image-feature Pallas kernel
        (ops/pallas/vfeat_kernel.py).

        VQACX_FUSED_VFEAT: 'auto' (default) = on for single-device TPU
        runs under the bf16 policy, '1' = whenever eligible regardless of
        device count, 'interpret' = force through the Mosaic interpreter
        (CPU tests), '0' = always the jax path.  Hard requirements: the
        full v-feature spec (v_emb + v_mult + v_dist — the kernel computes
        all three from one read), and a lane-aligned dim_v.  Callers
        additionally need the z cache (so nothing else consumes the raw
        candidate rows) — checked at the call sites.
        """
        import os

        spec = self.model_spec
        if not (spec["v_emb"] and spec["v_mult"] and spec["v_dist"]):
            return False
        if self.vqa_model.opt["fusion"]["dim_v"] % 128 != 0:
            return False
        mode = os.environ.get("VQACX_FUSED_VFEAT", "auto")
        if mode == "0":
            return False
        # unbound (engine builders probe via wants_table_features outside
        # apply): scope is None and is_initializing() would raise
        if self.scope is not None and self.is_initializing():
            return False
        from ..core.policy import compute_dtype

        if compute_dtype() != jnp.bfloat16:
            return False
        if mode == "interpret":
            return True
        if jax.devices()[0].platform != "tpu":
            return False
        return mode == "1" or len(jax.devices()) == 1

    def wants_table_features(self) -> bool:
        """Resolved OUTSIDE jit by engine step builders: when True, pass
        ``features_table=``/``image_idxs=`` instead of the materialized
        (B, K+1, dim_v) gather (requires the z cache)."""
        return self._fused_vfeat_ok()

    def _fused_vfeat(self, features_table, image_idxs, v_orig, w1, slices,
                     batch, K):
        """K-major gather + fused Pallas kernel -> (h_v (B,K,H), dist)."""
        import os

        from ..core.policy import cast_in
        from ..ops.pallas.vfeat_kernel import vfeat_scores_pallas

        interpret = os.environ.get("VQACX_FUSED_VFEAT") == "interpret"
        offs = slices.offsets()
        # transposed slices: bitwise the {0,1} layout the classic GEMMs
        # read, so the pallas operand constraint can't flip the w1 state
        # layout (see vfeat_kernel._fwd_kernel)
        woT = cast_in(w1[slice(*offs["v_other"])]).T
        wmT = cast_in(w1[slice(*offs["v_mult"])]).T
        dim_v = features_table.shape[-1]
        # pad the *index* rows to the kernel's preferred example tile (64)
        # so no padding copy of feature rows is ever materialized (garbage
        # rows gathered from row 0, sliced off below)
        pb = -(-batch // 64) * 64
        idxs = image_idxs
        if pb != batch:
            idxs = jnp.pad(image_idxs, ((0, pb - batch), (0, 0)))
        idx_k = jnp.transpose(idxs[:, 1:]).reshape(-1)  # K-major rows
        # mode="clip": the default 'fill' adds a full-size select pass
        # over the gathered rows that cannot fuse into the pallas call
        xk3 = jnp.take(features_table, idx_k, axis=0,
                       mode="clip").reshape(K, pb, dim_v)
        xo = v_orig
        if pb != batch:
            xo = jnp.pad(xo, ((0, pb - batch), (0, 0)))
        hkb, dkb = vfeat_scores_pallas(cast_in(xk3), cast_in(xo), woT, wmT,
                                       0, interpret)
        # (K, pB, .) -> (B, K, .): XLA fuses these transposes into the
        # elementwise feature-sum consumers
        h_v = jnp.transpose(hkb, (1, 0, 2))[:batch]
        v_dist = jnp.transpose(dkb[..., 0], (1, 0))[:batch]
        return h_v, v_dist


class PairwiseModel(CXModelBase):
    """Hard-negative pairwise scorer (reference cx.py:336-376): MLP over
    [v_orig, v_other, q_emb, z_other] -> relu(score); trained with K=2
    (comp vs a random other), evaluated with K=24.  K comes from the input
    shape, so the same params serve both (the reference mutates
    ``cx_model.knn_size``, counterexamples.py:461-471)."""

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        batch, k1, dim_v = image_features.shape
        K = k1 - 1
        v_orig = image_features[:, 0]
        v_knns = image_features[:, 1:]

        _, _, _, z_knns, q_emb = self.vqa_forward(
            image_features, question_wids, deterministic, q_emb=q_emb,
            v_proj=v_proj, z_emb=z_emb)
        z_knns = jax.lax.stop_gradient(z_knns)  # reference cx.py:359

        dim_h = 300
        linear = nn.Dense(dim_h, name="linear")
        out = nn.Dense(1, name="out")

        def tile(x):
            return jnp.broadcast_to(x[:, None, :], (batch, K, x.shape[-1]))

        x = jnp.concatenate([tile(v_orig), v_knns, tile(q_emb), z_knns],
                            axis=-1)
        h = jax.nn.relu(linear(x))
        return jax.nn.relu(out(h))[..., 0]


class PairwiseLinearModel(CXModelBase):
    """24-way pairwise variant with a learned 300-d answer embedding
    (reference cx.py:379-425)."""
    dim_a: int = 300

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        batch, k1, _ = image_features.shape
        K = k1 - 1
        v_orig = image_features[:, 0]
        v_knns = image_features[:, 1:]

        _, z_orig, _, z_knns, q_emb = self.vqa_forward(
            image_features, question_wids, deterministic, q_emb=q_emb,
            v_proj=v_proj, z_emb=z_emb)

        a_emb = nn.Embed(len(self.vqa_model.vocab_answers), self.dim_a,
                         name="answer_embedding")(
            answer_aids.astype(jnp.int32))

        def tile(x):
            return jnp.broadcast_to(x[:, None, :], (batch, K, x.shape[-1]))

        x = jnp.concatenate([tile(v_orig), v_knns, tile(q_emb), tile(z_orig),
                             z_knns, tile(a_emb)], axis=-1)
        h = jax.nn.relu(nn.Dense(300, name="linear")(x))
        return jax.nn.relu(nn.Dense(1, name="out")(h))[..., 0]


class ContrastiveModel(CXModelBase):
    """Embeds each of the K+1 images to h = relu(Linear([v, z])) (reference
    cx.py:428-487); trained with the margin contrastive loss in
    engines/contrastive_engine.py; scored by Euclidean distance orig<->cand."""
    dim_h: int = 300

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        batch, k1, _ = image_features.shape
        _, z_orig, _, z_knns, _ = self.vqa_forward(
            image_features, question_wids, deterministic, q_emb=q_emb,
            v_proj=v_proj, z_emb=z_emb)
        z_all = jnp.concatenate([z_orig[:, None, :], z_knns], axis=1)
        x = jnp.concatenate([image_features, z_all], axis=-1)
        return jax.nn.relu(nn.Dense(self.dim_h, name="linear")(x))

    @staticmethod
    def get_scores(h_orig: jax.Array, h_knns: jax.Array) -> jax.Array:
        """Euclidean distances (B, K); larger = better counterexample
        (reference cx.py:478-487 + contrastive.py eval)."""
        return pairwise_distance(h_orig[:, None, :], h_knns, keepdims=False)


class SimilarityModel(CXModelBase):
    """Unparameterized: v-cosine + z-cosine + answer cross-entropy
    (reference cx.py:490-518)."""

    @nn.compact
    def __call__(self, image_features, question_wids, answer_aids,
                 deterministic: bool = True, q_emb: jax.Array = None,
                 v_proj: jax.Array = None,
                 z_emb: jax.Array = None):
        _, z_orig, a_knns, z_knns, _ = self.vqa_forward(
            image_features, question_wids, deterministic, q_emb=q_emb,
            v_proj=v_proj, z_emb=z_emb)
        v_orig = image_features[:, 0]
        v_knns = image_features[:, 1:]
        v_cos = cosine_similarity(v_orig[:, None, :], v_knns)
        z_cos = cosine_similarity(z_orig[:, None, :], z_knns)
        logp = jax.nn.log_softmax(a_knns, axis=-1)
        aid = answer_aids[:, None, None].astype(jnp.int32)
        a_xent = -jnp.take_along_axis(logp, aid, axis=-1)[..., 0]
        return v_cos + z_cos + a_xent


def init_answer_embedding(params: dict, emb) -> dict:
    """Graft a pretrained (A, 2400) answer-embedding table into NeuralModel
    params (reference cx.py:240-243 loads answer_embedding.pickle)."""
    import numpy as np

    emb = jnp.asarray(np.asarray(emb, dtype=np.float32))
    new = dict(params)
    assert new["answer_embedding"].shape == emb.shape, (
        new["answer_embedding"].shape, emb.shape)
    new["answer_embedding"] = emb
    return new
