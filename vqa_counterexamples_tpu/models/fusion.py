"""Multimodal fusion modules: MLB (Hadamard) and MUTAN (Tucker rank-R).

Flax re-design of reference ``vqa/models/fusion.py``.  The MUTAN R-loop
(fusion.py:100-116) is replaced by the fused einsum in ``ops/fusion.py``;
parameters are stored in the stacked (din, R*dmm) layout so the projection is
one GEMM.  Option keys match the reference YAML blocks (dim_v, dim_q, dim_hv,
dim_hq, dim_mm, R, dropout_*, activation_*).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import fusion as fusion_ops
from .common import dropout


def _att_pallas_ok(k1: int) -> bool:
    """Gate for the fused folded-MUTAN Pallas kernel
    (ops/pallas/attmutan_kernel.py).

    VQACX_ATT_PALLAS: 'auto' (default) = on for single-device TPU runs
    under the bf16 policy at spatial scale (k1 >= 64 — the CX K=25
    candidate axis stays on the rank-row cache form, PARITY), '1' =
    wherever bf16-eligible, 'interpret' = Mosaic interpreter (CPU tests),
    '0' = always the XLA folded path.  Measured +5.7% end-to-end
    (MutanAtt B=512 bf16 21.6k -> 22.9k examples/sec, 2026-08-18) after
    two kernel iterations: batch-tiled grid (the per-example grid was
    overhead-bound at 16.1k) and (R, Dh, M) leading-dim weight slicing
    (the (Dh, R, M) middle-dim slices lowered to strided VPU access —
    fwd 7.1 -> 3.9 ms, bwd 11.4 -> 5.4 ms micro-bench)."""
    mode = os.environ.get("VQACX_ATT_PALLAS", "auto")
    from ..core.policy import host_init_active

    if mode == "0" or host_init_active():
        return False
    from ..core.policy import compute_dtype

    if compute_dtype() != jnp.bfloat16:
        return False
    if mode == "interpret":
        return True
    if jax.devices()[0].platform != "tpu":
        return False
    if mode == "1":
        return True
    return k1 >= 64 and len(jax.devices()) == 1

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
}


def activation(name: str):
    return _ACTIVATIONS[name]


class MLBFusion(nn.Module):
    """dropout -> linear -> activation on each modality, then Hadamard product
    (reference fusion.py:16-50).  Omitting dim_v/dim_q skips that projection."""
    opt: Mapping[str, Any]

    def setup(self):
        if "dim_v" in self.opt:
            self.linear_v = nn.Dense(self.opt["dim_h"])
        if "dim_q" in self.opt:
            self.linear_q = nn.Dense(self.opt["dim_h"])

    def _v_side(self, input_v, deterministic):
        opt = self.opt
        if "dim_v" not in opt:
            return input_v
        x_v = dropout(self, input_v, opt["dropout_v"], deterministic)
        x_v = self.linear_v(x_v)
        if "activation_v" in opt:
            x_v = activation(opt["activation_v"])(x_v)
        return x_v

    def _q_side(self, input_q, deterministic):
        opt = self.opt
        if "dim_q" not in opt:
            return input_q
        x_q = dropout(self, input_q, opt["dropout_q"], deterministic)
        x_q = self.linear_q(x_q)
        if "activation_q" in opt:
            x_q = activation(opt["activation_q"])(x_q)
        return x_q

    def __call__(self, input_v: jax.Array, input_q: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        return (self._v_side(input_v, deterministic)
                * self._q_side(input_q, deterministic))

    def v_project(self, input_v: jax.Array,
                  deterministic: bool = True) -> jax.Array:
        """Everything on the visual side that depends only on the image:
        dropout (eval-mode identity) -> linear_v -> activation.  With a
        frozen backbone this is a constant per image, so callers may
        precompute it over the whole feature matrix once and pass the rows
        back through ``fuse_candidates(hv=...)``."""
        return self._v_side(input_v, deterministic)

    def fuse_candidates(self, input_v: jax.Array, input_q: jax.Array,
                        deterministic: bool = True,
                        hv: jax.Array = None) -> jax.Array:
        """(B, K, Dv) x (B, Dq) -> (B, K, dim_h) with the question side
        computed once per example instead of once per candidate (the CX
        vqa_forward otherwise duplicates q over K+1 rows, cx.py:83-87).
        Fast path requires ``deterministic`` so the shared-q dropout-mask
        question stays moot.  ``hv``: precomputed ``v_project`` rows
        (B, K, dim_h); skips the per-step v-side GEMM entirely."""
        if hv is not None:
            assert deterministic, "cached v projections require eval mode"
            x_q = self._q_side(input_q, deterministic)
            return hv * x_q[:, None, :]
        batch, k1 = input_v.shape[:2]
        if not deterministic:
            q_dup = jnp.broadcast_to(
                input_q[:, None, :],
                (batch, k1, input_q.shape[-1])).reshape(batch * k1, -1)
            out = self(input_v.reshape(batch * k1, -1), q_dup, deterministic)
            return out.reshape(batch, k1, -1)
        x_v = self._v_side(input_v.reshape(batch * k1, -1), deterministic)
        x_q = self._q_side(input_q, deterministic)
        return x_v.reshape(batch, k1, -1) * x_q[:, None, :]


class MutanFusion(nn.Module):
    """Tucker rank-R bilinear fusion (reference fusion.py:53-121).

    sum_r (act_hv(drop(x_v) @ Wv_r)) * (act_hq(drop(x_q) @ Wq_r)) where x_v/x_q
    are the per-modality embeddings.  When per-rank activations/dropouts are
    disabled (the reference default config: dropout_hv=dropout_hq=0, no
    activation_hv/hq), the rank axis collapses into the fused kernel.
    """
    opt: Mapping[str, Any]
    visual_embedding: bool = True
    question_embedding: bool = True

    def setup(self):
        opt = self.opt
        rank, dim_mm = opt["R"], opt["dim_mm"]
        if self.visual_embedding:
            self.linear_v = nn.Dense(opt["dim_hv"])
        if self.question_embedding:
            self.linear_q = nn.Dense(opt["dim_hq"])
        # with embeddings disabled the inputs arrive already dim_hv/dim_hq
        # wide (reference fusion.py:69-79)
        dim_hv, dim_hq = opt["dim_hv"], opt["dim_hq"]
        self.w_hv = self.param("w_hv", nn.initializers.lecun_normal(),
                               (dim_hv, rank * dim_mm))
        self.b_hv = self.param("b_hv", nn.initializers.zeros,
                               (rank * dim_mm,))
        self.w_hq = self.param("w_hq", nn.initializers.lecun_normal(),
                               (dim_hq, rank * dim_mm))
        self.b_hq = self.param("b_hq", nn.initializers.zeros,
                               (rank * dim_mm,))

    @property
    def _simple(self):
        opt = self.opt
        return (opt.get("dropout_hv", 0) == 0
                and opt.get("dropout_hq", 0) == 0
                and "activation_hv" not in opt
                and "activation_hq" not in opt)

    @property
    def _has_input_dropout(self):
        """True when the module itself draws dropout masks on its inputs.

        With both embeddings disabled (the attention-stage configuration —
        dropout happens in the caller's tower) the module is a pure
        function, so the candidate-fused path is exact even in training
        mode; with embeddings on, training mode must fall back to the
        duplicated path to draw independent per-candidate masks like the
        reference."""
        opt = self.opt
        return ((self.visual_embedding and opt.get("dropout_v", 0) > 0)
                or (self.question_embedding and opt.get("dropout_q", 0) > 0))

    def _v_side(self, input_v, deterministic):
        opt = self.opt
        if not self.visual_embedding:
            return input_v
        x_v = dropout(self, input_v, opt["dropout_v"], deterministic)
        x_v = self.linear_v(x_v)
        if "activation_v" in opt:
            x_v = activation(opt["activation_v"])(x_v)
        return x_v

    def _q_side(self, input_q, deterministic):
        opt = self.opt
        if not self.question_embedding:
            return input_q
        x_q = dropout(self, input_q, opt["dropout_q"], deterministic)
        x_q = self.linear_q(x_q)
        if "activation_q" in opt:
            x_q = activation(opt["activation_q"])(x_q)
        return x_q

    def __call__(self, input_v: jax.Array, input_q: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        opt = self.opt
        rank = opt["R"]
        dim_mm = opt["dim_mm"]

        # 3-D (B, W*H, D) spatial inputs flatten through the same path
        # (reference MutanFusion2d, fusion.py:124-146).
        spatial = input_v.ndim == 3
        if spatial:
            batch0, wh = input_v.shape[:2]
            input_v = input_v.reshape(batch0 * wh, -1)
            input_q = input_q.reshape(batch0 * wh, -1)

        x_v = self._v_side(input_v, deterministic)
        x_q = self._q_side(input_q, deterministic)

        if self._simple:
            x_mm = fusion_ops.tucker_rank_fusion_auto(
                x_v, x_q, self.w_hv, self.b_hv, self.w_hq, self.b_hq, rank)
        else:
            # general path: per-rank dropout/activation between the projections
            batch = x_v.shape[0]
            hv_in = dropout(self, x_v, opt.get("dropout_hv", 0),
                            deterministic)
            hq_in = dropout(self, x_q, opt.get("dropout_hq", 0),
                            deterministic)
            hv = (hv_in @ self.w_hv + self.b_hv).reshape(batch, rank, dim_mm)
            hq = (hq_in @ self.w_hq + self.b_hq).reshape(batch, rank, dim_mm)
            if "activation_hv" in opt:
                hv = activation(opt["activation_hv"])(hv)
            if "activation_hq" in opt:
                hq = activation(opt["activation_hq"])(hq)
            x_mm = jnp.sum(hv * hq, axis=1)

        if "activation_mm" in opt:
            x_mm = activation(opt["activation_mm"])(x_mm)
        if spatial:
            x_mm = x_mm.reshape(batch0, wh, dim_mm)
        return x_mm

    def v_project(self, input_v: jax.Array,
                  deterministic: bool = True) -> jax.Array:
        """Everything on the visual side that depends only on the image:
        dropout (eval-mode identity) -> linear_v -> activation_v -> the
        rank projection ``w_hv`` -> (N, R, dim_mm).  With a frozen backbone
        this is a constant per image; precompute it over the whole feature
        matrix once (engines/cx_engine.precompute_v_proj) and the per-step
        MUTAN fusion collapses to a gather + rank-wise multiply-sum.
        Only the ``_simple`` configuration (no per-rank dropout/activation,
        the reference CX default) factors this way.

        Returned pre-tiled as (N, R, dim_mm) rather than flat (N, R*dim_mm):
        the per-step gather then lands directly in the layout the rank
        multiply-sum consumes, instead of paying a (B, K+1, R, dim_mm)
        retile copy of every gathered row (xplane: 0.26 ms/step at B=384,
        ~9% of the CX step)."""
        assert self._simple, "per-rank dropout/activation is not cacheable"
        from ..core.policy import cast_in

        opt = self.opt
        x_v = self._v_side(input_v, deterministic)
        xv, wv = cast_in(x_v, self.w_hv)
        flat = (jnp.dot(xv, wv, preferred_element_type=jnp.float32)
                + self.b_hv)
        return flat.reshape(flat.shape[0], opt["R"], opt["dim_mm"])

    def fuse_candidates(self, input_v: jax.Array, input_q: jax.Array,
                        deterministic: bool = True,
                        hv: jax.Array = None) -> jax.Array:
        """(B, K, Dv) x (B, Dq) -> (B, K, dim_mm): the question-side GEMMs
        (linear_q and the rank projection w_hq) run once per example instead
        of once per candidate — the CX vqa_forward otherwise duplicates q
        over the K+1 candidate rows and pays those GEMMs 25x (reference
        cx.py:83-87).  Falls back to the duplicated path when dropout is
        live (per-candidate masks) or per-rank dropout/activation is
        configured.

        ``hv``: precomputed ``v_project`` rows, (B, K, R, dim_mm) pre-tiled
        (or legacy flat (B, K, R*dim_mm)) — skips the per-step v-side GEMMs
        (linear_v + w_hv over B*K candidate rows, the dominant
        frozen-backbone FLOPs) entirely."""
        if hv is not None:
            assert deterministic and self._simple, (
                "cached v projections require eval mode and the simple "
                "(no per-rank dropout/activation) configuration")
            from ..core.policy import cast_in

            opt = self.opt
            rank, dim_mm = opt["R"], opt["dim_mm"]
            batch, k1 = hv.shape[:2]
            x_q = self._q_side(input_q, deterministic)
            xq, wq = cast_in(x_q, self.w_hq)
            hq = (jnp.dot(xq, wq, preferred_element_type=jnp.float32)
                  + self.b_hq).reshape(batch, 1, rank, dim_mm)
            if hv.ndim == 3:  # legacy flat rows
                hv = hv.reshape(batch, k1, rank, dim_mm)
            x_mm = jnp.sum(hv * hq, axis=2)
            if "activation_mm" in opt:
                x_mm = activation(opt["activation_mm"])(x_mm)
            return x_mm
        batch, k1 = input_v.shape[:2]
        if ((not deterministic and self._has_input_dropout)
                or not self._simple):
            q_dup = jnp.broadcast_to(
                input_q[:, None, :],
                (batch, k1, input_q.shape[-1])).reshape(batch * k1, -1)
            out = self(input_v.reshape(batch * k1, -1), q_dup, deterministic)
            return out.reshape(batch, k1, -1)

        from ..core.policy import cast_in

        opt = self.opt
        rank, dim_mm = opt["R"], opt["dim_mm"]
        x_v = self._v_side(input_v.reshape(batch * k1, -1), deterministic)
        x_q = self._q_side(input_q, deterministic)
        xv, wv = cast_in(x_v, self.w_hv)
        xq, wq = cast_in(x_q, self.w_hq)
        hq = (jnp.dot(xq, wq, preferred_element_type=jnp.float32)
              + self.b_hq).reshape(batch, rank, dim_mm)
        if k1 >= rank and _att_pallas_ok(k1):
            # fused Pallas variant of the folded form below: weff never
            # exists in HBM (ops/pallas/attmutan_kernel.py) — the XLA
            # folded path's weff build/retile chain cost ~2.7 ms of the
            # 22.4 ms MutanAtt B=512 step (xplane 2026-08-18)
            from ..ops.pallas.attmutan_kernel import folded_mutan_pallas

            x_mm = folded_mutan_pallas(
                xv.reshape(batch, k1, -1),
                wv.reshape(wv.shape[0], rank, dim_mm),
                self.b_hv.reshape(rank, dim_mm), hq,
                os.environ.get("VQACX_ATT_PALLAS") == "interpret")
        elif k1 >= rank:
            # Fold the question side into a per-example effective weight:
            #     z[b,k,m] = sum_r (x_v[b,k] @ w_hv)[r,m] * hq[b,r,m]
            #              = x_v[b,k] @ Weff[b] + sum_r b_hv[r,m] * hq[b,r,m]
            #     Weff[b,d,m] = sum_r w_hv[d,r,m] * hq[b,r,m]
            # Same math, R-fold fewer GEMM FLOPs over the candidate axis and
            # no (B, K, R, dim_mm) intermediate — at the MutanAtt attention
            # stage (K=196 positions, R=5, B=128) the old form cost
            # ~4.5 ms/step of HBM traffic materializing/relayouting that
            # 256 MB tensor (xplane, 2026-08-17).
            dim_hv = wv.shape[0]
            w3 = wv.reshape(dim_hv, rank, dim_mm)
            weff = jnp.einsum("drm,brm->bdm", w3, hq.astype(w3.dtype),
                              preferred_element_type=jnp.float32)
            xv3 = xv.reshape(batch, k1, dim_hv)
            x_mm = jnp.einsum("bkd,bdm->bkm", xv3, weff.astype(xv3.dtype),
                              preferred_element_type=jnp.float32)
            bias = jnp.einsum("rm,brm->bm",
                              self.b_hv.reshape(rank, dim_mm), hq)
            x_mm = x_mm + bias[:, None, :]
        else:
            hv = (jnp.dot(xv, wv, preferred_element_type=jnp.float32)
                  + self.b_hv).reshape(batch, k1, rank, dim_mm)
            x_mm = jnp.sum(hv * hq[:, None], axis=2)
        if "activation_mm" in opt:
            x_mm = activation(opt["activation_mm"])(x_mm)
        return x_mm


class MutanFusion2d(MutanFusion):
    """Name-parity alias: MUTAN over a (B, W*H, D) spatial axis (reference
    fusion.py:124-146).  The flattening lives in MutanFusion.__call__."""

