"""Attention VQA classifiers: MLBAtt, MutanAtt.

Flax re-design of reference ``vqa/models/att.py``.  Differences that are
deliberate TPU-first choices:

* visual feature maps are channels-last ``(B, H, W, C)`` (the extractor emits
  NHWC; XLA's native conv layout on TPU) instead of the reference's NCHW;
* every 1x1 conv (att.py:22-27) is a Dense over the channel axis of the
  flattened ``(B, W*H, C)`` tensor — identical math, one GEMM on the MXU;
* the per-glimpse Python loops (att.py:91-116, 120-131) are einsums over a
  glimpse axis.

The attention maps are returned alongside the logits (the reference stashes
them on ``self.list_att``, att.py:99, for the demo server).
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import fusion as fusion_mod
from .common import dropout
from . import seq2vec as seq2vec_mod


class AbstractAtt(nn.Module):
    opt: Mapping[str, Any]
    vocab_words: Tuple[str, ...]
    vocab_answers: Tuple[str, ...]

    def setup(self):
        from ..core.policy import compute_dtype

        opt = self.opt
        dt = compute_dtype()  # hot GEMMs follow the policy; params stay f32
        self.seq2vec = seq2vec_mod.factory(self.vocab_words, opt["seq2vec"])
        # attention tower (1x1 convs as Dense over channels-last)
        self.conv_v_att = nn.Dense(opt["attention"]["dim_v"], dtype=dt)
        self.linear_q_att = nn.Dense(opt["attention"]["dim_q"], dtype=dt)
        self.conv_att = nn.Dense(opt["attention"]["nb_glimpses"], dtype=dt)
        # classification tower
        nb = opt["attention"]["nb_glimpses"]
        self.list_linear_v_fusion = [
            nn.Dense(self._glimpse_fusion_dim(), dtype=dt)
            for i in range(nb)]
        self.linear_q_fusion = nn.Dense(self._q_fusion_dim(), dtype=dt)
        self.linear_classif = nn.Dense(len(self.vocab_answers), dtype=dt)
        self.fusion_att_module = self._make_fusion_att()
        self.fusion_classif_module = self._make_fusion_classif()

    # subclass hooks ---------------------------------------------------------
    def _glimpse_fusion_dim(self) -> int:
        raise NotImplementedError

    def _q_fusion_dim(self) -> int:
        raise NotImplementedError

    def _make_fusion_att(self):
        raise NotImplementedError

    def _make_fusion_classif(self):
        raise NotImplementedError

    def _fusion_att(self, x_v, x_q, deterministic):
        raise NotImplementedError

    def _fusion_classif(self, x_v, x_q, deterministic):
        raise NotImplementedError

    # attention (reference att.py:39-118) -------------------------------------
    def _attention(self, input_v: jax.Array, x_q_vec: jax.Array,
                   deterministic: bool):
        opt_att = self.opt["attention"]
        batch, height, width, dim_v = input_v.shape
        wh = width * height
        v_flat = input_v.reshape(batch, wh, dim_v)

        x_v = dropout(self, v_flat, opt_att["dropout_v"], deterministic)
        x_v = self.conv_v_att(x_v)
        if "activation_v" in opt_att:
            x_v = fusion_mod.activation(opt_att["activation_v"])(x_v)

        x_q = dropout(self, x_q_vec, opt_att["dropout_q"], deterministic)
        x_q = self.linear_q_att(x_q)
        if "activation_q" in opt_att:
            x_q = fusion_mod.activation(opt_att["activation_q"])(x_q)

        # x_q stays (B, dim_hq) — NOT broadcast to every spatial position.
        # The reference tiles q over W*H (att.py:76-83) and pays the fusion's
        # q-side work 196x; here each _fusion_att computes the q side once
        # per example (MUTAN: rank projection as one (B, R, dim_mm) GEMM,
        # contracted against the per-position hv — xplane showed the tiled
        # formulation materializing ~750 MB/step of f32 broadcast/reshape at
        # B=128).
        x_att = self._fusion_att(x_v, x_q, deterministic)
        if "activation_mm" in opt_att:
            x_att = fusion_mod.activation(opt_att["activation_mm"])(x_att)
        x_att = dropout(self, x_att, opt_att["dropout_mm"], deterministic)
        x_att = self.conv_att(x_att)                      # (B, WH, G)
        att_maps = jax.nn.softmax(x_att, axis=1)          # softmax over WH

        # weighted sums of the raw features, all glimpses in one einsum
        v_att = jnp.einsum("bwg,bwd->bgd", att_maps, v_flat)  # (B, G, dim_v)
        return v_att, jnp.moveaxis(att_maps, 2, 1)            # (B, G, WH)

    # glimpse fusion (reference att.py:120-143) -------------------------------
    def _fusion_glimpses(self, v_att: jax.Array, x_q_vec: jax.Array,
                         deterministic: bool):
        opt_f = self.opt["fusion"]
        glimpses = []
        for i, dense in enumerate(self.list_linear_v_fusion):
            x_v = dropout(self, v_att[:, i], opt_f["dropout_v"],
                          deterministic)
            x_v = dense(x_v)
            if "activation_v" in opt_f:
                x_v = fusion_mod.activation(opt_f["activation_v"])(x_v)
            glimpses.append(x_v)
        x_v = jnp.concatenate(glimpses, axis=1)

        x_q = dropout(self, x_q_vec, opt_f["dropout_q"], deterministic)
        x_q = self.linear_q_fusion(x_q)
        if "activation_q" in opt_f:
            x_q = fusion_mod.activation(opt_f["activation_q"])(x_q)
        return self._fusion_classif(x_v, x_q, deterministic)

    def classify(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        opt_c = self.opt["classif"]
        if "activation" in opt_c:
            x = fusion_mod.activation(opt_c["activation"])(x)
        x = dropout(self, x, opt_c["dropout"], deterministic)
        # logits back to f32 for the loss/softmax regardless of GEMM policy
        return self.linear_classif(x).astype(jnp.float32)

    def classif_params(self):
        """(kernel, bias) of the answer head — see noatt.classif_params."""
        v = self.linear_classif.variables["params"]
        return v["kernel"], v["bias"]

    def encode_question(self, input_q: jax.Array,
                        deterministic: bool = True) -> jax.Array:
        return self.seq2vec(input_q, deterministic=deterministic)

    def __call__(self, input_v: jax.Array, input_q: jax.Array,
                 deterministic: bool = True, return_att: bool = False):
        if input_v.ndim != 4:
            raise ValueError("attention models need (B, H, W, C) feature maps")
        x_q_vec = self.encode_question(input_q, deterministic)
        v_att, att_maps = self._attention(input_v, x_q_vec, deterministic)
        x = self._fusion_glimpses(v_att, x_q_vec, deterministic)
        x = self.classify(x, deterministic)
        if return_att:
            return x, att_maps
        return x


class MLBAtt(AbstractAtt):
    """Hadamard fusion at both stages (reference att.py:166-192); attention
    dims are tied to dim_h (att.py:170-172) — done by the factory."""

    def _glimpse_fusion_dim(self) -> int:
        return self.opt["fusion"]["dim_h"]

    def _q_fusion_dim(self) -> int:
        return (self.opt["fusion"]["dim_h"]
                * self.opt["attention"]["nb_glimpses"])

    def _make_fusion_att(self):
        return None

    def _make_fusion_classif(self):
        return None

    def _fusion_att(self, x_v, x_q, deterministic):
        # Hadamard over (B, WH, dh) x (B, dh): the broadcast fuses into the
        # multiply, nothing is materialized
        return x_v * x_q[:, None, :]

    def _fusion_classif(self, x_v, x_q, deterministic):
        return x_v * x_q


class MutanAtt(AbstractAtt):
    """MUTAN fusion at both stages (reference att.py:195-223)."""

    def _glimpse_fusion_dim(self) -> int:
        return int(self.opt["fusion"]["dim_hv"]
                   // self.opt["attention"]["nb_glimpses"])

    def _q_fusion_dim(self) -> int:
        return self.opt["fusion"]["dim_hq"]

    def _make_fusion_att(self):
        return fusion_mod.MutanFusion2d(self.opt["attention"],
                                        visual_embedding=False,
                                        question_embedding=False)

    def _make_fusion_classif(self):
        return fusion_mod.MutanFusion(self.opt["fusion"],
                                      visual_embedding=False,
                                      question_embedding=False)

    def _fusion_att(self, x_v, x_q, deterministic):
        # candidate-axis MUTAN with positions as candidates: the q-side rank
        # projection runs once per example; exact in training mode too since
        # this module has both embeddings disabled (no internal dropout —
        # see MutanFusion._has_input_dropout)
        return self.fusion_att_module.fuse_candidates(
            x_v, x_q, deterministic=deterministic)

    def _fusion_classif(self, x_v, x_q, deterministic):
        return self.fusion_classif_module(x_v, x_q,
                                          deterministic=deterministic)
