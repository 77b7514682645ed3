"""No-attention VQA classifiers: MLBNoAtt, MutanNoAtt.

Flax re-design of reference ``vqa/models/noatt.py``.  Pipeline
(noatt.py:31-35): question -> seq2vec -> fusion with pooled visual features ->
classifier over the 2000-answer vocabulary.  The sub-computations are exposed
as module methods (``encode_question`` / ``fuse`` / ``classify``) because the
CX models drive them separately (reference cx.py:64-104 calls
``vqa_model.seq2vec``, ``_fusion``, ``_classif`` directly).
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import fusion as fusion_mod
from .common import dropout
from . import seq2vec as seq2vec_mod


class AbstractNoAtt(nn.Module):
    opt: Mapping[str, Any]
    vocab_words: Tuple[str, ...]
    vocab_answers: Tuple[str, ...]

    def setup(self):
        from ..core.policy import compute_dtype

        self.seq2vec = seq2vec_mod.factory(self.vocab_words, self.opt["seq2vec"])
        # the answer head follows the compute policy like the other hot
        # GEMMs (params stay f32 via param_dtype; computation in policy
        # dtype — profiler showed this dot running f32 and staging the f32
        # weight every step under the bf16 policy)
        self.linear_classif = nn.Dense(len(self.vocab_answers),
                                       dtype=compute_dtype())
        self.fusion_module = self._make_fusion()

    def _make_fusion(self) -> nn.Module:
        raise NotImplementedError

    # -- pieces (used standalone by the CX zoo) -----------------------------
    def encode_question(self, input_q: jax.Array,
                        deterministic: bool = True) -> jax.Array:
        return self.seq2vec(input_q, deterministic=deterministic)

    def fuse(self, input_v: jax.Array, x_q: jax.Array,
             deterministic: bool = True) -> jax.Array:
        return self.fusion_module(input_v, x_q, deterministic=deterministic)

    def fuse_candidates(self, input_v: jax.Array, x_q: jax.Array,
                        deterministic: bool = True,
                        v_proj: jax.Array = None) -> jax.Array:
        """(B, K, Dv) x (B, Dq) -> (B, K, dz): candidate-axis fusion with the
        question side computed once per example (see
        fusion.MutanFusion.fuse_candidates).  ``v_proj``: precomputed
        ``project_image`` rows (B, K, P) replacing the v-side GEMMs."""
        return self.fusion_module.fuse_candidates(
            input_v, x_q, deterministic=deterministic, hv=v_proj)

    def project_image(self, input_v: jax.Array,
                      deterministic: bool = True) -> jax.Array:
        """Image-only half of the fusion (see fusion v_project): a constant
        per image under a frozen backbone, precomputable over the whole
        feature matrix (engines/cx_engine.precompute_v_proj)."""
        return self.fusion_module.v_project(input_v,
                                            deterministic=deterministic)

    def classify(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        opt_c = self.opt["classif"]
        x = z
        if "activation" in opt_c:
            x = fusion_mod.activation(opt_c["activation"])(x)
        x = dropout(self, x, opt_c["dropout"], deterministic)
        # logits back to f32 for the loss/softmax regardless of GEMM policy
        return self.linear_classif(x).astype(jnp.float32)

    def classif_params(self):
        """(kernel, bias) of the answer head — for fused classify+softmax
        consumers (ops/pallas/mixture_kernel.py), valid when the head has
        no activation and runs deterministic (frozen backbone)."""
        v = self.linear_classif.variables["params"]
        return v["kernel"], v["bias"]

    # -- full forward --------------------------------------------------------
    def __call__(self, input_v: jax.Array, input_q: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        x_q = self.encode_question(input_q, deterministic)
        z = self.fuse(input_v, x_q, deterministic)
        return self.classify(z, deterministic)


class MLBNoAtt(AbstractNoAtt):
    """Hadamard-product fusion (reference noatt.py:38-46)."""

    def _make_fusion(self) -> nn.Module:
        return fusion_mod.MLBFusion(self.opt["fusion"])


class MutanNoAtt(AbstractNoAtt):
    """Tucker rank-R fusion; dim_h == dim_mm (reference noatt.py:49-58)."""

    def _make_fusion(self) -> nn.Module:
        return fusion_mod.MutanFusion(self.opt["fusion"])
