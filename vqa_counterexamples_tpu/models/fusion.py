"""Multimodal fusion modules: MLB (Hadamard) and MUTAN (Tucker rank-R).

Flax re-design of reference ``vqa/models/fusion.py``.  The MUTAN R-loop
(fusion.py:100-116) is replaced by the fused einsum in ``ops/fusion.py``;
parameters are stored in the stacked (din, R*dmm) layout so the projection is
one GEMM.  Option keys match the reference YAML blocks (dim_v, dim_q, dim_hv,
dim_hq, dim_mm, R, dropout_*, activation_*).
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import fusion as fusion_ops

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

    @nn.compact
    def __call__(self, input_v: jax.Array, input_q: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        opt = self.opt
        if "dim_v" in opt:
            x_v = nn.Dropout(opt["dropout_v"])(input_v, deterministic=deterministic)
            x_v = nn.Dense(opt["dim_h"], name="linear_v")(x_v)
            if "activation_v" in opt:
                x_v = activation(opt["activation_v"])(x_v)
        else:
            x_v = input_v
        if "dim_q" in opt:
            x_q = nn.Dropout(opt["dropout_q"])(input_q, deterministic=deterministic)
            x_q = nn.Dense(opt["dim_h"], name="linear_q")(x_q)
            if "activation_q" in opt:
                x_q = activation(opt["activation_q"])(x_q)
        else:
            x_q = input_q
        return x_v * x_q


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

    @nn.compact
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

        if self.visual_embedding:
            x_v = nn.Dropout(opt["dropout_v"])(input_v, deterministic=deterministic)
            x_v = nn.Dense(opt["dim_hv"], name="linear_v")(x_v)
            if "activation_v" in opt:
                x_v = activation(opt["activation_v"])(x_v)
        else:
            x_v = input_v
        if self.question_embedding:
            x_q = nn.Dropout(opt["dropout_q"])(input_q, deterministic=deterministic)
            x_q = nn.Dense(opt["dim_hq"], name="linear_q")(x_q)
            if "activation_q" in opt:
                x_q = activation(opt["activation_q"])(x_q)
        else:
            x_q = input_q

        dim_hv = x_v.shape[-1]
        dim_hq = x_q.shape[-1]
        w_hv = self.param("w_hv", nn.initializers.lecun_normal(),
                          (dim_hv, rank * dim_mm))
        b_hv = self.param("b_hv", nn.initializers.zeros, (rank * dim_mm,))
        w_hq = self.param("w_hq", nn.initializers.lecun_normal(),
                          (dim_hq, rank * dim_mm))
        b_hq = self.param("b_hq", nn.initializers.zeros, (rank * dim_mm,))

        simple = (opt.get("dropout_hv", 0) == 0 and opt.get("dropout_hq", 0) == 0
                  and "activation_hv" not in opt and "activation_hq" not in opt)
        if simple:
            x_mm = fusion_ops.tucker_rank_fusion_auto(x_v, x_q, w_hv, b_hv,
                                                      w_hq, b_hq, rank)
        else:
            # general path: per-rank dropout/activation between the projections
            batch = x_v.shape[0]
            hv_in = nn.Dropout(opt.get("dropout_hv", 0))(
                x_v, deterministic=deterministic)
            hq_in = nn.Dropout(opt.get("dropout_hq", 0))(
                x_q, deterministic=deterministic)
            hv = (hv_in @ w_hv + b_hv).reshape(batch, rank, dim_mm)
            hq = (hq_in @ w_hq + b_hq).reshape(batch, rank, dim_mm)
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


class MutanFusion2d(MutanFusion):
    """Name-parity alias: MUTAN over a (B, W*H, D) spatial axis (reference
    fusion.py:124-146).  The flattening lives in MutanFusion.__call__."""

