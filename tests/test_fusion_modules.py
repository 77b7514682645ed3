"""Module-level numpy-oracle parity for the fusion flax modules in
deterministic mode (reference fusion.py math with extracted params)."""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_counterexamples_tpu.models.fusion import (MLBFusion, MutanFusion,
                                                   MutanFusion2d)


def _np_tanh_linear(x, kernel, bias):
    return np.tanh(x @ kernel + bias)


def test_mutan_fusion_module_oracle():
    opt = {"dim_v": 10, "dim_q": 8, "dim_hv": 6, "dim_hq": 5, "dim_mm": 4,
           "R": 3, "dropout_v": 0.5, "dropout_q": 0.5,
           "activation_v": "tanh", "activation_q": "tanh",
           "dropout_hv": 0, "dropout_hq": 0}
    model = MutanFusion(opt)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(7, 10)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(7, 8)), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, v, q,
        deterministic=True)
    out = model.apply(variables, v, q, deterministic=True)

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    # oracle (fusion.py:78-121, eval mode): tanh linears, R-wise mul-sum
    xv = _np_tanh_linear(np.asarray(v), p["linear_v"]["kernel"],
                         p["linear_v"]["bias"])
    xq = _np_tanh_linear(np.asarray(q), p["linear_q"]["kernel"],
                         p["linear_q"]["bias"])
    hv = (xv @ p["w_hv"] + p["b_hv"]).reshape(7, 3, 4)
    hq = (xq @ p["w_hq"] + p["b_hq"]).reshape(7, 3, 4)
    oracle = (hv * hq).sum(1)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5,
                               atol=1e-6)


def test_mlb_fusion_module_oracle():
    opt = {"dim_v": 10, "dim_q": 8, "dim_h": 6, "dropout_v": 0.5,
           "dropout_q": 0.5, "activation_v": "tanh",
           "activation_q": "tanh"}
    model = MLBFusion(opt)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(5, 10)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, v, q,
        deterministic=True)
    out = model.apply(variables, v, q, deterministic=True)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    oracle = (_np_tanh_linear(np.asarray(v), p["linear_v"]["kernel"],
                              p["linear_v"]["bias"])
              * _np_tanh_linear(np.asarray(q), p["linear_q"]["kernel"],
                                p["linear_q"]["bias"]))
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5,
                               atol=1e-6)


def test_mutan_fusion_2d_equals_flattened_1d():
    """(B, WH, D) spatial path == flattening by hand (fusion.py:124-146)."""
    opt = {"dim_hv": 6, "dim_hq": 6, "dim_mm": 4, "R": 2,
           "dropout_v": 0, "dropout_q": 0, "dropout_hv": 0, "dropout_hq": 0}
    model2d = MutanFusion2d(opt, visual_embedding=False,
                            question_embedding=False)
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.normal(size=(3, 4, 6)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(3, 4, 6)), jnp.float32)
    variables = model2d.init({"params": jax.random.key(0)}, v, q,
                             deterministic=True)
    out = model2d.apply(variables, v, q, deterministic=True)
    assert out.shape == (3, 4, 4)
    model1d = MutanFusion(opt, visual_embedding=False,
                          question_embedding=False)
    out1d = model1d.apply(variables, v.reshape(12, 6), q.reshape(12, 6),
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(out).reshape(12, 4),
                               np.asarray(out1d), rtol=1e-6)


def test_fuse_candidates_training_mode_no_internal_dropout():
    """With both embeddings disabled the fusion has no internal dropout, so
    the candidate-fused path (q-side once per example — the attention-stage
    formulation, att.py) must equal the duplicated path EXACTLY even in
    training mode (MutanFusion._has_input_dropout)."""
    opt = {"dim_hv": 6, "dim_hq": 6, "dim_mm": 4, "R": 2,
           "dropout_v": 0.5, "dropout_q": 0.5,  # declared but never drawn:
           "dropout_hv": 0, "dropout_hq": 0}    # embeddings are disabled
    model = MutanFusion(opt, visual_embedding=False, question_embedding=False)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(3, 5, 6)), jnp.float32)   # (B, K, dh)
    q = jnp.asarray(rng.normal(size=(3, 6)), jnp.float32)      # (B, dh)
    variables = model.init({"params": jax.random.key(0)}, v[:, 0], q,
                           deterministic=True)

    fused = model.apply(variables, v, q, deterministic=False,
                        rngs={"dropout": jax.random.key(1)},
                        method=lambda m, v, q, deterministic: m.fuse_candidates(
                            v, q, deterministic=deterministic))
    q_dup = jnp.broadcast_to(q[:, None, :], (3, 5, 6)).reshape(15, 6)
    dup = model.apply(variables, v.reshape(15, 6), q_dup, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})
    np.testing.assert_allclose(np.asarray(fused).reshape(15, 4),
                               np.asarray(dup), rtol=1e-5, atol=1e-6)
