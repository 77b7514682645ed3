"""Fused image-feature Pallas kernel (v_other + v_mult GEMMs + v_dist).

The kernel (ops/pallas/vfeat_kernel.py) must reproduce the decomposed XLA
path (ops/scorer.py first_layer_decomposed's v terms + ops/metrics.py
pairwise_distance) from one K-major read of the gathered candidate rows,
and its custom VJP must produce the same first-layer weight-slice grads.
CPU tests run the Mosaic interpreter (VQACX_FUSED_VFEAT=interpret).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqa_counterexamples_tpu.core import policy
from vqa_counterexamples_tpu.data import synthetic, vqacx
from vqa_counterexamples_tpu.engines import cx_engine
from vqa_counterexamples_tpu.models import factory
from vqa_counterexamples_tpu.ops.pallas.vfeat_kernel import (
    vfeat_scores_pallas)

DV, H, K, B = 128, 16, 5, 32


def _naive(xk3, xo, wo, wm):
    v_knns = jnp.transpose(xk3, (1, 0, 2))            # (B, K, DV)
    v_mult = xo[:, None, :] * v_knns
    h = (jnp.einsum("bkd,dh->bkh", v_knns, wo,
                    preferred_element_type=jnp.float32).astype(xk3.dtype)
         + jnp.einsum("bkd,dh->bkh", v_mult, wm,
                      preferred_element_type=jnp.float32).astype(xk3.dtype))
    diff = (xo[:, None, :].astype(jnp.float32)
            - v_knns.astype(jnp.float32) + 1e-6)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return h, dist


def _rand_inputs(seed=0):
    rng = np.random.RandomState(seed)
    xk3 = jnp.asarray(rng.randn(K, B, DV), jnp.bfloat16)
    xo = jnp.asarray(rng.randn(B, DV), jnp.bfloat16)
    wo = jnp.asarray(rng.randn(DV, H) * 0.1, jnp.bfloat16)
    wm = jnp.asarray(rng.randn(DV, H) * 0.1, jnp.bfloat16)
    return xk3, xo, wo, wm


def test_kernel_matches_reference():
    xk3, xo, wo, wm = _rand_inputs()
    h, dist = vfeat_scores_pallas(xk3, xo, wo.T, wm.T, 0, True)
    h_ref, dist_ref = _naive(xk3, xo, wo, wm)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(h, (1, 0, 2)), np.float32),
        np.asarray(h_ref, np.float32), rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(dist[..., 0], (1, 0))),
        np.asarray(dist_ref), rtol=1e-4, atol=1e-4)


def test_kernel_weight_grads_match():
    xk3, xo, wo, wm = _rand_inputs(1)
    gh = jnp.asarray(np.random.RandomState(2).randn(K, B, H), jnp.float32)

    def loss_p(wo, wm):
        # .T at the call site mirrors the model: grads flow back through
        # the transpose so dW comes out (DV, H) like the XLA path's
        h, dist = vfeat_scores_pallas(xk3, xo, wo.T, wm.T, 0, True)
        return jnp.sum(h.astype(jnp.float32) * gh) + 0.0 * jnp.sum(dist)

    def loss_r(wo, wm):
        h, dist = _naive(xk3, xo, wo, wm)
        return (jnp.sum(h.astype(jnp.float32)
                        * jnp.transpose(gh, (1, 0, 2)))
                + 0.0 * jnp.sum(dist))

    gp = jax.grad(loss_p, argnums=(0, 1))(wo, wm)
    gr = jax.grad(loss_r, argnums=(0, 1))(wo, wm)
    for a, b in zip(gp, gr):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-1)


def _setup(n_examples=48, knn_size=6, batch=16):
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=n_examples, n_images=24, dim_v=DV, knn_size=knn_size,
        n_words=20, n_answers=8, seed=5)
    opt = synthetic.tiny_vqa_options(dim_v=DV, nans=8)
    vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                              dataset["vocab_answers"])
    spec = dict(dim_h=16, n_layers=1, drop_p=0.2, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True, z_emb=True,
                pretrained_emb=False, trainable_vqa=False)
    model = factory.factory_cx("NeuralModel", vqa, knn_size=knn_size,
                               model_spec=spec)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = store.to_device()
    optimizer = optax.adam(1e-3)
    batch = vqacx.gather_batch(arrays, np.arange(batch))
    state = cx_engine.init_cx_state(model, optimizer, batch, features)
    return model, optimizer, state, features, arrays, batch


def _run_train_step(mode, batch_size=16):
    os.environ["VQACX_FUSED_VFEAT"] = mode
    try:
        with policy.compute_dtype_scope("bfloat16"):
            model, optimizer, state, features, arrays, batch = _setup(
                batch=batch_size)
            q_table = cx_engine.precompute_q_emb(model, state.params,
                                                 arrays.question_wids)
            v_table = cx_engine.precompute_v_proj(model, state.params,
                                                  features)
            z_table = cx_engine.precompute_z_emb(
                model, state.params, features, arrays.image_idxs, q_table,
                v_table=v_table, batch_size=20)
            ts = cx_engine.make_cx_train_step(
                model, optimizer, recall_k=3, use_q_cache=True,
                use_z_cache=True)
            nv = jnp.asarray(float(batch_size), jnp.float32)
            state, m = ts(state, features, batch, nv, q_table, None, z_table)
            return state, m
    finally:
        os.environ.pop("VQACX_FUSED_VFEAT", None)


def test_model_fused_train_step_matches():
    s_ref, m_ref = _run_train_step("0")
    s_fused, m_fused = _run_train_step("interpret")
    assert float(m_ref["loss"]) == pytest.approx(float(m_fused["loss"]),
                                                 rel=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_model_fused_train_step_matches_unaligned_batch():
    # 12 % 16 != 0: the model pads the *indices*, runs the kernel at the
    # padded tile, and slices the outputs
    s_ref, m_ref = _run_train_step("0", batch_size=12)
    s_fused, m_fused = _run_train_step("interpret", batch_size=12)
    assert float(m_ref["loss"]) == pytest.approx(float(m_fused["loss"]),
                                                 rel=2e-2)


def _run_eval(mode):
    os.environ["VQACX_FUSED_VFEAT"] = mode
    try:
        with policy.compute_dtype_scope("bfloat16"):
            model, optimizer, state, features, arrays, batch = _setup()
            q_table = cx_engine.precompute_q_emb(model, state.params,
                                                 arrays.question_wids)
            v_table = cx_engine.precompute_v_proj(model, state.params,
                                                  features)
            z_table = cx_engine.precompute_z_emb(
                model, state.params, features, arrays.image_idxs, q_table,
                v_table=v_table, batch_size=20)
            es = cx_engine.make_cx_eval_step(model, recall_k=3,
                                             use_q_cache=True,
                                             use_z_cache=True)
            return cx_engine.eval_model(es, state.params, features, arrays,
                                        16, q_table=q_table,
                                        z_table=z_table)
    finally:
        os.environ.pop("VQACX_FUSED_VFEAT", None)


def test_model_fused_eval_matches():
    r_ref = _run_eval("0")
    r_fused = _run_eval("interpret")
    for key in r_ref:
        assert r_ref[key] == pytest.approx(r_fused[key], rel=2e-2,
                                           abs=2e-2), key


def test_gate_requires_full_v_spec_and_alignment():
    with policy.compute_dtype_scope("bfloat16"):
        os.environ["VQACX_FUSED_VFEAT"] = "interpret"
        try:
            dataset, store = synthetic.make_synthetic_cx(
                n_examples=16, n_images=8, dim_v=DV, knn_size=4, n_words=20,
                n_answers=8, seed=7)
            opt = synthetic.tiny_vqa_options(dim_v=DV, nans=8)
            vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                                      dataset["vocab_answers"])
            base = dict(dim_h=16, n_layers=1, drop_p=0.0, v_emb=True,
                        v_mult=True, v_dist=True, v_rank=True, q_emb=True,
                        a_emb=True, z_emb=True, pretrained_emb=False,
                        trainable_vqa=False)
            ok = factory.factory_cx("NeuralModel", vqa, knn_size=4,
                                    model_spec=base)
            assert ok.wants_table_features()
            lesioned = factory.factory_cx(
                "NeuralModel", vqa, knn_size=4,
                model_spec={**base, "v_mult": False})
            assert not lesioned.wants_table_features()
            os.environ["VQACX_FUSED_VFEAT"] = "0"
            assert not ok.wants_table_features()
        finally:
            os.environ.pop("VQACX_FUSED_VFEAT", None)
    # f32 policy: gated off (reference-faithful numerics)
    os.environ["VQACX_FUSED_VFEAT"] = "interpret"
    try:
        with policy.compute_dtype_scope("float32"):
            assert not ok.wants_table_features()
    finally:
        os.environ.pop("VQACX_FUSED_VFEAT", None)
