"""Fused Pallas answer head (classify -> softmax) correctness.

The kernel (ops/pallas/mixture_kernel.py) must reproduce the jax bf16
path's probs — ``exp(l - rowmax) * round_bf16(1/sum)`` with
``l = round_bf16(z @ W) + b`` — without ever materializing the logits.
CPU tests run the Mosaic interpreter (VQACX_FUSED_HEAD=interpret).
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
from vqa_counterexamples_tpu.ops.pallas.mixture_kernel import (
    classify_softmax_pallas)


def _reference_probs(z, w, b):
    l = (jnp.dot(z.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32).astype(jnp.bfloat16)
         + b.astype(jnp.bfloat16))
    m = jnp.max(l, axis=1, keepdims=True)
    u = jnp.exp(l - m)
    s = jnp.sum(u.astype(jnp.float32), axis=1, keepdims=True)
    return u * (1.0 / s).astype(jnp.bfloat16)


def test_kernel_matches_reference():
    k = jax.random.key(0)
    kz, kw, kb = jax.random.split(k, 3)
    M, dz, A = 70, 24, 50  # deliberately non-multiples of 128
    z = jax.random.normal(kz, (M, dz), jnp.float32)
    w = jax.random.normal(kw, (dz, A), jnp.float32) * 0.3
    b = jax.random.normal(kb, (A,), jnp.float32)

    out = classify_softmax_pallas(z.astype(jnp.bfloat16), w, b, 32, True)
    ref = _reference_probs(z, w, b)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-3)
    # rows sum to ~1 (the -1e9 pad columns contribute nothing)
    sums = np.asarray(out, np.float32).sum(axis=1)
    np.testing.assert_allclose(sums, np.ones(M), rtol=2e-2)


def _model_scores(fused_mode, dtype="bfloat16"):
    os.environ["VQACX_FUSED_HEAD"] = fused_mode
    try:
        with policy.compute_dtype_scope(dtype):
            dataset, store = synthetic.make_synthetic_cx(
                n_examples=32, n_images=16, dim_v=16, knn_size=4, n_words=20,
                n_answers=12, seed=9)
            opt = synthetic.tiny_vqa_options(dim_v=16, nans=12)
            vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                                      dataset["vocab_answers"])
            spec = dict(dim_h=16, n_layers=1, drop_p=0.0, v_emb=True,
                        v_mult=True, v_dist=True, v_rank=True, q_emb=True,
                        a_emb=True, z_emb=True, pretrained_emb=False,
                        trainable_vqa=False)
            model = factory.factory_cx("NeuralModel", vqa, knn_size=4,
                                       model_spec=spec)
            arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                                  dataset["name_to_index"])
            features = store.to_device()
            batch = vqacx.gather_batch(arrays, np.arange(8))
            state = cx_engine.init_cx_state(model, None, batch, features)
            image_features = jnp.asarray(features)[batch["image_idxs"]]
            scores = model.apply(
                {"params": state.params}, image_features,
                jnp.asarray(batch["question_wids"]),
                jnp.asarray(batch["answer_aids"]),
                deterministic=True,
                rngs={"lesion": jax.random.key(3)})
            return np.asarray(scores, np.float32)
    finally:
        os.environ.pop("VQACX_FUSED_HEAD", None)


def test_model_fused_head_matches_jax_path():
    ref = _model_scores("0")
    fused = _model_scores("interpret")
    np.testing.assert_allclose(fused, ref, rtol=5e-2, atol=5e-2)


def test_fused_head_gated_off_under_f32():
    # under the f32 policy the model must take the exact jax path even if
    # the env asks for the kernel (reference-faithful numerics)
    a = _model_scores("interpret", dtype="float32")
    b = _model_scores("0", dtype="float32")
    np.testing.assert_array_equal(a, b)


def test_fused_head_training_step_matches():
    # one Adam step with the fused head vs the jax path: grads flow through
    # ew/E/W1 identically (probs is a gradient constant either way)
    def run(mode):
        os.environ["VQACX_FUSED_HEAD"] = mode
        try:
            with policy.compute_dtype_scope("bfloat16"):
                dataset, store = synthetic.make_synthetic_cx(
                    n_examples=32, n_images=16, dim_v=16, knn_size=4,
                    n_words=20, n_answers=12, seed=11)
                opt = synthetic.tiny_vqa_options(dim_v=16, nans=12)
                vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                                          dataset["vocab_answers"])
                spec = dict(dim_h=16, n_layers=1, drop_p=0.0, v_emb=True,
                            v_mult=True, v_dist=True, v_rank=True,
                            q_emb=True, a_emb=True, z_emb=True,
                            pretrained_emb=False, trainable_vqa=False)
                model = factory.factory_cx("NeuralModel", vqa, knn_size=4,
                                           model_spec=spec)
                arrays = vqacx.CXArrays.from_examples(
                    dataset["examples_list"], dataset["name_to_index"])
                features = store.to_device()
                optimizer = optax.adam(1e-3)
                batch = vqacx.gather_batch(arrays, np.arange(8))
                state = cx_engine.init_cx_state(model, optimizer, batch,
                                                features)
                ts = cx_engine.make_cx_train_step(model, optimizer,
                                                  recall_k=3)
                nv = jnp.asarray(8.0, jnp.float32)
                state, m = ts(state, features, batch, nv)
                return state, m
        finally:
            os.environ.pop("VQACX_FUSED_HEAD", None)

    s_ref, m_ref = run("0")
    s_fused, m_fused = run("interpret")
    assert float(m_ref["loss"]) == pytest.approx(float(m_fused["loss"]),
                                                 rel=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)
