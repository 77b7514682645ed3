"""Numeric parity of the analytic CX scorers against straightforward
numpy oracles of the reference formulas (cx.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_counterexamples_tpu.data import synthetic
from vqa_counterexamples_tpu.models import factory

B, KNN, DV, NANS = 4, 5, 12, 8


@pytest.fixture(scope="module")
def setup():
    opt = synthetic.tiny_vqa_options(dim_v=DV, nans=NANS)
    words, answers = synthetic.synthetic_vocab(20, NANS)
    vqa_model = factory.factory_vqa(opt, words, answers)
    rng = np.random.default_rng(0)
    image_features = jnp.asarray(rng.normal(size=(B, KNN + 1, DV)),
                                 jnp.float32)
    wids = jnp.asarray(rng.integers(0, 15, size=(B, 26)), jnp.int32)
    aids = jnp.asarray(rng.integers(0, NANS, size=(B,)), jnp.int32)
    return vqa_model, image_features, wids, aids


def _vqa_outputs(model, variables, image_features, wids):
    return model.apply(variables, image_features, wids, deterministic=True,
                       rngs={"lesion": jax.random.key(9)},
                       method=model.vqa_forward)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_blackbox_formula(setup):
    vqa_model, image_features, wids, aids = setup
    model = factory.factory_cx("BlackBox", vqa_model, knn_size=KNN)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "lesion": jax.random.key(2)}, image_features, wids, aids,
        deterministic=True)
    scores = model.apply(variables, image_features, wids, aids,
                         deterministic=True,
                         rngs={"lesion": jax.random.key(9)})
    _, _, a_knns, _, _ = _vqa_outputs(model, variables, image_features, wids)
    # oracle: -softmax(a_knn_i)[orig answer]  (cx.py:120-136)
    probs = _softmax(np.asarray(a_knns))
    oracle = -probs[np.arange(B)[:, None], np.arange(KNN)[None, :],
                    np.asarray(aids)[:, None]]
    np.testing.assert_allclose(np.asarray(scores), oracle, rtol=1e-5,
                               atol=1e-6)


def test_similarity_formula(setup):
    vqa_model, image_features, wids, aids = setup
    model = factory.factory_cx("SimilarityModel", vqa_model, knn_size=KNN)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "lesion": jax.random.key(2)}, image_features, wids, aids,
        deterministic=True)
    scores = model.apply(variables, image_features, wids, aids,
                         deterministic=True,
                         rngs={"lesion": jax.random.key(9)})
    _, z_orig, a_knns, z_knns, _ = _vqa_outputs(model, variables,
                                                image_features, wids)
    v = np.asarray(image_features)
    z_o, z_k, a_k = map(np.asarray, (z_orig, z_knns, a_knns))

    def cos(a, b):
        return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                  * np.linalg.norm(b, axis=-1))

    v_cos = cos(v[:, :1], v[:, 1:])
    z_cos = cos(z_o[:, None], z_k)
    logp = np.log(_softmax(a_k))
    a_xent = -logp[np.arange(B)[:, None], np.arange(KNN)[None, :],
                   np.asarray(aids)[:, None]]
    np.testing.assert_allclose(np.asarray(scores), v_cos + z_cos + a_xent,
                               rtol=1e-4, atol=1e-5)


def test_semantic_baseline_formula(setup):
    vqa_model, image_features, wids, aids = setup
    lam = 0.3
    model = factory.factory_cx("SemanticBaseline", vqa_model, knn_size=KNN,
                               sb_lambda=lam)
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(NANS, 6)).astype(np.float32)
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    emb_pairs = emb_n @ emb_n.T
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "lesion": jax.random.key(2)}, image_features, wids, aids,
        jnp.asarray(emb_pairs), deterministic=True)
    scores = model.apply(variables, image_features, wids, aids,
                         jnp.asarray(emb_pairs), deterministic=True,
                         rngs={"lesion": jax.random.key(9)})
    _, _, a_knns, _, _ = _vqa_outputs(model, variables, image_features, wids)
    # oracle: per-example loop replicating cx.py:190-207
    a_k = np.asarray(a_knns)
    aids_np = np.asarray(aids)
    oracle = np.zeros((B, KNN))
    for b in range(B):
        row = []
        for i in range(KNN):
            nb = _softmax(a_k[b, i][None])[0]
            ws = emb_pairs[aids_np[b]] @ nb - nb[aids_np[b]]
            logp = np.log(nb[aids_np[b]] + 1e-8)
            row.append(lam * ws - (1 - lam) * logp)
        oracle[b] = _softmax(np.asarray(row)[None])[0]
    np.testing.assert_allclose(np.asarray(scores), oracle, rtol=1e-4,
                               atol=1e-5)


def test_neural_model_vs_reference_concat_oracle(setup):
    """NeuralModel's decomposed forward equals a from-scratch numpy build of
    the reference concat (cx.py:309-331) using the same params."""
    vqa_model, image_features, wids, aids = setup
    spec = dict(dim_h=16, n_layers=1, drop_p=0.0, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True,
                z_emb=True, pretrained_emb=False, trainable_vqa=False)
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=KNN,
                               model_spec=spec)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "lesion": jax.random.key(2)}, image_features, wids, aids,
        deterministic=True)
    scores = model.apply(variables, image_features, wids, aids,
                         deterministic=True,
                         rngs={"lesion": jax.random.key(9)})
    p = variables["params"]
    _, z_orig, a_knns, z_knns, q_emb = _vqa_outputs(model, variables,
                                                    image_features, wids)
    v = np.asarray(image_features)
    emb = np.asarray(p["answer_embedding"])
    a_probs = _softmax(np.asarray(a_knns))
    a_emb_knns = a_probs @ emb
    a_emb_gt = emb[np.asarray(aids)]
    w1 = np.asarray(p["linear_1_w"])
    b1 = np.asarray(p["linear_1_b"])
    w_out = np.asarray(p["out_w"])
    b_out = np.asarray(p["out_b"])
    oracle = np.zeros((B, KNN))
    for i in range(KNN):
        v_other = v[:, i + 1]
        v_mult = v[:, 0] * v_other
        v_dist = np.linalg.norm(v[:, 0] - v_other + 1e-6, axis=1,
                                keepdims=True)
        v_rank = np.zeros((B, KNN))
        v_rank[:, i] = 1
        x = np.concatenate([v[:, 0], v_other, v_mult, v_dist, v_rank,
                            np.asarray(q_emb), np.asarray(z_orig),
                            np.asarray(z_knns)[:, i], a_emb_gt,
                            a_emb_knns[:, i]], axis=1)
        h = np.maximum(x @ w1 + b1, 0.0)
        oracle[:, i] = (h @ w_out + b_out)[:, 0]
    np.testing.assert_allclose(np.asarray(scores), oracle, rtol=2e-3,
                               atol=2e-4)
