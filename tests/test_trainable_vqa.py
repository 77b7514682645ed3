"""Frozen vs trainable VQA semantics (reference cx.py:59-60, 73-80, 98-102):
with trainable_vqa=False, no gradient reaches any VQA backbone param; with
True, gradients flow through fusion/classifier/encoder."""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_counterexamples_tpu.data import synthetic
from vqa_counterexamples_tpu.models import factory

B, KNN, DV, NANS = 3, 4, 10, 6


def _grads(trainable):
    opt = synthetic.tiny_vqa_options(dim_v=DV, nans=NANS)
    words, answers = synthetic.synthetic_vocab(12, NANS)
    vqa_model = factory.factory_vqa(opt, words, answers)
    spec = dict(dim_h=8, n_layers=1, drop_p=0.0, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True,
                z_emb=True, pretrained_emb=False, trainable_vqa=trainable)
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=KNN,
                               trainable_vqa=trainable, model_spec=spec)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(B, KNN + 1, DV)), jnp.float32)
    q = jnp.asarray(rng.integers(0, 10, size=(B, 26)), jnp.int32)
    a = jnp.asarray(rng.integers(0, NANS, size=(B,)), jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "lesion": jax.random.key(2)}, v, q, a, deterministic=True)

    def loss(params):
        s = model.apply({"params": params}, v, q, a, deterministic=True,
                        rngs={"lesion": jax.random.key(3)})
        return jnp.sum(s ** 2)

    return jax.grad(loss)(variables["params"])


def _max_abs(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return max(float(jnp.max(jnp.abs(leaf))) for leaf in leaves)


def test_frozen_vqa_gets_no_gradient():
    grads = _grads(trainable=False)
    assert _max_abs(grads["vqa_model"]) == 0.0
    assert _max_abs(grads["linear_1_w"]) > 0.0  # CX head still learns


def test_trainable_vqa_gets_gradient():
    grads = _grads(trainable=True)
    assert _max_abs(grads["vqa_model"]["fusion_module"]) > 0.0
    assert _max_abs(grads["vqa_model"]["linear_classif"]) > 0.0
    assert _max_abs(grads["vqa_model"]["seq2vec"]) > 0.0
