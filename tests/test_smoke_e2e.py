"""End-to-end smoke: synthetic VQA-CX -> NeuralCX training -> recall improves.

The minimum end-to-end slice of SURVEY.md section 7: untrained MutanNoAtt
backbone (the reference's supported --untrained_vqa path,
counterexamples.py:77-82), NeuralModel CX scorer, CE training, Recall@1/5 eval.
"""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqa_counterexamples_tpu.data import synthetic, vqacx
from vqa_counterexamples_tpu.engines import cx_engine
from vqa_counterexamples_tpu.models import factory


KNN = 8  # small candidate axis keeps CPU tests quick


@pytest.fixture(scope="module")
def cx_setup():
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=192, n_images=64, dim_v=64, knn_size=KNN, n_words=30,
        n_answers=10, seed=0)
    opt = synthetic.tiny_vqa_options(dim_v=64, nans=10)
    vqa_model = factory.factory_vqa(opt, dataset["vocab_words"],
                                    dataset["vocab_answers"])
    return dataset, store, vqa_model


def default_spec(**overrides):
    spec = dict(dim_h=64, n_layers=2, drop_p=0.25, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True, z_emb=True,
                pretrained_emb=False, trainable_vqa=False)
    spec.update(overrides)
    return spec


def test_neuralcx_learns(cx_setup):
    dataset, store, vqa_model = cx_setup
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=KNN,
                               model_spec=default_spec(drop_p=0.1))
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = jnp.asarray(store.features)
    batch_size = 32

    optimizer = optax.adam(1e-3)
    idx0 = np.arange(batch_size)
    state = cx_engine.init_cx_state(model, optimizer,
                                    vqacx.gather_batch(arrays, idx0), features)
    train_step = cx_engine.make_cx_train_step(model, optimizer, recall_k=3)
    eval_step = cx_engine.make_cx_eval_step(model, recall_k=3)

    before = cx_engine.eval_model(eval_step, state.params, features, arrays,
                                  batch_size)
    rng = np.random.default_rng(0)
    for _ in range(10):
        state, _ = cx_engine.train_epoch(train_step, state, features, arrays,
                                         batch_size, rng=rng)
    after = cx_engine.eval_model(eval_step, state.params, features, arrays,
                                 batch_size)

    # synthetic comp_idx is a deterministic function of the question, so the
    # model must become much better than chance (3/KNN) on the train set
    assert after["recall"] > before["recall"]
    assert after["recall"] > 0.55, (before, after)


def test_random_baseline_matches_analytic(cx_setup):
    dataset, store, _ = cx_setup
    model = factory.factory_cx("RandomBaseline", None, knn_size=KNN)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = jnp.asarray(store.features)
    state = cx_engine.init_cx_state(model, None,
                                    vqacx.gather_batch(arrays,
                                                       np.arange(32)),
                                    features)
    eval_step = cx_engine.make_cx_eval_step(model, recall_k=2)
    res = cx_engine.eval_model(eval_step, state.params, features, arrays, 32)
    # analytic: recall@2 of uniform scores over KNN candidates = 2/KNN
    assert abs(res["recall"] - 2 / KNN) < 0.12


def test_distance_baseline_deterministic(cx_setup):
    dataset, store, _ = cx_setup
    model = factory.factory_cx("DistanceBaseline", None, knn_size=KNN)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = jnp.asarray(store.features)
    state = cx_engine.init_cx_state(model, None,
                                    vqacx.gather_batch(arrays,
                                                       np.arange(32)),
                                    features)
    eval_step = cx_engine.make_cx_eval_step(model, recall_k=2)
    res = cx_engine.eval_model(eval_step, state.params, features, arrays, 32)
    # distance baseline top-2 = knn ranks {0, 1}: recall == P(comp_rank < 2)
    expected = float(np.mean(arrays.comp_idxs < 2))
    assert abs(res["recall"] - expected) < 1e-6
