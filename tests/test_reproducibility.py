"""Determinism guarantee: identical seeds give bit-identical runs
(the reference fixes seeds for comparability, counterexamples.py:118-121;
here the guarantee is end-to-end through training + eval)."""

import numpy as np
import jax.numpy as jnp
import optax

from vqa_counterexamples_tpu.data import synthetic, vqacx
from vqa_counterexamples_tpu.engines import cx_engine
from vqa_counterexamples_tpu.models import factory


def _run(seed=7):
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=64, n_images=40, dim_v=16, knn_size=4, n_answers=6,
        seed=0)
    opt = synthetic.tiny_vqa_options(dim_v=16, nans=6)
    vqa_model = factory.factory_vqa(opt, dataset["vocab_words"],
                                    dataset["vocab_answers"])
    spec = dict(dim_h=8, n_layers=1, drop_p=0.25, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True,
                z_emb=True, pretrained_emb=False, trainable_vqa=False)
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=4,
                               model_spec=spec)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = jnp.asarray(store.features)
    optimizer = optax.adam(1e-3)
    state = cx_engine.init_cx_state(
        model, optimizer, vqacx.gather_batch(arrays, np.arange(16)),
        features, seed=seed)
    ts = cx_engine.make_cx_train_step(model, optimizer, base_seed=seed)
    es = cx_engine.make_cx_eval_step(model, recall_k=2)
    rng = np.random.default_rng(seed)
    for _ in range(2):
        state, _ = cx_engine.train_epoch(ts, state, features, arrays, 16,
                                         rng=rng)
    return cx_engine.eval_model(es, state.params, features, arrays, 16)


def test_same_seed_same_results():
    a = _run(seed=7)
    b = _run(seed=7)
    assert a == b


def test_different_seed_differs():
    a = _run(seed=7)
    b = _run(seed=8)
    assert a["loss"] != b["loss"]
