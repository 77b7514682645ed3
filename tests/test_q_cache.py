"""Precomputed q_emb cache: identical numerics to the in-step encoder.

With ``trainable_vqa=False`` the VQA encoder runs in eval mode inside the CX
forward (reference cx.py:59-60), so its output per question is a constant of
training; ``cx_engine.precompute_q_emb`` hoists it out of the step.  These
tests pin the contract: cached and uncached paths give the same scores, the
same training trajectory, and the same eval metrics.
"""

import numpy as np
import optax
import pytest

from vqa_counterexamples_tpu.data import synthetic, vqacx
from vqa_counterexamples_tpu.engines import cx_engine
from vqa_counterexamples_tpu.models import factory


@pytest.fixture(scope="module")
def setup():
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=48, n_images=24, dim_v=16, knn_size=6, n_words=20,
        n_answers=8, seed=3)
    opt = synthetic.tiny_vqa_options(dim_v=16, nans=8)
    vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                              dataset["vocab_answers"])
    spec = dict(dim_h=16, n_layers=1, drop_p=0.2, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True, z_emb=True,
                pretrained_emb=False, trainable_vqa=False)
    model = factory.factory_cx("NeuralModel", vqa, knn_size=6,
                               model_spec=spec)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = store.to_device()
    optimizer = optax.adam(1e-3)
    batch = vqacx.gather_batch(arrays, np.arange(16))
    state = cx_engine.init_cx_state(model, optimizer, batch, features)
    return model, optimizer, state, features, arrays


def test_precompute_matches_in_step_encoder(setup):
    model, optimizer, state, features, arrays = setup
    # batched precompute with an uneven final chunk
    q_table = cx_engine.precompute_q_emb(model, state.params,
                                         arrays.question_wids, batch_size=20)
    assert q_table.shape == (arrays.size, q_table.shape[1])

    es_plain = cx_engine.make_cx_eval_step(model, recall_k=3)
    es_cache = cx_engine.make_cx_eval_step(model, recall_k=3,
                                           use_q_cache=True)
    r_plain = cx_engine.eval_model(es_plain, state.params, features, arrays,
                                   16)
    r_cache = cx_engine.eval_model(es_cache, state.params, features, arrays,
                                   16, q_table=q_table)
    for key in r_plain:
        assert r_plain[key] == pytest.approx(r_cache[key], abs=1e-5), key


def test_cached_training_matches_uncached(setup):
    import jax

    model, optimizer, state, features, arrays = setup
    q_table = cx_engine.precompute_q_emb(model, state.params,
                                         arrays.question_wids)

    ts_plain = cx_engine.make_cx_train_step(model, optimizer, recall_k=3)
    ts_cache = cx_engine.make_cx_train_step(model, optimizer, recall_k=3,
                                            use_q_cache=True)
    # donation: copy the starting state for the second run
    copy = jax.tree_util.tree_map(lambda x: x.copy(), state)
    s1, s2 = state, copy
    rng1, rng2 = (np.random.default_rng(7) for _ in range(2))
    for _ in range(3):
        s1, m1 = cx_engine.train_epoch(ts_plain, s1, features, arrays, 16,
                                       rng=rng1)
        s2, m2 = cx_engine.train_epoch(ts_cache, s2, features, arrays, 16,
                                       rng=rng2, q_table=q_table)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_q_cache_valid_for_pairwise_views(setup):
    """pairwise_view resamples the candidate triple but keeps row i =
    example i, so example_idxs still index the q table — cached pairwise
    training must match uncached."""
    import jax

    model, optimizer, state, features, arrays = setup
    pw_model = model  # PairwiseModel shape-derives K; NeuralModel can't — use
    # the engine path with the same model through arrays.pairwise_view via
    # train_epoch(pairwise=True) on a shape-agnostic scorer instead:
    from vqa_counterexamples_tpu.models import factory

    pw = factory.factory_cx("PairwiseModel", model.vqa_model, knn_size=2)
    import optax

    opt2 = optax.adam(1e-3)
    import numpy as np

    from vqa_counterexamples_tpu.data import vqacx as vqacx_mod

    batch = vqacx_mod.gather_batch(arrays.pairwise_view(
        np.random.default_rng(5)), np.arange(16))
    st = cx_engine.init_cx_state(pw, opt2, batch, features)
    q_table = cx_engine.precompute_q_emb(pw, st.params,
                                         arrays.question_wids)
    ts_plain = cx_engine.make_cx_train_step(pw, opt2, recall_k=1)
    ts_cache = cx_engine.make_cx_train_step(pw, opt2, recall_k=1,
                                            use_q_cache=True)
    copy = jax.tree_util.tree_map(lambda x: x.copy(), st)
    rng1, rng2 = (np.random.default_rng(7) for _ in range(2))
    s1, _ = cx_engine.train_epoch(ts_plain, st, features, arrays, 16,
                                  pairwise=True, rng=rng1)
    s2, _ = cx_engine.train_epoch(ts_cache, copy, features, arrays, 16,
                                  pairwise=True, rng=rng2, q_table=q_table)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_q_cache_rejects_trainable_vqa(setup):
    model, optimizer, *_ = setup
    trainable = model.clone(trainable_vqa=True)
    with pytest.raises(ValueError):
        cx_engine.make_cx_train_step(trainable, optimizer, use_q_cache=True)
