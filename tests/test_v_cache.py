"""Precomputed fusion v-projection cache: identical numerics to the in-step
v-side GEMMs.

With ``trainable_vqa=False`` the MUTAN v-side (dropout -> linear_v -> tanh ->
w_hv) is a pure function of the image (reference cx.py:59-60 freezes the VQA
model in eval mode), so ``cx_engine.precompute_v_proj`` hoists it out of the
step as an (n_images, R*dim_mm) table gathered by ``batch['image_idxs']``.
These tests pin the contract: cached and uncached paths give the same scores,
the same training trajectory, caches compose with the q_emb cache, the
v_emb lesion ignores the cache, and trainable backbones are rejected.
"""

import jax
import numpy as np
import optax
import pytest

from vqa_counterexamples_tpu.data import synthetic, vqacx
from vqa_counterexamples_tpu.engines import cx_engine
from vqa_counterexamples_tpu.models import factory


def _setup(arch="MutanNoAtt", **spec_over):
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=48, n_images=24, dim_v=16, knn_size=6, n_words=20,
        n_answers=8, seed=3)
    opt = synthetic.tiny_vqa_options(dim_v=16, nans=8)
    opt["arch"] = arch
    if arch == "MLBNoAtt":
        opt["fusion"] = {"dim_v": 16, "dim_q": opt["fusion"]["dim_q"],
                         "dim_h": 24, "dropout_v": 0.5, "dropout_q": 0.5,
                         "activation_v": "tanh", "activation_q": "tanh"}
    vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                              dataset["vocab_answers"])
    spec = dict(dim_h=16, n_layers=1, drop_p=0.2, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True, z_emb=True,
                pretrained_emb=False, trainable_vqa=False)
    spec.update(spec_over)
    model = factory.factory_cx("NeuralModel", vqa, knn_size=6,
                               model_spec=spec)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = store.to_device()
    optimizer = optax.adam(1e-3)
    batch = vqacx.gather_batch(arrays, np.arange(16))
    state = cx_engine.init_cx_state(model, optimizer, batch, features)
    return model, optimizer, state, features, arrays


@pytest.fixture(scope="module")
def setup():
    return _setup()


def test_v_cache_matches_in_step_fusion(setup):
    model, optimizer, state, features, arrays = setup
    # batched precompute with an uneven final chunk
    v_table = cx_engine.precompute_v_proj(model, state.params, features,
                                          batch_size=10)
    assert v_table.shape[0] == features.shape[0]

    es_plain = cx_engine.make_cx_eval_step(model, recall_k=3)
    es_cache = cx_engine.make_cx_eval_step(model, recall_k=3,
                                           use_v_cache=True)
    r_plain = cx_engine.eval_model(es_plain, state.params, features, arrays,
                                   16)
    r_cache = cx_engine.eval_model(es_cache, state.params, features, arrays,
                                   16, v_table=v_table)
    for key in r_plain:
        assert r_plain[key] == pytest.approx(r_cache[key], abs=1e-5), key


def test_v_cache_composes_with_q_cache(setup):
    model, optimizer, state, features, arrays = setup
    q_table = cx_engine.precompute_q_emb(model, state.params,
                                         arrays.question_wids)
    v_table = cx_engine.precompute_v_proj(model, state.params, features)

    es_plain = cx_engine.make_cx_eval_step(model, recall_k=3)
    es_both = cx_engine.make_cx_eval_step(model, recall_k=3,
                                          use_q_cache=True, use_v_cache=True)
    r_plain = cx_engine.eval_model(es_plain, state.params, features, arrays,
                                   16)
    r_both = cx_engine.eval_model(es_both, state.params, features, arrays,
                                  16, q_table=q_table, v_table=v_table)
    for key in r_plain:
        assert r_plain[key] == pytest.approx(r_both[key], abs=1e-5), key


def test_cached_training_matches_uncached(setup):
    # Note on tolerances: unlike the q cache (the identical jitted encoder
    # runs in both paths, so it is bitwise), the v cache computes hv at a
    # different GEMM shape (unique images vs B*(K+1) candidate rows), which
    # differs at the last ulp; Adam's sign-normalized updates amplify that
    # chaotically on near-zero-gradient scalars over many steps.  So: one
    # step is pinned tightly, a full epoch at a looser bound.
    import jax.numpy as jnp

    from vqa_counterexamples_tpu.data import vqacx as vqacx_mod

    model, optimizer, state, features, arrays = setup
    q_table = cx_engine.precompute_q_emb(model, state.params,
                                         arrays.question_wids)
    v_table = cx_engine.precompute_v_proj(model, state.params, features)

    ts_plain = cx_engine.make_cx_train_step(model, optimizer, recall_k=3)
    ts_cache = cx_engine.make_cx_train_step(model, optimizer, recall_k=3,
                                            use_q_cache=True,
                                            use_v_cache=True)
    copy = jax.tree_util.tree_map(lambda x: x.copy(), state)
    s1, s2 = state, copy

    # single-step: loss/metrics and updated params match tightly
    batch = vqacx_mod.gather_batch(arrays, np.arange(16))
    nv = jnp.asarray(16.0, jnp.float32)
    s1, m1 = ts_plain(s1, features, batch, nv)
    s2, m2 = ts_cache(s2, features, batch, nv, q_table, v_table)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-5)
    assert float(m1["correct"]) == float(m2["correct"])
    # per-step Adam updates are bounded by ~lr regardless of |grad|, so an
    # ulp-level grad difference on a near-zero-gradient element moves a
    # param by at most ~2*lr (sign flip) — the tolerance floor is lr=1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.5e-3)

    # full epoch: same trajectory within chaotic-amplification bounds
    rng1, rng2 = (np.random.default_rng(7) for _ in range(2))
    s1, _ = cx_engine.train_epoch(ts_plain, s1, features, arrays, 16,
                                  rng=rng1)
    s2, _ = cx_engine.train_epoch(ts_cache, s2, features, arrays, 16,
                                  rng=rng2, q_table=q_table, v_table=v_table)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)


def test_v_cache_mlb_fusion():
    # module-level parity for the MLB Hadamard fusion (the CX zoo itself
    # always rides a MUTAN backbone, as in the reference)
    from vqa_counterexamples_tpu.models import fusion as fusion_mod

    opt = {"dim_v": 16, "dim_q": 12, "dim_h": 24, "dropout_v": 0.5,
           "dropout_q": 0.5, "activation_v": "tanh", "activation_q": "tanh"}
    mod = fusion_mod.MLBFusion(opt)
    key = jax.random.key(0)
    v = jax.random.normal(jax.random.key(1), (4, 7, 16))
    q = jax.random.normal(jax.random.key(2), (4, 12))
    params = mod.init(key, v[:, 0], q, deterministic=True)

    z_plain = mod.apply(params, v, q, deterministic=True,
                        method=lambda m, v, q, **kw: m.fuse_candidates(
                            v, q, **kw))
    hv = mod.apply(params, v.reshape(28, 16),
                   method=lambda m, x: m.v_project(x, True)).reshape(4, 7, -1)
    z_cache = mod.apply(params, q, hv,
                        method=lambda m, q, hv: m.fuse_candidates(
                            None, q, deterministic=True, hv=hv))
    np.testing.assert_allclose(np.asarray(z_plain), np.asarray(z_cache),
                               rtol=1e-6, atol=1e-6)


def test_v_emb_lesion_ignores_cache():
    # lesioned features are redrawn per forward (reference cx.py:266) — the
    # cache must be bypassed, giving the same numbers as the uncached lesion
    model, optimizer, state, features, arrays = _setup(v_emb=False)
    v_table = cx_engine.precompute_v_proj(model, state.params, features)
    es_plain = cx_engine.make_cx_eval_step(model, recall_k=3)
    es_cache = cx_engine.make_cx_eval_step(model, recall_k=3,
                                           use_v_cache=True)
    r_plain = cx_engine.eval_model(es_plain, state.params, features, arrays,
                                   16)
    r_cache = cx_engine.eval_model(es_cache, state.params, features, arrays,
                                   16, v_table=v_table)
    for key in r_plain:
        assert r_plain[key] == pytest.approx(r_cache[key], abs=1e-5), key


def test_v_cache_rejects_trainable_vqa(setup):
    model, optimizer, *_ = setup
    trainable = model.clone(trainable_vqa=True)
    with pytest.raises(ValueError):
        cx_engine.make_cx_train_step(trainable, optimizer, use_v_cache=True)
