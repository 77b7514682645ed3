"""Precomputed fused-embedding (z) cache: identical numerics to the in-step
fusion.

The q_emb/v_proj caching logic taken to its conclusion: with
``trainable_vqa=False`` the entire MUTAN fusion output is a training
constant per (question, image) pair (reference cx.py:59-60 freezes the VQA
model in eval mode; cache.ipynb prototyped activation caching), so
``cx_engine.precompute_z_emb`` hoists it out of the step as an
(n_examples, K+1, dim_mm) table gathered by ``batch['example_idxs']``.
These tests pin the contract: cached and uncached paths give the same
scores and training trajectory, the v_emb lesion bypasses the cache, and
trainable backbones are rejected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqa_counterexamples_tpu.data import synthetic, vqacx
from vqa_counterexamples_tpu.engines import cx_engine
from vqa_counterexamples_tpu.models import factory


def _setup(**spec_over):
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=48, n_images=24, dim_v=16, knn_size=6, n_words=20,
        n_answers=8, seed=5)
    opt = synthetic.tiny_vqa_options(dim_v=16, nans=8)
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


def _tables(model, state, features, arrays, z_chunk=20):
    q_table = cx_engine.precompute_q_emb(model, state.params,
                                         arrays.question_wids)
    v_table = cx_engine.precompute_v_proj(model, state.params, features)
    # uneven final chunk exercises the padding path
    z_table = cx_engine.precompute_z_emb(model, state.params, features,
                                         arrays.image_idxs, q_table,
                                         v_table=v_table,
                                         batch_size=z_chunk)
    return q_table, v_table, z_table


def test_z_cache_matches_in_step_fusion(setup):
    model, optimizer, state, features, arrays = setup
    q_table, v_table, z_table = _tables(model, state, features, arrays)
    assert z_table.shape == (arrays.size, arrays.knn_size + 1,
                             model.vqa_model.opt["fusion"]["dim_mm"])

    es_plain = cx_engine.make_cx_eval_step(model, recall_k=3)
    es_cache = cx_engine.make_cx_eval_step(model, recall_k=3,
                                           use_q_cache=True,
                                           use_z_cache=True)
    r_plain = cx_engine.eval_model(es_plain, state.params, features, arrays,
                                   16)
    r_cache = cx_engine.eval_model(es_cache, state.params, features, arrays,
                                   16, q_table=q_table, z_table=z_table)
    for key in r_plain:
        assert r_plain[key] == pytest.approx(r_cache[key], abs=1e-5), key


def test_z_cache_built_without_v_table(setup):
    # building z straight from the fusion (no v_proj intermediate) matches
    model, optimizer, state, features, arrays = setup
    q_table, v_table, z_table = _tables(model, state, features, arrays)
    z_direct = cx_engine.precompute_z_emb(model, state.params, features,
                                          arrays.image_idxs, q_table)
    np.testing.assert_allclose(np.asarray(z_table), np.asarray(z_direct),
                               rtol=1e-6, atol=1e-6)


def test_z_cached_training_matches_uncached(setup):
    # Tolerance note mirrors test_v_cache: the cached fusion runs at a
    # different GEMM shape than the in-step one (chunked example rows vs
    # B*(K+1) candidate rows), so ulp-level differences get amplified by
    # Adam's sign normalization — one step pinned tightly, an epoch loosely.
    model, optimizer, state, features, arrays = setup
    q_table, v_table, z_table = _tables(model, state, features, arrays)

    ts_plain = cx_engine.make_cx_train_step(model, optimizer, recall_k=3)
    ts_cache = cx_engine.make_cx_train_step(model, optimizer, recall_k=3,
                                            use_q_cache=True,
                                            use_z_cache=True)
    copy = jax.tree_util.tree_map(lambda x: x.copy(), state)
    s1, s2 = state, copy

    batch = vqacx.gather_batch(arrays, np.arange(16))
    nv = jnp.asarray(16.0, jnp.float32)
    s1, m1 = ts_plain(s1, features, batch, nv)
    s2, m2 = ts_cache(s2, features, batch, nv, q_table, None, z_table)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-5)
    assert float(m1["correct"]) == float(m2["correct"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.5e-3)

    rng1, rng2 = (np.random.default_rng(7) for _ in range(2))
    s1, _ = cx_engine.train_epoch(ts_plain, s1, features, arrays, 16,
                                  rng=rng1)
    s2, _ = cx_engine.train_epoch(ts_cache, s2, features, arrays, 16,
                                  rng=rng2, q_table=q_table, z_table=z_table)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)


def test_z_cache_device_accumulate_and_out_dtype(monkeypatch):
    # Scale path: past Z_DEVICE_ACCUM_BYTES the chunks write in place into a
    # preallocated device buffer via donated dynamic_update_slice (the
    # chunk-list concat would transiently hold 2x the f32 table — 15.6 GB
    # at VQA2-CX train scale — and the round-2 host-accumulate cost 422 s
    # of tunneled D2H).  Numerics must be identical, the result still
    # uncommitted; out_dtype chunk-casting must equal casting the finished
    # table.
    # (fresh setup: the shared fixture's state gets donated by the training
    # test above)
    model, optimizer, state, features, arrays = _setup()
    q_table, v_table, z_table = _tables(model, state, features, arrays)

    monkeypatch.setattr(cx_engine, "Z_DEVICE_ACCUM_BYTES", 0)
    z_host = cx_engine.precompute_z_emb(model, state.params, features,
                                        arrays.image_idxs, q_table,
                                        v_table=v_table, batch_size=20)
    np.testing.assert_array_equal(np.asarray(z_host), np.asarray(z_table))
    assert not z_host.committed

    z_bf16 = cx_engine.precompute_z_emb(model, state.params, features,
                                        arrays.image_idxs, q_table,
                                        v_table=v_table, batch_size=20,
                                        out_dtype=jnp.bfloat16)
    assert z_bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(z_bf16),
                                  np.asarray(z_table.astype(jnp.bfloat16)))


def test_v_emb_lesion_bypasses_z_cache():
    model, optimizer, state, features, arrays = _setup(v_emb=False)
    q_table, v_table, z_table = _tables(model, state, features, arrays)
    es_plain = cx_engine.make_cx_eval_step(model, recall_k=3)
    es_cache = cx_engine.make_cx_eval_step(model, recall_k=3,
                                           use_q_cache=True,
                                           use_z_cache=True)
    r_plain = cx_engine.eval_model(es_plain, state.params, features, arrays,
                                   16)
    r_cache = cx_engine.eval_model(es_cache, state.params, features, arrays,
                                   16, q_table=q_table, z_table=z_table)
    for key in r_plain:
        assert r_plain[key] == pytest.approx(r_cache[key], abs=1e-5), key


def test_z_table_uncommitted():
    # jax rejects *committed* arrays passed under Layout.AUTO jit args, and
    # committedness is viral: one committed operand commits every output of
    # the AUTO-layout train step, so its donated state errors on re-entry
    # ("argument passed is a `jax.Array` with a concrete layout").  The
    # table must therefore come back row-major but UNCOMMITTED, and
    # as_row_major must uncommit an already-committed table.
    # (fresh setup: the shared fixture's state gets donated by the
    # training test above)
    model, optimizer, state, features, arrays = _setup()
    q_table, v_table, z_table = _tables(model, state, features, arrays)
    assert not z_table.committed

    committed = jax.device_put(
        z_table, jax.sharding.SingleDeviceSharding(jax.devices()[0]))
    assert committed.committed
    fixed = cx_engine.as_row_major(committed)
    assert not fixed.committed
    np.testing.assert_array_equal(np.asarray(fixed), np.asarray(z_table))


def test_z_cache_rejects_trainable_vqa(setup):
    model, optimizer, *_ = setup
    trainable = model.clone(trainable_vqa=True)
    with pytest.raises(ValueError):
        cx_engine.make_cx_train_step(trainable, optimizer, use_z_cache=True)


def test_build_frozen_caches_shared_recipe():
    # the shared builder (bench/soak/E2E recipe) matches the hand-built
    # tables and enforces the "z subsumes v" rule.  Fresh setup: the
    # module fixture's state is donated away by the training test above.
    model, optimizer, state, features, arrays = _setup()
    q_ref, v_ref, z_ref = _tables(model, state, features, arrays,
                                  z_chunk=arrays.size)

    q, v, z, stage_s = cx_engine.build_frozen_caches(
        model, state.params, features, arrays)
    assert v is None  # z subsumes v in the step
    # base stages (chunk-stat keys like q_first_chunk_s ride alongside,
    # cx_engine._stage_chunk_stats)
    base = {k for k in stage_s if "_" not in k}
    assert base == {"q", "v", "z"}  # v built as the z build aid
    for stg in base:
        assert stage_s[stg + "_chunks"] >= 1
        assert 0.0 < stage_s[stg + "_first_chunk_s"] <= stage_s[stg]
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-6, atol=1e-6)

    # v kept (and timed) when requested without z
    q2, v2, z2, stage2 = cx_engine.build_frozen_caches(
        model, state.params, features, arrays, use_v=True, use_z=False)
    assert z2 is None and {k for k in stage2 if "_" not in k} == {"q", "v"}
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref),
                               rtol=1e-6, atol=1e-6)

    # bf16 residency: dtypes flip, values stay within a bf16 ulp
    f16, q16, _, z16 = cx_engine.make_tables_bf16_resident(
        features, q, None, z)
    assert f16.dtype == q16.dtype == z16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(z16, np.float32), np.asarray(z),
                               rtol=8e-3, atol=8e-3)
