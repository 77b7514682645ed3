"""make_cx_train_scan == S sequential make_cx_train_step calls.

The scanned trainer exists to amortize per-dispatch host latency (one
dispatch per S steps); it must be bit-compatible with the sequential path —
the per-step rng keys fold on state.step carried through the scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqa_counterexamples_tpu.data import synthetic, vqacx
from vqa_counterexamples_tpu.engines import cx_engine
from vqa_counterexamples_tpu.models import factory


def _setup(use_caches):
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=64, n_images=32, dim_v=16, knn_size=4, n_words=20,
        n_answers=6, seed=3)
    opt = synthetic.tiny_vqa_options(dim_v=16, nans=6)
    vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                              dataset["vocab_answers"])
    spec = dict(dim_h=16, n_layers=1, drop_p=0.2, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True, z_emb=True,
                pretrained_emb=False, trainable_vqa=False)
    model = factory.factory_cx("NeuralModel", vqa, knn_size=4,
                               model_spec=spec)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = store.to_device()
    optimizer = optax.adam(1e-3)
    state = cx_engine.init_cx_state(
        model, optimizer, vqacx.gather_batch(arrays, np.arange(8)), features)
    extra = ()
    kwargs = dict(use_q_cache=False, use_v_cache=False)
    if use_caches:
        kwargs = dict(use_q_cache=True, use_v_cache=True)
        q_table = cx_engine.precompute_q_emb(model, state.params,
                                             arrays.question_wids,
                                             batch_size=64)
        v_table = cx_engine.precompute_v_proj(model, state.params, features)
        extra = (q_table, v_table)
    return model, optimizer, state, features, arrays, extra, kwargs


@pytest.mark.parametrize("use_caches", [False, True])
def test_scan_matches_sequential(use_caches):
    model, optimizer, state, features, arrays, extra, kwargs = _setup(
        use_caches)
    n_steps, bs = 4, 8
    rng = np.random.default_rng(0)
    batch_list = [vqacx.gather_batch(arrays, idx)
                  for idx, _ in vqacx.batch_indices(
                      bs * n_steps, bs, shuffle=True, rng=rng)]
    batch_list = [{k: jnp.asarray(v) for k, v in b.items()}
                  for b in batch_list]
    nv = jnp.asarray(float(bs), jnp.float32)

    train_step = cx_engine.make_cx_train_step(model, optimizer, **kwargs)
    # both trainers donate their state argument; give each its own buffers
    seq_state = jax.tree.map(jnp.copy, state)
    seq_metrics = []
    for b in batch_list:
        seq_state, m = train_step(seq_state, features, b, nv, *extra)
        seq_metrics.append(m)

    train_scan = cx_engine.make_cx_train_scan(model, optimizer, **kwargs)
    stacked = cx_engine.stack_batches(batch_list)
    n_valids = jnp.full((n_steps,), float(bs), jnp.float32)
    scan_state, scan_metrics = train_scan(state, features, stacked, n_valids,
                                          *extra)

    assert int(scan_state.step) == int(seq_state.step) == n_steps
    np.testing.assert_allclose(
        np.asarray(scan_metrics["loss"]),
        np.asarray([m["loss"] for m in seq_metrics]), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(scan_metrics["correct"]),
        np.asarray([m["correct"] for m in seq_metrics]))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=2e-6),
        scan_state.params, seq_state.params)


@pytest.mark.parametrize("use_caches", [False, True])
def test_train_epoch_scan_matches_sequential(use_caches):
    # the epoch driver's scan path (full groups as one dispatch + the short
    # remainder sequentially) must reproduce the sequential epoch exactly:
    # same shuffled batch order (same rng), same per-step fold_in keys
    model, optimizer, state, features, arrays, extra, kwargs = _setup(
        use_caches)
    q_table, v_table = (extra + (None, None))[:2]
    train_step = cx_engine.make_cx_train_step(model, optimizer, **kwargs)
    train_scan = cx_engine.make_cx_train_scan(model, optimizer, **kwargs)

    bs = 10  # 64 examples -> 7 batches: 2 scan groups of 3 + remainder 1
    seq_state = jax.tree.map(jnp.copy, state)
    seq_state, _ = cx_engine.train_epoch(
        train_step, seq_state, features, arrays, bs,
        rng=np.random.default_rng(5), q_table=q_table, v_table=v_table)
    scan_state, _ = cx_engine.train_epoch(
        train_step, state, features, arrays, bs,
        rng=np.random.default_rng(5), q_table=q_table, v_table=v_table,
        scan_step=train_scan, scan_len=3)

    assert int(scan_state.step) == int(seq_state.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=2e-6),
        scan_state.params, seq_state.params)
