"""AUTO entry-layout policy (core/policy.auto_layout_jit_kwargs).

On a single device the donated train state is jitted with ``Layout.AUTO``
in/out so XLA picks the state's memory layouts once and the per-step relayout
copies disappear (measured +14% on MutanNoAtt pretraining at B=512 bf16 and
+14.5% on MutanAtt B=256).  Multi-device runs keep default layouts — mesh
shardings own the layout story there — and ``VQACX_AUTO_LAYOUT=0/1``
overrides either way.  These tests pin the gating plus train-step
equivalence under the forced-on path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqa_counterexamples_tpu.core import policy


def _set_env(monkeypatch, value):
    if value is None:
        monkeypatch.delenv("VQACX_AUTO_LAYOUT", raising=False)
    else:
        monkeypatch.setenv("VQACX_AUTO_LAYOUT", value)


def test_gating_multi_device_defaults_off(monkeypatch):
    # the suite runs on the virtual 8-device CPU mesh -> default off
    _set_env(monkeypatch, None)
    assert jax.device_count() > 1
    assert policy.auto_layout_jit_kwargs(1) == {}


def test_gating_env_force_on(monkeypatch):
    _set_env(monkeypatch, "1")
    kw = policy.auto_layout_jit_kwargs(3)
    assert set(kw) == {"in_shardings", "out_shardings"}
    assert len(kw["in_shardings"]) == 4
    assert kw["in_shardings"][1:] == (None, None, None)
    assert len(kw["out_shardings"]) == 2


def test_gating_env_force_off(monkeypatch):
    _set_env(monkeypatch, "0")
    assert policy.auto_layout_jit_kwargs(1) == {}


def test_auto_layout_step_matches_default(monkeypatch):
    """Layouts are physical tiling only: forced-on AUTO must reproduce the
    default-layout VQA train step bit-for-bit on the same platform."""
    from vqa_counterexamples_tpu.data import synthetic
    from vqa_counterexamples_tpu.engines import vqa_engine
    from vqa_counterexamples_tpu.models import factory

    opt = synthetic.tiny_vqa_options(dim_v=32, nans=40, dim_q=24)
    vocab_words = ["w%d" % i for i in range(60)]
    vocab_answers = ["a%d" % i for i in range(40)]
    model = factory.factory_vqa(opt, vocab_words, vocab_answers)
    rng = np.random.default_rng(0)
    batch = {
        "visual": jnp.asarray(
            rng.standard_normal((8, 32), dtype=np.float32)),
        "question": jnp.asarray(
            rng.integers(1, 60, (8, 26)).astype(np.int32)),
        "answer": jnp.asarray(rng.integers(0, 40, (8,)).astype(np.int32)),
    }
    optimizer = optax.adam(1e-3)

    losses = {}
    for mode in ("0", "1"):
        _set_env(monkeypatch, mode)
        state = vqa_engine.init_vqa_state(model, optimizer, batch)
        step = vqa_engine.make_vqa_train_step(model, optimizer)
        for _ in range(3):
            state, m = step(state, batch)
        losses[mode] = float(m["loss"])
    assert losses["0"] == pytest.approx(losses["1"], abs=0.0)


def test_auto_layout_cx_step_runs(monkeypatch):
    """CX train step under forced-on AUTO: optional cache args, .lower."""
    from vqa_counterexamples_tpu.data import synthetic, vqacx
    from vqa_counterexamples_tpu.engines import cx_engine
    from vqa_counterexamples_tpu.models import factory

    _set_env(monkeypatch, "1")
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=32, n_images=32, dim_v=16, knn_size=24, n_answers=30,
        seed=0)
    opt = synthetic.tiny_vqa_options(dim_v=16, nans=30, dim_q=20)
    vqa_model = factory.factory_vqa(opt, dataset["vocab_words"],
                                    dataset["vocab_answers"])
    model = factory.factory_cx(
        "NeuralModel", vqa_model, knn_size=24,
        model_spec=dict(dim_h=8, n_layers=2, drop_p=0.25, v_emb=True,
                        v_mult=True, v_dist=True, v_rank=True, q_emb=True,
                        a_emb=True, z_emb=True, pretrained_emb=False,
                        trainable_vqa=False))
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = store.to_device()
    optimizer = optax.adam(1e-3)
    batch = vqacx.gather_batch(arrays, np.arange(8))
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    nv = jnp.asarray(8.0)
    state = cx_engine.init_cx_state(model, optimizer, batch, features)
    step = cx_engine.make_cx_train_step(model, optimizer)
    state, m = step(state, features, b, nv)          # no cache args
    state, m = step(state, features, b, nv)
    assert np.isfinite(float(m["loss"]))
    step.lower(state, features, b, nv).compile()     # bench's MFU path


def test_default_on_false_gating(monkeypatch):
    # CX callers pass default_on=False: AUTO stays off unless forced — an
    # AUTO state is a dispatch hazard for the plain-jit scan/eval programs
    # that share it (policy.dispatch_safe docstring)
    _set_env(monkeypatch, None)
    assert policy.auto_layout_jit_kwargs(1, default_on=False) == {}
    _set_env(monkeypatch, "1")
    assert policy.auto_layout_jit_kwargs(1, default_on=False) != {}
    _set_env(monkeypatch, "0")
    assert policy.auto_layout_jit_kwargs(1, default_on=False) == {}


def test_dispatch_safe_gating(monkeypatch):
    x = {"a": jnp.arange(16.0).reshape(4, 4)}
    _set_env(monkeypatch, "0")
    assert policy.dispatch_safe(x)["a"] is x["a"]  # no-op when AUTO off
    _set_env(monkeypatch, "1")
    y = policy.dispatch_safe(x)
    assert y["a"] is not x["a"]
    np.testing.assert_array_equal(np.asarray(y["a"]), np.asarray(x["a"]))
    assert not y["a"].committed
