"""Multi-device data parallelism on the virtual 8-device CPU mesh.

The TPU-native replacement for the reference's nn.DataParallel
(SURVEY.md section 2.4): the jitted train step with batch sharded over the
'data' axis must produce the same numbers as the single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from vqa_counterexamples_tpu.data import synthetic, vqacx
from vqa_counterexamples_tpu.engines import cx_engine
from vqa_counterexamples_tpu.models import factory
from vqa_counterexamples_tpu.parallel import make_mesh, shard_batch

KNN = 6
BATCH = 16


def _setup(opt_name: str = "adam"):
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=BATCH * 2, n_images=48, dim_v=32, knn_size=KNN,
        n_words=20, n_answers=8, seed=3)
    opt = synthetic.tiny_vqa_options(dim_v=32, nans=8)
    vqa_model = factory.factory_vqa(opt, dataset["vocab_words"],
                                    dataset["vocab_answers"])
    spec = dict(dim_h=16, n_layers=1, drop_p=0.0, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True, z_emb=True,
                pretrained_emb=False, trainable_vqa=False)
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=KNN,
                               model_spec=spec)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = jnp.asarray(store.features)
    # SGD for exact single-vs-sharded comparisons: Adam's first-step update is
    # +/-lr even for ~0 grads, so f32 psum reduction-order noise flips signs
    optimizer = optax.sgd(0.1) if opt_name == "sgd" else optax.adam(1e-3)
    batch = vqacx.gather_batch(arrays, np.arange(BATCH))
    state = cx_engine.init_cx_state(model, optimizer, batch, features)
    train_step = cx_engine.make_cx_train_step(model, optimizer)
    return model, optimizer, state, features, batch, train_step


def test_mesh_construction():
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.shape == {"data": 4, "model": 2}
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device():
    model, optimizer, state, features, batch, train_step = _setup("sgd")
    nv = jnp.asarray(float(BATCH), jnp.float32)

    def fresh(s):  # train_step donates its input state
        return jax.tree_util.tree_map(jnp.copy, s)

    _, m_single = train_step(fresh(state), features, batch, nv)

    mesh = make_mesh({"data": 8})
    repl = NamedSharding(mesh, P())
    state_r = jax.device_put(fresh(state), repl)
    features_r = jax.device_put(features, repl)
    batch_s = shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        new_state, m_dp = train_step(state_r, features_r, batch_s, nv)

    assert abs(float(m_single["loss"]) - float(m_dp["loss"])) < 1e-4
    assert float(m_single["correct"]) == float(m_dp["correct"])
    # params updated identically (allreduce-consistent)
    w_single, _ = jax.tree_util.tree_flatten(
        train_step(fresh(state), features, batch, nv)[0].params)
    w_dp, _ = jax.tree_util.tree_flatten(new_state.params)
    for a, b in zip(w_single, w_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_dp_epoch_runs_sharded():
    model, optimizer, state, features, batch, train_step = _setup()
    mesh = make_mesh({"data": 8})
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    features = jax.device_put(features, repl)
    nv = jnp.asarray(float(BATCH), jnp.float32)
    with jax.set_mesh(mesh):
        for _ in range(3):
            state, m = train_step(state, features,
                                  shard_batch(batch, mesh), nv)
    assert np.isfinite(float(m["loss"]))


def test_distributed_flag_helpers(monkeypatch):
    """--distributed: off by default (no-op), on -> jax.distributed.initialize.

    Multi-host bootstrap for pod-slice runs (replaces the implicit NCCL
    inside the reference's nn.DataParallel, SURVEY.md section 2.4); the
    actual cross-host path needs a real slice, so here we pin the CLI
    contract: parser default False, no-op unless set, initialize() called
    exactly once (before any mesh construction) when set.
    """
    import argparse

    from vqa_counterexamples_tpu.parallel import (add_distributed_flag,
                                                  maybe_initialize_distributed)

    parser = argparse.ArgumentParser()
    add_distributed_flag(parser)
    assert parser.parse_args([]).distributed is False
    assert parser.parse_args(["--distributed"]).distributed is True

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    maybe_initialize_distributed(parser.parse_args([]))
    assert calls == []
    maybe_initialize_distributed(parser.parse_args(["--distributed"]))
    assert calls == [1]
