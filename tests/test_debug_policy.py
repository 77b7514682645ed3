"""core/debug sanitizer switches + core/policy dtype scoping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_counterexamples_tpu.core import debug, policy


def test_check_numerics_catches_nan():
    debug.check_numerics(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    finally:
        debug.check_numerics(False)


def test_strict_shapes():
    debug.strict_shapes(True)
    try:
        with pytest.raises(ValueError):
            _ = jnp.ones((3, 4)) + jnp.ones((4,))
    finally:
        debug.strict_shapes(False)


def test_policy_scope_casts_and_restores():
    x = jnp.ones((4, 4))
    assert policy.cast_in(x).dtype == jnp.float32
    with policy.compute_dtype_scope("bfloat16"):
        assert policy.cast_in(x).dtype == jnp.bfloat16
        # matmul under the policy still accumulates f32 via the ops
        from vqa_counterexamples_tpu.ops.fusion import tucker_rank_fusion
        out = tucker_rank_fusion(
            x, x, jnp.ones((4, 8)), jnp.zeros((8,)), jnp.ones((4, 8)),
            jnp.zeros((8,)), rank=2)
        assert out.dtype == jnp.float32
    assert policy.cast_in(x).dtype == jnp.float32


def test_policy_bf16_matches_f32_loosely():
    rng = np.random.default_rng(0)
    xv = jnp.asarray(rng.normal(size=(16, 12)), jnp.float32)
    wv = jnp.asarray(rng.normal(size=(12, 8)), jnp.float32)
    from vqa_counterexamples_tpu.ops.fusion import tucker_rank_fusion
    args = (xv, xv, wv, jnp.zeros((8,)), wv, jnp.zeros((8,)))
    ref = tucker_rank_fusion(*args, rank=2)
    with policy.compute_dtype_scope("bfloat16"):
        out = tucker_rank_fusion(*args, rank=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2,
                               atol=3e-2)


def test_bf16_policy_end_to_end_training_still_learns():
    """Full CX training under the bf16 matmul policy: params stay f32,
    loss decreases, eval recall beats chance — the convergence evidence
    behind shipping bf16 GEMMs on the MXU."""
    import optax

    from vqa_counterexamples_tpu.data import synthetic, vqacx
    from vqa_counterexamples_tpu.engines import cx_engine
    from vqa_counterexamples_tpu.models import factory

    with policy.compute_dtype_scope("bfloat16"):
        dataset, store = synthetic.make_synthetic_cx(
            n_examples=96, n_images=48, dim_v=32, knn_size=6, n_words=20,
            n_answers=8, seed=1)
        opt = synthetic.tiny_vqa_options(dim_v=32, nans=8)
        vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                                  dataset["vocab_answers"])
        spec = dict(dim_h=32, n_layers=1, drop_p=0.1, v_emb=True,
                    v_mult=True, v_dist=True, v_rank=True, q_emb=True,
                    a_emb=True, z_emb=True, pretrained_emb=False,
                    trainable_vqa=False)
        model = factory.factory_cx("NeuralModel", vqa, knn_size=6,
                                   model_spec=spec)
        arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                              dataset["name_to_index"])
        features = store.to_device()
        optimizer = optax.adam(1e-3)
        state = cx_engine.init_cx_state(
            model, optimizer, vqacx.gather_batch(arrays, np.arange(16)),
            features)
        # params are created and kept f32 under the policy
        flat = jax.tree_util.tree_leaves(state.params)
        assert all(p.dtype == jnp.float32 for p in flat)

        ts = cx_engine.make_cx_train_step(model, optimizer, recall_k=3)
        es = cx_engine.make_cx_eval_step(model, recall_k=3)
        rng = np.random.default_rng(0)
        first_loss = None
        for _ in range(6):
            state, metrics = cx_engine.train_epoch(
                ts, state, features, arrays, 16, rng=rng,
                eval_fn=lambda st: cx_engine.eval_model(
                    es, st.params, features, arrays, 16))
            if first_loss is None:
                first_loss = metrics["loss"]
        assert metrics["loss"] < first_loss
        assert metrics["recall"] > 0.55  # chance = 3/6 = 0.5


def test_bf16_resident_tables_still_learn():
    """The shipped bench config: bf16 policy AND bf16-resident feature
    matrix + q_emb/v_proj cache tables (halves gather traffic; GEMMs cast
    to bf16 anyway).  Training must still converge and eval must agree
    with the f32-resident path to bf16 feature precision."""
    import optax

    from vqa_counterexamples_tpu.data import synthetic, vqacx
    from vqa_counterexamples_tpu.engines import cx_engine
    from vqa_counterexamples_tpu.models import factory

    with policy.compute_dtype_scope("bfloat16"):
        dataset, store = synthetic.make_synthetic_cx(
            n_examples=96, n_images=48, dim_v=32, knn_size=6, n_words=20,
            n_answers=8, seed=1)
        opt = synthetic.tiny_vqa_options(dim_v=32, nans=8)
        vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                                  dataset["vocab_answers"])
        spec = dict(dim_h=32, n_layers=1, drop_p=0.1, v_emb=True,
                    v_mult=True, v_dist=True, v_rank=True, q_emb=True,
                    a_emb=True, z_emb=True, pretrained_emb=False,
                    trainable_vqa=False)
        model = factory.factory_cx("NeuralModel", vqa, knn_size=6,
                                   model_spec=spec)
        arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                              dataset["name_to_index"])
        features = store.to_device()
        optimizer = optax.adam(1e-3)
        state = cx_engine.init_cx_state(
            model, optimizer, vqacx.gather_batch(arrays, np.arange(16)),
            features)
        q_table = cx_engine.precompute_q_emb(model, state.params,
                                             arrays.question_wids)
        v_table = cx_engine.precompute_v_proj(model, state.params, features)
        features16 = features.astype(jnp.bfloat16)
        q16 = q_table.astype(jnp.bfloat16)
        v16 = v_table.astype(jnp.bfloat16)

        ts = cx_engine.make_cx_train_step(model, optimizer, recall_k=3,
                                          use_q_cache=True, use_v_cache=True)
        es = cx_engine.make_cx_eval_step(model, recall_k=3,
                                         use_q_cache=True, use_v_cache=True)
        rng = np.random.default_rng(0)
        first_loss = None
        for _ in range(6):
            state, metrics = cx_engine.train_epoch(
                ts, state, features16, arrays, 16, rng=rng,
                q_table=q16, v_table=v16,
                eval_fn=lambda st: cx_engine.eval_model(
                    es, st.params, features16, arrays, 16,
                    q_table=q16, v_table=v16))
            if first_loss is None:
                first_loss = metrics["loss"]
        assert metrics["loss"] < first_loss
        assert metrics["recall"] > 0.55  # chance = 3/6 = 0.5


def test_host_init_scope_forces_xla_gates_and_matches_jitted_init(monkeypatch):
    """host_init_scope: Pallas gates report inactive inside the scope, and
    an eager (disable_jit) init produces the same values as flax's default
    jitted init — the scope changes WHERE init runs, never what it returns.
    """
    from vqa_counterexamples_tpu.models.fusion import MutanFusion

    assert not policy.host_init_active()
    with policy.host_init_scope():
        assert policy.host_init_active()
        # the tucker gate must refuse Pallas even when force-enabled
        # (monkeypatch restores any pre-existing value after the test)
        monkeypatch.setenv("VQACX_ENABLE_PALLAS", "1")
        opt = {"dim_v": 8, "dim_q": 8, "dim_hv": 6, "dim_hq": 6,
               "dim_mm": 5, "R": 2, "dropout_v": 0.0, "dropout_q": 0.0,
               "activation_v": "tanh", "activation_q": "tanh",
               "dropout_hv": 0, "dropout_hq": 0}
        x = jnp.ones((4, 8))
        v_jit_free = MutanFusion(opt).init(jax.random.key(7), x, x,
                                           deterministic=True)
    monkeypatch.delenv("VQACX_ENABLE_PALLAS")
    assert not policy.host_init_active()
    v_jit = MutanFusion(opt).init(jax.random.key(7), jnp.ones((4, 8)),
                                  jnp.ones((4, 8)), deterministic=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5),
        v_jit_free, v_jit)


def test_init_cx_state_runs_under_host_scope(monkeypatch):
    """init_cx_state must construct params on the host path (no device jit
    of the once-executed init program — measured 88-520 s on the tunneled
    runtime)."""
    import optax

    from vqa_counterexamples_tpu.data import synthetic, vqacx
    from vqa_counterexamples_tpu.engines import cx_engine
    from vqa_counterexamples_tpu.models import factory

    seen = {}
    orig = policy.host_init_scope

    def spy():
        seen["used"] = True
        return orig()

    monkeypatch.setattr(policy, "host_init_scope", spy)
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=8, n_images=8, dim_v=16, knn_size=4, n_words=10,
        n_answers=6, seed=0)
    opt = synthetic.tiny_vqa_options(dim_v=16, nans=6)
    vqa = factory.factory_vqa(opt, dataset["vocab_words"],
                              dataset["vocab_answers"])
    spec = dict(dim_h=8, n_layers=1, drop_p=0.0, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True,
                z_emb=True, pretrained_emb=False, trainable_vqa=False)
    model = factory.factory_cx("NeuralModel", vqa, knn_size=4,
                               model_spec=spec)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    state = cx_engine.init_cx_state(
        model, optax.adam(1e-3), vqacx.gather_batch(arrays, np.arange(8)),
        store.to_device())
    assert seen.get("used"), "init_cx_state no longer uses host_init_scope"
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda x: bool(np.all(np.isfinite(np.asarray(x)))), state.params))


def test_device_put_contiguous_normalizes_transposed_leaves():
    """Non-contiguous (transposed) host leaves must upload normalized:
    device_put of a transposed leaf keeps the transposed on-device layout
    and every jit call taking it pays a per-call relayout (measured
    2520 -> 11.4 ms/call on the serve predict, 2026-08-21)."""
    import numpy as np

    from vqa_counterexamples_tpu.core import policy

    base = np.arange(12, dtype=np.float32).reshape(3, 4)
    tree = {"w": base.T, "b": np.ones((4,), np.float32), "s": 2.0}
    assert not tree["w"].flags["C_CONTIGUOUS"]
    out = policy.device_put_contiguous(tree)
    np.testing.assert_array_equal(np.asarray(out["w"]), base.T)
    np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])
    assert float(out["s"]) == 2.0
    # idempotent on already-device trees
    out2 = policy.device_put_contiguous(out)
    np.testing.assert_array_equal(np.asarray(out2["w"]), base.T)


def test_device_put_contiguous_rejects_mesh_sharded_leaves():
    """A mesh-sharded leaf round-tripped through the host would silently
    lose its sharding — the normalizer must refuse instead (ADVICE r4:
    engines normalize BEFORE device_put'ing onto a mesh)."""
    import jax
    import numpy as np
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vqa_counterexamples_tpu.core import policy
    from vqa_counterexamples_tpu.parallel import make_mesh

    mesh = make_mesh({"data": 8}, jax.devices()[:8])
    sharded = jax.device_put(np.arange(16, dtype=np.float32).reshape(8, 2),
                             NamedSharding(mesh, P("data")))
    with pytest.raises(ValueError, match="mesh-sharded"):
        policy.device_put_contiguous({"w": sharded})
