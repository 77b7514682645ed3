"""Decompose the CX train-step time by component via spec ablations.

XLA dead-code-eliminates whatever a lesioned spec stops consuming, so timing
a family of ablated steps gives a component-cost breakdown without parsing
profiler protobufs (the tunneled chip's trace path is unvalidated).  Variants:

  full          the shipped bench step (q+v caches, bf16 policy per env)
  fwd_only      eval step (no grads/Adam) -> fwd vs bwd split
  no_a_emb      a_emb=False: classify GEMM + softmax + answer mixture DCE'd
  no_v_mult     v_mult=False: the elementwise-mul feature + its GEMM block
  no_v_feats    v_emb=False: raw-feature gather + all v blocks (keeps fusion
                inputs random — fusion itself still runs)
  bf16_tables   full, with features/v_table/q_table stored bf16 (halves the
                gather traffic; GEMMs already compute bf16 under the policy)

Usage: python scripts/profile_step.py [--batch 384] [--steps 50]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VQACX_ENABLE_PALLAS", "1")


def build(spec_over=None, batch_size=384):
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vqa_counterexamples_tpu.core.profiler import hard_sync
    from vqa_counterexamples_tpu.data import synthetic, vqacx
    from vqa_counterexamples_tpu.engines import cx_engine
    from vqa_counterexamples_tpu.models import factory

    dataset, store = synthetic.make_synthetic_cx(
        n_examples=2048, n_images=1024, dim_v=2048, knn_size=24,
        n_answers=2000, seed=0)
    opt = synthetic.tiny_vqa_options(dim_v=2048, nans=2000, dim_q=2400)
    opt["seq2vec"] = {"arch": "skipthoughts", "type": "BayesianUniSkip",
                      "dropout": 0.25, "fixed_emb": False}
    opt["fusion"].update(dim_hv=360, dim_hq=360, dim_mm=360, R=10)
    vqa_model = factory.factory_vqa(opt, dataset["vocab_words"],
                                    dataset["vocab_answers"])
    spec = dict(dim_h=300, n_layers=2, drop_p=0.25, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True, z_emb=True,
                pretrained_emb=False, trainable_vqa=False)
    spec.update(spec_over or {})
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=24,
                               model_spec=spec)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = store.to_device()
    optimizer = optax.adam(1e-4)
    state = cx_engine.init_cx_state(
        model, optimizer, vqacx.gather_batch(arrays, np.arange(batch_size)),
        features)
    q_table = cx_engine.precompute_q_emb(model, state.params,
                                         arrays.question_wids,
                                         batch_size=2048)
    v_table = cx_engine.precompute_v_proj(model, state.params, features)
    batch = vqacx.gather_batch(arrays, np.arange(batch_size))
    nv = jnp.asarray(float(batch_size), jnp.float32)
    return (model, optimizer, state, features, batch, nv, q_table, v_table,
            cx_engine)


def time_step(fn, args, steps):
    import jax

    out = fn(*args)
    hard_sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    hard_sync(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    results = {}

    def record(name, dt):
        results[name] = round(dt * 1e3, 3)
        print(json.dumps({"variant": name, "ms_per_step": results[name],
                          "examples_per_sec": round(args.batch / dt, 1)}),
              flush=True)

    # full (train) and fwd-only share one build
    (model, optimizer, state, features, batch, nv, q_table, v_table,
     cx_engine) = build(batch_size=args.batch)
    ts = cx_engine.make_cx_train_step(model, optimizer, use_q_cache=True,
                                      use_v_cache=True)
    es = cx_engine.make_cx_eval_step(model, use_q_cache=True,
                                     use_v_cache=True)
    # train_step donates state: rebuild args per call is wrong; instead keep
    # feeding the returned state through a stateful wrapper
    st = {"s": state}

    def train_once(features, batch, nv, q, v):
        st["s"], m = ts(st["s"], features, batch, nv, q, v)
        return m["loss"]

    record("full", time_step(train_once,
                             (features, batch, nv, q_table, v_table),
                             args.steps))
    record("fwd_only", time_step(
        lambda *a: es(st["s"].params, *a)["loss_sum"],
        (features, batch, nv, jnp.asarray(0, jnp.int32), q_table, v_table),
        args.steps))

    # bf16-resident tables: same program, half the gather traffic
    bf = jnp.bfloat16
    st2 = {"s": st["s"]}

    def train_bf(features, batch, nv, q, v):
        st2["s"], m = ts(st2["s"], features, batch, nv, q, v)
        return m["loss"]

    record("bf16_tables", time_step(
        train_bf, (features.astype(bf), batch, nv, q_table.astype(bf),
                   v_table.astype(bf)), args.steps))

    for name, over in [("no_a_emb", {"a_emb": False}),
                       ("no_v_mult", {"v_mult": False}),
                       ("no_v_feats", {"v_emb": False})]:
        (model, optimizer, state, features, batch, nv, q_table, v_table,
         cx_engine) = build(over, batch_size=args.batch)
        ts_v = cx_engine.make_cx_train_step(model, optimizer,
                                            use_q_cache=True,
                                            use_v_cache=True)
        stv = {"s": state}

        def once(features, batch, nv, q, v, _ts=ts_v, _st=stv):
            _st["s"], m = _ts(_st["s"], features, batch, nv, q, v)
            return m["loss"]

        record(name, time_step(once,
                               (features, batch, nv, q_table, v_table),
                               args.steps))

    print(json.dumps({"summary_ms": results}))


if __name__ == "__main__":
    main()
