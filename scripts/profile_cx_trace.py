"""Kernel-level xplane trace of the headline CX train step (bench.py shape).

Complements scripts/profile_step.py (spec-ablation decomposition) with the
per-op device-time report from scripts/parse_xplane.py.

Usage: python scripts/profile_cx_trace.py [--batch 384] [--steps 8] [--top 30]
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VQACX_ENABLE_PALLAS", "1")
os.environ.setdefault("VQACX_COMPUTE_DTYPE", "bfloat16")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--trace-dir", type=str, default="/tmp/cx_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=24,
                               model_spec=spec)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    features = store.to_device()
    optimizer = optax.adam(1e-4)
    state = cx_engine.init_cx_state(
        model, optimizer, vqacx.gather_batch(arrays, np.arange(args.batch)),
        features)
    use_z = os.environ.get("VQACX_BENCH_ZCACHE", "1") == "1"
    train_step = cx_engine.make_cx_train_step(model, optimizer,
                                              use_q_cache=True,
                                              use_v_cache=True,
                                              use_z_cache=use_z)
    q_table = cx_engine.precompute_q_emb(model, state.params,
                                         arrays.question_wids,
                                         batch_size=2048)
    v_table = cx_engine.precompute_v_proj(model, state.params, features)
    z_table = None
    if use_z:  # mirrors bench.py: z subsumes v in the step
        z_table = cx_engine.precompute_z_emb(model, state.params, features,
                                             arrays.image_idxs, q_table,
                                             v_table=v_table)
        z_table = cx_engine.as_row_major(z_table.astype(jnp.bfloat16))
        v_table = None
    features = features.astype(jnp.bfloat16)
    q_table = q_table.astype(jnp.bfloat16)
    if v_table is not None:
        v_table = v_table.astype(jnp.bfloat16)
    batch = vqacx.gather_batch(arrays, np.arange(args.batch))
    nv = jnp.asarray(float(args.batch), jnp.float32)

    state, _ = train_step(state, features, batch, nv, q_table, v_table,
                          z_table)
    hard_sync(state.params)

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            state, m = train_step(state, features, batch, nv, q_table,
                                  v_table, z_table)
        hard_sync(state.params)

    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "parse_xplane.py"),
                    args.trace_dir, "--top", str(args.top)], check=False)


if __name__ == "__main__":
    main()
