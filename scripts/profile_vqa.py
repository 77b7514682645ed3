"""Kernel-level trace of the VQA-pretraining train step.

Runs a few steps of scripts/bench_vqa.py's exact workload under
``jax.profiler.trace`` and prints the per-op device-time report via
scripts/parse_xplane.py — the recurrence-bound step the roadmap targets.

Usage: python scripts/profile_vqa.py [--batch 512] [--arch MutanNoAtt]
       [--trace-dir /tmp/vqa_trace]
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--arch", type=str, default="MutanNoAtt")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--trace-dir", type=str, default="/tmp/vqa_trace")
    ap.add_argument("--top", type=int, default=25)
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
    from vqa_counterexamples_tpu.data import synthetic
    from vqa_counterexamples_tpu.engines import vqa_engine
    from vqa_counterexamples_tpu.models import factory

    n_answers = 2000
    opt = synthetic.tiny_vqa_options(dim_v=2048, nans=n_answers, dim_q=2400)
    opt["arch"] = args.arch
    opt["seq2vec"] = {"arch": "skipthoughts", "type": "BayesianUniSkip",
                      "dropout": 0.25, "fixed_emb": False}
    is_att = args.arch.endswith("Att") and not args.arch.endswith("NoAtt")
    if is_att:
        # reference configs/vqa2/mutan_att_train.yaml dims (see bench_vqa.py)
        opt["dim_v"], opt["dim_q"] = 2048, 2400
        opt["attention"] = dict(
            nb_glimpses=2, dim_hv=310, dim_hq=310, dim_mm=510, R=5,
            dropout_v=0.5, dropout_q=0.5, dropout_mm=0.5,
            activation_v="tanh", activation_q="tanh",
            dropout_hv=0, dropout_hq=0, dim_h=310)
        opt["fusion"] = dict(
            dim_v=2048 * 2, dim_q=2400, dim_hv=620, dim_hq=310, dim_mm=510,
            R=5, dropout_v=0.5, dropout_q=0.5, activation_v="tanh",
            activation_q="tanh", dropout_hv=0, dropout_hq=0)
    else:
        opt["fusion"].update(dim_hv=360, dim_hq=360, dim_mm=360, R=10)
    vocab_words = ["w%d" % i for i in range(12000)]
    vocab_answers = ["a%d" % i for i in range(n_answers)]
    model = factory.factory_vqa(opt, vocab_words, vocab_answers)

    rng = np.random.default_rng(0)
    visual_shape = ((args.batch, 14, 14, 2048) if is_att
                    else (args.batch, 2048))
    from vqa_counterexamples_tpu.core.policy import compute_dtype
    batch = {
        # same dtype as bench_vqa.py: bf16-resident features under the policy
        "visual": jnp.asarray(rng.standard_normal(
            visual_shape, dtype=np.float32), dtype=compute_dtype()),
        "question": jnp.asarray(rng.integers(
            1, len(vocab_words), (args.batch, 26), dtype=np.int64)
            .astype(np.int32)),
        "answer": jnp.asarray(rng.integers(
            0, n_answers, (args.batch,), dtype=np.int64).astype(np.int32)),
    }
    optimizer = optax.adam(1e-4)
    state = vqa_engine.init_vqa_state(model, optimizer, batch)
    train_step = vqa_engine.make_vqa_train_step(model, optimizer)

    state, _ = train_step(state, batch)  # compile outside the trace
    hard_sync(state.params)

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            state, m = train_step(state, batch)
        hard_sync(state.params)

    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "parse_xplane.py"),
                    args.trace_dir, "--top", str(args.top)], check=False)


if __name__ == "__main__":
    main()
