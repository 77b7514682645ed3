"""VQA-pretraining train-step throughput (MutanNoAtt, reference dims).

The upstream stage of the pipeline (reference train.py): the skip-thoughts
GRU encoder is trainable here, so the CX engine's frozen-backbone caches do
not apply — this measures the recurrence-bound step the roadmap targets.

Usage: python scripts/bench_vqa.py [--batch 512] [--steps 30] [--arch MutanNoAtt]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--arch", type=str, default="MutanNoAtt")
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
        # reference configs/vqa2/mutan_att_train.yaml dims
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
    vocab_words = ["w%d" % i for i in range(12000)]  # real question vocab size
    vocab_answers = ["a%d" % i for i in range(n_answers)]
    model = factory.factory_vqa(opt, vocab_words, vocab_answers)

    rng = np.random.default_rng(0)
    # att models consume the (B, 14, 14, 2048) spatial feature map
    visual_shape = ((args.batch, 14, 14, 2048) if is_att
                    else (args.batch, 2048))
    # under the bf16 policy the visual features ride HBM in bf16 (they come
    # out of a bf16 ResNet trunk; extract --feat-dtype bfloat16 stores them
    # that way) — halves the feature-read bandwidth of the dropout fusion
    # and the attention weighted sum, which re-reads the raw (B,196,2048) map
    from vqa_counterexamples_tpu.core.policy import compute_dtype
    batch = {
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

    t0 = time.time()
    state, m = train_step(state, batch)
    hard_sync(state.params)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(args.steps):
        state, m = train_step(state, batch)
    hard_sync(state.params)
    dt = time.time() - t0

    print(json.dumps({
        "metric": "vqa_train_examples_per_sec_per_chip",
        "value": round(args.batch * args.steps / dt, 1),
        "unit": "examples/sec/chip",
        "arch": args.arch,
        "batch_size": args.batch,
        "compute_dtype": os.environ.get("VQACX_COMPUTE_DTYPE", "float32"),
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
