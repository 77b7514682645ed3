"""Headline benchmark: CX training throughput (examples/sec/chip).

Runs the flagship workload — NeuralCX (dim_h=300, n_layers=2) over a
full-size MutanNoAtt backbone (dim_v=2048, dim_q=2400, R=10, 24 candidates) —
as end-to-end jitted training steps on synthetic data with reference
hyperparameters (Adam 1e-4, drop 0.25, BayesianUniSkip encoder) at B=256
(measured: B=64 ~15k examples/sec on one v5e chip, B=256 ~27k, B=512 ~29k;
B=256 is the default because the B=512 program's multi-minute cold compile
intermittently trips the remote compile service — override with
VQACX_BENCH_BATCH).

Baseline: the reference publishes no throughput numbers (BASELINE.md).  The
reference per-step work includes a host-side numpy gather of B x 25 feature
rows, a ~13 MB H2D copy, a Python loop over 24 candidates and a 10-iteration
MUTAN loop (counterexamples.py:519-547, cx.py:289-331, fusion.py:100-116);
we charge it a generous 1,500 examples/sec on its CUDA hardware, so
``vs_baseline`` is measured-throughput / 1500.  The driver-set target is
>= 10x (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

REFERENCE_BASELINE_EXAMPLES_PER_SEC = 1500.0
BATCH_SIZE = int(os.environ.get("VQACX_BENCH_BATCH", "256"))
N_WARMUP = 3
N_STEPS = 50


def main():
    import jax

    # persistent compilation cache: the skip-thoughts train step takes
    # minutes to compile cold; a pre-warmed cache makes fresh runs fast
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import optax

    from vqa_counterexamples_tpu.data import synthetic, vqacx
    from vqa_counterexamples_tpu.engines import cx_engine
    from vqa_counterexamples_tpu.models import factory

    dataset, store = synthetic.make_synthetic_cx(
        n_examples=2048, n_images=1024, dim_v=2048, knn_size=24,
        n_answers=2000, seed=0)
    opt = synthetic.tiny_vqa_options(dim_v=2048, nans=2000, dim_q=2400)
    # the reference's encoder: BayesianUniSkip skip-thoughts GRU (2400-d)
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
        model, optimizer, vqacx.gather_batch(arrays, np.arange(BATCH_SIZE)),
        features)
    train_step = cx_engine.make_cx_train_step(model, optimizer)

    rng = np.random.default_rng(0)
    batches = []
    for idx, n_valid in vqacx.batch_indices(arrays.size, BATCH_SIZE,
                                            shuffle=True, rng=rng,
                                            drop_remainder=True):
        batches.append(vqacx.gather_batch(arrays, idx))
    nv = jnp.asarray(float(BATCH_SIZE), jnp.float32)

    for i in range(N_WARMUP):
        state, m = train_step(state, features, batches[i % len(batches)], nv)
    jax.block_until_ready(state.params)

    t0 = time.time()
    for i in range(N_STEPS):
        state, m = train_step(state, features, batches[i % len(batches)], nv)
    jax.block_until_ready(state.params)
    dt = time.time() - t0

    value = BATCH_SIZE * N_STEPS / dt
    n_chips = jax.device_count()
    value_per_chip = value / max(n_chips, 1)
    print(json.dumps({
        "metric": "cx_train_examples_per_sec_per_chip",
        "value": round(value_per_chip, 1),
        "unit": "examples/sec/chip",
        "vs_baseline": round(
            value_per_chip / REFERENCE_BASELINE_EXAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    # The tunneled TPU occasionally throws transient UNAVAILABLE device
    # errors right after reconnecting, and a poisoned backend can't retry
    # in-process — re-exec in a fresh interpreter up to 3 times so a single
    # flake doesn't lose the round's number.
    import subprocess
    import sys

    if os.environ.get("VQACX_BENCH_INNER") == "1":
        main()
    else:
        import shutil

        rc = 1
        delays = [180, 600]  # a wedged chip takes tens of minutes to recover
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        for attempt in range(3):
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "VQACX_BENCH_INNER": "1"}).returncode
            if rc == 0:
                break
            cleared = ""
            if attempt == 1:
                # last resort before the final attempt: a process killed
                # mid-compile can leave a corrupt persistent cache entry that
                # fails every run identically — recompile from scratch.
                # (Do NOT clear on the first failure: transient device
                # errors are more common and the warm cache is valuable.)
                shutil.rmtree(cache_dir, ignore_errors=True)
                cleared = " (cleared compile cache)"
            if attempt < len(delays):
                print("bench attempt %d failed (rc=%d)%s; retrying in %ds"
                      % (attempt + 1, rc, cleared, delays[attempt]),
                      file=sys.stderr, flush=True)
                time.sleep(delays[attempt])
        sys.exit(rc)
