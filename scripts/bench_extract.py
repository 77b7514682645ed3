"""ResNet-152 feature-extraction throughput (images/sec on one chip).

The second headline metric in BASELINE.json ("ResNet-152 images/sec").
Runs the same jitted forward the extract CLI uses (att map + noatt true-mean,
cli/extract.py:94-98) on synthetic 448x448 batches — measuring pure device
throughput with inputs resident (the CLI's decode pipeline double-buffers, so
at steady state the device is the bottleneck, reference extract.py:119-131).

Usage: python scripts/bench_extract.py [--batch 80] [--steps 20]
Prints one JSON line: {"metric": "resnet152_extract_images_per_sec", ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=448)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from vqa_counterexamples_tpu.core.profiler import hard_sync
    from vqa_counterexamples_tpu.models import convnets

    model = convnets.factory({"arch": "fbresnet152"})
    params = convnets.init_resnet(model, image_size=args.size)

    # params as an argument: closed-over params become compile-time
    # constants and bloat persistent-cache entries with the full weights
    @jax.jit
    def forward(params, batch):
        att = model.apply({"params": params}, batch)       # (B, 14, 14, 2048)
        noatt = att.mean(axis=(1, 2))                      # true mean, extract.py:123-124
        return att, noatt

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.standard_normal((args.batch, args.size, args.size, 3),
                            dtype=np.float32))
    t0 = time.time()
    out = forward(params, batch)
    hard_sync(out)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(args.steps):
        out = forward(params, batch)
    hard_sync(out)
    dt = time.time() - t0
    ips = args.batch * args.steps / dt

    print(json.dumps({
        "metric": "resnet152_extract_images_per_sec",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "batch_size": args.batch,
        "image_size": args.size,
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
