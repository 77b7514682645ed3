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
    ap.add_argument("--end_to_end", action="store_true",
                    help="measure the full extract pipeline — native JPEG "
                         "decode (native/image_decoder.cpp) double-buffered "
                         "against the device forward — instead of "
                         "device-only throughput.  Writes synthetic "
                         "COCO-sized JPEGs to a temp dir first; the "
                         "steady-state rate is min(decode, device) and "
                         "decode scales with host cores (GIL-free)")
    ap.add_argument("--arch", type=str, default="fbresnet152")
    ap.add_argument("--windows", type=int, default=3,
                    help="independent measured windows (device-only AND "
                         "end-to-end modes); the reported value is the "
                         "median (the tunneled chip has degraded windows — "
                         "same defense as bench.py)")
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

    model = convnets.factory({"arch": args.arch})
    params = convnets.init_resnet(model, image_size=args.size)

    # params as an argument: closed-over params become compile-time
    # constants and bloat persistent-cache entries with the full weights
    @jax.jit
    def forward(params, batch):
        att = model.apply({"params": params}, batch)       # (B, 14, 14, 2048)
        noatt = att.mean(axis=(1, 2))                      # true mean, extract.py:123-124
        return att, noatt

    if args.end_to_end:
        import io
        import tempfile
        from concurrent.futures import ThreadPoolExecutor

        from PIL import Image

        from vqa_counterexamples_tpu.data.native_decoder import \
            NativeImageDecoder
        from vqa_counterexamples_tpu.models.convnets import \
            normalize_images_device

        decoder = NativeImageDecoder()
        if not decoder.available:
            print(json.dumps({"metric":
                              "resnet_extract_end_to_end_images_per_sec",
                              "error": "native decoder unavailable "
                                       "(no g++/libjpeg on this host)"}))
            return

        rng = np.random.default_rng(0)
        n_images = args.batch * (args.steps + 1)
        tmpdir = tempfile.mkdtemp(prefix="bench_extract_")
        paths = []
        base = []
        for i in range(16):  # 16 distinct COCO-sized JPEGs, cycled
            x = (np.linspace(0, 255, 640)[None, :]
                 + rng.normal(0, 25, (480, 640))).clip(0, 255)
            img = np.stack([x, np.roll(x, 9, 1), 255 - x],
                           -1).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG", quality=90)
            base.append(buf.getvalue())
        for i in range(n_images):
            p = os.path.join(tmpdir, "img_%05d.jpg" % i)
            with open(p, "wb") as f:
                f.write(base[i % 16])
            paths.append(p)

        @jax.jit
        def forward_u8(params, batch_u8):
            x = normalize_images_device(batch_u8)
            att = model.apply({"params": params}, x)
            return att, att.mean(axis=(1, 2))

        def decode(start):
            out, ok = decoder.decode_files(
                paths[start:start + args.batch], size=args.size)
            assert ok.all()
            return out

        try:
            rates = []
            windows_env = []  # cheap per-window stamp (VERDICT r4 #8): on
            # a 1-core decode-bound host a degraded window (EXTRACT_r04's
            # 24.5 vs 43.5 img/s) is otherwise unattributable between
            # tunnel throttling and decode variance
            try:
                from env_health import collect_cheap
            except Exception:  # noqa: BLE001
                def collect_cheap():
                    return {}
            with ThreadPoolExecutor(max_workers=1) as pool:
                out = forward_u8(params, decode(0))  # compile
                hard_sync(out)
                # multi-window median, same defense as the device-only mode
                # (a single window is exposed to tunnel-contention noise)
                for _ in range(max(args.windows, 1)):
                    future = pool.submit(decode, 0)
                    t0 = time.time()
                    for step in range(args.steps):
                        batch_u8 = future.result()
                        future = pool.submit(
                            decode, ((step + 1) % args.steps) * args.batch)
                        out = forward_u8(params, batch_u8)
                    hard_sync(out)
                    rates.append(args.batch * args.steps
                                 / (time.time() - t0))
                    future.result()
                    windows_env.append(collect_cheap())
        finally:
            import shutil

            shutil.rmtree(tmpdir, ignore_errors=True)
        print(json.dumps({
            "metric": "resnet_extract_end_to_end_images_per_sec",
            "value": round(float(np.median(rates)), 1),
            "unit": "images/sec (decode+device)",
            "windows": [round(r, 1) for r in rates],
            "windows_env": windows_env,
            "spread": {"min": round(min(rates), 1),
                       "max": round(max(rates), 1),
                       "rel": round((max(rates) - min(rates))
                                    / float(np.median(rates)), 4)},
            "batch_size": args.batch,
            "image_size": args.size,
            "arch": args.arch,
            "host_cores": os.cpu_count(),
            "device": jax.devices()[0].device_kind,
        }))
        return

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.standard_normal((args.batch, args.size, args.size, 3),
                            dtype=np.float32))
    t0 = time.time()
    out = forward(params, batch)
    hard_sync(out)
    compile_s = time.time() - t0

    rates = []
    windows_env = []  # cheap per-window stamp (VERDICT r4 #8)
    try:
        from env_health import collect_cheap
    except Exception:  # noqa: BLE001
        def collect_cheap():
            return {}
    for _ in range(max(args.windows, 1)):
        t0 = time.time()
        for _ in range(args.steps):
            out = forward(params, batch)
        hard_sync(out)
        rates.append(args.batch * args.steps / (time.time() - t0))
        windows_env.append(collect_cheap())
    ips = float(np.median(rates))  # true median (averages the middle pair
    # for even window counts), consistent with bench.py

    # FLOPs from the compiled executable's own cost analysis, so the MFU
    # denominator tracks the real program (ResNet-152 at 448x448 is ~4x the
    # canonical 224 number)
    try:
        cost = forward.lower(params, batch).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        gflop_per_img = cost.get("flops", 0.0) / args.batch / 1e9
    except Exception:
        gflop_per_img = 0.0
    # per-device bf16 peak FLOP/s (same table as bench.py); unknown device
    # kinds report mfu=null rather than a silently wrong number
    peak_flops = {"TPU v5 lite": 197e12, "TPU v5e": 197e12,
                  "TPU v4": 275e12, "TPU v6 lite": 918e12,
                  }.get(jax.devices()[0].device_kind)
    mfu = (ips * gflop_per_img * 1e9 / peak_flops
           ) if (gflop_per_img and peak_flops) else None

    # window-health stanza (VERDICT r3 #8)
    try:
        from env_health import collect as collect_env_health

        env_health = collect_env_health()
    except Exception as exc:  # noqa: BLE001
        env_health = {"error": str(exc)}
    print(json.dumps({
        "metric": "resnet152_extract_images_per_sec",
        "env_health": env_health,
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "windows": [round(r, 1) for r in rates],
        "windows_env": windows_env,
        "spread": {"min": round(min(rates), 1), "max": round(max(rates), 1),
                   "rel": round((max(rates) - min(rates)) / ips, 4)},
        "batch_size": args.batch,
        "image_size": args.size,
        "gflop_per_image": round(gflop_per_img, 1),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
