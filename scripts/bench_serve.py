"""Serving-path latency/throughput for the demo engine (one chip).

Exercises the exact path an HTTP request takes through
``serve.demo_server.DemoEngine`` — base64 JPEG decode + tokenize + the ONE
jitted CNN+VQA device call + top-5/attention post-processing — with a
synthetic MutanNoAtt (reference dims) and fbresnet152 trunk.  The per-item
result arrays are host readbacks, so every timing is hard-synced by
construction.

Usage: python scripts/bench_serve.py [--requests 20] [--arch MutanNoAtt]
Prints one JSON line.
"""

import argparse
import base64
import io
import json
import os
import sys
import time


def _note(msg):
    print("[bench_serve] %s" % msg, file=sys.stderr, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--arch", type=str, default="MutanNoAtt")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    from PIL import Image

    from vqa_counterexamples_tpu.data import synthetic
    from vqa_counterexamples_tpu.models import convnets, factory
    from vqa_counterexamples_tpu.serve.demo_server import DemoEngine

    n_answers = 2000
    opt = synthetic.tiny_vqa_options(dim_v=2048, nans=n_answers, dim_q=2400)
    opt["arch"] = args.arch
    opt["seq2vec"] = {"arch": "skipthoughts", "type": "BayesianUniSkip",
                      "dropout": 0.25, "fixed_emb": False}
    opt["fusion"].update(dim_hv=360, dim_hq=360, dim_mm=360, R=10)
    vocab_words = tuple("w%d" % i for i in range(2000))
    vocab_answers = tuple("a%d" % i for i in range(n_answers))
    options = {"vqa": {"maxlength": 26, "pad": "right"},
               "coco": {"arch": "fbresnet152", "size": 448},
               "model": opt}

    _note("building model")
    model = factory.factory_vqa(opt, vocab_words, vocab_answers)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    from vqa_counterexamples_tpu.core import policy

    with policy.host_init_scope():  # eager CPU init: the jitted init of
        # the once-executed program costs minutes of remote compile here
        key = jax.random.key(0)
        kp, kd = jax.random.split(key)
        vqa_params = model.init(
            {"params": kp, "dropout": kd},
            jnp.zeros((1, 2048), jnp.float32),
            jnp.zeros((1, 26), jnp.int32), deterministic=True)["params"]
    vqa_params = policy.device_put_contiguous(vqa_params)
    _note("vqa params ready")
    cnn = convnets.factory({"arch": "fbresnet152", "pooling": False})
    cnn_params = convnets.init_resnet(cnn, image_size=448)

    _note("cnn params ready")
    engine = DemoEngine(options, vqa_params, cnn_params, vocab_words,
                        vocab_answers, attention=False)

    # synthetic request: a real JPEG through the real decode path
    img = Image.fromarray(
        rng.integers(0, 255, (480, 640, 3), dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    question = "what color is the w7 next to the w12 ?"

    # compile EVERY power-of-two bucket up front, concurrently: each bucket
    # is a distinct program, and serial cold compiles through the remote
    # compile service cost ~10 min each
    _note("prewarming all buckets (concurrent compiles)")
    engine.prewarm()
    _note("prewarm done; warming decode path")
    engine.answer(b64, question)  # decode+tokenize path warm (bucket hot)
    t0 = time.time()
    for _ in range(args.requests):
        engine.answer(b64, question)
    lat_ms = (time.time() - t0) / args.requests * 1000

    out = {}
    for bs in (8, 32):
        items = [{"visual": b64, "question": question}] * bs
        _note("warming bucket %d" % bs)
        engine.answer_batch(items)  # warm the bucket
        t0 = time.time()
        for _ in range(5):
            engine.answer_batch(items)
        dt = (time.time() - t0) / 5
        out["batch%d_items_per_sec" % bs] = round(bs / dt, 1)

    # Concurrent load across the three serving policies (VERDICT r4 #3):
    # N client threads each issuing M sequential requests, per-request
    # latency recorded.  direct = each thread calls engine.answer,
    # requests serialize on the device one-by-one (the reference's
    # single-threaded WSGI behavior, demo_server.py:169-171); adaptive =
    # the DEFAULT MicroBatcher (immediate dispatch when idle, coalesce
    # only in-flight-queued arrivals); window = the legacy fixed 4 ms
    # hold SERVE_r04 measured slower than direct at 16 clients.
    import threading

    from vqa_counterexamples_tpu.serve.demo_server import MicroBatcher

    adaptive = MicroBatcher(engine)
    window = MicroBatcher(engine, max_wait_ms=4.0, adaptive=False)
    n_clients = int(os.environ.get("VQACX_SERVE_CLIENTS", "16"))
    m_requests = int(os.environ.get("VQACX_SERVE_REQUESTS", "8"))

    def run_load(call):
        lats = [[] for _ in range(n_clients)]

        def client(slot):
            for _ in range(m_requests):
                t0 = time.time()
                call()
                lats[slot].append((time.time() - t0) * 1000)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        flat = np.sort(np.concatenate(lats))
        return {"p50_ms": round(float(np.percentile(flat, 50)), 1),
                "p99_ms": round(float(np.percentile(flat, 99)), 1),
                "items_per_sec": round(n_clients * m_requests / wall, 1)}

    req = {"visual": b64, "question": question}
    # every bucket the coalescer can land on is already hot (engine.prewarm
    # covers all power-of-two buckets up to MAX_BATCH, including the padded
    # bucket above a non-power-of-two client count) — a cold bucket compile
    # inside the measured window would bias the batched arm vs the
    # fully-warm direct arm
    _note("warming batcher plumbing")
    adaptive.submit(req)  # warm the batcher plumbing itself
    window.submit(req)
    # lone-client latency through each policy: the adaptive batcher must
    # add ~zero latency vs direct when the server is idle (the window
    # batcher pays its hold on every request)
    for tag, call in (("direct", lambda: engine.answer(b64, question)),
                      ("adaptive", lambda: adaptive.submit(req)),
                      ("window", lambda: window.submit(req))):
        t0 = time.time()
        for _ in range(args.requests):
            call()
        out["lone_%s_ms" % tag] = round(
            (time.time() - t0) / args.requests * 1000, 1)
    _note("running concurrent load")
    for tag, call in (("direct", lambda: engine.answer(b64, question)),
                      ("adaptive", lambda: adaptive.submit(req)),
                      ("batched", lambda: window.submit(req))):
        for k, v in run_load(call).items():
            out["concurrent_%s_%s" % (tag, k)] = v
    out["n_clients"] = n_clients
    out["m_requests"] = m_requests

    # window-health stanza (VERDICT r3 #8)
    try:
        from env_health import collect as collect_env_health

        env_health = collect_env_health()
    except Exception as exc:  # noqa: BLE001
        env_health = {"error": str(exc)}
    print(json.dumps({
        "metric": "demo_serve_latency_ms",
        "value": round(lat_ms, 2),
        "unit": "ms/request",
        "arch": args.arch,
        **out,
        "env_health": env_health,
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
