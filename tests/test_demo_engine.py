"""Demo-server question encoding (tokenize -> wids, pad side, UNK)."""

import numpy as np

from vqa_counterexamples_tpu.serve.demo_server import DemoEngine


def _engine(pad):
    eng = DemoEngine.__new__(DemoEngine)  # skip jit setup; test encoding only
    eng.word_to_wid = {"what": 1, "color": 2, "is": 3, "the": 4, "cat": 5,
                       "UNK": 6}
    eng.maxlength = 8
    eng.pad = pad
    from vqa_counterexamples_tpu.data.tokenizers import tokenize_mcb
    eng.tokenize = tokenize_mcb
    return eng


def test_encode_right_pad_and_unk():
    wids = _engine("right").encode_question("What color is the zebra?")
    np.testing.assert_array_equal(wids, [1, 2, 3, 4, 6, 0, 0, 0])


def test_encode_left_pad():
    wids = _engine("left").encode_question("the cat")
    np.testing.assert_array_equal(wids, [0, 0, 0, 0, 0, 0, 4, 5])


def test_encode_clips_to_maxlength():
    eng = _engine("right")
    wids = eng.encode_question("what " * 20)
    assert wids.shape == (8,)
    assert (wids == 1).all()


# ---- batch endpoint + checkpoint registry (serve/demo_server.py) ----

def test_next_bucket_powers_of_two():
    from vqa_counterexamples_tpu.serve.demo_server import _next_bucket
    assert [_next_bucket(n) for n in (1, 2, 3, 4, 5, 8, 9, 31, 32)] == \
        [1, 2, 4, 4, 8, 8, 16, 32, 32]


def test_list_checkpoints_registry(tmp_path):
    from vqa_counterexamples_tpu.serve.demo_server import list_checkpoints
    import json as json_lib

    run_a = tmp_path / "run_a"          # best triplet (prefix scheme)
    run_a.mkdir()
    (run_a / "best_model.msgpack").write_bytes(b"")
    (run_a / "best_info.json").write_text(json_lib.dumps({"epoch": 7}))
    run_b = tmp_path / "run_b"          # ckpt-only triplet
    run_b.mkdir()
    (run_b / "ckpt_model.msgpack").write_bytes(b"")
    (tmp_path / "empty_dir").mkdir()    # no checkpoint: skipped
    (tmp_path / "stray.txt").write_text("x")

    got = list_checkpoints(str(tmp_path))
    assert [c["name"] for c in got] == ["run_a", "run_b"]
    assert got[0]["best"] and got[0]["epoch"] == 7
    assert got[0]["path"].endswith("run_a/best")
    assert not got[1]["best"] and got[1]["path"].endswith("run_b")
    assert list_checkpoints(str(tmp_path / "missing")) == []


def test_resume_best_prefix_roundtrip(tmp_path):
    """--resume best passes <dir>/best: must load the best_* triplet saved
    NEXT TO ckpt_* (reference prefix scheme, train.py:344-364)."""
    import jax.numpy as jnp
    import numpy as np
    from vqa_counterexamples_tpu.core import checkpoint as ckpt_lib

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    opt_state = {"m": jnp.ones((2, 3))}
    ckpt_lib.save_vqa_checkpoint({"epoch": 3, "best_acc1": 0.5}, params,
                                 opt_state, str(tmp_path), is_best=True)
    info, model, optim = ckpt_lib.load_vqa_checkpoint(
        params, opt_state, str(tmp_path / "best"))
    assert info["epoch"] == 3
    np.testing.assert_allclose(np.asarray(model["w"]),
                               np.asarray(params["w"]))
    np.testing.assert_allclose(np.asarray(optim["m"]), 1.0)


def _tiny_serving_engine():
    import jax
    import jax.numpy as jnp
    from vqa_counterexamples_tpu.data import synthetic
    from vqa_counterexamples_tpu.models import convnets, factory
    from vqa_counterexamples_tpu.serve.demo_server import DemoEngine

    vocab_words, vocab_answers = synthetic.synthetic_vocab(30, 6)
    model_opt = synthetic.tiny_vqa_options(dim_v=2048, nans=6)
    options = {"vqa": {"maxlength": 8, "pad": "right", "nans": 6},
               "coco": {"arch": "resnet50", "size": 64},
               "model": model_opt}
    cnn = convnets.factory({"arch": "resnet50", "pooling": False})
    cnn_params = convnets.init_resnet(cnn, 64)
    model = factory.factory_vqa(model_opt, tuple(vocab_words),
                                tuple(vocab_answers))
    vqa_params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 2048)), jnp.zeros((1, 8), jnp.int32),
        deterministic=True)["params"]
    engine = DemoEngine(options, vqa_params, cnn_params, vocab_words,
                        vocab_answers, attention=False)
    return engine, model, vqa_params


def _jpeg_b64(seed):
    import base64
    import io
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


def test_answer_batch_one_device_call_matches_single(tmp_path):
    import numpy as np
    engine, model, vqa_params = _tiny_serving_engine()
    items = [{"visual": _jpeg_b64(i), "question": "what color is the w%d" % i}
             for i in range(3)]
    results = engine.answer_batch(items)     # bucket 4: padded tail sliced off
    assert len(results) == 3
    for r in results:
        assert len(r["ans"]) == 5 and len(r["val"]) == 5
        assert all(0.0 <= v <= 1.0 for v in r["val"])
    single = engine.answer(items[1]["visual"], items[1]["question"])
    assert single["ans"] == results[1]["ans"]
    # bf16 CNN trunk: batch-1 vs batch-4 fusion orders differ in the last bits
    np.testing.assert_allclose(single["val"], results[1]["val"], atol=1e-3)

    # checkpoint hot-swap changes the served weights (and the output)
    from vqa_counterexamples_tpu.core import checkpoint as ckpt_lib
    import jax
    other = jax.tree_util.tree_map(lambda x: x + 0.5, vqa_params)
    ckpt_lib.save_vqa_checkpoint({"epoch": 1, "best_acc1": 0.0}, other,
                                 {"dummy": np.zeros(1)}, str(tmp_path),
                                 is_best=True)
    engine.load_checkpoint(str(tmp_path / "best"))
    swapped = engine.answer(items[1]["visual"], items[1]["question"])
    assert swapped["val"] != single["val"]


def test_microbatcher_coalesces_concurrent_requests():
    """N concurrent submits -> ONE bucketed device call, results identical
    to the direct per-item path (serve/demo_server.MicroBatcher)."""
    import threading

    from vqa_counterexamples_tpu.serve.demo_server import MicroBatcher

    engine, _, _ = _tiny_serving_engine()
    calls = []
    real_predict = engine.predict_prepared_async

    def counting_predict(images, wids):
        calls.append(images.shape[0])
        return real_predict(images, wids)

    engine.predict_prepared_async = counting_predict

    # autostart=False: enqueue all requests BEFORE the batch loop starts,
    # and a single dispatcher, so the coalescing assertion is
    # deterministic on any machine (the default 4 dispatchers would race
    # over the pre-filled queue and split the batch arbitrarily)
    batcher = MicroBatcher(engine, max_wait_ms=50.0, autostart=False,
                           n_dispatchers=1)
    items = [{"visual": _jpeg_b64(i), "question": "what color is the w%d" % i}
             for i in range(5)]
    results: list = [None] * len(items)
    errors: list = []

    def worker(j):
        try:
            results[j] = batcher.submit(items[j])
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(j,))
               for j in range(len(items))]
    for t in threads:
        t.start()
    # wait until every request thread has prepared + enqueued
    import time
    deadline = time.time() + 30
    while batcher.pending() < len(items) and time.time() < deadline:
        time.sleep(0.01)
    assert batcher.pending() == len(items)
    batcher.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    assert calls == [5], calls  # one coalesced device call (bucket 8)

    direct = engine.answer_batch(items)
    for got, want in zip(results, direct):
        assert got["ans"] == want["ans"]
        np.testing.assert_allclose(got["val"], want["val"], atol=1e-3)


def test_microbatcher_adaptive_lone_request_skips_the_window():
    """Adaptive policy (the default): a lone submit dispatches immediately
    instead of waiting out ``max_wait_ms`` — even a pathological 30 s window
    adds no latency when nothing else is queued (SERVE_r04 measured the
    fixed window slower than direct dispatch; the adaptive default closes
    that inversion)."""
    import time

    from vqa_counterexamples_tpu.serve.demo_server import MicroBatcher

    engine, _, _ = _tiny_serving_engine()
    item = {"visual": _jpeg_b64(0), "question": "what color is the w3"}
    engine.answer(item["visual"], item["question"])  # warm the jit bucket

    calls = []
    real_predict = engine.predict_prepared_async

    def counting_predict(images, wids):
        calls.append(images.shape[0])
        return real_predict(images, wids)

    engine.predict_prepared_async = counting_predict
    batcher = MicroBatcher(engine, max_wait_ms=30_000.0)
    assert batcher.adaptive
    t0 = time.time()
    out = batcher.submit(item)
    elapsed = time.time() - t0
    assert elapsed < 15.0, "lone request waited %.1fs — window not skipped" \
        % elapsed
    assert calls == [1]
    assert len(out["ans"]) == 5


def test_microbatcher_propagates_errors_to_all_waiters():
    import threading

    from vqa_counterexamples_tpu.serve.demo_server import MicroBatcher

    engine, _, _ = _tiny_serving_engine()

    def boom(images, wids):
        raise RuntimeError("device on fire")

    engine.predict_prepared_async = boom
    batcher = MicroBatcher(engine, max_wait_ms=20.0, autostart=False)
    item = {"visual": _jpeg_b64(0), "question": "what"}
    caught = []

    def worker():
        try:
            batcher.submit(item)
        except RuntimeError as exc:
            caught.append(str(exc))

    threads = [threading.Thread(target=worker) for _ in range(2)]
    for t in threads:
        t.start()
    import time
    deadline = time.time() + 30
    while batcher.pending() < 2 and time.time() < deadline:
        time.sleep(0.01)
    batcher.start()
    for t in threads:
        t.join(timeout=60)
    assert caught == ["device on fire"] * 2


def test_uint8_device_normalize_matches_host_preprocess():
    # the serving/extract split transform (host Scale+CenterCrop uint8 +
    # device ToTensor+Normalize) must reproduce the reference one-shot
    # host transform exactly
    import jax.numpy as jnp
    from PIL import Image

    from vqa_counterexamples_tpu.models.convnets import (
        normalize_images_device, preprocess_image, preprocess_image_uint8)

    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 255, (500, 400, 3),
                                       dtype=np.uint8), "RGB")
    ref = preprocess_image(img, size=64)
    u8 = preprocess_image_uint8(img, size=64)
    dev = np.asarray(normalize_images_device(jnp.asarray(u8)))
    np.testing.assert_allclose(dev, ref, atol=1e-6)


def test_prewarm_compiles_all_buckets():
    """prewarm() warms every power-of-two bucket (concurrently), so no
    later request pays a cold bucket compile (serve/demo_server.prewarm)."""
    engine, _, _ = _tiny_serving_engine()
    calls = []
    real_predict = engine.predict_prepared

    def counting_predict(images, wids):
        calls.append(images.shape[0])
        return real_predict(images, wids)

    engine.predict_prepared = counting_predict
    warmed = engine.prewarm(max_bucket=8)
    assert warmed == [1, 2, 4, 8]
    assert sorted(calls) == [1, 2, 4, 8]
    # serial path covers the same buckets
    calls.clear()
    engine.prewarm(max_bucket=4, concurrent=False)
    assert sorted(calls) == [1, 2, 4]
