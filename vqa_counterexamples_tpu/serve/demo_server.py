"""VQA demo HTTP server (reference ``demo_server.py``).

POST ``/`` with JSON ``{"visual": <base64 jpeg>, "question": "..."}`` returns
``{"ans": [top-5 answers], "val": [probs], "att": [b64 PNG glimpse maps]}``
with CORS headers — the same contract as the reference (demo_server.py:44-125)
so the bundled web client (serve/demo_web) works unchanged.

Beyond the reference contract the server adds TPU-friendly serving surface:

* ``POST /batch`` — ``{"items": [{"visual", "question"}, ...]}`` runs every
  item in ONE device call (images stacked, padded to a power-of-two bucket so
  at most log2(max_batch) programs ever compile) and returns
  ``{"results": [...]}`` in order.
* ``GET /checkpoints`` + ``POST /checkpoint {"name": ...}`` — list / hot-swap
  VQA checkpoints under ``--ckpt_root`` without restarting or recompiling:
  params are a *argument* of the jitted predict function, so a swap is just a
  host->HBM weight copy.

TPU-native serving path: the CNN + VQA forward are one jitted function with
static shapes (448x448 input, 26-token question); per-request work is b64
decode + tokenize + one device call.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

MAX_BATCH = 32


def _next_bucket(n: int, max_batch: int = MAX_BATCH) -> int:
    """Smallest power-of-two >= n (capped): bounds compile count to log2."""
    b = 1
    while b < min(n, max_batch):
        b *= 2
    return b


def list_checkpoints(root: str) -> list[dict]:
    """Scan ``root`` for loadable VQA checkpoints.

    A run directory counts if it holds a ``best_model.msgpack`` or
    ``ckpt_model.msgpack`` triplet (core/checkpoint.py layout; best_* files
    live NEXT TO ckpt_*, the reference's prefix scheme).  Returns
    ``[{"name", "path", "best", "epoch"}]`` sorted by name; ``path`` is a
    ``load_vqa_checkpoint`` prefix (``<run>/best`` for the best triplet).
    """
    out = []
    if not root or not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        run_dir = os.path.join(root, name)
        if not os.path.isdir(run_dir):
            continue
        for fname, info_name, is_best in (
                ("best_model.msgpack", "best_info.json", True),
                ("ckpt_model.msgpack", "ckpt_info.json", False)):
            if os.path.isfile(os.path.join(run_dir, fname)):
                epoch = None
                info_path = os.path.join(run_dir, info_name)
                if os.path.isfile(info_path):
                    try:
                        with open(info_path) as f:
                            epoch = json.load(f).get("epoch")
                    except Exception:  # noqa: BLE001 — listing is best-effort
                        pass
                path = os.path.join(run_dir, "best") if is_best else run_dir
                out.append({"name": name, "path": path, "best": is_best,
                            "epoch": epoch})
                break
    return out


class DemoEngine:
    def __init__(self, options, vqa_params, cnn_params, vocab_words,
                 vocab_answers, attention: bool):
        import jax
        import jax.numpy as jnp

        from ..data.tokenizers import tokenize_mcb
        from ..models import convnets, factory

        self.vocab_answers = list(vocab_answers)
        self.word_to_wid = {w: i + 1 for i, w in enumerate(vocab_words)}
        self.maxlength = options["vqa"].get("maxlength", 26)
        self.pad = options["vqa"].get("pad", "right")
        self.size = options["coco"].get("size", 448)
        self.tokenize = tokenize_mcb
        self.attention = attention
        # params are swappable (POST /checkpoint): they are an argument of the
        # jitted function, so a swap costs one weight upload, zero recompiles
        self.vqa_params = vqa_params
        self._params_template = vqa_params
        self._lock = threading.Lock()

        cnn = convnets.factory({"arch": options["coco"]["arch"],
                                "pooling": False})
        model = factory.factory_vqa(options["model"], tuple(vocab_words),
                                    tuple(vocab_answers))
        # cnn params MUST be an argument too, not a closure constant: closed-
        # over weights are baked into every compiled executable as literals —
        # measured ~490 MB per power-of-two bucket program (6 buckets!), which
        # turns each bucket's first request into a ~500 MB remote compile
        # through the tunnel.  As an argument the weights live once in HBM
        # and every bucket executable is small.  Uncommitted transfer: a
        # committed operand changes jit dispatch keys (see core/policy).
        # layout-normalized upload: a transposed (non-contiguous) leaf
        # from host init / torch port costs a host-mediated relayout on
        # EVERY predict call (measured 2520 -> 11.4 ms/call, core/policy)
        from ..core.policy import device_put_contiguous

        self.cnn_params = device_put_contiguous(cnn_params)
        self.vqa_params = device_put_contiguous(self.vqa_params)
        self._params_template = self.vqa_params

        def predict(vqa_params, cnn_params, images, wids):
            """Batched: images (N,H,W,3) uint8, wids (N,T) i32 -> top-5 + att.

            Images arrive uint8 and normalize on device: 4x less H2D
            traffic per request batch, and the per-pixel float math runs
            on the chip instead of the serving host (measured 14.6 -> ~50
            items/sec at /batch 32 through a tunneled v5e)."""
            images = convnets.normalize_images_device(images)
            att_map = cnn.apply({"params": cnn_params}, images)
            if attention:
                logits, att = model.apply(
                    {"params": vqa_params}, att_map, wids,
                    deterministic=True, return_att=True)
            else:
                visual = jnp.mean(att_map, axis=(1, 2))
                logits = model.apply({"params": vqa_params}, visual,
                                     wids, deterministic=True)
                att = jnp.zeros((wids.shape[0], 0,
                                 att_map.shape[1] * att_map.shape[2]))
            probs = jax.nn.softmax(logits, axis=-1)
            top_vals, top_idx = jax.lax.top_k(probs, 5)
            return top_vals, top_idx, att

        self._predict = jax.jit(predict)

    def set_params(self, vqa_params) -> None:
        from ..core.policy import device_put_contiguous

        vqa_params = device_put_contiguous(vqa_params)
        with self._lock:
            self.vqa_params = vqa_params

    def load_checkpoint(self, path: str) -> None:
        """Hot-swap weights from a ``ckpt_model.msgpack`` prefix dir."""
        from ..core import checkpoint as ckpt_lib

        _, loaded, _ = ckpt_lib.load_vqa_checkpoint(
            self._params_template, None, path)
        if loaded is None:
            raise FileNotFoundError("no loadable checkpoint under %s" % path)
        self.set_params(loaded)

    def encode_question(self, question: str):
        import numpy as np

        words = self.tokenize(question)
        wids = [self.word_to_wid.get(w, self.word_to_wid.get("UNK", 1))
                for w in words][:self.maxlength]
        out = np.zeros((self.maxlength,), dtype=np.int32)
        if self.pad == "right":
            out[:len(wids)] = wids
        else:
            out[self.maxlength - len(wids):] = wids
        return out

    def _decode_image(self, image_b64: str):
        raw = base64.b64decode(image_b64.split(",")[-1])
        return self._decode_raw(raw)

    def _decode_raw(self, raw: bytes):
        # GIL-free libjpeg decode (byte-exact with the PIL path,
        # tests/test_native_decoder.py); PIL handles PNG/exotic spaces
        dec = self._native_decoder()
        if dec is not None:
            out, ok = dec.decode_buffers([raw], size=self.size)
            if bool(ok[0]):
                return out[0]
        return self._pil_decode(raw)

    def _pil_decode(self, raw: bytes):
        from PIL import Image

        from ..models.convnets import preprocess_image_uint8

        img = Image.open(io.BytesIO(raw)).convert("RGB")
        return preprocess_image_uint8(img, size=self.size)

    def _native_decoder(self):
        if not hasattr(self, "_native_dec"):
            from ..data.native_decoder import NativeImageDecoder

            dec = NativeImageDecoder()
            self._native_dec = dec if dec.available else None
        return self._native_dec

    def _att_pngs(self, att) -> list:
        from PIL import Image

        pngs = []
        for g in range(att.shape[0]):
            side = int(round(att.shape[1] ** 0.5))
            att_map = att[g].reshape(side, side)
            att_map = att_map / max(att_map.max(), 1e-8)
            png = Image.fromarray((att_map * 255).astype("uint8"), "L") \
                .resize((112, 112), resample=0)
            buf = io.BytesIO()
            png.save(buf, format="PNG")
            pngs.append(base64.b64encode(buf.getvalue()).decode())
        return pngs

    # -- serving pipeline stages (prepare in the request thread, predict as
    # -- one bucketed device call, format back in the request thread) -------

    def prepare(self, item: dict):
        """Host half of one request: b64 decode + resize + tokenize."""
        return (self._decode_image(item["visual"]),
                self.encode_question(item["question"]))

    def predict_prepared_async(self, images, wids):
        """(n, H, W, 3) uint8 + (n, T) i32 -> (vals, idxs, att) DEVICE
        arrays (lazily sliced back to n), via ONE device call padded to a
        power-of-two bucket.  jax dispatch is asynchronous, so the caller
        returns as soon as the program is enqueued — the MicroBatcher's
        drain loop uses this to coalesce the NEXT batch while this one is
        still executing; whoever needs host values pays the np.asarray."""
        import jax.numpy as jnp
        import numpy as np

        n = images.shape[0]
        bucket = _next_bucket(n)
        if bucket > n:  # pad tail rows; results are sliced back to n
            images = np.concatenate(
                [images, np.zeros((bucket - n,) + images.shape[1:],
                                  images.dtype)])
            wids = np.concatenate(
                [wids, np.zeros((bucket - n, wids.shape[1]), wids.dtype)])
        with self._lock:
            params = self.vqa_params
        vals, idxs, att = self._predict(params, self.cnn_params,
                                        jnp.asarray(images),
                                        jnp.asarray(wids))
        return vals[:n], idxs[:n], att[:n]

    def predict_prepared(self, images, wids):
        """Blocking variant: numpy rows after the device round-trip."""
        import numpy as np

        vals, idxs, att = self.predict_prepared_async(images, wids)
        return np.asarray(vals), np.asarray(idxs), np.asarray(att)

    def format_result(self, vals, idxs, att) -> dict:
        """One item's device outputs -> the response dict (att maps as b64
        PNGs, top-5 answer strings)."""
        return {"ans": [self.vocab_answers[i] for i in idxs],
                "val": [float(v) for v in vals],
                "att": self._att_pngs(att)}

    def answer_batch(self, items: list[dict]) -> list[dict]:
        """All items in one device call (padded to a power-of-two bucket)."""
        import numpy as np

        if not items:
            return []
        if len(items) > MAX_BATCH:
            raise ValueError("batch too large: %d > %d"
                             % (len(items), MAX_BATCH))
        # one native batch decode (C++ thread pool, no GIL); per-item PIL
        # only for rows the native decoder punts on.  A Python thread pool
        # measured SLOWER here (GIL contention in the PIL resize path,
        # 53 vs 17 ms/item at /batch 32) — the C call sidesteps that.
        dec = self._native_decoder()
        if dec is not None and len(items) > 1:
            raws = [base64.b64decode(it["visual"].split(",")[-1])
                    for it in items]
            images, ok = dec.decode_buffers(raws, size=self.size)
            for i in np.flatnonzero(~ok):
                images[i] = self._pil_decode(raws[i])
        else:
            images = np.stack([self._decode_image(it["visual"])
                               for it in items])
        wids = np.stack([self.encode_question(it["question"])
                         for it in items])
        vals, idxs, att = self.predict_prepared(images, wids)
        return [self.format_result(vals[j], idxs[j], att[j])
                for j in range(len(items))]

    def answer(self, image_b64: str, question: str) -> dict:
        return self.answer_batch(
            [{"visual": image_b64, "question": question}])[0]

    def prewarm(self, max_bucket: int = MAX_BATCH,
                concurrent: bool = True) -> list:
        """Compile every power-of-two bucket program up front.

        Without this, a request landing on a cold bucket pays that
        bucket's compile inline (minutes through a remote-compile tunnel).
        ``concurrent=True`` issues all bucket compiles from separate
        threads: tracing serializes on the GIL (cheap) but the XLA/PJRT
        compile releases it, so distinct bucket programs compile in
        parallel and the wall cost is ~the slowest single compile, not the
        sum.  The first dispatch also forces the one-time CNN/VQA weight
        upload (shared by all buckets — weights are arguments, not
        closure constants).  Returns the warmed bucket sizes.
        """
        import numpy as np

        buckets, b = [], 1
        while b <= min(max_bucket, MAX_BATCH):
            buckets.append(b)
            b *= 2

        def warm(n):
            images = np.zeros((n, self.size, self.size, 3), np.uint8)
            wids = np.zeros((n, self.maxlength), np.int32)
            self.predict_prepared(images, wids)

        if concurrent:
            threads = [threading.Thread(target=warm, args=(n,), daemon=True)
                       for n in buckets]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        else:
            for n in buckets:
                warm(n)
        return buckets


class MicroBatcher:
    """Coalesce concurrent single requests into one device call.

    OPT-IN: on this runtime direct per-thread dispatch still wins 16-client
    throughput (SERVE_r05.json: 41.6 items/s direct vs 24.7 adaptive /
    26.0 window — the 448^2 ResNet forward is compute-dense, so a batch
    of 16 costs barely less per item than 16 batches of 1 and coalescing
    has little to amortize), though the adaptive batcher now posts the
    best p50 (191 vs 355 ms) at a worse tail.  It exists for the
    deployments where the trade flips: overhead-dominated models (small
    forwards, high-RTT dispatch) where one device call per N requests is
    the win.  Request threads do their own decode/tokenize before
    enqueueing and their own response formatting after — only the device
    call is shared.  The reference serves strictly one request per
    forward (demo_server.py:44-66).

    Two coalescing policies:

    * ``adaptive`` (default): a lone request dispatches IMMEDIATELY — the
      loop only drains requests that are already queued (i.e. that arrived
      while the previous device call was in flight).  The device-call
      duration itself is the batching window: under sustained load arrivals
      accumulate during ``_run`` and coalesce on the next drain, while an
      idle server adds zero latency.  SERVE_r04.json measured the fixed
      4 ms window SLOWER than direct dispatch at 16 clients (30.3 vs 39.0
      items/s) — the window taxed every request to buy coalescing that
      queuing pressure already provides for free.
    * ``adaptive=False`` (legacy fixed window): hold each batch open for up
      to ``max_wait_ms`` — every request, even on an idle server, pays up
      to the window in extra latency.  Kept for A/B measurement
      (scripts/bench_serve.py).

    ``n_dispatchers`` parallel drain loops share one queue: each takes a
    batch (coalescing whatever else is queued) and runs the blocking
    device call itself, so up to ``n_dispatchers`` coalesced batches
    overlap their round-trips the way direct-dispatch threads do.  A
    SINGLE dispatcher funnel was measured pathological on a tunneled
    runtime: sequential clients waking one-by-one degenerate it into a
    convoy of batch-1 dispatches with zero overlap (~1 s/item at 16
    clients), and an async-dispatch/finisher pipeline variant collapsed
    the same way for the same reason — batch composition, not readback
    blocking, was the bottleneck.

    ``submit`` blocks until the result row is ready and re-raises any
    batch-level failure in the caller's thread.
    """

    def __init__(self, engine: DemoEngine, max_batch: int = MAX_BATCH,
                 max_wait_ms: float = 4.0, autostart: bool = True,
                 adaptive: bool = True, n_dispatchers: int = 4):
        import queue

        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.adaptive = adaptive
        self.n_dispatchers = max(1, n_dispatchers)
        self._q = queue.Queue()
        self._threads: list = []
        if autostart:
            self.start()

    def start(self) -> None:
        if not self._threads:
            self._threads = [
                threading.Thread(target=self._loop, daemon=True)
                for _ in range(self.n_dispatchers)]
            for t in self._threads:
                t.start()

    def pending(self) -> int:
        return self._q.qsize()

    def submit(self, item: dict) -> dict:
        """Prepare in this thread, coalesce the device call, format here."""
        prepared = self.engine.prepare(item)
        done = threading.Event()
        slot: dict = {}
        self._q.put((prepared, done, slot))
        done.wait()
        if "error" in slot:
            raise slot["error"]
        vals, idxs, att = slot["row"]
        return self.engine.format_result(vals, idxs, att)

    def _loop(self) -> None:
        import queue
        import time

        while True:
            entries = [self._q.get()]
            if self.adaptive:
                # drain what is ALREADY queued and dispatch — no
                # artificial wait; a lone request goes straight to the
                # device while the other dispatchers stay parked on the
                # queue for whatever arrives next
                while len(entries) < self.max_batch:
                    try:
                        entries.append(self._q.get_nowait())
                    except queue.Empty:
                        break
            else:
                deadline = time.monotonic() + self.max_wait_s
                while len(entries) < self.max_batch:
                    timeout = deadline - time.monotonic()
                    if timeout <= 0:
                        break
                    try:
                        entries.append(self._q.get(timeout=timeout))
                    except queue.Empty:
                        break
            self._run(entries)

    def _run(self, entries: list) -> None:
        import numpy as np

        try:
            images = np.stack([e[0][0] for e in entries])
            wids = np.stack([e[0][1] for e in entries])
            vals, idxs, att = self.engine.predict_prepared(images, wids)
            for j, (_, done, slot) in enumerate(entries):
                slot["row"] = (vals[j], idxs[j], att[j])
                done.set()
        except Exception as exc:  # noqa: BLE001 — re-raised in each caller
            for _, done, slot in entries:
                slot["error"] = exc
                done.set()


def make_handler(engine: DemoEngine, web_dir: str | None,
                 ckpt_root: str | None = None,
                 batcher: MicroBatcher | None = None):
    class Handler(BaseHTTPRequestHandler):
        def _cors(self):
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Headers", "Content-Type")

        def _json(self, obj, status=200):
            data = json.dumps(obj).encode()
            self.send_response(status)
            self._cors()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_OPTIONS(self):
            self.send_response(200)
            self._cors()
            self.end_headers()

        def do_GET(self):
            if self.path == "/checkpoints":
                self._json({"checkpoints": list_checkpoints(ckpt_root)})
                return
            if self.path == "/health":
                self._json({"ok": True})
                return
            if web_dir is None:
                self.send_response(404)
                self.end_headers()
                return
            path = "index.html" if self.path in ("/", "") \
                else self.path.lstrip("/")
            full = os.path.join(web_dir, path)
            if not os.path.isfile(full):
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            ctype = ("text/html" if full.endswith(".html")
                     else "application/javascript" if full.endswith(".js")
                     else "text/css" if full.endswith(".css")
                     else "application/octet-stream")
            self.send_header("Content-Type", ctype)
            self.end_headers()
            with open(full, "rb") as f:
                self.wfile.write(f.read())

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                payload = json.loads(body)
                if self.path == "/batch":
                    out = {"results": engine.answer_batch(payload["items"])}
                elif self.path == "/checkpoint":
                    wanted = payload["name"]
                    match = [c for c in list_checkpoints(ckpt_root)
                             if c["name"] == wanted]
                    if not match:
                        raise KeyError("unknown checkpoint: %s" % wanted)
                    engine.load_checkpoint(match[0]["path"])
                    out = {"ok": True, "loaded": match[0]}
                elif batcher is not None:
                    # concurrent single requests coalesce into one device
                    # call (ThreadingHTTPServer gives each request a thread)
                    out = batcher.submit(payload)
                else:
                    out = engine.answer(payload["visual"],
                                        payload["question"])
                self._json(out)
            except Exception as exc:  # noqa: BLE001 — report to client
                self._json({"error": str(exc)}, status=400)

        def log_message(self, fmt, *args):
            print("[demo]", fmt % args)

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path_opt",
                        default="configs/vqa2/mutan_noatt_train.yaml")
    parser.add_argument("--dir_logs", default=None, type=str,
                        help="VQA checkpoint dir (best/ loaded); random init "
                             "if omitted")
    parser.add_argument("--ckpt_root", default=None, type=str,
                        help="dir of run dirs for GET /checkpoints + hot-swap")
    parser.add_argument("--port", default=3456, type=int)
    parser.add_argument("--ip", default="127.0.0.1", type=str)
    parser.add_argument("--vocab_path", default=None, type=str,
                        help="processed dir with vocab pickles")
    parser.add_argument("--serve_web", action="store_true",
                        help="also serve the bundled demo_web client")
    parser.add_argument("--batcher", default="off",
                        choices=["adaptive", "window", "off"],
                        help="POST / coalescing policy.  Default 'off': one "
                             "request per device call, each request thread "
                             "dispatching independently — highest measured "
                             "16-client throughput on this runtime "
                             "(SERVE_r05.json: 41.6 items/s vs 24.7 "
                             "adaptive / 26.0 window; the 448^2 CNN call "
                             "is compute-dense, so batch-16 is barely "
                             "cheaper per item than batch-1).  'adaptive' "
                             "coalesces with zero idle latency over 4 "
                             "parallel dispatchers (best p50 under load, "
                             "worse tail), 'window' holds "
                             "--batch_window_ms — both for overhead-"
                             "dominated deployments (tiny models, high-RTT "
                             "dispatch) where one device call per N "
                             "requests wins")
    parser.add_argument("--batch_window_ms", type=float, default=4.0,
                        help="fixed coalescing window, used only with "
                             "--batcher window (0 also disables the batcher, "
                             "matching the pre-adaptive flag contract)")
    parser.add_argument("--prewarm", action="store_true",
                        help="compile EVERY batch bucket before serving "
                             "(concurrent compiles), so no request ever "
                             "pays a cold bucket compile; without it only "
                             "the single-request bucket is warmed")
    args = parser.parse_args(argv)

    from ..core import checkpoint as ckpt_lib
    from ..core import config as config_lib
    from ..data import synthetic
    from ..models import convnets, factory

    options = config_lib.resolve_options({}, args.path_opt, {})

    if args.vocab_path:
        import pickle
        with open(os.path.join(args.vocab_path,
                               "wid_to_word.pickle"), "rb") as f:
            wid_to_word = pickle.load(f)
        vocab_words = [wid_to_word[i] for i in sorted(wid_to_word)]
        with open(os.path.join(args.vocab_path,
                               "aid_to_ans.pickle"), "rb") as f:
            vocab_answers = pickle.load(f)
    else:
        print("WARNING: no --vocab_path; using synthetic vocab (smoke only)")
        vocab_words, vocab_answers = synthetic.synthetic_vocab(
            2000, options["vqa"]["nans"])

    import jax
    import jax.numpy as jnp

    cnn = convnets.factory({"arch": options["coco"]["arch"],
                            "pooling": False})
    cnn_params = convnets.init_resnet(cnn, options["coco"].get("size", 448))
    model = factory.factory_vqa(options["model"], tuple(vocab_words),
                                tuple(vocab_answers))
    attention = "Att" in options["model"]["arch"] \
        and "NoAtt" not in options["model"]["arch"]
    size = options["coco"].get("size", 448)
    spatial = size // 32
    dummy_v = (jnp.zeros((1, spatial, spatial, 2048)) if attention
               else jnp.zeros((1, 2048)))
    from ..core import policy

    with policy.host_init_scope():  # eager CPU init — the jitted init is a
        # once-executed program whose remote compile costs minutes here
        vqa_params = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            dummy_v, jnp.zeros((1, options["vqa"]["maxlength"]), jnp.int32),
            deterministic=True)["params"]
    vqa_params = policy.device_put_contiguous(vqa_params)
    if args.dir_logs:
        _, loaded, _ = ckpt_lib.load_vqa_checkpoint(
            vqa_params, None, os.path.join(args.dir_logs, "best"))
        if loaded is not None:
            vqa_params = loaded
            print("Loaded VQA checkpoint from", args.dir_logs)

    engine = DemoEngine(options, vqa_params, cnn_params, vocab_words,
                        vocab_answers, attention)

    # warm the jitted predict path now so the first user request is served at
    # steady-state latency (~0.2 s) instead of paying the compile
    if args.prewarm:
        print("Prewarming every batch bucket (concurrent compiles)...")
        print("  warmed buckets:", engine.prewarm())
    else:
        print("Warming up the predict path (first compile)...")
        import numpy as np
        from PIL import Image as PILImage

        dummy = PILImage.fromarray(
            (np.zeros((size, size, 3))).astype("uint8"))
        buf = io.BytesIO()
        dummy.save(buf, format="JPEG")
        engine.answer(base64.b64encode(buf.getvalue()).decode(), "warm up")

    web_dir = (os.path.join(os.path.dirname(__file__), "demo_web")
               if args.serve_web else None)
    batcher = None
    if args.batcher != "off" and args.batch_window_ms > 0:
        batcher = MicroBatcher(engine, max_wait_ms=args.batch_window_ms,
                               adaptive=args.batcher == "adaptive")
    server = ThreadingHTTPServer(
        (args.ip, args.port), make_handler(engine, web_dir, args.ckpt_root,
                                           batcher))
    print("Serving VQA demo on http://%s:%d" % (args.ip, args.port))
    server.serve_forever()


if __name__ == "__main__":
    main()
