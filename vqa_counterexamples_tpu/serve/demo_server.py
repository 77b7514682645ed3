"""VQA demo HTTP server (reference ``demo_server.py``).

POST ``/`` with JSON ``{"visual": <base64 jpeg>, "question": "..."}`` returns
``{"ans": [top-5 answers], "val": [probs], "att": [b64 PNG glimpse maps]}``
with CORS headers — the same contract as the reference (demo_server.py:44-125)
so the bundled web client (serve/demo_web) works unchanged.

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
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


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
        self.tokenize = tokenize_mcb
        self.attention = attention

        cnn = convnets.factory({"arch": options["coco"]["arch"],
                                "pooling": False})
        model = factory.factory_vqa(options["model"], tuple(vocab_words),
                                    tuple(vocab_answers))

        def predict(image, wids):
            att_map = cnn.apply({"params": cnn_params}, image[None])
            if attention:
                logits, att = model.apply(
                    {"params": vqa_params}, att_map, wids[None],
                    deterministic=True, return_att=True)
            else:
                visual = jnp.mean(att_map, axis=(1, 2))
                logits = model.apply({"params": vqa_params}, visual,
                                     wids[None], deterministic=True)
                att = jnp.zeros((1, 0, att_map.shape[1] * att_map.shape[2]))
            probs = jax.nn.softmax(logits, axis=-1)[0]
            top_vals, top_idx = jax.lax.top_k(probs, 5)
            return top_vals, top_idx, att[0]

        self._predict = jax.jit(predict)

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

    def answer(self, image_b64: str, question: str) -> dict:
        import numpy as np
        from PIL import Image

        from ..models.convnets import preprocess_image

        raw = base64.b64decode(image_b64.split(",")[-1])
        img = Image.open(io.BytesIO(raw)).convert("RGB")
        image = preprocess_image(img)
        wids = self.encode_question(question)
        import jax.numpy as jnp
        vals, idxs, att = self._predict(jnp.asarray(image),
                                        jnp.asarray(wids))
        vals = np.asarray(vals)
        idxs = np.asarray(idxs)
        att = np.asarray(att)

        att_pngs = []
        for g in range(att.shape[0]):
            side = int(round(att.shape[1] ** 0.5))
            att_map = att[g].reshape(side, side)
            att_map = att_map / max(att_map.max(), 1e-8)
            png = Image.fromarray((att_map * 255).astype("uint8"), "L") \
                .resize((112, 112), resample=0)
            buf = io.BytesIO()
            png.save(buf, format="PNG")
            att_pngs.append(base64.b64encode(buf.getvalue()).decode())
        return {"ans": [self.vocab_answers[i] for i in idxs],
                "val": [float(v) for v in vals],
                "att": att_pngs}


def make_handler(engine: DemoEngine, web_dir: str | None):
    class Handler(BaseHTTPRequestHandler):
        def _cors(self):
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Headers", "Content-Type")

        def do_OPTIONS(self):
            self.send_response(200)
            self._cors()
            self.end_headers()

        def do_GET(self):
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
                out = engine.answer(payload["visual"], payload["question"])
                data = json.dumps(out).encode()
                self.send_response(200)
            except Exception as exc:  # noqa: BLE001 — report to client
                data = json.dumps({"error": str(exc)}).encode()
                self.send_response(400)
            self._cors()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

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
    parser.add_argument("--port", default=3456, type=int)
    parser.add_argument("--ip", default="127.0.0.1", type=str)
    parser.add_argument("--vocab_path", default=None, type=str,
                        help="processed dir with vocab pickles")
    parser.add_argument("--serve_web", action="store_true",
                        help="also serve the bundled demo_web client")
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
    vqa_params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        dummy_v, jnp.zeros((1, options["vqa"]["maxlength"]), jnp.int32),
        deterministic=True)["params"]
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
    server = ThreadingHTTPServer((args.ip, args.port),
                                 make_handler(engine, web_dir))
    print("Serving VQA demo on http://%s:%d" % (args.ip, args.port))
    server.serve_forever()


if __name__ == "__main__":
    main()
