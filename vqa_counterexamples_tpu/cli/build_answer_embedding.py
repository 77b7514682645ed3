"""Answer-embedding table builder CLI (reference ``answer_embedding.ipynb``).

For each of the top-2000 answers whose words are all in the question vocab
("good answers", notebook cells 24-29), encode its word-id sequence with the
pretrained skip-thoughts question encoder into a 2400-d vector; all other rows
are zero.  Saves the (nans, 2400) table as ``answer_embedding.pickle`` — the
pretrained init for NeuralCX's answer embedding (cx.py:240-243) and the
SemanticBaseline similarity matrix (cx.py:173-175).
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def build_table(encode_fn, vocab_answers, word_to_wid, maxlength=26,
                pad="right", dim=2400, batch_size=128):
    """encode_fn: (B, maxlength) int32 -> (B, dim)."""
    n = len(vocab_answers)
    table = np.zeros((n, dim), dtype=np.float32)
    rows, wid_batches = [], []
    for aid, ans in enumerate(vocab_answers):
        words = ans.split()
        if not words or not all(w in word_to_wid for w in words):
            continue
        wids = [word_to_wid[w] for w in words][:maxlength]
        enc = np.zeros((maxlength,), dtype=np.int32)
        if pad == "right":
            enc[:len(wids)] = wids
        else:
            enc[maxlength - len(wids):] = wids
        rows.append(aid)
        wid_batches.append(enc)
    print("%d/%d answers coverable by the question vocab" % (len(rows), n))
    for start in range(0, len(rows), batch_size):
        chunk = np.stack(wid_batches[start:start + batch_size])
        pad_rows = batch_size - chunk.shape[0]
        if pad_rows:
            chunk = np.concatenate(
                [chunk, np.zeros((pad_rows, maxlength), np.int32)])
        out = np.asarray(encode_fn(chunk))
        if pad_rows:
            out = out[:-pad_rows]
        table[rows[start:start + batch_size]] = out
    return table


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path_opt",
                        default="configs/vqa2/mutan_noatt_train.yaml")
    parser.add_argument("--path_processed", required=True, type=str,
                        help="processed dir with vocab pickles")
    parser.add_argument("--dir_logs", default=None, type=str,
                        help="VQA checkpoint to take seq2vec params from")
    parser.add_argument("--out", default=None, type=str)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core import checkpoint as ckpt_lib
    from ..core import config as config_lib
    from ..models import factory

    options = config_lib.resolve_options({}, args.path_opt, {})

    with open(os.path.join(args.path_processed,
                           "wid_to_word.pickle"), "rb") as f:
        wid_to_word = pickle.load(f)
    vocab_words = [wid_to_word[i] for i in sorted(wid_to_word)]
    word_to_wid = {w: i + 1 for i, w in enumerate(vocab_words)}
    with open(os.path.join(args.path_processed,
                           "aid_to_ans.pickle"), "rb") as f:
        vocab_answers = pickle.load(f)

    from ..core import policy

    model = factory.factory_vqa(options["model"], tuple(vocab_words),
                                tuple(vocab_answers))
    dim_v = options["model"]["fusion"]["dim_v"]
    maxlength = options["vqa"]["maxlength"]
    with policy.host_init_scope():  # eager CPU init — the jitted init is a
        # once-executed program whose remote compile costs minutes here
        params = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, dim_v)), jnp.zeros((1, maxlength), jnp.int32),
            deterministic=True)["params"]
    from ..core.policy import device_put_contiguous
    params = device_put_contiguous(params)
    if args.dir_logs:
        _, loaded, _ = ckpt_lib.load_vqa_checkpoint(
            params, None, os.path.join(args.dir_logs, "best"))
        if loaded is not None:
            params = loaded
            print("Loaded seq2vec from VQA checkpoint", args.dir_logs)

    @jax.jit
    def encode(wids):
        return model.apply({"params": params}, jnp.asarray(wids),
                           deterministic=True,
                           method=model.encode_question)

    # table width = the encoder's actual output dim (2400 for the flagship
    # skip-thoughts encoder; whatever dim_q the configured model emits)
    dim = int(jax.eval_shape(
        encode, np.zeros((1, maxlength), np.int32)).shape[-1])
    table = build_table(encode, vocab_answers, word_to_wid,
                        maxlength=maxlength, dim=dim,
                        pad=options["vqa"].get("pad", "right"))
    out = args.out or os.path.join(args.path_processed,
                                   "answer_embedding.pickle")
    with open(out, "wb") as f:
        pickle.dump(table, f)
    print("Saved answer embedding table %s to %s"
          % (table.shape, out))


if __name__ == "__main__":
    main()
