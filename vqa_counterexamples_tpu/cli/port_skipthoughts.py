"""Skip-thoughts weight porter.

Converts the Cadene skip-thoughts.torch pretrained tensors (the reference's
``dir_st`` download: uni_skip.npz-style torch parameters for the
(Bayesian)UniSkip GRU + the 620-d word-embedding table adapted to a vocab)
into the npz layout ``models/seq2vec.load_skipthoughts_npz`` consumes:
``embedding`` (V+1, 620), ``w_ih`` (620, 7200), ``b_ih`` (7200,),
``w_hh`` (2400, 7200), ``b_hh`` (7200,) with torch gate order (r, z, n).

Accepts either a torch .pth state dict (keys embedding.weight,
rnn.weight_ih_l0/… or gru_cell.weight_*) or a numpy .npz with the same names.
"""

from __future__ import annotations

import argparse

import numpy as np


def convert_state_dict(sd: dict, vocab_size: int | None = None) -> dict:
    def get(*names):
        for n in names:
            if n in sd:
                v = sd[n]
                return v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        raise KeyError(names)

    emb = get("embedding.weight", "embedding")
    w_ih = get("rnn.weight_ih_l0", "gru_cell.weight_ih", "w_ih")
    w_hh = get("rnn.weight_hh_l0", "gru_cell.weight_hh", "w_hh")
    b_ih = get("rnn.bias_ih_l0", "gru_cell.bias_ih", "b_ih")
    b_hh = get("rnn.bias_hh_l0", "gru_cell.bias_hh", "b_hh")
    if w_ih.shape[0] == 3 * w_hh.shape[1] or w_ih.shape[0] > w_ih.shape[1]:
        # torch layout (3H, D) -> ours (D, 3H)
        w_ih = w_ih.T
        w_hh = w_hh.T
    if vocab_size is not None and emb.shape[0] != vocab_size + 1:
        raise ValueError("embedding rows %d != vocab+1 %d"
                         % (emb.shape[0], vocab_size + 1))
    return {"embedding": emb.astype(np.float32),
            "w_ih": w_ih.astype(np.float32),
            "b_ih": b_ih.astype(np.float32),
            "w_hh": w_hh.astype(np.float32),
            "b_hh": b_hh.astype(np.float32)}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--src", required=True, type=str,
                        help=".pth state dict or .npz with skipthoughts "
                             "tensors")
    parser.add_argument("--out", required=True, type=str,
                        help="output .npz path")
    parser.add_argument("--vocab_size", type=int, default=None)
    args = parser.parse_args(argv)

    if args.src.endswith(".npz"):
        sd = dict(np.load(args.src))
    else:
        import torch

        sd = torch.load(args.src, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    out = convert_state_dict(sd, args.vocab_size)
    np.savez(args.out, **out)
    print("Wrote", args.out,
          {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
