"""Convert a trained reference (PyTorch) checkpoint into this framework.

Reference users hold torch ``state_dict`` files:

* VQA classifiers from reference ``train.py`` — ``best_model.pth.tar`` /
  ``ckpt_model.pth.tar`` (train.py:290-330).  ``--kind vqa`` writes our
  VQA-scheme checkpoint triple (best_* + ckpt_* aliases) into ``--out``, so
  both ``cli/train.py --resume best`` and the CX driver's pretrained-VQA
  load (``cli/counterexamples.py`` -> ``core/checkpoint.load_vqa_checkpoint``)
  consume it directly.  The optimizer state is not portable (torch Adam
  moments have no meaning for optax trees) and is left absent — the loader
  warns and starts the optimizer fresh, the reference's own tolerant
  behavior (train.py:344-364).
* CX models from reference ``counterexamples.py`` — ``ckpt/model.ckpt``
  (counterexamples.py:550-560), with the VQA model nested under
  ``vqa_model.``.  ``--kind cx`` writes a params-only msgpack consumable by
  ``cli/counterexamples.py --init_params``.

The key mapping and architecture inference live in
``models/port_torch.py``; this wrapper only does file IO.  Inputs may be a
torch ``.pth``/``.pth.tar`` (loaded with ``weights_only=True``) or an
``.npz``/pickle of numpy arrays with the same key names.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_state_dict(path: str) -> dict:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # reference train.py saves bare state_dicts; tolerate common wrappers
    for key in ("state_dict", "model_state", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    # a checkpoint saved without unwrapping nn.DataParallel carries a
    # uniform "module." prefix (the reference unwraps, train.py:231, but
    # forks often don't)
    if sd and all(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    return sd


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--src", required=True, type=str,
                        help="torch state_dict (.pth/.pth.tar) or .npz")
    parser.add_argument("--kind", required=True, choices=["vqa", "cx"])
    parser.add_argument("--out", required=True, type=str,
                        help="vqa: output dir for the checkpoint triple; "
                             "cx: output .msgpack params file")
    parser.add_argument("--cx_model", type=str, default=None,
                        help="override CX model inference (NeuralModel, "
                             "PairwiseModel, ...)")
    args = parser.parse_args(argv)

    from ..core import checkpoint as ckpt_lib
    from ..models import port_torch

    sd = load_state_dict(args.src)
    if args.kind == "vqa":
        params, arch = port_torch.port_vqa_state_dict(sd)
        os.makedirs(args.out, exist_ok=True)
        info = {"epoch": 0, "arch": arch, "ported_from": args.src}
        for stem in ("best", "ckpt"):
            ckpt_lib.save_pytree(
                params, os.path.join(args.out, stem + "_model.msgpack"))
            with open(os.path.join(args.out, stem + "_info.json"), "w") as f:
                json.dump(info, f)
        print("Ported %s VQA checkpoint -> %s (best_/ckpt_ triple; optimizer "
              "state starts fresh)" % (arch, args.out))
    else:
        params, model, vqa_arch = port_torch.port_cx_state_dict(
            sd, cx_model=args.cx_model)
        ckpt_lib.save_pytree(params, args.out)
        print("Ported %s CX checkpoint (vqa_model: %s) -> %s; load with "
              "counterexamples --init_params" % (model, vqa_arch, args.out))


if __name__ == "__main__":
    main()
