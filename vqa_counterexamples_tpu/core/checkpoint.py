"""Checkpointing with best-metric retention.

Reproduces both reference schemes on top of msgpack-serialized JAX pytrees
(flax.serialization):

* CX scheme (``counterexamples.py:550-580``): ``{save_dir}/ckpt/model.ckpt`` +
  ``info.ckpt`` (list of per-epoch eval dicts), copied into ``best/`` when the
  val metric improves; resume infers the epoch from ``len(info)``.
* VQA scheme (``train.py:290-367``): ``ckpt_{info,model,optim}`` triplet with
  ``best_*`` copies keyed on val acc1, or keep-all-from-epoch mode with rolling
  delete of older epochs.

Pytrees are restored with ``from_bytes`` against a template of the same
structure, so shapes/dtypes are validated on load.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import jax
from flax import serialization


# ---------------------------------------------------------------------------
# pytree <-> bytes
# ---------------------------------------------------------------------------

def save_pytree(pytree: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pytree = jax.device_get(pytree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(pytree))


def save_pytree_orbax(pytree: Any, path: str) -> bool:
    """Optional orbax backend (async-capable, multi-host-aware) for
    large-scale deployments; returns False when orbax is unavailable.
    The msgpack scheme above remains the canonical format."""
    try:
        import orbax.checkpoint as ocp
    except Exception:  # noqa: BLE001
        return False
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(pytree), force=True)
    return True


def load_pytree_orbax(template: Any, path: str) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=template)


def load_pytree(template: Any, path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _save_json(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


def _load_json(path: str) -> Any:
    with open(path, "r") as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# CX scheme
# ---------------------------------------------------------------------------

def save_cx_checkpoint(state: Any, info: list, save_dir: str,
                       is_best: bool = True) -> None:
    """``state`` is any pytree (e.g. {'params':..., 'opt_state':...})."""
    path_ckpt_model = os.path.join(save_dir, "ckpt", "model.ckpt")
    path_ckpt_info = os.path.join(save_dir, "ckpt", "info.ckpt")
    save_pytree(state, path_ckpt_model)
    _save_json(info, path_ckpt_info)
    if is_best:
        best_dir = os.path.join(save_dir, "best")
        os.makedirs(best_dir, exist_ok=True)
        shutil.copyfile(path_ckpt_model, os.path.join(best_dir, "model.ckpt"))
        shutil.copyfile(path_ckpt_info, os.path.join(best_dir, "info.ckpt"))


def load_cx_checkpoint(state_template: Any, save_dir: str,
                       resume_best: bool = True):
    """Returns (state, info, next_epoch, best_recall)."""
    sub = "best" if resume_best else "ckpt"
    path_ckpt_model = os.path.join(save_dir, sub, "model.ckpt")
    path_ckpt_info = os.path.join(save_dir, sub, "info.ckpt")
    state = load_pytree(state_template, path_ckpt_model)
    info = _load_json(path_ckpt_info)
    assert len(info) > 0
    last_epoch = len(info)
    return state, info, last_epoch + 1, info[-1]["recall"]


# ---------------------------------------------------------------------------
# VQA scheme
# ---------------------------------------------------------------------------

def save_vqa_checkpoint(info: dict, model_state: Any, optim_state: Any,
                        dir_logs: str, save_model: bool = True,
                        save_all_from: int | None = None,
                        is_best: bool = True) -> None:
    os.makedirs(dir_logs, exist_ok=True)
    path_ckpt_info = os.path.join(dir_logs, "ckpt_info.json")
    path_ckpt_model = os.path.join(dir_logs, "ckpt_model.msgpack")
    path_ckpt_optim = os.path.join(dir_logs, "ckpt_optim.msgpack")
    path_best_info = os.path.join(dir_logs, "best_info.json")
    path_best_model = os.path.join(dir_logs, "best_model.msgpack")
    path_best_optim = os.path.join(dir_logs, "best_optim.msgpack")
    _save_json(info, path_ckpt_info)
    if save_all_from is None:
        if save_model:
            save_pytree(model_state, path_ckpt_model)
            save_pytree(optim_state, path_ckpt_optim)
        if is_best:
            shutil.copyfile(path_ckpt_info, path_best_info)
            if save_model:
                shutil.copyfile(path_ckpt_model, path_best_model)
                shutil.copyfile(path_ckpt_optim, path_best_optim)
    else:
        # keep-all-from-epoch mode with rolling delete (train.py:303-325)
        epoch = int(info["epoch"])
        if epoch >= save_all_from:
            save_pytree(model_state, _epoch_path(path_ckpt_model, epoch))
            save_pytree(optim_state, _epoch_path(path_ckpt_optim, epoch))
            for old in range(save_all_from, epoch):
                for p in (_epoch_path(path_ckpt_model, old),
                          _epoch_path(path_ckpt_optim, old)):
                    if os.path.isfile(p) and not _is_best_epoch(dir_logs, old):
                        os.remove(p)


def _epoch_path(path: str, epoch: int) -> str:
    base, ext = os.path.splitext(path)
    return "%s_epoch,%d%s" % (base, epoch, ext)


def _is_best_epoch(dir_logs: str, epoch: int) -> bool:
    path_best_info = os.path.join(dir_logs, "best_info.json")
    if not os.path.isfile(path_best_info):
        return False
    try:
        return int(_load_json(path_best_info).get("epoch", -1)) == epoch
    except Exception:
        return False


def load_vqa_checkpoint(model_template: Any, optim_template: Any | None,
                        path_ckpt: str):
    """``path_ckpt`` is a prefix dir; loads the triplet saved above.

    Returns (info, model_state, optim_state); missing pieces produce warnings
    and None, matching the tolerant behavior of reference train.py:344-364.
    """
    info, model_state, optim_state = {}, None, None
    # reference semantics (train.py:344-364): path_ckpt is a *prefix* —
    # ``<dir>/best`` selects the best_* triplet inside <dir> (save_vqa_
    # checkpoint writes best_model.msgpack next to ckpt_model.msgpack,
    # not into a best/ subdirectory)
    if (os.path.basename(path_ckpt) == "best"
            and not os.path.isdir(path_ckpt)):
        base = os.path.dirname(path_ckpt)
        path_info = os.path.join(base, "best_info.json")
        path_model = os.path.join(base, "best_model.msgpack")
        path_optim = os.path.join(base, "best_optim.msgpack")
    else:
        path_info = os.path.join(path_ckpt, "ckpt_info.json")
        path_model = os.path.join(path_ckpt, "ckpt_model.msgpack")
        path_optim = os.path.join(path_ckpt, "ckpt_optim.msgpack")
        # a dir holding only the best triplet also resolves
        if not os.path.isfile(path_info):
            path_info = os.path.join(path_ckpt, "best_info.json")
            path_model = os.path.join(path_ckpt, "best_model.msgpack")
            path_optim = os.path.join(path_ckpt, "best_optim.msgpack")
    if os.path.isfile(path_info):
        info = _load_json(path_info)
    else:
        print("Warning: no info checkpoint found at %s" % path_ckpt)
    if os.path.isfile(path_model):
        model_state = load_pytree(model_template, path_model)
    else:
        print("Warning: no model checkpoint found at %s" % path_ckpt)
    if optim_template is not None:
        if os.path.isfile(path_optim):
            optim_state = load_pytree(optim_template, path_optim)
        else:
            print("Warning: no optim checkpoint found at %s" % path_ckpt)
    return info, model_state, optim_state
