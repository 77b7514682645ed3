"""Convenience re-exports of the reference's ``vqa/lib/utils.py`` surface
(update_values, merge_dict, accuracy, str2bool, params_count, create_n_hot)
from their canonical homes in this framework."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import merge_dict, str2bool, update_values  # noqa: F401
from ..ops.metrics import accuracy_topk as accuracy  # noqa: F401


def params_count(params) -> int:
    """Total parameter count of a pytree (reference utils.py:40-47)."""
    return sum(int(np.prod(leaf.shape))
               for leaf in jax.tree_util.tree_leaves(params))


def create_n_hot(idxs, n: int) -> jnp.ndarray:
    """Normalized multi-hot vector (reference utils.py:61-65)."""
    out = np.zeros(n, dtype=np.float32)
    for i in idxs:
        out[i] += 1
    return jnp.asarray(out / out.sum())
