"""Shared model helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(module, x: jax.Array, rate: float,
            deterministic: bool) -> jax.Array:
    """Functional inverted dropout drawing from the module's 'dropout' stream.

    Usable from any module method (unlike ``nn.Dropout``, which is a submodule
    and may only be created in ``setup``/``@compact`` — our VQA models expose
    ``classify``/``fuse`` as plain methods so the CX zoo can drive them).
    """
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(module.make_rng("dropout"), 1.0 - rate,
                                x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
