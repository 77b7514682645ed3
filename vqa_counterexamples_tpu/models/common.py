"""Shared model helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng as rng_lib


def dropout(module, x: jax.Array, rate: float,
            deterministic: bool) -> jax.Array:
    """Functional inverted dropout drawing from the module's 'dropout' stream.

    Usable from any module method (unlike ``nn.Dropout``, which is a submodule
    and may only be created in ``setup``/``@compact`` — our VQA models expose
    ``classify``/``fuse`` as plain methods so the CX zoo can drive them).
    Mask bits come from :func:`core.rng.keep_mask` (8 random bits per
    element by default — the (B, 196, 2048) attention-input mask is the
    single hottest op of the MutanAtt step otherwise).
    """
    if deterministic or rate == 0.0:
        return x
    keep, scale = rng_lib.keep_mask(module.make_rng("dropout"), 1.0 - rate,
                                    x.shape)
    return jnp.where(keep, x * scale, 0.0)
