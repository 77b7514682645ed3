"""PRNG discipline.

The reference seeds python/torch/cuda RNGs globally (``counterexamples.py:118-121``).
In JAX randomness is explicit: every training step derives fresh dropout keys by
folding the step counter into a root key, so runs are reproducible and
jit-friendly (no Python-side RNG state inside compiled code).
"""

from __future__ import annotations

import jax


def root_key(seed: int = 42) -> jax.Array:
    return jax.random.key(seed)


def step_keys(key: jax.Array, step, names: tuple[str, ...]) -> dict[str, jax.Array]:
    """Derive one named key per consumer for a given step.

    ``step`` may be a traced int32 — fold_in is jit-compatible, which is what
    lets the whole train step (dropout included) live under one ``jax.jit``.
    """
    base = jax.random.fold_in(key, step)
    keys = jax.random.split(base, len(names))
    return {name: keys[i] for i, name in enumerate(names)}
