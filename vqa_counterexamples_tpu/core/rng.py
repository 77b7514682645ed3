"""PRNG discipline.

The reference seeds python/torch/cuda RNGs globally (``counterexamples.py:118-121``).
In JAX randomness is explicit: every training step derives fresh dropout keys by
folding the step counter into a root key, so runs are reproducible and
jit-friendly (no Python-side RNG state inside compiled code).

Implementation policy (``VQACX_RNG``): the *step streams* (dropout / lesion
masks) default to the TPU hardware RNG (``rbg``) on TPU backends and threefry
elsewhere (``auto``).  Threefry mask generation is a measured cost on
dropout-heavy steps — MutanAtt pretraining at B=256/bf16 runs 13.75k ex/s
with threefry vs 14.63k with rbg (+6.4%), because dropout_v=0.5 over the
(B, 196, 2048) input draws ~100M random bits per step on the VPU.  Mask
randomness needs no cross-backend bit-reproducibility (it is training noise);
runs remain deterministic for a given seed on a given backend.  Set
``VQACX_RNG=threefry`` for bit-identical masks across backends, or
``VQACX_RNG=rbg`` to force the hardware RNG.  Parameter-init keys are not
routed through this policy (they use ``jax.random.key`` directly), so
initial weights stay backend-independent either way.
"""

from __future__ import annotations

import os

import jax


def _step_stream_impl() -> str | None:
    """None -> jax default (threefry); 'rbg' -> XLA RngBitGenerator."""
    mode = os.environ.get("VQACX_RNG", "auto").lower()
    if mode == "rbg":
        return "rbg"
    if mode in ("threefry", "threefry2x32"):
        return None
    # auto: hardware RNG where it pays (TPU), threefry elsewhere
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001 — no devices yet
        backend = "cpu"
    return "rbg" if backend == "tpu" else None


def root_key(seed: int = 42) -> jax.Array:
    """Root key for the per-step mask streams (dropout/lesion)."""
    impl = _step_stream_impl()
    if impl is None:
        return jax.random.key(seed)
    return jax.random.key(seed, impl=impl)


def step_keys(key: jax.Array, step, names: tuple[str, ...]) -> dict[str, jax.Array]:
    """Derive one named key per consumer for a given step.

    ``step`` may be a traced int32 — fold_in is jit-compatible, which is what
    lets the whole train step (dropout included) live under one ``jax.jit``.
    """
    base = jax.random.fold_in(key, step)
    keys = jax.random.split(base, len(names))
    return {name: keys[i] for i, name in enumerate(names)}
