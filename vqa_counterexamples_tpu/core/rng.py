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


def keep_mask(key: jax.Array, keep_prob: float, shape):
    """Boolean keep-mask + unbiased inverse scale for inverted dropout.

    Default (``VQACX_DROPOUT_BITS=8``) draws 8 random bits per element and
    keeps where ``bits < round(keep_prob * 256)`` — a quarter of the
    random-bit traffic of ``jax.random.bernoulli``, whose uniform draw
    materializes 32 bits per element (the (B, 196, 2048) attention-input
    mask alone is 411 MB/step of u32 at B=256; u8 is 103 MB).  The keep
    probability quantizes to 1/256 resolution — *exact* for the reference
    rates (0.5 -> 128/256, 0.25 -> 192/256) — and the returned scale is
    ``256/thresh``, so the estimator stays unbiased even for rates the
    quantization rounds.  ``VQACX_DROPOUT_BITS=32`` restores bernoulli
    masks (also used automatically when keep_prob rounds to 0 or 256).

    Returns ``(mask, scale)``; apply as ``where(mask, x * scale, 0)``.
    ``scale`` is a weak-typed Python float, so bf16 activations stay bf16.
    """
    import jax.numpy as jnp

    if os.environ.get("VQACX_DROPOUT_BITS", "8") == "8":
        thresh = int(round(keep_prob * 256))
        if 0 < thresh < 256:
            bits = jax.random.bits(key, shape, dtype=jnp.uint8)
            return bits < jnp.uint8(thresh), 256.0 / thresh
    return jax.random.bernoulli(key, keep_prob, shape), 1.0 / keep_prob


def step_keys(key: jax.Array, step, names: tuple[str, ...]) -> dict[str, jax.Array]:
    """Derive one named key per consumer for a given step.

    ``step`` may be a traced int32 — fold_in is jit-compatible, which is what
    lets the whole train step (dropout included) live under one ``jax.jit``.
    """
    base = jax.random.fold_in(key, step)
    keys = jax.random.split(base, len(names))
    return {name: keys[i] for i, name in enumerate(names)}
