"""Chunked-iteration helpers for device arrays.

Chunked precompute/query loops must NOT slice device arrays with python
ints: ``arr[s:s+size]`` lowers to a static ``lax.slice`` — a distinct HLO
program per start offset, each paying a full compile (multi-second through
this runtime's remote compile service; the v-projection build measured
154 s for 11 chunks before this fix, 2026-08-19 profile).  ``row_slice``
is a single traced-start program for every offset, and ``windows`` yields
full-size windows so every downstream op keeps one compiled shape without
padding.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.jit, static_argnums=(2,))
def row_slice(arr, start, size: int):
    """``arr[start:start+size]`` as ONE compiled program for every start.

    Starts are clamped by XLA's dynamic_slice semantics, which is exactly
    the full-window-with-overlap behavior ``windows`` wants.
    """
    return jax.lax.dynamic_slice_in_dim(arr, start, size, axis=0)


def windows(n: int, chunk: int):
    """Full-``chunk``-size windows covering [0, n): yields (start, offset)
    where ``offset`` is how many leading rows of the window duplicate the
    previous one (only the tail window overlaps; slice ``[offset:]`` to
    deduplicate, or rewrite the overlap idempotently)."""
    for i in range(0, n, chunk):
        s = min(i, max(n - chunk, 0))
        yield s, i - s
