"""Compute-dtype policy for the hot GEMMs.

TPU MXU peak doubles in bf16; the CX workload is compute-bound at the f32
roofline (~58 TF/s measured on v5e at B=512).  The policy casts *matmul
operands* in the hot ops (GRU recurrence, answer-embedding mixture, candidate
scorer, fusion projections) to the policy dtype while accumulating in f32
(``preferred_element_type``); params, optimizer state and losses stay f32.

Default is float32 (bit-faithful to the reference); benchmarks and production
training enable bf16 via ``set_compute_dtype(jnp.bfloat16)`` or
``VQACX_COMPUTE_DTYPE=bfloat16``.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax.numpy as jnp

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
_compute_dtype = _DTYPES.get(os.environ.get("VQACX_COMPUTE_DTYPE", "float32"),
                             jnp.float32)


def compute_dtype():
    return _compute_dtype


def set_compute_dtype(dtype) -> None:
    global _compute_dtype
    if isinstance(dtype, str):
        dtype = _DTYPES[dtype]
    _compute_dtype = dtype


@contextmanager
def compute_dtype_scope(dtype):
    global _compute_dtype
    prev = _compute_dtype
    set_compute_dtype(dtype)
    try:
        yield
    finally:
        _compute_dtype = prev


_host_init = False


def host_init_active() -> bool:
    """True inside :func:`host_init_scope` — Pallas gates must route to the
    XLA path because the computation runs on the host CPU backend."""
    return _host_init


@contextmanager
def host_init_scope():
    """Run flax ``init`` on the host: eager (no jit) on the CPU backend with
    every Pallas gate forced off.

    Rationale: flax jits ``init``, and on a tunneled TPU runtime the
    remote compile of an init program that executes exactly once measured
    88-520 s (soak/E2E runs 2026-08-19).  An 8-row eager CPU trace takes
    seconds, and threefry is backend-deterministic so the values are the
    ones the TPU would have produced.  Callers ``device_put`` the tree
    afterwards.
    """
    import jax

    global _host_init
    prev = _host_init
    _host_init = True
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:  # no CPU backend: fall back to default device
        cpu = None
    try:
        if cpu is None:
            with jax.disable_jit():
                yield
        else:
            with jax.default_device(cpu), jax.disable_jit():
                yield
    finally:
        _host_init = prev


def device_put_contiguous(tree):
    """``jax.device_put`` (uncommitted) with row-major-normalized leaves.

    Host-side init and torch-port trees can hold TRANSPOSED
    (non-contiguous) leaves — e.g. an embedding built via ``.T`` inside
    eager CPU init.  ``device_put`` of such a leaf lands it on device
    with the transposed layout, and every jit call taking that operand
    then pays a per-call input relayout that on the tunneled runtime is
    host-mediated: the serve predict at B=1 measured **2520 ms/call with
    an as-is tree vs 11.4 ms with normalized leaves** (2026-08-21,
    identical values — the entire 220x was layout relayout round-trips,
    while device busy time was ~5 ms either way).  Training paths dodge
    this by accident (params become jit outputs after the first step);
    inference-only paths (serving, answer-embedding build, extraction
    with ported weights) keep the original leaves forever and MUST
    normalize.  Uncommitted like a bare device_put — committed operands
    change jit dispatch keys (see ``dispatch_safe``).
    """
    import jax
    import numpy as np

    def clean(a):
        if isinstance(a, jax.Array) and not a.is_fully_replicated:
            # a mesh-sharded leaf round-tripped through the host would
            # silently lose its sharding — engines normalize BEFORE
            # device_put'ing onto a mesh, so treat this as a misuse
            raise ValueError(
                "device_put_contiguous got a mesh-sharded leaf %s %s; "
                "normalize before sharding" % (a.shape, a.sharding))
        if isinstance(a, jax.Array) and \
                next(iter(a.devices())).platform != "cpu":
            # already on the accelerator: it got there through a device
            # computation or an earlier normalized upload, so its layout
            # is the compiler's own — re-gathering it to the host buys
            # nothing (engine inits were re-downloading freshly
            # initialized device params here, ADVICE r4).  CPU-resident
            # arrays (host_init_scope outputs) still normalize: they are
            # exactly the leaves the transposed-layout bug shipped in.
            return a
        if hasattr(a, "shape") and hasattr(a, "dtype") and a.shape != ():
            arr = np.asarray(a)
            return arr if arr.flags.c_contiguous \
                else np.ascontiguousarray(arr)
        return a

    return jax.device_put(jax.tree.map(clean, tree))


def cast_in(*arrays):
    """Cast matmul operands to the policy dtype (no-op under f32)."""
    dt = _compute_dtype
    out = tuple(a.astype(dt) if a.dtype != dt else a for a in arrays)
    return out if len(out) > 1 else out[0]


def pdot(x, w):
    """Policy dot: operands in the policy dtype, f32 MXU accumulation, and
    the *output* rounded back to the policy dtype.

    Under f32 this is exactly ``jnp.dot(x, w, preferred_element_type=f32)``
    (reference numerics).  Under bf16 it makes the activations between
    layers bf16-resident: the (B*K, H) tensors the scorer passes from GEMM
    to GEMM halve their HBM read/write traffic, and — because cotangent
    dtype follows the primal — the backward's transpose GEMMs get bf16
    cotangents for free.  Accumulation stays f32 inside the MXU; the one
    rounding per layer output is standard mixed-precision practice
    (convergence pinned by test_debug_policy).
    """
    xc, wc = cast_in(x, w)
    return jnp.dot(xc, wc,
                   preferred_element_type=jnp.float32).astype(_compute_dtype)


def auto_layout_jit_kwargs(n_rest: int, default_on: bool = True) -> dict:
    """jit kwargs that let XLA pick the donated train-state's memory layouts.

    By default a jitted program gets row-major entry layouts for its
    arguments, and any operand the compiled program wants tiled differently
    (e.g. the GRU weight matrices, whose MXU-friendly layout is
    kernel-interleaved) pays a relayout copy inside every step.  With
    ``Layout.AUTO`` on the *donated* state argument and on the state output,
    XLA chooses the entry layouts itself and the state circulates step to
    step already in its preferred form — the per-step ``copy`` fusions for
    params/Adam moments disappear (measured +14% on MutanNoAtt pretraining
    at B=512 bf16).  Loop-invariant operands (features, batches, caches)
    keep default layouts so host-built arrays never relayout per call.

    Returns ``{"in_shardings": (AUTO, None * n_rest), "out_shardings":
    (AUTO, None)}`` for a step of signature ``(state, *rest) -> (state,
    metrics)``, or ``{}`` when disabled (``VQACX_AUTO_LAYOUT=0``), on
    multi-device runs (mesh shardings own the layout story there), or when
    the layout API is unavailable.

    ``default_on=False`` callers (the CX engine) keep AUTO off unless
    ``VQACX_AUTO_LAYOUT=1`` forces it: with the z cache + fused head the
    CX step measured layout-neutral (209.0k vs 208.5k same-session
    2026-08-18), and an AUTO step's outputs are a hazard for the plain
    jits it shares state with — see :func:`dispatch_safe`.
    """
    env = os.environ.get("VQACX_AUTO_LAYOUT")
    if env == "0":
        return {}
    import jax

    if env != "1":
        if not default_on or jax.device_count() != 1:
            return {}
    try:
        from jax.experimental.layout import Format, Layout
    except ImportError:
        return {}
    auto = Format(Layout.AUTO)
    return {"in_shardings": (auto,) + (None,) * n_rest,
            "out_shardings": (auto, None)}


def dispatch_safe(tree, default_on: bool = True):
    """Params safe to pass into NON-AUTO jits after AUTO-layout training.

    The outputs of an AUTO-layout train step carry XLA-chosen memory
    layouts, but a consumer jitted WITHOUT layout specs assumes default
    entry layouts for uncommitted arguments — and the runtime rejects the
    mismatch at EXECUTION time with a bare ``INVALID_ARGUMENT`` (observed
    2026-08-18: MutanNoAtt bf16 eval after 3 AUTO train steps, and the CX
    eval after fused-head training; CPU tests run with AUTO disabled and
    cannot catch it).  A host round-trip re-materializes every leaf in
    its default layout, uncommitted.  No-op whenever AUTO layouts are
    off, so it costs nothing in the default CX configuration; pass the
    same ``default_on`` the matching trainer used.
    """
    if not auto_layout_jit_kwargs(0, default_on=default_on):
        return tree
    import jax
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x)), tree)
