"""CX training/eval engine: fully-jitted steps over a device-resident
feature matrix.

Replaces the reference hot loop (``counterexamples.py:314-361``) whose per-batch
work is: host numpy fancy-indexing of 25 feature rows per example, a
B x 25 x 2048 H2D copy, a Python loop over 24 candidates, loss, backward, Adam.
Here one ``jax.jit``-compiled function does: on-device gather from the
HBM-resident feature matrix, the batched forward (ops/scorer.py), masked CE
loss, grads, Adam — no host round-trips; metrics come back as 3 scalars.

Parallelism: with a multi-device mesh the same step is jitted with the batch
sharded over the 'data' axis and params/features replicated; XLA inserts the
gradient all-reduce over ICI (the TPU-native ``nn.DataParallel``).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import policy
from ..core import rng as rng_lib
from ..data import vqacx
from ..ops.chunking import row_slice as _row_slice
from ..ops.chunking import windows as _windows
from ..ops.metrics import recall_at_k


class CXTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def frozen_param_keys(model) -> tuple:
    """Top-level param-tree keys held frozen during CX training.

    The reference hands ``cx_model.parameters()`` to torch Adam
    (``counterexamples.py:275-276``) but the frozen VQA submodule's params
    have ``requires_grad=False`` (``cx.py:80``), so torch computes no grads
    and allocates no optimizer state for them.  Here the train step
    partitions the tree on these keys: grads, Adam moments and the update
    touch only the trainable subtree; the frozen subtree rides through the
    donated state buffer untouched (XLA aliases it — zero HBM traffic,
    vs ~2ms/step of zero-grad + moment churn for the ~40M frozen params).
    """
    if getattr(model, "trainable_vqa", True):
        return ()
    return ("vqa_model",)


def split_params(params: dict, frozen_keys: tuple):
    trainable = {k: v for k, v in params.items() if k not in frozen_keys}
    frozen = {k: v for k, v in params.items() if k in frozen_keys}
    return trainable, frozen


def init_cx_state(model, optimizer, example_batch: dict, features,
                  seed: int = 42, extra_apply_args: tuple = ()) -> CXTrainState:
    """Initialize params from one example batch (shapes only matter).

    Init traces a full forward, but parameter shapes (and values — they
    depend only on the RNG keys and the non-batch dims) are independent of
    batch size, so the trace runs on at most 8 rows: at B=768 the init
    program's compile cost 130-520 s per run through this runtime's remote
    compile service (soak runs 2026-08-19) for a program that executes once.
    """
    rows = min(8, len(example_batch["image_idxs"]))
    # pull the 8 sample rows to the host: the init forward runs eagerly on
    # the CPU backend (host_init_scope) — flax jits init, and the remote
    # compile of a once-executed program measured 88-520 s on this runtime
    idx = np.asarray(example_batch["image_idxs"][:rows])
    image_features = np.asarray(features)[idx] if isinstance(
        features, np.ndarray) else np.asarray(
            jnp.asarray(features)[jnp.asarray(idx)])
    host_extra = jax.tree_util.tree_map(np.asarray, extra_apply_args)
    with policy.host_init_scope():
        key = jax.random.key(seed)
        k_param, k_drop, k_lesion = jax.random.split(key, 3)
        variables = model.init(
            {"params": k_param, "dropout": k_drop, "lesion": k_lesion},
            jnp.asarray(image_features),
            jnp.asarray(np.asarray(example_batch["question_wids"][:rows])),
            jnp.asarray(np.asarray(example_batch["answer_aids"][:rows])),
            *host_extra,
            deterministic=True)
    # transfer WITHOUT committing (no explicit device): committed inputs
    # change the jit dispatch key and the program's sharding annotations,
    # which turned every downstream precompute/train program into a fresh
    # remote compile (A/B 2026-08-19: cache 97.8 s vs 7.4 s, train 22.1k
    # vs 599.8k ex/s on identical param values)
    params = policy.device_put_contiguous(variables.get("params", {}))
    trainable, _ = split_params(params, frozen_param_keys(model))
    opt_state = optimizer.init(trainable) if optimizer is not None else None
    return CXTrainState(params=params, opt_state=opt_state,
                        step=jnp.zeros((), jnp.int32))


def precompute_q_emb(model, params, question_wids, batch_size: int = 4096,
                     stats: dict | None = None):
    """Encode every question once through the frozen VQA encoder.

    With ``trainable_vqa=False`` the encoder runs in eval mode
    (reference cx.py:59-60), so its output for a given question is a
    constant of training — the per-step 26-timestep GRU is loop-invariant
    and can be hoisted out of the epoch loop entirely.  Returns an (N, dim_q)
    device array indexed by ``batch["example_idxs"]``; activations are
    bitwise what the in-step encoder would produce.  (The reference explored
    exactly this precomputed-activation cache in ``cache.ipynb``.)
    """
    import numpy as np

    wids = np.asarray(question_wids)
    n = wids.shape[0]
    chunk = min(batch_size, n)

    # params enter as an argument, not a closure: closed-over params become
    # compile-time constants, which bloats persistent-cache entries with the
    # full weight tables and slows compilation
    @jax.jit
    def encode(params, w):
        return model.apply(
            {"params": params}, w,
            method=lambda m, w: m.vqa_model.encode_question(w, True))

    outs = []
    _stat_start(stats)
    for i, (s, off) in enumerate(_windows(n, chunk)):
        out = encode(params, jnp.asarray(wids[s:s + chunk]))[off:]
        _chunk_stat(stats, i, out)
        outs.append(out)
    return jnp.concatenate(outs, axis=0)


def _stat_start(stats):
    if stats is not None:
        stats["_t0"] = time.time()


def _chunk_stat(stats, i, out):
    """Record first-chunk wall time (trace + compile + first dispatch,
    measured from the ``_stat_start`` mark) vs chunk count, so callers can
    decompose a cache build into compile overhead vs steady compute without
    a second (memory-doubling) warm rebuild (VERDICT r4 #4).  Costs one
    extra device sync on the first chunk."""
    if stats is None:
        return
    if i == 0:
        jax.block_until_ready(out)
        stats["first_chunk_s"] = time.time() - stats.pop("_t0")
    stats["n_chunks"] = i + 1


def precompute_v_proj(model, params, features, batch_size: int = 8192,
                      stats: dict | None = None):
    """Project every image's features through the frozen fusion v-side once.

    The MUTAN v-side (dropout -> linear_v -> tanh -> w_hv) is a pure function
    of the image when the backbone is frozen, and it is the dominant
    frozen-backbone FLOPs in the CX step (2 GEMMs over B*(K+1) candidate
    rows per step).  Precomputing it per *image* — there are ~83k distinct
    images vs ~200k examples x 25 candidates per epoch — turns the per-step
    fusion into a gather + rank-wise multiply-sum.  Returns an
    (n_images, R, dim_mm) device array (MUTAN; pre-tiled so the per-step
    gather lands in the rank multiply-sum's layout — no per-row retile
    copy) aligned with the feature-matrix row order (gathered by
    ``batch['image_idxs']``); activations are bitwise what
    the in-step fusion would produce.  ~1.2 GB f32 for COCO train at
    reference dims (R=10, dim_mm=360) — comfortably HBM-resident next to the
    680 MB feature matrix.
    """
    # one transfer up front: a host numpy matrix fed straight into the
    # jitted windows would re-upload the FULL table per dispatch
    feats = jnp.asarray(features)
    n = feats.shape[0]
    chunk = min(batch_size, n)

    # params as an argument, not a closure (see precompute_q_emb)
    @jax.jit
    def project(params, v):
        return model.apply(
            {"params": params}, v,
            method=lambda m, v: m.vqa_model.project_image(v, True))

    outs = []
    _stat_start(stats)
    for i, (s, off) in enumerate(_windows(n, chunk)):
        # dynamic_slice with a TRACED start: ``feats[s:s+chunk]`` would be
        # a static lax.slice — a distinct program per start offset, each
        # paying a multi-second remote compile on this runtime (the v build
        # measured 154 s for 11 chunks, 2026-08-19 profile)
        block = _row_slice(feats, jnp.int32(s), chunk)
        out = project(params, block)[off:]
        _chunk_stat(stats, i, out)
        outs.append(out)
    return jnp.concatenate(outs, axis=0)


# z tables past this accumulate IN PLACE on device: donated
# dynamic_update_slice writes into a preallocated final-dtype buffer.  The
# small-table path's chunk list + concatenate would hold ~2x the f32 table
# transiently (15.6 GB at VQA2-CX train scale — past a 16 GB chip), and the
# round-2 fix (accumulate on host, upload once) turned out catastrophically
# slow through a tunneled chip: the 3.6 GB bf16 table took 422 s of D2H at
# ~9 MB/s against ~2 s of fuse compute (soak run 2026-08-19).
Z_DEVICE_ACCUM_BYTES = 2 << 30


@functools.partial(jax.jit, donate_argnums=(0,))
def _accum_write(table, chunk, start):
    """In-place (donated) row-block write at a traced start index."""
    return jax.lax.dynamic_update_slice(
        table, chunk.astype(table.dtype),
        (start,) + (0,) * (chunk.ndim - 1))




def precompute_z_emb(model, params, features, image_idxs, q_table,
                     v_table=None, batch_size: int = 2048,
                     out_dtype=None, stats: dict | None = None):
    """Fuse every (example, candidate) pair through the frozen backbone once.

    The q_emb/v_proj caching logic taken to its conclusion: with the VQA
    backbone frozen, the whole MUTAN fusion output ``z`` is a training
    constant per (question, image) pair, so the per-step fusion — the
    (B*(K+1), R, dim_mm) v_proj gather plus the rank multiply-sum, together
    ~15% of the B=512 device step (xplane 2026-08-18) — collapses to one
    (B, K+1, dim_mm) row gather.  Returns an (n_examples, K+1, dim_mm)
    device array aligned with example order (gathered by
    ``batch['example_idxs']``); activations are bitwise what the in-step
    fusion would produce (tests/test_z_cache.py).

    Scale note: at VQA2-CX train scale (~215k examples x 25 x 360) the
    table is ~7.7 GB f32 / 3.9 GB bf16 — device-resident next to the
    680 MB feature matrix on a 16 GB chip, bf16 recommended (the bench
    stores it bf16 under the policy like the other tables).

    ``image_idxs``: (N, K+1) int array (``CXArrays.image_idxs``).
    ``v_table``: optional precomputed v-projections to build from (faster);
    otherwise the fusion v-side runs here once per pair.
    ``out_dtype``: cast each chunk to this dtype before accumulating
    (elementwise-identical to casting the finished table — the way the
    bench stores it bf16 — but never materializes the f32 table).

    Tables past ~2 GB accumulate IN PLACE on device (donated
    ``dynamic_update_slice`` into a preallocated final-dtype buffer), so
    neither the 2x-table concatenate transient (15.6 GB f32 at VQA2-CX
    train scale) nor a host round-trip ever exists — the round-2
    host-accumulate variant cost 422 s of ~9 MB/s tunneled D2H for the
    3.6 GB bf16 table against ~2 s of fuse compute (soak 2026-08-19).
    """
    idxs = np.asarray(image_idxs)
    n = idxs.shape[0]
    chunk = min(batch_size, n)
    # one transfer up front (host inputs would re-upload per window)
    q_table = jnp.asarray(q_table)
    if v_table is None:
        features = jnp.asarray(features)
    else:
        v_table = jnp.asarray(v_table)
    big = None  # decided from the first chunk's shape/dtype
    accum = None

    # params as an argument, not a closure (see precompute_q_emb)
    @jax.jit
    def fuse(params, image_feats, q_rows, v_rows):
        return model.apply(
            {"params": params}, image_feats, q_rows,
            method=lambda m, v, q: m.vqa_model.fuse_candidates(
                v, q, True, v_proj=v_rows))

    outs = []
    _stat_start(stats)
    for i, (s, off) in enumerate(_windows(n, chunk)):
        bidx = jnp.asarray(idxs[s:s + chunk])
        # traced-start dynamic_slice: a static q_table[s:s+chunk] would be
        # a distinct program per offset (see precompute_v_proj)
        q_rows = _row_slice(q_table, jnp.int32(s), chunk)
        v_rows = (jnp.take(v_table, bidx, axis=0, mode="clip")
                  if v_table is not None else None)
        # fuse_candidates ignores input_v entirely when v_proj is given —
        # skip the (chunk*(K+1), dim_v) feature gather (~420 MB/chunk)
        image_feats = (None if v_table is not None
                       else jnp.take(features, bidx, axis=0, mode="clip"))
        out = fuse(params, image_feats, q_rows, v_rows)
        if out_dtype is not None:
            out = out.astype(out_dtype)
        if big is None:
            per_row = out.dtype.itemsize * int(np.prod(out.shape[1:]))
            big = n * per_row > Z_DEVICE_ACCUM_BYTES
            if big:
                accum = jnp.zeros((n,) + out.shape[1:], out.dtype)
        if big:
            # full-window write at the window start: the tail window
            # overlaps the previous one, rewriting those rows with
            # identical values (same inputs) — idempotent
            accum = _accum_write(accum, out, jnp.int32(s))
        else:
            outs.append(out[off:])
        # stat on the accumulated value so the big path's _accum_write
        # compile lands in the first chunk's time too
        _chunk_stat(stats, i, accum if big else out)
    if big:
        return as_row_major(accum)
    return as_row_major(jnp.concatenate(outs, axis=0))


def _canonical_m2m(shape, dtype):
    """major_to_minor of the backend's DEFAULT layout for (shape, dtype).

    Queried from PJRT (``client.get_default_layout`` — returns the XLA
    string form ``{0,2,1:T(8,128)(2,1)}`` whose braces list minor-to-major).
    On this TPU runtime the canonical layout of an (N, K, D) table is NOT
    row-major — e.g. {0,2,1}, i.e. major_to_minor (1, 2, 0) — and
    ``jnp.zeros``, ``device_put`` from host, and jit outputs all agree on
    it; comparing against literal row-major would call every one of them
    "wrong" and trigger useless multi-GB re-pins (measured 2026-08-19:
    91 s for the 1 GB q table, ~400 s for the 3.6 GB z table, all through
    a ~9 MB/s tunnel, all no-ops).
    """
    try:
        dev = jax.devices()[0]
        s = str(dev.client.get_default_layout(np.dtype(dtype), tuple(shape),
                                              dev))
        mtm = s.split("{", 1)[1].split(":", 1)[0].rstrip("}")
        minor_to_major = tuple(int(v) for v in mtm.split(",") if v.strip())
        if len(minor_to_major) == len(shape):
            return tuple(reversed(minor_to_major))
    except Exception:
        pass
    return tuple(range(len(shape)))


def as_row_major(arr):
    """Return ``arr`` in the backend's CANONICAL layout, **uncommitted**.

    A z-table whose layout differs from the canonical one makes XLA
    relayout the ENTIRE table once per step inside the train program
    (round-2 xplane: a (N, K+1, dim_mm) copy at 0.08 ms/step for N=2048,
    scaling with N).  Pinning the layout with an explicit ``Format``
    device_put would fix that but *commits* the array — and one committed
    operand poisons every output of the AUTO-layout train step (outputs of
    a computation with a committed input are committed), which ``jax.jit``
    rejects on re-entry under ``Layout.AUTO`` ("argument passed is a
    `jax.Array` with a concrete layout").  So: verify against the queried
    canonical layout (NOT literal row-major — see ``_canonical_m2m``),
    re-pin on device when needed, host round-trip as the last resort.
    Callers that cast the table afterwards should re-apply this (the cast
    is free to pick another layout).
    """
    target = _canonical_m2m(arr.shape, arr.dtype)

    def _ok(a):
        try:
            m2m = tuple(a.format.layout.major_to_minor)
        except Exception:  # backends without layout introspection
            return True
        return m2m == target and not getattr(a, "committed", False)

    if _ok(arr):
        return arr
    # device-side re-pin first: copy into a freshly allocated buffer and
    # verify by introspection that it landed canonical.  At multi-GB table
    # sizes the host round-trip below costs minutes through a tunneled chip
    # (~9 MB/s D2H measured 2026-08-19); the copy costs one on-device pass.
    # Introspection keeps this safe: if the copy output still differs,
    # fall back to the proven host path.
    try:
        out = _accum_write(jnp.zeros(arr.shape, arr.dtype), arr,
                           jnp.int32(0))
        if _ok(out):
            return out
    except Exception:
        pass
    return jax.device_put(np.asarray(arr))


def cache_kwargs(batch, q_table, v_table, z_table=None) -> dict:
    """Model kwargs for the frozen-backbone caches: ``q_table``/``z_table``
    rows are per example (``batch['example_idxs']``), ``v_table`` rows per
    image (``batch['image_idxs']``)."""
    kw = {}
    if q_table is not None:
        kw["q_emb"] = jnp.take(q_table, batch["example_idxs"], axis=0,
                                mode="clip")
    if v_table is not None:
        kw["v_proj"] = jnp.take(v_table, batch["image_idxs"], axis=0,
                                 mode="clip")
    if z_table is not None:
        kw["z_emb"] = jnp.take(z_table, batch["example_idxs"], axis=0,
                                mode="clip")
    return kw


def build_frozen_caches(model, params, features, arrays, *,
                        use_q: bool = True, use_v: bool = False,
                        use_z: bool = True, v_build_aid: bool = True,
                        q_batch_size: int = 2048, z_batch_size: int = 2048,
                        z_out_dtype=None):
    """Build the frozen-backbone cache tables in dependency order.

    One place for the recipe the single-dataset cache consumers (bench,
    full-scale soak, E2E pipeline) must agree on (the counterexamples CLI
    keeps its own two-dataset variant with per-cache fallbacks):

    - build order q -> v -> z (z consumes both);
    - ``v_build_aid``: build the per-image v-projection as an intermediate
      for the z build even when it is NOT kept for the step (it turns the
      z build's per-pair fusion v-side into a gather);
    - **z subsumes v**: when the z cache is on, the step never reads
      ``v_table`` — it was only the build aid and is dropped so its
      ~1.2 GB (at COCO scale) is freed;
    - ``z_out_dtype``: emitted chunk-by-chunk into a preallocated buffer of
      this dtype (bf16 at full scale — the f32 table never exists).

    Returns ``(q_table, v_table, z_table, stage_s)`` where ``stage_s`` maps
    stage name -> hard-synced build seconds.  Cast the results bf16-resident
    with :func:`make_tables_bf16_resident`.
    """
    from ..core.profiler import hard_sync

    stage_s = {}
    q_table = v_table = z_table = None
    if use_q:
        t, st = time.time(), {}
        q_table = precompute_q_emb(model, params, arrays.question_wids,
                                   batch_size=q_batch_size, stats=st)
        hard_sync(q_table)
        stage_s["q"] = time.time() - t
        _stage_chunk_stats(stage_s, "q", st)
    if use_v or (use_z and v_build_aid):
        t, st = time.time(), {}
        v_table = precompute_v_proj(model, params, features, stats=st)
        hard_sync(v_table)
        stage_s["v"] = time.time() - t
        _stage_chunk_stats(stage_s, "v", st)
    if use_z:
        t, st = time.time(), {}
        z_table = precompute_z_emb(model, params, features,
                                   arrays.image_idxs, q_table,
                                   v_table=v_table,
                                   batch_size=z_batch_size,
                                   out_dtype=z_out_dtype, stats=st)
        hard_sync(z_table)
        stage_s["z"] = time.time() - t
        _stage_chunk_stats(stage_s, "z", st)
        v_table = None  # z subsumes v in the step
    return q_table, v_table, z_table, stage_s


def _stage_chunk_stats(stage_s, name, st):
    """Fold one builder's chunk stats into ``stage_s``: the first chunk
    carries trace+compile+first-dispatch, the remaining chunks bound the
    steady compute rate, and the difference is this stage's one-time
    compile overhead — measured inside the build itself, with no
    memory-doubling warm rebuild (VERDICT r4 #4)."""
    if "first_chunk_s" not in st:
        return
    first, n = st["first_chunk_s"], st["n_chunks"]
    stage_s[name + "_first_chunk_s"] = first
    stage_s[name + "_chunks"] = n
    if n > 1:
        steady = (stage_s[name] - first) / (n - 1)
        stage_s[name + "_compile_overhead_s"] = max(0.0, first - steady)


def make_tables_bf16_resident(features, q_table=None, v_table=None,
                              z_table=None):
    """Cast the feature matrix + cache tables bf16 for residency.

    Under the bf16 GEMM policy the step casts its inputs to bf16 anyway, so
    storing them bf16 halves the gather traffic and deletes the per-step
    cast round-trips (measured 4.94 -> 3.82 ms/step at B=768).  The casts
    may re-tile, so the per-example tables (q/z — gathered every step by
    ``batch['example_idxs']``) are re-pinned canonical via
    :func:`as_row_major`; a no-op for tables already bf16 + canonical
    (e.g. a z table built with ``z_out_dtype=bfloat16``).

    Returns ``(features, q_table, v_table, z_table)``.
    """
    features = features.astype(jnp.bfloat16)
    if q_table is not None:
        q_table = as_row_major(q_table.astype(jnp.bfloat16))
    if v_table is not None:
        v_table = v_table.astype(jnp.bfloat16)
    if z_table is not None:
        z_table = as_row_major(z_table.astype(jnp.bfloat16))
    return features, q_table, v_table, z_table


def make_cx_train_step(model, optimizer, *, recall_k: int = 5,
                       base_seed: int = 42,
                       extra_apply_args: tuple = (),
                       use_q_cache: bool = False,
                       use_v_cache: bool = False,
                       use_z_cache: bool = False) -> Callable:
    """Returns jitted ``train_step(state, features, batch, n_valid)``.

    ``batch`` holds int32 arrays (image_idxs (B,K+1), question_wids (B,T),
    answer_aids (B,), comp_idxs (B,)); ``n_valid`` masks padded tail rows of
    the final short batch.  Loss = CE(scores, comp)/n_valid, matching the
    reference (counterexamples.py:333-334).

    With ``use_q_cache=True`` the step takes a trailing ``q_table`` argument
    (from :func:`precompute_q_emb`) and the model skips its question encoder;
    with ``use_v_cache=True`` it takes a further ``v_table`` argument (from
    :func:`precompute_v_proj`) and the model skips the fusion v-side GEMMs;
    with ``use_z_cache=True`` a further ``z_table`` (from
    :func:`precompute_z_emb`) replaces the in-step fusion entirely.
    Any cache is only valid when the VQA backbone is frozen.
    """
    body = _make_cx_step_body(model, optimizer, recall_k=recall_k,
                              base_seed=base_seed,
                              extra_apply_args=extra_apply_args,
                              use_q_cache=use_q_cache,
                              use_v_cache=use_v_cache,
                              use_z_cache=use_z_cache)

    # donate the state: params/opt-state buffers are reused in place, halving
    # the step's HBM allocation traffic; the frozen subtree (vqa_model with
    # trainable_vqa=False) is outside the grad/Adam path entirely and aliases
    # straight through the donated buffer
    # jit the full 7-arg signature (in_shardings must match the positional
    # arity exactly, so the optional cache tables are normalized to explicit
    # Nones in the thin wrapper below).  AUTO layouts are opt-in here
    # (VQACX_AUTO_LAYOUT=1): measured layout-neutral for this step since
    # the z cache + fused head (209.0k vs 208.5k), and an AUTO state is a
    # dispatch hazard for the plain-jit scan trainer / eval step it shares
    # params with (see policy.dispatch_safe)
    @functools.partial(jax.jit, donate_argnums=(0,),
                       **policy.auto_layout_jit_kwargs(6, default_on=False))
    def _step(state: CXTrainState, features, batch, n_valid,
              q_table, v_table, z_table):
        return body(state, features, batch, n_valid, q_table, v_table,
                    z_table)

    def train_step(state: CXTrainState, features, batch, n_valid,
                   q_table=None, v_table=None, z_table=None):
        return _step(state, features, batch, n_valid, q_table, v_table,
                     z_table)

    train_step.lower = (
        lambda state, features, batch, n_valid, q_table=None, v_table=None,
        z_table=None:
        _step.lower(state, features, batch, n_valid, q_table, v_table,
                    z_table))
    return train_step


def _make_cx_step_body(model, optimizer, *, recall_k: int, base_seed: int,
                       extra_apply_args: tuple, use_q_cache: bool,
                       use_v_cache: bool,
                       use_z_cache: bool = False) -> Callable:
    """Traceable (un-jitted) single train step shared by the per-step and
    scanned trainers."""
    root = rng_lib.root_key(base_seed)
    frozen_keys = frozen_param_keys(model)
    if ((use_q_cache or use_v_cache or use_z_cache)
            and getattr(model, "trainable_vqa", False)):
        raise ValueError(
            "q_emb/v_proj/z_emb caches require a frozen VQA backbone")
    # resolved at BUILD time, outside any jit trace (env-latched traces are
    # a known hazard — see ops/rnn.py:286): with the z cache on and the
    # fused image-feature kernel eligible, the model takes the feature
    # table + row indices and gathers K-major itself
    # (ops/pallas/vfeat_kernel.py) instead of the materialized
    # (B, K+1, dim_v) form
    pass_table = bool(use_z_cache
                      and getattr(model, "wants_table_features", None)
                      and model.wants_table_features())

    def step_body(state: CXTrainState, features, batch, n_valid,
                  q_table, v_table, z_table=None):
        keys = rng_lib.step_keys(root, state.step, ("dropout", "lesion"))
        batch_size = batch["comp_idxs"].shape[0]
        mask = jnp.arange(batch_size) < n_valid
        trainable, frozen = split_params(state.params, frozen_keys)
        q_kw = cache_kwargs(batch, q_table, v_table, z_table)

        def loss_fn(trainable):
            params = {**trainable, **frozen}
            if pass_table:
                image_features = None
                q_kw.update(features_table=features,
                            image_idxs=batch["image_idxs"])
            else:
                image_features = jnp.take(features, batch["image_idxs"],
                                          axis=0, mode="clip")
            scores = model.apply(
                {"params": params}, image_features, batch["question_wids"],
                batch["answer_aids"], *extra_apply_args,
                deterministic=False, rngs=keys, **q_kw)
            logp = jax.nn.log_softmax(scores, axis=-1)
            nll = -jnp.take_along_axis(
                logp, batch["comp_idxs"][:, None].astype(jnp.int32),
                axis=-1)[:, 0]
            loss = jnp.sum(nll * mask) / n_valid
            return loss, scores

        (loss, scores), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  trainable)
        new_params = {**optax.apply_updates(trainable, updates), **frozen}
        k = min(recall_k, scores.shape[-1])
        correct = jnp.sum(recall_at_k(scores, batch["comp_idxs"], k=k) * mask)
        new_state = CXTrainState(new_params, new_opt_state, state.step + 1)
        return new_state, {"loss": loss, "correct": correct,
                           "n": n_valid.astype(jnp.float32)}

    return step_body


def make_cx_train_scan(model, optimizer, *, recall_k: int = 5,
                       base_seed: int = 42,
                       extra_apply_args: tuple = (),
                       use_q_cache: bool = False,
                       use_v_cache: bool = False,
                       use_z_cache: bool = False) -> Callable:
    """Multi-step trainer: ``train_scan(state, features, batches, n_valids
    [, q_table[, v_table[, z_table]]])`` runs S train steps in ONE dispatch.

    ``batches`` is the per-step batch dict with a leading step axis S on
    every array; ``n_valids`` is (S,) f32.  Numerically identical to S
    sequential :func:`make_cx_train_step` calls — the per-step dropout and
    lesion keys fold on ``state.step``, which increments through the scan
    carry.  Metrics come back stacked, one row per step.

    Why it exists: batch int arrays are tiny (~80 KB per step), so an
    epoch's indices sit on device and a whole epoch can run as a handful of
    dispatches — the right shape when per-dispatch latency dominates (e.g.
    a remote runtime).  Measured on the tunneled v5e at B=384 it is a net
    LOSS for the headline workload (119.2k vs 128.8k examples/sec,
    2026-08-17): the scan carries trainable params + Adam state through the
    loop at ~0.17 ms/step of device overhead (xplane: 2.57 vs 2.40 ms/step)
    while sequential async dispatch already hides most host latency.  The
    bench therefore keeps one-step dispatches by default
    (VQACX_BENCH_SCAN=1 opts in).
    """
    body = _make_cx_step_body(model, optimizer, recall_k=recall_k,
                              base_seed=base_seed,
                              extra_apply_args=extra_apply_args,
                              use_q_cache=use_q_cache,
                              use_v_cache=use_v_cache,
                              use_z_cache=use_z_cache)
    frozen_keys = frozen_param_keys(model)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_scan(state: CXTrainState, features, batches, n_valids,
                   q_table=None, v_table=None, z_table=None):
        # carry only what the step actually updates: the frozen VQA subtree
        # (~150 MB at reference dims) rides as a loop-invariant operand, not
        # a scan carry — XLA copies carries it cannot alias
        trainable, frozen = split_params(state.params, frozen_keys)

        def f(carry, xs):
            tr, opt_state, step = carry
            batch, n_valid = xs
            st = CXTrainState({**tr, **frozen}, opt_state, step)
            new_state, metrics = body(st, features, batch, n_valid,
                                      q_table, v_table, z_table)
            new_tr, _ = split_params(new_state.params, frozen_keys)
            return (new_tr, new_state.opt_state, new_state.step), metrics

        (tr, opt_state, step), metrics = jax.lax.scan(
            f, (trainable, state.opt_state, state.step),
            (batches, n_valids))
        return CXTrainState({**tr, **frozen}, opt_state, step), metrics

    return train_scan


def stack_batches(batches: list) -> dict:
    """Stack a list of batch dicts into one leading-step-axis dict for
    :func:`make_cx_train_scan`."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def make_cx_eval_step(model, *, recall_k: int = 5, base_seed: int = 123,
                      extra_apply_args: tuple = (),
                      use_q_cache: bool = False,
                      use_v_cache: bool = False,
                      use_z_cache: bool = False) -> Callable:
    """Jitted eval: summed CE loss + recall@K counts, masked for padding.
    The 'lesion' stream stays live in eval — the reference draws torch.rand
    placeholders regardless of mode (cx.py:266-307).  With
    ``use_q_cache=True`` takes a trailing ``q_table`` argument
    (see :func:`precompute_q_emb`); with ``use_v_cache=True`` a further
    ``v_table`` (see :func:`precompute_v_proj`)."""
    root = rng_lib.root_key(base_seed)
    # build-time resolution, mirroring _make_cx_step_body (the kernel's
    # forward also serves eval — same numerics, deterministic)
    pass_table = bool(use_z_cache
                      and getattr(model, "wants_table_features", None)
                      and model.wants_table_features())

    @jax.jit
    def eval_step(params, features, batch, n_valid, step, q_table=None,
                  v_table=None, z_table=None):
        keys = rng_lib.step_keys(root, step, ("lesion",))
        batch_size = batch["comp_idxs"].shape[0]
        mask = jnp.arange(batch_size) < n_valid
        q_kw = cache_kwargs(batch, q_table, v_table, z_table)
        if pass_table:
            image_features = None
            q_kw.update(features_table=features,
                        image_idxs=batch["image_idxs"])
        else:
            image_features = jnp.take(features, batch["image_idxs"], axis=0)
        scores = model.apply(
            {"params": params}, image_features, batch["question_wids"],
            batch["answer_aids"], *extra_apply_args,
            deterministic=True, rngs=keys, **q_kw)
        logp = jax.nn.log_softmax(scores, axis=-1)
        nll = -jnp.take_along_axis(
            logp, batch["comp_idxs"][:, None].astype(jnp.int32), axis=-1)[:, 0]
        k = min(recall_k, scores.shape[-1])
        hits = recall_at_k(scores, batch["comp_idxs"], k=k)
        hits1 = recall_at_k(scores, batch["comp_idxs"], k=1)
        return {"loss_sum": jnp.sum(nll * mask),
                "correct": jnp.sum(hits * mask),
                "correct1": jnp.sum(hits1 * mask)}

    return eval_step


def _mesh_ctx(mesh):
    import contextlib

    return jax.set_mesh(mesh) if mesh is not None \
        else contextlib.nullcontext()


def _maybe_shard(batch, mesh):
    if mesh is None:
        return batch
    from ..parallel.sharding import shard_batch

    return shard_batch(batch, mesh)


def _cache_extras(q_table, v_table, z_table=None):
    """Positional trailing args for steps built with use_{q,v,z}_cache."""
    if z_table is not None:
        return (q_table, v_table, z_table)
    if v_table is not None:
        return (q_table, v_table)
    if q_table is not None:
        return (q_table,)
    return ()


def eval_model(eval_step, params, features, arrays: vqacx.CXArrays,
               batch_size: int, *, pairwise: bool = False,
               pairwise_eval_step=None, rng=None, mesh=None,
               q_table=None, v_table=None, z_table=None) -> dict:
    """Full-dataset eval (reference eval_model, counterexamples.py:450-490):
    returns {'loss', 'recall'} (+ recall@1; + pairwise metrics if requested).
    ``q_table``: precomputed encoder table for ``arrays`` (requires an
    eval_step built with use_q_cache=True); ``v_table``: precomputed fusion
    v-projections for ``features`` (use_v_cache=True); ``z_table``:
    precomputed fused embeddings for ``arrays`` (use_z_cache=True)."""
    # keep dispatch asynchronous: collect device scalars, sync once at the
    # end (a per-batch float() costs a full host round-trip per batch)
    params = policy.dispatch_safe(params, default_on=False)
    extra = _cache_extras(q_table, v_table, z_table)
    outs = []
    n_total = 0
    step = 0
    for idx, n_valid in vqacx.batch_indices(arrays.size, batch_size,
                                            shuffle=False):
        batch = _maybe_shard(vqacx.gather_batch(arrays, idx), mesh)
        with _mesh_ctx(mesh):
            outs.append(eval_step(params, features, batch,
                                  jnp.asarray(n_valid, jnp.float32),
                                  jnp.asarray(step, jnp.int32), *extra))
        n_total += n_valid
        step += 1
    totals = {key: float(sum(out[key] for out in outs))
              for key in ("loss_sum", "correct", "correct1")}
    results = {"loss": totals["loss_sum"] / n_total,
               "recall": totals["correct"] / n_total,
               "recall_1": totals["correct1"] / n_total}

    if pairwise:
        assert pairwise_eval_step is not None
        pw = arrays.pairwise_view(rng or np.random.default_rng(123))
        ptot = {"loss_sum": 0.0, "correct": 0.0}
        step = 0
        for idx, n_valid in vqacx.batch_indices(pw.size, batch_size,
                                                shuffle=False):
            batch = vqacx.gather_batch(pw, idx)
            out = pairwise_eval_step(params, features, batch,
                                     jnp.asarray(n_valid, jnp.float32),
                                     jnp.asarray(step, jnp.int32))
            ptot["loss_sum"] += float(out["loss_sum"])
            ptot["correct"] += float(out["correct1"])
            step += 1
        results["loss_pairwise"] = ptot["loss_sum"] / n_total
        results["acc_pairwise"] = ptot["correct"] / n_total
    return results


def train_epoch(train_step, state: CXTrainState, features,
                arrays: vqacx.CXArrays, batch_size: int, *,
                pairwise: bool = False, rng=None,
                log_fn=None, print_freq: int = 100,
                eval_fn=None, eval_freq: int = -1, mesh=None,
                q_table=None, v_table=None, z_table=None,
                scan_step=None, scan_len: int = 0):
    """One epoch over shuffled batches (reference counterexamples.py:312-361).

    ``log_fn(step_in_epoch, metrics)`` fires every print_freq batches;
    ``eval_fn()`` fires every eval_freq batches and at epoch end, and its last
    result is returned (reference semantics: info.append(eval_results)).
    ``q_table``: precomputed encoder table (requires a train_step built with
    use_q_cache=True; valid for pairwise views too — they resample the
    candidate triple per epoch but keep row i = example i, so
    ``example_idxs`` still index the table).  ``v_table``: precomputed
    fusion v-projections (use_v_cache=True; indexed by image).
    ``z_table``: precomputed fused embeddings (use_z_cache=True; indexed by
    example — NOT valid for pairwise views, which resample the candidate
    triple per epoch).

    ``scan_step``/``scan_len``: a :func:`make_cx_train_scan` trainer (built
    with the same cache flags); full groups of ``scan_len`` batches run as
    ONE device dispatch, the remainder falls back to ``train_step``.
    Numerically identical to sequential steps (tests/test_cx_scan.py); the
    win is per-dispatch latency amortization (+2% on the tunneled v5e at
    scan_len=50, more on higher-latency runtimes).  Logging/eval fire at
    group boundaries.  Ignored under a mesh."""
    rng = rng or np.random.default_rng()
    if pairwise and z_table is not None:
        raise ValueError("z_table rows are per fixed candidate list; "
                         "pairwise views resample candidates per epoch")
    view = arrays.pairwise_view(rng) if pairwise else arrays
    extra = _cache_extras(q_table, v_table, z_table)
    n_batches = (view.size + batch_size - 1) // batch_size
    eval_results = None
    t0 = time.time()
    n_seen = 0
    use_scan = scan_step is not None and scan_len > 1 and mesh is None
    if use_scan and policy.auto_layout_jit_kwargs(0, default_on=False):
        # forced AUTO layouts (VQACX_AUTO_LAYOUT=1) are incompatible with
        # mixing the AUTO per-step trainer and the plain-jit scan trainer
        # over one state (see policy.dispatch_safe) — steps win
        print("=> scan trainer disabled: VQACX_AUTO_LAYOUT=1 state cannot "
              "also feed the plain-jit scan trainer")
        use_scan = False
    pending = []  # (batch, n_valid) buffered for the next scan dispatch

    def fire_hooks(b, metrics, n_valid):
        nonlocal eval_results
        if log_fn is not None and b % print_freq == 0:
            m = {"loss": float(metrics["loss"]),
                 "recall": float(metrics["correct"]) / n_valid,
                 "examples_per_sec": n_seen / (time.time() - t0)}
            log_fn(b, m)
        if eval_fn is not None and ((eval_freq > 0 and b % eval_freq == 0)
                                    or b == n_batches):
            eval_results = eval_fn(state)

    for b, (idx, n_valid) in enumerate(
            vqacx.batch_indices(view.size, batch_size, shuffle=True, rng=rng),
            start=1):
        batch = _maybe_shard(vqacx.gather_batch(view, idx), mesh)
        if use_scan:
            pending.append((batch, n_valid))
            n_seen += n_valid
            if len(pending) < scan_len and b < n_batches:
                continue
            if len(pending) == scan_len:
                stacked = stack_batches([p[0] for p in pending])
                n_valids = jnp.asarray([p[1] for p in pending], jnp.float32)
                state, ms = scan_step(state, features, stacked, n_valids,
                                      *extra)
                metrics = {k: v[-1] for k, v in ms.items()}
            else:  # final short group: sequential steps
                for pbatch, pnv in pending:
                    state, metrics = train_step(
                        state, features, pbatch,
                        jnp.asarray(pnv, jnp.float32), *extra)
            pending = []
            fire_hooks(b, metrics, n_valid)
            continue
        with _mesh_ctx(mesh):
            state, metrics = train_step(state, features, batch,
                                        jnp.asarray(n_valid, jnp.float32),
                                        *extra)
        n_seen += n_valid
        fire_hooks(b, metrics, n_valid)
    return state, eval_results
