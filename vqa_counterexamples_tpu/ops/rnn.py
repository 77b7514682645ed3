"""Recurrent cells as `lax.scan` loops with one fused input GEMM.

TPU-first layout: the input projection for *all* timesteps is a single
(B*T, D) x (D, 3H|4H) GEMM done outside the scan; the scan body only carries
the (B, H) recurrent GEMM, so the MXU sees two large matmuls instead of
T small ones.  Sequences are fixed-length (26 tokens, reference
``options/*/default.yaml maxlength: 26``) with zero-padding; the final state is
gathered at index ``length-1`` exactly like the reference ``select_last``
(``vqa/models/seq2vec.py:16-25``).

GRU convention (matches torch.nn.GRU and the skip-thoughts.torch BayesianGRU
used by the reference, ``seq2vec.py:6-8,80-85``):

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh  (W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h

"Bayesian" (variational) dropout = one dropout mask per sequence shared across
timesteps, applied to the cell inputs/state before the projections.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng as rng_lib


def process_lengths(wids: jax.Array) -> jax.Array:
    """Length = maxlength - (#zero tokens); reference seq2vec.py:11-14."""
    max_length = wids.shape[1]
    return max_length - jnp.sum(wids == 0, axis=1)


def _length_onehot(lengths: jax.Array, max_length: int) -> jax.Array:
    idx = jnp.clip(lengths - 1, 0, max_length - 1).astype(jnp.int32)
    return jax.nn.one_hot(idx, max_length, dtype=jnp.float32)


def select_last(states: jax.Array, lengths: jax.Array) -> jax.Array:
    """Gather hidden state at timestep ``length-1``; reference seq2vec.py:16-25.

    Formulated as a one-hot contraction over the (short) time axis rather
    than ``take_along_axis``: the per-example gather — and its scatter-add
    transpose — lower to B tiny dynamic-slice ops on TPU (~1.3 ms/step of
    (1, 1, H) micro-work at B=512 in the VQA train step, xplane-measured);
    the one-hot einsum is one dense (B,T) x (B,T,H) contraction and its
    backward is a dense outer product.  Exact same values: the mask selects
    a single row (multiply by {0,1}, sum of one nonzero term).
    """
    onehot = _length_onehot(lengths, states.shape[1])
    return jnp.einsum("bt,bth->bh", onehot,
                      states.astype(jnp.float32)).astype(states.dtype)


def select_last_tm(states_tm: jax.Array, lengths: jax.Array) -> jax.Array:
    """``select_last`` over time-major states (T, B, H) — no transpose copy."""
    onehot = _length_onehot(lengths, states_tm.shape[0])
    return jnp.einsum("bt,tbh->bh", onehot,
                      states_tm.astype(jnp.float32)).astype(states_tm.dtype)


class GRUParams(NamedTuple):
    w_ih: jax.Array  # (D, 3H)   gate order: r, z, n
    b_ih: jax.Array  # (3H,)
    w_hh: jax.Array  # (H, 3H)
    b_hh: jax.Array  # (3H,)


def gru_init(key: jax.Array, dim_in: int, dim_h: int,
             dtype=jnp.float32) -> GRUParams:
    k1, k2 = jax.random.split(key)
    s = 1.0 / jnp.sqrt(dim_h)
    return GRUParams(
        w_ih=jax.random.uniform(k1, (dim_in, 3 * dim_h), dtype, -s, s),
        b_ih=jnp.zeros((3 * dim_h,), dtype),
        w_hh=jax.random.uniform(k2, (dim_h, 3 * dim_h), dtype, -s, s),
        b_hh=jnp.zeros((3 * dim_h,), dtype),
    )


def _default_unroll() -> int:
    """Scan unroll factor for the recurrences (VQACX_RNN_UNROLL, default 1).

    Unrolling lets XLA software-pipeline the per-step w_hh loads against the
    previous step's arithmetic; the 26-token sequences divide evenly by 2/13.
    """
    import os

    return int(os.environ.get("VQACX_RNN_UNROLL", "1"))


def _pallas_gru_mode() -> str:
    """VQACX_GRU_PALLAS: 'auto' (default) = use the fused Pallas recurrence
    on a single-device TPU when eligible (bf16 policy), '1' = use it whenever
    eligible regardless of device count, 'interpret' = force it through the
    Mosaic interpreter (CPU tests), '0' = always lax.scan.

    'auto' stays off under a multi-device mesh: the train steps shard via
    GSPMD (NamedSharding inputs), and a pallas_call has no partitioning
    rule there — the scan path lowers cleanly instead.
    """
    import os

    return os.environ.get("VQACX_GRU_PALLAS", "auto")


def _pallas_gru_eligible(batch: int, h0, mode: str) -> bool:
    """The fused kernel covers the training shapes: bf16 compute policy,
    zero initial state, batch within the kernel's VMEM plan, on TPU.

    Below MIN_BATCH the kernel is weight-DMA-bound (34.6 MB of w_hh
    streamed per timestep over too few compute rows) and loses end-to-end
    despite winning the micro-benchmark: MutanAtt B=128 measured 9.7k ex/s
    with the kernel vs 10.6k with the scan, while B=256 wins 13.2k vs 12.1k
    (v5e, 2026-08-17) — so 'auto'/'1' only engage at batch >= 256.
    """
    from ..core.policy import compute_dtype, host_init_active
    from .pallas.gru_kernel import MIN_BATCH

    if mode == "0" or host_init_active():
        return False
    # no MAX_BATCH cap: batches beyond the kernel's VMEM plan run as
    # equal chunks (see _gru_pallas_path)
    if compute_dtype() != jnp.bfloat16:
        return False
    if batch < MIN_BATCH and mode != "interpret":
        return False
    if h0 is not None:  # callers that seed a nonzero state fall back
        return False
    if mode == "interpret":
        return True
    if jax.devices()[0].platform != "tpu":
        return False
    return mode == "1" or len(jax.devices()) == 1


def _pad_gates(w: jax.Array, dim_h: int, pad_h: int) -> jax.Array:
    """(..., 3H) -> (..., 3Hp) gate-interleaved with zero pad columns."""
    from .pallas.gru_kernel import interleave_gates

    w3 = jnp.pad(w.reshape(w.shape[:-1] + (3, dim_h)),
                 [(0, 0)] * (w.ndim - 1) + [(0, 0), (0, pad_h)])
    return interleave_gates(w3)


def _per_gate_x_proj(params: "GRUParams", x: jax.Array,
                     mask_x3: jax.Array) -> jax.Array:
    """Per-gate masked input projections -> (xr, xz, xn) tuple of (T, B, Hp).

    Three (T*B, D) x (D, Hp) GEMMs — one per gate, each with its own
    variational input mask — each writing a CONTIGUOUS gate slab.  Same
    total FLOPs as the fused (T*B, D) x (D, 3Hp) GEMM of the shared-mask
    path, and no gate-interleave relayout: the earlier interleaved form
    measured ~5.3 ms/step of pure layout churn at reference dims (xplane,
    2026-08-21) — the per-gate kernels now take gate-major blocks
    directly (gru_kernel._fwd_kernel_pg).
    """
    from ..core.policy import cast_in
    from .pallas.gru_kernel import LANE

    batch, seq_len, dim_in = x.shape
    dim_h = params.w_hh.shape[0]
    hp = ((dim_h + LANE - 1) // LANE) * LANE
    pad_h = hp - dim_h
    xt = jnp.swapaxes(x, 0, 1).reshape(seq_len * batch, dim_in)
    w3 = params.w_ih.reshape(dim_in, 3, dim_h)
    b3 = params.b_ih.reshape(3, dim_h)
    mx = jnp.swapaxes(mask_x3, 0, 1)  # (B, 3, D) -> broadcast per gate
    projs = []
    for g in range(3):
        xg = xt * jnp.tile(mx[:, g], (seq_len, 1))
        # pad the WEIGHT columns (620 x 32, trivial), not the (T*B, H)
        # output: each gate GEMM then lands directly in the kernel's
        # padded (T, B, Hp) slab — the earlier output-side jnp.pad cost
        # two (13312, 2432) pad passes plus layout-fix copies per step
        # (xplane 2026-08-21, ~0.6 ms/step of the per-gate gap)
        wg = jnp.pad(w3[:, g], ((0, 0), (0, pad_h)))
        bg = jnp.pad(b3[g], (0, pad_h))
        xc, wgc = cast_in(xg, wg)
        pg = jnp.dot(xc, wgc, preferred_element_type=jnp.float32) + bg
        projs.append(pg.astype(jnp.bfloat16).reshape(seq_len, batch, hp))
    # a (xr, xz, xn) TUPLE, not a stacked (3,T,B,Hp) array: the kernels
    # take the three slabs as separate operands, and the stack/unstack
    # pair alone measured ~1.3 ms/step at reference dims
    return tuple(projs)


def _gru_scan_per_gate(params: "GRUParams", x: jax.Array, mask_x3: jax.Array,
                       mask_h3: jax.Array, h0: jax.Array, unroll: int,
                       time_major_out: bool) -> jax.Array:
    """lax.scan GRU with six independent per-gate variational masks.

    Input side: three per-gate-masked (T*B, D) x (D, H) GEMMs (same FLOPs
    as the fused 3H GEMM).  Recurrent side: three (B, H) x (H, H) GEMMs per
    step, each on its own masked state.  The carry leak ``z * h`` reads the
    RAW state, exactly like the shared-mask path and the torch oracle.
    """
    from ..core.policy import cast_in, compute_dtype

    batch, seq_len, dim_in = x.shape
    dim_h = params.w_hh.shape[0]
    cdt = compute_dtype()
    xt = jnp.swapaxes(x, 0, 1).reshape(seq_len * batch, dim_in)
    w_ih3 = params.w_ih.reshape(dim_in, 3, dim_h)
    b_ih3 = params.b_ih.reshape(3, dim_h)
    projs = []
    for g in range(3):
        xg = xt * jnp.tile(mask_x3[g], (seq_len, 1))
        xc, wg = cast_in(xg, w_ih3[:, g])
        pg = jnp.dot(xc, wg, preferred_element_type=jnp.float32) + b_ih3[g]
        projs.append(pg.reshape(seq_len, batch, dim_h).astype(cdt))
    w_hh3 = params.w_hh.reshape(dim_h, 3, dim_h).astype(cdt)
    b_hh3 = params.b_hh.reshape(3, dim_h)
    m_r, m_z, m_n = mask_h3[0], mask_h3[1], mask_h3[2]

    def rec(h, g):
        return jnp.dot(h.astype(cdt), w_hh3[:, g],
                       preferred_element_type=jnp.float32) + b_hh3[g]

    def step(h, xp3):
        xr, xz, xn = xp3
        r = jax.nn.sigmoid(xr + rec(h * m_r, 0))
        z = jax.nn.sigmoid(xz + rec(h * m_z, 1))
        n = jnp.tanh(xn + r * rec(h * m_n, 2))
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, states = jax.lax.scan(step, h0, tuple(projs), unroll=unroll)
    return states if time_major_out else jnp.swapaxes(states, 0, 1)


def _gru_pallas_path(params: "GRUParams", xt: jax.Array | None,
                     mask_h: jax.Array | None, interpret: bool,
                     x_proj: jax.Array | None = None) -> jax.Array:
    """Padded input GEMM + fused recurrence; returns (T, B, H) bf16 states.

    ``xt`` is time-major (T, B, D), already input-masked.  Padding to the
    lane multiple happens on the *weights* so the input projection lands
    directly in the kernel's (T, B, 3, Hp) layout with zero pad columns —
    no post-GEMM pad copy of the 191 MB projection stack.  Callers with
    per-gate input masks pass a precomputed gate-major ``x_proj``
    — a (xr, xz, xn) tuple of (T, B, Hp) slabs — instead
    (``_per_gate_x_proj``); a 3-axis ``mask_h``
    (3, B, H) selects the kernels' gate-major per-gate variant (the
    recurrent weights/bias are then passed gate-major (3, Hp, Hp) /
    (3, 1, Hp) too — no interleaving anywhere on the per-gate path).
    """
    from ..core.policy import cast_in
    from .pallas.gru_kernel import LANE, gru_recurrence_pallas

    dim_h = params.w_hh.shape[0]
    hp = ((dim_h + LANE - 1) // LANE) * LANE
    pad_h = hp - dim_h
    per_gate = mask_h is not None and mask_h.ndim == 3

    if x_proj is None:
        seq_len, batch, _ = xt.shape
        w_ih = _pad_gates(params.w_ih, dim_h, pad_h)
        b_ih = _pad_gates(params.b_ih, dim_h, pad_h)
        xc, wp = cast_in(xt.reshape(seq_len * batch, -1), w_ih)
        x_proj = (jnp.dot(xc, wp, preferred_element_type=jnp.float32) + b_ih)
        x_proj = x_proj.reshape(seq_len, batch, 3 * hp).astype(jnp.bfloat16)
    else:
        seq_len, batch = (x_proj[0].shape[:2] if per_gate
                          else x_proj.shape[:2])
    if per_gate:
        # gate-major recurrent weights (3, Hp, Hp) and bias (3, 1, Hp)
        w_hh = jnp.pad(params.w_hh.reshape(dim_h, 3, dim_h),
                       ((0, pad_h), (0, 0), (0, pad_h)))
        w_hh = jnp.swapaxes(w_hh, 0, 1)
        b_hh = jnp.pad(params.b_hh.reshape(3, dim_h),
                       ((0, 0), (0, pad_h)))[:, None]
    else:
        w_hh = jnp.pad(_pad_gates(params.w_hh, dim_h, pad_h),
                       ((0, pad_h), (0, 0)))
        b_hh = _pad_gates(params.b_hh, dim_h, pad_h)[None]  # (1, 3Hp) f32

    if mask_h is None:
        mask = jnp.ones((batch, hp), jnp.bfloat16)
    else:  # (B, H) shared or (3, B, H) per-gate; pad the hidden axis
        pad = [(0, 0)] * (mask_h.ndim - 1) + [(0, pad_h)]
        mask = jnp.pad(mask_h, pad).astype(jnp.bfloat16)

    from .pallas.gru_kernel import MAX_BATCH

    # resolve the backward-mode switch HERE (host time when this path is
    # not under jit) and thread it as a static arg: JAX caches custom_vjp
    # backward traces, so an env read inside the cached backward would be
    # silently ignored once a trace with the other mode exists
    from .pallas.gru_kernel import _bwd_uses_pallas

    bwd_pallas = _bwd_uses_pallas()
    w_hh = w_hh.astype(jnp.bfloat16)
    if batch <= MAX_BATCH:
        states = gru_recurrence_pallas(w_hh, b_hh, x_proj, mask, interpret,
                                       bwd_pallas)
        return states[:, :, :dim_h]

    # the recurrence is independent per example, and MAX_BATCH is only the
    # kernel's VMEM plan (three (B, Hp) carries + double-buffered blocks):
    # run the kernel over equal batch chunks and concatenate.  Each chunk
    # streams the full w_hh per timestep like a standalone call, so this
    # keeps the per-chunk compute geometry identical; measured it extends
    # the kernel's win past B=512 instead of falling back to lax.scan.
    n_chunks = -(-batch // MAX_BATCH)
    chunk = ((-(-batch // n_chunks) + 7) // 8) * 8  # sublane multiple
    pb = n_chunks * chunk
    if pb != batch:
        bpad_x = [(0, 0), (0, pb - batch), (0, 0)]
        x_proj = (tuple(jnp.pad(x, bpad_x) for x in x_proj) if per_gate
                  else jnp.pad(x_proj, bpad_x))
        bpad = [(0, 0)] * (mask.ndim - 2) + [(0, pb - batch), (0, 0)]
        mask = jnp.pad(mask, bpad)
    xslc = ((lambda i: tuple(x[:, i * chunk:(i + 1) * chunk]
                             for x in x_proj)) if per_gate
            else (lambda i: x_proj[:, i * chunk:(i + 1) * chunk]))
    outs = [gru_recurrence_pallas(
        w_hh, b_hh, xslc(i),
        mask[..., i * chunk:(i + 1) * chunk, :], interpret, bwd_pallas)
        for i in range(n_chunks)]
    return jnp.concatenate(outs, axis=1)[:, :batch, :dim_h]


def _split_bwd_enabled() -> bool:
    """Opt into the hand-written split backward for the recurrences.

    Default OFF: measured 17.7k vs 19.5k examples/sec on the VQA-pretrain
    step (v5e, B=512, f32, 2026-08-17).  The xplane trace shows why jax's
    automatic scan transpose wins here: XLA fuses the per-step dW_hh
    accumulation into the GEMM epilogue at ~105us/iter (near roofline) and
    saves gate residuals partly in bf16, while the split VJP pays an extra
    f32 (T, B, 3H) h_proj residual stack write (~2.7 ms/step at reference
    dims).  Kept as ``VQACX_RNN_SPLIT_BWD=1`` for re-testing on hardware
    with different fusion behavior; grad parity is pinned in
    tests/test_ops_rnn.py.
    """
    import os

    return os.environ.get("VQACX_RNN_SPLIT_BWD", "0") == "1"


def _gru_step(w_hh: jax.Array, b_hh: jax.Array, h: jax.Array, xp: jax.Array,
              mask_h: jax.Array):
    h_in = h * mask_h
    h_proj = jnp.dot(h_in.astype(w_hh.dtype), w_hh,
                     preferred_element_type=jnp.float32) + b_hh
    xr, xz, xn = jnp.split(xp, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h
    return h_new, h_proj


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_core(unroll: int, w_hh: jax.Array, b_hh: jax.Array,
              x_proj: jax.Array, h0: jax.Array, mask_h: jax.Array):
    """GRU recurrence over precomputed input projections: (T,B,3H) -> (T,B,H).

    Identical forward computation to the inline scan, but with a hand-written
    VJP.  jax's automatic scan transpose accumulates the (H, 3H) weight
    cotangent IN THE BACKWARD CARRY — at reference dims (H=2400) that is a
    69 MB f32 accumulator read+written every one of the 26 timesteps
    (~3.6 GB of HBM traffic per train step at B=512, verified in the grad
    jaxpr).  Here the backward carry is only (B, H): per-step gate cotangents
    are stacked as a scan *output* and ``dW_hh`` is one
    (H, T*B) x (T*B, 3H) GEMM outside the loop — same FLOPs, MXU-shaped,
    no accumulator traffic.
    """
    def step(h, xp):
        h_new, _ = _gru_step(w_hh, b_hh, h, xp, mask_h)
        return h_new, h_new

    _, states = jax.lax.scan(step, h0, x_proj, unroll=unroll)
    return states


def _gru_core_fwd(unroll, w_hh, b_hh, x_proj, h0, mask_h):
    def step(h, xp):
        h_new, h_proj = _gru_step(w_hh, b_hh, h, xp, mask_h)
        return h_new, (h_new, h_proj)

    _, (states, h_projs) = jax.lax.scan(step, h0, x_proj, unroll=unroll)
    return states, (w_hh, x_proj, h0, mask_h, states, h_projs)


def _gru_core_bwd(unroll, res, dstates):
    w_hh, x_proj, h0, mask_h, states, h_projs = res
    h_prev = jnp.concatenate([h0[None], states[:-1]], axis=0)
    w_hh_t = w_hh.T

    def step(carry, inp):
        dh, dmask = carry
        ds_t, xp, hp, hprev = inp
        g = ds_t + dh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        dn = g * (1.0 - z)
        dsz = g * (hprev - n) * z * (1.0 - z)
        dsn = dn * (1.0 - n * n)
        dhn = dsn * r
        dsr = dsn * hn * r * (1.0 - r)
        dh_proj = jnp.concatenate([dsr, dsz, dhn], axis=-1)
        dx_proj = jnp.concatenate([dsr, dsz, dsn], axis=-1)
        back = jnp.dot(dh_proj.astype(w_hh_t.dtype), w_hh_t,
                       preferred_element_type=jnp.float32)
        dh_new = g * z + back * mask_h
        dmask = dmask + back * hprev
        return (dh_new, dmask), (dx_proj, dh_proj)

    (dh0, dmask), (dx_proj, dh_projs) = jax.lax.scan(
        step, (jnp.zeros_like(h0), jnp.zeros_like(mask_h)),
        (dstates, x_proj, h_projs, h_prev), reverse=True, unroll=unroll)
    t, b, dim_h = states.shape
    h_in = (h_prev * mask_h).reshape(t * b, dim_h)
    dw = jnp.dot(h_in.astype(w_hh.dtype).T,
                 dh_projs.reshape(t * b, -1).astype(w_hh.dtype),
                 preferred_element_type=jnp.float32).astype(w_hh.dtype)
    db = jnp.sum(dh_projs, axis=(0, 1))
    return dw, db, dx_proj, dh0, dmask


_gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


def gru_scan(params: GRUParams, x: jax.Array, *, dropout: float = 0.0,
             deterministic: bool = True, rng: jax.Array | None = None,
             h0: jax.Array | None = None, unroll: int | None = None,
             time_major_out: bool = False,
             per_gate_masks: bool = False) -> jax.Array:
    """Run a GRU over (B, T, D) -> all hidden states (B, T, H).

    With ``time_major_out=True`` returns (T, B, H) — the scan's native
    layout — for callers that gather one timestep (``select_last_tm``);
    this skips a (B, T, H) transpose copy of the full state tensor.

    ``per_gate_masks=True`` draws SIX independent variational masks — one
    per gate-side projection, matching skip-thoughts.torch's BayesianGRU,
    which wraps each of its six Linears in its own per-sequence dropout
    (reference seq2vec.py:80-85 via the external skip-thoughts.torch dep) —
    instead of one mask shared across the three input gates and one across
    the three recurrent gates.  Identical marginal drop rate and scaling;
    the difference is cross-gate noise correlation in training mode
    (VERDICT r3 #4).  Oracle parity: tests/test_bayesian_gru_oracle.py.
    """
    batch, seq_len, _ = x.shape
    dim_h = params.w_hh.shape[0]
    h0_is_zero = h0 is None
    if h0 is None:
        h0 = jnp.zeros((batch, dim_h), x.dtype)

    mask_x = mask_h = None
    if not deterministic and dropout > 0.0:
        if rng is None:
            raise ValueError("rng required for non-deterministic GRU")
        kx, kh = jax.random.split(rng)
        # variational dropout: one mask per sequence, shared across time;
        # leading axis 3 = one independent mask per gate (r, z, n) when
        # per_gate_masks is on
        gshape = (3,) if per_gate_masks else ()
        keep_x, scale_x = rng_lib.keep_mask(kx, 1.0 - dropout,
                                            gshape + (batch, x.shape[-1]))
        mask_x = keep_x.astype(x.dtype) * jnp.asarray(scale_x, x.dtype)
        keep_h, scale_h = rng_lib.keep_mask(kh, 1.0 - dropout,
                                            gshape + (batch, dim_h))
        mask_h = keep_h.astype(x.dtype) * jnp.asarray(scale_h, x.dtype)
        if not per_gate_masks:
            x = x * mask_x[:, None, :]

    mode = _pallas_gru_mode()
    if _pallas_gru_eligible(batch, None if h0_is_zero else h0, mode):
        if mask_x is not None and per_gate_masks:
            xt, x_proj = None, _per_gate_x_proj(params, x, mask_x)
        else:
            xt, x_proj = jnp.swapaxes(x, 0, 1), None
        states = _gru_pallas_path(params, xt, mask_h,
                                  mode == "interpret", x_proj=x_proj)
        return states if time_major_out else jnp.swapaxes(states, 0, 1)

    if mask_x is not None and per_gate_masks:
        return _gru_scan_per_gate(params, x, mask_x, mask_h, h0,
                                  unroll or _default_unroll(),
                                  time_major_out)

    from ..core.policy import cast_in, compute_dtype

    # One fused GEMM for every timestep's input projection, computed
    # TIME-MAJOR: transposing the small (B, T, D) input first means the big
    # (T*B, 3H) projection lands directly in the scan's (T, B, 3H) layout —
    # no 287 MB relayout copies of x_proj (measured 2.8 ms/step at B=384).
    # Matmul operands follow the compute-dtype policy, f32 accumulate.
    xt = jnp.swapaxes(x, 0, 1)  # (T, B, D): D=620 — a cheap copy
    xc, w_ih = cast_in(xt.reshape(seq_len * batch, -1), params.w_ih)
    x_proj = jnp.dot(xc, w_ih,
                     preferred_element_type=jnp.float32) + params.b_ih
    x_proj = x_proj.reshape(seq_len, batch, 3 * dim_h)
    w_hh = params.w_hh.astype(compute_dtype())

    u = unroll or _default_unroll()
    if _split_bwd_enabled():
        # the custom-VJP path keeps x_proj f32 (cotangent dtypes must match)
        ones = mask_h if mask_h is not None \
            else jnp.ones((batch, dim_h), x_proj.dtype)
        states = _gru_core(u, w_hh, params.b_hh, x_proj, h0, ones)
    else:
        # Under the bf16 policy, store the (T, B, 3H) projection stack bf16:
        # it is the step's largest tensor (383 MB f32 at B=512 reference
        # dims), re-read once per scan iteration, relayout-copied by XLA at
        # some shapes, and its cotangent stack is materialized by the
        # backward scan — halving it halves all of that HBM traffic.  Gate
        # math still accumulates f32 (bf16 xp promotes on add with the f32
        # recurrent projection).  No-op under the default f32 policy.
        x_proj = x_proj.astype(compute_dtype())
        def step(h, xp):
            h_in = h * mask_h if mask_h is not None else h
            h_proj = jnp.dot(h_in.astype(w_hh.dtype), w_hh,
                             preferred_element_type=jnp.float32) + params.b_hh
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        _, states = jax.lax.scan(step, h0, x_proj, unroll=u)
    return states if time_major_out else jnp.swapaxes(states, 0, 1)


class LSTMParams(NamedTuple):
    w_ih: jax.Array  # (D, 4H)   gate order: i, f, g, o (torch convention)
    b_ih: jax.Array
    w_hh: jax.Array  # (H, 4H)
    b_hh: jax.Array


def lstm_init(key: jax.Array, dim_in: int, dim_h: int,
              dtype=jnp.float32) -> LSTMParams:
    k1, k2 = jax.random.split(key)
    s = 1.0 / jnp.sqrt(dim_h)
    return LSTMParams(
        w_ih=jax.random.uniform(k1, (dim_in, 4 * dim_h), dtype, -s, s),
        b_ih=jnp.zeros((4 * dim_h,), dtype),
        w_hh=jax.random.uniform(k2, (dim_h, 4 * dim_h), dtype, -s, s),
        b_hh=jnp.zeros((4 * dim_h,), dtype),
    )


def _lstm_step(w_hh: jax.Array, b_hh: jax.Array, h: jax.Array, c: jax.Array,
               xp: jax.Array):
    gates = xp + jnp.dot(h.astype(w_hh.dtype), w_hh,
                         preferred_element_type=jnp.float32) + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new, gates


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_core(unroll: int, w_hh: jax.Array, b_hh: jax.Array,
               x_proj: jax.Array, h0: jax.Array, c0: jax.Array):
    """LSTM recurrence over precomputed input projections (see _gru_core:
    same split-backward rationale — the automatic scan transpose carries the
    (H, 4H) weight cotangent through every timestep)."""
    def step(carry, xp):
        h, c = carry
        h_new, c_new, _ = _lstm_step(w_hh, b_hh, h, c, xp)
        return (h_new, c_new), h_new

    _, states = jax.lax.scan(step, (h0, c0), x_proj, unroll=unroll)
    return states


def _lstm_core_fwd(unroll, w_hh, b_hh, x_proj, h0, c0):
    def step(carry, xp):
        h, c = carry
        h_new, c_new, gates = _lstm_step(w_hh, b_hh, h, c, xp)
        return (h_new, c_new), (h_new, c_new, gates)

    _, (states, c_states, gate_stack) = jax.lax.scan(step, (h0, c0), x_proj,
                                                     unroll=unroll)
    return states, (w_hh, h0, c0, states, c_states, gate_stack)


def _lstm_core_bwd(unroll, res, dstates):
    w_hh, h0, c0, states, c_states, gate_stack = res
    h_prev = jnp.concatenate([h0[None], states[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None], c_states[:-1]], axis=0)
    w_hh_t = w_hh.T

    def step(carry, inp):
        dh, dc = carry
        ds_t, gates, cp, ct = inp
        gh = ds_t + dh
        si, sf, sg, so = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(si)
        f = jax.nn.sigmoid(sf)
        g = jnp.tanh(sg)
        o = jax.nn.sigmoid(so)
        tc = jnp.tanh(ct)
        dso = gh * tc * o * (1.0 - o)
        dc_tot = dc + gh * o * (1.0 - tc * tc)
        dsi = dc_tot * g * i * (1.0 - i)
        dsf = dc_tot * cp * f * (1.0 - f)
        dsg = dc_tot * i * (1.0 - g * g)
        dgates = jnp.concatenate([dsi, dsf, dsg, dso], axis=-1)
        dh_new = jnp.dot(dgates.astype(w_hh_t.dtype), w_hh_t,
                         preferred_element_type=jnp.float32)
        dc_new = dc_tot * f
        return (dh_new, dc_new), dgates

    (dh0, dc0), dgate_stack = jax.lax.scan(
        step, (jnp.zeros_like(h0), jnp.zeros_like(c0)),
        (dstates, gate_stack, c_prev, c_states), reverse=True, unroll=unroll)
    t, b, dim_h = states.shape
    dw = jnp.dot(h_prev.reshape(t * b, dim_h).astype(w_hh.dtype).T,
                 dgate_stack.reshape(t * b, -1).astype(w_hh.dtype),
                 preferred_element_type=jnp.float32).astype(w_hh.dtype)
    db = jnp.sum(dgate_stack, axis=(0, 1))
    return dw, db, dgate_stack, dh0, dc0


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_scan(params: LSTMParams, x: jax.Array,
              h0: jax.Array | None = None,
              c0: jax.Array | None = None, *,
              time_major_in: bool = False,
              time_major_out: bool = False) -> jax.Array:
    """Run an LSTM over (B, T, D) -> all hidden states (B, T, H).

    ``time_major_in``/``time_major_out`` accept/produce (T, B, ·) so stacked
    LSTMs (TwoLSTM) chain in the scan's native layout with zero relayout
    copies between layers.
    """
    if time_major_in:
        seq_len, batch = x.shape[:2]
    else:
        batch, seq_len = x.shape[:2]
    dim_h = params.w_hh.shape[0]
    if h0 is None:
        h0 = jnp.zeros((batch, dim_h), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((batch, dim_h), x.dtype)

    from ..core.policy import cast_in, compute_dtype

    # time-major input GEMM: see gru_scan — avoids relayout of (T*B, 4H)
    xt = x if time_major_in else jnp.swapaxes(x, 0, 1)
    xc, w_ih = cast_in(xt.reshape(seq_len * batch, -1), params.w_ih)
    x_proj = jnp.dot(xc, w_ih,
                     preferred_element_type=jnp.float32) + params.b_ih
    x_proj = x_proj.reshape(seq_len, batch, 4 * dim_h)
    w_hh = params.w_hh.astype(compute_dtype())

    u = _default_unroll()
    if _split_bwd_enabled():
        # the custom-VJP path keeps x_proj f32 (cotangent dtypes must match)
        states = _lstm_core(u, w_hh, params.b_hh, x_proj, h0, c0)
    else:
        # bf16 projection stack under the policy — see gru_scan
        x_proj = x_proj.astype(compute_dtype())

        def step(carry, xp):
            h, c = carry
            gates = xp + jnp.dot(
                h.astype(w_hh.dtype), w_hh,
                preferred_element_type=jnp.float32) + params.b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        _, states = jax.lax.scan(step, (h0, c0), x_proj, unroll=u)
    return states if time_major_out else jnp.swapaxes(states, 0, 1)
