"""Pallas TPU kernel for the fused GRU recurrence.

The `lax.scan` formulation (ops/rnn.py) is near the MXU roofline for the
recurrent GEMM itself, but every timestep also pays ~100us of HBM-bound
elementwise work (gate math over (B, 3H) f32 tensors materialized between
the GEMM and the carry update) plus dynamic-update-slice stacking of the
states — at reference dims (H=2400, B=512) the scan pair runs ~2.2x over
the GEMM roofline (xplane, 2026-08-17).  This kernel fuses one whole
timestep per grid sweep:

* the hidden state lives in a VMEM scratch buffer across the entire
  sequence — it never round-trips HBM between timesteps;
* gate elementwise math happens in registers right after the MXU tile,
  overlapped with the next weight-block DMA;
* `w_hh` is streamed from HBM once per timestep in (Hp, 3*C) column
  blocks (34.6 MB bf16 per step at reference dims — hidden under the
  compute at B>=256);
* the per-timestep states and gate pre-activations (`h_proj`, the backward
  residuals) are written straight to their (T, B, ·) stacks — no
  scan-carry dynamic-update-slice traffic.

Gate-column interleaving: the three gates' columns are grouped per
128-lane tile — flat column ``(j*3 + gate)*128 + c`` holds hidden unit
``j*128 + c`` of that gate — so every kernel operand is a plain 2-D block
and the whole timestep-column-tile is ONE (B, Hp) x (Hp, 384) MXU matmul.
(A (·, 3, C) trailing block shape would pad the 3 up to the bf16 sublane
tile of 16: the weight block alone then costs 10 MB of VMEM instead of
1.9 MB — the layout is the difference between fitting and OOM.)
``interleave_gates`` converts; the backward scan works directly in the
interleaved space (gate math is columnwise).  The per-gate-mask variant
(BayesianUniSkip's six independent masks) does NOT interleave: its
tensors pass gate-major as separate (T, B, Hp) slabs per gate — see
``_fwd_kernel_pg`` for the measured reasons.

Grid: ``(T, J)`` with the column-tile axis innermost.  At ``j == 0`` the
kernel snapshots ``h_in = h * mask`` (variational dropout applies the same
mask every timestep), so the per-column ``h_new`` writes can update ``h``
in place while the GEMMs keep reading the snapshot.

All dims are zero-padded to lane multiples outside the kernel (pad columns
of ``x_proj``/``w``/``b``/``mask`` are zero, so padded hidden units stay
exactly zero through the recurrence — sigmoid(0)*0 terms — and the result
is exact).  The state is carried in bf16 (the kernel is part of the bf16
compute policy; gate math still accumulates f32 on the MXU).

The backward is fused the same way (``_bwd_kernel``): the reverse sweep
keeps the running state cotangent ``dh`` in a VMEM scratch across
timesteps, recomputes the cheap gate activations from the saved bf16
residuals (xp, h_proj) instead of storing them, does the cross-column
``dh_proj @ w^T`` back-propagation as a transposed-RHS MXU contraction on
the same streamed weight blocks, and emits the gate cotangent stacks the
outer (Hp, T*B) x (T*B, 3Hp) weight-cotangent GEMM consumes.

Used via ops.rnn.gru_scan under the bf16 policy (default on for
single-device TPU runs at batch >= MIN_BATCH; VQACX_GRU_PALLAS=0/1 and
VQACX_GRU_BWD=scan override); parity vs the scan path is pinned in
tests/test_pallas_gru.py.  Measured on the v5e chip at reference dims
(H=2400, D=620, B=512, T=26, 2026-08-17): forward 6.29 -> 4.69 ms (1.34x);
MutanNoAtt pretrain step end-to-end 22,998 -> 29,807 ex/s (+30%) with the
fused backward vs the XLA reverse scan (_bwd_scan); MutanAtt B=256
12,103 -> 13,156 ex/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# largest batch the fwd kernel's VMEM plan supports at Hp=2432 (three
# (B, Hp) bf16 buffers + double-buffered weight/activation blocks ~13 MB)
MAX_BATCH = 512
# below this the kernel is weight-DMA-bound end-to-end (see
# ops.rnn._pallas_gru_eligible for the measurements)
MIN_BATCH = 256
LANE = 128


def interleave_gates(w3: jax.Array, tile: int = LANE) -> jax.Array:
    """(..., 3, Hp) -> (..., 3*Hp) with gate columns grouped per lane tile:
    flat column (j*3 + g)*tile + c = gate g, hidden unit j*tile + c."""
    *lead, three, hp = w3.shape
    assert three == 3 and hp % tile == 0
    j = hp // tile
    return (w3.reshape(*lead, 3, j, tile)
            .swapaxes(-3, -2).reshape(*lead, 3 * hp))


def _fwd_kernel(xp_ref, w_ref, b_ref, mask_ref, states_ref, hproj_ref,
                h_scr, hin_scr):
    t = pl.program_id(0)
    j = pl.program_id(1)
    tile = states_ref.shape[-1]

    @pl.when(jnp.logical_and(t == 0, j == 0))
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    # one snapshot of the (variationally) masked state per timestep; the
    # per-column h updates below then safely write h_scr in place
    @pl.when(j == 0)
    def _():
        hin_scr[:] = h_scr[:] * mask_ref[:]

    # one MXU matmul covers all three gates' columns for this tile
    hp_all = jnp.dot(hin_scr[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[0]
    xp = xp_ref[0]  # (B, 3*tile) interleaved [r | z | n]
    r = jax.nn.sigmoid(xp[:, :tile] + hp_all[:, :tile])
    z = jax.nn.sigmoid(xp[:, tile:2 * tile] + hp_all[:, tile:2 * tile])
    n = jnp.tanh(xp[:, 2 * tile:] + r * hp_all[:, 2 * tile:])
    h_old = h_scr[:, pl.ds(j * tile, tile)].astype(jnp.float32)
    h_new = ((1.0 - z) * n + z * h_old).astype(h_scr.dtype)

    h_scr[:, pl.ds(j * tile, tile)] = h_new
    states_ref[0] = h_new
    hproj_ref[0] = hp_all.astype(hproj_ref.dtype)


def _fwd_kernel_pg(xr_ref, xz_ref, xn_ref, w_ref, b_ref, mask_ref,
                   states_ref, hpr_ref, hpz_ref, hpn_ref, h_scr, hin_scr):
    """Gate-major per-gate-mask variant (VERDICT r3 #4).

    Each gate's tensors arrive as SEPARATE operands — xp_g (1, B, tile)
    x3, hproj_g out (1, B, tile) x3, w (3, Hp, tile), b (3, 1, tile),
    mask (3, B, Hp) — instead of the shared kernel's gate-interleaved
    columns.  Interleaving exists so the shared kernel covers all three
    gates with ONE matmul per tile; the per-gate variant needs three
    matmuls on three differently-masked states regardless, and forcing
    its host-side tensors through the interleaved layout measured
    ~5.3 ms/step of pure relayout churn at reference dims (xplane trace,
    2026-08-21: reshape (T·B,19,3,128) + two copies + a {1,0,2} relayout
    on every (T,B,3Hp) tensor, fwd and bwd).  Separate per-gate operands
    also beat one stacked (3,T,B,Hp) array: the stack/unstack pair alone
    cost another ~1.3 ms/step (second trace, same day) — here each
    gate's input GEMM writes a contiguous (T,B,Hp) slab the kernel reads
    directly.
    """
    t = pl.program_id(0)
    j = pl.program_id(1)
    tile = states_ref.shape[-1]

    @pl.when(jnp.logical_and(t == 0, j == 0))
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    # one snapshot of each gate's masked state per timestep (hin_scr is
    # (3, B, Hp)); the per-column h updates below write h_scr in place
    @pl.when(j == 0)
    def _():
        hin_scr[0] = h_scr[:] * mask_ref[0]
        hin_scr[1] = h_scr[:] * mask_ref[1]
        hin_scr[2] = h_scr[:] * mask_ref[2]

    hp_r = jnp.dot(hin_scr[0], w_ref[0],
                   preferred_element_type=jnp.float32) + b_ref[0, 0]
    hp_z = jnp.dot(hin_scr[1], w_ref[1],
                   preferred_element_type=jnp.float32) + b_ref[1, 0]
    hp_n = jnp.dot(hin_scr[2], w_ref[2],
                   preferred_element_type=jnp.float32) + b_ref[2, 0]
    r = jax.nn.sigmoid(xr_ref[0] + hp_r)
    z = jax.nn.sigmoid(xz_ref[0] + hp_z)
    n = jnp.tanh(xn_ref[0] + r * hp_n)
    h_old = h_scr[:, pl.ds(j * tile, tile)].astype(jnp.float32)
    h_new = ((1.0 - z) * n + z * h_old).astype(h_scr.dtype)

    h_scr[:, pl.ds(j * tile, tile)] = h_new
    states_ref[0] = h_new
    hpr_ref[0] = hp_r.astype(hpr_ref.dtype)
    hpz_ref[0] = hp_z.astype(hpz_ref.dtype)
    hpn_ref[0] = hp_n.astype(hpn_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_fwd_pallas(xp: jax.Array, w: jax.Array, b: jax.Array,
                   mask: jax.Array, interpret: bool = False):
    """Run the recurrence over padded, gate-interleaved inputs (h0 = 0).

    Args:
      xp: (T, B, 3*Hp) input projections (bf16), interleaved gate columns,
        pad columns zero — or a gate-major (xr, xz, xn) tuple of
        (T, B, Hp) slabs for the per-gate mask variant.
      w: (Hp, 3*Hp) recurrent weights, interleaved columns, pad rows/cols
        zero — or gate-major (3, Hp, Hp) for the per-gate variant.
      b: (1, 3*Hp) f32 bias, interleaved — or (3, 1, Hp) per-gate.
      mask: (B, Hp) variational dropout mask (ones when inactive), or
        (3, B, Hp) for one independent mask per gate (r, z, n) — the
        mask's rank selects the variant.
    Returns:
      states (T, B, Hp) bf16, and h_projs — (T, B, 3*Hp) interleaved or
      a gate-major (r, z, n) tuple of (T, B, Hp).
    """
    per_gate = mask.ndim == 3
    if per_gate:
        assert isinstance(xp, (tuple, list)) and len(xp) == 3, \
            "per-gate masks take gate-major xp as a (xr, xz, xn) tuple"
        seq_len, batch, hp = xp[0].shape
    else:
        seq_len, batch, chp = xp.shape
        hp = chp // 3
    assert hp % LANE == 0, "pad the hidden dim to a lane multiple"
    tile = LANE
    grid = (seq_len, hp // tile)

    slab_spec = pl.BlockSpec((1, batch, tile), lambda t, j: (t, 0, j),
                             memory_space=pltpu.VMEM)
    slab_shape = jax.ShapeDtypeStruct((seq_len, batch, hp), jnp.bfloat16)
    if per_gate:
        in_specs = [slab_spec, slab_spec, slab_spec,
                    pl.BlockSpec((3, hp, tile), lambda t, j: (0, 0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, 1, tile), lambda t, j: (0, 0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, batch, hp), lambda t, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM)]
        out_specs = (slab_spec, slab_spec, slab_spec, slab_spec)
        out_shape = (slab_shape, slab_shape, slab_shape, slab_shape)
        operands = (*xp, w, b, mask)
    else:
        in_specs = [
            pl.BlockSpec((1, batch, 3 * tile), lambda t, j: (t, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 3 * tile), lambda t, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * tile), lambda t, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hp), lambda t, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = (
            slab_spec,
            pl.BlockSpec((1, batch, 3 * tile), lambda t, j: (t, 0, j),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            slab_shape,
            jax.ShapeDtypeStruct((seq_len, batch, 3 * hp), jnp.bfloat16),
        )
        operands = (xp, w, b, mask)

    outs = pl.pallas_call(
        _fwd_kernel_pg if per_gate else _fwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((batch, hp), jnp.bfloat16),   # h
            # h * mask snapshot (one per gate in the per-gate variant)
            pltpu.VMEM(((3, batch, hp) if per_gate else (batch, hp)),
                       jnp.bfloat16),
        ],
        interpret=interpret,
        # the plan needs ~18.5 MB at B=512 (three (B, Hp) bf16 state
        # buffers + double-buffered operand blocks) — above the
        # conservative 16 MB default scoped limit but far below the
        # hardware VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * seq_len * batch * hp * 3 * hp,
            # per-gate adds the three hproj output slabs plus (3, B, Hp)
            # mask reads the shared variant doesn't touch (ADVICE r4)
            bytes_accessed=(3 * seq_len * batch * hp * 2
                            + seq_len * w.size * w.dtype.itemsize
                            + seq_len * batch * hp * 2 * 4
                            + (seq_len * batch * hp * 3 * 2
                               + 3 * batch * hp * 2 if per_gate else 0)),
            transcendentals=3 * seq_len * batch * hp),
    )(*operands)
    if per_gate:
        states, hprojs = outs[0], tuple(outs[1:])
    else:
        states, hprojs = outs
    return states, hprojs


def _bwd_kernel(ds_ref, xp_ref, hproj_ref, hprev_full_ref, w_ref, mask_ref,
                dxp_ref, dhproj_ref, dmask_ref, dh_scr, back_scr, dmask_scr):
    """One reverse timestep-column-tile of the GRU backward.

    Grid is (T, J) with time reversed by the index maps.  ``dh_scr`` carries
    the running state cotangent across timesteps: tile j reads its own
    columns (last written a timestep later) before overwriting them with the
    new ``g * z`` term, and the cross-column ``back`` contribution is
    accumulated per tile into ``back_scr`` and folded in once at j == J-1.
    """
    t = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tile = ds_ref.shape[-1]

    @pl.when(jnp.logical_and(t == 0, j == 0))
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dmask_scr[:] = jnp.zeros_like(dmask_scr)

    @pl.when(j == 0)
    def _():
        back_scr[:] = jnp.zeros_like(back_scr)

    g = (ds_ref[0].astype(jnp.float32)
         + dh_scr[:, pl.ds(j * tile, tile)])
    xp = xp_ref[0].astype(jnp.float32)   # (B, 3*tile) [r | z | n]
    hp = hproj_ref[0].astype(jnp.float32)
    hprev = hprev_full_ref[0, :, pl.ds(j * tile, tile)].astype(jnp.float32)
    r = jax.nn.sigmoid(xp[:, :tile] + hp[:, :tile])
    z = jax.nn.sigmoid(xp[:, tile:2 * tile] + hp[:, tile:2 * tile])
    hn = hp[:, 2 * tile:]
    n = jnp.tanh(xp[:, 2 * tile:] + r * hn)

    dn = g * (1.0 - z)
    dsz = g * (hprev - n) * z * (1.0 - z)
    dsn = dn * (1.0 - n * n)
    dhn = dsn * r
    dsr = dsn * hn * r * (1.0 - r)

    dh_proj = jnp.concatenate([dsr, dsz, dhn], axis=1).astype(jnp.bfloat16)
    dxp_ref[0] = jnp.concatenate([dsr, dsz, dsn], axis=1).astype(dxp_ref.dtype)
    dhproj_ref[0] = dh_proj.astype(dhproj_ref.dtype)

    # back += dh_proj @ w_block^T as a transposed-RHS MXU contraction —
    # no (3Hp, Hp) transposed weight copy in HBM
    back_scr[:] += jax.lax.dot_general(
        dh_proj, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_scr[:, pl.ds(j * tile, tile)] = g * z

    @pl.when(j == nj - 1)
    def _():
        back = back_scr[:]
        mask = mask_ref[:].astype(jnp.float32)
        dh_scr[:] = dh_scr[:] + back * mask
        dmask_scr[:] = dmask_scr[:] + back * hprev_full_ref[0].astype(
            jnp.float32)

    @pl.when(jnp.logical_and(t == pl.num_programs(0) - 1, j == nj - 1))
    def _():
        dmask_ref[:] = dmask_scr[:]


def _bwd_kernel_pg(ds_ref, xr_ref, xz_ref, xn_ref, hpr_ref, hpz_ref,
                   hpn_ref, hprev_full_ref, w_ref, mask_ref,
                   dxr_ref, dxz_ref, dxn_ref, dhr_ref, dhz_ref, dhn_ref,
                   dmask_ref, dh_scr, back_scr, dmask_scr):
    """Gate-major per-gate-mask backward (see _fwd_kernel_pg).

    Per-gate xp/hproj arrive as separate (1, B, tile) operands, w
    (3, Hp, tile), mask (3, B, Hp); the six per-gate cotangents leave as
    separate (1, B, tile) outputs and back/dmask accumulators are
    (3, B, Hp) — one per gate, folded into the state cotangent with each
    gate's own mask at j == J-1, exactly the algebra of the interleaved
    variant but with zero host-side relayout.
    """
    t = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tile = ds_ref.shape[-1]

    @pl.when(jnp.logical_and(t == 0, j == 0))
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dmask_scr[:] = jnp.zeros_like(dmask_scr)

    @pl.when(j == 0)
    def _():
        back_scr[:] = jnp.zeros_like(back_scr)

    g = (ds_ref[0].astype(jnp.float32)
         + dh_scr[:, pl.ds(j * tile, tile)])
    hprev = hprev_full_ref[0, :, pl.ds(j * tile, tile)].astype(jnp.float32)
    hn = hpn_ref[0].astype(jnp.float32)
    r = jax.nn.sigmoid(xr_ref[0].astype(jnp.float32)
                       + hpr_ref[0].astype(jnp.float32))
    z = jax.nn.sigmoid(xz_ref[0].astype(jnp.float32)
                       + hpz_ref[0].astype(jnp.float32))
    n = jnp.tanh(xn_ref[0].astype(jnp.float32) + r * hn)

    dn = g * (1.0 - z)
    dsz = g * (hprev - n) * z * (1.0 - z)
    dsn = dn * (1.0 - n * n)
    dhn = dsn * r
    dsr = dsn * hn * r * (1.0 - r)

    dxr_ref[0] = dsr.astype(dxr_ref.dtype)
    dxz_ref[0] = dsz.astype(dxz_ref.dtype)
    dxn_ref[0] = dsn.astype(dxn_ref.dtype)
    dhr_ref[0] = dsr.astype(dhr_ref.dtype)
    dhz_ref[0] = dsz.astype(dhz_ref.dtype)
    dhn_ref[0] = dhn.astype(dhn_ref.dtype)

    for gi, part in enumerate((dsr, dsz, dhn)):
        back_scr[gi] += jax.lax.dot_general(
            part.astype(jnp.bfloat16), w_ref[gi],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    dh_scr[:, pl.ds(j * tile, tile)] = g * z

    @pl.when(j == nj - 1)
    def _():
        hprev_full = hprev_full_ref[0].astype(jnp.float32)
        dh_new = dh_scr[:]
        for gi in range(3):
            dh_new = dh_new + back_scr[gi] * mask_ref[gi].astype(
                jnp.float32)
            dmask_scr[gi] += back_scr[gi] * hprev_full
        dh_scr[:] = dh_new

    @pl.when(jnp.logical_and(t == pl.num_programs(0) - 1, j == nj - 1))
    def _():
        dmask_ref[:] = dmask_scr[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_bwd_pallas(w: jax.Array, xp: jax.Array, mask: jax.Array,
                   states: jax.Array, hprojs: jax.Array,
                   dstates: jax.Array, interpret: bool = False):
    """Fused reverse sweep over the forward kernel's residuals (h0 = 0).

    Args mirror :func:`gru_fwd_pallas` — shared-mask: interleaved ``w``
    (Hp, 3Hp) / ``xp``/``hprojs`` (T, B, 3Hp); per-gate (3-D mask):
    gate-major ``w`` (3, Hp, Hp) / ``xp``/``hprojs`` as (r, z, n) tuples
    of (T, B, Hp) — plus the state cotangent stack.  Returns
    ``(dw, db, dxp, dmask)`` with each cotangent shaped like its primal
    (``dxp`` a matching tuple and ``dmask`` (3, B, Hp) in the per-gate
    variant); the gate-cotangent stacks the weight GEMMs consume are
    kernel outputs folded into ``dw``/``db`` here.
    """
    per_gate = mask.ndim == 3
    if per_gate:
        seq_len, batch, hp = xp[0].shape
    else:
        seq_len, batch, chp = xp.shape
        hp = chp // 3
    tile = LANE
    grid = (seq_len, hp // tile)
    acc_shape = (3, batch, hp) if per_gate else (batch, hp)
    h_prev = jnp.concatenate(
        [jnp.zeros((1, batch, hp), states.dtype), states[:-1]], axis=0)

    rev_t3 = lambda t, j: (seq_len - 1 - t, 0, j)
    acc_map = ((lambda t, j: (0, 0, 0)) if per_gate
               else (lambda t, j: (0, 0)))
    ds_spec = pl.BlockSpec((1, batch, tile), rev_t3,
                           memory_space=pltpu.VMEM)
    hprev_spec = pl.BlockSpec((1, batch, hp),
                              lambda t, j: (seq_len - 1 - t, 0, 0),
                              memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec(acc_shape, acc_map, memory_space=pltpu.VMEM)
    acc_out = jax.ShapeDtypeStruct(acc_shape, jnp.float32)
    slab_shape = jax.ShapeDtypeStruct((seq_len, batch, hp), jnp.bfloat16)
    if per_gate:
        w_spec = pl.BlockSpec((3, hp, tile), lambda t, j: (0, 0, j),
                              memory_space=pltpu.VMEM)
        in_specs = [ds_spec] + [ds_spec] * 6 + [hprev_spec, w_spec,
                                                acc_spec]
        out_specs = tuple([ds_spec] * 6) + (acc_spec,)
        out_shape = tuple([slab_shape] * 6) + (acc_out,)
        operands = (dstates, *xp, *hprojs, h_prev, w, mask)
    else:
        big_spec = pl.BlockSpec((1, batch, 3 * tile), rev_t3,
                                memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((hp, 3 * tile), lambda t, j: (0, j),
                              memory_space=pltpu.VMEM)
        big_shape = jax.ShapeDtypeStruct((seq_len, batch, 3 * hp),
                                         jnp.bfloat16)
        in_specs = [ds_spec, big_spec, big_spec, hprev_spec, w_spec,
                    acc_spec]
        out_specs = (big_spec, big_spec, acc_spec)
        out_shape = (big_shape, big_shape, acc_out)
        operands = (dstates, xp, hprojs, h_prev, w, mask)
    outs = pl.pallas_call(
        _bwd_kernel_pg if per_gate else _bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((batch, hp), jnp.float32),   # dh carry
            pltpu.VMEM(acc_shape, jnp.float32),     # back accumulator(s)
            pltpu.VMEM(acc_shape, jnp.float32),     # dmask accumulator(s)
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * seq_len * batch * hp * 3 * hp,
            # per-gate: three dhproj output slabs + (3, B, Hp) mask reads
            # on top of the shared variant's traffic (ADVICE r4)
            bytes_accessed=(5 * seq_len * batch * hp * 3 * 2
                            + seq_len * w.size * w.dtype.itemsize
                            + (seq_len * batch * hp * 3 * 2
                               + 3 * batch * hp * 2 if per_gate else 0)),
            transcendentals=3 * seq_len * batch * hp),
    )(*operands)

    if per_gate:
        dxp, dhprojs, dmask = tuple(outs[:3]), outs[3:6], outs[6]
        # per-gate weight cotangents on CONTIGUOUS gate-major slabs:
        # dw_g = (h_prev * mask_g)^T @ dhproj_g, no deinterleave pass
        hp_f = h_prev.astype(jnp.float32)
        dws = []
        db3 = []
        for g in range(3):
            h_in_g = (hp_f * mask[g][None].astype(jnp.float32)
                      ).reshape(seq_len * batch, hp)
            dws.append(jnp.dot(
                h_in_g.astype(w.dtype).T,
                dhprojs[g].reshape(seq_len * batch, hp),
                preferred_element_type=jnp.float32))
            db3.append(jnp.sum(dhprojs[g].astype(jnp.float32),
                               axis=(0, 1)))
        dw = jnp.stack(dws)  # (3, Hp, Hp) gate-major, matching w
        db = jnp.stack(db3)[:, None]
    else:
        dxp, dhprojs, dmask = outs
        # weight/bias cotangents: one (Hp, T·B) x (T·B, 3Hp) GEMM
        h_in = (h_prev.astype(jnp.float32)
                * mask[None].astype(jnp.float32)
                ).reshape(seq_len * batch, hp)
        dw = jnp.dot(h_in.astype(w.dtype).T,
                     dhprojs.reshape(seq_len * batch, 3 * hp),
                     preferred_element_type=jnp.float32)
        db = jnp.sum(dhprojs.astype(jnp.float32), axis=(0, 1))[None]
    return dw, db, dxp, dmask


def _bwd_scan(w, xp, mask, states, hprojs, dstates, unroll: int = 1):
    """XLA reverse scan over the kernel's bf16 residuals.

    Same gate algebra as ops.rnn._gru_core_bwd, working directly in the
    interleaved column space for the shared-mask form (gate math is
    columnwise, so interleaving is just a reshape to (B, J, 3, C)) and in
    the gate-major (3, T, B, Hp) layout for per-gate masks.  The per-step
    weight cotangent is NOT accumulated in the carry — gate cotangents are
    stacked as scan outputs and ``dw`` is a (Hp, T*B) x (T*B, ...) GEMM
    afterwards.
    """
    per_gate = mask.ndim == 3
    if per_gate:
        return _bwd_scan_pg(w, xp, mask, states, hprojs, dstates, unroll)
    seq_len, batch, chp = xp.shape
    hp = chp // 3
    j, c = hp // LANE, LANE
    h_prev = jnp.concatenate(
        [jnp.zeros((1, batch, hp), states.dtype), states[:-1]], axis=0)
    w_t = jnp.swapaxes(w, 0, 1)  # (3Hp, Hp) bf16, interleaved rows

    def gates4(x):  # (B, 3Hp) interleaved -> (B, J, 3, C)
        return x.reshape(batch, j, 3, c)

    def step(carry, inp):
        dh, dmask = carry
        ds_t, xp_t, hp_t, hprev_t = inp
        g = (ds_t + dh).reshape(batch, j, c)
        xp4 = gates4(xp_t).astype(jnp.float32)
        hp4 = gates4(hp_t).astype(jnp.float32)
        hprev4 = hprev_t.astype(jnp.float32).reshape(batch, j, c)
        r = jax.nn.sigmoid(xp4[:, :, 0] + hp4[:, :, 0])
        z = jax.nn.sigmoid(xp4[:, :, 1] + hp4[:, :, 1])
        n = jnp.tanh(xp4[:, :, 2] + r * hp4[:, :, 2])
        hn = hp4[:, :, 2]
        dn = g * (1.0 - z)
        dsz = g * (hprev4 - n) * z * (1.0 - z)
        dsn = dn * (1.0 - n * n)
        dhn = dsn * r
        dsr = dsn * hn * r * (1.0 - r)
        dh_proj = jnp.stack([dsr, dsz, dhn], axis=2).reshape(batch, 3 * hp)
        dx_proj = jnp.stack([dsr, dsz, dsn], axis=2).reshape(batch, 3 * hp)
        g_flat = g.reshape(batch, hp)
        z_flat = z.reshape(batch, hp)
        hprev_flat = hprev4.reshape(batch, hp)
        back = jnp.dot(dh_proj.astype(w_t.dtype), w_t,
                       preferred_element_type=jnp.float32)
        dh_new = g_flat * z_flat + back * mask
        dmask = dmask + back * hprev_flat
        return (dh_new, dmask), (dx_proj, dh_proj)

    (dh0, dmask), (dx_proj, dh_projs) = jax.lax.scan(
        step,
        (jnp.zeros((batch, hp), jnp.float32),
         jnp.zeros((batch, hp), jnp.float32)),
        (dstates, xp, hprojs, h_prev), reverse=True, unroll=unroll)

    h_in = (h_prev.astype(jnp.float32)
            * mask[None]).reshape(seq_len * batch, hp)
    dw = jnp.dot(h_in.astype(w.dtype).T,
                 dh_projs.reshape(seq_len * batch,
                                  3 * hp).astype(w.dtype),
                 preferred_element_type=jnp.float32)
    db = jnp.sum(dh_projs, axis=(0, 1))[None]
    return dw, db, dx_proj.astype(xp.dtype), dmask


def _bwd_scan_pg(w3, xp3, mask, states, hprojs3, dstates, unroll: int = 1):
    """Gate-major per-gate-mask reverse scan (fallback for _bwd_kernel_pg).

    ``w3`` (3, Hp, Hp), ``xp3``/``hprojs3`` as (xr, xz, xn) tuples of
    (T, B, Hp), ``mask`` (3, B, Hp).  Returns dw (3, Hp, Hp), db
    (3, 1, Hp), dxp as a matching tuple, dmask (3, B, Hp).  The tuples
    ride through ``lax.scan`` as pytree leaves — no stacked (3,T,B,Hp)
    rematerialization of the residuals on this fallback path either.
    """
    seq_len, batch, hp = xp3[0].shape
    h_prev = jnp.concatenate(
        [jnp.zeros((1, batch, hp), states.dtype), states[:-1]], axis=0)

    def step(carry, inp):
        dh, dmask = carry
        ds_t, xp_t, hp_t, hprev_t = inp  # xp_t/hp_t: (xr, xz, xn) tuples
        g = ds_t + dh
        xpf = tuple(x.astype(jnp.float32) for x in xp_t)
        hpf = tuple(h.astype(jnp.float32) for h in hp_t)
        hprev_f = hprev_t.astype(jnp.float32)
        r = jax.nn.sigmoid(xpf[0] + hpf[0])
        z = jax.nn.sigmoid(xpf[1] + hpf[1])
        hn = hpf[2]
        n = jnp.tanh(xpf[2] + r * hn)
        dn = g * (1.0 - z)
        dsz = g * (hprev_f - n) * z * (1.0 - z)
        dsn = dn * (1.0 - n * n)
        dhn = dsn * r
        dsr = dsn * hn * r * (1.0 - r)
        dh_new = g * z
        dmask_parts = []
        for gi, part in enumerate((dsr, dsz, dhn)):
            back_g = jax.lax.dot_general(
                part.astype(w3.dtype), w3[gi],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh_new = dh_new + back_g * mask[gi]
            dmask_parts.append(back_g * hprev_f)
        dmask = dmask + jnp.stack(dmask_parts)
        return (dh_new, dmask), ((dsr, dsz, dsn), (dsr, dsz, dhn))

    (dh0, dmask), (dx_proj, dh_projs) = jax.lax.scan(
        step,
        (jnp.zeros((batch, hp), jnp.float32),
         jnp.zeros((3, batch, hp), jnp.float32)),
        (dstates, xp3, hprojs3, h_prev), reverse=True, unroll=unroll)
    # scan stacks each pytree leaf time-major: tuples of (T, B, Hp)

    hp_f = h_prev.astype(jnp.float32)
    dws = []
    db3 = []
    for g in range(3):
        h_in_g = (hp_f * mask[g][None]).reshape(seq_len * batch, hp)
        dws.append(jnp.dot(h_in_g.astype(w3.dtype).T,
                           dh_projs[g].reshape(seq_len * batch,
                                               hp).astype(w3.dtype),
                           preferred_element_type=jnp.float32))
        db3.append(jnp.sum(dh_projs[g], axis=(0, 1)))
    dw = jnp.stack(dws)
    db = jnp.stack(db3)[:, None]
    dtype = xp3[0].dtype
    return dw, db, tuple(dx.astype(dtype) for dx in dx_proj), dmask


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_recurrence_pallas(w: jax.Array, b: jax.Array, xp: jax.Array,
                          mask: jax.Array, interpret: bool = False,
                          bwd_pallas: bool | None = None):
    """Differentiable fused recurrence on the padded interleaved domain
    (h0 = 0).

    Returns the (T, B, Hp) bf16 state stack.  The ``mask`` rank selects
    the layout contract: with a shared (B, Hp) mask, ``w`` (Hp, 3Hp) and
    ``xp`` (T, B, 3Hp) are gate-interleaved (see
    :func:`interleave_gates`) and ``b`` is (1, 3Hp) f32; with a
    (3, B, Hp) per-gate mask (skip-thoughts.torch BayesianGRU
    semantics), everything is gate-major — ``w`` (3, Hp, Hp), ``b``
    (3, 1, Hp) f32, and ``xp`` an (xr, xz, xn) TUPLE of (T, B, Hp)
    slabs (see :func:`_fwd_kernel_pg` for why no interleaving).

    ``bwd_pallas`` selects the backward implementation (fused kernel vs
    XLA reverse scan) as a static argument; ``None`` reads VQACX_GRU_BWD
    at trace time.  It is part of the custom_vjp's nondiff key on
    purpose: JAX caches custom_vjp backward traces, so an env read
    buried inside the cached backward is silently ignored once a trace
    with the other mode exists for the same shapes.
    """
    states, _ = gru_fwd_pallas(xp, w, b, mask, interpret=interpret)
    return states


def _gru_fwd(w, b, xp, mask, interpret, bwd_pallas):
    states, hprojs = gru_fwd_pallas(xp, w, b, mask, interpret=interpret)
    return states, (w, xp, mask, states, hprojs)


def _bwd_uses_pallas() -> bool:
    """VQACX_GRU_BWD: 'pallas' (default) fuses the reverse sweep in the
    kernel above; 'scan' keeps the XLA reverse scan (measured fallback)."""
    import os

    return os.environ.get("VQACX_GRU_BWD", "pallas") != "scan"


def _gru_bwd(interpret, bwd_pallas, res, dstates):
    w, xp, mask, states, hprojs = res
    if bwd_pallas is None:
        bwd_pallas = _bwd_uses_pallas()
    if bwd_pallas:
        dw, db, dxp, dmask = gru_bwd_pallas(w, xp, mask, states, hprojs,
                                            dstates, interpret=interpret)
    else:
        dw, db, dxp, dmask = _bwd_scan(w, xp, mask.astype(jnp.float32),
                                       states, hprojs,
                                       dstates.astype(jnp.float32))
    return (dw.astype(w.dtype), db.astype(jnp.float32), dxp,
            dmask.astype(mask.dtype))


gru_recurrence_pallas.defvjp(_gru_fwd, _gru_bwd)
