"""Parity of the fused Pallas GRU recurrence vs the lax.scan path.

Runs through the Mosaic interpreter on the CPU test mesh; on-TPU timings
live in scripts/bench_vqa.py.  The kernel is part of the bf16 compute
policy (bf16 state carry), so comparisons are against the scan path under
the same policy with bf16-appropriate tolerances.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_counterexamples_tpu.ops import rnn
from vqa_counterexamples_tpu.ops.pallas.gru_kernel import (
    gru_fwd_pallas, gru_recurrence_pallas)


def _mk(batch=4, seq=5, dim_in=12, dim_h=20, seed=0):
    rng = np.random.default_rng(seed)
    params = rnn.GRUParams(
        w_ih=jnp.asarray(rng.normal(size=(dim_in, 3 * dim_h)) * 0.2,
                         jnp.float32),
        b_ih=jnp.asarray(rng.normal(size=(3 * dim_h,)) * 0.1, jnp.float32),
        w_hh=jnp.asarray(rng.normal(size=(dim_h, 3 * dim_h)) * 0.2,
                         jnp.float32),
        b_hh=jnp.asarray(rng.normal(size=(3 * dim_h,)) * 0.1, jnp.float32),
    )
    x = jnp.asarray(rng.normal(size=(batch, seq, dim_in)), jnp.float32)
    return params, x


def _pad_args(params, x, dim_h, mask=None):
    """Build the padded, gate-interleaved kernel arguments the integration
    path would."""
    from vqa_counterexamples_tpu.ops.pallas.gru_kernel import (
        LANE, interleave_gates)

    hp = ((dim_h + LANE - 1) // LANE) * LANE
    pad = hp - dim_h
    xt = jnp.swapaxes(x, 0, 1)
    seq, batch, _ = xt.shape

    def pad_gates(w):
        w3 = jnp.pad(w.reshape(w.shape[:-1] + (3, dim_h)),
                     [(0, 0)] * (w.ndim - 1) + [(0, 0), (0, pad)])
        return interleave_gates(w3)

    w_ih = pad_gates(params.w_ih)
    b_ih = pad_gates(params.b_ih)
    xp = (xt.reshape(seq * batch, -1).astype(jnp.bfloat16)
          @ w_ih.astype(jnp.bfloat16)
          + b_ih).reshape(seq, batch, 3 * hp)
    xp = xp.astype(jnp.bfloat16)
    w_hh = jnp.pad(pad_gates(params.w_hh),
                   ((0, pad), (0, 0))).astype(jnp.bfloat16)
    b_hh = pad_gates(params.b_hh)[None]
    if mask is None:
        mask = jnp.ones((batch, hp), jnp.bfloat16)
    else:
        mask = jnp.pad(mask, ((0, 0), (0, pad))).astype(jnp.bfloat16)
    return xp, w_hh, b_hh, mask, hp


def test_fwd_matches_scan():
    params, x = _mk()
    dim_h = params.w_hh.shape[0]
    ref = rnn.gru_scan(params, x)  # f32 scan
    xp, w_hh, b_hh, mask, hp = _pad_args(params, x, dim_h)
    states, hprojs = gru_fwd_pallas(xp, w_hh, b_hh, mask, interpret=True)
    got = jnp.swapaxes(states[:, :, :dim_h], 0, 1).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)
    # padded hidden columns stay exactly zero through the recurrence
    assert hp > dim_h
    np.testing.assert_array_equal(
        np.asarray(states[:, :, dim_h:], np.float32), 0.0)


def test_fwd_hproj_residuals_match():
    params, x = _mk(seed=3)
    dim_h = params.w_hh.shape[0]
    xp, w_hh, b_hh, mask, hp = _pad_args(params, x, dim_h)
    states, hprojs = gru_fwd_pallas(xp, w_hh, b_hh, mask, interpret=True)
    # recompute h_proj[t] = (h[t-1] * mask) @ w + b from the state stack
    # (both sides in the interleaved column space)
    h_prev = jnp.concatenate(
        [jnp.zeros((1,) + states.shape[1:], states.dtype), states[:-1]],
        axis=0)
    want = (jnp.einsum("tbh,hk->tbk",
                       (h_prev * mask[None]).astype(jnp.float32),
                       w_hh.astype(jnp.float32))
            + b_hh[0][None, None])
    np.testing.assert_allclose(np.asarray(hprojs, np.float32),
                               np.asarray(want), atol=5e-2, rtol=5e-2)


def test_grads_match_scan():
    params, x = _mk(batch=3, seq=4, dim_in=8, dim_h=16, seed=1)
    dim_h = params.w_hh.shape[0]

    def loss_scan(params, x):
        states = rnn.gru_scan(params, x)
        return jnp.sum(jnp.tanh(states))

    def loss_pallas(params, x):
        xp, w_hh, b_hh, mask, hp = _pad_args(params, x, dim_h)
        states = gru_recurrence_pallas(w_hh, b_hh, xp, mask, True)
        return jnp.sum(jnp.tanh(states[:, :, :dim_h].astype(jnp.float32)))

    g_ref = jax.grad(lambda p: loss_scan(p, x))(params)
    g_got = jax.grad(lambda p: loss_pallas(p, x))(params)
    for a, b, name in [(g_got.w_hh, g_ref.w_hh, "w_hh"),
                       (g_got.b_hh, g_ref.b_hh, "b_hh"),
                       (g_got.w_ih, g_ref.w_ih, "w_ih"),
                       (g_got.b_ih, g_ref.b_ih, "b_ih")]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=8e-2, rtol=8e-2, err_msg=name)


def test_bwd_kernel_matches_bwd_scan():
    """The fused Pallas backward and the XLA reverse-scan backward agree
    on every cotangent, including through a dropout mask.

    The VQACX_GRU_BWD switch must stay set across the WHOLE jax.grad
    call: the custom_vjp bwd reads it when the backward traces, which
    happens after the forward python function has returned (a previous
    version of this test popped the var inside the loss fn, so both
    arms silently ran the same backward).  A call counter on _bwd_scan
    proves each arm executed the backward it claims to."""
    from vqa_counterexamples_tpu.ops.pallas import gru_kernel as gk

    params, x = _mk(batch=3, seq=4, dim_in=8, dim_h=16, seed=4)
    dim_h = params.w_hh.shape[0]
    mask = (np.random.default_rng(9).random((3, dim_h)) > 0.3).astype(
        np.float32) / 0.7

    def loss(params):
        xp, w_hh, b_hh, m, hp = _pad_args(params, x, dim_h,
                                          mask=jnp.asarray(mask))
        states = gru_recurrence_pallas(w_hh, b_hh, xp, m, True)
        return jnp.sum(jnp.cos(states[:, :, :dim_h].astype(jnp.float32)))

    calls = {"scan": 0}
    orig_bwd_scan = gk._bwd_scan

    def counting_bwd_scan(*a, **k):
        calls["scan"] += 1
        return orig_bwd_scan(*a, **k)

    gk._bwd_scan = counting_bwd_scan
    try:
        os.environ["VQACX_GRU_BWD"] = "pallas"
        g_pallas = jax.grad(loss)(params)
        assert calls["scan"] == 0, "pallas arm fell back to the scan bwd"
        os.environ["VQACX_GRU_BWD"] = "scan"
        g_scan = jax.grad(loss)(params)
        assert calls["scan"] >= 1, "scan arm never ran the scan bwd"
    finally:
        gk._bwd_scan = orig_bwd_scan
        os.environ.pop("VQACX_GRU_BWD", None)
    for name in ["w_hh", "b_hh", "w_ih", "b_ih"]:
        np.testing.assert_allclose(
            np.asarray(getattr(g_pallas, name)),
            np.asarray(getattr(g_scan, name)),
            atol=3e-2, rtol=3e-2, err_msg=name)


def _count_pallas_path():
    """Wrap rnn._gru_pallas_path with a call counter.  Returns (counter,
    restore_fn).  The dispatch tests MUST assert the kernel arm really
    took the kernel path: VQACX_COMPUTE_DTYPE set via os.environ after
    core.policy has been imported is a no-op (the policy latches the env
    at import — the API is policy.compute_dtype_scope), which once made
    this whole family of tests silently compare the scan path to itself
    (code-review r4 finding)."""
    counter = {"n": 0}
    orig = rnn._gru_pallas_path

    def counting(*a, **k):
        counter["n"] += 1
        return orig(*a, **k)

    rnn._gru_pallas_path = counting
    return counter, lambda: setattr(rnn, "_gru_pallas_path", orig)


def test_gru_scan_dispatch_parity():
    """VQACX_GRU_PALLAS=interpret routes gru_scan through the kernel and
    matches the scan path (same bf16 policy) including dropout masks."""
    from vqa_counterexamples_tpu.core import policy

    params, x = _mk(batch=6, seq=5, dim_in=10, dim_h=24, seed=2)
    counter, restore = _count_pallas_path()
    os.environ["VQACX_GRU_PALLAS"] = "interpret"
    try:
        with policy.compute_dtype_scope(jnp.bfloat16):
            got = rnn.gru_scan(params, x)
            assert got.shape == (6, 5, 24)
            assert counter["n"] == 1, "interpret arm did not take the kernel"
            os.environ["VQACX_GRU_PALLAS"] = "0"
            ref = rnn.gru_scan(params, x)
            assert counter["n"] == 1, "scan arm took the kernel path"
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(ref, np.float32),
                                       atol=5e-2, rtol=5e-2)
            # dropout path: same rng -> same masks in both formulations
            key = jax.random.key(7)
            os.environ["VQACX_GRU_PALLAS"] = "interpret"
            got_d = rnn.gru_scan(params, x, dropout=0.5,
                                 deterministic=False, rng=key)
            assert counter["n"] == 2
            os.environ["VQACX_GRU_PALLAS"] = "0"
            ref_d = rnn.gru_scan(params, x, dropout=0.5,
                                 deterministic=False, rng=key)
            np.testing.assert_allclose(np.asarray(got_d, np.float32),
                                       np.asarray(ref_d, np.float32),
                                       atol=8e-2, rtol=8e-2)
    finally:
        restore()
        os.environ.pop("VQACX_GRU_PALLAS", None)


def test_gru_scan_per_gate_dispatch_parity():
    """per_gate_masks=True (six independent masks — the BayesianUniSkip
    default, VERDICT r3 #4) agrees between the per-gate kernel variant and
    the per-gate lax.scan path, forward AND grads, under the same rng."""
    from vqa_counterexamples_tpu.core import policy

    params, x = _mk(batch=6, seq=5, dim_in=10, dim_h=24, seed=5)
    key = jax.random.key(11)
    counter, restore = _count_pallas_path()

    def loss(p, mode):
        os.environ["VQACX_GRU_PALLAS"] = mode
        states = rnn.gru_scan(p, x, dropout=0.4, deterministic=False,
                              rng=key, per_gate_masks=True)
        return jnp.sum(jnp.tanh(states.astype(jnp.float32))), states

    try:
        with policy.compute_dtype_scope(jnp.bfloat16):
            (l_got, got), g_got = jax.value_and_grad(
                lambda p: loss(p, "interpret"), has_aux=True)(params)
            assert counter["n"] >= 1, "kernel arm did not take the kernel"
            n_after_kernel = counter["n"]
            (l_ref, ref), g_ref = jax.value_and_grad(
                lambda p: loss(p, "0"), has_aux=True)(params)
            assert counter["n"] == n_after_kernel, \
                "scan arm took the kernel path"
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(ref, np.float32),
                                       atol=8e-2, rtol=8e-2)
            for name in ("w_ih", "b_ih", "w_hh", "b_hh"):
                np.testing.assert_allclose(
                    np.asarray(getattr(g_got, name), np.float32),
                    np.asarray(getattr(g_ref, name), np.float32),
                    atol=8e-2, rtol=8e-2, err_msg=name)
            # per-gate masks genuinely differ from the shared-mask result
            os.environ["VQACX_GRU_PALLAS"] = "0"
            shared = rnn.gru_scan(params, x, dropout=0.4,
                                  deterministic=False, rng=key,
                                  per_gate_masks=False)
            assert not np.allclose(np.asarray(ref, np.float32),
                                   np.asarray(shared, np.float32),
                                   atol=1e-3)
    finally:
        restore()
        os.environ.pop("VQACX_GRU_PALLAS", None)


def test_gru_bwd_scan_per_gate_matches_pallas_bwd():
    """VQACX_GRU_BWD=scan (the measured fallback) also implements the
    per-gate backward: cotangents match the fused kernel backward.

    As in test_bwd_kernel_matches_bwd_scan, the switch must span the
    whole jax.grad call (the bwd traces after the forward fn returns)
    and a _bwd_scan call counter proves each arm took its path."""
    from vqa_counterexamples_tpu.core import policy
    from vqa_counterexamples_tpu.ops.pallas import gru_kernel as gk

    params, x = _mk(batch=3, seq=4, dim_in=8, dim_h=16, seed=6)
    key = jax.random.key(13)
    os.environ["VQACX_GRU_PALLAS"] = "interpret"

    def loss(p):
        states = rnn.gru_scan(p, x, dropout=0.4, deterministic=False,
                              rng=key, per_gate_masks=True)
        return jnp.sum(jnp.cos(states.astype(jnp.float32)))

    calls = {"scan": 0}
    orig_bwd_scan = gk._bwd_scan

    def counting_bwd_scan(*a, **k):
        calls["scan"] += 1
        return orig_bwd_scan(*a, **k)

    gk._bwd_scan = counting_bwd_scan
    try:
        with policy.compute_dtype_scope(jnp.bfloat16):
            os.environ["VQACX_GRU_BWD"] = "pallas"
            g_pallas = jax.grad(loss)(params)
            assert calls["scan"] == 0, \
                "pallas arm fell back to the scan bwd"
            os.environ["VQACX_GRU_BWD"] = "scan"
            g_scan = jax.grad(loss)(params)
            assert calls["scan"] >= 1, "scan arm never ran the scan bwd"
        for name in ("w_ih", "b_ih", "w_hh", "b_hh"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_pallas, name), np.float32),
                np.asarray(getattr(g_scan, name), np.float32),
                atol=3e-2, rtol=3e-2, err_msg=name)
    finally:
        gk._bwd_scan = orig_bwd_scan
        os.environ.pop("VQACX_GRU_BWD", None)
        os.environ.pop("VQACX_GRU_PALLAS", None)


def test_chunked_batch_matches_unchunked(monkeypatch):
    """Batches beyond the kernel's VMEM plan (MAX_BATCH) run as equal
    chunks — same states and grads as one kernel call."""
    from vqa_counterexamples_tpu.core import policy
    from vqa_counterexamples_tpu.ops.pallas import gru_kernel

    params, x = _mk(batch=20, seq=4, dim_in=10, dim_h=16, seed=3)
    os.environ["VQACX_GRU_PALLAS"] = "interpret"
    try:
        with policy.compute_dtype_scope("bfloat16"):
            ref = rnn.gru_scan(params, x)

            def loss(p):
                return jnp.sum(rnn.gru_scan(p, x).astype(jnp.float32))

            g_ref = jax.grad(lambda p: loss(p))(params)

            monkeypatch.setattr(gru_kernel, "MAX_BATCH", 8)  # 20 -> 3 chunks
            got = rnn.gru_scan(params, x)
            g_got = jax.grad(lambda p: loss(p))(params)

        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-5, rtol=1e-5)
        # grads: the chunked dW accumulates per chunk before the final
        # sum — a different bf16 summation order than one kernel pass
        for name in ("w_ih", "b_ih", "w_hh", "b_hh"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_got, name), np.float32),
                np.asarray(getattr(g_ref, name), np.float32),
                atol=3e-2, rtol=3e-2, err_msg=name)
    finally:
        os.environ.pop("VQACX_GRU_PALLAS", None)


def test_chunked_batch_matches_unchunked_per_gate(monkeypatch):
    """The chunked-batch path also carries the gate-major per-gate
    variant: the (xr, xz, xn) tuple and 3-axis mask slice per chunk and
    states/grads match one kernel call (same rng -> same masks)."""
    from vqa_counterexamples_tpu.core import policy
    from vqa_counterexamples_tpu.ops.pallas import gru_kernel

    params, x = _mk(batch=20, seq=4, dim_in=10, dim_h=16, seed=8)
    key = jax.random.key(21)
    os.environ["VQACX_GRU_PALLAS"] = "interpret"
    try:
        with policy.compute_dtype_scope("bfloat16"):
            def run(p):
                return rnn.gru_scan(p, x, dropout=0.4, deterministic=False,
                                    rng=key, per_gate_masks=True)

            def loss(p):
                return jnp.sum(run(p).astype(jnp.float32))

            ref = run(params)
            g_ref = jax.grad(loss)(params)

            monkeypatch.setattr(gru_kernel, "MAX_BATCH", 8)  # 20 -> 3 chunks
            got = run(params)
            g_got = jax.grad(loss)(params)

        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-5, rtol=1e-5)
        for name in ("w_ih", "b_ih", "w_hh", "b_hh"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_got, name), np.float32),
                np.asarray(getattr(g_ref, name), np.float32),
                atol=3e-2, rtol=3e-2, err_msg=name)
    finally:
        os.environ.pop("VQACX_GRU_PALLAS", None)
