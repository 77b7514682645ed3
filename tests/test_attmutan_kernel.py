"""Folded-MUTAN attention Pallas kernel vs the XLA folded path.

All four inputs are trainable in pretraining, so the custom VJP must match
jax autodiff of the reference formula for every cotangent.  CPU tests run
the Mosaic interpreter.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_counterexamples_tpu.core import policy
from vqa_counterexamples_tpu.ops.pallas.attmutan_kernel import (
    folded_mutan_pallas)


def _ref(x_v, w3, b3, hq):
    # the XLA folded path with the kernel's bf16 rounding points
    weff = jnp.einsum("drm,brm->bdm", w3.astype(jnp.bfloat16),
                      hq.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    x_mm = jnp.einsum("bkd,bdm->bkm", x_v.astype(jnp.bfloat16), weff,
                      preferred_element_type=jnp.float32)
    bias = jnp.einsum("rm,brm->bm", b3.astype(jnp.float32),
                      hq.astype(jnp.float32))
    return (x_mm + bias[:, None, :]).astype(jnp.bfloat16)


def _mk(b=3, k=13, dh=22, rank=4, m=30, seed=0):
    r = np.random.default_rng(seed)
    x_v = jnp.asarray(r.normal(size=(b, k, dh)) * 0.5, jnp.float32)
    w3 = jnp.asarray(r.normal(size=(dh, rank, m)) * 0.2, jnp.float32)
    b3 = jnp.asarray(r.normal(size=(rank, m)) * 0.1, jnp.float32)
    hq = jnp.asarray(r.normal(size=(b, rank, m)) * 0.5, jnp.float32)
    return x_v, w3, b3, hq


def test_fwd_matches_folded_xla():
    x_v, w3, b3, hq = _mk()
    got = folded_mutan_pallas(x_v, w3, b3, hq, True)
    ref = _ref(x_v, w3, b3, hq)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_grads_match_autodiff():
    x_v, w3, b3, hq = _mk(seed=1)
    g = jnp.asarray(np.random.default_rng(2).normal(
        size=(3, 13, 30)), jnp.float32)

    def loss_k(args):
        out = folded_mutan_pallas(*args, True)
        return jnp.sum(out.astype(jnp.float32) * g)

    def loss_r(args):
        return jnp.sum(_ref(*args).astype(jnp.float32) * g)

    gk = jax.grad(loss_k)((x_v, w3, b3, hq))
    gr = jax.grad(loss_r)((x_v, w3, b3, hq))
    for a, b, name in zip(gk, gr, ("x_v", "w3", "b3", "hq")):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-2, rtol=5e-2, err_msg=name)


def test_model_path_matches(monkeypatch):
    # through MutanFusion.fuse_candidates: kernel vs XLA folded branch
    from vqa_counterexamples_tpu.models import fusion as fusion_mod

    opt = dict(dim_v=16, dim_q=12, dim_hv=22, dim_hq=12, dim_mm=30, R=4,
               dropout_v=0.0, dropout_q=0.0)
    mod = fusion_mod.MutanFusion(opt, visual_embedding=False,
                                 question_embedding=False)
    r = np.random.default_rng(3)
    x_v = jnp.asarray(r.normal(size=(2, 70, 22)) * 0.5, jnp.float32)
    x_q = jnp.asarray(r.normal(size=(2, 12)) * 0.5, jnp.float32)
    params = mod.init(jax.random.key(0), x_v[:, 0], x_q)["params"]

    def run(mode):
        monkeypatch.setenv("VQACX_ATT_PALLAS", mode)
        with policy.compute_dtype_scope("bfloat16"):
            return np.asarray(mod.apply(
                {"params": params}, x_v, x_q, deterministic=True,
                method=fusion_mod.MutanFusion.fuse_candidates), np.float32)

    ref = run("0")
    got = run("interpret")
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)
