"""Pallas kernels: interpreter-mode correctness vs the XLA reference path,
and VJP equivalence of the auto-dispatched op."""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_counterexamples_tpu.ops import fusion as fusion_ops
from vqa_counterexamples_tpu.ops.pallas.mutan_kernel import (
    tucker_rank_fusion_pallas)


def _inputs(B=96, dhv=24, dhq=20, dmm=16, R=3, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(B, dhv)), jnp.float32),
            jnp.asarray(rng.normal(size=(B, dhq)), jnp.float32),
            jnp.asarray(rng.normal(size=(dhv, R * dmm)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(R * dmm,)), jnp.float32),
            jnp.asarray(rng.normal(size=(dhq, R * dmm)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(R * dmm,)), jnp.float32))


def test_pallas_kernel_matches_xla_interpret():
    args = _inputs()
    ref = fusion_ops.tucker_rank_fusion(*args, rank=3)
    out = tucker_rank_fusion_pallas(*args, rank=3, tile_b=32,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_pallas_kernel_unaligned_batch():
    args = _inputs(B=77)  # pad path: 77 -> tile multiple
    ref = fusion_ops.tucker_rank_fusion(*args, rank=3)
    out = tucker_rank_fusion_pallas(*args, rank=3, tile_b=32,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_custom_vjp_matches_xla_grads():
    """The pallas-forward op's hand-written backward must equal autodiff of
    the einsum path."""
    args = _inputs(B=48)

    def loss_ref(*a):
        return jnp.sum(fusion_ops.tucker_rank_fusion(*a, rank=3) ** 2)

    def loss_pal(*a):
        # call the custom-vjp op directly in interpret mode via monkeypatch
        out = fusion_ops._tucker_pallas_vjp(*a, 3)
        return jnp.sum(out ** 2)

    # run the custom-vjp forward through the interpreter on CPU
    import vqa_counterexamples_tpu.ops.pallas.mutan_kernel as mk
    orig = mk.tucker_rank_fusion_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    mk.tucker_rank_fusion_pallas = interp
    try:
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5))(*args)
    finally:
        mk.tucker_rank_fusion_pallas = orig
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_auto_dispatch_uses_xla_on_cpu():
    args = _inputs()
    out = fusion_ops.tucker_rank_fusion_auto(*args, rank=3)
    ref = fusion_ops.tucker_rank_fusion(*args, rank=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
