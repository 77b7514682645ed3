"""Unit tests for fusion, scorer, top-k and metric ops against oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vqa_counterexamples_tpu.ops import fusion as fusion_ops
from vqa_counterexamples_tpu.ops import metrics as metrics_ops
from vqa_counterexamples_tpu.ops import scorer as scorer_ops
from vqa_counterexamples_tpu.ops import topk as topk_ops


def test_tucker_rank_fusion_matches_rank_loop():
    """Fused layout == explicit R-loop of per-rank linears (the reference
    MutanFusion math, fusion.py:100-116)."""
    B, Dv, Dq, Dm, R = 5, 7, 6, 4, 3
    rng = np.random.default_rng(0)
    xv = rng.normal(size=(B, Dv)).astype(np.float32)
    xq = rng.normal(size=(B, Dq)).astype(np.float32)
    wv = [rng.normal(size=(Dv, Dm)).astype(np.float32) for _ in range(R)]
    bv = [rng.normal(size=(Dm,)).astype(np.float32) for _ in range(R)]
    wq = [rng.normal(size=(Dq, Dm)).astype(np.float32) for _ in range(R)]
    bq = [rng.normal(size=(Dm,)).astype(np.float32) for _ in range(R)]

    oracle = sum((xv @ wv[r] + bv[r]) * (xq @ wq[r] + bq[r])
                 for r in range(R))

    w_v, b_v = fusion_ops.stack_rank_weights(
        [jnp.asarray(w) for w in wv], [jnp.asarray(b) for b in bv])
    w_q, b_q = fusion_ops.stack_rank_weights(
        [jnp.asarray(w) for w in wq], [jnp.asarray(b) for b in bq])
    fused = fusion_ops.tucker_rank_fusion(jnp.asarray(xv), jnp.asarray(xq),
                                          w_v, b_v, w_q, b_q, R)
    np.testing.assert_allclose(np.asarray(fused), oracle, rtol=1e-5,
                               atol=1e-5)


def test_scorer_decomposed_matches_naive_concat():
    B, K, Dv, Dq, Dz, Da, H = 4, 8, 16, 12, 10, 20, 32
    sl = scorer_ops.FeatureSlices(dim_v=Dv, dim_q=Dq, dim_z=Dz, dim_a=Da,
                                  knn_size=K)
    rng = np.random.default_rng(0)
    feats = dict(
        v_orig=rng.normal(size=(B, Dv)), v_knns=rng.normal(size=(B, K, Dv)),
        v_mult=rng.normal(size=(B, K, Dv)), v_dist=rng.normal(size=(B, K)),
        v_rank=rng.normal(size=(B, K, K)), q_emb=rng.normal(size=(B, Dq)),
        z_orig=rng.normal(size=(B, Dz)), z_knns=rng.normal(size=(B, K, Dz)),
        a_emb_gt=rng.normal(size=(B, Da)),
        a_emb_knns=rng.normal(size=(B, K, Da)))
    feats = {k: jnp.asarray(v, jnp.float32) for k, v in feats.items()}
    w1 = jnp.asarray(rng.normal(size=(sl.input_size, H)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(H,)), jnp.float32)
    a = scorer_ops.first_layer_decomposed(w1, b1, sl, **feats)
    b = scorer_ops.naive_concat_first_layer(w1, b1, sl, **feats)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                               atol=2e-4)


def test_scorer_input_size_matches_reference():
    """Reference NeuralCX input dim is 14089 (cx.py:245-251, SURVEY 2.2)."""
    sl = scorer_ops.FeatureSlices(dim_v=2048, dim_q=2400, dim_z=360,
                                  dim_a=2400, knn_size=24)
    assert sl.input_size == 14089


def test_knn_matches_numpy_oracle():
    N, D, k = 200, 16, 5
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, D)).astype(np.float32)
    dist, idx = topk_ops.knn(feats, k=k, batch_size=64)
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    oracle_idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    # self is always rank 0 (sklearn contract, reference knn.py:47-53)
    assert (idx[:, 0] == np.arange(N)).all()
    oracle_d = np.sqrt(np.take_along_axis(d2, oracle_idx, axis=1))
    # the |q|^2 - 2qf + |f|^2 trick loses ~1e-2 absolute near zero in f32
    np.testing.assert_allclose(np.sort(dist, axis=1), np.sort(oracle_d, axis=1),
                               rtol=1e-3, atol=1e-2)
    # index sets agree except where distances tie
    same = (idx == oracle_idx).mean()
    assert same > 0.99


def test_sharded_knn_matches_single_device():
    from vqa_counterexamples_tpu.parallel import make_mesh

    N, D, k = 64, 8, 4
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(N, D)).astype(np.float32)
    queries = feats[:16]
    _, idx_single = topk_ops.knn_chunk(jnp.asarray(queries),
                                       jnp.asarray(feats), k)
    mesh = make_mesh({"data": 8})
    dist_sh, idx_sh = topk_ops.sharded_knn_chunk(
        jnp.asarray(queries), jnp.asarray(feats), k, mesh)
    np.testing.assert_array_equal(np.asarray(idx_single), np.asarray(idx_sh))


def test_recall_at_k():
    scores = jnp.asarray([[0.1, 0.9, 0.5], [0.9, 0.1, 0.5]])
    gt = jnp.asarray([1, 1])
    np.testing.assert_array_equal(
        np.asarray(metrics_ops.recall_at_k(scores, gt, k=1)), [1.0, 0.0])
    np.testing.assert_array_equal(
        np.asarray(metrics_ops.recall_at_k(scores, gt, k=2)), [1.0, 0.0])
    np.testing.assert_array_equal(
        np.asarray(metrics_ops.recall_at_k(scores, gt, k=3)), [1.0, 1.0])


def test_cross_entropy_matches_torch():
    B, C = 6, 10
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(B, C)).astype(np.float32)
    labels = rng.integers(0, C, size=B)
    ours = float(metrics_ops.cross_entropy_sum(jnp.asarray(logits),
                                               jnp.asarray(labels)))
    ref = torch.nn.CrossEntropyLoss(reduction="sum")(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    assert abs(ours - ref) < 1e-4


def test_accuracy_topk_matches_reference_semantics():
    logits = jnp.asarray([[0.9, 0.05, 0.05], [0.2, 0.5, 0.3],
                          [0.1, 0.2, 0.7], [0.4, 0.4, 0.2]])
    target = jnp.asarray([0, 2, 2, 1])
    acc1, acc2 = metrics_ops.accuracy_topk(logits, target, topk=(1, 2))
    assert abs(float(acc1) - 50.0) < 1e-5   # rows 0 and 2 correct @1
    assert abs(float(acc2) - 100.0) < 1e-5  # all within top-2


def test_pairwise_distance_matches_torch():
    a = np.random.default_rng(0).normal(size=(5, 7)).astype(np.float32)
    b = np.random.default_rng(1).normal(size=(5, 7)).astype(np.float32)
    ours = np.asarray(metrics_ops.pairwise_distance(
        jnp.asarray(a), jnp.asarray(b), keepdims=False))
    ref = torch.nn.functional.pairwise_distance(
        torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
