"""Full-model numerics parity: flax MutanNoAtt == a torch oracle built
in-test from the reference formulas, on identical transplanted weights.

Covers the whole VQA forward — TwoLSTM encoder (embed -> tanh -> 2 stacked
LSTMs -> concat last states, reference seq2vec.py:48-76), MUTAN rank-R
fusion (fusion.py:53-121), classifier (noatt.py:24-35) — so any end-to-end
numerics drift is caught without COCO data (VERDICT.md round-1 item 9).
"""

import numpy as np
import torch
import torch.nn.functional as F


def _torch_lstm_from_params(p, dim_in, dim_h):
    """torch.nn.LSTM carrying our LSTMParams (gate order i,f,g,o matches)."""
    lstm = torch.nn.LSTM(dim_in, dim_h, batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p.w_ih).T.copy()))
        lstm.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p.w_hh).T.copy()))
        lstm.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p.b_ih)))
        lstm.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p.b_hh)))
    return lstm


def _select_last(states, lengths):
    return torch.stack([states[b, lengths[b] - 1] for b in
                        range(states.shape[0])])


def test_mutan_noatt_full_forward_matches_torch_oracle():
    import jax
    import jax.numpy as jnp

    from vqa_counterexamples_tpu.data import synthetic
    from vqa_counterexamples_tpu.models import factory

    V, EMB, H = 12, 6, 7
    DIM_V, DIM_Q = 10, 2 * H
    DIM_HV = DIM_HQ = 8
    R, DIM_MM, NANS = 3, 9, 5
    B, T = 4, 9

    opt = {
        "arch": "MutanNoAtt", "dim_v": DIM_V, "dim_q": DIM_Q,
        "seq2vec": {"arch": "2-lstm", "emb_size": EMB, "hidden_size": H},
        "fusion": {"dim_v": DIM_V, "dim_q": DIM_Q, "dim_hv": DIM_HV,
                   "dim_hq": DIM_HQ, "dim_mm": DIM_MM, "R": R,
                   "dropout_v": 0.5, "dropout_q": 0.5,
                   "activation_v": "tanh", "activation_q": "tanh",
                   "dropout_hv": 0, "dropout_hq": 0},
        "classif": {"dropout": 0.5},
    }
    words = ["w%d" % i for i in range(V)]
    answers = ["a%d" % i for i in range(NANS)]
    model = factory.factory_vqa(opt, words, answers)

    rng = np.random.default_rng(0)
    wids = rng.integers(1, V + 1, size=(B, T)).astype(np.int32)
    wids[0, 6:] = 0  # right padding
    visual = rng.normal(size=(B, DIM_V)).astype(np.float32)

    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(visual), jnp.asarray(wids), deterministic=True)
    params = variables["params"]
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(visual),
                                  jnp.asarray(wids), deterministic=True))

    # ---- torch oracle assembled from the reference formulas ----
    p_seq = params["seq2vec"]
    p_fus = params["fusion_module"]
    p_cls = params["linear_classif"]

    emb_table = torch.from_numpy(np.asarray(p_seq["embedding"]["embedding"]))
    wids_t = torch.from_numpy(wids.astype(np.int64))
    emb = F.embedding(wids_t, emb_table, padding_idx=0)
    x = torch.tanh(emb)
    lstm0 = _torch_lstm_from_params(p_seq["lstm_0"], EMB, H)
    lstm1 = _torch_lstm_from_params(p_seq["lstm_1"], H, H)
    with torch.no_grad():
        x0, _ = lstm0(x)
        x1, _ = lstm1(x0)
    lengths = (wids != 0).sum(1)
    q_emb = torch.cat([_select_last(x0, lengths),
                       _select_last(x1, lengths)], dim=1)

    def linear(x, tree):
        w = torch.from_numpy(np.asarray(tree["kernel"]))
        b = torch.from_numpy(np.asarray(tree["bias"]))
        return x @ w + b

    # MUTAN: x_v/x_q projections (dropout = identity in eval), tanh, then
    # sum_r (x_v Wv_r) * (x_q Wq_r) with our stacked (din, R*dmm) layout
    x_v = torch.tanh(linear(torch.from_numpy(visual), p_fus["linear_v"]))
    x_q = torch.tanh(linear(q_emb, p_fus["linear_q"]))
    w_hv = torch.from_numpy(np.asarray(p_fus["w_hv"]))
    b_hv = torch.from_numpy(np.asarray(p_fus["b_hv"]))
    w_hq = torch.from_numpy(np.asarray(p_fus["w_hq"]))
    b_hq = torch.from_numpy(np.asarray(p_fus["b_hq"]))
    hv = (x_v @ w_hv + b_hv).reshape(B, R, DIM_MM)
    hq = (x_q @ w_hq + b_hq).reshape(B, R, DIM_MM)
    x_mm = (hv * hq).sum(dim=1)

    oracle = linear(x_mm, p_cls).numpy()

    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_mutan_noatt_per_rank_loop_equals_stacked_layout():
    """The reference computes the Tucker sum as an R-iteration Python loop
    over per-rank (din, dmm) weights (fusion.py:100-116); our stacked layout
    must be the exact same function of per-rank slices."""
    rng = np.random.default_rng(1)
    B, DIN_V, DIN_Q, R, DMM = 5, 8, 6, 4, 7
    x_v = rng.normal(size=(B, DIN_V)).astype(np.float32)
    x_q = rng.normal(size=(B, DIN_Q)).astype(np.float32)
    w_v = rng.normal(size=(DIN_V, R * DMM)).astype(np.float32)
    b_v = rng.normal(size=(R * DMM,)).astype(np.float32)
    w_q = rng.normal(size=(DIN_Q, R * DMM)).astype(np.float32)
    b_q = rng.normal(size=(R * DMM,)).astype(np.float32)

    import jax.numpy as jnp

    from vqa_counterexamples_tpu.ops.fusion import tucker_rank_fusion

    ours = np.asarray(tucker_rank_fusion(
        jnp.asarray(x_v), jnp.asarray(x_q), jnp.asarray(w_v),
        jnp.asarray(b_v), jnp.asarray(w_q), jnp.asarray(b_q), R))

    # reference-style loop over per-rank column blocks
    acc = np.zeros((B, DMM), np.float32)
    for r in range(R):
        sl = slice(r * DMM, (r + 1) * DMM)
        acc += (x_v @ w_v[:, sl] + b_v[sl]) * (x_q @ w_q[:, sl] + b_q[sl])
    np.testing.assert_allclose(ours, acc, rtol=1e-4, atol=1e-5)
