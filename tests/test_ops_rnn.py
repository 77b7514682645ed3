"""Parity tests: scan GRU/LSTM cells vs torch.nn.GRU / torch.nn.LSTM.

The reference encoders are torch RNNs (seq2vec.py:38,58-59) and the
skip-thoughts GRU; transplanting the exact weights into our cells must
reproduce torch outputs to f32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vqa_counterexamples_tpu.ops import rnn as rnn_ops


def test_process_lengths():
    wids = jnp.asarray([[1, 2, 3, 0, 0], [5, 4, 3, 2, 1], [7, 0, 0, 0, 0]])
    assert rnn_ops.process_lengths(wids).tolist() == [3, 5, 1]


def test_select_last():
    states = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    lengths = jnp.asarray([2, 4])
    out = rnn_ops.select_last(states, lengths)
    np.testing.assert_allclose(out, states[[0, 1], [1, 3]])


@pytest.mark.parametrize("seed", [0, 1])
def test_gru_matches_torch(seed):
    B, T, D, H = 3, 7, 5, 11
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, T, D)).astype(np.float32)

    tg = torch.nn.GRU(D, H, batch_first=True)
    with torch.no_grad():
        out_t, _ = tg(torch.from_numpy(x))

    # torch stores weight_ih_l0 (3H, D) in gate order r,z,n
    params = rnn_ops.GRUParams(
        w_ih=jnp.asarray(tg.weight_ih_l0.detach().numpy().T),
        b_ih=jnp.asarray(tg.bias_ih_l0.detach().numpy()),
        w_hh=jnp.asarray(tg.weight_hh_l0.detach().numpy().T),
        b_hh=jnp.asarray(tg.bias_hh_l0.detach().numpy()),
    )
    out_j = rnn_ops.gru_scan(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0])
def test_lstm_matches_torch(seed):
    B, T, D, H = 2, 6, 4, 9
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, T, D)).astype(np.float32)

    tl = torch.nn.LSTM(D, H, batch_first=True)
    with torch.no_grad():
        out_t, _ = tl(torch.from_numpy(x))

    params = rnn_ops.LSTMParams(
        w_ih=jnp.asarray(tl.weight_ih_l0.detach().numpy().T),
        b_ih=jnp.asarray(tl.bias_ih_l0.detach().numpy()),
        w_hh=jnp.asarray(tl.weight_hh_l0.detach().numpy().T),
        b_hh=jnp.asarray(tl.bias_hh_l0.detach().numpy()),
    )
    out_j = rnn_ops.lstm_scan(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_gru_variational_dropout_deterministic_off():
    """deterministic=True must equal dropout=0 exactly."""
    B, T, D, H = 2, 5, 4, 6
    key = jax.random.key(0)
    params = rnn_ops.gru_init(key, D, H)
    x = jax.random.normal(jax.random.key(1), (B, T, D))
    a = rnn_ops.gru_scan(params, x, dropout=0.5, deterministic=True)
    b = rnn_ops.gru_scan(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_gru_variational_dropout_mask_shared_over_time():
    """With dropout, a zeroed input channel must stay zeroed at every step
    (variational semantics: one mask per sequence)."""
    B, T, D, H = 1, 6, 8, 4
    params = rnn_ops.gru_init(jax.random.key(0), D, H)
    x = jnp.ones((B, T, D))
    outs = set()
    for s in range(5):
        out = rnn_ops.gru_scan(params, x, dropout=0.5, deterministic=False,
                               rng=jax.random.key(s))
        outs.add(float(jnp.sum(out)))
    assert len(outs) > 1  # masks differ across rngs


@pytest.mark.parametrize("dropout", [0.0, 0.4])
def test_gru_split_backward_grad_parity(monkeypatch, dropout):
    """The hand-written split VJP (_gru_core) must match jax's automatic
    scan transpose for every input: weights, biases, inputs, h0."""
    B, T, D, H = 3, 7, 5, 12
    params = rnn_ops.gru_init(jax.random.key(0), D, H)
    x = jax.random.normal(jax.random.key(1), (B, T, D))
    rng = jax.random.key(7)

    def loss(params, x):
        states = rnn_ops.gru_scan(params, x, dropout=dropout,
                                  deterministic=dropout == 0.0, rng=rng,
                                  time_major_out=True)
        lengths = jnp.asarray([T, T - 2, 3])
        last = rnn_ops.select_last_tm(states, lengths)
        return jnp.sum(last ** 2) + 0.1 * jnp.sum(states)

    grads = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("VQACX_RNN_SPLIT_BWD", flag)
        grads[flag] = jax.grad(loss, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(grads["0"]),
                    jax.tree_util.tree_leaves(grads["1"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_gru_split_backward_value_parity(monkeypatch):
    """Forward values are identical with the split VJP on and off."""
    B, T, D, H = 2, 5, 4, 6
    params = rnn_ops.gru_init(jax.random.key(3), D, H)
    x = jax.random.normal(jax.random.key(4), (B, T, D))
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("VQACX_RNN_SPLIT_BWD", flag)
        outs[flag] = np.asarray(rnn_ops.gru_scan(params, x))
    np.testing.assert_array_equal(outs["0"], outs["1"])


def test_lstm_split_backward_grad_parity(monkeypatch):
    """Split VJP for the LSTM matches jax's automatic scan transpose."""
    B, T, D, H = 3, 6, 5, 9
    params = rnn_ops.lstm_init(jax.random.key(0), D, H)
    x = jax.random.normal(jax.random.key(1), (B, T, D))

    def loss(params, x):
        states = rnn_ops.lstm_scan(params, x, time_major_out=True)
        lengths = jnp.asarray([T, T - 1, 2])
        last = rnn_ops.select_last_tm(states, lengths)
        return jnp.sum(last ** 2) + 0.1 * jnp.sum(states)

    grads = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("VQACX_RNN_SPLIT_BWD", flag)
        grads[flag] = jax.grad(loss, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(grads["0"]),
                    jax.tree_util.tree_leaves(grads["1"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
