"""Weight porting: skip-thoughts converter + npz grafting round trip."""

import numpy as np
import pytest
import torch

from vqa_counterexamples_tpu.cli.port_skipthoughts import convert_state_dict


def test_convert_torch_gru_state_dict(tmp_path):
    V, D, H = 10, 6, 8
    sd = {
        "embedding.weight": torch.randn(V + 1, D),
        "rnn.weight_ih_l0": torch.randn(3 * H, D),
        "rnn.weight_hh_l0": torch.randn(3 * H, H),
        "rnn.bias_ih_l0": torch.randn(3 * H),
        "rnn.bias_hh_l0": torch.randn(3 * H),
    }
    out = convert_state_dict(sd, vocab_size=V)
    assert out["embedding"].shape == (V + 1, D)
    assert out["w_ih"].shape == (D, 3 * H)
    assert out["w_hh"].shape == (H, 3 * H)
    np.testing.assert_allclose(out["w_ih"],
                               sd["rnn.weight_ih_l0"].numpy().T)

    with pytest.raises(ValueError):
        convert_state_dict(sd, vocab_size=V + 5)


def test_ported_weights_drive_the_encoder(tmp_path):
    """npz -> load_skipthoughts_npz -> SkipThoughts forward matches
    torch.nn.GRU on the same weights."""
    import jax
    import jax.numpy as jnp

    from vqa_counterexamples_tpu.models.seq2vec import (
        SkipThoughts, load_skipthoughts_npz)

    V, D, H, B, T = 12, 6, 8, 3, 7
    sd = {
        "embedding.weight": torch.randn(V + 1, D),
        "rnn.weight_ih_l0": torch.randn(3 * H, D),
        "rnn.weight_hh_l0": torch.randn(3 * H, H),
        "rnn.bias_ih_l0": torch.randn(3 * H),
        "rnn.bias_hh_l0": torch.randn(3 * H),
    }
    npz_path = str(tmp_path / "st.npz")
    np.savez(npz_path, **convert_state_dict(sd, vocab_size=V))

    model = SkipThoughts(vocab_size=V, bayesian=True, emb_size=D,
                         hidden_size=H)
    rng = np.random.default_rng(0)
    wids = rng.integers(1, V + 1, size=(B, T)).astype(np.int32)
    wids[0, 5:] = 0  # right padding
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(wids), deterministic=True)
    params = load_skipthoughts_npz(dict(variables["params"]), npz_path)
    out = model.apply({"params": params}, jnp.asarray(wids),
                      deterministic=True)

    # torch oracle: embedding (pad 0) -> GRU -> state at length-1
    emb = torch.nn.functional.embedding(
        torch.from_numpy(wids.astype(np.int64)),
        sd["embedding.weight"], padding_idx=0)
    gru = torch.nn.GRU(D, H, batch_first=True)
    with torch.no_grad():
        gru.weight_ih_l0.copy_(sd["rnn.weight_ih_l0"])
        gru.weight_hh_l0.copy_(sd["rnn.weight_hh_l0"])
        gru.bias_ih_l0.copy_(sd["rnn.bias_ih_l0"])
        gru.bias_hh_l0.copy_(sd["rnn.bias_hh_l0"])
        states, _ = gru(emb)
    lengths = (wids != 0).sum(1)
    oracle = np.stack([states[b, lengths[b] - 1].numpy()
                       for b in range(B)])
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4,
                               atol=1e-5)
