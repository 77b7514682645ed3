"""Weight porting: skip-thoughts converter + npz grafting round trip."""

import os

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


def _toy_cadene_dir(tmp_path, dict_words, D=6, H=8, seed=0):
    """Write toy raw Cadene artifacts (dictionary.txt + utable + uni_skip)."""
    rng = np.random.default_rng(seed)
    (tmp_path / "dictionary.txt").write_text("\n".join(dict_words) + "\n")
    table = rng.normal(size=(len(dict_words), D)).astype(np.float32)
    np.save(tmp_path / "utable.npy", table)
    theano = {
        "encoder_W": rng.normal(size=(D, 2 * H)).astype(np.float32),
        "encoder_U": rng.normal(size=(H, 2 * H)).astype(np.float32),
        "encoder_b": rng.normal(size=(2 * H,)).astype(np.float32),
        "encoder_Wx": rng.normal(size=(D, H)).astype(np.float32),
        "encoder_Ux": rng.normal(size=(H, H)).astype(np.float32),
        "encoder_bx": rng.normal(size=(H,)).astype(np.float32),
    }
    np.savez(tmp_path / "uni_skip.npz", **theano)
    return table, theano


def test_adapt_from_cadene_row_selection(tmp_path):
    from vqa_counterexamples_tpu.cli.port_skipthoughts import adapt_from_cadene

    dict_words = ["the", "cat", "sat", "UNK", "mat"]
    table, theano = _toy_cadene_dir(tmp_path, dict_words)
    vocab = ["cat", "zebra", "mat"]  # 'zebra' is OOV -> UNK row
    out = adapt_from_cadene(str(tmp_path), vocab)

    emb = out["embedding"]
    assert emb.shape == (len(vocab) + 1, table.shape[1])
    np.testing.assert_array_equal(emb[0], 0.0)
    np.testing.assert_array_equal(emb[1], table[1])   # cat
    np.testing.assert_array_equal(emb[2], table[3])   # zebra -> UNK
    np.testing.assert_array_equal(emb[3], table[4])   # mat

    np.testing.assert_array_equal(
        out["w_ih"], np.concatenate([theano["encoder_W"],
                                     theano["encoder_Wx"]], axis=1))
    np.testing.assert_array_equal(
        out["w_hh"], np.concatenate([theano["encoder_U"],
                                     theano["encoder_Ux"]], axis=1))
    np.testing.assert_array_equal(
        out["b_ih"], np.concatenate([theano["encoder_b"],
                                     theano["encoder_bx"]]))
    np.testing.assert_array_equal(out["b_hh"], 0.0)


def test_cadene_adaptation_drives_encoder_to_torch_parity(tmp_path):
    """Raw theano artifacts -> adapt -> our encoder == torch GRU built with
    the skip-thoughts.torch gate mapping (weight_ih = [W; Wx]^T etc.)."""
    import jax
    import jax.numpy as jnp

    from vqa_counterexamples_tpu.cli.port_skipthoughts import adapt_from_cadene
    from vqa_counterexamples_tpu.models.seq2vec import (
        SkipThoughts, load_skipthoughts_npz)

    D, H, B, T = 6, 8, 3, 7
    dict_words = ["w%d" % i for i in range(9)] + ["UNK"]
    table, theano = _toy_cadene_dir(tmp_path, dict_words, D=D, H=H, seed=3)
    vocab = ["w3", "w7", "nope", "w0", "w8"]
    out = adapt_from_cadene(str(tmp_path), vocab)
    npz_path = str(tmp_path / "adapted.npz")
    np.savez(npz_path, **out)

    V = len(vocab)
    model = SkipThoughts(vocab_size=V, bayesian=True, emb_size=D,
                         hidden_size=H)
    rng = np.random.default_rng(1)
    wids = rng.integers(1, V + 1, size=(B, T)).astype(np.int32)
    wids[1, 4:] = 0
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(wids), deterministic=True)
    params = load_skipthoughts_npz(dict(variables["params"]), npz_path)
    ours = model.apply({"params": params}, jnp.asarray(wids),
                       deterministic=True)

    emb = torch.nn.functional.embedding(
        torch.from_numpy(wids.astype(np.int64)),
        torch.from_numpy(out["embedding"]), padding_idx=0)
    gru = torch.nn.GRU(D, H, batch_first=True)
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.from_numpy(np.concatenate(
            [theano["encoder_W"], theano["encoder_Wx"]], axis=1).T.copy()))
        gru.weight_hh_l0.copy_(torch.from_numpy(np.concatenate(
            [theano["encoder_U"], theano["encoder_Ux"]], axis=1).T.copy()))
        gru.bias_ih_l0.copy_(torch.from_numpy(np.concatenate(
            [theano["encoder_b"], theano["encoder_bx"]])))
        gru.bias_hh_l0.zero_()
        states, _ = gru(emb)
    lengths = (wids != 0).sum(1)
    oracle = np.stack([states[b, lengths[b] - 1].numpy()
                       for b in range(B)])
    np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-4,
                               atol=1e-5)


def test_port_cli_dir_st_mode(tmp_path):
    from vqa_counterexamples_tpu.cli.port_skipthoughts import main

    dict_words = ["a", "b", "UNK"]
    _toy_cadene_dir(tmp_path, dict_words, D=4, H=3)
    (tmp_path / "vocab.txt").write_text("a\nq\nb\n")
    out_path = str(tmp_path / "out.npz")
    main(["--dir_st", str(tmp_path), "--vocab",
          str(tmp_path / "vocab.txt"), "--out", out_path])
    data = np.load(out_path)
    assert data["embedding"].shape == (4, 4)
    assert data["w_ih"].shape == (4, 9)
    assert data["w_hh"].shape == (3, 9)

    # wid_to_word pickle form
    import pickle
    with open(tmp_path / "wid.pickle", "wb") as f:
        pickle.dump({1: "a", 2: "q", 3: "b"}, f)
    main(["--dir_st", str(tmp_path), "--vocab",
          str(tmp_path / "wid.pickle"), "--out", out_path])
    data2 = np.load(out_path)
    np.testing.assert_array_equal(data["embedding"], data2["embedding"])


def test_train_cli_initializes_seq2vec_from_dir_st(tmp_path, capsys):
    """cli/train grafts the adapted skip-thoughts npz over the random
    seq2vec init when the configured dir_st holds one (the reference's
    seq2vec.py:80-85 pretrained-load behavior, which external
    skip-thoughts.torch performed at model construction)."""
    import pickle

    import yaml

    from vqa_counterexamples_tpu.cli import train as tr_cli

    D, H = 8, 12
    n_words = 80  # _synthetic_vqa vocab size
    dir_st = tmp_path / "st"
    dir_st.mkdir()
    rng = np.random.default_rng(0)
    npz = {
        "embedding": rng.normal(size=(n_words + 1, D)).astype(np.float32),
        "w_ih": rng.normal(size=(D, 3 * H)).astype(np.float32),
        "b_ih": rng.normal(size=(3 * H,)).astype(np.float32),
        "w_hh": rng.normal(size=(H, 3 * H)).astype(np.float32),
        "b_hh": np.zeros((3 * H,), np.float32),
    }
    np.savez(str(dir_st / "adapted_uniskip.npz"), **npz)

    opt = {
        "logs": {"dir_logs": str(tmp_path / "logs")},
        "vqa": {"dataset": "VQA2", "dir": str(tmp_path), "trainsplit":
                "train", "nans": 8, "maxlength": 10, "minwcount": 0,
                "nlp": "mcb", "pad": "right", "samplingans": True},
        "coco": {"dir": str(tmp_path), "arch": "tiny", "mode": "noatt",
                 "size": 64},
        "model": {
            "arch": "MutanNoAtt",
            "seq2vec": {"arch": "skipthoughts", "type": "BayesianUniSkip",
                        "dropout": 0.25, "fixed_emb": False,
                        "dir_st": str(dir_st), "emb_size": D,
                        "hidden_size": H},
            "fusion": {"dim_v": 16, "dim_q": H, "dim_hv": 6, "dim_hq": 6,
                       "dim_mm": 6, "R": 2, "dropout_v": 0.5,
                       "dropout_q": 0.5, "activation_v": "tanh",
                       "activation_q": "tanh", "dropout_hv": 0,
                       "dropout_hq": 0},
            "classif": {"dropout": 0.5},
        },
        # lr 0: params keep their initial values, so the saved checkpoint
        # must carry the npz weights verbatim
        "optim": {"lr": 0.0, "batch_size": 16, "epochs": 1},
    }
    yaml_path = str(tmp_path / "opt.yaml")
    with open(yaml_path, "w") as f:
        yaml.safe_dump(opt, f)
    tr_cli.main(["--path_opt", yaml_path, "--synthetic", "48"])
    out = capsys.readouterr().out
    assert "seq2vec initialized from" in out

    import flax.serialization as ser

    with open(os.path.join(str(tmp_path / "logs"),
                           "best_model.msgpack"), "rb") as f:
        tree = ser.msgpack_restore(f.read())
    params = tree["params"] if "params" in tree else tree
    got_emb = np.asarray(params["seq2vec"]["embedding"])
    np.testing.assert_allclose(got_emb, npz["embedding"], rtol=1e-6)
    got_wih = np.asarray(params["seq2vec"]["gru"]["w_ih"])
    np.testing.assert_allclose(got_wih, npz["w_ih"], rtol=1e-6)
