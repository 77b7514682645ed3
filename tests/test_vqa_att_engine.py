"""VQA attention-mode training: (B, H, W, C) feature maps through MutanAtt
with the full engine loop, and the contrastive CLI end-to-end."""

import numpy as np


def _att_opt(dv=24, nans=6):
    return {
        "arch": "MutanAtt", "dim_v": dv, "dim_q": 20,
        "seq2vec": {"arch": "2-lstm", "emb_size": 8, "hidden_size": 10},
        "attention": {"nb_glimpses": 2, "dim_hv": 12, "dim_hq": 12,
                      "dim_mm": 12, "R": 2, "dropout_v": 0.5,
                      "dropout_q": 0.5, "dropout_mm": 0.5,
                      "activation_v": "tanh", "activation_q": "tanh",
                      "dropout_hv": 0, "dropout_hq": 0},
        "fusion": {"dim_hv": 24, "dim_hq": 12, "dim_mm": 12, "R": 2,
                   "dropout_v": 0.5, "dropout_q": 0.5,
                   "activation_v": "tanh", "activation_q": "tanh",
                   "dropout_hv": 0, "dropout_hq": 0},
        "classif": {"dropout": 0.5},
    }


def test_mutan_att_train_steps():
    import jax.numpy as jnp
    import optax

    from vqa_counterexamples_tpu.data import synthetic
    from vqa_counterexamples_tpu.engines import vqa_engine
    from vqa_counterexamples_tpu.models import factory

    opt = _att_opt()
    words, answers = synthetic.synthetic_vocab(15, 6)
    model = factory.factory_vqa(opt, words, answers)
    rng = np.random.default_rng(0)
    batch = {
        "visual": jnp.asarray(rng.normal(size=(8, 3, 3, 24)), jnp.float32),
        "question": jnp.asarray(rng.integers(0, 10, size=(8, 12)),
                                jnp.int32),
        "answer": jnp.asarray(rng.integers(0, 6, size=(8,)), jnp.int32),
        "question_id": np.arange(8),
    }
    optimizer = optax.adam(1e-3)
    state = vqa_engine.init_vqa_state(model, optimizer, batch)
    ts = vqa_engine.make_vqa_train_step(model, optimizer)
    for _ in range(3):
        state, m = ts(state, batch)
    assert np.isfinite(float(m["loss"]))
    # predict step for test_pass
    predict = vqa_engine.make_vqa_predict_step(model)
    rows = vqa_engine.test_pass(predict, state.params, [batch], answers)
    assert len(rows) == 8 and all("answer" in r for r in rows)


def test_contrastive_cli(tmp_path):
    from vqa_counterexamples_tpu.cli import contrastive as contrastive_cli

    info = contrastive_cli.main([
        "--synthetic", "64", "--epochs", "1", "--batch_size", "32",
        "--project_dir", str(tmp_path), "-p", "1"])
    assert len(info) == 1 and "contrastive/recall" in info[0]
