"""CX CLI real-data path: load the on-disk augmented-pickle + feature-store
layout (no --synthetic) and train."""

import os

import numpy as np


def test_counterexamples_real_layout(tmp_path):
    import yaml

    from vqa_counterexamples_tpu.cli import counterexamples as cx_cli
    from vqa_counterexamples_tpu.data import synthetic, vqacx
    from vqa_counterexamples_tpu.data.features import FeatureStore

    # build artifacts the way cli/build_vqacx + cli/extract would
    trainset, store = synthetic.make_synthetic_cx(
        n_examples=64, n_images=48, dim_v=32, knn_size=6, n_answers=8,
        seed=0, split="train")
    valset, val_store = synthetic.make_synthetic_cx(
        n_examples=32, n_images=48, dim_v=32, knn_size=6, n_answers=8,
        seed=1, split="val")
    valset["vocab_words"] = trainset["vocab_words"]
    valset["vocab_answers"] = trainset["vocab_answers"]

    ds_dir = tmp_path / "processed"
    os.makedirs(ds_dir / "pickle")
    vqacx.save_dataset(trainset,
                       str(ds_dir / "pickle" / "trainset_augmented.pickle"))
    vqacx.save_dataset(valset,
                       str(ds_dir / "pickle" /
                           "valset_augmented_small.pickle"))
    vqacx.save_dataset(valset,
                       str(ds_dir / "pickle" / "valset_augmented.pickle"))
    feats_dir = tmp_path / "features"
    os.makedirs(feats_dir)
    store.save(str(feats_dir / "trainset"))
    val_store.save(str(feats_dir / "valset"))

    opt_path = tmp_path / "opt.yaml"
    opt_path.write_text(yaml.safe_dump({
        "logs": {"dir_logs": str(tmp_path / "logs" / "vqa")},
        "vqa": {"path_trainset": str(ds_dir), "nans": 8, "maxlength": 26,
                "pad": "right"},
        "coco": {"path_features": str(feats_dir)},
        "model": synthetic.tiny_vqa_options(dim_v=32, nans=8),
        "cx_model": {"name": "real_layout", "pretrained_vqa": False,
                     "trainable_vqa": False, "dim_h": 16, "n_layers": 1,
                     "drop_p": 0.1, "v_emb": True, "v_mult": True,
                     "v_dist": True, "v_rank": True, "q_emb": True,
                     "pretrained_emb": False, "a_emb": True, "z_emb": True},
        "optim": {"lr": 0.001, "batch_size": 32, "epochs": 1},
    }))

    info = cx_cli.main(["--cx_model", "NeuralModel", "--path_opt",
                        str(opt_path), "--untrained_vqa",
                        "--project_dir", str(tmp_path / "run"), "--test"])
    assert len(info) == 1 and "recall" in info[0]
    run = os.listdir(os.path.join(str(tmp_path / "run"), "logs", "cx"))[0]
    assert os.path.isfile(os.path.join(str(tmp_path / "run"), "logs", "cx",
                                       run, "final_results.txt"))
