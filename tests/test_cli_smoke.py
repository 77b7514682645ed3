"""CLI smoke tests: each entry point runs end-to-end on synthetic data."""

import json
import os

import numpy as np
import pytest

from vqa_counterexamples_tpu.cli import counterexamples as cx_cli


def test_counterexamples_cli_neuralmodel(tmp_path):
    info = cx_cli.main([
        "--cx_model", "NeuralModel", "--epochs", "2", "--synthetic", "96",
        "--batch_size", "32", "--learning_rate", "0.001",
        "--project_dir", str(tmp_path), "--test"])
    assert len(info) == 2
    run_dirs = os.listdir(os.path.join(str(tmp_path), "logs", "cx"))
    assert len(run_dirs) == 1
    final = os.path.join(str(tmp_path), "logs", "cx", run_dirs[0],
                         "final_results.txt")
    results = json.loads(open(final).read())
    assert "recall" in results and "best_epoch" in results


def test_counterexamples_cli_resume(tmp_path):
    argv = ["--cx_model", "NeuralModel", "--epochs", "1", "--synthetic",
            "64", "--batch_size", "32", "--project_dir", str(tmp_path),
            "--comment", "resume_run"]
    cx_cli.main(argv)
    run = [d for d in os.listdir(os.path.join(str(tmp_path), "logs", "cx"))
           if d.endswith("resume_run")][0]
    info = cx_cli.main(argv + ["--resume", run, "--epochs", "2", "--best"])
    assert len(info) == 2  # epoch 1 restored + epoch 2 trained


def test_counterexamples_cli_pairwise(tmp_path):
    info = cx_cli.main([
        "--cx_model", "PairwiseModel", "--pairwise", "--epochs", "1",
        "--synthetic", "64", "--batch_size", "32",
        "--project_dir", str(tmp_path)])
    assert "acc_pairwise" in info[-1]


def test_knn_cli(tmp_path):
    from vqa_counterexamples_tpu.cli import knn as knn_cli
    from vqa_counterexamples_tpu.data.features import FeatureStore
    from vqa_counterexamples_tpu.data.vqacx import coco_num_to_name

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(40, 16)).astype(np.float32)
    names = [coco_num_to_name(i) for i in range(40)]
    FeatureStore(feats, names).save(str(tmp_path / "trainset"))
    json_out = str(tmp_path / "knn.json")
    knn_cli.main(["--path_features", str(tmp_path / "trainset"),
                  "-k", "5", "--json-out", json_out])
    table = json.loads(open(json_out).read())
    assert len(table) == 40 and len(table["0"]) == 4  # k-1 neighbors
    saved = np.load(str(tmp_path / "trainset_knn_results.npy"),
                    allow_pickle=True).item()
    assert saved["indices"].shape == (40, 5)


def test_build_vqacx_cli(tmp_path):
    import pickle
    from vqa_counterexamples_tpu.cli import build_vqacx as bv_cli
    from vqa_counterexamples_tpu.data.vqacx import coco_num_to_name

    processed = tmp_path / "processed"
    os.makedirs(processed)
    examples = []
    for qid in range(6):
        examples.append({
            "question_id": qid,
            "image_name": coco_num_to_name(qid),
            "question": "q%d" % qid, "question_wids": [1, 0, 0],
            "answer": "yes", "answer_aid": 0})
    with open(processed / "trainset.pickle", "wb") as f:
        pickle.dump(examples, f)
    with open(processed / "wid_to_word.pickle", "wb") as f:
        pickle.dump({1: "what", 2: "UNK"}, f)
    with open(processed / "aid_to_ans.pickle", "wb") as f:
        pickle.dump(["yes", "no"], f)
    comp_pairs = [[0, 1], [2, 3]]
    with open(tmp_path / "pairs.json", "w") as f:
        json.dump(comp_pairs, f)
    knns = {str(i): [(i + 1) % 6, (i + 2) % 6] for i in range(6)}
    with open(tmp_path / "knn.json", "w") as f:
        json.dump(knns, f)
    with open(tmp_path / "feats.txt", "w") as f:
        for i in range(6):
            f.write(coco_num_to_name(i) + "\n")
    out_dir = str(tmp_path / "out")
    bv_cli.main(["--split", "train", "--path_processed", str(processed),
                 "--path_comp_pairs", str(tmp_path / "pairs.json"),
                 "--path_knn_json", str(tmp_path / "knn.json"),
                 "--path_features_txt", str(tmp_path / "feats.txt"),
                 "--out_dir", out_dir])
    with open(os.path.join(out_dir, "trainset_augmented.pickle"),
              "rb") as f:
        ds = pickle.load(f)
    assert set(ds) >= {"examples_list", "name_to_index", "vocab_words",
                       "vocab_answers"}
    for ex in ds["examples_list"]:
        assert "comp" in ex and len(ex["knns"]) == 2


def test_preprocess_cli_processed(tmp_path):
    from vqa_counterexamples_tpu.cli import preprocess as pp_cli

    interim = tmp_path / "interim"
    os.makedirs(interim)
    rows = [{"question_id": i, "image_name": "img%d.jpg" % i,
             "question": "is this a test %d?" % i, "answer": "yes",
             "answers_occurence": [("yes", 10)]} for i in range(5)]
    with open(interim / "train_questions_annotations.json", "w") as f:
        json.dump(rows, f)
    with open(interim / "val_questions_annotations.json", "w") as f:
        json.dump(rows, f)
    pp_cli.main(["processed", "--dirname", str(tmp_path), "--nans", "2",
                 "--maxlength", "8", "--nlp", "mcb", "--pad", "right"])
    out = os.listdir(os.path.join(str(tmp_path), "processed"))
    assert len(out) == 1 and out[0].startswith("nans,2_")


def test_visu_cli(tmp_path):
    from vqa_counterexamples_tpu.cli import visu as visu_cli
    from vqa_counterexamples_tpu.core.experiment import Experiment
    from vqa_counterexamples_tpu.core.meters import AvgMeter

    xp = Experiment("t")
    xp.add_meters("val", {"acc1": AvgMeter()})
    xp.get_meter("val", "acc1").update(12.0)
    xp.log_meters("val", n=1)
    d = str(tmp_path / "run1")
    xp.to_json(os.path.join(d, "logger.json"))
    out = str(tmp_path / "view.html")
    visu_cli.main([d, "--out", out, "--meters", "acc1"])
    assert os.path.getsize(out) > 50
