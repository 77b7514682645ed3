"""--mesh data-parallel CLI training on the virtual 8-device mesh."""

from vqa_counterexamples_tpu.cli import counterexamples as cx_cli


def test_counterexamples_cli_mesh_dp(tmp_path):
    info = cx_cli.main([
        "--cx_model", "NeuralModel", "--epochs", "1", "--synthetic", "128",
        "--batch_size", "32", "--mesh", "data=8",
        "--project_dir", str(tmp_path)])
    assert len(info) == 1
    assert 0.0 <= info[0]["recall"] <= 1.0


def test_parse_mesh():
    assert cx_cli.parse_mesh("data=8") == {"data": 8}
    assert cx_cli.parse_mesh("data=4,model=2") == {"data": 4, "model": 2}
    assert cx_cli.parse_mesh(None) is None


def test_counterexamples_cli_mesh_2axis_rowsharded(tmp_path):
    """data x model mesh: feature corpus row-shards over 'model' and the
    in-step gather runs through GSPMD collectives."""
    info = cx_cli.main([
        "--cx_model", "NeuralModel", "--epochs", "1", "--synthetic", "128",
        "--batch_size", "32", "--mesh", "data=4,model=2",
        "--project_dir", str(tmp_path)])
    assert len(info) == 1
    assert 0.0 <= info[0]["recall"] <= 1.0


def test_contrastive_cli_mesh_dp(tmp_path):
    """--mesh on the contrastive trainer (VERDICT r3 #7): the triple batch
    shards over 'data' like the CX path; one epoch trains and evals."""
    from vqa_counterexamples_tpu.cli import contrastive as c_cli

    info = c_cli.main([
        "--epochs", "1", "--synthetic", "128", "--batch_size", "32",
        "--mesh", "data=8", "--project_dir", str(tmp_path)])
    assert len(info) == 1
    assert 0.0 <= info[0]["recall"] <= 1.0


def test_train_cli_mesh_dp(tmp_path):
    from vqa_counterexamples_tpu.cli import train as train_cli

    import os
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text("""
logs:
  dir_logs: %s
vqa:
  dataset: VQA2
  dir: %s
  trainsplit: train
  nans: 8
  maxlength: 10
  minwcount: 0
  nlp: mcb
  pad: right
  samplingans: true
coco:
  dir: %s
  arch: tiny
  mode: noatt
  size: 64
model:
  arch: MutanNoAtt
  seq2vec:
    arch: skipthoughts
    type: BayesianUniSkip
    dropout: 0.25
    fixed_emb: false
    emb_size: 8
    hidden_size: 20
  fusion:
    dim_v: 16
    dim_q: 20
    dim_hv: 12
    dim_hq: 12
    dim_mm: 12
    R: 2
    dropout_v: 0.5
    dropout_q: 0.5
    activation_v: tanh
    activation_q: tanh
    dropout_hv: 0
    dropout_hq: 0
  classif:
    dropout: 0.5
optim:
  lr: 0.001
  batch_size: 16
  epochs: 1
""" % (tmp_path / "logs", tmp_path / "vqa2", tmp_path / "coco"))
    train_cli.main(["--path_opt", str(cfg), "--synthetic", "64",
                    "--epochs", "1", "-b", "16", "--mesh", "data=8"])
    assert os.path.exists(tmp_path / "logs" / "logger.json")


def test_knn_cli_mesh_matches_single_device(tmp_path):
    import numpy as np

    from vqa_counterexamples_tpu.cli import knn as knn_cli
    from vqa_counterexamples_tpu.data.features import FeatureStore

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(50, 16)).astype(np.float32)  # 50 % 8 != 0: pads
    names = ["COCO_train2014_%012d.jpg" % i for i in range(50)]
    FeatureStore(feats, names).save(str(tmp_path / "trainset"))

    knn_cli.main(["--path_features", str(tmp_path / "trainset"), "-k", "5",
                  "-b", "16", "--out", str(tmp_path / "single.npy")])
    knn_cli.main(["--path_features", str(tmp_path / "trainset"), "-k", "5",
                  "-b", "16", "--mesh", "data=8",
                  "--out", str(tmp_path / "meshed.npy")])
    single = np.load(tmp_path / "single.npy", allow_pickle=True).item()
    meshed = np.load(tmp_path / "meshed.npy", allow_pickle=True).item()
    np.testing.assert_array_equal(single["indices"], meshed["indices"])
    # self-distances round to ~sqrt(eps) differently per partitioning
    np.testing.assert_allclose(single["distances"], meshed["distances"],
                               rtol=1e-4, atol=5e-3)


def test_extract_cli_mesh(tmp_path):
    import numpy as np

    from vqa_counterexamples_tpu.cli import extract as extract_cli
    from vqa_counterexamples_tpu.data.features import FeatureStore

    # 10 images, batch 8 over 8 devices: exercises the padded final batch
    prefix = extract_cli.main([
        "--dir_data", str(tmp_path), "--data_split", "val",
        "--arch", "resnet50", "--size", "64", "-b", "8",
        "--synthetic", "10", "--mode", "noatt", "--mesh", "data=8"])
    store = FeatureStore.load(prefix)
    assert store.features.shape == (10, 2048)
    assert np.isfinite(store.features).all()
