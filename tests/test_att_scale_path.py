"""Att-scale data path: lazy feature stores + native prefetch streaming.

VERDICT.md round-1 item: att-mode at real scale must not materialize the
(~130 GB for COCO) att matrix — FeatureStore keeps it mmap/HDF5-backed and
VQAArrays.batches streams rows through the native C++ store's async
prefetch tickets (reference reads per-item from HDF5, features.py:41-42).
"""

import numpy as np
import pytest


def _write_att_npy(tmp_path, n=20, shape=(3, 3, 8), seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n,) + shape).astype(np.float32)
    np.save(tmp_path / "trainset.att.npy", feats)
    (tmp_path / "trainset.txt").write_text(
        "".join("img_%03d.jpg\n" % i for i in range(n)))
    return feats


def test_load_att_npy_stays_mmap(tmp_path):
    from vqa_counterexamples_tpu.data.features import FeatureStore

    feats = _write_att_npy(tmp_path)
    store = FeatureStore.load(str(tmp_path / "trainset"), dataset="att")
    assert isinstance(store.features, np.memmap)
    rows = np.array([3, 0, 3, 17])
    got = store.gather_rows(rows)
    np.testing.assert_allclose(got, feats[rows])
    assert store.row_shape == feats.shape[1:]


def test_load_att_hdf5_lazy_with_duplicates(tmp_path):
    import h5py

    from vqa_counterexamples_tpu.data.features import FeatureStore, _H5Rows

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(12, 2, 2, 4)).astype(np.float32)
    with h5py.File(tmp_path / "valset.hdf5", "w") as f:
        f.create_dataset("att", data=feats)
    (tmp_path / "valset.txt").write_text(
        "".join("v_%02d.jpg\n" % i for i in range(12)))
    store = FeatureStore.load(str(tmp_path / "valset"), dataset="att")
    assert isinstance(store.features, _H5Rows)
    rows = np.array([5, 5, 1, 11, 1])
    np.testing.assert_allclose(store.gather_rows(rows), feats[rows])
    np.testing.assert_allclose(store.features[7], feats[7])
    # eager override still materializes
    eager = FeatureStore.load(str(tmp_path / "valset"), dataset="att",
                              lazy=False)
    assert isinstance(eager.features, np.ndarray)


def test_native_prefetch_batches_roundtrip(tmp_path):
    from vqa_counterexamples_tpu.data.features import FeatureStore
    from vqa_counterexamples_tpu.data.vqa_dataset import VQAArrays

    n = 30
    feats = _write_att_npy(tmp_path, n=n)
    store = FeatureStore.load(str(tmp_path / "trainset"), dataset="att")
    examples = [{"question_id": i, "image_name": "img_%03d.jpg" % i,
                 "question_wids": [1, 2, 0, 0], "answer_aid": i % 3}
                for i in range(n)]
    arrays = VQAArrays(examples, store)
    seen = []
    for batch in arrays.batches(8, shuffle=False):
        assert batch["visual"].shape[1:] == feats.shape[1:]
        # copy: the native path reuses ping-pong buffers across iterations
        seen.append(np.array(batch["visual"]))
    got = np.concatenate(seen)
    assert got.shape[0] == n  # final partial batch included
    np.testing.assert_allclose(got, feats)


def test_mutan_att_trains_from_streamed_store(tmp_path):
    """MutanAtt end-to-end on a lazy att npy store: the matrix is never
    materialized; rows stream through the prefetch path into jitted steps."""
    import optax

    from vqa_counterexamples_tpu.data import synthetic
    from vqa_counterexamples_tpu.data.features import FeatureStore
    from vqa_counterexamples_tpu.data.vqa_dataset import VQAArrays
    from vqa_counterexamples_tpu.engines import vqa_engine
    from vqa_counterexamples_tpu.models import factory

    n, spatial, dv = 24, 3, 16
    feats = _write_att_npy(tmp_path, n=n, shape=(spatial, spatial, dv))
    store = FeatureStore.load(str(tmp_path / "trainset"), dataset="att")
    assert isinstance(store.features, np.memmap)

    opt = {
        "arch": "MutanAtt", "dim_v": dv, "dim_q": 20,
        "seq2vec": {"arch": "2-lstm", "emb_size": 8, "hidden_size": 10},
        "attention": {"nb_glimpses": 2, "dim_hv": 12, "dim_hq": 12,
                      "dim_mm": 12, "R": 2, "dropout_v": 0.5,
                      "dropout_q": 0.5, "dropout_mm": 0.5,
                      "activation_v": "tanh", "activation_q": "tanh",
                      "dropout_hv": 0, "dropout_hq": 0},
        "fusion": {"dim_hv": 2 * dv, "dim_hq": 12, "dim_mm": 12, "R": 2,
                   "dropout_v": 0.5, "dropout_q": 0.5,
                   "activation_v": "tanh", "activation_q": "tanh",
                   "dropout_hv": 0, "dropout_hq": 0},
        "classif": {"dropout": 0.5},
    }
    words, answers = synthetic.synthetic_vocab(15, 6)
    model = factory.factory_vqa(opt, words, answers)
    examples = [{"question_id": i, "image_name": "img_%03d.jpg" % i,
                 "question_wids": list(np.random.default_rng(i).integers(
                     1, 10, size=6)), "answer_aid": i % 6}
                for i in range(n)]
    arrays = VQAArrays(examples, store)

    optimizer = optax.adam(1e-3)
    first = next(arrays.batches(8, shuffle=False))
    state = vqa_engine.init_vqa_state(model, optimizer, first)
    ts = vqa_engine.make_vqa_train_step(model, optimizer)
    rng = np.random.default_rng(0)
    for batch in arrays.batches(8, shuffle=True, rng=rng,
                                drop_remainder=True):
        state, m = ts(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert isinstance(store.features, np.memmap)  # still not materialized


def test_extract_writes_att_npy(tmp_path):
    from vqa_counterexamples_tpu.cli import extract as extract_cli
    from vqa_counterexamples_tpu.data.features import FeatureStore

    prefix = extract_cli.main([
        "--dir_data", str(tmp_path), "--data_split", "val",
        "--arch", "resnet50", "--size", "64", "-b", "4",
        "--synthetic", "6", "--att_store", "npy"])
    import os
    assert os.path.exists(prefix + ".att.npy")
    att = FeatureStore.load(prefix, dataset="att")
    noatt = FeatureStore.load(prefix, dataset="noatt")
    assert isinstance(att.features, np.memmap)
    assert att.features.shape[0] == 6
    # noatt is the true spatial mean of att (extract.py:123-124 semantics)
    rows = att.gather_rows(np.arange(6))
    np.testing.assert_allclose(noatt.features, rows.mean(axis=(1, 2)),
                               rtol=1e-5, atol=1e-5)


def test_extract_vgenome_images(tmp_path):
    """VG image extraction: flat raw/images dir, train split only
    (reference extract.py:66-77, vgenome.py:72-92)."""
    import pytest
    from PIL import Image

    from vqa_counterexamples_tpu.cli import extract as extract_cli
    from vqa_counterexamples_tpu.data.features import FeatureStore

    img_dir = tmp_path / "vgenome" / "raw" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = rng.integers(0, 255, size=(80, 70, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / ("%d.jpg" % (100 + i)))

    prefix = extract_cli.main([
        "--dir_data", str(tmp_path / "vgenome"), "--dataset", "vgenome",
        "--data_split", "train", "--arch", "resnet50", "--size", "64",
        "-b", "2", "--mode", "noatt"])
    store = FeatureStore.load(prefix)
    assert store.features.shape == (5, 2048)
    assert store.names == ["%d.jpg" % (100 + i) for i in range(5)]

    with pytest.raises(ValueError, match="train split"):
        extract_cli.main([
            "--dir_data", str(tmp_path / "vgenome"), "--dataset", "vgenome",
            "--data_split", "val", "--arch", "resnet50", "--size", "64"])
