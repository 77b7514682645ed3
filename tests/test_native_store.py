"""Native C++ feature store: build, correctness vs numpy, async prefetch."""

import numpy as np
import pytest

from vqa_counterexamples_tpu.data import native_store


@pytest.fixture(scope="module")
def store_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("native") / "feats.npy"
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(500, 64)).astype(np.float32)
    np.save(path, arr)
    return str(path), arr


def test_native_build_and_gather(store_file):
    path, arr = store_file
    store = native_store.NativeFeatureStore.open_npy(path)
    assert store.rows == 500 and store.cols == 64
    idx = np.asarray([3, 0, 499, 7, 3], dtype=np.int64)
    out = store.gather(idx)
    np.testing.assert_array_equal(out, arr[idx])
    store.close()


def test_native_library_actually_loaded():
    """The toolchain ships g++: the real native path must be active, not the
    numpy fallback (a fallback-only pass would hide build breakage)."""
    assert native_store.load_library() is not None


def test_out_of_range_rows_zeroed(store_file):
    path, arr = store_file
    store = native_store.NativeFeatureStore.open_npy(path)
    if store._fallback is not None:
        pytest.skip("fallback path clamps differently")
    out = store.gather(np.asarray([0, 1000, -5], dtype=np.int64))
    np.testing.assert_array_equal(out[0], arr[0])
    assert (out[1] == 0).all() and (out[2] == 0).all()
    store.close()


def test_prefetch_overlap(store_file):
    path, arr = store_file
    store = native_store.NativeFeatureStore.open_npy(path)
    rng = np.random.default_rng(1)
    idx1 = rng.integers(0, 500, size=256).astype(np.int64)
    idx2 = rng.integers(0, 500, size=256).astype(np.int64)
    buf1 = np.empty((256, 64), dtype=np.float32)
    buf2 = np.empty((256, 64), dtype=np.float32)
    t1 = store.prefetch(idx1, buf1)
    t2 = store.prefetch(idx2, buf2)
    store.wait(t1)
    store.wait(t2)
    np.testing.assert_array_equal(buf1, arr[idx1])
    np.testing.assert_array_equal(buf2, arr[idx2])
    store.close()


def test_large_parallel_gather_matches(store_file):
    path, arr = store_file
    store = native_store.NativeFeatureStore.open_npy(path)
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 500, size=5000).astype(np.int64)  # multi-slab path
    out = store.gather(idx)
    np.testing.assert_array_equal(out, arr[idx])
    store.close()


@pytest.fixture(scope="module")
def bf16_store_file(tmp_path_factory):
    import ml_dtypes

    path = tmp_path_factory.mktemp("native_bf16") / "feats.npy"
    rng = np.random.default_rng(3)
    arr = rng.normal(size=(200, 48)).astype(np.float32).astype(
        ml_dtypes.bfloat16)
    np.save(path, arr.view(np.uint16))  # the extract --feat-dtype contract
    return str(path), arr


def test_bf16_gather_matches(bf16_store_file):
    import ml_dtypes

    path, arr = bf16_store_file
    store = native_store.NativeFeatureStore.open_npy(path)
    assert store.dtype == np.dtype(ml_dtypes.bfloat16)
    idx = np.asarray([0, 199, 7, 7, 42], dtype=np.int64)
    out = store.gather(idx)
    assert out.dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(out.view(np.uint16),
                                  arr[idx].view(np.uint16))
    store.close()


def test_bf16_prefetch_and_feature_store(bf16_store_file, tmp_path):
    """FeatureStore.load re-views the uint16 npy as bf16 and streams rows."""
    import ml_dtypes

    from vqa_counterexamples_tpu.data.features import FeatureStore

    path, arr = bf16_store_file
    prefix = path[:-len(".npy")]
    with open(prefix + ".txt", "w") as f:
        for i in range(arr.shape[0]):
            f.write("img%d\n" % i)
    fs = FeatureStore.load(prefix, dataset="noatt", lazy=True)
    assert fs.dtype == np.dtype(ml_dtypes.bfloat16)
    idx = np.asarray([5, 5, 0, 123], dtype=np.int64)
    rows = fs.gather_rows(idx)
    np.testing.assert_array_equal(rows.view(np.uint16),
                                  arr[idx].view(np.uint16))
    buf = np.empty((4, 48), dtype=ml_dtypes.bfloat16)
    ticket = fs.prefetch_rows(idx, buf)
    if ticket is not None:
        fs.wait_rows(ticket)
        np.testing.assert_array_equal(buf.view(np.uint16),
                                      arr[idx].view(np.uint16))
