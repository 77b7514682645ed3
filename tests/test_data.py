"""Data layer: tokenizers, VQA-CX join, array views, feature store."""

import numpy as np

from vqa_counterexamples_tpu.data import synthetic, tokenizers, vqacx
from vqa_counterexamples_tpu.data.features import FeatureStore


def test_tokenize_mcb():
    """Golden cases for the MCB tokenizer (vqa_processed.py:45-53)."""
    assert tokenizers.tokenize_mcb("What is the man doing?") == \
        ["what", "is", "the", "man", "doing"]
    assert tokenizers.tokenize_mcb("Is it red/blue-green?") == \
        ["is", "it", "red", "blue", "green"]
    assert tokenizers.tokenize_mcb("What's in the (big) box, really?") == \
        ["whats", "in", "the", "big", "box", "really"]


def test_tokenize_naive():
    assert tokenizers.tokenize("What is, this?") == \
        ["What", "is", ",", "this", "?"]


def test_coco_names():
    assert vqacx.coco_name_to_num("COCO_train2014_000000452014.jpg") == 452014
    assert vqacx.coco_num_to_name(452014) == \
        "COCO_train2014_000000452014.jpg"
    assert vqacx.coco_num_to_name(1, "val") == "COCO_val2014_000000000001.jpg"


def test_build_augmented_examples():
    """Join keeps exactly the examples whose complement's image is in the
    KNN list (trainset builder cell 18)."""
    def ex(qid, img_num, answer="yes"):
        return {"question_id": qid,
                "image_name": vqacx.coco_num_to_name(img_num),
                "question": "q", "question_wids": [1, 0], "answer": answer,
                "answer_aid": 0}

    examples = [ex(1, 10), ex(2, 11), ex(3, 12), ex(4, 13)]
    comp_pairs = [[1, 2], [3, 99]]  # qid 3's complement not in the data
    knns = {10: [11, 12], 11: [10, 13], 12: [10, 11], 13: [10, 11]}
    out = vqacx.build_augmented_examples(examples, comp_pairs, knns)
    assert [e["question_id"] for e in out] == [1, 2]
    assert out[0]["comp"]["knn_index"] == 0      # img 11 is 10's 1st NN
    assert out[1]["comp"]["knn_index"] == 0      # img 10 is 11's 1st NN
    assert len(out[0]["knns"]) == 2


def test_cx_arrays_and_pairwise_view():
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=32, n_images=40, dim_v=8, knn_size=5, seed=0)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    assert arrays.image_idxs.shape == (32, 6)
    assert arrays.knn_size == 5
    # column 0 is the original image
    ex0 = dataset["examples_list"][0]
    assert arrays.image_idxs[0, 0] == dataset["name_to_index"][
        ex0["image_name"]]
    # comp candidate column matches the knn_index contract
    comp_feat = arrays.image_idxs[0, arrays.comp_idxs[0] + 1]
    assert comp_feat == dataset["name_to_index"][ex0["comp"]["image_name"]]

    pw = arrays.pairwise_view(np.random.default_rng(0))
    assert pw.image_idxs.shape == (32, 3)
    assert (pw.comp_idxs == 0).all()
    # slot 1 is the comp, slot 2 is a different candidate
    np.testing.assert_array_equal(
        pw.image_idxs[:, 1],
        arrays.image_idxs[np.arange(32), arrays.comp_idxs + 1])
    assert (pw.image_idxs[:, 1] != pw.image_idxs[:, 2]).all()


def test_synthetic_sampled_knn_structurally_valid():
    # true_knn=False skips the O(N^2) distance matrix (27 GB host RAM at
    # COCO scale) but must keep every structural contract: no self in a
    # knn list, comp present at its knn_index, arrays build cleanly.
    dataset, store = synthetic.make_synthetic_cx(
        n_examples=32, n_images=40, dim_v=8, knn_size=5, seed=0,
        true_knn=False)
    arrays = vqacx.CXArrays.from_examples(dataset["examples_list"],
                                          dataset["name_to_index"])
    assert arrays.image_idxs.shape == (32, 6)
    for ex in dataset["examples_list"]:
        assert ex["image_name"] not in ex["knns"]
        assert ex["knns"][ex["comp"]["knn_index"]] == ex["comp"]["image_name"]


def test_batch_indices_padding():
    batches = list(vqacx.batch_indices(10, 4, shuffle=False))
    assert [nv for _, nv in batches] == [4, 4, 2]
    assert all(len(idx) == 4 for idx, _ in batches)
    covered = np.concatenate([idx[:nv] for idx, nv in batches])
    np.testing.assert_array_equal(np.sort(covered), np.arange(10))


def test_feature_store_roundtrip(tmp_path):
    feats = np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)
    names = ["img%d" % i for i in range(6)]
    store = FeatureStore(feats, names)
    prefix = str(tmp_path / "trainset")
    store.save(prefix)
    store2 = FeatureStore.load(prefix)
    np.testing.assert_array_equal(store2.features, feats)
    assert store2.name_to_index == store.name_to_index
    np.testing.assert_array_equal(store2.get_by_name("img3"), feats[3])
