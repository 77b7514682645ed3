"""VQAArrays loader: samplingans distribution and batch contract."""

import numpy as np

from vqa_counterexamples_tpu.data.features import FeatureStore
from vqa_counterexamples_tpu.data.vqa_dataset import VQAArrays


def _store(n=8, d=4):
    feats = np.arange(n * d, dtype=np.float32).reshape(n, d)
    return FeatureStore(feats, ["img%d" % i for i in range(n)])


def _examples():
    return [
        {"question_id": 0, "image_name": "img0",
         "question_wids": [1, 2, 0, 0], "answer_aid": 3,
         "answers_aid": [3, 5], "answers_count": [9, 1]},
        {"question_id": 1, "image_name": "img3",
         "question_wids": [2, 0, 0, 0], "answer_aid": 4,
         "answers_aid": [], "answers_count": []},
    ]


def test_samplingans_distribution():
    """Answers drawn proportional to occurrence counts (vqa.py:62-76)."""
    arrays = VQAArrays(_examples(), _store(), samplingans=True)
    rng = np.random.default_rng(0)
    draws = [arrays.sample_answers(np.asarray([0]), rng)[0]
             for _ in range(500)]
    frac5 = np.mean(np.asarray(draws) == 5)
    assert 0.05 < frac5 < 0.2  # expect ~0.1
    # example with no answers_aid falls back to answer_aid
    assert arrays.sample_answers(np.asarray([1]), rng)[0] == 4


def test_batches_contract():
    arrays = VQAArrays(_examples(), _store(), samplingans=False)
    batches = list(arrays.batches(1, shuffle=False))
    assert len(batches) == 2
    b0 = batches[0]
    assert b0["visual"].shape == (1, 4)
    np.testing.assert_array_equal(b0["visual"][0],
                                  _store().features[0])
    assert b0["answer"][0] == 3 and b0["question_id"][0] == 0
