"""Synthetic VQA-CX fixtures shaped exactly like the real pipeline outputs.

Plays the role the reference gives to ``--dev_mode`` small pickles
(counterexamples.py:87,181-192): end-to-end smoke/golden tests and benchmarks
without COCO.  The generated feature geometry guarantees a learnable signal:
the complementary image is drawn close to the original in feature space and
candidate features encode their identity, so NeuralCX can beat the Random and
Distance baselines within a few epochs on CPU.
"""

from __future__ import annotations

import numpy as np

from . import vqacx
from .features import FeatureStore


def synthetic_vocab(n_words: int = 50, n_answers: int = 20):
    vocab_words = ["w%d" % i for i in range(n_words)]
    vocab_answers = ["a%d" % i for i in range(n_answers)]
    return vocab_words, vocab_answers


def make_synthetic_cx(n_examples: int = 256, n_images: int = 128,
                      dim_v: int = 2048, knn_size: int = 24,
                      maxlength: int = 26, n_words: int = 50,
                      n_answers: int = 20, seed: int = 0,
                      split: str = "train", learnable: bool = True,
                      true_knn: bool = True):
    """Returns (dataset_dict, FeatureStore).

    Structure: images have random unit-ish features; each example's KNN list
    is the true nearest neighbors of its image (consistent with the reference
    pipeline), and the comp image is one of them.

    ``true_knn=False`` replaces the exact KNN lists with uniformly-sampled
    ones: the O(N^2) pairwise-distance matrix is 27 GB of host RAM at COCO
    scale (82,783 images), far past what throughput/memory soaks need — they
    only require structurally-valid lists, not geometrically-true ones.
    """
    rng = np.random.default_rng(seed)
    if n_images <= knn_size + 1:
        raise ValueError(
            "make_synthetic_cx needs n_images > knn_size + 1 (got %d vs %d):"
            " candidate lists are %d DISTINCT non-self images per row"
            % (n_images, knn_size, knn_size))

    features = rng.normal(size=(n_images, dim_v)).astype(np.float32)
    names = [vqacx.coco_num_to_name(i, split) for i in range(n_images)]
    store = FeatureStore(features, names)

    if true_knn:
        # true knn lists (exclude self), sorted ascending distance
        norms = (features ** 2).sum(1)
        d2 = norms[:, None] - 2 * features @ features.T + norms[None, :]
        np.fill_diagonal(d2, np.inf)
        # argpartition + local sort: O(N^2 + N*k log k), not O(N^2 log N)
        part = np.argpartition(d2, knn_size, axis=1)[:, :knn_size]
        part_d = np.take_along_axis(d2, part, axis=1)
        order = np.argsort(part_d, axis=1)
        knn_idx = np.take_along_axis(part, order, axis=1)
    else:
        # per-image random candidate lists with DISTINCT offsets in
        # [1, n_images): sorted sampling-with-replacement from a reduced
        # range plus arange makes each row strictly increasing (hence
        # distinct and != self), then an in-row shuffle breaks the order.
        # Distinctness matters: pairwise_view's "random other candidate"
        # and the CE label both assume the comp appears exactly once.
        off = np.sort(rng.integers(1, n_images - knn_size + 1,
                                   size=(n_images, knn_size)), axis=1)
        off = rng.permuted(off + np.arange(knn_size), axis=1)
        knn_idx = (np.arange(n_images)[:, None] + off) % n_images

    vocab_words, vocab_answers = synthetic_vocab(n_words, n_answers)

    examples = []
    for ei in range(n_examples):
        img = int(rng.integers(0, n_images))
        knns = [names[j] for j in knn_idx[img]]
        qlen = int(rng.integers(3, 10))
        wids = [0] * maxlength
        for k in range(qlen):
            wids[k] = int(rng.integers(1, n_words + 1))  # right padding
        aid = int(rng.integers(0, n_answers))
        if learnable:
            # comp rank is a deterministic function of the answer id, which
            # CX models see directly through the (trainable) answer
            # embedding + the rank one-hot — a learnable test oracle
            comp_rank = aid % knn_size
        else:
            comp_rank = int(rng.integers(0, knn_size))
        comp_name = knns[comp_rank]
        examples.append({
            "question_id": ei,
            "image_name": names[img],
            "question": " ".join("w%d" % (w - 1) for w in wids[:qlen]),
            "question_wids": wids,
            "question_length": qlen,
            "answer": vocab_answers[aid],
            "answer_aid": aid,
            "comp": {
                "image_name": comp_name,
                "answer": vocab_answers[int(rng.integers(0, n_answers))],
                "knn_index": comp_rank,
            },
            "knns": knns,
        })

    dataset = vqacx.make_dataset_dict(examples, store.name_to_index,
                                      vocab_words, vocab_answers)
    return dataset, store


def tiny_vqa_options(dim_v: int = 2048, nans: int = 20, seq2vec_arch: str = "2-lstm",
                     dim_q: int | None = None) -> dict:
    """A MutanNoAtt option tree with reference keys but tiny dims, for tests."""
    dim_q = dim_q or 48
    return {
        "arch": "MutanNoAtt",
        "seq2vec": {"arch": seq2vec_arch, "emb_size": 16,
                    "hidden_size": dim_q // 2},
        "fusion": {
            "dim_v": dim_v, "dim_q": dim_q, "dim_hv": 24, "dim_hq": 24,
            "dim_mm": 24, "R": 3, "dropout_v": 0.5, "dropout_q": 0.5,
            "activation_v": "tanh", "activation_q": "tanh",
            "dropout_hv": 0, "dropout_hq": 0,
        },
        "classif": {"dropout": 0.5},
    }
