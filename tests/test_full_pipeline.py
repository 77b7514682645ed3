"""Integration: the full CLI pipeline chained through its on-disk contracts.

extract (synthetic images, random ResNet) -> knn (VQA-format json) ->
build_vqacx (join with synthetic processed pickles + comp pairs) ->
counterexamples training on the produced artifacts.  Mirrors the reference's
end-to-end recipe (README.md:55-61) on tiny synthetic data.
"""

import json
import os
import pickle

import numpy as np
import pytest


@pytest.mark.slow
def test_pipeline_chain(tmp_path):
    from vqa_counterexamples_tpu.cli import build_vqacx as bv_cli
    from vqa_counterexamples_tpu.cli import extract as ex_cli
    from vqa_counterexamples_tpu.cli import knn as knn_cli
    from vqa_counterexamples_tpu.data import vqacx
    from vqa_counterexamples_tpu.data.features import FeatureStore

    n_images = 30
    dir_data = str(tmp_path / "coco")

    # 1. extract: tiny images through a tiny-ish trunk (arch resnet50, 64px)
    prefix = ex_cli.main(["--synthetic", str(n_images), "--batch_size", "8",
                          "--dir_data", dir_data, "--arch", "resnet50",
                          "--size", "64", "--mode", "noatt"])
    assert os.path.exists(prefix + ".npy")
    # extract names are synthetic_*; rename rows to COCO names for the join
    store = FeatureStore.load(prefix)
    coco_names = [vqacx.coco_num_to_name(i) for i in range(n_images)]
    FeatureStore(store.features, coco_names).save(prefix)
    store = FeatureStore.load(prefix)  # reload under the renamed contract

    # 2. knn over the extracted features -> VQA-format json
    knn_json = str(tmp_path / "knn.json")
    knn_cli.main(["--path_features", prefix, "-k", "7",
                  "--json-out", knn_json])
    knns = json.loads(open(knn_json).read())
    assert len(knns) == n_images and len(knns["0"]) == 6

    # 3. synthetic processed pickles + comp pairs consistent with the knns
    processed = tmp_path / "processed"
    os.makedirs(processed)
    rng = np.random.default_rng(0)
    examples = []
    comp_pairs = []
    qid = 0
    for img in range(n_images):
        # a pair of questions whose images are mutual neighbors when
        # possible; the answer id encodes the partner's knn rank (the same
        # learnable signal data/synthetic.py and the E2E artifact plant),
        # so training through the REAL join demonstrably learns below
        neigh = knns[str(img)][0]
        rank_fwd = 0  # neigh is img's nearest neighbor by construction
        rank_bwd = (knns[str(neigh)].index(img)
                    if img in knns[str(neigh)] else 0)
        examples.append({"question_id": qid,
                         "image_name": vqacx.coco_num_to_name(img),
                         "question": "what is this",
                         "question_wids": [1, 2, 3, 0, 0, 0],
                         "answer": "a%d" % rank_fwd,
                         "answer_aid": rank_fwd})
        examples.append({"question_id": qid + 1,
                         "image_name": vqacx.coco_num_to_name(neigh),
                         "question": "what is that",
                         "question_wids": [1, 2, 4, 0, 0, 0],
                         "answer": "a%d" % rank_bwd,
                         "answer_aid": rank_bwd})
        comp_pairs.append([qid, qid + 1])
        qid += 2
    with open(processed / "trainset.pickle", "wb") as f:
        pickle.dump(examples, f)
    with open(processed / "wid_to_word.pickle", "wb") as f:
        pickle.dump({1: "what", 2: "is", 3: "this", 4: "that"}, f)
    with open(processed / "aid_to_ans.pickle", "wb") as f:
        pickle.dump(["a%d" % i for i in range(6)], f)
    with open(tmp_path / "pairs.json", "w") as f:
        json.dump(comp_pairs, f)

    out_dir = str(tmp_path / "cx")
    bv_cli.main(["--split", "train", "--path_processed", str(processed),
                 "--path_comp_pairs", str(tmp_path / "pairs.json"),
                 "--path_knn_json", knn_json,
                 "--path_features_txt", prefix + ".txt",
                 "--out_dir", out_dir])
    with open(os.path.join(out_dir, "trainset_augmented.pickle"), "rb") as f:
        ds = pickle.load(f)
    assert len(ds["examples_list"]) > 0
    for ex in ds["examples_list"]:
        # join contract: comp's image is at knn_index within knns
        assert ex["knns"][ex["comp"]["knn_index"]] == \
            ex["comp"]["image_name"]

    # 4. a couple of CX training steps on the produced artifacts
    import jax.numpy as jnp
    import optax

    from vqa_counterexamples_tpu.data.synthetic import tiny_vqa_options
    from vqa_counterexamples_tpu.engines import cx_engine
    from vqa_counterexamples_tpu.models import factory

    arrays = vqacx.CXArrays.from_examples(ds["examples_list"],
                                          store.name_to_index)
    features = jnp.asarray(np.asarray(FeatureStore.load(prefix).features))
    opt = tiny_vqa_options(dim_v=features.shape[1], nans=6)
    vqa_model = factory.factory_vqa(opt, ds["vocab_words"],
                                    ds["vocab_answers"])
    spec = dict(dim_h=16, n_layers=1, drop_p=0.0, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True,
                z_emb=True, pretrained_emb=False, trainable_vqa=False)
    model = factory.factory_cx("NeuralModel", vqa_model,
                               knn_size=arrays.knn_size, model_spec=spec)
    optimizer = optax.adam(1e-3)
    bsz = min(16, arrays.size)
    state = cx_engine.init_cx_state(
        model, optimizer, vqacx.gather_batch(arrays, np.arange(bsz)),
        features)
    ts = cx_engine.make_cx_train_step(model, optimizer, recall_k=3)
    es = cx_engine.make_cx_eval_step(model, recall_k=3)
    rng2 = np.random.default_rng(0)
    for _ in range(8):
        state, _ = cx_engine.train_epoch(ts, state, features, arrays, bsz,
                                         rng=rng2)
    ev = cx_engine.eval_model(es, state.params, features, arrays, bsz)
    assert np.isfinite(ev["loss"])
    # the planted aid->rank signal must be learnable through the real
    # extract->knn->join chain; chance recall@3 = 3/knn_size = 0.5
    assert ev["recall"] > 0.65, ev
