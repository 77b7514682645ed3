"""Dataset factory: the reference's ``datasets.factory_VQA`` equivalent.

Reference behavior (``vqa/datasets/vqa.py:250-267`` + ``utils.py:7-68``):
constructing a dataset lazily triggers the raw -> interim -> processed
pipeline on first use, then loads the processed pickles and the COCO feature
store for the split; with a vgenome option tree the train split is
concatenated with Visual Genome QA remapped into the VQA vocab.

``download_raw`` holds the official artifact URLs (reference _raw steps,
vqa.py:123-177, vgenome.py:13-34) — it shells out to wget/unzip and is a
no-op when egress is unavailable.
"""

from __future__ import annotations

import os
import pickle
import subprocess

from ..core.config import options_subdir
from . import interim as interim_mod
from . import processed as processed_mod
from . import vgenome as vgenome_mod
from .features import FeatureStore
from .vqa_dataset import VQAArrays

VQA2_URLS = [
    "http://visualqa.org/data/mscoco/vqa/v2_Questions_Train_mscoco.zip",
    "http://visualqa.org/data/mscoco/vqa/v2_Questions_Val_mscoco.zip",
    "http://visualqa.org/data/mscoco/vqa/v2_Questions_Test_mscoco.zip",
    "http://visualqa.org/data/mscoco/vqa/v2_Annotations_Train_mscoco.zip",
    "http://visualqa.org/data/mscoco/vqa/v2_Annotations_Val_mscoco.zip",
    "http://visualqa.org/data/mscoco/vqa/v2_Complementary_Pairs_Train_mscoco.zip",
    "http://visualqa.org/data/mscoco/vqa/v2_Complementary_Pairs_Val_mscoco.zip",
]
KNN_URLS = [
    "http://visualqa.org/data/mscoco/vqa/mscoco_train2014_nn_images.json",
    "http://visualqa.org/data/mscoco/vqa/mscoco_val2014_nn_images.json",
]
COCO_URLS = [
    "http://msvocds.blob.core.windows.net/coco2014/train2014.zip",
    "http://msvocds.blob.core.windows.net/coco2014/val2014.zip",
    "http://msvocds.blob.core.windows.net/coco2015/test2015.zip",
]
VGENOME_URLS = [
    "https://visualgenome.org/static/data/dataset/question_answers.json.zip",
    "https://cs.stanford.edu/people/rak248/VG_100K/images.zip",
    "https://cs.stanford.edu/people/rak248/VG_100K_2/images2.zip",
]


def download_raw(dir_raw: str, urls: list[str]) -> bool:
    """wget + unzip each artifact into dir_raw; returns False on failure
    (zero-egress environments)."""
    os.makedirs(dir_raw, exist_ok=True)
    for url in urls:
        name = url.rsplit("/", 1)[-1]
        dest = os.path.join(dir_raw, name)
        if os.path.exists(dest):
            continue
        try:
            subprocess.run(["wget", "-q", "-O", dest, url], check=True)
            if name.endswith(".zip"):
                subprocess.run(["unzip", "-o", "-q", dest, "-d", dir_raw],
                               check=True)
        except Exception as exc:  # noqa: BLE001
            print("download failed for %s (%s)" % (url, exc))
            return False
    return True


def ensure_processed(opt_vqa: dict, version: int = 2) -> str:
    """Run interim + processed builders if the pickles are missing; returns
    the processed dir."""
    processed_dir = os.path.join(opt_vqa["dir"], "processed",
                                 options_subdir(opt_vqa))
    split = ("trainvalset" if opt_vqa["trainsplit"] == "trainval"
             else "trainset")
    if os.path.exists(os.path.join(processed_dir, split + ".pickle")):
        return processed_dir
    interim_file = os.path.join(opt_vqa["dir"], "interim",
                                "train_questions_annotations.json")
    if not os.path.exists(interim_file):
        interim_mod.vqa_interim(opt_vqa["dir"], version=version)
    processed_mod.vqa_processed({
        "dir": opt_vqa["dir"], "trainsplit": opt_vqa["trainsplit"],
        "nans": opt_vqa["nans"], "maxlength": opt_vqa["maxlength"],
        "minwcount": opt_vqa["minwcount"], "nlp": opt_vqa["nlp"],
        "pad": opt_vqa["pad"]})
    return processed_dir


def factory_vqa_dataset(split: str, opt_vqa: dict, opt_coco: dict,
                        opt_vgenome: dict | None = None):
    """Returns (VQAArrays, vocab_words, vocab_answers, FeatureStore).

    split: 'train' | 'val' | 'trainval' | 'test' | 'testdev' (mirrors
    factory_VQA's dispatch, reference vqa.py:250-267).  For 'test' the
    returned arrays carry ``is_qid_testdev`` — the set of question ids in
    the test-dev subset (reference vqa.py:30-36,63-66) — so the trainer can
    emit both test2015 and test-dev2015 submission files.
    """
    version = 2 if opt_vqa.get("dataset", "VQA2") == "VQA2" else 1
    base_split = ("trainval" if split in ("test", "testdev")
                  else "train" if split == "val" else split)
    processed_dir = ensure_processed(dict(opt_vqa, trainsplit=base_split),
                                     version=version)
    fname = {"train": "trainset", "val": "valset",
             "trainval": "trainvalset", "test": "testset",
             "testdev": "testdevset"}[split] + ".pickle"
    with open(os.path.join(processed_dir, fname), "rb") as f:
        examples = pickle.load(f)
    is_qid_testdev = None
    if split == "test":
        testdev_path = os.path.join(processed_dir, "testdevset.pickle")
        if os.path.exists(testdev_path):
            with open(testdev_path, "rb") as f:
                is_qid_testdev = {ex["question_id"]
                                  for ex in pickle.load(f)}
    with open(os.path.join(processed_dir, "wid_to_word.pickle"), "rb") as f:
        wid_to_word = pickle.load(f)
    vocab_words = [wid_to_word[i] for i in sorted(wid_to_word)]
    with open(os.path.join(processed_dir, "aid_to_ans.pickle"), "rb") as f:
        vocab_answers = pickle.load(f)

    feats_dir = os.path.join(
        opt_coco["dir"], "extract",
        "arch,%s_size,%d" % (opt_coco["arch"], opt_coco.get("size", 448)))
    store_split = {"val": "valset", "test": "testset",
                   "testdev": "testset"}.get(split, "trainset")
    store = FeatureStore.load(os.path.join(feats_dir, store_split),
                              dataset=opt_coco.get("mode", "noatt"))

    if opt_vgenome and split in ("train", "trainval"):
        vg_interim = os.path.join(opt_vgenome["dir"], "interim",
                                  "train_questions_annotations.json")
        if os.path.exists(vg_interim):
            import json
            with open(vg_interim) as f:
                vg_rows = json.load(f)
            vg_examples, _, _ = vgenome_mod.vgenome_processed(
                vg_rows, opt_vgenome)
            ans_to_aid = {a: i for i, a in enumerate(vocab_answers)}
            word_to_wid = {w: i + 1 for i, w in enumerate(vocab_words)}
            examples = vgenome_mod.merge_vqa_vgenome(
                examples, vg_examples, ans_to_aid, word_to_wid)
        else:
            print("vgenome interim missing at %s; skipping concat"
                  % vg_interim)

    arrays = VQAArrays(examples, store,
                       samplingans=opt_vqa.get("samplingans", False)
                       and split in ("train", "trainval"))
    arrays.is_qid_testdev = is_qid_testdev
    return arrays, vocab_words, vocab_answers, store
