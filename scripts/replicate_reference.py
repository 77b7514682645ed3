#!/usr/bin/env python3
"""Pinned, unattended replication of the reference accuracy numbers.

The one axis of BASELINE.md with no in-environment evidence is real-data
accuracy (NeuralCX Recall@1 18.47 / Recall@5 55.14, reference
README.md:34-41): the build environment has zero egress, so the COCO
images, VQA2 annotations, skip-thoughts weights and fbresnet152 checkpoint
cannot be fetched here.  This script is the runbook a machine WITH egress
runs unattended (VERDICT r3 #6): every stage is a CLI this repo ships,
every artifact URL is pinned, checksums are recorded/verified via a
lockfile, intermediate shapes are asserted, and the final stage asserts the
BASELINE.md acceptance thresholds.

Requirements on the runner:
  * this repo on PYTHONPATH (run from the repo root), jax on a TPU (v5e or
    better; CPU works but the extract stage will take days), torch (cpu is
    fine — only used to read the fbresnet .pth), wget, unzip
  * ~80 GB disk for raw + extracted artifacts
  * wall clock on a v5e-8: extract ~1-2 h for 123k images, VQA pretrain
    ~(40 epochs x ~1 min), CX training 20 epochs of 216k examples at
    ~200k examples/sec/chip = minutes; downloads dominate.

Usage:
    python scripts/replicate_reference.py --project_dir /data/vqacx \
        [--stages download,preprocess,skipthoughts,extract,knn,train,\
answer_embedding,build_vqacx,counterexamples] [--official_knn]

Stages are idempotent (each checks its outputs first); rerun after a
failure and completed stages are skipped.  ``--official_knn`` uses the
VQA-distributed 24-NN lists (what the paper used,
vqacx_trainset_builder.ipynb cell 11) instead of self-computed kNN.

Acceptance (asserted in the final stage, targets from BASELINE.md):
  * VQA2 val OpenEnded acc@1 of the MutanNoAtt pretrain >= 0.56
    (reference best 58.14 at epoch 39; we accept a small training-noise
    margin below it)
  * VQA-CX test Recall@1 >= 18.4, Recall@5 >= 55.1
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ---- pinned artifact URLs -------------------------------------------------
# VQA2 + comp pairs + official KNN lists: the visualqa.org distribution the
# reference's _raw steps fetch (vqa/datasets/vqa.py:151-177; KNN JSONs from
# vqacx_trainset_builder.ipynb cell 11).  COCO images: the 2014 release
# (vqa/datasets/coco.py:35).  Skip-thoughts: the Toronto originals with the
# lip6 mirror skip-thoughts.torch uses.  fbresnet152: the Cadene
# pretrained-models checkpoint (Torch7-ported ResNet-152 the reference
# extracts with, convnets.py:76-80).
URLS = {
    "vqa2": [
        "http://visualqa.org/data/mscoco/vqa/v2_Questions_Train_mscoco.zip",
        "http://visualqa.org/data/mscoco/vqa/v2_Questions_Val_mscoco.zip",
        "http://visualqa.org/data/mscoco/vqa/v2_Annotations_Train_mscoco.zip",
        "http://visualqa.org/data/mscoco/vqa/v2_Annotations_Val_mscoco.zip",
        "http://visualqa.org/data/mscoco/vqa/"
        "v2_Complementary_Pairs_Train_mscoco.zip",
        "http://visualqa.org/data/mscoco/vqa/"
        "v2_Complementary_Pairs_Val_mscoco.zip",
    ],
    "knn": [
        "http://visualqa.org/data/mscoco/vqa/mscoco_train2014_nn_images.json",
        "http://visualqa.org/data/mscoco/vqa/mscoco_val2014_nn_images.json",
    ],
    "coco": [
        "http://msvocds.blob.core.windows.net/coco2014/train2014.zip",
        "http://msvocds.blob.core.windows.net/coco2014/val2014.zip",
    ],
    "skipthoughts": [
        # primary: U. Toronto (rkiros); mirror: data.lip6.fr/cadene
        "http://www.cs.toronto.edu/~rkiros/models/dictionary.txt",
        "http://www.cs.toronto.edu/~rkiros/models/utable.npy",
        "http://www.cs.toronto.edu/~rkiros/models/uni_skip.npz",
        "http://www.cs.toronto.edu/~rkiros/models/uni_skip.npz.pkl",
    ],
    "fbresnet": [
        "http://data.lip6.fr/cadene/pretrainedmodels/"
        "fbresnet152-2e20f6b4.pth",
    ],
}
MIRRORS = {
    "http://www.cs.toronto.edu/~rkiros/models/":
        "http://data.lip6.fr/cadene/skip-thoughts/",
}
# minimum plausible sizes (bytes) — catches truncated/HTML-error downloads
MIN_SIZES = {
    "train2014.zip": 12_000_000_000,
    "val2014.zip": 6_000_000_000,
    "utable.npy": 2_000_000_000,
    "uni_skip.npz": 500_000_000,
    "fbresnet152-2e20f6b4.pth": 200_000_000,
    "dictionary.txt": 5_000_000,
    "v2_Questions_Train_mscoco.zip": 20_000_000,
    "v2_Annotations_Train_mscoco.zip": 20_000_000,
    "mscoco_train2014_nn_images.json": 20_000_000,
}
# expected dataset cardinalities (official 2014/VQA2 release counts)
N_TRAIN_IMAGES = 82_783
N_VAL_IMAGES = 40_504
N_ANSWERS = 2000
DIM_Q = 2400


def sh(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def cli(module, *args):
    sh([sys.executable, "-m", "vqa_counterexamples_tpu.cli." + module,
        *map(str, args)])


def sha256(path, chunk=1 << 22):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                return h.hexdigest()
            h.update(b)


class Lockfile:
    """sha256 pin-on-first-download: the zero-egress build environment
    cannot know the upstream hashes, so the FIRST successful run records
    them here (commit the file!) and every later run verifies against the
    recorded pin — drift (mirror swap, corrupted re-download) fails loudly.
    """

    def __init__(self, path):
        self.path = path
        self.pins = {}
        if os.path.exists(path):
            with open(path) as f:
                self.pins = json.load(f)

    def check(self, path):
        name = os.path.basename(path)
        size = os.path.getsize(path)
        lo = MIN_SIZES.get(name)
        assert lo is None or size >= lo, (
            "%s is %d bytes, expected >= %d — truncated download?"
            % (name, size, lo))
        digest = sha256(path)
        if name in self.pins:
            assert self.pins[name]["sha256"] == digest, (
                "%s sha256 %s != pinned %s" % (name, digest,
                                               self.pins[name]["sha256"]))
        else:
            self.pins[name] = {"sha256": digest, "size": size}
            with open(self.path, "w") as f:
                json.dump(self.pins, f, indent=2, sort_keys=True)
        print("  ok %-45s %11d bytes  %s" % (name, size, digest[:16]))


# ---- stages ---------------------------------------------------------------

def stage_download(P, lock):
    for group, urls in URLS.items():
        dest_dir = {"vqa2": P.vqa_raw, "knn": P.knn_dir, "coco": P.coco_raw,
                    "skipthoughts": P.dir_st,
                    "fbresnet": P.weights_dir}[group]
        # VQA2 zips hold flat JSONs at the zip root, but every consumer
        # reads them from raw/annotations/ (data/interim.py:51,
        # stage_build_vqacx below) — extract there, not into raw/
        unzip_dir = (os.path.join(P.vqa_raw, "annotations")
                     if group == "vqa2" else dest_dir)
        os.makedirs(dest_dir, exist_ok=True)
        for url in urls:
            name = url.rsplit("/", 1)[-1]
            dest = os.path.join(dest_dir, name)
            if not os.path.exists(dest):
                try:
                    sh(["wget", "-q", "-O", dest + ".part", url])
                except subprocess.CalledProcessError:
                    base = url.rsplit("/", 1)[0] + "/"
                    mirror = MIRRORS.get(base)
                    if not mirror:
                        raise
                    sh(["wget", "-q", "-O", dest + ".part", mirror + name])
                os.replace(dest + ".part", dest)
            lock.check(dest)
            if name.endswith(".zip"):
                os.makedirs(unzip_dir, exist_ok=True)
                sh(["unzip", "-n", "-q", dest, "-d", unzip_dir])
    n_train = len(glob.glob(os.path.join(P.coco_raw, "train2014", "*.jpg")))
    n_val = len(glob.glob(os.path.join(P.coco_raw, "val2014", "*.jpg")))
    assert n_train == N_TRAIN_IMAGES, (n_train, N_TRAIN_IMAGES)
    assert n_val == N_VAL_IMAGES, (n_val, N_VAL_IMAGES)


def stage_preprocess(P, lock):
    if os.path.exists(os.path.join(P.processed, "trainset.pickle")):
        return
    cli("preprocess", "interim", "--dir_vqa", P.dir_vqa, "--version", 2)
    cli("preprocess", "processed", "--dirname", P.dir_vqa,
        "--nans", N_ANSWERS, "--maxlength", 26, "--minwcount", 0,
        "--nlp", "mcb", "--pad", "right")
    with open(os.path.join(P.processed, "trainset.pickle"), "rb") as f:
        ds = pickle.load(f)
    assert len(ds["vocab_answers"]) == N_ANSWERS
    # VQA2 train has 443,757 questions; ~12% have OOV answers and drop
    # (vqa_processed.py:34-40 semantics)
    assert 350_000 < len(ds["examples_list"]) < 443_757, \
        len(ds["examples_list"])


def stage_skipthoughts(P, lock):
    out = os.path.join(P.dir_st, "adapted_uniskip.npz")
    if os.path.exists(out):
        return
    cli("port_skipthoughts", "--dir_st", P.dir_st,
        "--vocab", os.path.join(P.processed, "wid_to_word.pickle"),
        "--table", "utable", "--out", out)
    import numpy as np

    z = np.load(out)
    emb = z[[k for k in z.files if "emb" in k][0]]
    assert emb.shape[1] == 620, emb.shape


def stage_extract(P, lock):
    for split, n_img in (("train", N_TRAIN_IMAGES), ("val", N_VAL_IMAGES)):
        prefix = os.path.join(P.features, "%sset" % split)
        txt = prefix + ".txt"
        if os.path.exists(txt):
            continue
        cli("extract", "--dir_data", P.dir_coco, "--dataset", "coco",
            "--data_split", split, "--arch", "fbresnet152",
            "--mode", "both", "--size", 448, "--batch_size", 80,
            "--weights",
            os.path.join(P.weights_dir, "fbresnet152-2e20f6b4.pth"))
        names = open(txt).read().splitlines()
        assert len(names) == n_img, (split, len(names), n_img)


def stage_knn(P, lock):
    for split in ("train", "val"):
        out = os.path.join(P.knn_dir,
                           "computed_%s2014_nn_images.json" % split)
        if os.path.exists(out):
            continue
        cli("knn", "--path_features",
            os.path.join(P.features, "%sset" % split),
            "-k", 25, "--split", split, "--json-out", out)
        lists = json.load(open(out))
        n = N_TRAIN_IMAGES if split == "train" else N_VAL_IMAGES
        assert len(lists) == n
        assert len(next(iter(lists.values()))) == 24


def write_vqa_train_yaml(P) -> str:
    """Rewrite the stock VQA yaml's repo-relative data paths to the
    earlier stages' --project_dir outputs (same recipe as
    stage_counterexamples — without this the pretrain stage can't find
    the preprocessed/extracted data, and the pretrained skip-thoughts
    graft in cli/train silently never fires)."""
    import yaml

    with open(os.path.join(REPO, "configs", "vqa2",
                           "mutan_noatt_train.yaml")) as f:
        opt = yaml.safe_load(f)
    opt["vqa"]["dir"] = P.dir_vqa
    opt["coco"]["dir"] = P.dir_coco
    opt["coco"]["path_features"] = P.features
    opt["model"]["seq2vec"]["dir_st"] = P.dir_st
    path_opt = os.path.join(P.project_dir, "vqa_replication.yaml")
    with open(path_opt, "w") as f:
        yaml.safe_dump(opt, f)
    return path_opt


def stage_train(P, lock):
    best = os.path.join(P.dir_logs_vqa, "best_model.msgpack")
    if not os.path.exists(best):
        cli("train", "--path_opt", write_vqa_train_yaml(P),
            "--dir_logs", P.dir_logs_vqa, "--epochs", 40,
            "-b", 512)
    # Experiment.to_json layout (core/experiment.py): logged[split][meter]
    # maps epoch -> value; info["val"] carries best_acc1
    exp = json.load(open(os.path.join(P.dir_logs_vqa, "logger.json")))
    val = exp.get("logged", {}).get("val", {})
    accs = list(val.get("acc1", {}).values())
    best_acc = max(accs) if accs else exp.get("info", {}).get(
        "val", {}).get("best_acc1")
    assert best_acc is not None, "no val acc1 in logger.json"
    assert best_acc >= 56.0, (
        "VQA val acc@1 %.2f < 56 (reference best 58.14 at epoch 39, "
        "doc/mutan_noatt.html)" % best_acc)


def stage_answer_embedding(P, lock):
    out = os.path.join(P.cx_data, "answer_embedding.pickle")
    if os.path.exists(out):
        return
    os.makedirs(P.cx_data, exist_ok=True)
    cli("build_answer_embedding",
        "--path_opt", "configs/vqa2/mutan_noatt_train.yaml",
        "--path_processed", P.processed, "--dir_logs", P.dir_logs_vqa,
        "--out", out)
    import numpy as np

    with open(out, "rb") as f:
        table = pickle.load(f)
    assert table.shape == (N_ANSWERS, DIM_Q), table.shape
    covered = (np.abs(table).sum(1) > 0).mean()
    # "good answers" = all words in the question vocab; historically ~70%
    assert covered > 0.5, covered


def stage_build_vqacx(P, lock):
    knn_tpl = (os.path.join(P.knn_dir, "mscoco_%s2014_nn_images.json")
               if P.official_knn else
               os.path.join(P.knn_dir, "computed_%s2014_nn_images.json"))
    for split in ("train", "val"):
        out = os.path.join(P.cx_data,
                           "%sset_augmented.pickle"
                           % ("train" if split == "train" else "val"))
        if os.path.exists(out):
            continue
        cli("build_vqacx", "--split", split,
            "--path_processed", P.processed,
            "--path_comp_pairs",
            os.path.join(P.vqa_raw, "annotations",
                         "v2_mscoco_%s2014_complementary_pairs.json"
                         % split),
            "--path_knn_json", knn_tpl % split,
            "--path_features_txt",
            os.path.join(P.features, "%sset.txt" % split),
            "--out_dir", P.cx_data)
    with open(os.path.join(P.cx_data, "trainset_augmented.pickle"),
              "rb") as f:
        ds = pickle.load(f)
    # comp-pairs x KNN join keeps ~216k of the train pairs (the number the
    # full-scale soak reproduces synthetically, SOAK_r03.json)
    assert 150_000 < len(ds["examples_list"]) < 300_000, \
        len(ds["examples_list"])
    for ex in ds["examples_list"][:3]:
        assert len(ex["knns"]) == 24 and 0 <= ex["comp"]["knn_index"] < 24


def stage_counterexamples(P, lock):
    import yaml

    with open(os.path.join(REPO, "configs", "cx",
                           "counterexamples_default.yaml")) as f:
        opt = yaml.safe_load(f)
    opt["logs"]["dir_logs"] = P.dir_logs_vqa
    opt["vqa"]["dir"] = P.dir_vqa
    opt["vqa"]["path_trainset"] = P.cx_data
    opt["coco"]["dir"] = P.dir_coco
    opt["coco"]["path_features"] = P.features
    opt["model"]["seq2vec"]["dir_st"] = P.dir_st
    path_opt = os.path.join(P.project_dir, "cx_replication.yaml")
    with open(path_opt, "w") as f:
        yaml.safe_dump(opt, f)

    # the literal reference repro command (README.md:55-61) + --test
    cli("counterexamples", "--cx_model", "NeuralModel", "--epochs", 20,
        "--path_opt", path_opt, "--project_dir", P.project_dir,
        "--comment", "replication", "--test")
    results = sorted(glob.glob(os.path.join(
        P.project_dir, "logs", "cx", "*replication*",
        "final_results.txt")))
    assert results, "no final_results.txt written by --test"
    # JSON from counterexamples.py:494-495: {"loss", "recall" (=recall@5),
    # "recall_1", "best_epoch"}; recalls are fractions
    vals = json.load(open(results[-1]))
    r1 = 100.0 * vals["recall_1"]
    r5 = 100.0 * vals["recall"]
    print("FINAL: Recall@1 %.2f (target >= 18.4)  Recall@5 %.2f "
          "(target >= 55.1)" % (r1, r5))
    assert r1 >= 18.4, "Recall@1 %.2f below the BASELINE.md target" % r1
    assert r5 >= 55.1, "Recall@5 %.2f below the BASELINE.md target" % r5


STAGES = [("download", stage_download), ("preprocess", stage_preprocess),
          ("skipthoughts", stage_skipthoughts), ("extract", stage_extract),
          ("knn", stage_knn), ("train", stage_train),
          ("answer_embedding", stage_answer_embedding),
          ("build_vqacx", stage_build_vqacx),
          ("counterexamples", stage_counterexamples)]


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--project_dir", required=True)
    ap.add_argument("--stages", default=",".join(s for s, _ in STAGES))
    ap.add_argument("--official_knn", action="store_true",
                    help="use the VQA-distributed 24-NN JSONs (the paper's "
                         "configuration) instead of self-computed kNN")
    P = ap.parse_args(argv)

    P.project_dir = os.path.abspath(P.project_dir)
    P.dir_vqa = os.path.join(P.project_dir, "data", "vqa2")
    P.vqa_raw = os.path.join(P.dir_vqa, "raw")
    P.dir_coco = os.path.join(P.project_dir, "data", "coco")
    P.coco_raw = os.path.join(P.dir_coco, "raw")
    P.knn_dir = os.path.join(P.dir_coco, "knn")
    P.dir_st = os.path.join(P.project_dir, "data", "skip-thoughts")
    P.weights_dir = os.path.join(P.project_dir, "data", "weights")
    P.processed = os.path.join(
        P.dir_vqa, "processed",
        "nans,2000_maxlength,26_minwcount,0_nlp,mcb_pad,right_"
        "trainsplit,train")
    P.features = os.path.join(P.dir_coco, "extract",
                              "arch,fbresnet152_size,448")
    P.dir_logs_vqa = os.path.join(P.project_dir, "logs", "vqa2",
                                  "mutan_noatt_train")
    P.cx_data = os.path.join(P.project_dir, "data", "cx")

    lock = Lockfile(os.path.join(REPO, "scripts",
                                 "replicate_reference.lock.json"))
    wanted = P.stages.split(",")
    for name, fn in STAGES:
        if name not in wanted:
            continue
        print("==== stage: %s" % name, flush=True)
        fn(P, lock)
    print("replication complete")


if __name__ == "__main__":
    main()
