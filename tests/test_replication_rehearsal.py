"""Synthetic rehearsal of the full replication runbook (VERDICT r4 #1).

``scripts/replicate_reference.py`` is the only path to the one BASELINE.md
number the zero-egress build environment cannot produce (real-data NeuralCX
18.47/55.14, reference README.md:34-41).  A runbook that has never executed
is a plan, not an artifact — this test drives its REAL nine-stage STAGES
list end-to-end with ``--rehearsal``: generated miniature fixtures stand in
for the downloads, and every other stage runs the real CLI subprocess with
the real path conventions and scaled thresholds.  The first execution of
this rehearsal caught three full-scale glue bugs (a dict-shaped assertion
over the list-shaped trainset pickle, the answer-embedding stage reading
dims from the stock yaml instead of the rewritten one, and the cx config
missing the scaled ``dim_a``).
"""

import glob
import json
import os
import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_replication_runbook_rehearsal(tmp_path):
    proj = tmp_path / "proj"
    env = dict(os.environ)
    # persistent compile cache: the nine stages spawn ~12 subprocesses and
    # re-runs of the suite then skip their XLA compiles entirely
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    proc = subprocess.run(
        [sys.executable, "scripts/replicate_reference.py",
         "--project_dir", str(proj), "--rehearsal"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
    tail = proc.stdout[-4000:] + "\n--- stderr ---\n" + proc.stderr[-2000:]
    assert proc.returncode == 0, tail
    assert "replication complete" in proc.stdout, tail

    # every stage must have really run (stage order = the STAGES list)
    stages = [line.split(": ", 1)[1] for line in proc.stdout.splitlines()
              if line.startswith("==== stage: ")]
    assert stages == ["download", "preprocess", "skipthoughts", "extract",
                      "knn", "train", "answer_embedding", "build_vqacx",
                      "counterexamples"], stages

    # spot-check the artifact chain the stages assert on internally
    processed = (proj / "data" / "vqa2" / "processed" /
                 "nans,10_maxlength,26_minwcount,0_nlp,mcb_pad,right_"
                 "trainsplit,train")
    assert (processed / "trainset.pickle").exists()
    feats = proj / "data" / "coco" / "extract" / "arch,fbresnet152_size,64"
    assert (feats / "trainset.txt").exists()
    assert (proj / "data" / "skip-thoughts" / "adapted_uniskip.npz").exists()
    assert (proj / "logs" / "vqa2" / "mutan_noatt_train" /
            "best_model.msgpack").exists()
    with open(proj / "data" / "cx" / "trainset_augmented.pickle",
              "rb") as f:
        cx_ds = pickle.load(f)
    assert len(cx_ds["examples_list"]) > 4
    results = sorted(glob.glob(str(
        proj / "logs" / "cx" / "*replication*" / "final_results.txt")))
    assert results, "counterexamples --test wrote no final_results.txt"
    vals = json.load(open(results[-1]))
    assert set(vals) >= {"loss", "recall", "recall_1", "best_epoch"}
    assert 0.0 <= vals["recall_1"] <= vals["recall"] <= 1.0

    # idempotence: a second invocation must skip every completed stage
    # fast (the unattended full-scale run relies on resume-after-failure)
    proc2 = subprocess.run(
        [sys.executable, "scripts/replicate_reference.py",
         "--project_dir", str(proj), "--rehearsal"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc2.returncode == 0, proc2.stdout[-2000:] + proc2.stderr[-1000:]
    assert "replication complete" in proc2.stdout
