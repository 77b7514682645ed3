"""core layer: config merge, meters, experiment, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vqa_counterexamples_tpu.core import checkpoint, config
from vqa_counterexamples_tpu.core.experiment import Experiment, ScalarWriter
from vqa_counterexamples_tpu.core.meters import AvgMeter, SumMeter, ValueMeter


def test_update_values_semantics():
    """Reference semantics (vqa/lib/utils.py:6-12): recursive merge, None
    leaves skipped, CLI(non-None) wins."""
    base = {"optim": {"lr": 0.1, "bs": 64}, "name": "x"}
    over = {"optim": {"lr": None, "bs": 128}, "name": None}
    out = config.update_values(over, base)
    assert out["optim"] == {"lr": 0.1, "bs": 128}
    assert out["name"] == "x"


def test_merge_dict():
    assert config.merge_dict({"a": 1, "b": {"c": 2}},
                             {"b": {"c": None, "d": 3}}) == \
        {"a": 1, "b": {"c": 2, "d": 3}}


def test_options_subdir_naming():
    params = {"nans": 2000, "maxlength": 26, "minwcount": 0, "nlp": "mcb",
              "pad": "right", "trainsplit": "train"}
    assert config.options_subdir(params) == (
        "nans,2000_maxlength,26_minwcount,0_nlp,mcb_pad,right_"
        "trainsplit,train")


def test_resolve_options(tmp_path):
    import yaml
    ypath = tmp_path / "opt.yaml"
    ypath.write_text(yaml.safe_dump({"optim": {"lr": 0.0001},
                                     "model": {"arch": "MutanNoAtt"}}))
    out = config.resolve_options(
        {"optim": {"lr": 0.1, "epochs": 10}, "model": {}},
        str(ypath), {"optim": {"lr": None, "epochs": 20}})
    assert out["optim"] == {"lr": 0.0001, "epochs": 20}
    assert out["model"]["arch"] == "MutanNoAtt"


def test_meters():
    a = AvgMeter()
    a.update(1.0, n=2)
    a.update(4.0, n=1)
    assert abs(a.value() - 2.0) < 1e-9
    s = SumMeter()
    s.update(2.0, n=3)
    assert s.value() == 6.0
    v = ValueMeter()
    v.update(5)
    assert v.value() == 5.0


def test_experiment_roundtrip(tmp_path):
    xp = Experiment("test", {"lr": 0.1})
    xp.add_meters("train", {"loss": AvgMeter(), "acc1": AvgMeter()})
    xp.get_meter("train", "loss").update(0.5, n=4)
    xp.log_meters("train", n=1)
    path = str(tmp_path / "logger.json")
    xp.to_json(path)
    xp2 = Experiment.from_json(path)
    assert xp2.logged["train"]["loss"]["1"] == 0.5 or \
        xp2.logged["train"]["loss"][1] == 0.5
    assert xp2.options == {"lr": 0.1}


def test_scalar_writer(tmp_path):
    w = ScalarWriter(str(tmp_path / "runs"))
    w.add_scalar("loss", 0.25, 1)
    w.close()
    import json
    events = [json.loads(l) for l in
              open(os.path.join(str(tmp_path / "runs"), "events.jsonl"))]
    assert events[0]["tag"] == "loss" and events[0]["value"] == 0.25


def test_cx_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    info = [{"recall": 0.4}, {"recall": 0.5}]
    checkpoint.save_cx_checkpoint(state, info, str(tmp_path), is_best=True)
    template = {"params": {"w": jnp.zeros((2, 3))}, "step": jnp.asarray(0)}
    restored, info2, next_epoch, best = checkpoint.load_cx_checkpoint(
        template, str(tmp_path), resume_best=True)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert next_epoch == 3 and best == 0.5 and info2 == info


def test_vqa_checkpoint_roundtrip(tmp_path):
    model_state = {"w": jnp.ones((2, 2))}
    optim_state = {"m": jnp.zeros((2, 2))}
    info = {"epoch": 3, "acc1": 55.0}
    checkpoint.save_vqa_checkpoint(info, model_state, optim_state,
                                   str(tmp_path), is_best=True)
    info2, m2, o2 = checkpoint.load_vqa_checkpoint(
        {"w": jnp.zeros((2, 2))}, {"m": jnp.ones((2, 2))}, str(tmp_path))
    assert info2["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(m2["w"]), np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(o2["m"]), np.zeros((2, 2)))
