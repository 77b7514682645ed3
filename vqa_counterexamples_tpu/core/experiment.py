"""Experiment logger: named meter groups per split, JSON serialize/restore.

Mirrors the reference ``vqa/lib/logger.py:8-82`` (``Experiment``) plus a
lightweight scalar-event channel that doubles as the TensorBoard substitute:
events are appended to ``events.jsonl`` in the run dir and can additionally be
forwarded to a real ``SummaryWriter`` when tensorboard is importable.
"""

from __future__ import annotations

import copy
import json
import os
import time
from collections import defaultdict

from .meters import AvgMeter, SumMeter, ValueMeter  # noqa: F401 (re-export)


class Experiment:
    def __init__(self, name: str, options: dict | None = None):
        self.name = name
        self.options = dict(options or {})
        self.date_and_time = time.strftime("%d-%m-%Y--%H-%M-%S")
        self.info = defaultdict(dict)
        self.logged = defaultdict(dict)
        self.meters = defaultdict(dict)

    # -- meter registry ----------------------------------------------------
    def add_meters(self, tag: str, meters_dict: dict):
        assert tag not in self.meters
        for name, meter in meters_dict.items():
            self.add_meter(tag, name, meter)

    def add_meter(self, tag: str, name: str, meter):
        assert name not in self.meters[tag], (
            "meter with tag %s and name %s already exists" % (tag, name))
        self.meters[tag][name] = meter

    def update_options(self, options_dict: dict):
        self.options.update(options_dict)

    # -- logging -----------------------------------------------------------
    def log_meter(self, tag: str, name: str, n: int = 1):
        meter = self.get_meter(tag, name)
        self.logged[tag].setdefault(name, {})[n] = meter.value()

    def log_meters(self, tag: str, n: int = 1):
        for name in self.get_meters(tag):
            self.log_meter(tag, name, n=n)

    def reset_meters(self, tag: str):
        meters = self.get_meters(tag)
        for meter in meters.values():
            meter.reset()
        return meters

    def get_meters(self, tag: str):
        assert tag in self.meters
        return self.meters[tag]

    def get_meter(self, tag: str, name: str):
        assert tag in self.meters and name in self.meters[tag]
        return self.meters[tag][name]

    # -- (de)serialization ---------------------------------------------------
    def to_json(self, filename: str):
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        var_dict = copy.copy(vars(self))
        var_dict.pop("meters")
        var_dict["info"] = dict(self.info)
        var_dict["logged"] = {k: dict(v) for k, v in self.logged.items()}
        with open(filename, "w") as f:
            json.dump(var_dict, f)

    @staticmethod
    def from_json(filename: str) -> "Experiment":
        with open(filename, "r") as f:
            var_dict = json.load(f)
        xp = Experiment("")
        xp.date_and_time = var_dict["date_and_time"]
        xp.logged = defaultdict(dict, var_dict["logged"])
        if "info" in var_dict:
            xp.info = defaultdict(dict, var_dict["info"])
        xp.options = var_dict["options"]
        xp.name = var_dict["name"]
        return xp


class ScalarWriter:
    """Scalar event sink: JSONL always; TensorBoard when available.

    Replaces the reference's ``tensorboard.SummaryWriter`` usage
    (``counterexamples.py:168-169,493-498``) without requiring the package.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, "events.jsonl"), "a")
        self._tb = None
        try:  # optional real TensorBoard
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        rec = {"tag": tag, "value": float(value), "step": int(step),
               "wall_time": time.time()}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
