"""Model factories.

``factory_vqa`` mirrors reference ``vqa/models/utils.py:14-30`` (name ->
{MLBNoAtt, MutanNoAtt, MLBAtt, MutanAtt}); the attention-dim tying done by the
reference constructors (att.py:170-172, 199-200; noatt.py:52) happens here so
the option trees read identically to the reference YAMLs.

``factory_cx`` mirrors the dispatch in reference ``counterexamples.py:216-273``.

Device placement/parallelism is NOT done here: the reference wraps models in
``nn.DataParallel().cuda()``; in this framework the engines shard the batch
over the mesh with pjit (see parallel/).
"""

from __future__ import annotations

import copy
from typing import Sequence

import flax.linen as nn
from flax.core import FrozenDict

from . import att as att_mod
from . import cx as cx_mod
from . import noatt as noatt_mod

model_names = ["MLBNoAtt", "MutanNoAtt", "MLBAtt", "MutanAtt"]

cx_model_names = ["RandomBaseline", "DistanceBaseline", "BlackBox",
                  "LinearContext", "SemanticBaseline", "NeuralModel",
                  "PairwiseModel", "PairwiseLinearModel", "ContrastiveModel",
                  "SimilarityModel"]


def factory_vqa(opt: dict, vocab_words: Sequence[str],
                vocab_answers: Sequence[str]) -> nn.Module:
    opt = copy.deepcopy(opt)
    arch = opt["arch"]
    vocab_words = tuple(vocab_words)
    vocab_answers = tuple(vocab_answers)

    if arch == "MLBNoAtt":
        return noatt_mod.MLBNoAtt(opt=opt, vocab_words=vocab_words,
                                  vocab_answers=vocab_answers)
    if arch == "MutanNoAtt":
        opt["fusion"]["dim_h"] = opt["fusion"]["dim_mm"]  # noatt.py:52
        return noatt_mod.MutanNoAtt(opt=opt, vocab_words=vocab_words,
                                    vocab_answers=vocab_answers)
    if arch == "MLBAtt":
        opt["attention"]["dim_v"] = opt["attention"]["dim_h"]   # att.py:170
        opt["attention"]["dim_q"] = opt["attention"]["dim_h"]
        opt["attention"]["dim_mm"] = opt["attention"]["dim_h"]
        return att_mod.MLBAtt(opt=opt, vocab_words=vocab_words,
                              vocab_answers=vocab_answers)
    if arch == "MutanAtt":
        opt["attention"]["dim_v"] = opt["attention"]["dim_hv"]  # att.py:199
        opt["attention"]["dim_q"] = opt["attention"]["dim_hq"]
        return att_mod.MutanAtt(opt=opt, vocab_words=vocab_words,
                                vocab_answers=vocab_answers)
    raise ValueError("unknown VQA model arch %r" % arch)


def factory_cx(cx_name: str, vqa_model: nn.Module | None, *,
               knn_size: int = 24, trainable_vqa: bool = False,
               model_spec: dict | None = None, sb_lambda: float = 0.5
               ) -> nn.Module:
    if cx_name == "RandomBaseline":
        return cx_mod.RandomBaseline(knn_size=knn_size)
    if cx_name == "DistanceBaseline":
        return cx_mod.DistanceBaseline(knn_size=knn_size)

    assert vqa_model is not None, "%s needs a VQA backbone" % cx_name
    common = dict(vqa_model=vqa_model, knn_size=knn_size,
                  trainable_vqa=trainable_vqa)
    if cx_name == "BlackBox":
        return cx_mod.BlackBox(**common)
    if cx_name == "LinearContext":
        return cx_mod.LinearContext(**common)
    if cx_name == "SemanticBaseline":
        return cx_mod.SemanticBaseline(lam=sb_lambda, **common)
    if cx_name == "NeuralModel":
        spec = dict(model_spec or {})
        return cx_mod.NeuralModel(
            model_spec=FrozenDict(spec),
            dim_h=spec.get("dim_h", 300),
            n_layers=spec.get("n_layers", 2),
            drop_p=spec.get("drop_p", 0.25),
            # 2400 = the reference's hardcoded nn.Embedding(2000, 2400)
            # (cx.py:240-243) — the skip-thoughts encoder dim; configurable
            # so pretrained_emb chains through non-flagship encoders too
            dim_a=spec.get("dim_a", 2400),
            **common)
    if cx_name == "PairwiseModel":
        return cx_mod.PairwiseModel(**common)
    if cx_name == "PairwiseLinearModel":
        return cx_mod.PairwiseLinearModel(**common)
    if cx_name == "ContrastiveModel":
        return cx_mod.ContrastiveModel(**common)
    if cx_name == "SimilarityModel":
        return cx_mod.SimilarityModel(**common)
    raise ValueError("Unrecognized cx_model %s" % cx_name)
