"""Demo-server question encoding (tokenize -> wids, pad side, UNK)."""

import numpy as np

from vqa_counterexamples_tpu.serve.demo_server import DemoEngine


def _engine(pad):
    eng = DemoEngine.__new__(DemoEngine)  # skip jit setup; test encoding only
    eng.word_to_wid = {"what": 1, "color": 2, "is": 3, "the": 4, "cat": 5,
                       "UNK": 6}
    eng.maxlength = 8
    eng.pad = pad
    from vqa_counterexamples_tpu.data.tokenizers import tokenize_mcb
    eng.tokenize = tokenize_mcb
    return eng


def test_encode_right_pad_and_unk():
    wids = _engine("right").encode_question("What color is the zebra?")
    np.testing.assert_array_equal(wids, [1, 2, 3, 4, 6, 0, 0, 0])


def test_encode_left_pad():
    wids = _engine("left").encode_question("the cat")
    np.testing.assert_array_equal(wids, [0, 0, 0, 0, 0, 0, 4, 5])


def test_encode_clips_to_maxlength():
    eng = _engine("right")
    wids = eng.encode_question("what " * 20)
    assert wids.shape == (8,)
    assert (wids == 1).all()
