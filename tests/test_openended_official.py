"""OpenEnded evaluator vs hand-computed official-evaluator outputs.

The official VQA evaluator (the reference shells out to it via eval_res.py)
has several load-bearing quirks that decide accuracy parity; each fixture
here is computed by hand from the official vqaEval.py semantics:

* normalization fires ONLY when the 10 human answers disagree;
* ground truths receive punctuation processing only — never the
  digit-word/article/contraction pass (so pred 'two' -> '2' can MISS a
  ground truth left as 'two');
* comma-in-digits triggers whole-string punctuation removal (no spacing);
* the period-strip regex (with the official's '(?!<=\\d)' typo) removes
  periods everywhere.
"""

from vqa_counterexamples_tpu.engines.openended import (
    evaluate, normalize_answer, process_digit_article, process_punctuation)


def _ann(qid, answers):
    return {qid: {"answers": [{"answer": a} for a in answers]}}


def _overall(pred, answers, qid=1):
    return evaluate([{"question_id": qid, "answer": pred}],
                    _ann(qid, answers))["overall"]


def test_unanimous_gt_compares_raw():
    # all 10 humans agree -> raw comparison, no digit mapping of anything
    assert _overall("two", ["two"] * 10) == 100.0
    # '2' does NOT match a unanimous raw 'two'
    assert _overall("2", ["two"] * 10) == 0.0


def test_disagreeing_gt_digit_maps_pred_but_not_gt():
    # 6x 'two' + 4x '2': pred 'two' -> processDigitArticle -> '2'; ground
    # truths keep 'two' (punctuation-only). So pred matches only the 4 '2's.
    # folds: holding out a '2' -> 3 matches (acc 1) x4 folds;
    #        holding out a 'two' -> 4 matches (acc 1) x6 folds -> 100
    assert _overall("two", ["two"] * 6 + ["2"] * 4) == 100.0
    # 8x 'two' + 2x '2': pred 'two' -> '2' matches 1 or 2 others per fold
    # folds: hold a '2' -> 1 match (1/3) x2; hold a 'two' -> 2 (2/3) x8
    expected = round(100 * (2 * (1 / 3) + 8 * (2 / 3)) / 10, 2)
    assert _overall("two", ["two"] * 8 + ["2"] * 2) == expected


def test_comma_in_digits_removes_punctuation():
    assert process_punctuation("1,000") == "1000"
    # disagreement triggers processing; gt '1,000' -> '1000' matches pred
    assert _overall("1000", ["1,000"] * 9 + ["100"]) == 100.0


def test_period_strip():
    assert process_punctuation("u.s.a.") == "usa"
    assert _overall("usa", ["u.s.a."] * 9 + ["america"]) == 100.0


def test_punctuation_spacing_rule():
    # ' - ' (space-adjacent) -> removed; embedded 'x-y' -> spaced
    assert process_punctuation("black - white") == "black  white"
    assert process_punctuation("black-white") == "black white"


def test_articles_and_contractions():
    assert process_digit_article("the dont know a answer") == \
        "don't know answer"
    assert normalize_answer("The cat's don't!") == "cat's don't"
    # pred with article matches gt without, once processing fires
    assert _overall("the dog", ["dog"] * 9 + ["cat"]) == 100.0


def test_number_words_map():
    assert process_digit_article("none one ten") == "0 1 10"


def test_missing_qid_skipped():
    out = evaluate([{"question_id": 99, "answer": "x"}], _ann(1, ["x"] * 10))
    assert out["n"] == 0


def test_per_type_buckets():
    ann = _ann(1, ["yes"] * 10)
    ann[1]["question_type"] = "is the"
    ann[1]["answer_type"] = "yes/no"
    out = evaluate([{"question_id": 1, "answer": "yes"}], ann)
    assert out["perQuestionType"] == {"is the": 100.0}
    assert out["perAnswerType"] == {"yes/no": 100.0}
