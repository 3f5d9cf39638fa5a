"""Evaluation layer (core/eval analogue) + end-to-end golden effectiveness:
synthetic qrels derived from the oracle, engine run evaluated against
them — the regression shape of Robust04_Basic.java."""

import pytest

from ivory_spark.corpus import QUERY_SET
from ivory_spark.functions.eval import (
    average_precision,
    evaluate_run,
    parse_qrels,
    precision_at,
    run_from_dataframe,
)
from ivory_spark.index.build import IndexConfig, build_index
from ivory_spark.index.reader import open_index
from ivory_spark.oracle import build_oracle_index, oracle_topk
from ivory_spark.query.wand import bm25_topk_wand


def test_ap_hand_computed():
    # relevant at ranks 1 and 3 of 2 total relevant: (1/1 + 2/3)/2
    assert average_precision(["a", "b", "c"], {"a", "c"}) == pytest.approx(5 / 6)
    assert average_precision(["b"], {"a", "c"}) == 0.0
    assert average_precision([], {"a"}) == 0.0


def test_p_at_n():
    assert precision_at(2, ["a", "b", "c"], {"a", "c"}) == 0.5
    assert precision_at(3, ["a", "b", "c"], {"a", "c"}) == pytest.approx(2 / 3)
    assert precision_at(5, ["a", "b", "c"], {"a", "c"}) == pytest.approx(2 / 5)


def test_parse_qrels():
    lines = ["q1 0 d1 1", "q1 0 d2 0", "q2 0 d3 2"]
    q = parse_qrels(lines)
    assert q == {"q1": {"d1"}, "q2": {"d3"}}


def test_end_to_end_effectiveness(spark, tiny_corpus_path, tiny_corpus, tmp_path):
    root = str(tmp_path / "eval_idx")
    build_index(spark, tiny_corpus_path, root, IndexConfig())
    index = open_index(spark, root)

    # qrels: oracle top-3 per query marked relevant (synthetic judgments)
    oi = build_oracle_index(tiny_corpus.drop(columns=["sha256"]))
    golden = oracle_topk(oi, QUERY_SET[:6], k=3)
    qrels = {qid: {r["docid"] for r in rows} for qid, rows in golden.items() if rows}

    res = bm25_topk_wand(spark, index, QUERY_SET[:6], k=10)
    run = run_from_dataframe(res)
    metrics = evaluate_run(run, qrels, p_at=10)
    # the engine is rank-identical to the oracle, so every relevant doc is
    # retrieved in the top positions: AP == 1.0 per judged query
    assert metrics["num_queries"] == len(qrels)
    for qid, m in metrics["per_query"].items():
        assert m["ap"] == pytest.approx(1.0), qid
    assert metrics["map"] == pytest.approx(1.0)


def test_parse_graded_qrels_keeps_zero_grades():
    from ivory_spark.functions.eval import parse_graded_qrels

    lines = ["q1 0 dA 2", "q1 0 dB 0", "q1 0 dC 3", "q2 0 dA 1"]
    g = parse_graded_qrels(lines)
    assert g["q1"] == {"dA": 2.0, "dB": 0.0, "dC": 3.0}
    assert g["q2"] == {"dA": 1.0}


def test_ndcg_golden():
    """Hand-computed: ranked [dC(3), dB(0), dA(2)], ideal [3, 2, 0] —
    gain (2^g - 1)/ln(rank + 2), natural log (ltr/NDCGMeasure.java)."""
    import math

    from ivory_spark.functions.eval import ndcg

    grades = {"dA": 2.0, "dB": 0.0, "dC": 3.0}
    dcg = 7 / math.log(2) + 0.0 + 3 / math.log(4)
    idcg = 7 / math.log(2) + 3 / math.log(3) + 0.0
    assert ndcg(["dC", "dB", "dA"], grades) == pytest.approx(dcg / idcg)
    # perfect ordering -> 1.0; unjudged docs gain 0 but shift ranks
    assert ndcg(["dC", "dA", "dB"], grades) == pytest.approx(1.0)
    assert ndcg(["dC", "unjudged", "dA"], grades) < 1.0
    assert ndcg(["dA"], {}) == 0.0  # no judged docs -> 0


def test_err_golden():
    from ivory_spark.functions.eval import err

    grades = {"dA": 3.0, "dB": 1.0}
    # g = (2^grade - 1)/16: dA 7/16, dB 1/16
    want = (7 / 16) * 1.0 / 1 + (1 / 16) * (1 - 7 / 16) / 2
    assert err(["dA", "dB"], grades) == pytest.approx(want)
    assert err(["dB", "dA"], grades) < err(["dA", "dB"], grades)
    assert err([], grades) == 0.0


def test_evaluate_run_graded_wiring():
    run = {"q1": ["dC", "dA", "dB"], "q2": ["dX"]}
    qrels = {"q1": {"dA", "dC"}, "q2": {"dY"}}
    graded = {"q1": {"dA": 2.0, "dB": 0.0, "dC": 3.0}, "q2": {"dY": 1.0}}
    m = evaluate_run(run, qrels, graded_qrels=graded)
    assert m["per_query"]["q1"]["ndcg"] == pytest.approx(1.0)
    assert m["per_query"]["q2"]["ndcg"] == 0.0  # relevant doc not retrieved
    assert "mean_ndcg" in m and "mean_err" in m
    assert m["mean_ndcg"] == pytest.approx((1.0 + 0.0) / 2)
    # ungraded call keeps the old shape
    m2 = evaluate_run(run, qrels)
    assert "mean_ndcg" not in m2 and "ndcg" not in m2["per_query"]["q1"]
