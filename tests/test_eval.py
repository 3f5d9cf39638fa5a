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
