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


# ---------------------------------------------------------------------------
# trec_eval-parity cross-check on a reference-shipped judgment file
# (the sandbox analogue of Ivory's external trec_eval validation,
# docs/exp-trec45.html / RankedListEvaluator.java:100-130)
# ---------------------------------------------------------------------------

import math
import os

import pytest

_GENOMICS_QRELS = "/root/reference/data/medline/qrels.genomics05.txt"

needs_reference = pytest.mark.skipif(
    not os.path.exists(_GENOMICS_QRELS),
    reason="reference data not present (standalone checkout)",
)


@needs_reference
def test_reference_qrels_parse_facts():
    """Pin what the parsers read out of the REAL reference-shipped file:
    judgment counts per topic and the graded histogram (hand-counted
    from the file)."""
    from ivory_spark.functions.eval import parse_graded_qrels, parse_qrels

    rel = parse_qrels(_GENOMICS_QRELS)
    assert len(rel["100"]) == 74
    assert len(rel["101"]) == 20
    graded = parse_graded_qrels(_GENOMICS_QRELS)
    hist = {}
    for g in graded["100"].values():
        hist[g] = hist.get(g, 0) + 1
    assert hist == {0.0: 630, 1.0: 52, 2.0: 22}
    # binary view = positive grades only
    assert rel["100"] == {d for d, g in graded["100"].items() if g > 0}


@needs_reference
def test_reference_qrels_ap_p10_map():
    """AP / P@10 / MAP over a deterministic synthetic run built from the
    reference judgments: hit pattern at ranks 1,3,5,8,9 with one
    unjudged doc interleaved. Expected values are written straight from
    the published definitions (sum of precision@hit / R; R = ALL
    relevant, not retrieved-relevant — the trec_eval convention)."""
    from ivory_spark.functions.eval import evaluate_run, parse_qrels

    qrels = parse_qrels(_GENOMICS_QRELS)
    with open(_GENOMICS_QRELS) as f:
        lines = f.read().splitlines()
    by_topic_rel = {"100": [], "101": []}
    by_topic_non = {"100": [], "101": []}
    for ln in lines:
        q, _, d, g = ln.split()
        if q in by_topic_rel:
            (by_topic_rel if int(g) > 0 else by_topic_non)[q].append(d)
    r0, r1 = by_topic_rel["100"][:5], by_topic_non["100"][:4]
    run = {
        "100": [r0[0], r1[0], r0[1], r1[1], r0[2], "UNJUDGED_X",
                r1[2], r0[3], r0[4], r1[3]],
        "101": [by_topic_non["101"][0]] + by_topic_rel["101"][:2],
        "999_no_judgments": ["a", "b"],  # skipped, as trec_eval does
    }
    m = evaluate_run(run, qrels, p_at=10)
    ap100 = (1 / 1 + 2 / 3 + 3 / 5 + 4 / 8 + 5 / 9) / 74
    ap101 = (1 / 2 + 2 / 3) / 20
    assert m["per_query"]["100"]["ap"] == pytest.approx(ap100, abs=1e-12)
    assert m["per_query"]["100"]["p10"] == pytest.approx(0.5, abs=1e-12)
    assert m["per_query"]["101"]["ap"] == pytest.approx(ap101, abs=1e-12)
    assert m["per_query"]["101"]["p10"] == pytest.approx(0.2, abs=1e-12)
    assert m["num_queries"] == 2
    assert m["map"] == pytest.approx((ap100 + ap101) / 2, abs=1e-12)


@needs_reference
def test_reference_qrels_graded_measures():
    """NDCG / ERR over the same reference judgments: a 3-doc run whose
    expected values are explicit arithmetic from the reference formulas
    (gain (2^g - 1), NATURAL-log discount ln(rank+1+1); ERR gain /16,
    ltr/NDCGMeasure.java:88-105, ltr/ERRMeasure.java:66-81)."""
    from ivory_spark.functions.eval import err, ndcg, parse_graded_qrels

    graded = parse_graded_qrels(_GENOMICS_QRELS)["100"]
    g2 = next(d for d in graded if graded[d] == 2)   # first grade-2 doc
    g1 = next(d for d in graded if graded[d] == 1)
    g0 = next(d for d in graded if graded[d] == 0)
    ranked = [g2, g0, g1]
    dcg = 3 / math.log(2) + 0.0 + 1 / math.log(4)
    ideal = sorted(graded.values(), reverse=True)
    idcg = sum((2.0 ** g - 1.0) / math.log(i + 2.0) for i, g in enumerate(ideal))
    assert ndcg(ranked, graded) == pytest.approx(dcg / idcg, abs=1e-12)
    # ERR: 3/16 at rank 1, then p = 13/16; grade-1 at rank 3 adds
    # (1/16)*(13/16)/3 — exact fractions
    assert err(ranked, graded) == pytest.approx(
        3 / 16 + (1 / 16) * (13 / 16) / 3, abs=1e-12
    )
