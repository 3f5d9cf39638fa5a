"""Repetition / contamination operators (ops/repetition.py).

Correctness is pinned two ways: hand-computed goldens on structured
multi-line fixtures (the gate corpus has no newlines, so the line and
paragraph paths are only exercised here and via the gate's
newline-injected variant), and a pure-Python twin over a seeded random
corpus for every column.
"""

import random

import pytest
from pyspark.sql import functions as F

from ivory_spark.ops import repetition as R


# ---------------------------------------------------------------- twins


def _py_segments(text, sep):
    return [s.strip(" ") for s in text.split(sep) if s.strip(" ") != ""]


def _py_tokens(text):
    return [t for t in text.lower().split(" ") if t != ""]


def _py_grams(toks, n):
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _py_repetition(text, ngram=3, line_sep="\n", para_sep="\n\n"):
    def dup_fracs(segs):
        nseg = len(segs)
        dseg = set(segs)
        cl = sum(len(s) for s in segs)
        cdl = sum(len(s) for s in dseg)
        return (
            nseg,
            (nseg - len(dseg)) / nseg if nseg else 0.0,
            (cl - cdl) / cl if cl else 0.0,
        )

    lines = dup_fracs(_py_segments(text, line_sep))
    paras = dup_fracs(_py_segments(text, para_sep))
    grams = _py_grams(_py_tokens(text), ngram)
    ng, ndg = len(grams), len(set(grams))
    if grams:
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        top_cnt, top_g = sorted(((-c, g) for g, c in counts.items()))[0]
        top_chars = -top_cnt * len(top_g)
    else:
        top_chars = 0
    return {
        "n_lines": lines[0],
        "dup_line_frac": lines[1],
        "dup_line_char_frac": lines[2],
        "n_paras": paras[0],
        "dup_para_frac": paras[1],
        "dup_para_char_frac": paras[2],
        "n_ngrams": ng,
        "dup_ngram_frac": (ng - ndg) / ng if ng else 0.0,
        "top_ngram_char_frac": top_chars / len(text) if len(text) else 0.0,
    }


def _random_docs(n=40, seed=7):
    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee", "longword"]
    docs = []
    for i in range(n):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(0, 30))]
        text = " ".join(toks)
        # inject line / paragraph structure into some docs
        if i % 3 == 0 and " " in text:
            text = text.replace(" bb ", "\n")
        if i % 4 == 0 and " " in text:
            text = text.replace(" cc ", "\n\n")
        docs.append((i, text))
    docs.append((n, ""))  # empty text edge
    docs.append((n + 1, "solo"))  # fewer tokens than ngram
    docs.append((n + 2, "x\n\nx\n\nx y"))  # duplicate paragraphs
    return docs


# ---------------------------------------------------------------- tests


def test_repetition_stats_goldens(spark):
    docs = spark.createDataFrame(
        [
            # 3 lines, one duplicated pair (14 chars each), third 'xx' (2)
            (1, "aa bb aa bb cc\naa bb aa bb cc\nxx"),
            (2, "p q\n\np q\n\nzz"),  # duplicate paragraphs
            (3, "aa aa aa aa"),  # heavy 2-gram repetition
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in R.repetition_stats(docs, ngram=2).collect()
    }
    r1 = rows[1]
    assert r1["n_lines"] == 3 and r1["n_paras"] == 1
    assert r1["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert r1["dup_line_char_frac"] == pytest.approx(14 / 30, abs=1e-6)
    assert r1["dup_para_frac"] == 0.0
    r2 = rows[2]
    assert r2["n_paras"] == 3 and r2["dup_para_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert r2["dup_para_char_frac"] == pytest.approx(3 / 8, abs=1e-6)
    r3 = rows[3]
    # grams: ['aa aa'] x3 -> n=3, dup=2/3, top covers 2*5=10 of 11 chars
    assert r3["n_ngrams"] == 3
    assert r3["dup_ngram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert r3["top_ngram_char_frac"] == pytest.approx(3 * 5 / 11, abs=1e-6)


def test_repetition_stats_matches_python_twin(spark):
    data = _random_docs()
    df = spark.createDataFrame(data, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in R.repetition_stats(df, ngram=3).collect()}
    assert len(got) == len(data)
    for doc_id, text in data:
        want = _py_repetition(text, ngram=3)
        have = got[doc_id]
        for k, v in want.items():
            if isinstance(v, int):
                assert have[k] == v, (doc_id, k, text)
            else:
                assert have[k] == pytest.approx(v, abs=1e-6), (doc_id, k, text)


def test_common_ngrams(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b x"), (3, "a b c"), (4, "q r s")],
        ["doc_id", "text"],
    )
    got = {
        r["gram"]: (r["n_docs"], r["n_total"])
        for r in R.common_ngrams(docs, n=2, min_docs=2).collect()
    }
    # 'a b' in docs 1 (twice), 2, 3; 'b c' in 1, 3
    assert got == {"a b": (3, 4), "b c": (2, 2)}


def test_decontaminate(spark):
    corpus = spark.createDataFrame(
        [(1, "w x y z k"), (2, "no overlap here at all"), (3, "w x y z w x y z")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, "a w x y z b")], ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in R.decontaminate(corpus, bench, n=4).collect()
    }
    # bench 4-grams: {a w x y, w x y z, x y z b}
    # doc 1 distinct 4-grams: {w x y z, x y z k} -> 1 hit of 2
    # doc 3 distinct 4-grams: {w x y z, x y z w, y z w x, z w x y} -> 1 of 4
    assert set(got) == {1, 3}
    assert got[1]["n_hits"] == 1 and got[1]["n_shingles"] == 2
    assert got[1]["contamination_frac"] == pytest.approx(0.5, abs=1e-6)
    assert got[3]["n_hits"] == 1 and got[3]["n_shingles"] == 4
    assert got[3]["contamination_frac"] == pytest.approx(0.25, abs=1e-6)


def test_repetition_plan_stays_jvm(spark):
    """The segment metrics must not introduce a Python stage, and the
    only exchange feeding the top-ngram rollup must be partial-aggregated
    (scale invariant: per-doc state only)."""
    docs = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    plan = R.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for op in ("common_ngrams",):
        plan2 = getattr(R, op)(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2
        assert "partial_count" in plan2 or "HashAggregate" in plan2
