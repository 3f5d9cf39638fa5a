"""Tokenizer semantics — analogue of Ivory's TokenizationTest goldens,
plus JVM-expression vs Python-reference equivalence (both must agree for
oracle parity)."""

import numpy as np
from pyspark.sql import functions as F

from ivory_spark.functions.tokenizer import (
    MAX_TF,
    doc_terms,
    doclen_py,
    term_doc_vectors,
    term_positions_py,
    tokenize_py,
)


def test_basic_tokens():
    assert tokenize_py("def foo(bar, baz42): return BAR + 7;") == [
        "def", "foo", "bar", "baz42", "return", "bar", "7",
    ]


def test_empty_and_none():
    assert tokenize_py("") == []
    assert term_positions_py("") == {}
    assert doclen_py("") == 0


def test_positions_one_based():
    tp = term_positions_py("a b a c")
    assert tp == {"a": [1, 3], "b": [2], "c": [4]}


def test_overlong_token_dropped():
    long_tok = "x" * 127
    ok_tok = "y" * 126
    toks = tokenize_py(f"{long_tok} {ok_tok} z")
    assert long_tok not in toks and ok_tok in toks and "z" in toks


def test_tf_overflow_term_dropped():
    content = "rare " + "hot " * (MAX_TF + 1)
    tp = term_positions_py(content)
    assert "hot" not in tp  # the overflowing term is dropped entirely
    assert tp["rare"] == [1]
    assert doclen_py(content) == 1  # doclen counts kept terms only


def test_jvm_path_matches_python(spark, tiny_corpus):
    pdf = tiny_corpus.head(50).reset_index(drop=True).copy()
    pdf["docno"] = np.arange(1, len(pdf) + 1)
    sdf = spark.createDataFrame(pdf[["docno", "content"]])
    got = {
        (r["docno"], r["term"]): r["tf"]
        for r in doc_terms(sdf).collect()
    }
    want = {}
    for row in pdf.itertuples(index=False):
        for t, pos in term_positions_py(row.content).items():
            want[(row.docno, t)] = len(pos)
    assert got == want


def test_tdv_udf_matches_python(spark, tiny_corpus):
    pdf = tiny_corpus.head(20).reset_index(drop=True).copy()
    pdf["docno"] = np.arange(1, len(pdf) + 1)
    sdf = spark.createDataFrame(pdf[["docno", "content"]])
    rows = term_doc_vectors(sdf).collect()
    for r in rows:
        content = pdf.loc[pdf["docno"] == r["docno"], "content"].iloc[0]
        want = term_positions_py(content)
        got = {x["term"]: list(x["positions"]) for x in r["terms"]}
        assert got == want
        assert r["doclen"] == doclen_py(content)
