"""End-to-end build + retrieval under the galago_en tokenizer (stoplist +
Porter stemming): the full engine pipeline must stay float32
rank-identical to the numpy oracle when the analysis chain changes —
tokenization is a build-time/query-time shared contract
(RetrievalEnvironment.java:136-152: query tokenizer == index tokenizer)."""

import pytest

from ivory_spark.corpus import QUERY_SET
from ivory_spark.index.build import IndexConfig, build_index
from ivory_spark.index.reader import open_index
from ivory_spark.oracle import build_oracle_index, oracle_topk
from ivory_spark.query.exact import bm25_topk
from ivory_spark.query.wand import bm25_topk_wand

from test_rank_identity import assert_matches_oracle

K = 10

# natural-language queries exercising stopword removal + stemming
NL_QUERIES = [
    {"qid": "n1", "query": "the returning values"},
    {"qid": "n2", "query": "imported classes and functions"},
    {"qid": "n3", "query": "a sorted merging of keys"},
]


@pytest.fixture(scope="module")
def galago_index(spark, tiny_corpus_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_galago") / "galago")
    props = build_index(
        spark, tiny_corpus_path, root, IndexConfig(tokenizer="galago_en")
    )
    assert props["tokenizer"] == "galago_en"
    return open_index(spark, root)


@pytest.fixture(scope="module")
def galago_oracle(tiny_corpus):
    return build_oracle_index(
        tiny_corpus.drop(columns=["sha256"]), tokenizer="galago_en"
    )


def test_galago_stats_match(galago_index, galago_oracle):
    oi = galago_oracle
    assert galago_index.properties["n_docs"] == oi.n_docs
    assert galago_index.properties["collection_length"] == oi.collection_length
    got = {
        r["term"]: (r["termid"], r["df"], r["cf"])
        for r in galago_index.dictionary.collect()
    }
    assert got == oi.dictionary
    # stopwords never reach the dictionary
    assert "the" not in got and "and" not in got


def test_galago_exact_rank_identity(spark, galago_index, galago_oracle):
    golden = oracle_topk(galago_oracle, NL_QUERIES + QUERY_SET[:3], k=K)
    got = bm25_topk(spark, galago_index, NL_QUERIES + QUERY_SET[:3], k=K)
    assert_matches_oracle(got, golden)


def test_galago_wand_rank_identity(spark, galago_index, galago_oracle):
    golden = oracle_topk(galago_oracle, NL_QUERIES, k=K)
    got = bm25_topk_wand(spark, galago_index, NL_QUERIES, k=K)
    assert_matches_oracle(got, golden)


def test_galago_query_stemming_unifies_forms(spark, galago_index):
    """'returning' and 'returned' stem to the same term -> identical
    result sets (the user-visible point of the analysis chain)."""
    a = bm25_topk(spark, galago_index, [{"qid": "x", "query": "returning"}], k=5).collect()
    b = bm25_topk(spark, galago_index, [{"qid": "x", "query": "returned"}], k=5).collect()
    assert [(r["docno"], r["score"]) for r in a] == [(r["docno"], r["score"]) for r in b]
