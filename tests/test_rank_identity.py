"""End-to-end rank identity: Spark engine (exact path AND block-max WAND
kernel) vs the numpy oracle — the analogue of Ivory's golden-output
regression suite (Robust04_Basic.java:363-379), strengthened from 1e-6
tolerance to exact float32 bit equality, across build-path variants
(FIXTURES.md §5: partitions × salting × scorer)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ivory_spark.corpus import QUERY_SET
from ivory_spark.index.build import IndexConfig, build_index
from ivory_spark.index.reader import open_index
from ivory_spark.oracle import build_oracle_index, oracle_topk
from ivory_spark.query.exact import bm25_topk
from ivory_spark.query.wand import bm25_topk_wand

K = 10


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    oi = build_oracle_index(tiny_corpus.drop(columns=["sha256"]))
    return oi, oracle_topk(oi, QUERY_SET, k=K)


@pytest.fixture(scope="module")
def idx_default(spark, tiny_corpus_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx") / "default")
    props = build_index(spark, tiny_corpus_path, root, IndexConfig())
    return open_index(spark, root), props


@pytest.fixture(scope="module")
def idx_salted(spark, tiny_corpus_path, tmp_path_factory):
    # salt_threshold=8 forces the skew path for every common keyword
    root = str(tmp_path_factory.mktemp("idx") / "salted")
    build_index(spark, tiny_corpus_path, root, IndexConfig(salt_threshold=8, n_shards=7))
    return open_index(spark, root)


def assert_matches_oracle(result_df, golden):
    got = {}
    for r in result_df.collect():
        got.setdefault(r["qid"], []).append(r)
    for qid, want in golden.items():
        have = got.get(qid, [])
        assert [h["docno"] for h in have] == [w["docno"] for w in want], qid
        assert [h["docid"] for h in have] == [w["docid"] for w in want], qid
        have_bits = np.array([h["score"] for h in have], dtype=np.float32).view(np.uint32)
        want_bits = np.array([w["score"] for w in want], dtype=np.float32).view(np.uint32)
        assert np.array_equal(have_bits, want_bits), qid


def test_stats_match_oracle(oracle, idx_default):
    oi, _ = oracle
    index, props = idx_default
    assert props["n_docs"] == oi.n_docs
    assert props["collection_length"] == oi.collection_length
    assert props["n_terms"] == len(oi.dictionary)
    got = {
        r["term"]: (r["termid"], r["df"], r["cf"]) for r in index.dictionary.collect()
    }
    assert got == oi.dictionary
    got_dl = {r["docno"]: r["doclen"] for r in index.doclens.collect()}
    assert got_dl == oi.doclens


def test_dedup_applied(oracle, idx_default, tiny_corpus):
    oi, _ = oracle
    index, props = idx_default
    assert props["n_docs"] < len(tiny_corpus)  # corpus has planted duplicates
    assert props["n_docs"] == tiny_corpus["sha256"].nunique()


def test_exact_path_rank_identity(spark, oracle, idx_default):
    _, golden = oracle
    index, _ = idx_default
    assert_matches_oracle(bm25_topk(spark, index, QUERY_SET, k=K), golden)


def test_wand_rank_identity(spark, oracle, idx_default):
    _, golden = oracle
    index, _ = idx_default
    assert_matches_oracle(bm25_topk_wand(spark, index, QUERY_SET, k=K), golden)


def test_salted_rank_identity_both_paths(spark, oracle, idx_salted):
    _, golden = oracle
    assert_matches_oracle(bm25_topk_wand(spark, idx_salted, QUERY_SET, k=K), golden)
    assert_matches_oracle(bm25_topk(spark, idx_salted, QUERY_SET, k=K), golden)
    # the skew path actually triggered: some term has >1 run
    multi = idx_salted.postings.groupBy("termid").count().filter(F.col("count") > 1).count()
    assert multi > 0


def test_single_partition_build_identical(spark, tiny_corpus_path, tmp_path, oracle):
    _, golden = oracle
    root = str(tmp_path / "p1")
    build_index(spark, tiny_corpus_path, root, IndexConfig(partitions=1))
    index = open_index(spark, root)
    assert_matches_oracle(bm25_topk_wand(spark, index, QUERY_SET, k=K), golden)


def test_oov_query_empty(spark, idx_default):
    index, _ = idx_default
    res = bm25_topk(spark, index, [{"qid": "x", "query": "nonexistent_token_xyzzy"}], k=5)
    assert res.count() == 0
