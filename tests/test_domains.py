"""URL/domain curation ops (ops/domains.py) vs python hash twins."""

import hashlib

from ivory_spark.ops.domains import (
    cap_per_domain,
    cap_per_domain_approx,
    domain_stats,
    extract_domain,
    filter_blocklist,
)

ROWS = [
    (1, "https://aaa.example.com/p/1?q=2", "t1"),
    (2, "https://aaa.example.com:8080/p/2", "t2"),   # port stripped
    (3, "http://BBB.Example.com/x", "t3"),           # host lowercased
    (4, "ftp://ccc.example.org/f", "t4"),
    (5, "no-scheme.example/path", "t5"),             # no scheme -> ''
    (6, "https://aaa.example.com/p/6", "t6"),
    (7, "https://aaa.example.com/p/7", "t7"),
]
COLS = ["doc_id", "url", "text"]


def _u60(salt: str, key) -> float:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16) / float(
        1 << 60
    )


def test_extract_domain(spark):
    docs = spark.createDataFrame(ROWS, COLS)
    got = {r["doc_id"]: r["domain"] for r in extract_domain(docs).collect()}
    assert got == {
        1: "aaa.example.com", 2: "aaa.example.com", 3: "bbb.example.com",
        4: "ccc.example.org", 5: "", 6: "aaa.example.com", 7: "aaa.example.com",
    }


def test_domain_stats(spark):
    docs = spark.createDataFrame(ROWS, COLS)
    got = {r["domain"]: (r["n_docs"], r["n_chars"]) for r in domain_stats(docs).collect()}
    assert got["aaa.example.com"] == (4, 8)
    assert got["bbb.example.com"] == (1, 2)
    assert got[""] == (1, 2)


def test_filter_blocklist(spark):
    docs = spark.createDataFrame(ROWS, COLS)
    blocked = spark.createDataFrame([("BBB.example.com",)], ["domain"])
    kept = {r["doc_id"] for r in filter_blocklist(docs, blocked).collect()}
    assert kept == {1, 2, 4, 5, 6, 7}
    assert filter_blocklist(docs, blocked).columns == COLS  # domain col dropped


def test_cap_per_domain_exact_matches_hash_twin(spark):
    docs = spark.createDataFrame(ROWS, COLS)
    kept = {r["doc_id"] for r in cap_per_domain(docs, 2).collect()}
    aaa = [1, 2, 6, 7]
    want_aaa = set(sorted(aaa, key=lambda i: (_u60("domain-cap", i), i))[:2])
    assert kept == want_aaa | {3, 4, 5}  # under-cap domains keep everything
    # deterministic across partitioning
    kept7 = {r["doc_id"] for r in cap_per_domain(docs.repartition(7), 2).collect()}
    assert kept7 == kept


def test_cap_per_domain_approx_matches_hash_twin(spark):
    docs = spark.createDataFrame(ROWS, COLS)
    kept = {r["doc_id"] for r in cap_per_domain_approx(docs, 2).collect()}
    want_aaa = {i for i in [1, 2, 6, 7] if _u60("domain-cap", i) < 0.5}
    assert kept == want_aaa | {3, 4, 5}
