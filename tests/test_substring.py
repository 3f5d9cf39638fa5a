"""Exact substring dedup (ops/substring.py): duplicated-span detection
and all-but-one-occurrence stripping vs a brute-force python oracle.
"""

from pyspark.sql import functions as F

from ivory_spark.ops.dedup import cluster_representatives
from ivory_spark.ops.substring import (
    duplicate_spans,
    strip_duplicate_lines,
    strip_duplicate_spans,
)

P = "red orange yellow green blue"  # the duplicated 5-token passage
ROWS = [
    (1, "aa bb " + P + " cc dd"),   # first occurrence of P (pos 2..6) — kept
    (2, "ee ff gg " + P + " hh"),   # P at pos 3..7 — stripped
    (3, "ii jj kk ll mm"),          # clean
    (4, P + " " + P),               # P twice (pos 0..4, 5..9), both non-first
    (5, "nn oo"),                   # shorter than k: no windows at all
]


def _spans_oracle(rows, k, min_count, keep_first):
    """Brute-force twin: dict of window -> occurrence list, then the
    same first-kept marking and interval merge in plain python."""
    occ = {}
    for doc_id, text in rows:
        toks = [t for t in text.lower().split(" ") if t]
        for p in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[p : p + k]), []).append((doc_id, p))
    marked = {}
    for g, lst in occ.items():
        if len(lst) < min_count:
            continue
        first = min(lst)
        for o in lst:
            if keep_first and o == first:
                continue
            marked.setdefault(o[0], set()).add(o[1])
    spans = []
    for doc_id, poss in marked.items():
        cur = None
        for p in sorted(poss):
            if cur is not None and p <= cur[2] + 1:  # cur[2] = running max end
                cur = (cur[0], max(cur[1], p), max(cur[2], p + k - 1), cur[3] + 1)
            else:
                if cur:
                    spans.append((doc_id, cur[0], cur[2], cur[2] - cur[0] + 1, cur[3]))
                cur = (p, p, p + k - 1, 1)
        if cur:
            spans.append((doc_id, cur[0], cur[2], cur[2] - cur[0] + 1, cur[3]))
    return sorted(spans)


def _got_spans(spark, k=3, min_count=2, keep_first=True, partitions=None):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    if partitions:
        docs = docs.repartition(partitions)
    out = duplicate_spans(docs, k=k, min_count=min_count, keep_first=keep_first)
    return sorted(tuple(r) for r in out.collect())


def test_spans_match_bruteforce_and_merge_adjacent(spark):
    got = _got_spans(spark)
    want = _spans_oracle(ROWS, 3, 2, True)
    assert got == want
    # the interesting shapes, pinned: doc2's P exactly; doc4 merged into
    # ONE whole-doc span (adjacent duplicated copies coalesce)
    assert (2, 3, 7, 5, 3) in got
    assert (4, 0, 9, 10, 6) in got
    assert not any(r[0] in (1, 3, 5) for r in got)  # first copy + clean docs


def test_keep_first_false_marks_every_occurrence(spark):
    got = _got_spans(spark, keep_first=False)
    assert got == _spans_oracle(ROWS, 3, 2, False)
    assert (1, 2, 6, 5, 3) in got  # doc1's copy now marked too


def test_spans_stable_across_partitioning(spark):
    assert _got_spans(spark) == _got_spans(spark, partitions=7)


def test_strip_removes_all_but_first(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, k=3).collect()}
    assert out[1]["text"] == "aa bb " + P + " cc dd"   # first copy survives
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "ee ff gg hh"
    assert (out[2]["n_kept"], out[2]["n_removed"]) == (4, 5)
    assert out[3]["text"] == "ii jj kk ll mm"
    assert out[4]["text"] == "" and out[4]["n_removed"] == 10
    assert out[5]["text"] == "nn oo" and out[5]["n_removed"] == 0


def test_strip_reuses_precomputed_spans(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    spans = duplicate_spans(docs, k=3)
    a = strip_duplicate_spans(docs, spans=spans).collect()
    b = strip_duplicate_spans(docs, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


LROWS = [
    (1, "header\nunique one\nfooter"),
    (2, "header\nunique two\nfooter"),
    (3, "header\n\n  footer  \nunique three"),   # empty line + padding trimmed away
    (4, "solo line"),
]


def test_strip_duplicate_lines_keep_first(spark):
    docs = spark.createDataFrame(LROWS, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in strip_duplicate_lines(docs).collect()}
    assert out[1]["text"] == "header\nunique one\nfooter"  # first copies survive
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "unique two"
    assert (out[2]["n_kept"], out[2]["n_removed"]) == (1, 2)
    assert out[3]["text"] == "unique three"       # trimmed 'footer' matches doc 1's
    assert out[3]["n_removed"] == 2
    assert out[4]["text"] == "solo line" and out[4]["n_removed"] == 0


def test_strip_duplicate_lines_all_occurrences(spark):
    docs = spark.createDataFrame(LROWS, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"]
           for r in strip_duplicate_lines(docs, keep_first=False).collect()}
    assert out[1] == "unique one"   # doc 1's copies go too
    assert out[2] == "unique two"


def test_cluster_representatives_best_score_min_id_ties(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)], ["doc_id", "cluster_id"]
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (7, 0.1), (9, 0.1)], ["doc_id", "score"]
    )
    out = {r["cluster_id"]: (r["doc_id"], r["score"])
           for r in cluster_representatives(clusters, scores).collect()}
    assert out == {1: (2, 0.9), 7: (7, 0.1)}  # max score; tie -> smallest id


def test_strip_canonicalizes_whitespace_and_case(spark):
    docs = spark.createDataFrame([(1, "  AA   bb  ")], ["doc_id", "text"])
    r = strip_duplicate_spans(docs, k=3).collect()[0]
    assert r["text"] == "aa bb" and r["n_kept"] == 2 and r["n_removed"] == 0
