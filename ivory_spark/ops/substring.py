"""Exact substring deduplication: find and strip duplicated token
passages ACROSS document boundaries (sub-document granularity — the gap
doc-level exact/near dedup leaves open).

Published method: Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022) build a corpus-wide suffix array and
remove all-but-one occurrence of every substring longer than a
threshold. A suffix array is a single-machine construction; the
Spark-first re-expression used here is k-token window fingerprinting,
which finds exactly the duplicated passages of >= k tokens (every such
passage is a run of >= 1 duplicated k-windows) with nothing but keyed
aggregations:

1. posexplode every document's overlapping k-token windows
   (token-canonical form: lowercased, single-space split);
2. one groupBy on the window hash -> (global count, first occurrence) —
   partial-aggregated map-side, so a boilerplate window repeated a
   million times still reduces to ONE row per hash;
3. join back on the hash to mark every NON-first duplicated occurrence
   (keep_first semantics of the paper: one copy survives);
4. per-document interval merge of the marked windows (running-max
   window function over pos, bounded by document length) -> spans.

Scale shape at 100 TB: the shuffle volume is one (doc_id, pos, 16-byte
md5) row per corpus token — the same order as the minhash shingle pass
in ops/dedup.py — and the only per-key state after the partial agg is
(count, min). The join back on the hash is an AQE-splittable equi-join
(no per-key sort, unlike a rank() window, which is why rank is NOT used
to pick the first occurrence). The interval merge partitions by doc_id.
md5 collisions (2^-64 at corpus scale) are the documented exactness
caveat vs the suffix array.

Reference parity note: the lintool/Ivory reference has no sub-document
dedup; this operator extends the training-data pipeline suite
(SURVEY.md pipeline addenda) beyond doc-level J8/J9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ivory_spark.ops.repetition import _grams
from ivory_spark.ops.textstats import _tokens


def duplicate_spans(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 2,
    keep_first: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns (doc_id, span_start, span_end, n_tokens, n_windows): token
    positions are 0-based inclusive over the canonical token stream
    (lowercased, single-space split); n_windows is how many duplicated
    k-windows merged into the span. A span is emitted where one or more
    k-token windows occur >= min_count times corpus-wide; with
    keep_first (default, Lee et al. semantics) the globally first
    occurrence of each window — min (doc_id, pos) — is never marked, so
    one copy of every duplicated passage survives stripping.

    Overlapping or adjacent marked windows merge into one span, so a
    duplicated passage of length L >= k yields a single span of exactly
    L tokens, not L-k+1 window rows.
    """
    occ = docs.select(
        F.col(id_col),
        F.posexplode(_grams(_tokens(F.col(text_col)), k)).alias("pos", "gram"),
    ).select(id_col, "pos", F.md5("gram").alias("h"))

    stats = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_occ"),
    )

    marked = occ.join(stats.filter(F.col("cnt") >= min_count), "h")
    if keep_first:
        marked = marked.filter(
            (F.col(id_col) != F.col("first_occ")[id_col])
            | (F.col("pos") != F.col("first_occ")["pos"])
        )
    marked = marked.select(id_col, "pos")

    # interval merge: windows [pos, pos+k-1]; a window starts a new span
    # when its pos exceeds the running max end of all earlier windows + 1
    # (strictly-after-adjacent), else it extends the current span.
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + (k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = marked.withColumn(
        "new_span",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-2)) + 1, 1).otherwise(0),
    ).withColumn("span_id", F.sum("new_span").over(w))
    return (
        flagged.groupBy(id_col, "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
            F.count(F.lit(1)).cast("int").alias("n_windows"),
        )
        .select(
            id_col,
            F.col("span_start"),
            F.col("span_end"),
            (F.col("span_end") - F.col("span_start") + 1).cast("int").alias("n_tokens"),
            "n_windows",
        )
    )


def strip_duplicate_lines(
    docs: DataFrame,
    min_count: int = 2,
    keep_first: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Line-granularity dedup (the CCNet paragraph-hash / C4 repeated-
    line removal): lines occurring >= min_count times corpus-wide are
    removed from every document except (with keep_first) the globally
    first (doc_id, line position) occurrence.

    Returns (id_col, text, n_kept, n_removed) over the CANONICAL line
    stream: lines are trimmed, empty lines dropped, and the rewritten
    text joins survivors with single newlines — the same segment prep
    as ops/repetition.repetition_stats, so "line" means the same thing
    across the suite.

    Same scale shape as duplicate_spans, minus the interval merge: one
    partial-aggregated groupBy on the line hash, an AQE-splittable join
    back, per-doc marked positions collected into one array, and a JVM
    higher-order filter doing the rewrite — no Python anywhere.
    """
    from ivory_spark.ops.repetition import _segments

    lines = _segments(F.col(text_col), "\n")
    occ = docs.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    ).select(id_col, "pos", F.md5("line").alias("h"))
    stats = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_occ"),
    )
    marked = occ.join(stats.filter(F.col("cnt") >= min_count), "h")
    if keep_first:
        marked = marked.filter(
            (F.col(id_col) != F.col("first_occ")[id_col])
            | (F.col("pos") != F.col("first_occ")["pos"])
        )
    per_doc = marked.groupBy(id_col).agg(F.collect_list("pos").alias("_dups"))
    joined = docs.join(per_doc, id_col, "left").withColumn(
        "_dups", F.coalesce(F.col("_dups"), F.array().cast("array<int>"))
    )
    kept = F.filter(lines, lambda line, i: ~F.array_contains(F.col("_dups"), i))
    return joined.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(text_col),
        F.size(kept).cast("int").alias("n_kept"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_removed"),
    )


def strip_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame | None = None,
    k: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite each document with its duplicated spans removed (the
    all-but-one-occurrence deletion of Lee et al. §3): returns
    (id_col, text, n_kept, n_removed) where `text` is the CANONICAL
    token form — lowercased, single-spaced — for every row (stripped or
    not), so downstream hashing sees one consistent normalization.

    `spans` defaults to duplicate_spans(docs, k, min_count); pass a
    precomputed frame to reuse one detection pass for both the span
    report and the strip.

    Shape: spans collapse to one array per doc (groupBy doc_id), one
    equi-join back to docs, then a JVM higher-order filter dropping
    tokens whose position falls inside any span — no Python, no second
    shuffle over the corpus tokens.
    """
    if spans is None:
        spans = duplicate_spans(docs, k=k, min_count=min_count,
                                id_col=id_col, text_col=text_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = _tokens(F.col(text_col))
    joined = docs.join(per_doc, id_col, "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array())
    )
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_spans"),
            lambda sp: (i >= sp["span_start"]) & (i <= sp["span_end"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias(text_col),
        F.size(kept).cast("int").alias("n_kept"),
        (F.size(toks) - F.size(kept)).cast("int").alias("n_removed"),
    )
