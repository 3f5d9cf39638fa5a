"""Pseudo test collections from anchor text — the analogue of ivory/ptc.

Reference pipeline reproduced:
- AnchorTextInvertedIndex (ptc/AnchorTextInvertedIndex.java +
  driver/BuildAnchorTextInvertedIndex.java): anchor text -> the list of
  (target doc, sources, weight) it points at, weight defaulting to the
  in-link count (judgments/weighting/WeightingScheme; the Anchor scheme
  multiplies by an external per-target score — pass weight_col for
  that), targets sorted by weight descending;
- pseudo queries + judgments (SortedPseudoTestCollection.java:35-100):
  each anchor text is a query, its targets are graded judgments;
  judgment extractors 'whole' and ('top_n', n)
  (judgments/extractor/{Whole,TopN}JudgmentExtractor.java);
- query score = sum(weights)/count (scorer/SimplePseudoQueryScorer.java)
  and the collection is ordered by score descending;
- sampling criteria (sampling/*.java), all reproduced as window-rank
  quotas over the score-sorted stream — the reference's stateful
  decrementing counters consume the same sorted stream, so
  row_number-per-group <= quota admits exactly the same queries:
  * ('top_n', n)          — first n queries overall (TopNCriterion);
  * ('length_count', counts, min_t, max_t) — per anchor-token-length
    quota table + [min, max] bound on the judgment count
    (LengthCountCriterion);
  * ('link_count', counts) — per target-count quota table
    (LinkCountCriterion).
- XMLFormatQueries / XMLFormatJudgments drivers: queries serialize to
  the Ivory query-XML format (round-trips through
  query/batch.parse_query_xml) and judgments to graded TREC qrels
  (functions/eval.parse_graded_qrels).

Spark-first: one groupBy per aggregation level, sorts via window
functions; nothing leaves the cluster until the final (small) sampled
collection is written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anchor_text_inverted_index(
    anchors: DataFrame,
    anchor_col: str = "anchor_text",
    src_col: str = "src_docno",
    target_col: str = "target_docno",
    weight_col: str | None = None,
) -> DataFrame:
    """(anchor_text, target_docno, sources, n_sources, weight): one row
    per (anchor text, target), weight = in-link count unless weight_col
    gives per-link weights to sum (the WeightingScheme hook)."""
    # duplicate (anchor, src, target) link rows collapse: sources is a
    # set, and the default weight counts DISTINCT sources so the two
    # fields always agree (a page linking twice is one in-link);
    # weight_col sums every row (external per-link weights)
    w = (
        F.sum(F.col(weight_col)).cast("float")
        if weight_col
        else F.count_distinct(F.col(src_col)).cast("float")
    )
    return anchors.groupBy(
        F.col(anchor_col).alias("anchor_text"),
        F.col(target_col).alias("target_docno"),
    ).agg(
        F.sort_array(F.collect_set(F.col(src_col))).alias("sources"),
        F.count_distinct(F.col(src_col)).cast("int").alias("n_sources"),
        w.alias("weight"),
    )


def pseudo_test_collection(
    anchor_index: DataFrame,
    judgments: str | tuple = "whole",
    criterion: tuple | None = None,
) -> DataFrame:
    """(qid, query, score, n_targets, judgments) ordered by score desc
    (ties: query text asc), qid = 1-based rank — the
    SortedPseudoTestCollection output shape.

    judgments: 'whole' keeps every target; ('top_n', n) keeps each
    query's n heaviest (TopNJudgmentExtractor cuts the weight-sorted
    list). criterion: see module docstring.

    The qid assignment is a global score sort — the same total order the
    reference produces in its single sorted reducer; at web scale cap
    the stream first (('top_n', n) or a score threshold on
    anchor_index) so the ordered window ranks a sampled set, not every
    anchor on the web graph."""
    if judgments == "whole":
        cut = None
    elif isinstance(judgments, tuple) and judgments[0] == "top_n":
        cut = int(judgments[1])
    else:
        raise ValueError(f"unknown judgment extractor {judgments!r}")

    per_target = anchor_index.withColumn(
        "trank",
        F.row_number().over(
            Window.partitionBy("anchor_text").orderBy(
                F.desc("weight"), F.asc("target_docno")
            )
        ),
    )
    if cut is not None:
        per_target = per_target.filter(F.col("trank") <= cut)

    q = per_target.groupBy("anchor_text").agg(
        F.sort_array(
            F.collect_list(F.struct("trank", "target_docno", "weight"))
        ).alias("tj"),
        (F.sum("weight") / F.count(F.lit(1))).cast("float").alias("score"),
        F.count(F.lit(1)).cast("int").alias("n_targets"),
    )
    q = q.select(
        F.col("anchor_text").alias("query"),
        "score",
        "n_targets",
        F.expr(
            "transform(tj, t -> struct(t.target_docno AS docno, t.weight AS weight))"
        ).alias("judgments"),
    )
    order = Window.orderBy(F.desc("score"), F.asc("query"))
    q = q.withColumn("qid", F.row_number().over(order))

    if criterion is not None:
        kind = criterion[0]
        if kind == "top_n":
            q = q.filter(F.col("qid") <= int(criterion[1]))
        elif kind == "length_count":
            counts, min_t, max_t = criterion[1], int(criterion[2]), int(criterion[3])
            q = q.filter(
                (F.col("n_targets") >= min_t) & (F.col("n_targets") <= max_t)
            )
            q = q.withColumn(
                "_len", F.size(F.split(F.col("query"), r"\s+"))
            ).withColumn(
                "_lrank",
                F.row_number().over(
                    Window.partitionBy("_len").orderBy(F.asc("qid"))
                ),
            )
            quota = F.create_map(
                *[F.lit(x) for kv in counts.items() for x in kv]
            )
            q = q.filter(
                F.col("_lrank") <= F.coalesce(quota[F.col("_len")], F.lit(0))
            ).drop("_len", "_lrank")
        elif kind == "link_count":
            counts = criterion[1]
            q = q.withColumn(
                "_crank",
                F.row_number().over(
                    Window.partitionBy("n_targets").orderBy(F.asc("qid"))
                ),
            )
            quota = F.create_map(
                *[F.lit(x) for kv in counts.items() for x in kv]
            )
            q = q.filter(
                F.col("_crank") <= F.coalesce(quota[F.col("n_targets")], F.lit(0))
            ).drop("_crank")
        else:
            raise ValueError(f"unknown sampling criterion {kind!r}")

    return q.select("qid", "query", "score", "n_targets", "judgments").orderBy("qid")


def write_queries_xml(collection: DataFrame, path: str) -> int:
    """Ivory query-XML (XMLFormatQueries.java shape) — round-trips
    through query/batch.parse_query_xml. Returns query count."""
    from xml.sax.saxutils import escape

    rows = collection.select("qid", "query").orderBy("qid").collect()
    with open(path, "w") as f:
        f.write("<parameters>\n")
        for r in rows:
            f.write(f'  <query id="{r["qid"]}">{escape(r["query"])}</query>\n')
        f.write("</parameters>\n")
    return len(rows)


def write_judgments_qrels(collection: DataFrame, path: str) -> int:
    """Graded TREC qrels 'qid 0 docno weight' (XMLFormatJudgments.java
    content in the qrels carrier both eval layers parse). Returns line
    count."""
    rows = collection.select("qid", "judgments").orderBy("qid").collect()
    n = 0
    with open(path, "w") as f:
        for r in rows:
            for j in r["judgments"]:
                f.write(f"{r['qid']} 0 {j['docno']} {j['weight']}\n")
                n += 1
    return n
