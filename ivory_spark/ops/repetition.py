"""Repetition / contamination operators for training-data pipelines.

The reference engine stops at retrieval; a modern pretraining pipeline
additionally filters documents by *internal repetition* (Gopher §A1.1,
Rae et al. 2021, arXiv:2112.11446) and removes *benchmark contamination*
(GPT-3 §C, Brown et al. 2020: n-gram overlap against evaluation sets).
These operators provide both, Spark-first:

- repetition_stats — per-document duplicate-line / duplicate-paragraph /
  duplicate-n-gram fractions and the top-n-gram character fraction.
  Everything except the top-n-gram mode is a pure per-row JVM array
  expression (whole-stage codegen, zero shuffle); the top-n-gram mode is
  one (doc_id, gram) partial-aggregated groupBy — both shapes hold at
  100 TB because no state ever exceeds one document's gram set.
- common_ngrams — cross-document boilerplate n-grams (appear in >=
  min_docs distinct documents), the inventory you subtract before
  training (license headers, navigation chrome). Two-level aggregation
  (per-doc distinct, then per-gram counts) so hot grams partial-combine.
- decontaminate — the n-gram-overlap kill list: corpus documents sharing
  at least one n-gram shingle with a benchmark set. Benchmark shingles
  are distinct before the join, so the join output is bounded by the
  corpus shingle count — no pair explosion on hot shingles.

Deviation from Gopher, documented: our dup_ngram_frac counts duplicate
n-gram *occurrences* (occurrences beyond each gram's first), not
Gopher's non-overlapping duplicated-character coverage — the occurrence
form is exactly reproducible in ANSI SQL for the DuckDB oracle, the
coverage form is not. top_ngram_char_frac keeps the Gopher/datatrove
convention: count * len(gram) / len(text), overlapping occurrences all
counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ivory_spark.ops.textstats import _tokens


def _segments(col, sep: str):
    """Split on `sep`, trim spaces, drop empties (Gopher line/para prep)."""
    return F.filter(
        F.transform(F.split(col, sep), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def _char_sum(arr):
    return F.aggregate(arr, F.lit(0), lambda acc, x: acc + F.length(x))


def _frac(num, den):
    """num/den as double rounded to 6, 0.0 when den = 0 (gate-stable)."""
    return F.round(
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0)), 6
    )


def _grams(toks, n: int):
    """Overlapping word n-grams joined by single spaces; [] if < n tokens."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    line_sep: str = "\n",
    para_sep: str = "\n\n",
) -> DataFrame:
    """Per-document repetition profile (Gopher §A1.1 repetition filters).

    Returns (doc_id, n_lines, dup_line_frac, dup_line_char_frac, n_paras,
    dup_para_frac, dup_para_char_frac, n_ngrams, dup_ngram_frac,
    top_ngram_char_frac):

    - dup_*_frac        — fraction of line/paragraph occurrences that are
                          duplicates of an earlier identical segment
                          (occurrences beyond each segment's first).
    - dup_*_char_frac   — same, weighted by segment character length.
    - dup_ngram_frac    — duplicate word-n-gram occurrence fraction.
    - top_ngram_char_frac — chars covered by the most frequent n-gram:
                          count * len(gram) / len(text); ties broken by
                          gram ascending (deterministic).

    Scale shape: segment metrics are per-row array expressions (no
    shuffle); the top-n-gram mode adds one partial-aggregated
    (doc_id, gram) groupBy + a min(struct) rollup per doc — state is
    bounded by a single document's distinct grams, so the plan is
    unchanged at 10^12 documents.
    """
    text = F.col(text_col)
    lines = _segments(text, line_sep)
    paras = _segments(text, para_sep)
    toks = _tokens(text)
    grams = _grams(toks, ngram)

    # Scalar segment metrics: one per-row projection, no gram arrays —
    # the rows that reach the final doc_id join stay a few ints wide.
    scalars = docs.select(
        F.col(id_col),
        text.alias("_text"),
        lines.alias("_lines"),
        paras.alias("_paras"),
    ).select(
        F.col(id_col),
        F.length("_text").alias("_n_chars"),
        F.size("_lines").alias("n_lines"),
        F.size(F.array_distinct("_lines")).alias("_ndl"),
        _char_sum(F.col("_lines")).alias("_cl"),
        _char_sum(F.array_distinct("_lines")).alias("_cdl"),
        F.size("_paras").alias("n_paras"),
        F.size(F.array_distinct("_paras")).alias("_ndp"),
        _char_sum(F.col("_paras")).alias("_cp"),
        _char_sum(F.array_distinct("_paras")).alias("_cdp"),
    )

    # All n-gram metrics come from one (doc, gram) aggregation: total
    # occurrences = sum(cnt), distinct grams = count(*), and the top
    # gram via min(struct(-cnt, gram)) — (highest count, then
    # lexicographically smallest). The exploded gram rows are aggregated
    # away before the join, so the heavy strings never shuffle twice.
    gram_rows = docs.select(F.col(id_col), F.explode(grams).alias("gram"))
    counts = gram_rows.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    gstats = counts.groupBy(id_col).agg(
        F.sum("cnt").cast("int").alias("_ng"),
        F.count(F.lit(1)).cast("int").alias("_ndg"),
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("gram"))).alias("t"),
    ).select(
        F.col(id_col),
        F.col("_ng"),
        F.col("_ndg"),
        ((-F.col("t.neg")) * F.length("t.gram")).alias("_top_chars"),
    )

    out = scalars.join(gstats, id_col, "left").select(
        F.col(id_col),
        F.col("n_lines"),
        _frac(F.col("n_lines") - F.col("_ndl"), F.col("n_lines")).alias("dup_line_frac"),
        _frac(F.col("_cl") - F.col("_cdl"), F.col("_cl")).alias("dup_line_char_frac"),
        F.col("n_paras"),
        _frac(F.col("n_paras") - F.col("_ndp"), F.col("n_paras")).alias("dup_para_frac"),
        _frac(F.col("_cp") - F.col("_cdp"), F.col("_cp")).alias("dup_para_char_frac"),
        F.coalesce(F.col("_ng"), F.lit(0)).alias("n_ngrams"),
        _frac(
            F.coalesce(F.col("_ng") - F.col("_ndg"), F.lit(0)),
            F.coalesce(F.col("_ng"), F.lit(0)),
        ).alias("dup_ngram_frac"),
        _frac(F.coalesce(F.col("_top_chars"), F.lit(0)), F.col("_n_chars")).alias(
            "top_ngram_char_frac"
        ),
    )
    return out


def common_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 5,
) -> DataFrame:
    """Cross-document boilerplate n-grams: (gram, n_docs, n_total) for
    word n-grams appearing in >= min_docs distinct documents.

    n_docs counts documents containing the gram at least once; n_total
    counts every occurrence. Two-level aggregation — per-(doc, gram)
    counts first, then per-gram — so even a gram present in every
    document partial-combines map-side instead of concentrating rows on
    one reducer.
    """
    toks = _tokens(F.col(text_col))
    rows = docs.select(F.col(id_col), F.explode(_grams(toks, n)).alias("gram"))
    per_doc = rows.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_doc.groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum("c").cast("long").alias("n_total"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Benchmark-contamination kill list (GPT-3 §C / LLaMA-style n-gram
    overlap): corpus documents sharing >= 1 word n-gram with any
    benchmark document.

    Returns (doc_id, n_shingles, n_hits, contamination_frac) for
    contaminated documents only — n_hits is the number of the document's
    *distinct* shingles that occur anywhere in the benchmark, and
    contamination_frac = n_hits / n_shingles.

    Scale shape: benchmark shingles are made distinct before the join,
    so each corpus (doc, shingle) row matches at most one benchmark row
    — the join cannot explode on hot shingles; the per-doc rollup is a
    partial-aggregated groupBy. A small benchmark side auto-broadcasts
    under AQE; a large one falls back to a plain shuffled equi-join.
    """
    corpus_sh = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_grams(_tokens(F.col(text_col)), n))).alias("g"),
    )
    n_shingles = corpus_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_shingles")
    )
    bench_sh = benchmark.select(
        F.explode(F.array_distinct(_grams(_tokens(F.col(bench_text_col)), n))).alias("g")
    ).distinct()
    hits = (
        corpus_sh.join(bench_sh, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    return hits.join(n_shingles, id_col).select(
        F.col(id_col),
        F.col("n_shingles"),
        F.col("n_hits"),
        F.round(F.col("n_hits").cast("double") / F.col("n_shingles"), 6).alias(
            "contamination_frac"
        ),
    )
