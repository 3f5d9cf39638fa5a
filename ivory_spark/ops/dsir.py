"""Data Selection via Importance Resampling (DSIR) over hashed n-grams.

Selects raw-corpus documents whose hashed n-gram distribution looks
like a target corpus — the standard pretraining-data selection method
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling", https://arxiv.org/abs/2302.03169 — public algorithm; no
reference-repo counterpart, this is LLM-pipeline surface). Spark-first
decomposition:

1. `ngram_bucket_counts` — per-doc hashed unigram+bigram bucket counts;
   one explode + one groupBy (map-side combined), pure JVM expressions.
2. `fit_logratio` — global per-bucket counts for the target and raw
   corpora (two n_buckets-row aggregations, collected driver-side:
   bucket-table-sized, never corpus-sized), smoothed bag-of-ngrams
   models, and the per-bucket importance log-ratio ln(p/q) QUANTIZED to
   integer micro-nats. The quantization makes every downstream per-doc
   score an exact int64 sum — independent of accumulation order,
   partitioning, and engine (the same trick the bitext gate uses).
3. `dsir_score` / `dsir_resample` — per-doc score = sum of
   count[bucket] * logratio[bucket] via an element_at literal-array
   lookup (the log-ratio table is tiny and broadcast as literals, as in
   ops/sampling mixture rates); Gumbel-top-k selection (key = score in
   nats + Gumbel(0,1) noise from the deterministic 60-bit md5 uniform)
   implements sampling-without-replacement proportional to the
   importance weights, deterministically.

At 100 TB everything is one scan + one vocabulary-free groupBy per
corpus (the feature space is the FIXED n_buckets hash range, so state
never grows with data) followed by a zero-shuffle scoring projection
and one top-k — the shape you want for trillion-token selection.

`fit_logprob` / `lm_perplexity` reuse the same machinery for the
CCNet-style reference-model perplexity quality filter (Wenzek et al.
2020, https://arxiv.org/abs/1911.00359): mean negative log-likelihood
per document under a hashed n-gram model fit on a clean reference
corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ivory_spark.ops.sampling import _h60, _u

QUANT = 1_000_000  # micro-nat quantization of the per-bucket log-ratio


def _totals(df: DataFrame) -> dict[int, int]:
    """Per-bucket gram totals of an ngram_bucket_counts frame. Uses the
    attached pre-aggregation projection when present (one map-side-
    combined groupBy(bucket) of <= n_buckets rows per partition) instead
    of executing the per-doc aggregation exchange the per-doc contract
    needs — sum over docs of cnt == count of gram rows per bucket."""
    src = getattr(df, "_ivory_bucket_source", None)
    if src is not None:
        rows = src.groupBy("bucket").agg(F.count("*").alias("c")).collect()
    else:
        rows = df.groupBy("bucket").agg(F.sum("cnt").alias("c")).collect()
    return {int(r["bucket"]): int(r["c"]) for r in rows}


def _grams(text_col: str):
    """Lowercase whitespace unigrams + adjacent bigrams ('a b') as one
    array column — the hashed feature set of the paper (word-level here;
    the hash domain makes the gram granularity a free parameter)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    n = F.size(toks)
    # bigrams via zip_with over the two shifted slices — NOT
    # element_at(toks, i) inside a transform lambda, which re-inlines
    # the whole split+filter expression PER ELEMENT (O(len^2) per doc;
    # a 40k-token outlier document turns that into 1.6e9 splits). The
    # slices evaluate the token array O(1) times per row, so grams stay
    # O(len) per document whatever Catalyst's projection collapsing does.
    k = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, k),
        F.slice(toks, 2, k),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, bigrams)


def ngram_bucket_counts(
    docs: DataFrame,
    n_buckets: int = 8192,
    seed: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, cnt): hashed n-gram features. The portable
    60-bit md5 hash (ops/sampling._h60) keyed by gram string, modulo
    n_buckets, so DuckDB reproduces the bucketing exactly."""
    g = docs.select(
        F.col(id_col), F.explode(_grams(text_col)).alias("gram")
    )
    bucketed = g.select(
        F.col(id_col),
        (_h60(seed, F.col("gram")) % F.lit(int(n_buckets)))
        .cast("int")
        .alias("bucket"),
    )
    out = bucketed.groupBy(id_col, "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )
    # fit_logratio/fit_logprob only need PER-BUCKET totals; the per-doc
    # aggregation exchange (~n_docs x distinct-buckets rows) is pure
    # waste for them. Attach the pre-aggregation projection so `_totals`
    # can aggregate straight to <= n_buckets rows per partition
    # (map-side combine, no corpus-sized shuffle). Consumers that
    # transform the frame get a new object without the attribute and
    # fall back to the generic path.
    out._ivory_bucket_source = bucketed
    return out


def fit_logratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = 8192,
    alpha: float = 1.0,
) -> list[int]:
    """Per-bucket quantized importance log-ratio (micro-nats).

    lr[b] = floor(QUANT * ln(p_b / q_b) + 0.5) with add-alpha smoothed
    bucket probabilities p (target) and q (raw); half-up rounding is
    pinned explicitly because Python's round() is banker's while SQL
    round() is half-away — floor(x + 0.5) agrees everywhere. Two
    n_buckets-row collects — model-sized, not corpus-sized.
    """
    t, r = _totals(target_counts), _totals(raw_counts)
    tt = sum(t.values()) + alpha * n_buckets
    rt = sum(r.values()) + alpha * n_buckets
    out = []
    for b in range(int(n_buckets)):
        p = (t.get(b, 0) + alpha) / tt
        q = (r.get(b, 0) + alpha) / rt
        out.append(int(math.floor(QUANT * math.log(p / q) + 0.5)))
    return out


def dsir_score(
    docs: DataFrame,
    logratio: list[int],
    n_buckets: int | None = None,
    seed: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score): exact int64 importance score in micro-nats,
    score = sum_b count_b * lr_b, computed as the per-GRAM sum of
    lr[bucket(gram)] — algebraically identical but it needs no
    intermediate per-doc bucket-count table, so the whole score is ONE
    map-side-combined groupBy(doc_id) over a zero-shuffle projection
    (explode grams -> hash -> element_at literal-array lookup). No
    join, no Python, one Exchange."""
    n_buckets = len(logratio) if n_buckets is None else int(n_buckets)
    g = docs.select(F.col(id_col), F.explode(_grams(text_col)).alias("gram"))
    lr = F.array(*[F.lit(int(v)) for v in logratio])
    bucket = (_h60(seed, F.col("gram")) % F.lit(int(n_buckets))).cast("int")
    term = F.element_at(lr, bucket + 1).cast("long")
    return g.groupBy(id_col).agg(F.sum(term).cast("long").alias("score"))


def fit_logprob(
    ref_counts: DataFrame, n_buckets: int = 8192, alpha: float = 1.0
) -> list[int]:
    """Per-bucket quantized log-probability (micro-nats) of a hashed
    bag-of-ngrams model fit on a REFERENCE corpus — the model half of
    the CCNet-style perplexity filter (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data",
    https://arxiv.org/abs/1911.00359 — public method; their KenLM is
    replaced by the same fixed-width hashed n-gram model DSIR uses, so
    model state never grows with data). lp[b] = floor(QUANT *
    ln((c_b + alpha) / (total + alpha * B)) + 0.5); one
    n_buckets-row collect."""
    c = _totals(ref_counts)
    tot = sum(c.values()) + alpha * n_buckets
    return [
        int(math.floor(QUANT * math.log((c.get(b, 0) + alpha) / tot) + 0.5))
        for b in range(int(n_buckets))
    ]


def lm_perplexity(
    docs: DataFrame,
    logprob: list[int],
    seed: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, nll): per-document mean negative log-likelihood
    (nats, 6 dp) under the reference hashed-ngram model — low nll means
    'looks like the reference corpus', the CCNet head/middle/tail
    quality signal. The per-gram log-prob sum is an exact int64 (same
    micro-nat quantization as dsir_score), so nll = -sum / (n * QUANT)
    is the ratio of two exact integers — reproducible across engines,
    partitionings, and accumulation orders. Filter with a threshold or
    feed ops/sampling.weighted_sample for a soft version. Same plan
    shape as dsir_score: one map-side-combined groupBy, no Python."""
    n_buckets = len(logprob)
    g = docs.select(F.col(id_col), F.explode(_grams(text_col)).alias("gram"))
    lp = F.array(*[F.lit(int(v)) for v in logprob])
    bucket = (_h60(seed, F.col("gram")) % F.lit(int(n_buckets))).cast("int")
    term = F.element_at(lp, bucket + 1).cast("long")
    agg = g.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum(term).cast("long").alias("lp_sum"),
    )
    nll = -F.col("lp_sum").cast("double") / (
        F.col("n_grams").cast("double") * F.lit(float(QUANT))
    )
    return agg.select(id_col, "n_grams", F.round(nll, 6).alias("nll"))


def dsir_resample(
    docs: DataFrame,
    logratio: list[int],
    k: int,
    seed: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gumbel-top-k importance resampling: (doc_id, score, key) for the
    k selected docs.

    key = score/QUANT + Gumbel(0,1) with the Gumbel noise derived from
    the deterministic md5 uniform u in [0,1): g = -ln(-ln(u)). Taking
    the k largest keys samples k docs without replacement with
    probability proportional to exp(score) — the Gumbel-top-k identity
    the paper's resampling step relies on. Ties (measure-zero) break by
    doc_id. The top-k is orderBy(...).limit(k), which Spark compiles to
    TakeOrderedAndProject — per-partition bounded top-k then a k-row
    merge, NOT a global sort or a single-task window (the difference
    between a k-row driver merge and a one-reducer shuffle at 100 TB).
    """
    scores = dsir_score(docs, logratio, None, seed, id_col, text_col)
    u = _u("gumbel:" + seed, F.col(id_col))
    key = (F.col("score").cast("double") / F.lit(float(QUANT))) + (
        -F.log(-F.log(u))
    )
    return (
        scores.withColumn("key", key)
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(int(k))
        .select(id_col, "score", F.round(F.col("key"), 6).alias("key"))
    )
