"""URL/domain operators for web-corpus curation: domain extraction,
blocklist filtering, per-domain statistics, and per-domain document
caps (the C4 / RefinedWeb moves: drop blocked hosts, bound how much any
single site contributes to the corpus).

All deterministic and engine-portable: the host is extracted with one
RE2-safe regex (shared verbatim by the DuckDB oracle — the reason this
does not use Spark's parse_url), and cap sampling orders documents by
the same md5-derived u60 hash as ops/sampling, so the kept set is
independent of partitioning, run order, and engine.

Scale shapes:
- extract/blocklist: per-row projection + a broadcast anti-join against
  the (small) blocklist — zero corpus shuffle.
- domain_stats: one partial-aggregated groupBy.
- cap_per_domain (exact): window rank within domain ordered by the u60
  hash. Exact top-N per key needs a per-key sort, so a single viral
  domain holding X% of the corpus sorts X% of it in one task — the
  documented skew bound. Use the approx variant when that matters.
- cap_per_domain_approx: per-domain counts (one partial-agg groupBy) +
  a keep-probability hash filter — no sort anywhere, cap hit in
  expectation (binomial around max_docs) rather than exactly.

No reference counterpart (lintool/Ivory has no URL handling); this
extends the training-data pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ivory_spark.ops.sampling import _u

# scheme://host[:port]/... -> host; RE2-safe, lowercased afterwards
DOMAIN_RE = "^[a-z][a-z0-9+.-]*://([^/:?#]+)"


def extract_domain(
    docs: DataFrame, url_col: str = "url", out_col: str = "domain"
) -> DataFrame:
    """Add `out_col` = lowercased registrable host of `url_col` (empty
    string when the URL has no scheme://host prefix)."""
    return docs.withColumn(
        out_col, F.lower(F.regexp_extract(F.col(url_col), DOMAIN_RE, 1))
    )


def domain_stats(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(domain, n_docs, n_chars): contribution of every host — the
    skew report that motivates capping."""
    d = extract_domain(docs, url_col)
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum(F.length(text_col)).cast("bigint").alias("n_chars"),
    )


def filter_blocklist(
    docs: DataFrame, blocked: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose domain appears in `blocked` (a one-column
    `domain` frame, e.g. read from a blocklist file). Broadcast
    anti-join: the corpus never shuffles."""
    d = extract_domain(docs, url_col)
    return d.join(
        F.broadcast(blocked.select(F.lower("domain").alias("domain"))),
        "domain",
        "left_anti",
    ).drop("domain")


def cap_per_domain(
    docs: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt: str = "domain-cap",
) -> DataFrame:
    """Keep at most `max_docs` documents per domain — EXACTLY. The kept
    set is the max_docs smallest u60(md5(salt:id)) values per domain
    (ties impossible at u60 resolution; id is still the secondary sort
    key so the order is total), i.e. a deterministic uniform sample of
    each over-represented site. Per-key sort: see module docstring for
    the skew bound; prefer cap_per_domain_approx for viral hosts."""
    d = extract_domain(docs, url_col).withColumn("_u", _u(salt, F.col(id_col)))
    w = Window.partitionBy("domain").orderBy("_u", id_col)
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_docs)
        .drop("_u", "_rn", "domain")
    )


def cap_per_domain_approx(
    docs: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt: str = "domain-cap",
) -> DataFrame:
    """Keep ~max_docs documents per domain with NO per-key sort: one
    groupBy counts each domain, then rows pass a hash filter with
    probability min(1, max_docs/count). The cap holds in expectation
    (binomial spread around max_docs for capped domains); under-cap
    domains keep every row exactly. Same salt => a row kept here is a
    superset-sampling of the exact variant's hash order."""
    d = extract_domain(docs, url_col)
    counts = d.groupBy("domain").agg(F.count(F.lit(1)).alias("_cnt"))
    rate = F.least(F.lit(1.0), F.lit(float(max_docs)) / F.col("_cnt"))
    return (
        d.join(counts, "domain")
        .filter(_u(salt, F.col(id_col)) < rate)
        .drop("_cnt", "domain")
    )
