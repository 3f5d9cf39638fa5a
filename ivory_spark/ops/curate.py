"""End-to-end corpus curation: the one-call composition of the
training-data pipeline operators.

A user assembling a pretraining corpus runs the same recipe every time —
quality gate, repetition gate, exact dedup, (optional) near-dup
clustering, (optional) sub-document substring dedup, benchmark
decontamination, PII redaction, mixture sampling, split assignment,
sequence packing. `curate_corpus` wires the existing operators
(ops/textstats, ops/repetition, ops/dedup, ops/substring, ops/pii,
ops/sampling) into that recipe with every stage optional, returning one
lazy DataFrame so Catalyst sees the whole pipeline (filters fused into
the scan where possible, one plan end-to-end).

Scale shape is the sum of its parts, all individually audited: the
gates and PII pass are per-row projections; exact dedup is one groupBy;
near-dup is the banded LSH join + min-label clustering; decontamination
is a distinct-shingle equi-join; sampling/split are hash filters;
packing is one window per shard. Nothing in the composition adds a
shuffle beyond what the member operators already do, and every
stochastic choice is md5-keyed — the same input produces the same
corpus on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ivory_spark.ops import dedup as _dedup
from ivory_spark.ops import pii as _pii
from ivory_spark.ops import repetition as _rep
from ivory_spark.ops import sampling as _samp
from ivory_spark.ops import substring as _sub
from ivory_spark.ops import textstats as _ts


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: float | None = 0.5,
    max_dup_line_frac: float | None = 0.3,
    max_top_ngram_char_frac: float | None = 0.2,
    exact_dedup: bool = True,
    neardup_threshold: float | None = None,
    strip_dup_substrings_k: int | None = None,
    benchmark: DataFrame | None = None,
    decontaminate_ngram: int = 13,
    redact: bool = True,
    mixture: dict[str, float] | None = None,
    split_weights: dict[str, float] | None = None,
    pack_budget: int | None = None,
    pack_shards: int = 256,
) -> DataFrame:
    """Run the standard curation recipe over `docs`; every stage is
    skippable by passing None/False. Returns the surviving rows with the
    input's columns (text redacted in place when `redact`), plus `split`
    when `split_weights` is given and the pack placement columns
    (shard, n_tokens, tok_start, seq_first, seq_last, offset_in_seq)
    when `pack_budget` is given.

    Stage order mirrors production pipelines: cheap per-row gates first
    (shrink before any shuffle), dedup on the survivors, benchmark
    decontamination, then the assembly stages (redact / sample / split /
    pack) on the final keep set.
    """
    out = docs

    if min_quality is not None:
        # per-row gate applied inline: quality is a pure projection of
        # the text, so a filter fuses into the scan — no quality_score
        # materialization + corpus-wide equi-join back to the text frame
        # (the join shuffled the wide text column once per stage)
        out = out.filter(_ts.quality_expr(F.col(text_col)) >= min_quality)

    if max_dup_line_frac is not None or max_top_ngram_char_frac is not None:
        r = _rep.repetition_stats(out, id_col, text_col)
        keep = F.lit(True)
        if max_dup_line_frac is not None:
            keep = keep & (F.col("dup_line_frac") <= max_dup_line_frac)
        if max_top_ngram_char_frac is not None:
            keep = keep & (F.col("top_ngram_char_frac") <= max_top_ngram_char_frac)
        out = out.join(r.filter(keep).select(id_col), id_col)

    if exact_dedup:
        survivors = _dedup.exact_dedup(out, id_col, text_col).select(id_col)
        out = out.join(survivors, id_col)

    if neardup_threshold is not None:
        pairs = _dedup.minhash_dedup_pairs(
            out, threshold=neardup_threshold, id_col=id_col, text_col=text_col
        )
        clusters = _dedup.dedup_clusters(pairs, id_col)
        # drop every clustered doc that is not its cluster representative
        losers = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
        out = out.join(losers, id_col, "left_anti")

    if strip_dup_substrings_k is not None:
        # sub-document dedup (Lee et al. all-but-one-occurrence): text is
        # rewritten to the canonical token form with duplicated >=k-token
        # passages removed; later stages see the stripped text.
        stripped = _sub.strip_duplicate_spans(
            out, k=strip_dup_substrings_k, id_col=id_col, text_col=text_col
        ).withColumnRenamed(text_col, "_stripped")
        out = (
            out.join(stripped.select(id_col, "_stripped"), id_col)
            .drop(text_col)
            .withColumnRenamed("_stripped", text_col)
        )

    if benchmark is not None:
        kill = _rep.decontaminate(
            out, benchmark, id_col, text_col, n=decontaminate_ngram
        ).select(id_col)
        out = out.join(kill, id_col, "left_anti")

    if redact:
        # redaction is a per-row regexp projection: rewrite the text
        # column in place instead of joining redact_pii's output back
        out = out.withColumn(text_col, _pii.redact_expr(F.col(text_col)))

    if mixture is not None:
        out = _samp.mixture_sample(out, mixture, id_col=id_col)

    if split_weights is not None:
        out = _samp.hash_split(out, split_weights, id_col=id_col)

    if pack_budget is not None:
        placement = _samp.pack_sequences(
            out, budget=pack_budget, n_shards=pack_shards, id_col=id_col, text_col=text_col
        )
        out = out.join(placement, id_col)

    return out
