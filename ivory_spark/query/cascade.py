"""Cascade ranking — staged retrieval with per-stage pruning.

Reference: ivory/cascade/retrieval/CascadeEval.java (multi-stage ranking
where each stage scores only the previous stage's survivors, trading
effectiveness for cost). Our cascade is the canonical two-stage form:

  stage 1: cheap bag-of-words BM25 via the block-max WAND kernel,
           keep top `stage1_k` docs per query;
  stage 2: expensive SD/FD dependence model (positional, window
           potentials) scores ONLY those survivors; final top-k with the
           standard (score desc, docno desc) tie-break.

Both stages are rank-identity-tested against the oracle composition
(oracle_cascade_topk), so the cascade's pruning contract — stage-2
ranking restricted to stage-1 survivors — is bit-exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ivory_spark.index.reader import Index
from ivory_spark.query.mrf import MrfModel, mrf_topk, oracle_mrf_topk
from ivory_spark.query.wand import bm25_topk_wand


STAGE2_UNIT_COST = 20.0  # proximity scoring vs one BoW posting (CascadeEval-style unit)


def cascade_topk(
    spark: SparkSession,
    index: Index,
    queries: list[dict],
    stage1_k: int = 100,
    model: MrfModel | None = None,
    with_docid: bool = True,
    costs: dict | None = None,
) -> DataFrame:
    """Two-stage cascade; pass `costs={}` to receive per-stage cost
    accounting, the analogue of CascadeEval's cost metric
    (ivory/cascade/retrieval/CascadeEval.java:1-896 — each stage's cost =
    docs it scores x its scorer's unit cost; the cascade's win is the
    stage-2 unit cost applied to stage1_k survivors instead of every
    candidate):

      {"stage1": {"k", "candidate_docs", "wall_sec"},
       "stage2": {"docs_scored", "unit_cost", "wall_sec"},
       "total_cost_units", "cost_vs_flat"}   (cost_vs_flat < 1 = cheaper)
    """
    import time

    model = model or MrfModel()
    t0 = time.monotonic()
    s1 = bm25_topk_wand(spark, index, queries, k=stage1_k, with_docid=False)
    candidates: dict[str, set[int]] = {}
    n_s1 = 0
    for r in s1.select("qid", "docno").collect():
        candidates.setdefault(r["qid"], set()).add(r["docno"])
        n_s1 += 1
    s1_sec = time.monotonic() - t0

    t0 = time.monotonic()
    out = mrf_topk(
        spark, index, queries, model, with_docid=with_docid, candidates=candidates
    )
    if costs is not None:
        # materialize to the driver (k rows per query — never data-scale)
        # so stage-2 wall time is attributable, without leaking a cached
        # DataFrame the caller would have to know to unpersist
        rows = out.collect()
        out = spark.createDataFrame(rows, out.schema)
        s2_sec = time.monotonic() - t0
        docs_scored = sum(len(s) for s in candidates.values())
        # flat = the expensive model over every stage-1 *candidate* — we
        # don't re-run it, so approximate flat's doc count by the union
        # of stage-1 scored docs per query (>= stage1_k survivors)
        stage1_cost = float(n_s1)
        stage2_cost = docs_scored * STAGE2_UNIT_COST
        # flat baseline: the expensive model over every matching doc; the
        # per-query sum of term df is its (cheaply known) upper bound
        from ivory_spark.query.exact import query_term_rows

        rows, _ = query_term_rows(index, queries)
        flat_docs_ub = sum(r[3] for r in rows)
        flat_cost = max(flat_docs_ub, 1) * STAGE2_UNIT_COST
        costs.update(
            {
                "stage1": {
                    "k": stage1_k,
                    "candidate_docs": n_s1,
                    "wall_sec": round(s1_sec, 3),
                },
                "stage2": {
                    "docs_scored": docs_scored,
                    "unit_cost": STAGE2_UNIT_COST,
                    "wall_sec": round(s2_sec, 3),
                },
                "total_cost_units": round(stage1_cost + stage2_cost, 1),
                "flat_cost_units_ub": round(flat_cost, 1),
                "cost_vs_flat": round((stage1_cost + stage2_cost) / flat_cost, 4),
            }
        )
    return out


def oracle_cascade_topk(
    oracle_index, queries: list[dict], stage1_k: int = 100,
    model: MrfModel | None = None,
) -> dict[str, list[dict]]:
    from ivory_spark.oracle import oracle_topk

    model = model or MrfModel()
    s1 = oracle_topk(oracle_index, queries, k=stage1_k)
    candidates = {qid: {r["docno"] for r in rows} for qid, rows in s1.items()}
    return oracle_mrf_topk(oracle_index, queries, model, candidates=candidates)
