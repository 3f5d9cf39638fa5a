"""Cascade ranking — staged retrieval with per-stage pruning.

Reference: ivory/cascade/retrieval/CascadeEval.java (multi-stage ranking
where each stage scores only the previous stage's survivors, trading
effectiveness for cost). Stage 0 is always the cheap bag-of-words BM25
pass via the block-max WAND kernel; every later stage is a dependence
model (SD/FD window potentials) over the survivors, each cutting to its
own k — the reference's staged-pruning shape (CascadeEval.java:1-896
applies a per-stage pruner then the next, costlier scorer).

Candidate flow between stages is a (qid, docno) DataFrame fed to
mrf_topk's candidates_df path: the allow-list rides the next stage's
(qid, shard) shuffle as tagged rows, so survivors NEVER pass through
the driver — a 10^5-query batch cascades fully distributed. Without
cost accounting the whole cascade is one lazy linear plan (a single
action computes each stage once); with costs= the per-stage survivor
frames are persisted and counted.

Every stage boundary is an exact top-k with the (score desc, docno
desc) tie-break, so the cascade is bit-exactly reproducible against
oracle_cascade_topk's composition.
"""

from __future__ import annotations

import dataclasses

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
    stages: list[dict] | None = None,
) -> DataFrame:
    """Staged cascade. Default = the canonical two-stage form (WAND BM25
    keeps top stage1_k, the SD/FD model reranks only those). `stages`
    generalizes to N: a list of {"model": MrfModel, "k": int,
    "unit_cost": float (optional, default STAGE2_UNIT_COST)} applied in
    order after the WAND pass, each restricted to the previous stage's
    survivors via the distributed candidates_df flow.

    Pass `costs={}` to receive CascadeEval-style accounting:

      {"stage1": {"k", "candidate_docs", "wall_sec"},
       "stage2": {"docs_scored", "unit_cost", "wall_sec"},   (last stage)
       "stages": [per-stage dicts in order],
       "total_cost_units", "flat_cost_units_ub", "cost_vs_flat"}
    """
    import time

    model = model or MrfModel()
    if stages is None:
        stages = [{"model": model, "k": model.k}]
    if not stages:
        raise ValueError("cascade needs at least one rerank stage")

    t0 = time.monotonic()
    s1 = bm25_topk_wand(spark, index, queries, k=stage1_k, with_docid=False)
    surv = s1.select("qid", "docno")
    stage_costs = []
    cached = []
    if costs is not None:
        surv = surv.persist()
        cached.append(surv)
        n_s1 = surv.count()
        stage_costs.append(
            {"stage": 0, "kind": "wand_bm25", "k": stage1_k,
             "candidate_docs": n_s1,
             "wall_sec": round(time.monotonic() - t0, 3)}
        )

    out = None
    for i, st in enumerate(stages):
        is_last = i == len(stages) - 1
        st_model = dataclasses.replace(st["model"], k=st.get("k", st["model"].k))
        t0 = time.monotonic()
        out = mrf_topk(
            spark, index, queries, st_model,
            with_docid=with_docid and is_last,
            candidates_df=surv,
        )
        if not is_last:
            surv = out.select("qid", "docno")
        if costs is not None:
            # materialize stage output (k rows/query — never data-scale)
            # so wall time is attributable per stage
            rows = out.collect()
            out = spark.createDataFrame(rows, out.schema)
            if not is_last:
                surv = out.select("qid", "docno")
            docs_in = stage_costs[-1]["candidate_docs"] if stage_costs else 0
            unit = float(st.get("unit_cost", STAGE2_UNIT_COST))
            stage_costs.append(
                {"stage": i + 1, "kind": f"mrf_{st_model.dependence}",
                 "k": st_model.k, "docs_scored": docs_in,
                 "candidate_docs": len(rows), "unit_cost": unit,
                 "wall_sec": round(time.monotonic() - t0, 3)}
            )

    if costs is not None:
        from ivory_spark.query.exact import query_term_rows

        total = stage_costs[0]["candidate_docs"] + sum(
            s["docs_scored"] * s["unit_cost"] for s in stage_costs[1:]
        )
        rows_qt, _ = query_term_rows(index, queries)
        flat_docs_ub = sum(r[3] for r in rows_qt)
        # flat baseline: the LAST (costliest) model over every matching
        # doc; per-query sum of term df is its cheaply-known upper bound
        flat_cost = max(flat_docs_ub, 1) * stage_costs[-1]["unit_cost"]
        costs.update(
            {
                "stage1": {
                    "k": stage1_k,
                    "candidate_docs": stage_costs[0]["candidate_docs"],
                    "wall_sec": stage_costs[0]["wall_sec"],
                },
                "stage2": {
                    "docs_scored": stage_costs[-1]["docs_scored"],
                    "unit_cost": stage_costs[-1]["unit_cost"],
                    "wall_sec": stage_costs[-1]["wall_sec"],
                },
                "stages": stage_costs,
                "total_cost_units": round(total, 1),
                "flat_cost_units_ub": round(flat_cost, 1),
                "cost_vs_flat": round(total / flat_cost, 4),
            }
        )
        for c in cached:
            try:
                c.unpersist()
            except Exception:
                pass
    return out


def oracle_cascade_topk(
    oracle_index, queries: list[dict], stage1_k: int = 100,
    model: MrfModel | None = None, stages: list[dict] | None = None,
) -> dict[str, list[dict]]:
    """Single-node composition golden: WAND-equivalent exact BM25 top-k,
    then each stage's oracle MRF restricted to the previous survivors."""
    from ivory_spark.oracle import oracle_topk

    model = model or MrfModel()
    if stages is None:
        stages = [{"model": model, "k": model.k}]
    s1 = oracle_topk(oracle_index, queries, k=stage1_k)
    candidates = {qid: {r["docno"] for r in rows} for qid, rows in s1.items()}
    out = None
    for i, st in enumerate(stages):
        st_model = dataclasses.replace(st["model"], k=st.get("k", st["model"].k))
        out = oracle_mrf_topk(oracle_index, queries, st_model, candidates=candidates)
        if i < len(stages) - 1:
            candidates = {qid: {r["docno"] for r in rows} for qid, rows in out.items()}
    return out
