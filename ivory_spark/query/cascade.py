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


def cascade_topk(
    spark: SparkSession,
    index: Index,
    queries: list[dict],
    stage1_k: int = 100,
    model: MrfModel | None = None,
    with_docid: bool = True,
) -> DataFrame:
    model = model or MrfModel()
    s1 = bm25_topk_wand(spark, index, queries, k=stage1_k, with_docid=False)
    candidates: dict[str, set[int]] = {}
    for r in s1.select("qid", "docno").collect():
        candidates.setdefault(r["qid"], set()).add(r["docno"])
    return mrf_topk(
        spark, index, queries, model, with_docid=with_docid, candidates=candidates
    )


def oracle_cascade_topk(
    oracle_index, queries: list[dict], stage1_k: int = 100,
    model: MrfModel | None = None,
) -> dict[str, list[dict]]:
    from ivory_spark.oracle import oracle_topk

    model = model or MrfModel()
    s1 = oracle_topk(oracle_index, queries, k=stage1_k)
    candidates = {qid: {r["docno"] for r in rows} for qid, rows in s1.items()}
    return oracle_mrf_topk(oracle_index, queries, model, candidates=candidates)
