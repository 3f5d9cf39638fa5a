"""Pseudo-relevance-feedback query expansion (MRFExpander analogue).

Reference shape: ivory/smrf/model/expander/MRFExpander.java + the
UnigramLatentConcept expanders, wired at
ivory/smrf/retrieval/BatchQueryRunner.java:131-137 — run the original
query, mine expansion concepts from the top fbDocs documents, re-run an
expanded model mixing original and expansion weights.

Our documented semantics (shared verbatim by the Spark path and the
oracle, so expansion is rank-identity-testable):

1. initial retrieval: exact BM25 top-fbDocs (bit-identical on both paths);
2. candidate concepts: every term of a feedback doc, weighted by
   relevance-model mass  w(t) = Σ_{d in fb} tf(t,d) / dl(d)
   (float64, summed over (term, docno)-sorted records);
3. keep top fbTerms by (w desc, term asc), L1-normalize;
4. expanded weighted query: original terms carry (1-alpha) * qtf / Σqtf,
   expansion terms alpha * w — scored with the weighted exact scorer.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession, functions as F

from ivory_spark.functions.tokenizer import get_tokenizer
from ivory_spark.index.reader import Index


def rm_weights(records: list[tuple[str, int, int, int]], fb_terms: int) -> list[tuple[str, float]]:
    """records: (term, docno, tf, dl) over the feedback docs.
    Returns [(term, normalized_weight)] — deterministic."""
    acc: dict[str, float] = {}
    for term, _docno, tf, dl in sorted(records):
        if dl > 0:
            acc[term] = acc.get(term, 0.0) + (tf / dl)
    top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    total = sum(w for _, w in top)
    if total <= 0:
        return []
    return [(t, w / total) for t, w in top]


def lce_weights(
    records: list[tuple[str, int, int, int, float]], fb_terms: int
) -> list[tuple[str, float]]:
    """Latent-concept-expansion weights (UnigramLatentConceptExpander.java:
    159-198): concept mass w(t) = Σ_{d in fb} exp(score(d) + f(t,d)) with
    the concept potential f = log MLE doc-language-model, so each
    feedback doc contributes exp(score(d)) · tf(t,d)/dl(d) — the
    score-weighted relevance model. records: (term, docno, tf, dl,
    doc_score float); float64 folds in (term, docno) order, same
    normalization as rm_weights."""
    import math

    acc: dict[str, float] = {}
    for term, _docno, tf, dl, s in sorted(records):
        if dl > 0:
            acc[term] = acc.get(term, 0.0) + math.exp(float(s)) * (tf / dl)
    top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    total = sum(w for _, w in top)
    if total <= 0:
        return []
    return [(t, w / total) for t, w in top]


def _mix(tokens: list[str], expansion: list[tuple[str, float]], alpha: float) -> list[tuple[str, float]]:
    counts = Counter(tokens)
    qtotal = sum(counts.values())
    mixed: dict[str, float] = {
        t: (1.0 - alpha) * (c / qtotal) for t, c in counts.items()
    }
    for t, w in expansion:
        mixed[t] = mixed.get(t, 0.0) + alpha * w
    return sorted(mixed.items())


def expand_queries(
    spark: SparkSession,
    index: Index,
    queries: list[dict],
    fb_docs: int = 10,
    fb_terms: int = 10,
    alpha: float = 0.5,
    method: str = "rm",
) -> list[dict]:
    """-> weighted queries [{'qid', 'terms': [(term, weight)]}].

    method: "rm" (relevance-model mass, MRFExpander default) or "lce"
    (latent concept expansion — feedback docs weighted by exp(doc score),
    UnigramLatentConceptExpander.java:159-198)."""
    import os

    from ivory_spark.query.exact import bm25_topk

    tokenize = get_tokenizer(index.properties.get("tokenizer", "code_v1")).tokenize_py
    initial = bm25_topk(spark, index, queries, k=fb_docs, with_docid=False)
    fb: dict[str, list] = {}
    for r in initial.collect():
        fb.setdefault(r["qid"], []).append((r["docno"], float(r["score"])))
    all_docnos = sorted({d for ds in fb.values() for d, _ in ds})
    if not all_docnos:
        return [
            {"qid": q["qid"], "terms": _mix(tokenize(q["query"]), [], alpha)}
            for q in queries
        ]
    # mine only dictionary terms: the tdf artifact is pre-min_df/max_df
    # filter, and expansion candidates outside the dictionary can't be
    # retrieved — and would perturb the L1 normalization vs the oracle
    # (which mines the dictionary). left_semi keeps the scan one-pass;
    # tdf is range-clustered by docno at write, so the isin filter prunes
    # to the feedback docs' row groups.
    tdf = spark.read.parquet(os.path.join(index.root, "tdf"))
    rows = (
        tdf.filter(F.col("docno").isin([int(d) for d in all_docnos]))
        .join(F.broadcast(index.dictionary.select("term")), "term", "left_semi")
        .select("term", "docno", "tf", "dl")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["docno"], []).append((r["term"], r["docno"], r["tf"], r["dl"]))

    out = []
    for q in queries:
        if method == "lce":
            recs = [
                rec + (s,)
                for d, s in fb.get(q["qid"], [])
                for rec in by_doc.get(d, [])
            ]
            exp = lce_weights(recs, fb_terms)
        else:
            recs = [rec for d, _ in fb.get(q["qid"], []) for rec in by_doc.get(d, [])]
            exp = rm_weights(recs, fb_terms)
        out.append({"qid": q["qid"], "terms": _mix(tokenize(q["query"]), exp, alpha)})
    return out


def oracle_expand_queries(
    oracle_index, queries: list[dict], fb_docs: int = 10, fb_terms: int = 10,
    alpha: float = 0.5, method: str = "rm",
) -> list[dict]:
    """Identical semantics over the numpy oracle index."""
    from ivory_spark.oracle import oracle_topk

    oi = oracle_index
    tokenize = get_tokenizer(oi.tokenizer).tokenize_py
    initial = oracle_topk(oi, queries, k=fb_docs)
    out = []
    for q in queries:
        fb_rows = initial.get(q["qid"], [])
        recs = []
        for term, posmap in oi.positions.items():
            for r in fb_rows:
                d = r["docno"]
                if d in posmap:
                    rec = (term, d, len(posmap[d]), oi.doclens[d])
                    if method == "lce":
                        rec = rec + (float(r["score"]),)
                    recs.append(rec)
        exp = (
            lce_weights(recs, fb_terms) if method == "lce" else rm_weights(recs, fb_terms)
        )
        out.append({"qid": q["qid"], "terms": _mix(tokenize(q["query"]), exp, alpha)})
    return out
