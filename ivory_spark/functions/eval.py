"""Ranked-list evaluation — the analogue of Ivory's core/eval package.

Reference semantics reproduced:
- Qrels: TREC-format relevance judgments "qid 0 docid rel"
  (ivory/core/eval/Qrels.java; data/trec/qrels.robust04.noCRFR.txt);
- AP: average precision over the ranked list — sum over relevant
  retrieved docs of precision@rank / R (ivory/core/eval/
  RankedListEvaluator.java:100-130);
- P@N: fraction of the top N that are relevant;
- MAP: mean AP over queries (queries with no relevant docs are skipped,
  matching trec_eval).

Operates on the TREC-run DataFrame shape (qid, rank, docid, score) or on
plain python lists, so golden effectiveness numbers can be pinned per
query exactly like Robust04_Basic.java:43-317 pins AP/P10 maps.
"""

from __future__ import annotations

from collections import defaultdict


def parse_qrels(path_or_lines) -> dict[str, set[str]]:
    """'qid 0 docid rel' lines -> qid -> set(relevant docids)."""
    if isinstance(path_or_lines, str):
        with open(path_or_lines) as f:
            lines = f.readlines()
    else:
        lines = list(path_or_lines)
    rel: dict[str, set[str]] = defaultdict(set)
    for line in lines:
        parts = line.split()
        if len(parts) >= 4 and int(parts[3]) > 0:
            rel[parts[0]].add(parts[2])
    return dict(rel)


def average_precision(ranked_docids: list[str], relevant: set[str]) -> float:
    if not relevant:
        return 0.0
    hits = 0
    total = 0.0
    for i, d in enumerate(ranked_docids, start=1):
        if d in relevant:
            hits += 1
            total += hits / i
    return total / len(relevant)


def precision_at(n: int, ranked_docids: list[str], relevant: set[str]) -> float:
    if n <= 0:
        return 0.0
    return sum(1 for d in ranked_docids[:n] if d in relevant) / n


def parse_graded_qrels(path_or_lines) -> dict[str, dict[str, float]]:
    """'qid 0 docid grade' lines -> qid -> {docid: grade}, keeping zero
    and negative judgments (graded measures need the full judgment set;
    the ltr feature files carry the same grades, ltr/Instances.java)."""
    if isinstance(path_or_lines, str):
        with open(path_or_lines) as f:
            lines = f.readlines()
    else:
        lines = list(path_or_lines)
    out: dict[str, dict[str, float]] = defaultdict(dict)
    for line in lines:
        parts = line.split()
        if len(parts) >= 4:
            out[parts[0]][parts[2]] = float(parts[3])
    return dict(out)


def ndcg(ranked_docids: list[str], grades: dict[str, float]) -> float:
    """NDCG over the ranked list with the reference's gain/discount —
    (2^grade - 1) / ln(rank + 2), NATURAL log, no @k cutoff
    (ltr/NDCGMeasure.java:88-105). Unjudged retrieved docs gain 0; the
    ideal DCG ranks ALL judged docs (trec_eval convention — the ltr
    Measure evaluates run == judged set, where the two coincide)."""
    import math

    dcg = sum(
        (2.0 ** grades.get(d, 0.0) - 1.0) / math.log(i + 2.0)
        for i, d in enumerate(ranked_docids)
    )
    ideal = sorted(grades.values(), reverse=True)
    idcg = sum((2.0 ** g - 1.0) / math.log(i + 2.0) for i, g in enumerate(ideal))
    return dcg / idcg if idcg > 0 else 0.0


def err(ranked_docids: list[str], grades: dict[str, float]) -> float:
    """Expected reciprocal rank: g = (2^grade - 1)/16, err += g*p/rank,
    p *= (1 - g) down the ranked list (ltr/ERRMeasure.java:66-81)."""
    total, p = 0.0, 1.0
    for i, d in enumerate(ranked_docids):
        g = (2.0 ** grades.get(d, 0.0) - 1.0) / 16.0
        total += g * p / (i + 1.0)
        p *= 1.0 - g
    return total


def evaluate_run(
    run: dict[str, list[str]],
    qrels: dict[str, set[str]],
    p_at: int = 10,
    graded_qrels: dict[str, dict[str, float]] | None = None,
) -> dict:
    """run: qid -> ranked docids. Returns per-query AP/P@N + MAP/mean P@N
    (queries absent from qrels are skipped, as trec_eval does). Pass
    graded_qrels (parse_graded_qrels) to also get per-query ndcg/err and
    their means — the ltr-package graded measures."""
    per_query = {}
    for qid, docs in run.items():
        rel = qrels.get(qid)
        if not rel:
            continue
        per_query[qid] = {
            "ap": average_precision(docs, rel),
            f"p{p_at}": precision_at(p_at, docs, rel),
            "num_rel": len(rel),
        }
        if graded_qrels is not None and qid in graded_qrels:
            per_query[qid]["ndcg"] = ndcg(docs, graded_qrels[qid])
            per_query[qid]["err"] = err(docs, graded_qrels[qid])
    n = len(per_query)
    out = {
        "per_query": per_query,
        "map": sum(v["ap"] for v in per_query.values()) / n if n else 0.0,
        f"mean_p{p_at}": sum(v[f"p{p_at}"] for v in per_query.values()) / n if n else 0.0,
        "num_queries": n,
    }
    if graded_qrels is not None:
        graded = [v for v in per_query.values() if "ndcg" in v]
        g = len(graded)
        out["mean_ndcg"] = sum(v["ndcg"] for v in graded) / g if g else 0.0
        out["mean_err"] = sum(v["err"] for v in graded) / g if g else 0.0
    return out


def run_from_dataframe(results) -> dict[str, list[str]]:
    """(qid, rank, docid, ...) DataFrame -> qid -> ranked docids."""
    out: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for r in results.select("qid", "rank", "docid").collect():
        out[r["qid"]].append((r["rank"], r["docid"]))
    return {q: [d for _, d in sorted(v)] for q, v in out.items()}
