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


def evaluate_run(
    run: dict[str, list[str]], qrels: dict[str, set[str]], p_at: int = 10
) -> dict:
    """run: qid -> ranked docids. Returns per-query AP/P@N + MAP/mean P@N
    (queries absent from qrels are skipped, as trec_eval does)."""
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
    n = len(per_query)
    return {
        "per_query": per_query,
        "map": sum(v["ap"] for v in per_query.values()) / n if n else 0.0,
        f"mean_p{p_at}": sum(v[f"p{p_at}"] for v in per_query.values()) / n if n else 0.0,
        "num_queries": n,
    }


def run_from_dataframe(results) -> dict[str, list[str]]:
    """(qid, rank, docid, ...) DataFrame -> qid -> ranked docids."""
    out: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for r in results.select("qid", "rank", "docid").collect():
        out[r["qid"]].append((r["rank"], r["docid"]))
    return {q: [d for _, d in sorted(v)] for q, v in out.items()}
