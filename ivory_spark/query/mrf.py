"""Markov-Random-Field retrieval: sequential/full dependence models with
ordered/unordered window potentials over a positional index.

Reference semantics reproduced (not copied):
- clique generation: bag-of-words = one clique per query-token occurrence
  (TermCliqueSet.java:62-79); SD = adjacent term pairs
  (CliqueFactory.java:40-87); FD = 2^|q| enumeration — ordered cliques
  are the contiguous subsets, unordered the non-contiguous ones, in
  enumeration order (CliqueFactory.java:89-170);
- expression windows: #od gap = width (default 1); #uw window =
  |terms| * width (default width 4)
  (OrderedWindowExpressionGenerator.java, UnorderedWindow...java);
- window matching: merge all terms' position lists into one sorted
  stream (ties keep earlier-reader order), then the reference's exact
  scan: ordered requires strictly increasing reader ids with every
  consecutive new-match gap <= gap size
  (ProximityPostingsReaderOrderedWindow.java:92-136); unordered requires
  all ids within a window of `size` positions
  (ProximityPostingsReaderUnorderedWindow.java:90-124); match counts
  truncate at Short.MAX_VALUE;
- proximity df/cf heuristics: df = N/100 (int), cf = 2*df
  (RetrievalEnvironment.java:133-134,352-385);
- scoring: each clique contributes weight * scoringFn(tf, dl)
  (QueryPotential.java:143-169); float32 accumulation in clique order.

Documented deviation: a proximity clique left with fewer than two
in-dictionary terms contributes 0 (the reference's single-reader
behavior is a degenerate artifact of its scan loop). Dirichlet cliques
with tf=0 score the reference's background probability (nonzero,
doclen-dependent), clamped to 0 only when the clique's cf heuristic
degenerates to 0 on a sub-100-doc corpus.

The MRF path is exact (no pruning); its golden oracle is oracle_mrf_topk
below, which shares every kernel with the Spark path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ivory_spark.functions.scoring import (
    F32,
    bm25_idf,
    bm25_tf_part,
    dirichlet_score,
)
from ivory_spark.functions.tokenizer import MAX_TF, get_tokenizer
from ivory_spark.index import codec
from ivory_spark.index.reader import Index

SHORT_MAX = 32767


# ---------------------------------------------------------------------------
# window-match kernels (exact reference semantics)
# ---------------------------------------------------------------------------


def _merge_streams(position_lists: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """One sorted (positions, reader_ids) stream; ties keep reader order."""
    pos = np.concatenate([np.asarray(p, dtype=np.int64) for p in position_lists])
    ids = np.concatenate(
        [np.full(len(p), i, dtype=np.int64) for i, p in enumerate(position_lists)]
    )
    order = np.lexsort((ids, pos))
    return pos[order], ids[order]


def count_ordered_matches(position_lists: list[np.ndarray], gap: int) -> int:
    """#od[gap]: all terms in reader order, each consecutive new-term gap
    <= gap (ProximityPostingsReaderOrderedWindow.java:92-136).

    Two-reader cliques (every SD clique, every FD pair) take a vectorized
    searchsorted path derived from the scan semantics: a start at a in P1
    matches iff min(P2 > a) - a <= gap (P2 starts always violate reader
    order); identical lists (duplicate query token) match once per
    occurrence. n>2 readers fall back to the reference scan loop.
    Equivalence is property-tested in tests/test_mrf.py."""
    n_readers = len(position_lists)
    if n_readers < 2 or any(len(p) == 0 for p in position_lists):
        return 0
    if n_readers == 2:
        p1 = np.asarray(position_lists[0], dtype=np.int64)
        p2 = np.asarray(position_lists[1], dtype=np.int64)
        if len(p1) == len(p2) and np.array_equal(p1, p2):
            return min(len(p1), SHORT_MAX)
        idx = np.searchsorted(p2, p1, side="right")
        valid = idx < len(p2)
        nxt = p2[np.minimum(idx, len(p2) - 1)]
        return min(int(np.count_nonzero(valid & (nxt - p1 <= gap))), SHORT_MAX)
    return _count_ordered_scan(position_lists, gap)


def _count_ordered_scan(position_lists: list[np.ndarray], gap: int) -> int:
    """Reference scan loop (exact reference semantics, any reader count)."""
    n_readers = len(position_lists)
    positions, ids = _merge_streams(position_lists)
    matches = 0
    n = len(positions)
    for i in range(n):
        matched = {int(ids[i])}
        last_id = int(ids[i])
        last_pos = int(positions[i])
        max_gap = 0
        ordered = True
        for j in range(i + 1, n):
            cur_id = int(ids[j])
            cur_pos = int(positions[j])
            if cur_id not in matched:
                matched.add(cur_id)
                if cur_id < last_id:
                    ordered = False
                if cur_pos - last_pos > max_gap:
                    max_gap = cur_pos - last_pos
                last_pos, last_id = cur_pos, cur_id
            if max_gap > gap or not ordered:
                break
            if len(matched) == n_readers and ordered:
                matches += 1
                break
    return min(matches, SHORT_MAX)


def count_unordered_matches(position_lists: list[np.ndarray], window: int) -> int:
    """#uw[window]: all terms within `window` consecutive positions
    (ProximityPostingsReaderUnorderedWindow.java:90-124).

    Two-reader vectorized form: a start at a in P1 matches iff P2 has an
    element in (a, a + window - 1]; symmetric for P2 starts; identical
    lists (duplicate token) add one match per occurrence plus one per
    occurrence with a successor inside the window. n>2 readers use the
    reference scan loop."""
    n_readers = len(position_lists)
    if n_readers < 2 or any(len(p) == 0 for p in position_lists):
        return 0
    if n_readers == 2:
        p1 = np.asarray(position_lists[0], dtype=np.int64)
        p2 = np.asarray(position_lists[1], dtype=np.int64)

        def starts_with_partner(a: np.ndarray, b: np.ndarray) -> int:
            hi = np.searchsorted(b, a + (window - 1), side="right")
            lo = np.searchsorted(b, a, side="right")
            return int(np.count_nonzero(hi > lo))

        if len(p1) == len(p2) and np.array_equal(p1, p2):
            return min(len(p1) + starts_with_partner(p1, p1), SHORT_MAX)
        return min(
            starts_with_partner(p1, p2) + starts_with_partner(p2, p1), SHORT_MAX
        )
    return _count_unordered_scan(position_lists, window)


def _count_unordered_scan(position_lists: list[np.ndarray], window: int) -> int:
    """Reference scan loop (exact reference semantics, any reader count)."""
    n_readers = len(position_lists)
    positions, ids = _merge_streams(position_lists)
    matches = 0
    n = len(positions)
    for i in range(n):
        matched = {int(ids[i])}
        start = int(positions[i])
        for j in range(i + 1, n):
            if int(positions[j]) - start + 1 > window:
                break
            matched.add(int(ids[j]))
            if len(matched) == n_readers:
                matches += 1
                break
    return min(matches, SHORT_MAX)


# ---------------------------------------------------------------------------
# model spec + clique generation
# ---------------------------------------------------------------------------


@dataclass
class FeatureSpec:
    kind: str  # "term" | "od" | "uw"
    weight: float
    width: int = 1  # od: gap size; uw: window = len(terms) * width
    scorer: str = "bm25"
    params: dict = field(default_factory=dict)


@dataclass
class MrfModel:
    """SD/FD model: features applied to the query's clique sets."""

    dependence: str = "sd"  # "sd" | "fd"
    features: list[FeatureSpec] = field(
        default_factory=lambda: [
            FeatureSpec("term", 0.82),
            FeatureSpec("od", 0.09, width=1),
            FeatureSpec("uw", 0.09, width=4),
        ]
    )
    k: int = 10


def _subsets_fd(n: int) -> list[tuple[list[int], bool]]:
    """FD enumeration order: (member indexes, contiguous?) for i=1..2^n-1,
    multi-term subsets only (CliqueFactory.java:112-170)."""
    out = []
    for i in range(1, 2**n):
        members = [j for j in range(n) if (i >> (n - 1 - j)) & 1]
        if len(members) < 2:
            continue
        contiguous = members[-1] - members[0] + 1 == len(members)
        out.append((members, contiguous))
    return out


def build_cliques(tokens: list[str], model: MrfModel) -> list[dict]:
    """Ordered clique list: [{kind, terms, weight, window, scorer, params}]."""
    cliques: list[dict] = []
    for feat in model.features:
        if feat.kind == "term":
            for t in tokens:  # one clique per occurrence — dupes multiply
                cliques.append(
                    {"kind": "term", "terms": (t,), "weight": feat.weight,
                     "window": 0, "scorer": feat.scorer, "params": feat.params}
                )
        elif feat.kind in ("od", "uw"):
            groups: list[list[str]] = []
            if model.dependence == "sd":
                groups = [[a, b] for a, b in zip(tokens, tokens[1:])]
            else:  # fd
                for members, contiguous in _subsets_fd(len(tokens)):
                    if feat.kind == "od" and contiguous:
                        groups.append([tokens[j] for j in members])
                    elif feat.kind == "uw" and not contiguous:
                        groups.append([tokens[j] for j in members])
            for g in groups:
                window = feat.width if feat.kind == "od" else len(g) * feat.width
                cliques.append(
                    {"kind": feat.kind, "terms": tuple(g), "weight": feat.weight,
                     "window": window, "scorer": feat.scorer, "params": feat.params}
                )
        else:
            raise ValueError(feat.kind)
    return cliques


# ---------------------------------------------------------------------------
# shared scoring kernel
# ---------------------------------------------------------------------------


def _clique_score(
    scorer: str, params: dict, tf: int, dl: int, df: int, cf: int,
    n_docs: int, avgdl: float, collection_len: int,
) -> np.float32:
    if tf <= 0 and (scorer != "dirichlet" or cf <= 0):
        # tf-proportional scorers: absent term scores 0. Dirichlet keeps
        # the reference's nonzero doclen-dependent background for absent
        # terms (DirichletScoringFunction.java:30-66); the cf<=0 guard
        # covers degenerate proximity heuristics on tiny corpora (df =
        # N//100 = 0) where the background would be log(0).
        return F32(0.0)
    if scorer == "bm25":
        idf = bm25_idf(n_docs, np.array([df]), mode=params.get("idf", "okapi"))[0]
        tfp = bm25_tf_part(
            np.array([tf]), np.array([dl]), avgdl,
            params.get("k1", 1.2), params.get("b", 0.75),
        )[0]
        return np.float32(idf) * tfp
    if scorer == "dirichlet":
        return dirichlet_score(
            np.array([tf]), np.array([dl]), np.array([cf]), collection_len,
            params.get("mu", 2500.0),
        )[0]
    raise ValueError(scorer)


def score_doc(
    cliques: list[dict],
    doc_terms: dict[str, tuple[int, np.ndarray]],  # term -> (tf, positions)
    dl: int,
    stats: dict[str, tuple[int, int]],  # term -> (df, cf); OOV absent
    n_docs: int,
    avgdl: float,
    collection_len: int,
) -> np.float32:
    """float32 MRF score, accumulated sequentially in clique order."""
    default_df = n_docs // 100
    default_cf = default_df * 2
    acc = F32(0.0)
    for c in cliques:
        if c["kind"] == "term":
            term = c["terms"][0]
            if term not in stats:
                continue  # OOV
            tf = doc_terms.get(term, (0, None))[0]
            df, cf = stats[term]
        else:
            present = [t for t in c["terms"] if t in stats]
            if len(present) < 2:
                continue
            plists = [doc_terms.get(t, (0, np.empty(0, dtype=np.int64)))[1] for t in present]
            if c["kind"] == "od":
                tf = count_ordered_matches(plists, c["window"])
            else:
                tf = count_unordered_matches(plists, c["window"])
            df, cf = default_df, default_cf
        contrib = F32(c["weight"]) * _clique_score(
            c["scorer"], c["params"], tf, dl, df, cf, n_docs, avgdl, collection_len
        )
        acc = F32(acc + contrib)
    return acc


# ---------------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------------


def mrf_topk(
    spark: SparkSession,
    index: Index,
    queries: list[dict],
    model: MrfModel | None = None,
    with_docid: bool = True,
    candidates: dict[str, set[int]] | None = None,
) -> DataFrame:
    """Exact SD/FD retrieval over a positional index: doc-sharded kernel
    (same shard grid as WAND), per-doc clique scoring, global top-k with
    the (score desc, docno desc) tie-break.

    candidates: optional qid -> docno set; when given, only those docs
    are scored (the cascade-ranking reranker contract — an expensive
    stage applied to a cheap stage's survivors,
    ivory/cascade/retrieval/CascadeEval.java)."""
    model = model or MrfModel()
    props = index.properties
    if not props.get("positional"):
        raise ValueError("mrf_topk requires an index built with positional=True")
    n_docs, avgdl, clen = props["n_docs"], props["avgdl"], props["collection_length"]
    n_shards = props["n_shards"]
    k = model.k

    tokenize = get_tokenizer(props.get("tokenizer", "code_v1")).tokenize_py
    all_terms = sorted({t for q in queries for t in tokenize(q["query"])})
    dict_rows = index.dictionary.filter(F.col("term").isin(all_terms)).collect()
    stats = {r["term"]: (r["df"], r["cf"]) for r in dict_rows}
    term_by_id = {r["termid"]: r["term"] for r in dict_rows}
    termids = sorted(term_by_id)

    q_cliques = {
        q["qid"]: build_cliques(tokenize(q["query"]), model) for q in queries
    }
    q_terms = {
        q["qid"]: sorted(set(tokenize(q["query"])) & set(stats)) for q in queries
    }

    if not termids:
        schema = "qid string, rank int, docno long, score float"
        if with_docid:
            schema = "qid string, rank int, docno long, docid string, score float"
        return spark.createDataFrame([], schema)

    runs = index.postings.filter(F.col("termid").isin(termids)).select(
        "termid", "n", "first_docno", "last_docno", "blob", "pos_blob"
    )
    qrows = [
        (q["qid"], int(tid))
        for q in queries
        for tid in termids
        if term_by_id[tid] in q_terms[q["qid"]]
    ]
    qdf = spark.createDataFrame(qrows, "qid string, termid long")
    runs = runs.join(F.broadcast(qdf), "termid")
    shard_of = lambda c: F.floor(c * F.lit(n_shards) / F.lit(n_docs + 1)).cast("int")
    runs = runs.withColumn(
        "shard",
        F.explode(F.sequence(shard_of(F.col("first_docno")), shard_of(F.col("last_docno")))),
    )

    def shard_bounds(s: int) -> tuple[int, int]:
        lo = -((-s * (n_docs + 1)) // n_shards)
        hi = -((-(s + 1) * (n_docs + 1)) // n_shards) - 1
        return max(lo, 1), min(hi, n_docs)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qid, shard = key
        lo, hi = shard_bounds(int(shard))
        cliques = q_cliques[qid]
        docs: dict[int, dict[str, tuple[int, np.ndarray]]] = {}
        dls: dict[int, int] = {}
        for row in pdf.itertuples(index=False):
            term = term_by_id[int(row.termid)]
            docnos, tfs, dl_arr = codec.decode_run(bytes(row.blob))
            plists = codec.decode_positions(
                bytes(row.pos_blob) if row.pos_blob is not None else b"", tfs
            )
            d64 = docnos.astype(np.int64)
            mask = (d64 >= lo) & (d64 <= hi)
            for i in np.nonzero(mask)[0]:
                dn = int(d64[i])
                docs.setdefault(dn, {})[term] = (int(tfs[i]), plists[i])
                dls[dn] = int(dl_arr[i])
        cand_set = candidates.get(qid) if candidates is not None else None
        rows = []
        for dn, dterms in docs.items():
            if cand_set is not None and dn not in cand_set:
                continue
            s = score_doc(cliques, dterms, dls[dn], stats, n_docs, avgdl, clen)
            rows.append((qid, dn, float(s)))
        out = pd.DataFrame(rows, columns=["qid", "docno", "score"])
        if len(out) > k:  # local top-k before the global merge
            out = out.sort_values(["score", "docno"], ascending=False).head(k)
        return out

    local = runs.groupBy("qid", "shard").applyInPandas(
        kernel, schema="qid string, docno long, score float"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.desc("docno"))
    topk = local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    if with_docid:
        topk = topk.join(index.docid_expr(), "docno")
    cols = ["qid", "rank", "docno"] + (["docid"] if with_docid else []) + ["score"]
    return topk.select(*cols).orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# oracle path (golden reference)
# ---------------------------------------------------------------------------


def oracle_mrf_topk(
    oracle_index, queries: list[dict], model: MrfModel | None = None,
    candidates: dict[str, set[int]] | None = None,
) -> dict[str, list[dict]]:
    """Same semantics over the single-node oracle index (which keeps full
    term->positions maps per doc)."""
    model = model or MrfModel()
    oi = oracle_index
    stats = {t: (df, cf) for t, (tid, df, cf) in oi.dictionary.items()}
    out: dict[str, list[dict]] = {}
    for q in queries:
        tokens = get_tokenizer(getattr(oi, "tokenizer", "code_v1")).tokenize_py(q["query"])
        cliques = build_cliques(tokens, model)
        qterms = [t for t in sorted(set(tokens)) if t in stats]
        cand: set[int] = set()
        for t in qterms:
            cand.update(d for d, _ in oi.postings[t])
        if candidates is not None:
            cand &= candidates.get(q["qid"], set())
        scored = []
        for dn in cand:
            dterms = {
                t: (len(oi.positions[t][dn]), np.asarray(oi.positions[t][dn]))
                for t in qterms
                if dn in oi.positions[t]
            }
            s = score_doc(
                cliques, dterms, oi.doclens[dn], stats,
                oi.n_docs, oi.avgdl, oi.collection_length,
            )
            scored.append((dn, s))
        if not scored:
            out[q["qid"]] = []
            continue
        d = np.array([x[0] for x in scored], dtype=np.int64)
        s = np.array([x[1] for x in scored], dtype=np.float32)
        sel = np.lexsort((-d, -s.astype(np.float64)))[: model.k]
        out[q["qid"]] = [
            {"docno": int(d[i]), "docid": oi.docids[int(d[i])], "score": s[i]} for i in sel
        ]
    return out
