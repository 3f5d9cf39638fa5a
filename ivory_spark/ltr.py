"""Greedy feature learning — the analogue of Ivory's ltr package.

Reference semantics reproduced (all driver-side numpy; the distributed
half — per-(query, doc) feature extraction — lives in
ivory_spark/query/features.py):

- Instances: tab-separated feature file with a header row naming the
  ``qid`` / ``docid`` / ``grade`` columns; every other column is a float
  feature (ltr/Instances.java:33-160).
- Measures over a scored instance table, each averaging a per-query
  value over contiguous qid blocks with a STABLE descending-score sort
  (Collections.sort + ScoreComparator, ltr/Measure.java:38-50):
  * MAP — AP normalized by relevant-retrieved (ltr/MAPMeasure.java:68-88);
  * NDCG — gain (2^grade-1)/ln(rank+2) over the full list, normalized by
    the ideal (grade-sorted) DCG (ltr/NDCGMeasure.java:79-105);
  * ERR — g=(2^grade-1)/16, err += g*p/rank, p *= 1-g
    (ltr/ERRMeasure.java:66-81).
  The per-query accumulator is float32 like the reference's ``float err``.
- Derived features: log / product / quotient of base columns
  (ltr/{Log,Product,Quotient}Feature.java), zero-guarded identically.
- Line search: geometric alpha grid, SCALE_FACTOR=0.01 over MAX_STEPS=5
  doublings to maxWeight, positive then negative direction
  (ltr/LineSearch.java:31-101), including the reference's early-exit
  comparison of the candidate measure against the running best ALPHA
  (LineSearch.java:77 ``if (m < bestAlphaMeasure.alpha) break;`` — kept
  verbatim so the search trajectory matches).
- Greedy loop: pick the best (model, feature) pair per iteration, rescale
  the score table by 1/(1+alpha), renormalize model weights to sum 1,
  optionally beam over numModels / expand log-product-quotient features /
  prune Pearson-correlated features, stop when the metric gains less
  than TOLERANCE=1e-4 (ltr/GreedyLearn.java:50-250).
- Rank: applying a learned model = sequential float32 fold of
  weight*feature in model order (ltr/Rank.java:55-60).

Divergences from the reference, both documented:
- constant-feature elimination checks EVERY simple feature; the
  reference's loop bound iterates the model map instead of the pool list
  (GreedyLearn.java:74 ``i < featurePool.size()`` over a 1-entry map) so
  it only ever tested feature 0 — we implement the stated intent.
- models serialize to JSON (feature names + weights), not Java object
  streams.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

import numpy as np

TOLERANCE = 1e-4  # GreedyLearn.java:50
SCALE_FACTOR = 0.01  # LineSearch.java:31
MAX_STEPS = 5  # LineSearch.java:32
MULTIPLIER = (1.0 / SCALE_FACTOR) ** (1.0 / MAX_STEPS)  # LineSearch.java:33

QID_COL = "qid"
DOCID_COL = "docid"
GRADE_COL = "grade"


# ---------------------------------------------------------------------------
# instances
# ---------------------------------------------------------------------------


class Instances:
    """In-memory (qid, docid, grade, float32 feature matrix) table.

    Query grouping follows the reference exactly: CONTIGUOUS runs of the
    same qid form one query block (Instances are read in file order and
    the measures detect qid changes linearly, MAPMeasure.java:40-56)."""

    def __init__(self, qids, docids, grades, features, feature_names):
        self.qids = np.asarray(qids, dtype=object)
        self.docids = np.asarray(docids, dtype=object)
        self.grades = np.asarray(grades, dtype=np.float32)
        self.features = np.asarray(features, dtype=np.float32)
        if self.features.ndim != 2 or len(self.features) != len(self.qids):
            raise ValueError("features must be (n_instances, n_features)")
        self.feature_names = list(feature_names)
        self._blocks = _contiguous_blocks(self.qids)

    @property
    def n(self) -> int:
        return len(self.qids)

    @property
    def blocks(self) -> list[tuple[int, int]]:
        """[(start, end)) contiguous qid runs."""
        return self._blocks

    @classmethod
    def from_tsv(cls, path_or_lines) -> "Instances":
        """Parse the reference feature-file format: header row with qid /
        docid / grade located BY NAME among feature columns
        (Instances.java:60-90)."""
        if isinstance(path_or_lines, str):
            with open(path_or_lines) as f:
                lines = f.read().splitlines()
        else:
            lines = [ln.rstrip("\n") for ln in path_or_lines]
        header = lines[0].split("\t")
        try:
            qid_c, docid_c, grade_c = (
                header.index(QID_COL), header.index(DOCID_COL), header.index(GRADE_COL)
            )
        except ValueError as e:
            raise ValueError(f"feature file header missing qid/docid/grade: {e}")
        feat_cols = [i for i in range(len(header)) if i not in (qid_c, docid_c, grade_c)]
        qids, docids, grades, rows = [], [], [], []
        for ln in lines[1:]:
            if not ln:
                continue
            parts = ln.split("\t")
            if len(parts) != len(header):
                raise ValueError(f"row has {len(parts)} columns, header {len(header)}")
            qids.append(parts[qid_c])
            docids.append(parts[docid_c])
            grades.append(float(parts[grade_c]))
            rows.append([float(parts[i]) for i in feat_cols])
        return cls(qids, docids, grades,
                   np.array(rows, dtype=np.float32).reshape(len(qids), len(feat_cols)),
                   [header[i] for i in feat_cols])

    def to_tsv(self, path: str) -> None:
        """Write the reference layout: qid, docid, then the sorted union of
        feature names + 'grade' (ExtractFeatures.java:143-150 prints the
        TreeSet, which sorts 'grade' in among the features)."""
        names = sorted(self.feature_names + [GRADE_COL])
        with open(path, "w") as f:
            f.write("\t".join([QID_COL, DOCID_COL] + names) + "\n")
            for r in range(self.n):
                vals = {
                    nm: repr(float(self.features[r, i]))
                    for i, nm in enumerate(self.feature_names)
                }
                vals[GRADE_COL] = repr(float(self.grades[r]))
                f.write("\t".join([str(self.qids[r]), str(self.docids[r])]
                                  + [vals[nm] for nm in names]) + "\n")

    def feature_is_constant(self, fvals: np.ndarray) -> bool:
        """True if the feature never varies within any query block
        (GreedyLearn's document-independent elimination — intent, see
        module docstring)."""
        for s, e in self._blocks:
            block = fvals[s:e]
            if len(block) and not np.all(block == block[0]):
                return False
        return True

    def correlation(self, a: np.ndarray, b: np.ndarray) -> float:
        """Pearson correlation, the reference's exact expression
        (Instances.java:200-240)."""
        x = a.astype(np.float64)
        y = b.astype(np.float64)
        n = len(x)
        sa, sb = x.sum(), y.sum()
        ab = float(x @ y)
        aa, bb = float(x @ x), float(y @ y)
        ma, mb = sa / n, sb / n
        maa, mbb = aa / n, bb / n
        denom = (n - 1) * math.sqrt(maa - ma * ma) * math.sqrt(mbb - mb * mb)
        return (ab - mb * sa - ma * sb + ma * mb * n) / denom if denom else float("nan")


def _contiguous_blocks(qids: np.ndarray) -> list[tuple[int, int]]:
    if len(qids) == 0:
        return []
    change = np.nonzero(qids[1:] != qids[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(qids)]))
    return list(zip(starts.tolist(), ends.tolist()))


# ---------------------------------------------------------------------------
# measures
# ---------------------------------------------------------------------------


def _stable_desc_order(scores: np.ndarray) -> np.ndarray:
    """Stable descending-score permutation — ties keep original order,
    matching Collections.sort + ScoreComparator (Measure.java:38-50)."""
    return np.argsort(-scores.astype(np.float64), kind="stable")


def _query_ap(grades: np.ndarray, scores: np.ndarray) -> float:
    """MAPMeasure.computeQueryAP: AP over the judged set, normalized by
    relevant-retrieved (grade != 0)."""
    g = grades[_stable_desc_order(scores)]
    rel = g != 0
    n_rel = int(rel.sum())
    if n_rel == 0:
        return 0.0
    cum = np.cumsum(rel)
    ranks = np.arange(1, len(g) + 1, dtype=np.float64)
    return float((cum[rel] / ranks[rel]).sum() / n_rel)


def _dcg(grades_in_rank_order: np.ndarray) -> float:
    """Σ (2^grade - 1) / ln(rank + 2), rank 0-based — natural log, full
    list, per NDCGMeasure.java:88-101."""
    g = grades_in_rank_order.astype(np.float64)
    ranks = np.arange(len(g), dtype=np.float64)
    return float(((np.power(2.0, g) - 1.0) / np.log(ranks + 2.0)).sum())


def _query_ndcg(grades: np.ndarray, scores: np.ndarray) -> float:
    ideal = _dcg(grades[np.argsort(-grades.astype(np.float64), kind="stable")])
    if ideal == 0.0:
        return 0.0
    return _dcg(grades[_stable_desc_order(scores)]) / ideal


def _query_err(grades: np.ndarray, scores: np.ndarray) -> float:
    """ERRMeasure._computeQueryERR with its float32 accumulators."""
    g = grades[_stable_desc_order(scores)].astype(np.float64)
    gain = (np.power(2.0, g) - 1.0) / 16.0
    err = np.float32(0.0)
    p = np.float32(1.0)
    for i in range(len(gain)):
        err = np.float32(err + gain[i] * float(p) / (i + 1.0))
        p = np.float32(float(p) * (1.0 - gain[i]))
    return float(err)


_QUERY_MEASURES = {"map": _query_ap, "ndcg": _query_ndcg, "err": _query_err}


def evaluate_measure(
    name: str, instances: Instances, scores: np.ndarray
) -> float:
    """Mean per-query measure over contiguous qid blocks, accumulated in
    float32 like the reference's ``float err`` (NDCGMeasure.java:46-75)."""
    fn = _QUERY_MEASURES[name]
    acc = np.float32(0.0)
    n_q = 0
    for s, e in instances.blocks:
        acc = np.float32(acc + fn(instances.grades[s:e], scores[s:e]))
        n_q += 1
    return float(acc) / n_q if n_q else 0.0


MEASURES = tuple(_QUERY_MEASURES)


# ---------------------------------------------------------------------------
# features (simple + derived)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LtrFeature:
    """kind: simple|log|product|quotient over base column index a (and b)."""

    kind: str
    a: int
    b: int = -1
    name: str = ""

    def eval(self, X: np.ndarray) -> np.ndarray:
        """float32 column, guards as in the reference evals."""
        fa = X[:, self.a]
        if self.kind == "simple":
            return fa
        if self.kind == "log":
            out = np.zeros_like(fa)
            pos = fa > 0
            out[pos] = np.log(fa[pos].astype(np.float64)).astype(np.float32)
            return out
        fb = X[:, self.b]
        if self.kind == "product":
            return (fa * fb).astype(np.float32)
        if self.kind == "quotient":
            out = np.zeros_like(fa)
            nz = fb != 0.0
            out[nz] = (fa[nz] / fb[nz]).astype(np.float32)
            return out
        raise ValueError(self.kind)


def _translate(scores: np.ndarray, fvals: np.ndarray, weight: float, scale: float) -> np.ndarray:
    """ScoreTable.translate: newScore = (float)(scale*(score + weight*f))
    (ScoreTable.java:40-46)."""
    return (scale * (scores.astype(np.float64) + weight * fvals.astype(np.float64))).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# line search + greedy learning
# ---------------------------------------------------------------------------


def line_search(
    n_model_features: int,
    max_weight: float,
    fvals: np.ndarray,
    instances: Instances,
    scores: np.ndarray,
    metric: str,
) -> tuple[float, float]:
    """(best_alpha, best_measure) for adding one feature to the current
    score table — LineSearch.lineSearch verbatim, including the
    measure-vs-alpha early exit (see module docstring)."""
    if n_model_features == 0:
        m = evaluate_measure(metric, instances, _translate(scores, fvals, 1.0, 1.0))
        return 1.0, m
    best_alpha, best_measure = 0.0, evaluate_measure(metric, instances, scores)
    for sign in (1.0, -1.0):
        alpha = max_weight * SCALE_FACTOR
        for _ in range(MAX_STEPS):
            m = evaluate_measure(
                metric, instances, _translate(scores, fvals, sign * alpha, 1.0)
            )
            if m < best_alpha:  # LineSearch.java:77 (reference behavior)
                break
            if m > best_measure:
                best_alpha, best_measure = sign * alpha, m
            alpha *= MULTIPLIER
        if sign > 0 and best_alpha != 0.0:
            # positive direction improved -> the reference returns before
            # ever trying the negative grid (LineSearch.java:87-89)
            return best_alpha, best_measure
    return best_alpha, best_measure


@dataclass
class LearnedModel:
    """Ordered (feature, weight) list; weights renormalized to sum 1 after
    every add (Model.java:60-80)."""

    features: list[LtrFeature] = field(default_factory=list)
    weights: list[float] = field(default_factory=list)

    def add_feature(self, feat: LtrFeature, weight: float) -> None:
        if feat in self.features:
            self.weights[self.features.index(feat)] += weight
        else:
            self.features.append(feat)
            self.weights.append(weight)
        total = sum(self.weights)
        self.weights = [w / total for w in self.weights]

    @property
    def max_weight(self) -> float:
        return max(self.weights) if self.weights else 0.0

    def score(self, X: np.ndarray) -> np.ndarray:
        """Rank.java:55-60 — sequential float32 translate fold in model
        order with scale 1."""
        s = np.zeros(len(X), dtype=np.float32)
        for feat, w in zip(self.features, self.weights):
            s = _translate(s, feat.eval(X), w, 1.0)
        return s

    def to_json(self) -> str:
        return json.dumps(
            {
                "features": [
                    {"kind": f.kind, "a": f.a, "b": f.b, "name": f.name}
                    for f in self.features
                ],
                "weights": self.weights,
            }
        )

    @classmethod
    def from_json(cls, text: str) -> "LearnedModel":
        d = json.loads(text)
        return cls(
            [LtrFeature(f["kind"], f["a"], f["b"], f["name"]) for f in d["features"]],
            list(d["weights"]),
        )


def greedy_learn(
    instances: Instances,
    metric: str = "ndcg",
    num_models: int = 1,
    log_features: bool = False,
    product_features: bool = False,
    quotient_features: bool = False,
    prune_correlated: float | None = None,
    max_iters: int = 64,
) -> tuple[LearnedModel, float]:
    """GreedyLearn.train: beam of num_models models, one feature added per
    iteration by line search on `metric`, stop when the best measure gains
    < TOLERANCE. Returns (best model, final measure).

    max_iters is a safety bound absent in the reference (its tolerance
    loop is the only stop)."""
    if metric not in _QUERY_MEASURES:
        raise ValueError(f"unknown metric {metric!r}; have {sorted(_QUERY_MEASURES)}")
    X = instances.features
    base_pool = [
        LtrFeature("simple", i, name=instances.feature_names[i])
        for i in range(X.shape[1])
    ]
    base_pool = [f for f in base_pool if not instances.feature_is_constant(f.eval(X))]
    if not base_pool:
        raise ValueError("every feature is constant within queries")

    # beam state: per model — (model, pool, score table)
    beam = [(LearnedModel(), list(base_pool), np.zeros(instances.n, dtype=np.float32))]
    cur_metric, prev_metric = 0.0, float("-inf")
    iters = 0
    while cur_metric - prev_metric > TOLERANCE and iters < max_iters:
        iters += 1
        # evaluate every (model, feature) pair
        candidates = []  # (measure, alpha, model_idx, feature)
        for mi, (model, pool, scores) in enumerate(beam):
            for feat in pool:
                alpha, m = line_search(
                    len(model.features), model.max_weight, feat.eval(X),
                    instances, scores, metric,
                )
                candidates.append((m, alpha, mi, feat))
        candidates.sort(key=lambda c: -c[0])  # stable: ties keep pool order
        if not candidates:
            break
        new_beam = []
        for m, alpha, mi, feat in candidates[:num_models]:
            model, pool, scores = beam[mi]
            new_model = LearnedModel(list(model.features), list(model.weights))
            new_pool = list(pool)
            # auxiliary features for atomic picks (GreedyLearn.java:150-185)
            if feat.kind == "simple":
                if log_features:
                    new_pool.append(
                        LtrFeature("log", feat.a, name=f"log({feat.name})")
                    )
                if product_features:
                    for g in base_pool:
                        new_pool.append(
                            LtrFeature("product", feat.a, g.a, name=f"{feat.name}*{g.name}")
                        )
                if quotient_features:
                    for g in base_pool:
                        new_pool.append(
                            LtrFeature("quotient", feat.a, g.a, name=f"{feat.name}/{g.name}")
                        )
            if prune_correlated is not None and feat not in new_model.features:
                fv = feat.eval(X)
                new_pool = [
                    g for g in new_pool
                    if g == feat or not (instances.correlation(g.eval(X), fv) > prune_correlated)
                ]
            new_scores = _translate(scores, feat.eval(X), alpha, 1.0 / (1.0 + alpha))
            new_model.add_feature(feat, alpha)
            new_beam.append((new_model, new_pool, new_scores))
        beam = new_beam
        prev_metric = cur_metric
        cur_metric = candidates[0][0]
    return beam[0][0], cur_metric
