"""Batch query running: Ivory-format query sources and the TREC run sink.

Reference behavior reproduced:
- query XML source: <parameters><query id="601">text</query>...</parameters>
  (data/trec/queries.robust04.xml; parsed at
  ivory/smrf/retrieval/BatchQueryRunner.java:283-306);
- model XML: <model id=...> selects scoring function + params
  (BatchQueryRunner.java:330+, run.robust04.basic.xml) — here a small
  dataclass, since our models are bag-of-words scoring-function choices;
- TREC run sink: lines "qid Q0 docid rank score tag"
  (BatchQueryRunner.java:214-240, core/util/ResultWriter.java), with
  ranks 1-based in score order.
"""

from __future__ import annotations

import gzip
import json
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


def parse_query_xml(path_or_text: str) -> list[dict]:
    """Parse Ivory's <parameters><query id=...>text</query> format."""
    text = path_or_text
    if not path_or_text.lstrip().startswith("<"):
        with open(path_or_text) as f:
            text = f.read()
    root = ET.fromstring(text)
    out = []
    for q in root.iter("query"):
        out.append({"qid": q.attrib["id"], "query": (q.text or "").strip()})
    return out


def parse_query_jsonl(path: str) -> list[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                d = json.loads(line)
                out.append({"qid": str(d["qid"]), "query": d["query"]})
    return out


@dataclass
class Model:
    """Bag-of-words retrieval model spec (the MVP subset of Ivory's
    <model> XML: scoring function + its parameters)."""

    scorer: str = "bm25"  # bm25 | dirichlet | jm | tfidf | f2exp
    params: dict = field(default_factory=dict)
    k: int = 10


# scoreFunction class suffix -> (scorer name, [(attr, default)]); defaults
# mirror the reference scoring functions' XML defaults
# (DirichletScoringFunction.java:37 mu=2500, BM25ScoringFunction.java:40-42
# k1=1.2 b=0.75 idf=okapi, JelinekMercerScoringFunction.java:39 lambda=0.7).
_SCORE_FUNCTIONS = {
    "DirichletScoringFunction": ("dirichlet", [("mu", 2500.0)]),
    "BM25ScoringFunction": ("bm25", [("k1", 1.2), ("b", 0.75), ("idf", "okapi")]),
    "JelinekMercerScoringFunction": ("jm", [("lambda", 0.7)]),
    "TFIDFScoringFunction": ("tfidf", []),
    "F2EXPScoringFunction": ("f2exp", [("s", 0.5)]),
}


def _parse_feature(node):
    """One <feature> -> FeatureSpec, mirroring FeatureBasedMRFBuilder.java:
    61-140: the cliqueSet picks the term groups, the expression generator
    picks od/uw and the window width, the scoreFunction picks scorer +
    params (run.robust04.basic.xml is the canonical instance)."""
    from ivory_spark.query.mrf import FeatureSpec

    a = dict(node.attrib)
    weight = float(a.get("weight", "1.0"))
    cs = a.get("cliqueSet", "TermCliqueSet").rsplit(".", 1)[-1]
    gen = a.get("generator", "TermExpressionGenerator").rsplit(".", 1)[-1]
    sf = a.get("scoreFunction", "BM25ScoringFunction").rsplit(".", 1)[-1]
    if sf not in _SCORE_FUNCTIONS:
        raise ValueError(f"unsupported scoreFunction: {sf}")
    scorer, param_spec = _SCORE_FUNCTIONS[sf]
    params = {}
    for name, default in param_spec:
        raw = a.get(name)
        if raw is None:
            params[name] = default
        else:
            params[name] = raw if isinstance(default, str) else float(raw)
    if cs == "TermCliqueSet":
        return FeatureSpec(
            "term", weight, scorer=scorer, params=params, name=a.get("id", ""),
            importance=a.get("importance", ""),
        )
    kind = "od" if gen == "OrderedWindowExpressionGenerator" else "uw"
    width = int(a.get("width", "1" if kind == "od" else "4"))
    dependence = a.get("dependence", "sequential")
    if dependence == "sequential":
        cliques = "sequential"
    elif cs == "OrderedCliqueSet":
        cliques = "full_contiguous"  # CliqueFactory ordered=true path
    else:
        cliques = "full_noncontiguous"  # UnorderedCliqueSet full
    return FeatureSpec(
        kind, weight, width=width, scorer=scorer, params=params, cliques=cliques,
        name=a.get("id", ""), importance=a.get("importance", ""),
    )


def parse_model_xml(path_or_text: str, model_id: str | None = None):
    """Parse an Ivory <model> spec. Returns:

    - Model (bag-of-words scorer + params) for the attribute-only form
      <model score="bm25" k1=".."/> or a type="Feature" model whose only
      feature is a weight-1.0 TermCliqueSet (full-independence — routed to
      the faster bag-of-words paths, same scores);
    - MrfModel for type="Feature" models with proximity features
      (SD/FD run files like run.robust04.basic.xml), each <feature>
      mapped by _parse_feature.

    model_id selects among multiple <model> nodes (BatchQueryRunner.java
    runs every model in the file; callers here pick one); default = first."""
    text = path_or_text
    if not path_or_text.lstrip().startswith("<"):
        with open(path_or_text) as f:
            text = f.read()
    root = ET.fromstring(text)
    if root.tag == "model":
        node = root
    else:
        nodes = list(root.iter("model"))
        if model_id is not None:
            nodes = [n for n in nodes if n.attrib.get("id") == model_id]
            if not nodes:
                raise KeyError(f"model id {model_id!r} not found")
        node = nodes[0]
    features = [c for c in node if c.tag == "feature"]
    if features:
        from ivory_spark.query.importance import parse_importance_models
        from ivory_spark.query.mrf import MrfModel

        specs = [_parse_feature(f) for f in features]
        k = int(node.attrib.get("hits", node.attrib.get("k", "10")))
        # importance models live as <importancemodel> elements beside or
        # inside the <model> (RetrievalEnvironment.addImportanceModel;
        # WSD run files reference them via feature importance="id")
        imodels = parse_importance_models(root)
        missing = sorted(
            {s.importance for s in specs if s.importance} - set(imodels)
        )
        if missing:
            raise ValueError(f"importance model(s) not found: {missing}")
        if (
            len(specs) == 1 and specs[0].kind == "term"
            and specs[0].weight == 1.0 and not specs[0].importance
        ):
            # full independence — bag-of-words semantics, faster path
            # (all five scoring functions supported there)
            return Model(scorer=specs[0].scorer, params=specs[0].params, k=k)
        # multi-feature models run through the MRF clique kernels, which
        # implement bm25 and dirichlet potentials — fail at parse time,
        # not as an opaque worker exception at collect time
        bad = sorted({f.scorer for f in specs} - {"bm25", "dirichlet"})
        if bad:
            raise ValueError(
                f"scoreFunction(s) {bad} not supported in feature-based "
                "(MRF) models; supported: BM25ScoringFunction, "
                "DirichletScoringFunction"
            )
        return MrfModel(
            dependence="sd", features=specs, k=k,
            importance_models=imodels,
            normalize_importance=node.attrib.get("normalizeImportance", "false")
            in ("true", "1"),
            pruning_threshold_bigram=float(
                node.attrib.get("pruningThresholdBigram", "0.0")
            ),
        )
    attrs = dict(node.attrib)
    scorer = attrs.pop("score", attrs.pop("scorer", "bm25"))
    k = int(attrs.pop("hits", attrs.pop("k", "10")))
    attrs.pop("id", None)

    def _coerce(v: str):
        try:
            return float(v)
        except ValueError:
            return v  # string params, e.g. idf="classic"

    params = {a: _coerce(v) for a, v in attrs.items()}
    return Model(scorer=scorer, params=params, k=k)


def write_trec_lines(
    rows, path: str, tag: str = "ivory_spark"
) -> int:
    """Single owner of the TREC run format: rows are dict-like (dict or
    pyspark Row) with qid/rank/docid/score keys; .gz suffix → gzip.
    Returns line count."""
    opener = gzip.open if path.endswith(".gz") else open
    n = 0
    with opener(path, "wt") as f:
        for r in rows:
            f.write(f"{r['qid']} Q0 {r['docid']} {r['rank']} {r['score']:.6f} {tag}\n")
            n += 1
    return n


def write_trec_run(results: DataFrame, path: str, tag: str = "ivory_spark") -> int:
    """DataFrame wrapper over write_trec_lines.

    Collects to the driver — TREC runs are k·|queries| rows by
    construction, never data-scale."""
    rows = results.select("qid", "rank", "docid", "score").orderBy("qid", "rank").collect()
    return write_trec_lines(rows, path, tag)


def run_batch(
    spark: SparkSession,
    index,
    queries: list[dict],
    model=None,  # Model | MrfModel | None
    use_wand: bool = True,
) -> DataFrame:
    """End-to-end batch retrieval with a model spec (RunQueryLocal
    analogue). Only bm25 has the WAND fast path; other scorers use the
    exact relational plan; MrfModel specs (SD/FD run files) route to the
    positional MRF kernel."""
    model = model or Model()
    from ivory_spark.query.mrf import MrfModel, mrf_topk

    if isinstance(model, MrfModel):
        return mrf_topk(spark, index, queries, model=model)
    if model.scorer == "bm25":
        props = index.properties
        overridden = any(
            model.params.get(key) is not None
            and model.params[key] != props[prop]
            for key, prop in (("k1", "k1"), ("b", "b"), ("idf", "idf_mode"))
            if key in model.params
        )
        if use_wand and not overridden and not props.get("bounds_stale"):
            from ivory_spark.query.wand import bm25_topk_wand

            return bm25_topk_wand(spark, index, queries, k=model.k)
        # model-XML k1/b/idf overrides: the stored block-max bounds are
        # k1/b-specific, so overridden runs use the exact path
        from ivory_spark.query.exact import bm25_topk

        return bm25_topk(spark, index, queries, k=model.k, params=model.params)
    # dirichlet / jm / tfidf / f2exp: the generalized exact path.
    # (Dirichlet/JM scores are negative so MaxScore bounds don't prune —
    # no WAND variant; mirrors DirichletScoringFunction.java:30-66 etc.)
    from ivory_spark.query.exact import scored_topk

    return scored_topk(
        spark, index, queries, scorer=model.scorer, params=model.params, k=model.k
    )
