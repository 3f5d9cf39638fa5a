"""Concept-importance models — the analogue of ivory/smrf/model/
importance (the Weighted Sequential Dependence machinery).

Reference semantics reproduced:
- LinearImportanceModel (LinearImportanceModel.java:40-110): a set of
  metafeatures, each (id, weight, concept->value stats table, default
  value); metafeature weights are normalized to sum 1 at configure
  time; a concept's importance = sum_i norm_weight_i * value_i(concept)
  accumulated in float32, with the per-metafeature default when the
  concept is absent from its table;
- a clique's importance = the concept weight of its space-joined term
  string (getCliqueWeight -> getConceptWeight(c.getConcept()));
- FeatureBasedMRFBuilder applies it per feature via the
  importance="<model id>" attribute: the clique's effective weight
  becomes parameter weight x importance (Clique.combinedWeight,
  Clique.java:41,113-115), optional normalizeImportance divides every
  importance-carrying clique by their total, and non-term cliques whose
  importance falls below pruningThresholdBigram are dropped
  (FeatureBasedMRFBuilder.java:58-128) — all three implemented in
  mrf.build_cliques;
- stats tables are TSV 'concept\\tvalue' files
  (LinearImportanceModel.readDataStats).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

F32 = np.float32


@dataclass
class MetaFeature:
    name: str
    weight: float  # normalized by the model at construction
    values: dict[str, float] = field(default_factory=dict)
    default: float = 0.0

    def value(self, concept: str) -> float:
        return self.values.get(concept, self.default)


class LinearImportanceModel:
    def __init__(self, metafeatures: list[MetaFeature]):
        if not metafeatures:
            raise ValueError("importance model needs at least one metafeature")
        # float32 everywhere the reference holds float: the weight total
        # accumulates in f32 (LinearImportanceModel.java:51
        # totalMetaFeatureWeight += metaFeatureWeight), and stats-table /
        # default values are Float.parseFloat'd — materialize them at f32
        # so no float64 double-rounding can shift a concept weight
        total = F32(0.0)
        for mf in metafeatures:
            total = F32(total + F32(mf.weight))
        self.metafeatures = [
            MetaFeature(
                mf.name,
                float(F32(mf.weight) / total),
                {k: float(F32(v)) for k, v in mf.values.items()},
                float(F32(mf.default)),
            )
            for mf in metafeatures
        ]

    def concept_weight(self, concept: str) -> float:
        """float32 accumulation, like the reference's float loop
        (LinearImportanceModel.java:64-71)."""
        w = F32(0.0)
        for mf in self.metafeatures:
            w = F32(w + F32(mf.weight) * F32(mf.value(concept)))
        return float(w)

    def clique_weight(self, terms) -> float:
        return self.concept_weight(" ".join(terms))

    def feature_value(self, concept: str, mf_name: str) -> float:
        """computeFeatureValue — used by importance-weighted feature
        extraction columns."""
        for mf in self.metafeatures:
            if mf.name == mf_name:
                return mf.value(concept)
        raise KeyError(mf_name)


def read_data_stats(path: str) -> dict[str, float]:
    """TSV 'concept\\tvalue' (LinearImportanceModel.readDataStats)."""
    out: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            concept, value = line.rstrip("\n").split("\t")[:2]
            out[concept] = float(F32(value))  # Float.parseFloat parity
    return out


def parse_importance_models(root) -> dict[str, LinearImportanceModel]:
    """<importancemodel id="..."> elements with <feature id weight
    [file|inline values] [default]> children -> {id: model}. `root` is
    an xml.etree Element (the <parameters> root or a <model> node)."""
    models: dict[str, LinearImportanceModel] = {}
    for node in root.iter("importancemodel"):
        mid = node.attrib["id"]
        mfs = []
        for feat in node:
            if feat.tag != "feature":
                continue
            a = feat.attrib
            values: dict[str, float] = {}
            if a.get("file"):
                values = read_data_stats(a["file"])
            mfs.append(
                MetaFeature(
                    a["id"], float(a["weight"]), values,
                    float(a.get("default", "0.0")),
                )
            )
        models[mid] = LinearImportanceModel(mfs)
    return models
