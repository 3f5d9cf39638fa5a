"""Weighted Sequential Dependence (concept-importance models):
LinearImportanceModel float32 semantics, build_cliques weight
combination / pruning / normalization, XML parsing, and engine-vs-
oracle rank identity under query-dependent clique weights."""

import numpy as np
import pytest

from ivory_spark.index.build import IndexConfig, build_index
from ivory_spark.index.reader import open_index
from ivory_spark.oracle import build_oracle_index
from ivory_spark.query.batch import parse_model_xml
from ivory_spark.query.importance import (
    LinearImportanceModel,
    MetaFeature,
    read_data_stats,
)
from ivory_spark.query.mrf import FeatureSpec, MrfModel, build_cliques

F32 = np.float32


def make_model(values_a, values_b=None, default_a=0.0):
    mfs = [MetaFeature("cf", 0.6, values_a, default_a)]
    if values_b is not None:
        mfs.append(MetaFeature("df", 0.2, values_b, 0.1))
    return LinearImportanceModel(mfs)


def test_metafeature_weight_normalization_f32():
    m = make_model({"x": 1.0}, {"x": 2.0})
    # weights 0.6, 0.2 normalize to 0.75, 0.25 (float32 division)
    assert [mf.weight for mf in m.metafeatures] == [
        float(F32(0.6) / F32(0.8)), float(F32(0.2) / F32(0.8))
    ]
    # concept weight = f32 fold of norm_w * value; absent -> defaults
    want = F32(F32(F32(0.0) + F32(m.metafeatures[0].weight) * F32(1.0))
               + F32(m.metafeatures[1].weight) * F32(2.0))
    assert m.concept_weight("x") == float(want)
    assert m.concept_weight("absent") == pytest.approx(0.25 * 0.1)
    assert m.feature_value("x", "df") == 2.0
    with pytest.raises(KeyError):
        m.feature_value("x", "nope")


def test_read_data_stats(tmp_path):
    p = tmp_path / "stats.tsv"
    p.write_text("merge sort\t0.8\nspark\t0.4\n\n")
    # values materialize at float32 (Float.parseFloat parity)
    assert read_data_stats(str(p)) == {
        "merge sort": float(F32("0.8")), "spark": float(F32("0.4"))
    }


def wsd_model(**kw):
    imodel = make_model(
        {"a": 1.0, "b": 0.5, "a b": 2.0, "b c": 0.05}, default_a=0.2
    )
    return MrfModel(
        dependence="sd",
        features=[
            FeatureSpec("term", 0.8, importance="m1"),
            FeatureSpec("od", 0.1, width=1, importance="m1"),
            FeatureSpec("uw", 0.1, width=4),  # no importance
        ],
        importance_models={"m1": imodel},
        **kw,
    )


def test_build_cliques_combines_weight_and_importance():
    model = wsd_model()
    imodel = model.importance_models["m1"]
    cl = build_cliques(["a", "b"], model)
    by = {(c["kind"], c["terms"]): c for c in cl}
    # term cliques: weight = 0.8 x importance(term), f32
    wa = float(F32(F32(0.8) * F32(imodel.concept_weight("a"))))
    assert by[("term", ("a",))]["weight"] == wa
    assert by[("term", ("a",))]["importance"] == imodel.concept_weight("a")
    # od clique: concept is the space-joined bigram
    wod = float(F32(F32(0.1) * F32(imodel.concept_weight("a b"))))
    assert by[("od", ("a", "b"))]["weight"] == wod
    # uw feature has no importance model: weight untouched
    assert by[("uw", ("a", "b"))]["weight"] == 0.1
    assert "importance" not in by[("uw", ("a", "b"))]


def test_pruning_threshold_drops_weak_bigrams_keeps_terms():
    model = wsd_model(pruning_threshold_bigram=0.1)
    cl = build_cliques(["b", "c"], model)
    kinds = [(c["kind"], c["terms"]) for c in cl]
    # od("b c") importance ~ 0.75*0.05 + 0.25*0.1 = 0.0625 < 0.1 -> pruned
    assert ("od", ("b", "c")) not in kinds
    # term "c" (absent -> default importance 0.175) stays: terms never prune
    assert ("term", ("c",)) in kinds
    # uw feature has no importance: judged by its weight 0.1 >= 0.1 -> kept
    assert ("uw", ("b", "c")) in kinds


def test_normalize_importance_uses_pre_pruning_total():
    model = wsd_model(normalize_importance=True)
    imodel = model.importance_models["m1"]
    cl = build_cliques(["a", "b"], model)
    raw = [
        imodel.concept_weight("a"), imodel.concept_weight("b"),
        imodel.concept_weight("a b"),
    ]
    total = F32(0.0)
    for r in raw:
        total = F32(total + F32(r))
    by = {(c["kind"], c["terms"]): c for c in cl}
    want = float(F32(F32(raw[0]) / total))
    assert by[("term", ("a",))]["importance"] == want
    assert by[("term", ("a",))]["weight"] == float(F32(F32(0.8) * F32(want)))


def test_missing_importance_model_raises():
    model = MrfModel(features=[FeatureSpec("term", 1.0, importance="nope")])
    with pytest.raises(ValueError, match="not found"):
        build_cliques(["a"], model)


def test_parse_wsd_model_xml(tmp_path):
    stats = tmp_path / "cf.tsv"
    stats.write_text("merge\t0.9\nmerge sort\t1.5\n")
    xml = f"""
    <parameters>
      <importancemodel id="wsd1">
        <feature id="cf" weight="0.7" file="{stats}" default="0.3"/>
        <feature id="flat" weight="0.3" default="1.0"/>
      </importancemodel>
      <model id="wsd" type="Feature" hits="10" normalizeImportance="true"
             pruningThresholdBigram="0.01">
        <feature id="termWt" weight="0.82" cliqueSet="TermCliqueSet"
                 scoreFunction="BM25ScoringFunction" importance="wsd1"/>
        <feature id="orderedWt" weight="0.09" cliqueSet="OrderedCliqueSet"
                 generator="OrderedWindowExpressionGenerator" width="1"
                 dependence="sequential" scoreFunction="BM25ScoringFunction"
                 importance="wsd1"/>
      </model>
    </parameters>"""
    m = parse_model_xml(xml)
    assert isinstance(m, MrfModel)
    assert m.normalize_importance and m.pruning_threshold_bigram == 0.01
    assert set(m.importance_models) == {"wsd1"}
    im = m.importance_models["wsd1"]
    assert im.feature_value("merge sort", "cf") == 1.5
    assert im.feature_value("zzz", "flat") == 1.0  # default
    assert m.features[0].importance == "wsd1"
    # a 1-term weight-1.0 feature WITH importance must NOT shortcut to
    # the bag-of-words path (weights become query-dependent)
    xml2 = f"""
    <parameters>
      <importancemodel id="i"><feature id="f" weight="1" default="0.5"/></importancemodel>
      <model id="m" type="Feature">
        <feature id="t" weight="1.0" cliqueSet="TermCliqueSet"
                 scoreFunction="BM25ScoringFunction" importance="i"/>
      </model>
    </parameters>"""
    assert isinstance(parse_model_xml(xml2), MrfModel)
    with pytest.raises(ValueError, match="not found"):
        parse_model_xml("""
        <model type="Feature">
          <feature id="t" cliqueSet="TermCliqueSet"
                   scoreFunction="BM25ScoringFunction" importance="ghost"/>
        </model>""")


@pytest.fixture(scope="module")
def wpos_index(spark, tiny_corpus_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wsdidx") / "pos")
    build_index(
        spark, tiny_corpus_path, root,
        IndexConfig(positional=True, salt_threshold=16, n_shards=5),
    )
    return open_index(spark, root)


def test_wsd_rank_identity(spark, wpos_index, tiny_corpus):
    """Engine vs numpy oracle under query-dependent clique weights,
    normalization and pruning all active — and the WSD ranking must
    actually differ from uniform SD (the weights bite)."""
    from ivory_spark.query.mrf import mrf_topk, oracle_mrf_topk

    oi = build_oracle_index(tiny_corpus.drop(columns=["sha256"]))
    imodel = LinearImportanceModel([
        MetaFeature("cf", 0.7, {"import": 1.6, "class": 0.2,
                                "import class": 2.5, "public static": 0.01},
                    0.4),
        MetaFeature("len", 0.3, {}, 0.8),
    ])
    model = MrfModel(
        dependence="sd",
        features=[
            FeatureSpec("term", 0.8, importance="m"),
            FeatureSpec("od", 0.1, width=1, importance="m"),
            FeatureSpec("uw", 0.1, width=4),
        ],
        importance_models={"m": imodel},
        normalize_importance=True,
        pruning_threshold_bigram=0.05,
        k=10,
    )
    qs = [
        {"qid": "w1", "query": "import class"},
        {"qid": "w2", "query": "public static void"},
    ]
    golden = oracle_mrf_topk(oi, qs, model)
    res = mrf_topk(spark, wpos_index, qs, model)
    got = {}
    for r in res.collect():
        got.setdefault(r["qid"], []).append(r)
    assert any(golden[q["qid"]] for q in qs)
    for qid, want in golden.items():
        have = got.get(qid, [])
        assert [h["docno"] for h in have] == [w["docno"] for w in want], qid
        hb = np.array([h["score"] for h in have], dtype=np.float32).view(np.uint32)
        wb = np.array([w["score"] for w in want], dtype=np.float32).view(np.uint32)
        assert np.array_equal(hb, wb), qid
    # WSD differs from uniform SD on at least one query's scores
    uni = oracle_mrf_topk(oi, qs, MrfModel(dependence="sd"))
    assert any(
        [r["score"] for r in golden[q]] != [r["score"] for r in uni[q]]
        for q in golden
    )


def test_wsd_feature_extraction_metafeature_columns(spark, wpos_index, tiny_corpus):
    """ExtractFeatures' importance-weighted columns: for specs naming an
    importance model, one extra column per metafeature holding the
    float32 fold of metafeature-value x clique potential
    (ExtractFeatures.java:186-196) — engine vs oracle twin bit-exact."""
    from ivory_spark.query.features import (
        extract_features,
        feature_columns,
        oracle_extract_features,
    )

    oi = build_oracle_index(tiny_corpus.drop(columns=["sha256"]))
    imodel = LinearImportanceModel([
        MetaFeature("cf", 0.7, {"import": 1.3, "import class": 2.0}, 0.4),
        MetaFeature("len", 0.3, {}, 0.8),
    ])
    models = {
        "w": MrfModel(
            dependence="sd",
            features=[
                FeatureSpec("term", 0.8, name="t", importance="m"),
                FeatureSpec("od", 0.1, width=1, name="o"),
            ],
            importance_models={"m": imodel},
        )
    }
    cols = feature_columns(models)
    # the reference emits metafeature columns for EVERY clique parameter
    # once importance models exist — including the od spec without
    # importance= (ExtractFeatures.java:150-175)
    assert cols == ["w-t", "w-o", "w-cf-t", "w-len-t", "w-cf-o", "w-len-o"]
    qrels = {"q1": {d: float(d % 3) for d in range(1, 40, 3)}}
    qs = [{"qid": "q1", "query": "import class"}]
    df = extract_features(spark, wpos_index, qs, qrels, models)
    golden = oracle_extract_features(oi, qs, qrels, models)
    got = {(r["qid"], r["docno"]): r.asDict() for r in df.collect()}
    want = {(r["qid"], r["docno"]): r for r in golden}
    assert set(got) == set(want) and len(got) > 0
    nontrivial = 0
    for key, w in want.items():
        for nm in cols:
            assert np.float32(got[key][nm]).view(np.uint32) == np.float32(
                w[nm]
            ).view(np.uint32), (key, nm)
        if w["w-cf-t"] not in (0.0,):
            nontrivial += 1
    assert nontrivial > 0  # the metafeature columns carry real values
