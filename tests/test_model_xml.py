"""Model-XML → SD/FD feature wiring: <feature> children (cliqueSet /
generator / scoreFunction / weight) parse into MrfModel/FeatureSpec
mirroring the reference's FeatureBasedMRFBuilder.java:61-140 over run
files shaped like data/trec/run.robust04.basic.xml, and a parsed run
file retrieves bit-identically to the equivalent programmatic model."""

import numpy as np
import pytest

from ivory_spark.index.build import IndexConfig, build_index
from ivory_spark.index.reader import open_index
from ivory_spark.query.batch import Model, parse_model_xml, run_batch
from ivory_spark.query.mrf import FeatureSpec, MrfModel, build_cliques, mrf_topk

SD_DIR_XML = """
<parameters>
  <model id="dir-sd" type="Feature" hits="10">
    <feature id="termWt" weight="0.82"
             cliqueSet="ivory.smrf.model.builder.TermCliqueSet"
             potential="ivory.smrf.model.potential.QueryPotential"
             generator="ivory.smrf.model.builder.TermExpressionGenerator"
             scoreFunction="ivory.smrf.model.score.DirichletScoringFunction" mu="1000.0" />
    <feature id="orderedWt" weight="0.09"
             cliqueSet="ivory.smrf.model.builder.OrderedCliqueSet" dependence="sequential"
             potential="ivory.smrf.model.potential.QueryPotential"
             generator="ivory.smrf.model.builder.OrderedWindowExpressionGenerator" width="1"
             scoreFunction="ivory.smrf.model.score.DirichletScoringFunction" mu="750.0" />
    <feature id="unorderedWt" weight="0.09"
             cliqueSet="ivory.smrf.model.builder.OrderedCliqueSet" dependence="sequential"
             potential="ivory.smrf.model.potential.QueryPotential"
             generator="ivory.smrf.model.builder.UnorderedWindowExpressionGenerator" width="4"
             scoreFunction="ivory.smrf.model.score.DirichletScoringFunction" mu="750.0" />
  </model>
  <model id="dir-fd" type="Feature" hits="10">
    <feature id="termWt" weight="0.82"
             cliqueSet="ivory.smrf.model.builder.TermCliqueSet"
             potential="ivory.smrf.model.potential.QueryPotential"
             generator="ivory.smrf.model.builder.TermExpressionGenerator"
             scoreFunction="ivory.smrf.model.score.DirichletScoringFunction" mu="1000.0" />
    <feature id="orderedWt" weight="0.09"
             cliqueSet="ivory.smrf.model.builder.OrderedCliqueSet" dependence="full"
             potential="ivory.smrf.model.potential.QueryPotential"
             generator="ivory.smrf.model.builder.OrderedWindowExpressionGenerator" width="1"
             scoreFunction="ivory.smrf.model.score.DirichletScoringFunction" mu="750.0" />
    <feature id="unorderedWt" weight="0.09"
             cliqueSet="ivory.smrf.model.builder.OrderedCliqueSet" dependence="full"
             potential="ivory.smrf.model.potential.QueryPotential"
             generator="ivory.smrf.model.builder.UnorderedWindowExpressionGenerator" width="4"
             scoreFunction="ivory.smrf.model.score.DirichletScoringFunction" mu="750.0" />
    <feature id="unorderedWt" weight="0.09"
             cliqueSet="ivory.smrf.model.builder.UnorderedCliqueSet" dependence="full"
             potential="ivory.smrf.model.potential.QueryPotential"
             generator="ivory.smrf.model.builder.UnorderedWindowExpressionGenerator" width="4"
             scoreFunction="ivory.smrf.model.score.DirichletScoringFunction" mu="750.0" />
  </model>
  <model id="fi-term" type="Feature" hits="25">
    <feature id="term" weight="1.0"
             cliqueSet="ivory.smrf.model.builder.TermCliqueSet"
             potential="ivory.smrf.model.potential.QueryPotential"
             generator="ivory.smrf.model.builder.TermExpressionGenerator"
             scoreFunction="ivory.smrf.model.score.BM25ScoringFunction" k1="0.5" b="0.3" />
  </model>
</parameters>
"""


def _sd_programmatic() -> MrfModel:
    return MrfModel(
        dependence="sd",
        features=[
            FeatureSpec("term", 0.82, scorer="dirichlet", params={"mu": 1000.0}),
            FeatureSpec("od", 0.09, width=1, scorer="dirichlet",
                        params={"mu": 750.0}, cliques="sequential"),
            FeatureSpec("uw", 0.09, width=4, scorer="dirichlet",
                        params={"mu": 750.0}, cliques="sequential"),
        ],
        k=10,
    )


def test_parse_sd_model():
    m = parse_model_xml(SD_DIR_XML, model_id="dir-sd")
    assert isinstance(m, MrfModel)
    assert m.k == 10
    kinds = [(f.kind, f.cliques, f.width, f.scorer, f.params["mu"]) for f in m.features]
    assert kinds == [
        ("term", "auto", 1, "dirichlet", 1000.0),
        ("od", "sequential", 1, "dirichlet", 750.0),
        ("uw", "sequential", 4, "dirichlet", 750.0),
    ]


def test_parse_fd_model_clique_selection():
    """The reference FD model carries uw over BOTH contiguous subsets
    (OrderedCliqueSet full + unordered generator) and non-contiguous ones
    (UnorderedCliqueSet full) — CliqueFactory.java:112-170."""
    m = parse_model_xml(SD_DIR_XML, model_id="dir-fd")
    sel = [(f.kind, f.cliques) for f in m.features]
    assert sel == [
        ("term", "auto"),
        ("od", "full_contiguous"),
        ("uw", "full_contiguous"),
        ("uw", "full_noncontiguous"),
    ]
    cl = build_cliques(["a", "b", "c"], m)
    ods = [c["terms"] for c in cl if c["kind"] == "od"]
    uws = [c["terms"] for c in cl if c["kind"] == "uw"]
    # reference enumeration order: subsets by ascending bitmask i
    # (CliqueFactory.java:112) — (b,c)=011, (a,b)=110, (a,b,c)=111
    assert ods == [("b", "c"), ("a", "b"), ("a", "b", "c")]
    # uw covers contiguous subsets (feature 3) AND non-contiguous (feature 4)
    assert uws == [("b", "c"), ("a", "b"), ("a", "b", "c"), ("a", "c")]
    # uw window = |terms| * width (UnorderedWindowExpressionGenerator.java:41)
    w = {c["terms"]: c["window"] for c in cl if c["kind"] == "uw"}
    assert w[("a", "c")] == 8 and w[("a", "b", "c")] == 12


def test_parse_fi_term_model_routes_to_bag_of_words():
    m = parse_model_xml(SD_DIR_XML, model_id="fi-term")
    assert isinstance(m, Model)
    assert m.scorer == "bm25" and m.k == 25
    assert m.params["k1"] == 0.5 and m.params["b"] == 0.3 and m.params["idf"] == "okapi"


def test_model_id_missing():
    with pytest.raises(KeyError):
        parse_model_xml(SD_DIR_XML, model_id="nope")


@pytest.fixture(scope="module")
def pos_index(spark, tiny_corpus_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx") / "pos_xml")
    build_index(
        spark, tiny_corpus_path, root,
        IndexConfig(positional=True, salt_threshold=16, n_shards=5),
    )
    return open_index(spark, root)


def _rows(df):
    return [(r["qid"], r["docno"], np.float32(r["score"]).view(np.uint32).item())
            for r in df.collect()]


def test_xml_roundtrip_rank_identity(spark, pos_index):
    """XML → MrfModel → run_batch is bit-identical to the programmatic
    model on both SD and FD run specs."""
    queries = [
        {"qid": "x1", "query": "import class"},
        {"qid": "x2", "query": "public static void"},
    ]
    got = _rows(run_batch(spark, pos_index, queries,
                          parse_model_xml(SD_DIR_XML, model_id="dir-sd")))
    want = _rows(mrf_topk(spark, pos_index, queries, _sd_programmatic()))
    assert got == want and len(got) > 0

    fd = parse_model_xml(SD_DIR_XML, model_id="dir-fd")
    got_fd = _rows(run_batch(spark, pos_index, queries, fd))
    want_fd = _rows(mrf_topk(spark, pos_index, queries, fd))
    assert got_fd == want_fd and len(got_fd) > 0


def test_unsupported_feature_scorer_fails_at_parse():
    """jm/tfidf/f2exp in a MULTI-feature model must fail at parse time
    (the MRF clique kernels implement bm25+dirichlet), not as an opaque
    worker exception at collect time; the single-term full-independence
    form still supports all five via the bag-of-words path."""
    bad = SD_DIR_XML.replace(
        'scoreFunction="ivory.smrf.model.score.DirichletScoringFunction" mu="1000.0"',
        'scoreFunction="ivory.smrf.model.score.JelinekMercerScoringFunction"',
    )
    with pytest.raises(ValueError, match="not supported in feature-based"):
        parse_model_xml(bad, model_id="dir-sd")
    m = parse_model_xml(
        '<model type="Feature" hits="7"><feature id="t" weight="1.0"'
        ' cliqueSet="TermCliqueSet" potential="p" generator="TermExpressionGenerator"'
        ' scoreFunction="ivory.smrf.model.score.JelinekMercerScoringFunction"/></model>'
    )
    assert isinstance(m, Model) and m.scorer == "jm" and m.params["lambda"] == 0.7
