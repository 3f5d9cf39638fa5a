"""Positional index + MRF sequential/full dependence retrieval:
window-count kernels against hand-computed goldens, positional codec
round-trip, and Spark-vs-oracle rank identity (float32 bit-exact)."""

import numpy as np
import pytest

from ivory_spark.index import codec
from ivory_spark.index.build import IndexConfig, build_index
from ivory_spark.index.reader import open_index
from ivory_spark.oracle import build_oracle_index
from ivory_spark.query.mrf import (
    MrfModel,
    FeatureSpec,
    build_cliques,
    count_ordered_matches,
    count_unordered_matches,
    mrf_topk,
    oracle_mrf_topk,
)

MRF_QUERIES = [
    {"qid": "m1", "query": "import class"},
    {"qid": "m2", "query": "public static void"},
    {"qid": "m3", "query": "def return"},
    {"qid": "m4", "query": "zlib_handle buffer_overflow"},
    {"qid": "m5", "query": "import"},  # single term → no proximity cliques
]


def A(*xs):
    return np.array(xs, dtype=np.int64)


def test_positions_codec_roundtrip():
    plists = [A(1, 5, 9), A(2), A(3, 4, 5, 6)]
    tfs = A(3, 1, 4)
    blob = codec.encode_positions(np.concatenate(plists), tfs)
    got = codec.decode_positions(blob, tfs)
    for g, w in zip(got, plists):
        assert np.array_equal(g, w)


def test_positions_codec_empty():
    assert codec.decode_positions(b"", A()) == []


def test_ordered_window_adjacent():
    # "a b" adjacent: a@1, b@2 → one match at gap 1
    assert count_ordered_matches([A(1), A(2)], 1) == 1
    # reversed order only → no ordered match
    assert count_ordered_matches([A(2), A(1)], 1) == 0
    # gap 2 with width 1 → no; width 2 → yes
    assert count_ordered_matches([A(1), A(3)], 1) == 0
    assert count_ordered_matches([A(1), A(3)], 2) == 1
    # multiple occurrences: a@1,a@4; b@2,b@5 → 2 adjacent matches
    assert count_ordered_matches([A(1, 4), A(2, 5)], 1) == 2


def test_ordered_window_three_terms():
    # strict order a<b<c adjacent
    assert count_ordered_matches([A(1), A(2), A(3)], 1) == 1
    assert count_ordered_matches([A(1), A(3), A(2)], 1) == 0


def test_unordered_window():
    # both within window of 2 regardless of order
    assert count_unordered_matches([A(1), A(2)], 2) == 1
    assert count_unordered_matches([A(2), A(1)], 2) == 1
    assert count_unordered_matches([A(1), A(4)], 2) == 0
    assert count_unordered_matches([A(1), A(4)], 4) == 1
    # empty list → 0
    assert count_unordered_matches([A(), A(1)], 8) == 0


def test_clique_generation_sd_fd():
    sd = MrfModel(dependence="sd")
    cl = build_cliques(["a", "b", "c"], sd)
    kinds = [(c["kind"], c["terms"]) for c in cl]
    assert kinds == [
        ("term", ("a",)), ("term", ("b",)), ("term", ("c",)),
        ("od", ("a", "b")), ("od", ("b", "c")),
        ("uw", ("a", "b")), ("uw", ("b", "c")),
    ]
    assert cl[3]["window"] == 1 and cl[5]["window"] == 8  # uw: 2 terms * width 4

    fd = MrfModel(dependence="fd")
    clf = build_cliques(["a", "b", "c"], fd)
    od = [c["terms"] for c in clf if c["kind"] == "od"]
    uw = [c["terms"] for c in clf if c["kind"] == "uw"]
    assert od == [("b", "c"), ("a", "b"), ("a", "b", "c")]  # enumeration order
    assert uw == [("a", "c")]  # the only non-contiguous subset of 3


def test_duplicate_token_cliques():
    cl = build_cliques(["def", "def"], MrfModel(dependence="sd"))
    assert [(c["kind"], c["terms"]) for c in cl] == [
        ("term", ("def",)), ("term", ("def",)),
        ("od", ("def", "def")), ("uw", ("def", "def")),
    ]


@pytest.fixture(scope="module")
def pos_index(spark, tiny_corpus_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx") / "pos")
    build_index(
        spark, tiny_corpus_path, root,
        IndexConfig(positional=True, salt_threshold=16, n_shards=5),
    )
    return open_index(spark, root)


@pytest.fixture(scope="module")
def pos_oracle(tiny_corpus):
    return build_oracle_index(tiny_corpus.drop(columns=["sha256"]))


def _assert_match(res_df, golden):
    got = {}
    for r in res_df.collect():
        got.setdefault(r["qid"], []).append(r)
    for qid, want in golden.items():
        have = got.get(qid, [])
        assert [h["docno"] for h in have] == [w["docno"] for w in want], qid
        hb = np.array([h["score"] for h in have], dtype=np.float32).view(np.uint32)
        wb = np.array([w["score"] for w in want], dtype=np.float32).view(np.uint32)
        assert np.array_equal(hb, wb), qid


def test_sd_rank_identity(spark, pos_index, pos_oracle):
    model = MrfModel(dependence="sd")
    golden = oracle_mrf_topk(pos_oracle, MRF_QUERIES, model)
    _assert_match(mrf_topk(spark, pos_index, MRF_QUERIES, model), golden)


def test_fd_rank_identity(spark, pos_index, pos_oracle):
    model = MrfModel(dependence="fd", features=[
        FeatureSpec("term", 0.8),
        FeatureSpec("od", 0.1, width=4),
        FeatureSpec("uw", 0.1, width=4),
    ])
    qs = [q for q in MRF_QUERIES if q["qid"] in ("m2", "m3")]
    golden = oracle_mrf_topk(pos_oracle, qs, model)
    _assert_match(mrf_topk(spark, pos_index, qs, model), golden)


def test_sd_dirichlet_rank_identity(spark, pos_index, pos_oracle):
    model = MrfModel(dependence="sd", features=[
        FeatureSpec("term", 0.82, scorer="dirichlet", params={"mu": 1000.0}),
        FeatureSpec("od", 0.09, width=1, scorer="dirichlet", params={"mu": 750.0}),
        FeatureSpec("uw", 0.09, width=4, scorer="dirichlet", params={"mu": 750.0}),
    ])
    qs = MRF_QUERIES[:3]
    golden = oracle_mrf_topk(pos_oracle, qs, model)
    _assert_match(mrf_topk(spark, pos_index, qs, model), golden)


def test_positional_flag_required(spark, tiny_corpus_path, tmp_path):
    root = str(tmp_path / "nonpos")
    build_index(spark, tiny_corpus_path, root, IndexConfig())
    idx = open_index(spark, root)
    with pytest.raises(ValueError, match="positional"):
        mrf_topk(spark, idx, MRF_QUERIES[:1])


def test_window_kernels_vectorized_equals_scan():
    """The 2-reader searchsorted fast path is bit-equal to the reference
    scan loop across random position lists (incl. identical lists, the
    duplicate-query-token case)."""
    import numpy as np

    from ivory_spark.query.mrf import (
        _count_ordered_scan,
        _count_unordered_scan,
        count_ordered_matches,
        count_unordered_matches,
    )

    rng = np.random.RandomState(42)
    for trial in range(300):
        n_pos = rng.randint(1, 400)
        allpos = rng.choice(np.arange(1, 1000), size=min(n_pos, 999), replace=False)
        split = rng.randint(0, len(allpos) + 1)
        p1 = np.sort(allpos[:split])
        p2 = np.sort(allpos[split:])
        if trial % 7 == 0:
            p2 = p1.copy()  # duplicate-token clique
        if len(p1) == 0 or len(p2) == 0:
            continue
        for gap in (1, 2, 5):
            assert count_ordered_matches([p1, p2], gap) == _count_ordered_scan(
                [p1, p2], gap
            ), (trial, gap)
        for win in (2, 8, 20):
            assert count_unordered_matches([p1, p2], win) == _count_unordered_scan(
                [p1, p2], win
            ), (trial, win)


def test_window_kernels_nreader_equals_scan():
    """The batched chained-searchsorted path equals the reference scan
    loop for 3- and 4-reader cliques (FD models), including duplicate
    readers and lists that share positions across readers."""
    import numpy as np

    from ivory_spark.query.mrf import (
        _count_ordered_scan,
        _count_unordered_scan,
        count_ordered_matches,
        count_unordered_matches,
    )

    rng = np.random.RandomState(7)
    for trial in range(300):
        n_readers = 3 if trial % 2 == 0 else 4
        lists = []
        for _ in range(n_readers):
            n = rng.randint(1, 60)
            # sampled WITH replacement across readers: positions can be
            # shared between readers (stress of the merged-stream tie rules)
            lists.append(np.sort(rng.choice(np.arange(1, 200), size=n, replace=False)))
        if trial % 5 == 0:
            lists[1] = lists[0].copy()  # duplicate-token reader
        for gap in (1, 3, 10):
            assert count_ordered_matches(lists, gap) == _count_ordered_scan(
                lists, gap
            ), (trial, gap)
        for win in (4, 12, 40):
            assert count_unordered_matches(lists, win) == _count_unordered_scan(
                lists, win
            ), (trial, win)


def test_score_docs_batch_equals_score_doc():
    """score_docs_batch is bit-identical to the per-doc score_doc fold
    across random multi-doc universes (term + od + uw cliques, bm25 and
    dirichlet scorers)."""
    import numpy as np

    from ivory_spark.query.mrf import (
        MrfModel,
        FeatureSpec,
        TermData,
        build_cliques,
        score_doc,
        score_docs_batch,
    )

    rng = np.random.RandomState(11)
    terms = ["a", "b", "c"]
    stats = {"a": (40, 90), "b": (12, 30), "c": (3, 5)}
    n_docs, avgdl, clen = 500, 37.5, 18750
    for model in (
        MrfModel(dependence="sd"),
        MrfModel(dependence="fd"),
        MrfModel(dependence="sd", features=[
            FeatureSpec("term", 0.8, scorer="dirichlet", params={"mu": 900.0}),
            FeatureSpec("od", 0.1, width=2, scorer="dirichlet", params={"mu": 700.0}),
            FeatureSpec("uw", 0.1, width=4, scorer="dirichlet", params={"mu": 700.0}),
        ]),
    ):
        cliques = build_cliques(["a", "b", "c"], model)
        m = 25
        dl = rng.randint(5, 120, size=m).astype(np.int64)
        term_data = {}
        per_doc: list[dict] = [dict() for _ in range(m)]
        for t in terms:
            has = rng.rand(m) < 0.6
            doc_rows = np.nonzero(has)[0].astype(np.int64)
            tf_vec = np.zeros(m, dtype=np.int64)
            flats, lens = [], []
            for r in doc_rows:
                tf = rng.randint(1, 6)
                pos = np.sort(rng.choice(np.arange(1, dl[r] + 1), size=min(tf, dl[r]), replace=False))
                tf_vec[r] = len(pos)
                flats.append(pos.astype(np.int64))
                lens.append(len(pos))
                per_doc[r][t] = (len(pos), pos.astype(np.int64))
            flat = np.concatenate(flats) if flats else np.empty(0, dtype=np.int64)
            iptr = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
            term_data[t] = TermData(tf_vec, doc_rows, iptr, flat)
        got = score_docs_batch(cliques, term_data, dl, stats, n_docs, avgdl, clen)
        want = np.array(
            [
                score_doc(cliques, per_doc[r], int(dl[r]), stats, n_docs, avgdl, clen)
                for r in range(m)
            ],
            dtype=np.float32,
        )
        assert np.array_equal(got.view(np.uint32), want.view(np.uint32)), model.dependence


def test_bigram_concept_expansion_identity(spark, pos_index, pos_oracle):
    """NGram latent concept expansion: mined bigram concepts are
    identical engine-vs-oracle (same exp(score)-weighted adjacency mass),
    and retrieval with the injected #od[1] concept cliques is float32
    bit-identical between mrf_topk and the numpy oracle."""
    from ivory_spark.query.expander import (
        concept_cliques,
        mine_bigram_concepts,
        oracle_mine_bigram_concepts,
    )

    qs = MRF_QUERIES[:3]
    c_engine = mine_bigram_concepts(spark, pos_index, qs, fb_docs=5, fb_concepts=4)
    c_oracle = oracle_mine_bigram_concepts(pos_oracle, qs, fb_docs=5, fb_concepts=4)
    assert c_engine == c_oracle  # exact float64 weight equality
    assert any(c_engine[q["qid"]] for q in qs)  # concepts actually mined

    extra = concept_cliques(c_engine, alpha=0.3)
    from ivory_spark.query.mrf import FeatureSpec

    model = MrfModel(dependence="sd", features=[FeatureSpec("term", 0.7)])
    golden = oracle_mrf_topk(pos_oracle, qs, model, extra_cliques=extra)
    _assert_match(
        mrf_topk(spark, pos_index, qs, model, extra_cliques=extra), golden
    )
    # the concept cliques change at least one ranking vs the plain model
    base = oracle_mrf_topk(pos_oracle, qs, model)
    assert any(
        [r["docno"] for r in golden[q]] != [r["docno"] for r in base[q]]
        or [r["score"] for r in golden[q]] != [r["score"] for r in base[q]]
        for q in golden
    )
