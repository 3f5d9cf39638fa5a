"""ltr measures + greedy learning — goldens hand-computed from the
reference formulas (ltr/NDCGMeasure.java, ERRMeasure.java,
MAPMeasure.java, LineSearch.java, GreedyLearn.java)."""

import numpy as np
import pytest

from ivory_spark.ltr import (
    Instances,
    LearnedModel,
    LtrFeature,
    evaluate_measure,
    greedy_learn,
    line_search,
)


def make_instances(qids, grades, features, names=None):
    n = len(qids)
    X = np.asarray(features, dtype=np.float32).reshape(n, -1)
    names = names or [f"f{i}" for i in range(X.shape[1])]
    return Instances(qids, [f"d{i}" for i in range(n)], grades, X, names)


GRADES = [3, 2, 0, 1]
SCORES = np.array([0.9, 0.7, 0.8, 0.2], dtype=np.float32)


def one_query():
    return make_instances(["q1"] * 4, GRADES, np.zeros((4, 1)))


def test_ndcg_golden():
    # ranked grades [3,0,2,1]; dcg/idcg with natural log, full list
    assert evaluate_measure("ndcg", one_query(), SCORES) == pytest.approx(
        0.950801333894099, abs=1e-6
    )


def test_err_golden():
    # g=(2^grade-1)/16 with the reference's float32 accumulators
    assert evaluate_measure("err", one_query(), SCORES) == pytest.approx(
        0.47979736328125, abs=1e-7
    )


def test_map_golden():
    # relevant at ranks 1,3,4 -> AP = (1 + 2/3 + 3/4)/3
    assert evaluate_measure("map", one_query(), SCORES) == pytest.approx(
        0.8055555555, abs=1e-6
    )


def test_measures_average_over_contiguous_blocks():
    # perfect second query: NDCG contributes 1.0
    inst = make_instances(["q1"] * 4 + ["q2"] * 2, GRADES + [2, 0], np.zeros((6, 1)))
    scores = np.concatenate([SCORES, np.array([0.9, 0.1], dtype=np.float32)])
    assert evaluate_measure("ndcg", inst, scores) == pytest.approx(
        (0.950801333894099 + 1.0) / 2, abs=1e-6
    )


def test_all_irrelevant_query_scores_zero():
    inst = make_instances(["q1"] * 3, [0, 0, 0], np.zeros((3, 1)))
    s = np.array([0.5, 0.4, 0.3], dtype=np.float32)
    for m in ("map", "ndcg", "err"):
        val = evaluate_measure(m, inst, s)
        assert val == 0.0 if m != "err" else val == pytest.approx(0.0)


def test_stable_tie_break_keeps_original_order():
    # equal scores -> Collections.sort stability keeps file order, so the
    # relevant doc listed first stays rank 1
    inst = make_instances(["q1"] * 2, [1, 0], np.zeros((2, 1)))
    tied = np.array([0.5, 0.5], dtype=np.float32)
    assert evaluate_measure("map", inst, tied) == 1.0
    inst2 = make_instances(["q1"] * 2, [0, 1], np.zeros((2, 1)))
    assert evaluate_measure("map", inst2, tied) == 0.5


def test_tsv_round_trip(tmp_path):
    inst = make_instances(
        ["q1", "q1", "q2"], [1, 0, 2],
        [[1.5, -2.0], [0.0, 3.25], [4.0, 0.5]], names=["zeta", "alpha"],
    )
    p = str(tmp_path / "feat.tsv")
    inst.to_tsv(p)
    header = open(p).readline().rstrip("\n").split("\t")
    # reference header: qid, docid, then sorted(feature names + 'grade')
    assert header == ["qid", "docid", "alpha", "grade", "zeta"]
    back = Instances.from_tsv(p)
    assert list(back.qids) == ["q1", "q1", "q2"]
    assert np.array_equal(back.grades, inst.grades)
    # columns located by name, independent of order
    za, zb = back.feature_names.index("zeta"), back.feature_names.index("alpha")
    assert np.array_equal(back.features[:, za], inst.features[:, 0])
    assert np.array_equal(back.features[:, zb], inst.features[:, 1])


def test_line_search_first_feature_alpha_one():
    inst = make_instances(["q1"] * 4, GRADES, SCORES.reshape(4, 1))
    alpha, m = line_search(0, 0.0, SCORES, inst, np.zeros(4, dtype=np.float32), "ndcg")
    assert alpha == 1.0
    assert m == pytest.approx(0.950801333894099, abs=1e-6)


def test_greedy_learn_picks_informative_feature():
    rng = np.random.RandomState(7)
    qids, grades, rows = [], [], []
    for q in range(6):
        for d in range(8):
            g = d % 3
            qids.append(f"q{q}")
            grades.append(g)
            # f0: noise, f1: proportional to grade, f2: constant
            rows.append([rng.rand(), g * 2.0 + 0.01 * rng.rand(), 5.0])
    inst = make_instances(qids, grades, rows, names=["noise", "signal", "const"])
    model, measure = greedy_learn(inst, metric="ndcg")
    assert model.features[0].name == "signal"
    assert measure > 0.99
    # constant feature must have been eliminated from the pool
    assert all(f.name != "const" for f in model.features)
    # weights renormalized to sum 1 (Model.java:60-80)
    assert sum(model.weights) == pytest.approx(1.0)


def test_greedy_learn_map_metric_and_model_json():
    qids = ["q1"] * 6 + ["q2"] * 6
    grades = [1, 0, 0, 1, 0, 0] * 2
    rows = [[float(g), 0.3] for g in grades]
    inst = make_instances(qids, grades, rows, names=["exact", "flat"])
    model, measure = greedy_learn(inst, metric="map")
    assert measure == pytest.approx(1.0)
    back = LearnedModel.from_json(model.to_json())
    X = inst.features
    assert np.array_equal(back.score(X), model.score(X))


def test_model_score_is_ordered_f32_fold():
    X = np.array([[1.25, 3.5], [0.5, -1.0]], dtype=np.float32)
    m = LearnedModel()
    m.add_feature(LtrFeature("simple", 0, name="a"), 1.0)
    m.add_feature(LtrFeature("simple", 1, name="b"), 0.5)
    # weights normalized: [2/3, 1/3]; Rank.java folds sequentially
    s = np.zeros(2, dtype=np.float32)
    for i, w in enumerate([2.0 / 3.0, 1.0 / 3.0]):
        s = (1.0 * (s.astype(np.float64) + w * X[:, i].astype(np.float64))).astype(
            np.float32
        )
    assert np.array_equal(m.score(X), s)


def test_derived_feature_guards():
    X = np.array([[0.0, 2.0], [-3.0, 0.0], [4.0, 8.0]], dtype=np.float32)
    log = LtrFeature("log", 0).eval(X)
    assert log[0] == 0.0 and log[1] == 0.0 and log[2] == pytest.approx(np.log(4.0))
    quot = LtrFeature("quotient", 0, 1).eval(X)
    assert quot[1] == 0.0  # divide-by-zero guard returns 0
    assert quot[2] == pytest.approx(0.5)
    prod = LtrFeature("product", 0, 1).eval(X)
    assert prod[2] == 32.0


def test_greedy_learn_derived_features_expand_pool():
    # signal only via product of two base columns
    rng = np.random.RandomState(3)
    qids, grades, rows = [], [], []
    for q in range(5):
        for d in range(6):
            g = d % 2
            a = 1.0 + g + 0.01 * rng.rand()
            b = 1.0 + g
            qids.append(f"q{q}")
            grades.append(g * 3)
            rows.append([a, b])
    inst = make_instances(qids, grades, rows, names=["a", "b"])
    model, measure = greedy_learn(
        inst, metric="ndcg", product_features=True, quotient_features=True,
        log_features=True,
    )
    assert measure > 0.99


def test_line_search_negative_direction():
    """A feature that anti-correlates with relevance is added with a
    NEGATIVE alpha (the second grid of LineSearch.java:91-101)."""
    rng = np.random.RandomState(11)
    qids, grades, rows = [], [], []
    for q in range(6):
        for d in range(8):
            g = d % 4
            qids.append(f"q{q}")
            grades.append(g)
            # f0: weakly informative; f1: strongly ANTI-correlated
            rows.append([g * 0.2 + rng.rand(), -2.0 * g + 0.01 * rng.rand()])
    inst = make_instances(qids, grades, rows, names=["weak", "anti"])
    model, measure = greedy_learn(inst, metric="ndcg")
    by_name = dict(zip([f.name for f in model.features], model.weights))
    assert "anti" in by_name and by_name["anti"] < 0  # negative alpha used
    assert measure > 0.95
