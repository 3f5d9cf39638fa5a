"""Bitext parallel-sentence mining: candidate-pair parity vs the
brute-force oracle on a synthetic two-language fixture (deterministic
'foreign' language = token-prefixed English, translation table maps it
back with split probabilities)."""

import pytest

from ivory_spark.ops.bitext import (
    crosslingual_doc_pairs,
    docs_to_sentences,
    find_parallel_sentence_pairs,
    oracle_parallel_sentence_pairs,
    translate_vectors,
)

E_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog. "
        "search engines build inverted index structures for fast retrieval. "
        "short one."),
    (2, "distributed systems shuffle data between many worker nodes. "
        "parallel corpora align sentences across two languages for training."),
    (3, "compression codecs pack posting lists into few bytes quickly. "
        "unrelated musings about tea ceremonies and garden stones here."),
]


def _foreignize(text: str) -> str:
    # deterministic "foreign" language: every token t -> ft; sentence
    # boundaries preserved, so true parallels share sentence structure
    import re

    return re.sub(r"[a-z_][a-z0-9_]*|[0-9]+", lambda m: "f" + m.group(0), text.lower())


# F docs: 11 = translation of doc 1, 12 = translation of doc 2 (sentences
# shuffled), 13 = unrelated foreign text
F_DOCS = [
    (11, _foreignize(E_DOCS[0][1])),
    (12, _foreignize("parallel corpora align sentences across two languages for training. "
                     "distributed systems shuffle data between many worker nodes.")),
    (13, _foreignize("cocina arroz sopa desayuno comida cocina estufa ollas sartenes hoy.")),
]

# translation table: f-token -> original with p=0.9 plus a decoy with 0.1
TTABLE = {}
for _, text in E_DOCS:
    import re

    for t in set(re.findall(r"[a-z_][a-z0-9_]*|[0-9]+", text.lower())):
        TTABLE["f" + t] = [(t, 0.9), (t + "_alt", 0.1)]

DOC_PAIRS = {(1, 11), (2, 12), (3, 13)}


@pytest.fixture(scope="module")
def frames(spark):
    e_df = spark.createDataFrame(E_DOCS, "docno long, content string")
    f_df = spark.createDataFrame(F_DOCS, "docno long, content string")
    e_s = docs_to_sentences(e_df)
    f_s = translate_vectors(docs_to_sentences(f_df), TTABLE)
    return e_s, f_s


def test_docs_to_sentences_filters(spark):
    e_df = spark.createDataFrame(E_DOCS, "docno long, content string")
    rows = docs_to_sentences(e_df).collect()
    # "short one." (2 tokens) dropped by MIN_SENTENCE_LENGTH
    assert all(r["length"] >= 5 for r in rows)
    sents = {r["sentence"].strip() for r in rows}
    assert not any("short one" in s for s in sents)
    # tf maps carry duplicate counts ("the" twice in the fox sentence)
    fox = [r for r in rows if "fox" in r["sentence"]][0]
    assert fox["vector"]["the"] == 2.0


def test_parallel_pairs_match_oracle(spark, frames):
    e_s, f_s = frames
    pairs_df = spark.createDataFrame(sorted(DOC_PAIRS), "e_docno long, f_docno long")
    got = find_parallel_sentence_pairs(pairs_df, e_s, f_s, threshold=0.5).collect()
    want = oracle_parallel_sentence_pairs(E_DOCS, F_DOCS, TTABLE, DOC_PAIRS, threshold=0.5)
    gk = [(r["e_docno"], r["f_docno"], r["e_sent_id"], r["f_sent_id"]) for r in got]
    wk = [(r["e_docno"], r["f_docno"], r["e_sent_id"], r["f_sent_id"]) for r in want]
    assert gk == wk and len(gk) > 0
    for g, w in zip(got, want):
        assert g["cosine"] == pytest.approx(w["cosine"], abs=1e-6)
        assert g["e_sentence"] == w["e_sentence"]
    # true parallels found: doc 1's sentences align with doc 11's
    assert any(r["e_docno"] == 1 and r["f_docno"] == 11 for r in got)
    # the unrelated pair (3, 13) produces no high-cosine sentence pair
    assert not any(r["e_docno"] == 3 and r["f_docno"] == 13 for r in got)


def test_length_ratio_filter(spark, frames):
    """A sentence pair with >2x token-length mismatch is skipped even at
    cosine 1 (FindParallelSentencePairs.java:176-180)."""
    e_df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu")],
        "docno long, content string",
    )
    f_df = spark.createDataFrame(
        [(11, _foreignize("alpha beta gamma delta epsilon"))],
        "docno long, content string",
    )
    tt = {"f" + t: [(t, 1.0)] for t in
          "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu".split()}
    pairs_df = spark.createDataFrame([(1, 11)], "e_docno long, f_docno long")
    out = find_parallel_sentence_pairs(
        pairs_df, docs_to_sentences(e_df),
        translate_vectors(docs_to_sentences(f_df), tt), threshold=0.0,
    ).collect()
    assert out == []  # 12 vs 5 tokens -> ratio > 2
    want = oracle_parallel_sentence_pairs(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu")],
        [(11, _foreignize("alpha beta gamma delta epsilon"))],
        tt, {(1, 11)}, threshold=0.0,
    )
    assert want == []


def test_crosslingual_doc_pairs(spark, frames):
    e_s, f_s = frames
    got = {
        (r["e_docno"], r["f_docno"])
        for r in crosslingual_doc_pairs(e_s, f_s, threshold=0.5).collect()
    }
    # translations pair with their sources; unrelated docs don't reach 0.5
    assert (1, 11) in got and (2, 12) in got
    assert (3, 13) not in got


def test_score_fn_hook():
    """A pluggable classifier (e.g. a real MaxEnt model) replaces the
    cosine substitution in the oracle twin."""
    always = oracle_parallel_sentence_pairs(
        E_DOCS, F_DOCS, TTABLE, DOC_PAIRS, threshold=0.5,
        score_fn=lambda cos, el, fl: 1.0,
    )
    none = oracle_parallel_sentence_pairs(
        E_DOCS, F_DOCS, TTABLE, DOC_PAIRS, threshold=0.5,
        score_fn=lambda cos, el, fl: 0.0,
    )
    assert len(always) > len(none) == 0
