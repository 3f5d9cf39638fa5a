"""End-to-end corpus curation composition (ops/curate.py).

One crafted corpus exercises every stage: quality gate, repetition
gate, exact dedup, near-dup clustering, benchmark decontamination, PII
redaction, mixture sampling, split assignment, sequence packing.
"""

from pyspark.sql import functions as F

from ivory_spark.ops.curate import curate_corpus

GOOD1 = "the quick brown fox jumps over a lazy dog near the river bank"
GOOD2 = "a calm ocean wave rolls onto the sandy shore in morning light"
GOOD3 = "for every tall tree on a green hill the wind sings a quiet song"
REPEAT = "the cat sat on a mat today\nthe cat sat on a mat today\nthe cat sat on a mat today"
CONTAM = "benchmark answers include the value of pi to seven digits exactly here"

ROWS = [
    (1, GOOD1, "web"),
    (2, "x y", "web"),              # fails quality gate (2 tokens, no stopwords)
    (3, REPEAT, "web"),             # fails repetition gate (dup_line_frac 2/3)
    (4, GOOD1, "web"),              # exact duplicate of 1 (min id 1 survives)
    (5, GOOD2, "web"),
    (6, GOOD2 + " extra", "web"),   # near-duplicate of 5 (rep 5 survives)
    (7, CONTAM, "wiki"),            # shares 4-grams with the benchmark set
    (8, "email me at a@b.co " + GOOD3, "wiki"),
]


def _run(spark, **kw):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text", "source"])
    bench = spark.createDataFrame([(100, CONTAM)], ["doc_id", "text"])
    defaults = dict(
        min_quality=0.5,
        max_dup_line_frac=0.3,
        max_top_ngram_char_frac=None,  # short fixture docs; Gopher default is for web docs
        exact_dedup=True,
        neardup_threshold=0.7,
        benchmark=bench,
        decontaminate_ngram=4,
    )
    defaults.update(kw)
    return curate_corpus(docs, **defaults)


def test_full_recipe_survivors_and_redaction(spark):
    out = _run(
        spark,
        mixture={"web": 1.0, "wiki": 1.0},
        split_weights={"train": 8.0, "val": 1.0, "test": 1.0},
        pack_budget=8,
        pack_shards=2,
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {1, 5, 8}
    # PII redacted in place, rest of the text intact
    assert by_id[8]["text"] == "email me at <EMAIL> " + GOOD3
    assert by_id[1]["text"] == GOOD1
    # split + packing columns present and self-consistent
    for r in by_id.values():
        assert r["split"] in {"train", "val", "test"}
        assert r["n_tokens"] == len(r["text"].split())
        assert r["seq_first"] == r["tok_start"] // 8
        assert r["offset_in_seq"] == r["tok_start"] % 8
    # source column rides through
    assert by_id[5]["source"] == "web"


def test_stage_gates_drop_the_right_docs(spark):
    # disable the assembly stages; check each filter's victim is gone
    ids = {r["doc_id"] for r in _run(spark).select("doc_id").collect()}
    assert ids == {1, 5, 8}
    # without the near-dup stage, 6 survives
    ids = {r["doc_id"] for r in _run(spark, neardup_threshold=None).select("doc_id").collect()}
    assert ids == {1, 5, 6, 8}
    # without decontamination, 7 survives
    ids = {r["doc_id"] for r in _run(spark, benchmark=None).select("doc_id").collect()}
    assert ids == {1, 5, 7, 8}


def test_substring_strip_stage(spark):
    # with near-dup off but sub-document dedup on, doc 6 keeps only the
    # tokens not duplicated against doc 5's first occurrence
    out = _run(spark, neardup_threshold=None, strip_dup_substrings_k=4)
    by_id = {r["doc_id"]: r["text"] for r in out.select("doc_id", "text").collect()}
    assert set(by_id) == {1, 5, 6, 8}
    assert by_id[6] == "extra"   # GOOD2 prefix stripped (all-but-one occurrence)
    assert by_id[5] == GOOD2     # the first occurrence survives intact


def test_all_stages_disabled_is_identity(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text", "source"])
    out = curate_corpus(
        docs,
        min_quality=None,
        max_dup_line_frac=None,
        max_top_ngram_char_frac=None,
        exact_dedup=False,
        redact=False,
    )
    assert out.columns == docs.columns
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(1, 9))
