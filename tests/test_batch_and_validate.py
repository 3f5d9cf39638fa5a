"""Query sources (S8), TREC sink (S9), weighted doc vectors (P9),
forward-index access (S10), index validation (A9), df-band filter (P7),
streaming ingest."""

import gzip
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from ivory_spark.corpus import QUERY_SET
from ivory_spark.index.build import IndexConfig, build_index
from ivory_spark.index.reader import open_index
from ivory_spark.plans.validate import IndexValidationError, validate_index
from ivory_spark.query.batch import (
    Model,
    parse_model_xml,
    parse_query_xml,
    run_batch,
    write_trec_run,
)


@pytest.fixture(scope="module")
def idx(spark, tiny_corpus_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx") / "batch")
    build_index(spark, tiny_corpus_path, root, IndexConfig(salt_threshold=16, n_shards=5))
    return open_index(spark, root)


def test_query_xml_roundtrip():
    xml = """<parameters>
      <query id="601">turkey iraq water</query>
      <query id="602">def return import</query>
    </parameters>"""
    qs = parse_query_xml(xml)
    assert qs == [
        {"qid": "601", "query": "turkey iraq water"},
        {"qid": "602", "query": "def return import"},
    ]


def test_model_xml():
    m = parse_model_xml('<model id="b" score="bm25" k1="0.9" b="0.4" hits="20"/>')
    assert m.scorer == "bm25" and m.k == 20 and m.params == {"k1": 0.9, "b": 0.4}


def test_run_batch_and_trec_sink(spark, idx, tmp_path):
    res = run_batch(spark, idx, QUERY_SET[:3], Model(k=5))
    out = str(tmp_path / "run.txt.gz")
    n = write_trec_run(res, out, tag="t1")
    assert n == res.count()
    with gzip.open(out, "rt") as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == n
    parts = lines[0].split(" ")
    assert parts[1] == "Q0" and parts[3] == "1" and parts[5] == "t1"
    # ranks within a qid are 1..k in file order
    q0 = [ln for ln in lines if ln.startswith(parts[0] + " ")]
    assert [int(x.split(" ")[3]) for x in q0] == list(range(1, len(q0) + 1))


def test_validate_index_passes(spark, idx):
    checks = validate_index(spark, idx)
    assert checks["terms_checked"] > 0
    assert checks["n_docs"] == idx.n_docs


def test_validate_detects_corruption(spark, idx):
    # an index whose dictionary lies about df must fail A9
    import copy

    broken = copy.copy(idx)
    broken.dictionary = idx.dictionary.withColumn(
        "df", F.when(F.col("termid") == 1, F.col("df") + 1).otherwise(F.col("df"))
    )
    with pytest.raises(IndexValidationError):
        validate_index(spark, broken)


def test_forward_index_and_weighted_vectors(spark, idx):
    from ivory_spark.ops.docvectors import fetch_doc_vector, weighted_doc_vectors

    v = fetch_doc_vector(spark, idx, 1).collect()
    assert len(v) > 0
    assert all(r["docno"] == 1 for r in v)
    tids = [r["termid"] for r in v]
    assert tids == sorted(tids)

    w = weighted_doc_vectors(spark, idx, normalize=True)
    norms = (
        w.groupBy("docno")
        .agg(F.sum(F.col("weight") * F.col("weight")).alias("sq"))
        .collect()
    )
    for r in norms:
        assert abs(r["sq"] - 1.0) < 1e-3  # L2-normalized per doc


def test_df_band_filter(spark, tiny_corpus_path, tmp_path):
    root = str(tmp_path / "band")
    props = build_index(
        spark, tiny_corpus_path, root, IndexConfig(min_df=2, max_df=50)
    )
    idx = open_index(spark, root)
    agg = idx.dictionary.agg(F.min("df").alias("lo"), F.max("df").alias("hi")).collect()[0]
    assert agg["lo"] >= 2 and agg["hi"] <= 50
    assert props["min_df"] == 2


def test_streaming_term_stats(spark, tiny_corpus, tmp_path):
    import pandas as pd

    from ivory_spark.streaming.ingest import (
        incremental_term_stats,
        read_document_stream,
        run_to_memory,
    )

    pdf = tiny_corpus.head(50).drop(columns=["sha256"]).copy()
    pdf["ingest_ts"] = pd.Timestamp("2026-01-01 00:00:00")
    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    pdf.to_parquet(os.path.join(stream_dir, "batch0.parquet"), index=False)

    stream = read_document_stream(spark, stream_dir)
    agg = incremental_term_stats(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tstats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["term"]: r["cf_delta"] for r in spark.sql("select * from tstats").collect()}
    # oracle: token counts from the same tokenizer
    from collections import Counter

    from ivory_spark.functions.tokenizer import tokenize_py

    want = Counter()
    for c in pdf["content"]:
        want.update(tokenize_py(c))
    assert got == dict(want)


def test_streaming_exact_dedup(spark, tiny_corpus, tmp_path):
    import pandas as pd

    from ivory_spark.streaming.ingest import (
        read_document_stream,
        run_to_memory,
        streaming_exact_dedup,
    )

    pdf = tiny_corpus.head(60).drop(columns=["sha256"]).copy()
    pdf["ingest_ts"] = pd.Timestamp("2026-01-01 00:00:00")
    stream_dir = str(tmp_path / "sdedup")
    os.makedirs(stream_dir)
    pdf.to_parquet(os.path.join(stream_dir, "batch0.parquet"), index=False)

    run_to_memory(streaming_exact_dedup(read_document_stream(spark, stream_dir)), "sdedup")
    got = spark.sql("select * from sdedup").toPandas()
    # one survivor per distinct content (tiny_corpus plants duplicates)
    assert len(got) == pdf["content"].nunique()
    assert got["sha256"].is_unique


def test_streaming_quality_filter(spark, tmp_path):
    import pandas as pd

    from ivory_spark.streaming.ingest import (
        read_document_stream,
        run_to_memory,
        streaming_quality_filter,
    )

    rows = pd.DataFrame(
        {
            "repo": ["r"] * 3,
            "path": ["a", "b", "c"],
            "commit": ["1", "2", "3"],
            "lang": ["en"] * 3,
            "content": [
                "def good_function(arg): return arg + compute(arg)",  # keeps
                "x",  # too short
                "the the the the the the",  # all stopwords
            ],
            "ingest_ts": [pd.Timestamp("2026-01-01")] * 3,
        }
    )
    rows["ingest_ts"] = rows["ingest_ts"].astype("datetime64[us]")
    stream_dir = str(tmp_path / "squal")
    os.makedirs(stream_dir)
    rows.to_parquet(os.path.join(stream_dir, "b0.parquet"), index=False)

    run_to_memory(
        streaming_quality_filter(read_document_stream(spark, stream_dir), min_tokens=5),
        "squal",
    )
    got = spark.sql("select path from squal").toPandas()
    assert sorted(got["path"]) == ["a"]


def test_streaming_neardup_stateful(spark, tmp_path):
    """applyInPandasWithState near-dup candidates: duplicate content
    flags against the bucket's first occupant across micro-batches;
    signatures agree with the batch minhash op."""
    import pandas as pd

    from ivory_spark.ops.dedup import minhash_signatures
    from ivory_spark.streaming.ingest import CORPUS_SCHEMA
    from ivory_spark.streaming.neardup import _minhash_sig, streaming_neardup_candidates

    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = pd.DataFrame(
        {
            "repo": ["r"] * 3,
            "path": ["a", "b", "c"],
            "commit": ["1", "2", "3"],
            "lang": ["x"] * 3,
            "content": [dup_text, "totally different words entirely here", dup_text],
            "ingest_ts": pd.Series([pd.Timestamp("2026-01-01")] * 3).astype("datetime64[us]"),
        }
    )
    rows["doc_id"] = [10, 20, 30]
    stream_dir = str(tmp_path / "nd")
    os.makedirs(stream_dir)
    rows.to_parquet(os.path.join(stream_dir, "b0.parquet"), index=False)

    schema = CORPUS_SCHEMA.add("doc_id", "long")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    )
    out = streaming_neardup_candidates(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("nd_cand")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from nd_cand").toPandas()
    # doc 30 (dup of 10) collides in EVERY band against first-seen 10
    flagged = got[got["doc_id"] == 30]
    assert len(flagged) == 4  # 12 hashes / 3 per band
    assert (flagged["first_seen_doc"] == 10).all()
    # the unique doc never collides
    assert (got["doc_id"] != 20).all()

    # signature parity with the batch operator
    batch = minhash_signatures(
        spark.createDataFrame([(1, dup_text)], "doc_id long, text string")
    ).collect()[0]
    assert [batch[f"m{j}"] for j in range(12)] == _minhash_sig(dup_text)
