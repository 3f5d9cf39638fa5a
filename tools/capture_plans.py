"""Capture .explain("formatted") for every bench-headline query path into
per-query text files (the r06 optimization-evidence artifacts).

Usage: python tools/capture_plans.py <out_dir> [index_root]

Runs no heavy actions — plans only (plus the tiny driver-side query-term
lookup the WAND path needs). index_root defaults to the 50k bench index.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def captured(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir = sys.argv[1]
    index_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ivory_bench_index_50000_32"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import pyspark.sql.functions as F

    from ivory_spark.corpus import QUERY_SET
    from ivory_spark.index.build import IndexConfig, build_docmap, encode_postings
    from ivory_spark.index.reader import open_index
    from ivory_spark.ops import ir_relational as IR
    from ivory_spark.ops.curate import curate_corpus
    from ivory_spark.ops.dedup import minhash_dedup_pairs
    from ivory_spark.ops.similarity import brute_force_topk, query_vectors
    from ivory_spark.query.wand import bm25_topk_wand
    from ivory_spark.session import get_spark
    from ivory_spark.sources.testdata import read_table

    spark = get_spark("capture-plans", cores=8, shuffle_partitions=8)
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    index = open_index(spark, index_root)

    plans: dict[str, str] = {}
    plans["ir_bm25_top10"] = captured(IR.bm25_top10(spark, docs, IR.GATE_QUERIES))
    plans["ir_term_stats"] = captured(IR.term_stats(docs))
    plans["wand_topk_batch15"] = captured(bm25_topk_wand(spark, index, QUERY_SET, k=10))
    plans["dedup_minhash_pairs"] = captured(
        minhash_dedup_pairs(docs, threshold=0.8, max_bucket=64)
    )
    plans["ann_cosine_top5"] = captured(
        brute_force_topk(emb, query_vectors(spark, emb, 10), k=5)
    )

    # index-build stage frames (the plans build_index executes)
    corpus = spark.read.parquet("/tmp/ivory_bench_corpus_50000/corpus.parquet")
    cfg = IndexConfig(salt_threshold=5000, n_shards=32, partitions=8)
    docmap_df, _, pinned = build_docmap(spark, corpus, 8)
    plans["build_docmap"] = captured(docmap_df)
    pinned.unpersist()

    from pyspark.sql import Window

    from ivory_spark.functions.tokenizer import get_tokenizer

    docmap = spark.read.parquet(os.path.join(index_root, "docmap"))
    tok = get_tokenizer(cfg.tokenizer)
    tdf = tok.doc_terms(docmap.select("docno", "content"))
    tdf = tdf.repartitionByRange(8, "docno")
    tdf = tdf.withColumn("dl", F.sum("tf").over(Window.partitionBy("docno")).cast("int"))
    plans["build_tdf"] = captured(tdf)

    tdf_r = spark.read.parquet(os.path.join(index_root, "tdf"))
    dictionary = spark.read.parquet(os.path.join(index_root, "dictionary"))
    joined = tdf_r.join(dictionary.select("term", "termid", "df", "cf"), "term").drop("term")
    props = index.properties
    postings = encode_postings(joined, cfg, props["n_docs"], props["avgdl"], 8)
    plans["build_postings"] = captured(
        postings.repartitionByRange(8, "termid").sortWithinPartitions("termid", "salt")
    )

    # curate recipe (the bench big-block shape)
    cdocs = corpus.select(
        F.abs(F.xxhash64("repo", "path", "commit")).alias("doc_id"),
        F.col("content").alias("text"),
    )
    plans["curate_pipeline"] = captured(
        curate_corpus(
            cdocs, min_quality=0.2, max_dup_line_frac=None,
            max_top_ngram_char_frac=None, exact_dedup=True,
            strip_dup_substrings_k=20, redact=True,
            split_weights={"train": 98.0, "val": 1.0, "test": 1.0},
        )
    )

    suffix = os.environ.get("PLAN_SUFFIX", "after")
    for name, text in plans.items():
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        n_exch = text.count("Exchange")
        print(f"{name}: {n_exch} Exchange nodes -> {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
