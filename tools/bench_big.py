"""Scale-up datapoint: the flagship operators at ~10x the per-round
bench size, on ONE JVM (run solo — see BENCH.md: the host is
oversubscribed and concurrent JVMs skew every measurement).

What runs (mirrors bench.py's headline set so the numbers are directly
comparable to BENCH_r{N}.json at 10x input):

- index build + block-max WAND batch over a 500k-doc generated corpus
  (same generator/seed family as bench.py, 10x its default);
- minhash-LSH dedup pairs over the sf0.1 documents table replicated
  10x with per-replica content perturbation (sha256 dedup would
  collapse exact copies — the perturbation keeps all replicas distinct
  while preserving the vocabulary shape);
- IVF ANN top-5 over the sf0.1 embeddings replicated 10x (vec_id
  offsets; identical vectors are fine for a latency measurement).

Writes BENCH_BIG.json at the repo root:
  {"n_docs", "build_sec", "docs_per_sec", "wand_batch15_sec",
   "dedup10x_docs", "dedup10x_sec", "ivf10x_rows", "ivf10x_sec",
   "cpus", "host_cpu_ceiling_speedup"}

Usage: python tools/bench_big.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from ivory_spark.corpus import QUERY_SET
    from ivory_spark.index.build import IndexConfig, build_index
    from ivory_spark.index.reader import open_index
    from ivory_spark.ops.dedup import minhash_dedup_pairs
    from ivory_spark.ops.similarity import ivf_topk, query_vectors
    from ivory_spark.query.wand import bm25_topk_wand
    from ivory_spark.session import get_spark
    from ivory_spark.sources.testdata import read_table

    from bench import ensure_bench_corpus  # repo-root bench.py helpers

    spark = get_spark("ivory-bench-big", cores=cpus, shuffle_partitions=cpus)
    out: dict = {"n_docs": n_docs, "cpus": cpus}

    # host ceiling probe (same methodology as bench.py)
    probe = spark.range(0, 6_000_000, 1, cpus).select(
        F.sha2(F.col("id").cast("string"), 256).alias("h")
    )
    probe.count()
    t0 = time.monotonic()
    probe.select(F.max("h")).collect()
    par = time.monotonic() - t0
    p1 = spark.range(0, 1_500_000, 1, 1).select(
        F.sha2(F.col("id").cast("string"), 256).alias("h")
    )
    t0 = time.monotonic()
    p1.select(F.max("h")).collect()
    one = time.monotonic() - t0
    host_speedup = 4.0 * one / par
    out["host_cpu_ceiling_speedup"] = round(host_speedup, 2)
    build_partitions = max(8, min(cpus, int(round(host_speedup * 1.5))))
    out["build_partitions"] = build_partitions

    # --- 10x build + WAND -------------------------------------------------
    corpus_dir = os.path.join("/tmp", f"ivory_bench_corpus_{n_docs}")
    corpus_path = ensure_bench_corpus(corpus_dir, n_docs)
    root = os.path.join("/tmp", f"ivory_big_index_{n_docs}_{cpus}")
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.monotonic()
    props = build_index(
        spark, corpus_path, root,
        IndexConfig(salt_threshold=n_docs // 10, n_shards=cpus,
                    partitions=build_partitions),
    )
    build_sec = time.monotonic() - t0
    out["build_sec"] = round(build_sec, 3)
    out["built_docs"] = props["n_docs"]
    out["docs_per_sec"] = round(props["n_docs"] / build_sec, 1)

    index = open_index(spark, root)
    bm25_topk_wand(spark, index, QUERY_SET[:2], k=10).collect()
    t0 = time.monotonic()
    bm25_topk_wand(spark, index, QUERY_SET, k=10).collect()
    out["wand_batch15_sec"] = round(time.monotonic() - t0, 3)

    # --- 10x dedup --------------------------------------------------------
    docs = read_table(spark, sf_dir, "documents")
    reps = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")
    docs10 = docs.select("*", reps).select(
        (F.col("doc_id") + F.col("rep") * F.lit(1_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
        ).alias("text"),
        "source",
    ).persist()
    out["dedup10x_docs"] = docs10.count()
    t0 = time.monotonic()
    n_pairs = minhash_dedup_pairs(docs10, threshold=0.8, max_bucket=64).count()
    out["dedup10x_sec"] = round(time.monotonic() - t0, 3)
    out["dedup10x_pairs"] = n_pairs

    # --- 10x IVF ANN ------------------------------------------------------
    emb = read_table(spark, sf_dir, "embeddings")
    emb10 = emb.select("*", reps).select(
        (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
        "embedding",
    ).persist()
    out["ivf10x_rows"] = emb10.count()
    qv = query_vectors(spark, emb10, 10)
    ivf_topk(emb10, qv, k=5, n_centroids=16, nprobe=6).collect()  # warm
    t0 = time.monotonic()
    ivf_topk(emb10, qv, k=5, n_centroids=16, nprobe=6).collect()
    out["ivf10x_sec"] = round(time.monotonic() - t0, 3)

    with open(os.path.join(REPO, "BENCH_BIG.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
