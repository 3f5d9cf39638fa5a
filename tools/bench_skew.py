"""Skew-stress experiment: evidence that docno-shard salting bounds the
hot-term postings runs (the 100-TB story behind IndexConfig.salt_threshold).

Builds the same corpus twice — salting OFF (salt_threshold > any df, so
every term is one run that one task must sort+encode end-to-end) and
salting ON (hot terms split into one run per global docno shard) — and
reports postings-stage wall time plus the largest single run each build
produced. The corpus is the standard synthetic code table, whose zipf
keyword distribution puts the hottest term in nearly every document
(the skew the reference calls out for terms like 'return').

Run SOLO (one Spark JVM): python tools/bench_skew.py [n_docs]
Appends a JSON line to stdout; paste the table into BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from ivory_spark.index.build import IndexConfig, build_index
    from ivory_spark.plans.manifest import load_manifest
    from ivory_spark.session import get_spark

    from bench import ensure_bench_corpus

    corpus = ensure_bench_corpus(f"/tmp/ivory_bench_corpus_{n_docs}", n_docs)
    spark = get_spark("ivory-skew", cores=8, shuffle_partitions=8)

    out = {"n_docs": n_docs}
    for label, threshold in (("salted", n_docs // 10), ("unsalted", n_docs * 10)):
        root = f"/tmp/ivory_skew_{label}_{n_docs}"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.monotonic()
        build_index(
            spark, corpus, root,
            IndexConfig(salt_threshold=threshold, n_shards=8, partitions=8),
        )
        wall = time.monotonic() - t0
        m = load_manifest(root, "postings")
        posts = spark.read.parquet(os.path.join(root, "postings"))
        import pyspark.sql.functions as F

        agg = posts.agg(
            F.max("n").alias("max_run"),
            F.count(F.lit(1)).alias("n_runs"),
        ).collect()[0]
        out[label] = {
            "build_sec": round(wall, 1),
            "postings_stage_sec": m["wall_time_sec"] if m else None,
            "max_run_postings": int(agg["max_run"]),
            "n_runs": int(agg["n_runs"]),
        }
        print(f"{label}: {out[label]}", flush=True)
    ratio = out["unsalted"]["max_run_postings"] / max(out["salted"]["max_run_postings"], 1)
    out["max_run_reduction"] = round(ratio, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
