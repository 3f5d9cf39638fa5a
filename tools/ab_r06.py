"""Interleaved A/B timing of round-start vs optimized operator
implementations — host load hits both variants equally, unlike
cross-bench-run comparison. Old implementations are loaded by file path
from a git worktree of the round-start commit (default /tmp/r06_head).

Usage: python tools/ab_r06.py [reps] [which ...]

Caveat: a module loaded by file path still resolves its `ivory_spark.*`
imports from the CURRENT tree, so an "old" variant is only a clean
baseline when its measured hot path lives in the loaded file itself
(true for the cases here: ir_relational is self-contained, curate's
changed stages are in curate.py, build_docmap in build.py). Don't add
cases whose old hot path delegates to a module changed this round.
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAD = os.environ.get("R06_HEAD_TREE", "/tmp/r06_head")


def load_by_path(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    which = set(sys.argv[2:])

    import pyspark.sql.functions as F

    from ivory_spark.ops import ir_relational as IR_new
    from ivory_spark.ops.curate import curate_corpus as curate_new
    from ivory_spark.index.build import build_docmap as docmap_new
    from ivory_spark.session import get_spark

    IR_old = load_by_path("ir_old", os.path.join(HEAD, "ivory_spark/ops/ir_relational.py"))
    curate_old_mod = load_by_path("curate_old", os.path.join(HEAD, "ivory_spark/ops/curate.py"))

    spark = get_spark("ab-r06", cores=32, shuffle_partitions=32)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ivory_spark.sources.testdata import read_table

    docs = read_table(spark, sf_dir, "documents")
    corpus = spark.read.parquet("/tmp/ivory_bench_corpus_500000/corpus.parquet")
    cdocs = corpus.select(
        F.abs(F.xxhash64("repo", "path", "commit")).alias("doc_id"),
        F.col("content").alias("text"),
    )
    corpus50 = spark.read.parquet("/tmp/ivory_bench_corpus_50000/corpus.parquet")

    cases = {}
    if not which or "ir_bm25" in which:
        cases["ir_bm25_old"] = lambda: IR_old.bm25_top10(spark, docs, IR_old.GATE_QUERIES).collect()
        cases["ir_bm25_new"] = lambda: IR_new.bm25_top10(spark, docs, IR_new.GATE_QUERIES).collect()
    if not which or "curate" in which:
        kw = dict(
            min_quality=0.2, max_dup_line_frac=None, max_top_ngram_char_frac=None,
            exact_dedup=True, strip_dup_substrings_k=20, redact=True,
            split_weights={"train": 98.0, "val": 1.0, "test": 1.0},
        )
        cases["curate_old"] = lambda: curate_old_mod.curate_corpus(cdocs, **kw).count()
        cases["curate_new"] = lambda: curate_new(cdocs, **kw).count()
    if not which or "docmap" in which:
        # time to a real parquet write (the stage's actual action)
        def run_docmap(fn, tag):
            out = f"/tmp/ab_docmap_{tag}"
            shutil.rmtree(out, ignore_errors=True)
            dm, n, pinned = fn(spark, corpus50, 8)
            dm.write.mode("overwrite").parquet(out)
            pinned.unpersist()
            shutil.rmtree(out, ignore_errors=True)
            return n

        docmap_old_mod = load_by_path("build_old", os.path.join(HEAD, "ivory_spark/index/build.py"))
        cases["docmap_old"] = lambda: run_docmap(docmap_old_mod.build_docmap, "old")
        cases["docmap_new"] = lambda: run_docmap(docmap_new, "new")

    results = {k: [] for k in cases}
    for k, fn in cases.items():  # warm each once
        fn()
    for r in range(reps):
        for k, fn in cases.items():
            spark.sparkContext.setJobDescription(f"{k} rep{r}")
            t0 = time.monotonic()
            fn()
            results[k].append(round(time.monotonic() - t0, 3))
    for k, v in results.items():
        print(f"{k}: min={min(v)} samples={v}")
    spark.stop()


if __name__ == "__main__":
    main()
