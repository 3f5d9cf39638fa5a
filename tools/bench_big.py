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
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ivory_spark.session import get_spark

    from bench import big_block, host_probe, loadavg1  # repo-root bench.py

    spark = get_spark("ivory-bench-big", cores=cpus, shuffle_partitions=cpus)
    load_pre = loadavg1()
    host_speedup = host_probe(spark, cpus)
    build_partitions = max(8, min(cpus, int(round(host_speedup * 1.5))))

    out = big_block(spark, n_docs, cpus, sf_dir, build_partitions)
    out["host_cpu_ceiling_speedup"] = round(host_speedup, 2)
    out["loadavg_pre"] = load_pre
    out["loadavg_post"] = loadavg1()

    with open(os.path.join(REPO, "BENCH_BIG.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
