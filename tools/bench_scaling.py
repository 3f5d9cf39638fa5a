"""Scaling-efficiency evidence: run the identical index-build + query job
at two parallelism levels (local[N] and local[4N]) in FRESH JVMs and
report throughput at both plus efficiency = T(N)/T(4N)/4 ... precisely:
eff = (throughput_4N) / (4 * throughput_N).

No real cluster exists in this sandbox (BASELINE.md), so parallelism
levels stand in for cluster sizes per the driver's instruction. Results
are written to BENCH.md.

Usage: python tools/bench_scaling.py [n_low] [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from ivory_spark.session import get_spark
from ivory_spark.corpus import QUERY_SET
from ivory_spark.index.build import IndexConfig, build_index
from ivory_spark.index.reader import open_index
from ivory_spark.query.wand import bm25_topk_wand

cpus = {cpus}
corpus_path = {corpus_path!r}
root = "/tmp/ivory_scale_idx_{cpus}"
shutil.rmtree(root, ignore_errors=True)
spark = get_spark("scale", cores=cpus, shuffle_partitions=cpus)
t0 = time.monotonic()
props = build_index(spark, corpus_path, root,
                    IndexConfig(salt_threshold=props_salt, n_shards=cpus))
build = time.monotonic() - t0
index = open_index(spark, root)
bm25_topk_wand(spark, index, QUERY_SET[:2], k=10).collect()
t0 = time.monotonic()
bm25_topk_wand(spark, index, QUERY_SET, k=10).collect()
q = time.monotonic() - t0
print("RESULT " + json.dumps({{"cpus": cpus, "build_sec": build,
      "docs_per_sec": props["n_docs"] / build, "query_batch_sec": q}}))
"""


def run_at(cpus: int, corpus_path: str, n_docs: int) -> dict:
    code = JOB.format(repo=REPO, cpus=cpus, corpus_path=corpus_path).replace(
        "props_salt", str(n_docs // 10)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT at cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    from bench import ensure_bench_corpus  # noqa: E402

    corpus_path = ensure_bench_corpus(f"/tmp/ivory_bench_corpus_{n_docs}", n_docs)

    lo = run_at(n_low, corpus_path, n_docs)
    hi = run_at(n_low * 4, corpus_path, n_docs)
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    q_speedup = lo["query_batch_sec"] / hi["query_batch_sec"]
    result = {
        "n_docs": n_docs,
        "low": lo,
        "high": hi,
        "build_scaling_efficiency": round(eff, 3),
        "query_batch_speedup": round(q_speedup, 3),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
