"""IVF ANN recall grid: recall@5 vs brute-force cosine at ~20k vectors
for (n_centroids, nprobe) in {16,64} x {2,4,8}, sampled centroids vs
Lloyd-refined (lloyd_iters=2). Published in BENCH.md (VERDICT r4 item 6).

The 20k set replicates the sf embeddings 10x with a deterministic
per-replica element jitter (cosine ties between identical replicas
would otherwise make recall against an id-tie-broken brute-force top-k
ill-defined).

Usage: python tools/ivf_recall.py [sf_dir] — run solo (CLAUDE.md:
concurrent JVMs skew nothing here numerically, but keep bench hygiene).
Writes IVF_RECALL.json at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from ivory_spark.ops.similarity import brute_force_topk, ivf_topk, query_vectors
    from ivory_spark.session import get_spark
    from ivory_spark.sources.testdata import read_table

    spark = get_spark("ivf-recall", cores=8, shuffle_partitions=8)
    emb = read_table(spark, sf_dir, "embeddings")
    reps = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")
    emb10 = (
        emb.select("*", reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda v, i: v
                + F.lit(0.01) * F.col("rep") * F.sin(F.col("vec_id") + i),
            ).alias("embedding"),
        )
        .persist()
    )
    n = emb10.count()
    qv = query_vectors(spark, emb10, 10).persist()
    qv.count()

    k = 5
    truth = {}
    for r in brute_force_topk(emb10, qv, k=k).collect():
        truth.setdefault(r["qid"], set()).add(r["vec_id"])

    out = {"n_vectors": n, "k": k, "grid": []}
    for n_centroids in (16, 64):
        for nprobe in (2, 4, 8):
            for lloyd in (0, 2):
                got = {}
                for r in ivf_topk(
                    emb10, qv, k=k, n_centroids=n_centroids, nprobe=nprobe,
                    lloyd_iters=lloyd,
                ).collect():
                    got.setdefault(r["qid"], set()).add(r["vec_id"])
                recalls = [
                    len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
                ]
                rec = round(sum(recalls) / len(recalls), 4)
                out["grid"].append(
                    {"n_centroids": n_centroids, "nprobe": nprobe,
                     "lloyd_iters": lloyd, "recall_at_5": rec}
                )
                print(f"centroids={n_centroids} nprobe={nprobe} lloyd={lloyd} "
                      f"recall@5={rec}", file=sys.stderr)

    with open(os.path.join(REPO, "IVF_RECALL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
