"""IVF cell-balance probe: the companion of tools/ivf_recall.py.

Reports, for (n_centroids, lloyd_iters) in {16,64} x {0,2} over the same
20k-vector set, the cell-size distribution (max-cell fraction and the
fraction of vectors in the top-2 cells). Recall alone flatters the
sampled quantizer — a giant cell catches most neighbors by volume; at
scale the max cell bounds the scan cost per probe, which is what IVF
exists to shrink. Writes IVF_BALANCE.json at the repo root.

Usage: python tools/ivf_balance.py [sf_dir]
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

    from ivory_spark.ops.similarity import _cell_expr, ivf_centroids
    from ivory_spark.session import get_spark
    from ivory_spark.sources.testdata import read_table

    spark = get_spark("ivf-balance", cores=8, shuffle_partitions=8)
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

    out = {"n_vectors": n, "configs": []}
    for n_centroids in (16, 64):
        for lloyd in (0, 2):
            cents = ivf_centroids(emb10, n_centroids, lloyd_iters=lloyd)
            sizes = sorted(
                (
                    r["c"]
                    for r in emb10.select(
                        _cell_expr(F.col("embedding"), cents).alias("cell")
                    )
                    .groupBy("cell")
                    .agg(F.count("*").alias("c"))
                    .collect()
                ),
                reverse=True,
            )
            out["configs"].append(
                {
                    "n_centroids": n_centroids,
                    "lloyd_iters": lloyd,
                    "nonempty_cells": len(sizes),
                    "max_cell_frac": round(sizes[0] / n, 4),
                    "top2_frac": round(sum(sizes[:2]) / n, 4),
                }
            )
            print(out["configs"][-1], file=sys.stderr)

    with open(os.path.join(REPO, "IVF_BALANCE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
