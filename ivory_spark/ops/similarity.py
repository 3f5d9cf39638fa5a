"""Similarity search over an embedding column (array<float>).

The reference's analogue is brute-force pairwise similarity ranking over
weighted doc vectors (ivory/lsh/eval/BruteForcePwsim.java:1-378) and
random-projection LSH signatures (ivory/lsh/projection/
ComputeSignaturesRandom.java). Here:

- brute_force_topk — exact cosine top-k per query vector: cross join of a
  (small, broadcast) query set against the corpus, JVM-side dot product
  (zip_with + aggregate, no Python), window top-k. The correctness
  baseline.
- lsh_bucketed_topk — the scale path: sign-random-projection buckets
  (deterministic md5-derived hyperplanes) so each query only joins its
  own bucket (+ optional multiprobe); recall<1.0 by design, verified
  against the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F


def cosine_expr(va: Column, vb: Column) -> Column:
    """JVM-side cosine similarity between two array<numeric> columns."""
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(va, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(vb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k: (qid, rank, vec_id, cosine). Excludes self-match
    when qid == vec_id. Tie-break: cosine desc, vec_id asc."""
    from ivory_spark.functions.gmap import spread_partitions

    j = queries.crossJoin(spread_partitions(emb)).filter(F.col(qid_col) != F.col(id_col))
    j = j.withColumn("cosine", F.round(cosine_expr(F.col(qvec_col), F.col(vec_col)), 6))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def rademacher_planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """±1 (Rademacher) SRP hyperplanes derived from md5, so an
    independent SQL engine can rebuild the identical planes and bucket
    assignment for the correctness gate (same portability rationale as
    dedup.portable_hash). Rademacher projections preserve the SRP
    collision-probability guarantee (1 - angle/pi)."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for b in range(n_planes):
        for d in range(dim):
            h = hashlib.md5(f"plane:{seed}:{b}:{d}".encode()).hexdigest()
            out[b, d] = 1.0 if (int(h[0], 16) & 1) else -1.0
    return out


def srp_bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Sign-random-projection bucket id: bit b = sign(vec · plane_b).
    The dot product is an ordered left fold over dimensions (F.aggregate)
    so DuckDB's list_reduce reproduces the same rounding, hence the same
    sign at the bucket boundary."""
    bits = []
    for bidx, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit(2**bidx)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).cast("int")


def probe_buckets_expr(vec: Column, planes: np.ndarray, multiprobe: int = 1) -> Column:
    """Array of bucket ids to probe: the vector's own bucket plus every
    bucket within Hamming distance `multiprobe` of it (bit flips of the
    SRP signature). Multiprobe trades one extra candidate join fan-out
    for recall — the standard LSH recall lever that avoids building more
    tables."""
    from itertools import combinations

    base = srp_bucket_expr(vec, planes)
    n_planes = len(planes)
    masks = [0]
    for h in range(1, multiprobe + 1):
        for bits in combinations(range(n_planes), h):
            masks.append(sum(1 << b for b in bits))
    return F.array(*[base.bitwiseXOR(F.lit(m)) for m in masks])


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an SRP bucket with the
    query (query side multiprobes its Hamming-<=multiprobe neighbor
    buckets for recall). At 100 TB the bucket equi-join replaces the
    cross product; recall is tuned via n_planes and multiprobe."""
    from ivory_spark.functions.gmap import spread_partitions

    planes = rademacher_planes(dim, n_planes)
    e = spread_partitions(emb).withColumn("bucket", srp_bucket_expr(F.col(vec_col), planes))
    q = queries.withColumn(
        "bucket", F.explode(probe_buckets_expr(F.col(qvec_col), planes, multiprobe))
    )
    j = q.join(e, "bucket").filter(F.col(qid_col) != F.col(id_col))
    j = j.dropDuplicates([qid_col, id_col])
    j = j.withColumn("cosine", F.round(cosine_expr(F.col(qvec_col), F.col(vec_col)), 6))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def query_vectors(spark: SparkSession, emb: DataFrame, n: int = 10) -> DataFrame:
    """First n vectors (by id) reused as the query set — deterministic."""
    return (
        emb.orderBy("vec_id")
        .limit(n)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )


# ---------------------------------------------------------------------------
# IVF-flat (inverted-file) ANN: the coarse-quantizer counterpart to the
# SRP-LSH path. Centroids are a deterministic md5-ranked sample of the
# corpus vectors (sampled-centroid IVF initialization; NO Lloyd
# iterations, so an independent SQL engine reproduces the exact same
# cells — the same portability rationale as rademacher_planes). Every
# vector is assigned to its max-cosine centroid; queries probe the
# nprobe nearest cells, so the search joins on cell id instead of
# cross-producting the corpus. Reference analogue: the lsh/pwsim
# signature-blocking family (ivory/lsh/), re-expressed as an IVF.
# ---------------------------------------------------------------------------


def _fold_cosine(vec: Column, lits: "list[float]") -> Column:
    """Cosine of a vector column against a literal centroid, with the dot
    and norms computed as ORDERED left folds (F.aggregate) so DuckDB's
    list_reduce reproduces the identical float64 value — assignment
    argmax then agrees at cell boundaries."""
    arr = F.array(*[F.lit(float(x)) for x in lits])
    dot = F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    # centroid norm as an ORDERED left fold (np.sum is pairwise and would
    # round differently than DuckDB's list_reduce)
    acc = 0.0
    for x in lits:
        acc += float(x) * float(x)
    import math

    return dot / (nv * F.lit(math.sqrt(acc)))


def ivf_centroids(
    emb: DataFrame, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    lloyd_iters: int = 0,
) -> "list[tuple[int, list[float]]]":
    """Deterministic centroid sample: the n vectors whose md5(id) ranks
    lowest (ties by id). Returns [(centroid_idx, vector)] — small, meant
    to be broadcast as literals.

    lloyd_iters > 0 refines the sample with that many Lloyd iterations
    (spherical k-means shape: assign by max cosine, recenter on the
    element-wise mean — cosine is scale-invariant so the unnormalized
    mean yields identical assignments). Each iteration is one JVM-side
    assignment pass + one (cell, idx) aggregation; empty cells keep
    their previous centroid. Deterministic up to float64 summation
    order: F.avg accumulates in partition order, so refined centroids
    (and cell assignments exactly at ties) can differ across partition
    counts — the gates pin lloyd_iters=0, the bit-reproducible mode
    (ADVICE r05). The default (0) stays the SQL-reproducible sampled
    mode the gates pin; Lloyd mode trades that for the recall/balance a
    real IVF index wants at scale (recall grid: BENCH.md)."""
    from ivory_spark.ops.dedup import portable_hash

    h = portable_hash(F.col(id_col).cast("string"), 0)
    rows = (
        emb.select(F.col(id_col), F.col(vec_col), h.alias("_h"))
        .orderBy("_h", id_col)
        .limit(n_centroids)
        .collect()
    )
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)]
    for _ in range(lloyd_iters):
        means = (
            emb.withColumn("cell", _cell_expr(F.col(vec_col), cents))
            .select("cell", F.posexplode(vec_col).alias("idx", "x"))
            .groupBy("cell", "idx").agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("idx", "m"))).alias("pairs"))
            .collect()
        )
        new = {r["cell"]: [float(p["m"]) for p in r["pairs"]] for r in means}
        cents = [(i, new.get(i, v)) for i, v in cents]
    return cents


def _cell_expr(vec: Column, cents) -> Column:
    """Max-cosine centroid index (first index wins ties — both engines
    break ties the same way via position-of-max)."""
    cos_arr = F.array(*[_fold_cosine(vec, v) for _, v in cents])
    return (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int")


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    lloyd_iters: int = 0,
) -> DataFrame:
    """Approximate cosine top-k via IVF cells: vectors live in their
    max-cosine cell; each query scans its nprobe highest-cosine cells.
    Recall < 1.0 by design (verified vs brute force in tests); the cell
    equi-join replaces the cross product at scale. lloyd_iters refines
    the sampled centroids (see ivf_centroids; gates pin the default 0)."""
    from ivory_spark.functions.gmap import spread_partitions

    cents = ivf_centroids(emb, n_centroids, id_col, vec_col, lloyd_iters)
    e = spread_partitions(emb).withColumn("cell", _cell_expr(F.col(vec_col), cents))
    qcos = F.array(*[_fold_cosine(F.col(qvec_col), v) for _, v in cents])
    # top-nprobe cells: sort (cosine desc, idx asc) via struct sort
    probe = F.slice(
        F.transform(
            F.reverse(
                F.array_sort(
                    F.transform(
                        qcos, lambda c, i: F.struct(c.alias("c"), (-i).alias("ni"))
                    )
                )
            ),
            lambda s: -s["ni"],
        ),
        1,
        nprobe,
    )
    q = queries.withColumn("cell", F.explode(probe)).withColumn(
        "cell", F.col("cell").cast("int")
    )
    j = q.join(e, "cell").filter(F.col(qid_col) != F.col(id_col))
    j = j.dropDuplicates([qid_col, id_col])
    j = j.withColumn("cosine", F.round(cosine_expr(F.col(qvec_col), F.col(vec_col)), 6))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )
