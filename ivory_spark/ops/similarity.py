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
    j = queries.crossJoin(emb).filter(F.col(qid_col) != F.col(id_col))
    j = j.withColumn("cosine", F.round(cosine_expr(F.col(qvec_col), F.col(vec_col)), 6))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def srp_bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Sign-random-projection bucket id: bit b = sign(vec · plane_b)."""
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
) -> DataFrame:
    """Approximate cosine top-k: candidates = same SRP bucket only.
    At 100 TB the bucket equi-join replaces the cross product; recall is
    tuned via n_planes (fewer planes → bigger buckets → higher recall)."""
    planes = _hyperplanes(dim, n_planes)
    e = emb.withColumn("bucket", srp_bucket_expr(F.col(vec_col), planes))
    q = queries.withColumn("bucket", srp_bucket_expr(F.col(qvec_col), planes))
    j = q.join(e, "bucket").filter(F.col(qid_col) != F.col(id_col))
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
