"""Weighted document vectors + forward-index access (Ivory P9 / S10).

Reference behavior reproduced:
- BuildWeightedIntDocVectors (ivory/core/preprocess/
  BuildWeightedIntDocVectors.java:146-175): IntDocVector →
  termid → float weight map using a scoring model (BM25 weights,
  pwsim/score/Bm25.java), optionally L2-normalized — the input to
  pairwise-similarity pipelines;
- forward-index random access (ivory/core/data/document/
  IntDocVectorsForwardIndex.java): docno → doc vector; on Spark this is
  a predicate-pushdown filter on the tdf artifact, no byte offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ivory_spark.index.reader import Index


def int_doc_vectors(spark, index: Index) -> DataFrame:
    """(docno, termid, tf, dl) rows — the forward index content."""
    import os

    tdf = spark.read.parquet(os.path.join(index.root, "tdf"))
    return tdf.join(index.dictionary.select("term", "termid"), "term").select(
        "docno", "termid", "tf", "dl"
    )


def fetch_doc_vector(spark, index: Index, docno: int) -> DataFrame:
    """Random access by docno (pushdown filter replaces offset seek)."""
    return int_doc_vectors(spark, index).filter(F.col("docno") == docno).orderBy("termid")


def weighted_doc_vectors(
    spark, index: Index, normalize: bool = True, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """(docno, termid, weight): BM25 term weights per document, optionally
    L2-normalized per doc (the 'normalize' flag of the reference job)."""
    v = int_doc_vectors(spark, index).join(
        index.dictionary.select("termid", "df"), "termid"
    )
    n = index.n_docs
    avgdl = index.avgdl
    idf = F.log((F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = ((k1 + 1) * F.col("tf")) / (
        k1 * ((1 - b) + b * F.col("dl") / F.lit(avgdl)) + F.col("tf")
    )
    w = v.withColumn("weight", idf * tf_part)
    if normalize:
        from pyspark.sql import Window

        norm = F.sqrt(F.sum(F.col("weight") * F.col("weight")).over(Window.partitionBy("docno")))
        w = w.withColumn("weight", F.col("weight") / norm)
    return w.select("docno", "termid", F.col("weight").cast("float").alias("weight"))
