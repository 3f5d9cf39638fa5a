"""Readers for the driver-generated test tables (TESTDATA.md).

The production source is an Iceberg table of source-code repositories
(BASELINE.json input_hint); Iceberg jars are not in this container, so
the connector is parquet with the same schema contract. `read_table`
centralizes the access path so an Iceberg reader can be swapped in
behind one function (import-gated, per environment constraints).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the documents table to the engine's corpus schema
    (repo, path, commit, lang, content)."""
    from pyspark.sql import functions as F

    d = read_table(spark, sf_dir, "documents")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.substring(F.sha2(F.col("text"), 256), 1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
