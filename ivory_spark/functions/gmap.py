"""grouped_apply: groupBy(keys).applyInPandas with one Python dispatch
per PARTITION instead of per group.

Spark's FlatMapGroupsInPandas round-trips one Arrow batch per group;
for kernels invoked over many tiny groups (a 15-query WAND batch over a
32-shard grid is ~480 groups of a handful of rows) the per-group
dispatch tax (~8 ms, see CLAUDE.md) dwarfs the kernel. This helper
reproduces the same (hash-partition by keys, all rows of a group in one
call) contract with repartition + sortWithinPartitions + mapInPandas,
splitting groups inside each partition stream — the same
carry-across-Arrow-batches pattern index/build.encode_partition uses.

The group function receives (key_tuple, pandas.DataFrame) exactly like
applyInPandas's two-argument form. Row order within a group follows the
partition sort by the key columns only — unspecified beyond that, same
as applyInPandas.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame


def grouped_apply(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    schema: str,
    partitions: int | None = None,
) -> DataFrame:
    if partitions is None:
        try:
            partitions = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
        except ValueError:  # e.g. "auto"
            partitions = 32
    sdf = df.repartition(partitions, *keys).sortWithinPartitions(*keys)

    def emit(body: pd.DataFrame):
        outs = []
        # dropna=False: applyInPandas keeps null-keyed groups, so we do
        # too (no current caller has nullable keys, but don't diverge)
        for key, g in body.groupby(keys, sort=False, dropna=False):
            key_t = key if isinstance(key, tuple) else (key,)
            out = fn(key_t, g.reset_index(drop=True))
            if out is not None and len(out):
                outs.append(out)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    def stream(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                continue
            same_as_last = (pdf[keys] == pdf[keys].iloc[-1]).all(axis=1).to_numpy()
            if same_as_last.all():
                carry = pdf  # the whole batch is one (possibly straddling) group
                continue
            tail_start = n - int(same_as_last[::-1].argmin())
            carry = pdf.iloc[tail_start:]
            yield from emit(pdf.iloc[:tail_start])
        if carry is not None and len(carry):
            yield from emit(carry)

    return sdf.mapInPandas(stream, schema)


def spread_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Raise scan-bound parallelism to the session's shuffle parallelism
    before CPU-heavy per-row work.

    A small parquet input is often one row group — unsplittable, so the
    scan is ONE task no matter how many cores the session has, and every
    pre-exchange projection (hashing, cosine folds, tokenization) runs
    serially (measured: the 500k-doc 10x minhash block spent ~13 s of a
    ~15 s pipeline on a 2-task signature stage). Round-robin repartition
    to the shuffle parallelism unlocks the cores; when the input already
    has at least that many partitions (any real at-scale table) this is
    a NO-OP — scale-adaptive, not a local-mode constant.
    """
    if min_partitions is None:
        try:
            min_partitions = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
        except ValueError:
            min_partitions = 32
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)
