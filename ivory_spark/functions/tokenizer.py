"""Tokenization — the analogue of Ivory's tokenize package.

Reference behavior reproduced (not copied):
- term → 1-based positions map per document
  (ivory/core/tokenize/DocumentProcessingUtils.java:67-123);
- zero-length / overlong (>= 127 chars, Byte.MAX_VALUE) tokens dropped
  (DocumentProcessingUtils.java:79-82);
- terms whose tf exceeds Short.MAX_VALUE = 32767 are dropped from the
  document entirely (DocumentProcessingUtils.java:42,102-113);
- doclength = sum of tf over *kept* terms (DocumentProcessingUtils.java:94-114).

Two implementations with identical semantics (tested equal):

1. ``tokens_expr`` — pure JVM column expression (``regexp_extract_all``
   inside whole-stage codegen). The fast path for stats/index builds at
   100 TB: no Python in the loop at all.
2. ``term_doc_vectors`` — Arrow-vectorized pandas UDF emitting
   array<struct<term, positions>> (the TermDocVector shape,
   ivory/core/data/document/TermDocVector.java) for consumers that need
   positions (SD/FD proximity — stretch goal).

``tokenize_py`` is the single-node reference used by the numpy oracle;
all three share TOKEN_PATTERN / MAX_TOKEN_LEN / MAX_TF.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

# code tokens: identifiers or integer literals, over lowercased text
TOKEN_PATTERN = r"[a-z_][a-z0-9_]*|[0-9]+"
MAX_TOKEN_LEN = 126  # tokens of length >= 127 dropped (Byte.MAX_VALUE)
MAX_TF = 32767  # Short.MAX_VALUE tf cap — overflowing terms dropped

_RX = re.compile(TOKEN_PATTERN)


def tokenize_py(content: str) -> list[str]:
    """Reference tokenizer: lowercased token stream, overlong dropped."""
    if not content:
        return []
    return [t for t in _RX.findall(content.lower()) if len(t) <= MAX_TOKEN_LEN]


def term_positions_py(content: str) -> dict[str, list[int]]:
    """term -> 1-based positions; tf-overflow terms dropped."""
    pos: dict[str, list[int]] = defaultdict(list)
    for i, t in enumerate(tokenize_py(content), start=1):
        pos[t].append(i)
    return {t: p for t, p in pos.items() if len(p) <= MAX_TF}


def doclen_py(content: str) -> int:
    return sum(len(p) for p in term_positions_py(content).values())


def tokens_expr(content: Column) -> Column:
    """JVM-side token array (codegen; no Python)."""
    toks = F.regexp_extract_all(F.lower(content), F.lit(TOKEN_PATTERN), 0)
    return F.filter(toks, lambda t: F.length(t) <= MAX_TOKEN_LEN)


def doc_terms(df: DataFrame, docno: str = "docno", content: str = "content") -> DataFrame:
    """(docno, term, tf) with Ivory's tf-overflow drop — fully JVM-side.

    This is the map phase of BuildTermDocVectors re-expressed as
    explode + groupBy; Catalyst supplies partial aggregation.
    """
    toks = df.select(F.col(docno), F.explode(tokens_expr(F.col(content))).alias("term"))
    tf = toks.groupBy(docno, "term").agg(F.count(F.lit(1)).cast("int").alias("tf"))
    return tf.filter(F.col("tf") <= MAX_TF)


def doc_terms_positional(
    df: DataFrame, docno: str = "docno", content: str = "content"
) -> DataFrame:
    """(docno, term, tf, positions) with 1-based positions over the token
    stream (DocumentProcessingUtils.java:84-92) — fully JVM-side via
    posexplode + sort_array(collect_list)."""
    toks = df.select(
        F.col(docno), F.posexplode(tokens_expr(F.col(content))).alias("pos0", "term")
    )
    grouped = toks.groupBy(docno, "term").agg(
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.sort_array(F.collect_list((F.col("pos0") + 1).cast("int"))).alias("positions"),
    )
    return grouped.filter(F.col("tf") <= MAX_TF)


_TDV_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("positions", T.ArrayType(T.IntegerType())),
        ]
    )
)


@F.pandas_udf(_TDV_SCHEMA)
def _tdv_udf(content: pd.Series) -> pd.Series:
    out = []
    for c in content:
        tp = term_positions_py(c or "")
        out.append([{"term": t, "positions": p} for t, p in sorted(tp.items())])
    return pd.Series(out)


def term_doc_vectors(df: DataFrame, docno: str = "docno", content: str = "content") -> DataFrame:
    """(docno, terms: array<struct<term, positions>>, doclen) via Arrow UDF."""
    out = df.select(F.col(docno), _tdv_udf(F.col(content)).alias("terms"))
    return out.withColumn(
        "doclen",
        F.aggregate("terms", F.lit(0), lambda acc, x: acc + F.size(x["positions"])),
    )
