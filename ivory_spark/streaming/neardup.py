"""Streaming near-duplicate detection — a custom stateful operator
(applyInPandasWithState) over minhash-LSH band buckets.

The batch pipeline (ops/dedup.py: sign → band → bucket-join → verify)
needs all documents at once; on an ingest stream the same shape becomes
stateful: each (band, bucket-key) group keeps the documents previously
seen in that bucket as GroupState, and every arriving document that
lands in a non-empty bucket is emitted as a near-dup CANDIDATE against
the earliest occupant (exact-verification happens downstream or at
compaction, as in the batch path). This is the streaming arm of the
reference's LSH pwsim subsystem (ivory/lsh/pwsim/cl/
CLSlidingWindowPwsim.java:50-367 — the sorted sliding window becomes
keyed state on the bucket key).

State is bounded two ways: per bucket, the doc list is FIFO-capped
(max_state — the streaming twin of the batch path's max_bucket skew
guard) with a fixed-size bloom filter over EVICTED ids so at-least-once
re-delivery of aged-out docs is recognized instead of re-emitted as
fresh candidates; across buckets, pass state_ttl_minutes on long-running streams
to attach a processing-time TTL per bucket state (removed on timeout) so
the state store does not grow with every bucket key ever seen — near-dups
beyond the TTL horizon are caught by batch compaction (the same division
of labor as streaming_exact_dedup's watermark). state_ttl_minutes=None
(default) uses NoTimeout: ProcessingTimeTimeout makes availableNow
drains hang in this PySpark build (verified), so tests and bounded
backfills must run without TTL.

Signatures are native column expressions over the SAME hash formula as
the batch minhash_signatures (ops/dedup.portable_hash — md5-based, so
DuckDB-reproducible), asserted band-key-equal in tests, so
stream-flagged candidates agree with batch-computed ones. No Python UDF
runs in the signature stage: the per-token seeded hashes are
F.transform/F.array_min lambdas, JVM-evaluated per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MINHASH_N = 12
BAND_SIZE = 3


def band_rows(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    n_hashes: int = MINHASH_N,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """(doc_id, band, bkey): one row per LSH band per document, computed
    row-locally (no groupBy, no Python UDF — composes onto an unbounded
    stream). The minhash is min over the doc's distinct tokens of the
    seeded portable_hash, identical to the batch minhash_signatures
    aggregation; all bands emit from ONE posexplode pass."""
    from ivory_spark.ops.dedup import _tokens, portable_hash

    toks = F.array_distinct(_tokens(F.col(text_col)))

    # closure factory, NOT `lambda t, j=j`: pyspark gives a two-arg
    # transform lambda (element, index) — a defaulted second param would
    # silently receive the array index instead of the seed
    def _min_hash(j: int):
        return F.array_min(F.transform(toks, lambda t: portable_hash(t, j)))

    sig = [_min_hash(j) for j in range(n_hashes)]
    n_bands = n_hashes // band_size
    keys = F.array(
        *[
            F.concat_ws(
                "_",
                *[sig[b * band_size + j].cast("string") for j in range(band_size)],
            )
            for b in range(n_bands)
        ]
    )
    return (
        stream.filter(F.col(id_col).isNotNull() & (F.size(toks) > 0))
        .select(F.col(id_col).alias("doc_id"), F.posexplode(keys).alias("band", "bkey"))
    )


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("bkey", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("first_seen_doc", T.LongType()),
        T.StructField("n_prior", T.IntegerType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.ArrayType(T.LongType())),
        # bloom filter over ids evicted from the FIFO window (fixed
        # evicted_guard_bits/8 bytes per bucket, monotone)
        T.StructField("evicted", T.BinaryType()),
    ]
)


def streaming_neardup_candidates(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    n_hashes: int = MINHASH_N,
    band_size: int = BAND_SIZE,
    max_state: int = 64,
    state_ttl_minutes: int | None = None,
    evicted_guard_bits: int = 1024,
) -> DataFrame:
    """Stateful near-dup candidate stream: one output row per (doc, band)
    whose bucket already held documents — (band, bkey, doc_id,
    first_seen_doc, n_prior). Dedupe/aggregate downstream to taste.

    evicted_guard_bits: ids evicted from the FIFO window are remembered
    in a fixed-size per-bucket bloom filter (ops/bloom.py primitives), so
    an at-least-once RE-delivery of a doc that has aged past the window
    is recognized and NOT re-emitted as a fresh candidate. Cost: a
    constant bits/8 bytes per bucket state. False positives (rate
    bounded by the bloom geometry, ~(evicted/bits)^3 shape) suppress a
    genuinely-new doc's candidates in THAT band only — the doc's other
    n_bands-1 band buckets still pair it, so recall loss is negligible
    while re-delivery floods are fully damped. 0 disables the guard
    (pre-guard behavior). TTL expiry drops the bloom with the bucket,
    matching the documented division of labor with batch compaction."""
    import numpy as np

    from pyspark.sql.streaming.state import GroupStateTimeout

    from ivory_spark.ops.bloom import bloom_from_docnos, bloom_test

    bands = band_rows(stream, id_col, text_col, n_hashes, band_size)
    # fractional minutes allowed (tests use seconds-scale TTLs)
    ttl_ms = int(state_ttl_minutes * 60_000) if state_ttl_minutes else None

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns=["band", "bkey", "doc_id", "first_seen_doc", "n_prior"]
            )
            return
        band, bkey = key
        seen: list[int] = list(state.get[0]) if state.exists else []
        evicted_bm: bytes = bytes(state.get[1] or b"") if state.exists else b""
        out = []
        for pdf in pdfs:
            for doc in pdf["doc_id"]:
                doc = int(doc)
                if doc in seen:
                    continue  # at-least-once re-delivery: never self-pair
                if evicted_bm and bloom_test(
                    evicted_bm, np.array([doc], dtype=np.uint64), 3
                )[0]:
                    continue  # re-delivery of an aged-out doc: already paired
                if seen:
                    out.append((band, bkey, doc, seen[0], len(seen)))
                seen.append(doc)
                if len(seen) > max_state:
                    # FIFO bound per bucket; evicted ids go to the bloom
                    # so their re-deliveries stay recognized. Note
                    # first_seen_doc still drifts to the oldest RETAINED
                    # doc after eviction.
                    cut = np.array(seen[:-max_state], dtype=np.uint64)
                    if evicted_guard_bits:
                        add = bloom_from_docnos(cut, evicted_guard_bits, 3)
                        evicted_bm = (
                            np.bitwise_or(
                                np.frombuffer(evicted_bm, dtype=np.uint8),
                                np.frombuffer(add, dtype=np.uint8),
                            ).tobytes()
                            if evicted_bm
                            else add
                        )
                    seen = seen[-max_state:]
        state.update((seen, evicted_bm))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            out, columns=["band", "bkey", "doc_id", "first_seen_doc", "n_prior"]
        )

    return bands.groupBy("band", "bkey").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
