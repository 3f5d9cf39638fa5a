"""Round benchmark: index-build throughput + BM25 query latency + the
relational gate queries, on local[$SPARK_GRAFT_CPUS] over
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., plus diagnostic keys (docs_per_sec, query latencies)}.

The headline engine numbers use a cached synthetic source-code corpus
(BENCH_DOCS docs) because the testdata documents table is small; corpus
generation is excluded from timings (it is input, not engine work).
Scaling-efficiency evidence (local[8] vs local[32]) is produced by
tools/bench_scaling.py and recorded in BENCH.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_DOCS = int(os.environ.get("IVORY_BENCH_DOCS", "50000"))
# Large-scale block (>=500k-doc build + WAND + 10x dedup + 10x IVF),
# recorded under the "big" key OUTSIDE the headline total so round-over-
# round comparisons stay stable. Default ON (the driver record needs the
# datapoint); set IVORY_BENCH_BIG_DOCS=0 to skip when iterating locally.
BIG_DOCS = int(os.environ.get("IVORY_BENCH_BIG_DOCS", "500000"))

_CLK_TCK = os.sysconf("SC_CLK_TCK")


def proc_tree_cpu_sec() -> float:
    """CPU seconds (utime+stime) consumed by this process and every live
    descendant — the Spark JVM and its forked python/Arrow workers all
    descend from this driver. Deltas around a timed section give the
    section's actual CPU work, which is stable across host-load swings
    while wall time is not: that is the evidence that separates "code got
    slower" (cpu_sec grows) from "the sandbox was busy" (cpu_sec flat,
    wall grows). Dead children are missed; Spark workers live for the
    whole run, so section deltas are accurate in practice."""
    ppid_of: dict[int, int] = {}
    cpu_of: dict[int, float] = {}
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(stat) as f:
                data = f.read()
        except OSError:
            continue
        # comm can contain spaces/parens: split at the LAST ')'
        rest = data.rsplit(")", 1)[1].split()
        pid = int(data.split()[0])
        ppid_of[pid] = int(rest[1])  # field 4
        cpu_of[pid] = (int(rest[11]) + int(rest[12])) / _CLK_TCK  # 14+15
    me, total, frontier = os.getpid(), 0.0, [os.getpid()]
    kids: dict[int, list[int]] = {}
    for pid, ppid in ppid_of.items():
        kids.setdefault(ppid, []).append(pid)
    while frontier:
        pid = frontier.pop()
        total += cpu_of.get(pid, 0.0)
        frontier.extend(kids.get(pid, []))
    return total


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def host_probe(spark, cpus: int) -> float:
    """Pure-CPU sha256 probe (no engine code/IO): effective-cores ceiling
    the oversubscribed sandbox delivers right now. 4x rows on cpus
    threads vs 1 thread -> speedup/(cpus/4) = delivered efficiency."""
    import pyspark.sql.functions as F

    probe = spark.range(0, 6_000_000, 1, cpus).select(
        F.sha2(F.col("id").cast("string"), 256).alias("h")
    )
    probe.count()  # warm
    t0 = time.monotonic()
    probe.select(F.max("h")).collect()
    par_sec = time.monotonic() - t0
    one = spark.range(0, 1_500_000, 1, 1).select(
        F.sha2(F.col("id").cast("string"), 256).alias("h")
    )
    t0 = time.monotonic()
    one.select(F.max("h")).collect()
    return 4.0 * (time.monotonic() - t0) / par_sec


def ensure_bench_corpus(path: str, n_docs: int) -> str:
    pq = os.path.join(path, "corpus.parquet")
    if not os.path.exists(pq):
        from ivory_spark.corpus import write_corpus

        write_corpus(path, n_docs, seed=13)
    return pq


def read_stage_walls(index_root: str) -> dict[str, float]:
    out = {}
    for p in sorted(glob.glob(os.path.join(index_root, "_manifests", "*.json"))):
        try:
            with open(p) as f:
                m = json.load(f)
            out[m["stage"]] = m["wall_time_sec"]
        except (OSError, KeyError, json.JSONDecodeError):
            pass
    return out


def big_block(spark, n_docs: int, cpus: int, sf_dir: str,
              build_partitions: int) -> dict:
    """>=500k-doc scale datapoint: build + WAND batch + 10x-replicated
    minhash dedup + 10x IVF ANN. Shared by bench.py (driver-visible,
    under the "big" key) and tools/bench_big.py (solo runs)."""
    import pyspark.sql.functions as F

    from ivory_spark.corpus import QUERY_SET
    from ivory_spark.index.build import IndexConfig, build_index
    from ivory_spark.index.reader import open_index
    from ivory_spark.ops.dedup import minhash_dedup_pairs
    from ivory_spark.ops.similarity import ivf_topk, query_vectors
    from ivory_spark.query.wand import bm25_topk_wand
    from ivory_spark.sources.testdata import read_table

    out: dict = {"n_docs": n_docs, "cpus": cpus,
                 "build_partitions": build_partitions}
    corpus_path = ensure_bench_corpus(
        os.path.join("/tmp", f"ivory_bench_corpus_{n_docs}"), n_docs
    )
    root = os.path.join("/tmp", f"ivory_big_index_{n_docs}_{cpus}")
    shutil.rmtree(root, ignore_errors=True)
    c0, t0 = proc_tree_cpu_sec(), time.monotonic()
    props = build_index(
        spark, corpus_path, root,
        IndexConfig(salt_threshold=n_docs // 10, n_shards=cpus,
                    partitions=build_partitions),
    )
    build_sec = time.monotonic() - t0
    out["build_sec"] = round(build_sec, 3)
    out["build_cpu_sec"] = round(proc_tree_cpu_sec() - c0, 1)
    out["built_docs"] = props["n_docs"]
    out["docs_per_sec"] = round(props["n_docs"] / build_sec, 1)
    out["build_stage_sec"] = read_stage_walls(root)

    index = open_index(spark, root)
    bm25_topk_wand(spark, index, QUERY_SET[:2], k=10).collect()  # warm
    t0 = time.monotonic()
    bm25_topk_wand(spark, index, QUERY_SET, k=10).collect()
    out["wand_batch15_sec"] = round(time.monotonic() - t0, 3)

    docs = read_table(spark, sf_dir, "documents")
    reps = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")
    docs10 = docs.select("*", reps).select(
        (F.col("doc_id") + F.col("rep") * F.lit(1_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
        ).alias("text"),
        "source",
    ).persist()
    out["dedup10x_docs"] = docs10.count()
    t0 = time.monotonic()
    out["dedup10x_pairs"] = minhash_dedup_pairs(
        docs10, threshold=0.8, max_bucket=64
    ).count()
    out["dedup10x_sec"] = round(time.monotonic() - t0, 3)
    docs10.unpersist()

    emb = read_table(spark, sf_dir, "embeddings")
    emb10 = emb.select("*", reps).select(
        (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
        "embedding",
    ).persist()
    out["ivf10x_rows"] = emb10.count()
    qv = query_vectors(spark, emb10, 10)
    ivf_topk(emb10, qv, k=5, n_centroids=16, nprobe=6).collect()  # warm
    t0 = time.monotonic()
    ivf_topk(emb10, qv, k=5, n_centroids=16, nprobe=6).collect()
    out["ivf10x_sec"] = round(time.monotonic() - t0, 3)
    emb10.unpersist()

    # full curation recipe over the same 500k corpus: quality gate +
    # exact dedup + substring strip (k=20) + PII redact + hash split —
    # the end-to-end training-data pipeline number (~15 s at 500k/8cpu)
    from ivory_spark.ops.curate import curate_corpus

    cdocs = spark.read.parquet(corpus_path).select(
        F.abs(F.xxhash64("repo", "path", "commit")).alias("doc_id"),
        F.col("content").alias("text"),
    )
    t0 = time.monotonic()
    out["curate_rows"] = curate_corpus(
        cdocs, min_quality=0.2, max_dup_line_frac=None,
        max_top_ngram_char_frac=None, exact_dedup=True,
        strip_dup_substrings_k=20, redact=True,
        split_weights={"train": 98.0, "val": 1.0, "test": 1.0},
    ).count()
    curate_sec = time.monotonic() - t0
    out["curate_sec"] = round(curate_sec, 3)
    out["curate_docs_per_sec"] = round(n_docs / curate_sec, 1)

    # corpus assembly over the same 500k docs: sequence packing
    # throughput (tokens/s is the number a pretraining pipeline budgets
    # by) and the deterministic global shuffle (bucketed rank — the
    # two-phase pattern's cost is one window + an n_buckets-row collect)
    from ivory_spark.ops.sampling import corpus_shuffle, materialize_sequences

    t0 = time.monotonic()
    agg = (
        materialize_sequences(cdocs, budget=1024, n_shards=cpus * 4)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks"))
        .collect()[0]
    )
    pack_sec = time.monotonic() - t0
    out["pack_seqs"] = agg["n"]
    out["pack_tokens"] = int(agg["toks"])
    out["pack_sec"] = round(pack_sec, 3)
    out["pack_tokens_per_sec"] = round(agg["toks"] / pack_sec, 1)
    t0 = time.monotonic()
    out["shuffle_rows"] = corpus_shuffle(cdocs, n_buckets=256).count()
    out["shuffle_sec"] = round(time.monotonic() - t0, 3)

    # BPE tokenizer over the same 500k corpus: train = one
    # vocabulary-sized word-count shuffle + the driver merge loop
    # (50k-word cap, 256 merges); encode = Arrow-batched, word-memoized
    # merge scans — tokens/s is the tokenizer-throughput number a
    # pipeline budgets by
    from ivory_spark.ops.bpe import encode, train_bpe

    t0 = time.monotonic()
    model = train_bpe(cdocs, n_merges=256, max_words=50_000)
    out["bpe_train_sec"] = round(time.monotonic() - t0, 3)
    out["bpe_vocab"] = len(model.vocab)
    t0 = time.monotonic()
    agg = encode(cdocs, model).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks")
    ).collect()[0]
    enc_sec = time.monotonic() - t0
    out["bpe_tokens"] = int(agg["toks"])
    out["bpe_encode_sec"] = round(enc_sec, 3)
    out["bpe_tokens_per_sec"] = round(agg["toks"] / enc_sec, 1)

    # DSIR selection over the same corpus: fit = two fixed-width bucket
    # aggregations (state never grows with data), select = one
    # map-side-combined score agg + TakeOrderedAndProject top-k
    from ivory_spark.ops import dsir as DSIR

    tgt = cdocs.filter(F.col("doc_id") % 20 == 0)
    t0 = time.monotonic()
    lr = DSIR.fit_logratio(
        DSIR.ngram_bucket_counts(tgt, 4096),
        DSIR.ngram_bucket_counts(cdocs, 4096), 4096,
    )
    out["dsir_fit_sec"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    out["dsir_selected"] = DSIR.dsir_resample(cdocs, lr, k=10_000).count()
    sel_sec = time.monotonic() - t0
    out["dsir_select_sec"] = round(sel_sec, 3)
    out["dsir_docs_per_sec"] = round(n_docs / sel_sec, 1)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from ivory_spark.corpus import QUERY_SET
    from ivory_spark.index.build import IndexConfig, build_index
    from ivory_spark.index.reader import open_index
    from ivory_spark.ops import ir_relational as IR
    from ivory_spark.query.wand import bm25_topk_wand
    from ivory_spark.session import get_spark
    from ivory_spark.sources.testdata import read_table

    corpus_dir = os.path.join("/tmp", f"ivory_bench_corpus_{BENCH_DOCS}")
    corpus_path = ensure_bench_corpus(corpus_dir, BENCH_DOCS)

    spark = get_spark("ivory-bench", cores=cpus, shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    cpu_secs: dict[str, float] = {}

    # host-load evidence bracket: CPU-ceiling probe + loadavg before AND
    # after the run, plus per-section CPU-seconds (proc_tree_cpu_sec) —
    # together they let any reader decide whether a wall-time delta vs a
    # prior round is engine work (cpu_sec changed) or sandbox load
    # (cpu_sec flat, ceiling/loadavg worse).
    load_pre = loadavg1()
    host_speedup = host_probe(spark, cpus)

    # size build parallelism to MEASURED effective cores, not the
    # advertised count: on this oversubscribed sandbox local[32] can
    # deliver ~8 cores' throughput, and 32 concurrent Arrow workers on 8
    # effective cores thrash (measured 341 vs 1,491 docs/s). The same
    # rule on a real cluster sizes tasks to what the executors actually
    # deliver. Queries keep the full requested parallelism (they are
    # scheduling-bound, not worker-bound).
    build_partitions = max(8, min(cpus, int(round(host_speedup * 1.5))))

    # --- headline 1: index build throughput (fresh build, salted) --------
    index_root = os.path.join("/tmp", f"ivory_bench_index_{BENCH_DOCS}_{cpus}")
    shutil.rmtree(index_root, ignore_errors=True)
    c0, t0 = proc_tree_cpu_sec(), time.monotonic()
    props = build_index(
        spark,
        corpus_path,
        index_root,
        IndexConfig(
            salt_threshold=BENCH_DOCS // 10, n_shards=cpus, partitions=build_partitions
        ),
    )
    build_sec = time.monotonic() - t0
    timings["index_build"] = round(build_sec, 3)
    cpu_secs["index_build"] = round(proc_tree_cpu_sec() - c0, 1)
    build_stage_sec = read_stage_walls(index_root)
    docs_per_sec = props["n_docs"] / build_sec

    # --- headline 2: BM25 top-10 WAND latency (warm, batch of 15) --------
    index = open_index(spark, index_root)
    bm25_topk_wand(spark, index, QUERY_SET[:2], k=10).collect()  # warm workers
    c0, t0 = proc_tree_cpu_sec(), time.monotonic()
    n_rows = bm25_topk_wand(spark, index, QUERY_SET, k=10).collect()
    wand_sec = time.monotonic() - t0
    timings["wand_topk_batch15"] = round(wand_sec, 3)
    cpu_secs["wand_topk_batch15"] = round(proc_tree_cpu_sec() - c0, 1)
    per_query_ms = wand_sec / len(QUERY_SET) * 1000

    # single-query latency (includes Spark scheduling floor) — the
    # SmallAdaptiveRanker-style per-query measurement, cold-plan per call
    singles = []
    for q in QUERY_SET[:5]:
        t0 = time.monotonic()
        bm25_topk_wand(spark, index, [q], k=10).collect()
        singles.append(time.monotonic() - t0)
    singles.sort()
    single_p50_ms = round(singles[len(singles) // 2] * 1000, 1)
    single_max_ms = round(singles[-1] * 1000, 1)

    # warm serving mode (query/serve.LocalSearcher): the ad-hoc path —
    # dictionary resident, pyarrow postings reads + LRU, same WAND kernel
    from ivory_spark.query.serve import LocalSearcher

    searcher = LocalSearcher(index_root)
    searcher.search(QUERY_SET[0]["query"], k=10)  # warm dictionary+cache
    warm = []
    for q in QUERY_SET[:5]:
        t0 = time.monotonic()
        searcher.search(q["query"], k=10)
        warm.append(time.monotonic() - t0)
    warm.sort()
    warm_p50_ms = round(warm[len(warm) // 2] * 1000, 2)

    # index size accounting (compression story)
    def du(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path) for f in fs
        )

    corpus_bytes = du(corpus_dir)
    postings_bytes = du(os.path.join(index_root, "postings"))
    index_bytes = du(index_root)

    # --- gate queries over the sf dir tables ------------------------------
    docs = read_table(spark, sf_dir, "documents")
    gate = {
        "ir_bm25_top10": lambda: IR.bm25_top10(spark, docs, IR.GATE_QUERIES).collect(),
        "ir_term_stats": lambda: IR.term_stats(docs).collect(),
    }
    from ivory_spark.ops.dedup import minhash_dedup_pairs
    from ivory_spark.ops.similarity import brute_force_topk, query_vectors

    emb = read_table(spark, sf_dir, "embeddings")
    # bucket cap = LSH skew guard; without it near-identical-vocab docs
    # make one bucket quadratic (111s -> ~5s at sf0.1)
    gate["dedup_minhash_pairs"] = lambda: minhash_dedup_pairs(
        docs, threshold=0.8, max_bucket=64
    ).count()
    gate["ann_cosine_top5"] = lambda: brute_force_topk(
        emb, query_vectors(spark, emb, 10), k=5
    ).collect()

    for name, fn in gate.items():
        c0, t0 = proc_tree_cpu_sec(), time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)
        cpu_secs[name] = round(proc_tree_cpu_sec() - c0, 1)

    # --- diagnostic datapoints (top-level keys, outside `queries` so the
    # headline total stays comparable across rounds) -----------------------
    # SD/FD MRF batch latency over a positional index (the vectorized
    # score_docs_batch kernel), and galago_en NL-analysis throughput (the
    # memoized-stemming path) over the sf documents table.
    from ivory_spark.index.build import IndexConfig as _IC, build_index as _bi
    from ivory_spark.query.mrf import MrfModel, mrf_topk

    pos_docs = min(BENCH_DOCS, 10_000)
    pos_corpus = ensure_bench_corpus(
        os.path.join("/tmp", f"ivory_bench_corpus_{pos_docs}"), pos_docs
    )
    pos_root = os.path.join("/tmp", f"ivory_bench_posidx_{pos_docs}_{cpus}")
    shutil.rmtree(pos_root, ignore_errors=True)
    t0 = time.monotonic()
    _bi(
        spark, pos_corpus, pos_root,
        _IC(positional=True, salt_threshold=pos_docs // 10, n_shards=cpus,
            partitions=build_partitions),
    )
    pos_build_sec = round(time.monotonic() - t0, 3)
    pos_index = open_index(spark, pos_root)
    mrf_topk(spark, pos_index, QUERY_SET[:2], MrfModel(dependence="sd")).collect()
    t0 = time.monotonic()
    mrf_topk(spark, pos_index, QUERY_SET[:10], MrfModel(dependence="sd")).collect()
    sd_sec = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    mrf_topk(spark, pos_index, QUERY_SET[:5], MrfModel(dependence="fd")).collect()
    fd_sec = round(time.monotonic() - t0, 3)

    # sqe structured-query batch (tf/df-blending #weight + phrase leaves)
    # and ltr feature extraction over judged docs — round-4 surfaces
    from ivory_spark.query.features import extract_features
    from ivory_spark.query.sqe import sqe_topk

    sqe_queries = [
        {"qid": f"s{i}", "query": {"#combine": [
            {"#weight": [0.7, q["query"].split()[0], 0.3, q["query"].split()[-1]]},
            " ".join(q["query"].split()[:2]),
        ]}}
        for i, q in enumerate(QUERY_SET[:5])
    ]
    sqe_topk(spark, pos_index, sqe_queries[:1], k=10).collect()  # warm
    t0 = time.monotonic()
    sqe_topk(spark, pos_index, sqe_queries, k=10).collect()
    sqe_sec = round(time.monotonic() - t0, 3)

    n_pos = pos_index.properties["n_docs"]
    ltr_qrels = {
        q["qid"]: {d: float(d % 4) for d in range(1, n_pos + 1, 7)}
        for q in QUERY_SET[:3]
    }
    t0 = time.monotonic()
    ltr_rows = extract_features(
        spark, pos_index, QUERY_SET[:3], ltr_qrels,
        {"sd": MrfModel(dependence="sd")},
    ).count()
    ltr_sec = round(time.monotonic() - t0, 3)

    from ivory_spark.functions.tokenizer import get_tokenizer

    ndocs_nl = docs.count()
    galago = get_tokenizer("galago_en")
    t0 = time.monotonic()
    galago.doc_terms(docs, docno="doc_id", content="text").count()
    galago_sec = time.monotonic() - t0

    # streaming ingest throughput: drain the documents table through the
    # watermarked exact-dedup stream into a memory sink (availableNow)
    import tempfile as _tf

    from ivory_spark.streaming.ingest import (
        read_document_stream,
        run_to_memory,
        streaming_exact_dedup,
    )

    sdir = _tf.mkdtemp(prefix="ivory_bench_stream_")
    try:
        (
            docs.limit(5000)
            .selectExpr(
                "source AS repo", "cast(doc_id as string) AS path",
                "'c' AS commit", "lang", "text AS content",
                "timestamp('2026-01-01') AS ingest_ts",
            )
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(sdir + "/in")
        )
        n_stream = spark.read.parquet(sdir + "/in").count()
        t0 = time.monotonic()
        run_to_memory(
            streaming_exact_dedup(read_document_stream(spark, sdir + "/in")),
            "bench_stream",
        )
        stream_sec = time.monotonic() - t0
        stream_docs_per_sec = round(n_stream / stream_sec, 1)
    finally:
        shutil.rmtree(sdir, ignore_errors=True)

    # bracket close: same probe/loadavg after the run — a round whose two
    # ceilings disagree ran on a host whose load shifted mid-measurement.
    host_speedup_post = host_probe(spark, cpus)
    load_post = loadavg1()

    big = None
    if BIG_DOCS > 0:
        try:
            big = big_block(spark, BIG_DOCS, cpus, sf_dir, build_partitions)
        except Exception as e:  # never let the scale block kill the record
            big = {"error": f"{type(e).__name__}: {e}"}

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "index-build + BM25 top-10 + pipeline ops wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "bench_docs": props["n_docs"],
        "docs_per_sec": round(docs_per_sec, 1),
        "bm25_query_ms": round(per_query_ms, 2),
        "cpus": cpus,
        "topk_rows": len(n_rows),
        "single_query_p50_ms": single_p50_ms,
        "single_query_max_ms": single_max_ms,
        "single_query_warm_p50_ms": warm_p50_ms,
        "corpus_bytes": corpus_bytes,
        "postings_bytes": postings_bytes,
        "index_bytes_total": index_bytes,
        # host CPU-delivery ceiling (pure-sha256 probe, no engine code):
        # how many effective cores the oversubscribed sandbox delivered
        # during this run. NOT the engine's scaling efficiency — that is
        # measured solo by tools/bench_scaling.py (scaling_result.json,
        # BENCH.md) on fresh JVMs at two parallelism levels.
        "host_cpu_ceiling_speedup": round(host_speedup, 2),
        "host_cpu_ceiling_speedup_post": round(host_speedup_post, 2),
        "loadavg_pre": load_pre,
        "loadavg_post": load_post,
        # per-section CPU-seconds across the whole process tree (JVM +
        # Arrow workers): flat cpu_sec + worse ceiling = host load, not a
        # code regression. Engine regressions show up HERE.
        "queries_cpu_sec": cpu_secs,
        "build_stage_sec": build_stage_sec,
        "build_partitions": build_partitions,
        # diagnostics (outside `queries` to keep the headline comparable)
        "positional_build_sec": pos_build_sec,
        "positional_build_docs": pos_docs,
        "mrf_sd_batch10_sec": sd_sec,
        "mrf_fd_batch5_sec": fd_sec,
        "sqe_batch5_sec": sqe_sec,
        "ltr_extract_sec": ltr_sec,
        "ltr_extract_rows": ltr_rows,
        "galago_en_docs_per_sec": round(ndocs_nl / galago_sec, 1),
        "streaming_dedup_docs_per_sec": stream_docs_per_sec,
    }
    if big is not None:
        out["big"] = big
    print(json.dumps(out))


if __name__ == "__main__":
    main()
