"""PII scrub (ops/pii.py) and deterministic sampling / splitting /
packing (ops/sampling.py).

Correctness is pinned by hand-computed goldens on crafted fixtures plus
pure-Python twins of the hash / window arithmetic; determinism is pinned
by re-running the same op at different partition counts.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from ivory_spark.ops import pii as P
from ivory_spark.ops import sampling as S

# ---------------------------------------------------------------- twins


def _py_h60(seed: str, value) -> int:
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:15], 16)


def _py_u(seed: str, value) -> float:
    return _py_h60(seed, value) / float(1 << 60)


# ------------------------------------------------------------------ PII


PII_DOCS = [
    (1, "reach me at jane.doe+lists@corp.example.com or on +44 020-555 1234 ok"),
    (2, "servers 10.0.0.1 and 192.168.254.250 but not 1234.5.6.7 here"),
    (3, "no pii at all in this row"),
    (4, "double a@b.io c.d@e.org and +1 212 555 0199 plus 8.8.8.8"),
    (5, ""),
]


def test_pii_stats_golden(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in P.pii_stats(df).collect()}
    assert got[1] == {
        "doc_id": 1, "n_emails": 1, "n_phones": 1, "n_ipv4": 0, "has_pii": True
    }
    # 1234.5.6.7: \b requires a non-word char before the first octet —
    # '1234' has none at '234', so nothing in it matches.
    assert got[2] == {
        "doc_id": 2, "n_emails": 0, "n_phones": 0, "n_ipv4": 2, "has_pii": True
    }
    assert got[3]["has_pii"] is False
    assert got[4] == {
        "doc_id": 4, "n_emails": 2, "n_phones": 1, "n_ipv4": 1, "has_pii": True
    }
    assert got[5]["has_pii"] is False


def test_redact_golden(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in P.redact_pii(df).collect()}
    assert got[1] == "reach me at <EMAIL> or on <PHONE> ok"
    assert got[2] == "servers <IP> and <IP> but not 1234.5.6.7 here"
    assert got[3] == "no pii at all in this row"
    assert got[4] == "double <EMAIL> <EMAIL> and <PHONE> plus <IP>"
    assert got[5] == ""


def test_redact_order_email_before_phone(spark):
    # digits inside an email local part must not be phone-nibbled
    df = spark.createDataFrame([(1, "x +1 212 555 0199x@mail.org y")], ["doc_id", "text"])
    out = P.redact_pii(df).collect()[0]["text"]
    assert out == "x +1 212 555 <EMAIL> y"


# ------------------------------------------------------------- sampling


def test_hash_split_matches_python_twin_and_partitioning(spark):
    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    w = {"train": 8.0, "val": 1.0, "test": 1.0}
    got = {r["doc_id"]: r["split"] for r in S.hash_split(docs, w).collect()}
    bounds = S.split_boundaries(w)
    for i in range(400):
        u = _py_u("split", i)
        want = next((n for n, acc in bounds if u < acc), "test")
        assert got[i] == want
    # deterministic across partition counts
    again = {
        r["doc_id"]: r["split"]
        for r in S.hash_split(docs.repartition(7), w).collect()
    }
    assert again == got
    # all three splits non-empty at n=400 with 80/10/10
    sizes = {s: sum(1 for v in got.values() if v == s) for s in w}
    assert all(sizes[s] > 0 for s in w)
    assert abs(sizes["train"] / 400 - 0.8) < 0.08


def test_mixture_sample_rates_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "srcA" if i % 2 == 0 else "srcB") for i in range(300)],
        ["doc_id", "source"],
    )
    rates = {"srcA": 0.5, "srcB": 1.0}
    kept = {r["doc_id"] for r in S.mixture_sample(docs, rates).collect()}
    for i in range(300):
        src = "srcA" if i % 2 == 0 else "srcB"
        want = _py_u("mix", i) < rates[src]
        assert (i in kept) == want
    # srcB rate 1.0 keeps everything (u < 1.0 always: u is in [0,1))
    assert all(i in kept for i in range(1, 300, 2))
    # unknown sources are dropped
    extra = spark.createDataFrame([(999, "srcC")], ["doc_id", "source"])
    assert S.mixture_sample(extra, rates).count() == 0


def test_mixture_rates_targets(spark):
    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        ["doc_id", "source"],
    )
    rates = S.mixture_rates(docs, {"big": 1.0, "small": 1.0}, target_rows=200)
    # equal mixture weight -> 100 rows from each; small has 100 rows so
    # its rate caps at 1.0, big samples 100/900
    assert rates["small"] == 1.0
    assert abs(rates["big"] - 100 / 900) < 1e-12
    # absent source contributes no rate
    rates2 = S.mixture_rates(docs, {"big": 1.0, "nosuch": 1.0}, target_rows=100)
    assert "nosuch" not in rates2


def test_pack_sequences_golden_and_invariants(spark):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([5, 0, 7, 3, 10, 4, 6, 2])]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = [r.asDict() for r in S.pack_sequences(docs, budget=8, n_shards=2).collect()]
    by_id = {r["doc_id"]: r for r in out}
    # python twin: same shard hash, same (shard, doc_id) layout order
    shards = {}
    for i, n in enumerate([5, 0, 7, 3, 10, 4, 6, 2]):
        shards.setdefault(_py_h60("shard", i) % 2, []).append((i, n))
    for shard, docs_in in shards.items():
        start = 0
        for i, n in sorted(docs_in):
            r = by_id[i]
            assert r["shard"] == shard
            assert r["tok_start"] == start
            assert r["seq_first"] == start // 8
            last = (start + n - 1) // 8 if n > 0 else start // 8
            assert r["seq_last"] == last
            assert r["offset_in_seq"] == start % 8
            start += n
    # determinism across partitioning
    again = [
        r.asDict()
        for r in S.pack_sequences(docs.repartition(5), budget=8, n_shards=2).collect()
    ]
    assert sorted(map(str, again)) == sorted(map(str, out))


def test_pack_sequences_no_cross_shard_overlap(spark):
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.lit("a b c d e").alias("text")
    )
    out = S.pack_sequences(docs, budget=16, n_shards=4)
    # within a shard, token intervals tile exactly: sum == max end
    agg = (
        out.groupBy("shard")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max(F.col("tok_start") + F.col("n_tokens")).alias("end"),
        )
        .collect()
    )
    assert len(agg) == 4
    for r in agg:
        assert r["total"] == r["end"]


def test_corpus_shuffle_matches_global_sort_twin(spark):
    docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    out = {r["doc_id"]: r.asDict() for r in S.corpus_shuffle(docs, n_buckets=8).collect()}
    # python twin: global sort by (60-bit hash, id)
    order = sorted(range(300), key=lambda i: (_py_h60("shuffle", i), i))
    for pos, i in enumerate(order):
        assert out[i]["pos"] == pos
        assert out[i]["bucket"] == _py_h60("shuffle", i) >> 57
    # pos is a permutation of 0..n-1
    assert sorted(r["pos"] for r in out.values()) == list(range(300))
    # invariant across partition counts AND bucket counts
    again = {
        r["doc_id"]: r["pos"]
        for r in S.corpus_shuffle(docs.repartition(7), n_buckets=32).collect()
    }
    assert again == {i: d["pos"] for i, d in out.items()}


def test_corpus_shuffle_rejects_non_power_of_two(spark):
    docs = spark.range(0, 4).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        S.corpus_shuffle(docs, n_buckets=6)


def test_epoch_upsample_matches_python_twin(spark):
    docs = spark.createDataFrame(
        [(i, ["srcA", "srcB", "srcC"][i % 3]) for i in range(240)],
        ["doc_id", "source"],
    )
    epochs = {"srcA": 2.5, "srcB": 0.75, "srcC": 1.0}
    rows = S.epoch_upsample(docs, epochs).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r["epoch"])
    for i in range(240):
        src = ["srcA", "srcB", "srcC"][i % 3]
        e = epochs[src]
        n = int(e) + (1 if _py_u("epoch", i) < e - int(e) else 0)
        eps = sorted(got.get(i, []))
        assert eps == list(range(n)), (i, src, n, eps)
    # srcC (integer epochs) appears exactly once per doc, no frac branch
    assert all(got[i] == [0] for i in range(2, 240, 3))
    # unknown sources are dropped
    extra = spark.createDataFrame([(999, "srcZ")], ["doc_id", "source"])
    assert S.epoch_upsample(extra, epochs).count() == 0
    # determinism across partitioning
    again = S.epoch_upsample(docs.repartition(9), epochs).collect()
    assert sorted(map(str, again)) == sorted(map(str, rows))


def test_materialize_sequences_golden_and_invariants(spark):
    # doc 4 is 25 tokens long: it spans 4 sequences, so some sequences
    # are wholly mid-document and must carry EMPTY boundary lists
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate([5, 0, 7, 3, 25, 4, 6, 2])
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = S.materialize_sequences(df, budget=8, n_shards=2).collect()
    # python twin: per-shard concatenated token stream chunked by 8,
    # with doc-start offsets tracked per chunk
    shards = {}
    for i, t in docs:
        toks = [x for x in t.lower().split(" ") if x]
        if toks:
            shards.setdefault(_py_h60("shard", i) % 2, []).append((i, toks))
    want = {}
    for sh, ds in shards.items():
        stream, marks = [], []
        for _, toks in sorted(ds):
            marks.append(len(stream))
            stream += toks
        for s in range((len(stream) + 7) // 8):
            chunk = stream[s * 8 : (s + 1) * 8]
            bs = sorted(m - s * 8 for m in marks if s * 8 <= m < (s + 1) * 8)
            want[(sh, s)] = (" ".join(chunk), len(chunk), bs)
    got = {
        (r["shard"], r["seq"]): (r["text"], r["n_tokens"], list(r["boundaries"]))
        for r in out
    }
    assert got == want
    # the 25-token doc produces at least one boundary-free sequence
    assert any(b == [] for _, _, b in got.values())
    # every sequence but each shard's last is exactly `budget` tokens
    last = {sh: max(s for s2, s in [(k[0], k[1]) for k in got if k[0] == sh]) for sh in {k[0] for k in got}}
    for (sh, s), (_, n, _b) in got.items():
        assert n == 8 or s == last[sh]
    # token conservation: total tokens in == total tokens out
    assert sum(n for _, n, _b in got.values()) == sum(
        len([x for x in t.split(" ") if x]) for _, t in docs
    )
    # determinism across partitioning
    again = {
        (r["shard"], r["seq"]): (r["text"], r["n_tokens"], list(r["boundaries"]))
        for r in S.materialize_sequences(df.repartition(5), budget=8, n_shards=2).collect()
    }
    assert again == got


def test_materialize_consistent_with_pack_placement(spark):
    docs = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.repeat(F.lit("x "), (F.col("id") % 7).cast("int"))).alias("text"),
    )
    placed = {r["doc_id"]: r.asDict() for r in S.pack_sequences(docs, budget=16, n_shards=2).collect()}
    seqs = {(r["shard"], r["seq"]): r["n_tokens"] for r in S.materialize_sequences(docs, budget=16, n_shards=2).collect()}
    # every placement's seq_first..seq_last exists in the materialized set
    for r in placed.values():
        if r["n_tokens"] == 0:
            continue
        for s in range(r["seq_first"], r["seq_last"] + 1):
            assert (r["shard"], s) in seqs
    # per-shard totals agree
    for sh in {r["shard"] for r in placed.values()}:
        want = sum(r["n_tokens"] for r in placed.values() if r["shard"] == sh)
        assert sum(n for (s, _), n in seqs.items() if s == sh) == want


def test_weighted_sample_matches_python_twin(spark):
    docs = spark.createDataFrame(
        [(i, (i % 11) / 10.0) for i in range(300)], ["doc_id", "p"]
    )
    kept = {r["doc_id"] for r in S.weighted_sample(docs, "p").collect()}
    for i in range(300):
        assert (i in kept) == (_py_u("wsample", i) < (i % 11) / 10.0)
    # p=0 never survives, p=1.0 always does (u in [0,1))
    assert not any(i in kept for i in range(0, 300, 11))
    assert all(i in kept for i in range(10, 300, 11))
    # out-of-range probabilities clamp instead of misbehaving
    odd = spark.createDataFrame([(1, -0.5), (2, 7.0)], ["doc_id", "p"])
    got = {r["doc_id"] for r in S.weighted_sample(odd, "p").collect()}
    assert got == {2}
    # determinism across partitioning
    again = {r["doc_id"] for r in S.weighted_sample(docs.repartition(9), "p").collect()}
    assert again == kept


def test_assemble_corpus_equals_manual_composition(spark):
    docs = spark.createDataFrame(
        [(i, ["srcA", "srcB"][i % 2], f"tok{i} " * ((i % 5) + 1)) for i in range(80)],
        ["doc_id", "source", "text"],
    )
    rates = {"srcA": 0.8, "srcB": 0.6}
    epochs = {"srcA": 2.5, "srcB": 1.0}
    got = {
        (r["shard"], r["seq"]): (r["text"], list(r["boundaries"]))
        for r in S.assemble_corpus(
            docs, budget=16, rates=rates, epochs=epochs, n_shards=2
        ).collect()
    }
    # manual composition with the same derived-id arithmetic (k = 3)
    mixed = S.mixture_sample(docs, rates)
    up = S.epoch_upsample(mixed, epochs).select(
        (F.col("doc_id") * 3 + F.col("epoch")).alias("doc_id"), "text"
    )
    want = {
        (r["shard"], r["seq"]): (r["text"], list(r["boundaries"]))
        for r in S.materialize_sequences(up, budget=16, n_shards=2).collect()
    }
    assert got == want and len(got) > 2
    # epoch copies are distinct documents: a 2.5-epoch source doc that
    # survives mixture appears at least twice in the upsampled stream
    n_up = up.count()
    n_mixed = mixed.count()
    assert n_up > n_mixed


def test_epoch_upsample_preserves_columns(spark):
    docs = spark.createDataFrame(
        [(1, "srcA", "hello world", 0.7)], ["doc_id", "source", "text", "extra"]
    )
    out = S.epoch_upsample(docs, {"srcA": 2.0}).collect()
    assert len(out) == 2
    assert {r["epoch"] for r in out} == {0, 1}
    assert all(r["text"] == "hello world" and r["extra"] == 0.7 for r in out)
