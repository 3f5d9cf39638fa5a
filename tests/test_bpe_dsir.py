"""BPE tokenizer training/encoding + DSIR importance resampling.

Every distributed path is checked against an independent local twin:
- learn_merges (incremental pair maintenance) vs a naive
  recount-from-scratch reference, on goldens and random corpora;
- the distributed encoder vs per-word sequential merge replay and the
  SQL-style chained string replace (the gate oracle's semantics);
- dsir_score vs a pure-pandas reimplementation of hashed n-gram
  counting + integer log-ratio scoring;
- partitioning invariance for both (1 vs 8 partitions).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from ivory_spark.ops.bpe import (
    BpeModel,
    _scan_merge,
    encode,
    encode_fingerprint,
    learn_merges,
    train_bpe,
    word_counts,
)
from ivory_spark.ops import dsir


def naive_learn(counts, n):
    """Recount-from-scratch reference twin of learn_merges."""
    words = [(list(w) + ["</w>"], c) for w, c in counts if w]
    out = []
    for _ in range(n):
        pc = {}
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        out.append(best)
        words = [(_scan_merge(s, *best), c) for s, c in words]
    return out


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_golden():
    m = learn_merges(SENNRICH, 10)
    # highest pair count is the 9-way tie (e,s)/(s,t)/(t,</w>);
    # deterministic lexicographic tie-break picks (e,s) first.
    assert m[0] == ("e", "s")
    assert m == naive_learn(SENNRICH, 10)
    model = BpeModel.from_merges(m, set("lowernwidst"))
    # 'lowest' was never a training word but its pieces were
    assert model.encode_word("lowest") == ["low", "est</w>"]
    ids = [model.vocab[s] for s in model.encode_word("newest")]
    assert model.decode(ids) == "newest"


def test_learn_merges_incremental_equals_naive_random():
    import random

    rng = random.Random(7)
    for trial in range(25):
        n_words = rng.randint(1, 30)
        counts = [
            (
                "".join(rng.choice("abcd") for _ in range(rng.randint(1, 8))),
                rng.randint(1, 9),
            )
            for _ in range(n_words)
        ]
        # dedupe words (word_counts output is distinct by construction)
        dd = {}
        for w, c in counts:
            dd[w] = dd.get(w, 0) + c
        counts = sorted(dd.items())
        n = rng.randint(1, 20)
        merges = learn_merges(counts, n)
        assert merges == naive_learn(counts, n), (trial, counts)
        # two-pass replace replay == per-word scan for a != b merges
        if merges and all(a != b for a, b in merges):
            model = BpeModel.from_merges(merges, "abcd")
            words = [w for w, _ in counts]
            text = " ".join(rng.choice(words) for _ in range(rng.randint(1, 40)))
            scan = " ".join(
                s for w in text.split(" ") for s in model.encode_word(w)
            )
            assert scan == sql_style_encode(text, merges), (trial, text, merges)


def test_scan_merge_semantics():
    assert _scan_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _scan_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _scan_merge(["x", "a", "b", "a", "b"], "a", "b") == ["x", "ab", "ab"]


def sql_style_encode(text: str, merges) -> str:
    """The gate oracle's semantics: doc-level chained replace over the
    space-padded char stream, each merge applied twice (consecutive
    occurrences share their boundary space, so one replace pass merges
    alternating occurrences; the second pass the rest — for a != b
    merges two passes equal the per-word scan exactly)."""
    words = [w for w in text.lower().split(" ") if w]
    s = " " + " ".join(" ".join(list(w) + ["</w>"]) for w in words) + " "
    for a, b in merges:
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return s.strip()


def test_word_counts_and_train(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": ["low low lower", "newest widest", "low newest",
                     "", "newest newest", "lower widest low"],
        }
    )
    docs = spark.createDataFrame(pdf)
    wc = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert wc == {"low": 4, "lower": 2, "newest": 4, "widest": 2}
    model = train_bpe(docs, n_merges=10)
    assert model.merges == naive_learn(sorted(wc.items()), 10)
    # ids: unk=0, then sorted alphabet incl </w>, then merges in order
    assert model.vocab["<unk>"] == 0
    alpha = sorted(set("".join(wc)) | {"</w>"})
    assert [model.vocab[a] for a in alpha] == list(range(1, len(alpha) + 1))


def test_encode_distributed_matches_sql_replay_and_partitioning(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(5),
            "text": [
                "low low lower newest",
                "widest lowest zebra",  # zebra: chars unseen in merges
                "newest newest widest low",
                "low",
                "a lower b",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    merges = learn_merges(SENNRICH, 8)
    model = BpeModel.from_merges(merges, set("lowernwidstzebra"))
    out = {
        r["doc_id"]: r
        for r in encode(docs, model).collect()
    }
    inv = {v: k for k, v in model.vocab.items()}
    for _, row in pdf.iterrows():
        got = out[row["doc_id"]]
        syms = [inv[i] if i != 0 else "?" for i in got["token_ids"]]
        ref = sql_style_encode(row["text"], merges)
        # unk ids correspond to chars outside the training alphabet
        ref_syms = ref.split(" ") if ref else []
        assert len(syms) == len(ref_syms) == got["n_tokens"]
        for s, rs in zip(syms, ref_syms):
            assert s == rs or (s == "?" and rs not in model.vocab)
        assert got["n_unk"] == sum(1 for rs in ref_syms if rs not in model.vocab)
    # fingerprint surface == md5 of the SQL-replay stream, any partitioning
    for parts in (1, 8):
        fp = {
            r["doc_id"]: (r["n_tokens"], r["enc_fp"])
            for r in encode_fingerprint(docs.repartition(parts), merges).collect()
        }
        for _, row in pdf.iterrows():
            ref = sql_style_encode(row["text"], merges)
            want = hashlib.md5(ref.encode()).hexdigest()[:16]
            assert fp[row["doc_id"]] == (len(ref.split(" ")) if ref else 0, want)


def test_materialize_token_sequences_composes_with_encode(spark):
    """bpe.encode -> materialize_token_sequences == a local replay of
    the layout contract: shard by md5, order by doc_id, concatenate the
    id arrays, chunk at the budget; boundaries are the in-chunk offsets
    where a new document starts."""
    from ivory_spark.ops.bpe import BpeModel, encode, learn_merges
    from ivory_spark.ops.sampling import materialize_token_sequences

    pdf = pd.DataFrame(
        {
            "doc_id": range(12),
            "text": [
                " ".join(["low", "newest", "widest", "lower"][: (i % 4) + 1] * (i + 1))
                if i != 7
                else ""  # an empty doc must occupy no space
                for i in range(12)
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    model = BpeModel.from_merges(learn_merges(SENNRICH, 8), set("lowernwidst"))
    enc = encode(docs, model)
    budget, n_shards = 16, 2
    got = {
        (r["shard"], r["seq"]): (list(r["token_ids"]), list(r["boundaries"]))
        for r in materialize_token_sequences(enc, budget, n_shards).collect()
    }
    # local replay
    ids_by_doc = {r["doc_id"]: list(r["token_ids"]) for r in enc.collect()}

    def shard_of(d):
        return int(hashlib.md5(f"shard:{d}".encode()).hexdigest()[:15], 16) % n_shards

    want = {}
    for s in range(n_shards):
        stream, starts = [], []
        for d in sorted(d for d in ids_by_doc if shard_of(d) == s):
            if ids_by_doc[d]:
                starts.append(len(stream))
                stream.extend(ids_by_doc[d])
        for q in range(0, (len(stream) + budget - 1) // budget):
            chunk = stream[q * budget : (q + 1) * budget]
            bounds = [p - q * budget for p in starts if q * budget <= p < q * budget + len(chunk)]
            want[(s, q)] = (chunk, bounds)
    assert got == want
    # token conservation + budget exactness (all but each shard's tail)
    for (s, q), (chunk, _) in want.items():
        if any(k[0] == s and k[1] > q for k in want):
            assert len(chunk) == budget


def pandas_dsir_score(pdf, logratio, seed="dsir"):
    """Pure-pandas twin of dsir_score (hash via md5, exact ints)."""
    n_buckets = len(logratio)
    scores = {}
    for _, row in pdf.iterrows():
        toks = [t for t in str(row["text"]).lower().split(" ") if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        s = 0
        for g in grams:
            h = int(hashlib.md5(f"{seed}:{g}".encode()).hexdigest()[:15], 16)
            s += logratio[h % n_buckets]
        if grams:
            scores[row["doc_id"]] = s
    return scores


def test_dsir_score_matches_pandas_twin(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "spark join shuffle", "the cat sat", "join join join",
                "spark spark", "a", "", "cat shuffle spark join",
                "sat the cat sat",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    target = docs.filter("doc_id < 3")
    tc = dsir.ngram_bucket_counts(target, n_buckets=32)
    rc = dsir.ngram_bucket_counts(docs, n_buckets=32)
    lr = dsir.fit_logratio(tc, rc, n_buckets=32)
    assert len(lr) == 32 and all(isinstance(v, int) for v in lr)
    got = {
        r["doc_id"]: r["score"]
        for r in dsir.dsir_score(docs, lr).collect()
    }
    assert got == pandas_dsir_score(pdf, lr)
    # partitioning invariance
    got8 = {
        r["doc_id"]: r["score"]
        for r in dsir.dsir_score(docs.repartition(8), lr).collect()
    }
    assert got8 == got


def test_lm_perplexity_matches_pandas_twin(spark):
    """fit_logprob + lm_perplexity == a pure-python replay: quantized
    reference log-probs, exact integer sums, nll ratio at 6 dp."""
    import math

    pdf = pd.DataFrame(
        {
            "doc_id": range(7),
            "text": [
                "spark join shuffle", "the cat sat", "join join join",
                "spark spark", "out of domain words entirely",
                "cat shuffle spark join", "sat the cat sat",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    ref = docs.filter("doc_id < 4")
    B = 32
    lp = dsir.fit_logprob(dsir.ngram_bucket_counts(ref, B), B)
    assert len(lp) == B and all(isinstance(v, int) and v < 0 for v in lp)
    got = {
        r["doc_id"]: (r["n_grams"], r["nll"])
        for r in dsir.lm_perplexity(docs, lp).collect()
    }
    # python twin
    ref_counts = {}
    for _, row in pdf[pdf.doc_id < 4].iterrows():
        toks = [t for t in row["text"].lower().split(" ") if t]
        for g in toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]:
            h = int(hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:15], 16) % B
            ref_counts[h] = ref_counts.get(h, 0) + 1
    tot = sum(ref_counts.values()) + B
    lp_want = [
        int(math.floor(dsir.QUANT * math.log((ref_counts.get(b, 0) + 1) / tot) + 0.5))
        for b in range(B)
    ]
    assert lp == lp_want
    for _, row in pdf.iterrows():
        toks = [t for t in row["text"].lower().split(" ") if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        s = sum(
            lp[int(hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:15], 16) % B]
            for g in grams
        )
        want = round(-s / (len(grams) * dsir.QUANT), 6)
        assert got[row["doc_id"]] == (len(grams), want)
    # the in-domain docs must score lower nll than the out-of-domain one
    assert max(got[d][1] for d in range(4)) < got[4][1]


def test_dsir_resample_gumbel_topk(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": [f"tok{i % 4} tok{(i * 3) % 5} common" for i in range(20)],
        }
    )
    docs = spark.createDataFrame(pdf)
    target = docs.filter("doc_id % 4 = 0")
    lr = dsir.fit_logratio(
        dsir.ngram_bucket_counts(target, 16), dsir.ngram_bucket_counts(docs, 16), 16
    )
    sel = dsir.dsir_resample(docs, lr, k=5).collect()
    assert len(sel) == 5
    # selection = top-5 by (score/QUANT + gumbel) computed locally
    import math

    scores = pandas_dsir_score(pdf, lr)
    keys = {}
    for d, s in scores.items():
        h = int(hashlib.md5(f"gumbel:dsir:{d}".encode()).hexdigest()[:15], 16)
        u = h / 2**60
        keys[d] = s / dsir.QUANT + (-math.log(-math.log(u)))
    want = sorted(keys, key=lambda d: (-keys[d], d))[:5]
    assert sorted(r["doc_id"] for r in sel) == sorted(want)
    for r in sel:
        assert r["score"] == scores[r["doc_id"]]
        assert abs(r["key"] - keys[r["doc_id"]]) < 1e-6
