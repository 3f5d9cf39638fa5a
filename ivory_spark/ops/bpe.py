"""Distributed BPE tokenizer training + encoding.

The tokenizer-training step every large-scale LLM data pipeline runs
over its corpus, decomposed Spark-first the way real trainers scale
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units", https://arxiv.org/abs/1508.07909 — public
algorithm; no reference-repo counterpart, this is pipeline surface):

- the corpus-sized work — pretokenize + word counting — is ONE
  distributed aggregation (`word_counts`): a single groupBy shuffle
  whose output is vocabulary-sized, not corpus-sized. At 100 TB the
  word-frequency table is ~10^7-10^8 rows; `train_bpe` truncates it to
  the `max_words` most frequent (count desc, word asc) exactly like
  production trainers cap their word dicts — the tail it drops are
  hapax strings that cannot move a merge decision ahead of the head's
  counts;
- the iterative merge loop (`learn_merges`) runs driver-side over that
  aggregated table with incremental pair-count maintenance (the classic
  subword-nmt strategy: only words containing the merged pair are
  rescanned). Running the loop distributed would be one shuffle PER
  MERGE x thousands of merges — the aggregate-then-iterate split is the
  scale-correct decomposition, not a shortcut;
- encoding (`encode`) broadcasts the merge list and applies it in
  Arrow-batched pandas with a per-executor word memo: Zipf means a few
  thousand distinct words cover almost every token, so the per-word
  merge scan runs once per distinct word per worker, not once per
  occurrence.

Merge application is the paper's sequential form: each merge (a, b) in
rank order replaces every left-to-right non-overlapping (a, b) symbol
occurrence in one pass. That form is exactly reproducible in SQL as a
chain of string `replace`s over the space-joined symbol string (the
`bpe_encode_fixed` correctness gate), which pins the distributed
encoder bit-for-bit against DuckDB.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"  # end-of-word symbol, kept distinct from any char
UNK = "<unk>"


# ---------------------------------------------------------------------------
# distributed word counting (the only corpus-sized stage)
# ---------------------------------------------------------------------------


def word_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, cnt): lowercase whitespace pretokens counted corpus-wide.

    One partial+final groupBy aggregation (Catalyst map-side combine
    makes the shuffle vocabulary-sized); pure JVM expressions.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# driver-side merge learning over the aggregated word-frequency table
# ---------------------------------------------------------------------------


def _scan_merge(syms: list[str], a: str, b: str) -> list[str]:
    """One left-to-right non-overlapping pass replacing (a, b) -> a+b."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _pair_counts(syms: list[str]) -> dict[tuple[str, str], int]:
    c: dict[tuple[str, str], int] = {}
    for p in zip(syms, syms[1:]):
        c[p] = c.get(p, 0) + 1
    return c


def learn_merges(
    counts: Iterable[tuple[str, int]], n_merges: int, eow: str = EOW
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over a (word, count) table.

    Deterministic: each step merges the pair with the highest total
    count, ties broken by the lexicographically smallest pair (the
    paper leaves ties arbitrary; we pin them so training is
    reproducible across runs and engines). Stops early when no pair
    occurs twice. Pair counts are maintained incrementally: a merge
    rescans only the words that contain its pair.
    """
    words: list[list[str]] = []
    wcnt: list[int] = []
    for w, c in counts:
        if not w:
            continue
        words.append(list(w) + [eow])
        wcnt.append(int(c))

    pair_tot: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        for p, k in _pair_counts(syms).items():
            pair_tot[p] = pair_tot.get(p, 0) + k * wcnt[i]
            pair_words.setdefault(p, set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_tot:
            break
        best = min(pair_tot.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_tot[best] < 2:
            break
        merges.append(best)
        for i in sorted(pair_words.get(best, ())):
            old = words[i]
            new = _scan_merge(old, *best)
            oc, nc = _pair_counts(old), _pair_counts(new)
            for p in set(oc) | set(nc):
                d = nc.get(p, 0) - oc.get(p, 0)
                if d:
                    pair_tot[p] = pair_tot.get(p, 0) + d * wcnt[i]
                    if pair_tot[p] <= 0:
                        del pair_tot[p]
                if nc.get(p, 0):
                    pair_words.setdefault(p, set()).add(i)
                elif p in pair_words:
                    pair_words[p].discard(i)
            words[i] = new
        pair_words.pop(best, None)
        pair_tot.pop(best, None)
    return merges


@dataclass
class BpeModel:
    """Learned merges + the deterministic token-id table.

    ids: <unk> = 0, then the sorted base alphabet (chars seen in
    training words, plus the end-of-word symbol), then one token per
    merge in merge order — the id of a token therefore encodes when it
    entered the vocabulary, as in the paper.
    """

    merges: list[tuple[str, str]]
    vocab: dict[str, int]
    eow: str = EOW

    @classmethod
    def from_merges(
        cls, merges: list[tuple[str, str]], alphabet: Iterable[str], eow: str = EOW
    ) -> "BpeModel":
        vocab = {UNK: 0}
        for ch in sorted(set(alphabet) | {eow}):
            vocab[ch] = len(vocab)
        for a, b in merges:
            tok = a + b
            if tok not in vocab:
                vocab[tok] = len(vocab)
        return cls(merges=list(merges), vocab=vocab, eow=eow)

    def _rank_table(self) -> dict[tuple[str, str], int] | None:
        """pair -> rank, or None when the merge list contains a
        duplicate pair (possible only through output-string collisions;
        the fast path below assumes each pair has exactly one turn)."""
        if not hasattr(self, "_rank_cache"):
            rank: dict[tuple[str, str], int] = {}
            dup = False
            for i, m in enumerate(self.merges):
                if m in rank:
                    dup = True
                    break
                rank[m] = i
            self._rank_cache = None if dup else rank
        return self._rank_cache

    def encode_word(self, word: str) -> list[str]:
        """Sequential merge application (one left-to-right pass per
        merge, in rank order) via a monotone rank pointer: repeatedly
        find the lowest-rank pair PRESENT with rank >= the pointer and
        apply it. Exactly equal to looping over all merges — between
        the pointer and the chosen rank no applicable pair exists and
        nothing changes the symbols, so the skipped merges' passes are
        no-ops — but the work is O(applied_merges x len) dict lookups
        instead of O(n_merges x len), which is what makes encoding a
        30k-merge vocabulary affordable per distinct word."""
        syms = list(word) + [self.eow]
        rank = self._rank_table()
        if rank is None:  # duplicate pair: take the literal slow path
            for a, b in self.merges:
                if len(syms) < 2:
                    break
                syms = _scan_merge(syms, a, b)
            return syms
        nxt = 0
        while len(syms) >= 2:
            cand = None
            for p in zip(syms, syms[1:]):
                r = rank.get(p, -1)
                if r >= nxt and (cand is None or r < cand):
                    cand = r
            if cand is None:
                break
            syms = _scan_merge(syms, *self.merges[cand])
            nxt = cand + 1
        return syms

    def decode(self, ids: Iterable[int]) -> str:
        inv = {v: k for k, v in self.vocab.items()}
        text = "".join(inv.get(i, UNK) for i in ids)
        return text.replace(self.eow, " ").strip()

    def to_json(self) -> str:
        return json.dumps(
            {"merges": self.merges, "vocab": self.vocab, "eow": self.eow},
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "BpeModel":
        d = json.loads(s)
        return cls(
            merges=[tuple(m) for m in d["merges"]],
            vocab=dict(d["vocab"]),
            eow=d.get("eow", EOW),
        )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    max_words: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> BpeModel:
    """Distributed word counting -> driver-side merge learning.

    The collect is bounded by max_words (count desc, word asc) — the
    word-frequency table, never the corpus.
    """
    rows = (
        word_counts(docs, id_col, text_col)
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(int(max_words))
        .collect()
    )
    counts = [(r["word"], r["cnt"]) for r in rows]
    merges = learn_merges(counts, n_merges)
    alphabet = set(ch for w, _ in counts for ch in w)
    return BpeModel.from_merges(merges, alphabet)


# ---------------------------------------------------------------------------
# distributed encoding (Arrow-batched, word-memoized)
# ---------------------------------------------------------------------------


def encode(
    docs: DataFrame,
    model: BpeModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, token_ids array<int>, n_tokens, n_unk).

    mapInPandas with the model shipped once per executor in the task
    closure (a few hundred KB of merges — closure broadcast is the
    right channel at this size). The per-word encode memo lives across
    batches of one task and is keyed by the word itself, so Zipf-heavy
    corpora pay the merge scan once per distinct word per task.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    model_json = model.to_json()
    out_schema = (
        f"{id_col} long, token_ids array<int>, n_tokens int, n_unk int"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        m = BpeModel.from_json(model_json)
        vocab = m.vocab
        memo: dict[str, list[int]] = {}

        def enc_word(w: str) -> list[int]:
            ids = memo.get(w)
            if ids is None:
                ids = [vocab.get(s, 0) for s in m.encode_word(w)]
                memo[w] = ids
            return ids

        for pdf in batches:
            ids_col, n_col, unk_col = [], [], []
            for text in pdf[text_col].astype(str):
                ids: list[int] = []
                for w in text.lower().split(" "):
                    if w:
                        ids.extend(enc_word(w))
                ids_col.append(ids)
                n_col.append(len(ids))
                unk_col.append(sum(1 for i in ids if i == 0))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "token_ids": ids_col,
                    "n_tokens": n_col,
                    "n_unk": unk_col,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def encode_fingerprint(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, enc_fp): run the distributed merge scan with a
    fixed merge list and fingerprint the resulting symbol stream (md5 of
    the space-joined token strings, 16 hex chars).

    This is the gate surface: the SQL oracle reproduces the same string
    with chained `replace`s over the doc's space-joined character
    string — each merge (a, b), in rank order, as ' a b ' -> ' ab '
    over a space-padded string, applied TWICE. Two passes are needed
    because consecutive occurrences share their boundary space and
    plain replace resumes after the replacement, so one pass merges
    alternating occurrences of a chain and the second pass the rest;
    for merges with a != b all pair occurrences are disjoint symbols
    and two passes are EXACTLY the left-to-right one-pass `_scan_merge`
    (a == b merges — legal in BPE but absent from the gate fixture —
    can diverge on >= 5-symbol runs, so this helper requires a != b).
    The doc-level replace never bridges two words because a learned
    merge's LEFT side cannot contain the end-of-word symbol
    (</w>-bearing symbols are word-final, hence never followed by
    anything in training). Unknown characters pass through as
    themselves on both sides.
    """
    for a, b in merges:
        if a == b:
            raise ValueError(
                "encode_fingerprint gate surface requires a != b merges "
                f"(got {(a, b)!r}); use encode() for general models"
            )
    import pandas as pd  # noqa: PLC0415 — executor-side import

    model = BpeModel.from_merges(merges, alphabet=())
    model_json = model.to_json()
    out_schema = f"{id_col} long, n_tokens int, enc_stream string"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        m = BpeModel.from_json(model_json)
        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            syms = memo.get(w)
            if syms is None:
                syms = m.encode_word(w)
                memo[w] = syms
            return syms

        for pdf in batches:
            n_col, stream_col = [], []
            for text in pdf[text_col].astype(str):
                syms: list[str] = []
                for w in text.lower().split(" "):
                    if w:
                        syms.extend(enc_word(w))
                n_col.append(len(syms))
                stream_col.append(" ".join(syms))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_tokens": n_col,
                    "enc_stream": stream_col,
                }
            )

    raw = docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)
    return raw.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.substring(F.md5(F.col("enc_stream")), 1, 16).alias("enc_fp"),
    )
