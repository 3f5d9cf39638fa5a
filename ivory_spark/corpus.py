"""Deterministic synthetic source-code corpus (the Iceberg-shaped input).

Schema per BASELINE.json input_hint: (repo, path, commit, lang, content).
Plays the role of Ivory's document collections (TREC disks, ClueWeb —
reference drivers at /root/reference/src/java/main/ivory/app/Preprocess*.java);
here the "collection" is source code, generated with a fixed seed so the
sha256(content) manifest is reproducible (per-row invariant in tests).

Design points from FIXTURES.md:
- zipf-ish repo sizes, weighted language mix;
- keyword-heavy preamble per language (the skewed "common keyword" terms
  that exercise salted repartitioning — north-rule axis B);
- zipf-sampled identifier vocabulary with a long hapax tail (minDf edge);
- a few exact duplicate contents across repos (sha256 dedup path);
- a few empty files; one pathologically long file (tf-overflow guard,
  reference: ivory/core/tokenize/DocumentProcessingUtils.java:42,102-113).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd

LANGS = ["python", "java", "c", "go", "js"]
LANG_WEIGHTS = [0.35, 0.25, 0.15, 0.15, 0.10]
LANG_EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js"}

# per-language keyword preamble vocabulary — near-ubiquitous, hence skewed
KEYWORDS = {
    "python": ["def", "return", "import", "class", "self", "if", "else", "for", "in", "none"],
    "java": ["public", "static", "void", "class", "import", "return", "int", "new", "final", "null"],
    "c": ["int", "return", "void", "static", "struct", "include", "char", "const", "if", "sizeof"],
    "go": ["func", "return", "package", "import", "var", "type", "struct", "if", "err", "nil"],
    "js": ["function", "return", "const", "let", "var", "import", "export", "if", "else", "async"],
}

SIG_TOKENS = ["zlib_handle", "buffer_overflow", "mutex_guard", "arena_alloc", "ring_buffer"]


def _identifier_vocab(size: int, rng: np.random.RandomState) -> list[str]:
    syllables = [
        "get", "set", "buf", "idx", "ptr", "ctx", "cfg", "tmp", "val", "node",
        "list", "map", "hash", "read", "write", "open", "close", "init", "free",
        "lock", "pool", "task", "queue", "byte", "file", "path", "name", "size",
        "len", "pos", "str", "num", "arr", "obj", "req", "res", "err", "log",
    ]
    vocab: list[str] = []
    seen: set[str] = set()
    i = 0
    while len(vocab) < size:
        parts = rng.randint(1, 4)
        w = "_".join(rng.choice(syllables) for _ in range(parts))
        if parts == 1:
            w = f"{w}{i % 97}"
        if w not in seen:
            seen.add(w)
            vocab.append(w)
        i += 1
    return vocab


def generate_corpus(n_docs: int, seed: int = 13, vocab_size: int | None = None) -> pd.DataFrame:
    """Generate the corpus as a pandas DataFrame (deterministic in seed)."""
    rng = np.random.RandomState(seed)
    if vocab_size is None:
        vocab_size = max(500, min(50_000, n_docs * 3))
    vocab = np.array(_identifier_vocab(vocab_size, rng))
    # zipf ranks for identifier sampling — long hapax tail
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    zipf_p = (1.0 / ranks) / np.sum(1.0 / ranks)

    n_orgs = max(2, int(np.sqrt(n_docs) / 4))
    n_repos = max(3, int(np.sqrt(n_docs) / 2))

    langs = rng.choice(LANGS, size=n_docs, p=LANG_WEIGHTS)
    # zipf-ish repo assignment: some repos much bigger than others
    repo_ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    repo_p = (1.0 / repo_ranks) / np.sum(1.0 / repo_ranks)
    repo_idx = rng.choice(n_repos, size=n_docs, p=repo_p)

    # pre-sample everything in bulk (per-statement rng.choice with a
    # zipf p-vector is O(vocab) per call — pathological at bench scale)
    n_stmts_all = 3 + (rng.zipf(2.0, size=n_docs).astype(np.int64) % 40)
    total_stmts = int(n_stmts_all.sum())
    kw_pick = rng.randint(0, 10, size=(total_stmts, 2))
    n_ids_all = rng.randint(2, 6, size=total_stmts)
    total_ids = int(n_ids_all.sum())
    id_pool = rng.choice(vocab_size, size=total_ids, p=zipf_p)
    lits = rng.randint(0, 4096, size=total_stmts)
    pkgs = rng.randint(0, 20, size=n_docs)
    sig_draw = rng.rand(n_docs)
    sig_pick = rng.randint(0, len(SIG_TOKENS), size=(n_docs, 2))

    rows = []
    stmt_pos = 0
    id_pos = 0
    for i in range(n_docs):
        lang = str(langs[i])
        repo = f"org{repo_idx[i] % n_orgs}/repo{repo_idx[i]}"
        path = f"src/pkg{pkgs[i]}/mod{i}.{LANG_EXT[lang]}"
        commit = hashlib.sha256(f"{repo}:{path}:r{i % 7}".encode()).hexdigest()[:40]
        n_stmts = int(n_stmts_all[i])

        if i % 211 == 5:  # empty file
            content = ""
        elif i == min(17, n_docs - 1):  # pathologically long file
            body = " ".join(vocab[:50][rng.randint(0, 50, size=40_000)])
            content = f"// generated blob\n{body}\n"
        else:
            kw = KEYWORDS[lang]
            parts = [f"// {lang} module {i}"]
            for s in range(stmt_pos, stmt_pos + n_stmts):
                k1, k2 = kw[kw_pick[s, 0]], kw[kw_pick[s, 1]]
                nid = int(n_ids_all[s])
                ids = vocab[id_pool[id_pos : id_pos + nid]]
                id_pos += nid
                parts.append(f"{k1} {ids[0]}({', '.join(ids[1:])}) {k2} {lits[s]};")
            if sig_draw[i] < 0.02:
                parts.append(f"{SIG_TOKENS[sig_pick[i, 0]]} {SIG_TOKENS[sig_pick[i, 1]]}")
            content = "\n".join(parts) + "\n"
        stmt_pos += n_stmts

        rows.append((repo, path, commit, lang, content))

    df = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    # exact duplicates across repos (~1%): same content, different identity
    n_dup = max(1, n_docs // 100)
    dup_src = rng.choice(n_docs, size=n_dup, replace=False)
    for j, s in enumerate(dup_src):
        tgt = (int(s) + 1 + j) % n_docs
        if tgt != s:
            df.iat[tgt, 4] = df.iat[int(s), 4]
    df["sha256"] = df["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    return df


def write_corpus(out_dir: str, n_docs: int, seed: int = 13) -> str:
    """Write corpus parquet + sha256 manifest; returns parquet path."""
    os.makedirs(out_dir, exist_ok=True)
    df = generate_corpus(n_docs, seed=seed)
    pq = os.path.join(out_dir, "corpus.parquet")
    # small row groups keep the single file splittable: Spark assigns scan
    # tasks per row group, so a one-row-group file would serialize every
    # downstream stage no matter how many cores the cluster has
    df.drop(columns=["sha256"]).to_parquet(pq, index=False, row_group_size=2048)
    manifest = {
        "n_docs": n_docs,
        "seed": seed,
        "sha256": dict(zip(df["repo"] + ":" + df["path"] + "@" + df["commit"], df["sha256"])),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return pq


QUERY_SET = [
    {"qid": "q001", "query": "import class return"},
    {"qid": "q002", "query": "public static void"},
    {"qid": "q003", "query": "zlib_handle buffer_overflow"},
    {"qid": "q004", "query": "def def return"},  # duplicate token: weight 2
    {"qid": "q005", "query": "nonexistent_token_xyzzy"},  # OOV
    {"qid": "q006", "query": "import"},  # single very-high-df term
    {"qid": "q007", "query": "func package err"},
    {"qid": "q008", "query": "const function async"},
    {"qid": "q009", "query": "struct sizeof include"},
    {"qid": "q010", "query": "get_buf set_idx"},
    {"qid": "q011", "query": "mutex_guard"},
    {"qid": "q012", "query": "return"},  # ubiquitous across langs → ties
    {"qid": "q013", "query": "class self none import"},
    {"qid": "q014", "query": "new final null"},
    {"qid": "q015", "query": "arena_alloc ring_buffer import"},
]
