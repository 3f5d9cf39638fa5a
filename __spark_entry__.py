"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes the implemented operators from SURVEY.md §2 plus the
training-data-pipeline suite over the driver's testdata tables;
oracle_sql() gives DuckDB-runnable ANSI SQL for each SQL-expressible one.
Engine-native paths (float32 BM25 WAND kernel, LSH-approximate ANN,
multimodal stubs) are exposed without oracles (rows-only checks); their
correctness gates live in tests/ (bit-exact vs the numpy oracle).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ivory_spark.ops import bpe as BP
from ivory_spark.ops import curate as CU
from ivory_spark.ops import dedup as D
from ivory_spark.ops import dsir as DS
from ivory_spark.ops import domains as DOM
from ivory_spark.ops import ir_relational as IR
from ivory_spark.ops import pii as PII
from ivory_spark.ops import repetition as RP
from ivory_spark.ops import sampling as SP
from ivory_spark.ops import similarity as SIM
from ivory_spark.ops import substring as SUB
from ivory_spark.ops import textstats as TS
from ivory_spark.sources.testdata import documents_as_corpus, read_table

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect, tables pre-registered as views)
# ---------------------------------------------------------------------------

TOKS = (
    "toks AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), "
    "x -> x <> '')) AS term FROM documents)"
)
TF = "tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY doc_id, term)"
DL = "dl AS (SELECT doc_id, count(*)::INT AS doclen FROM toks GROUP BY doc_id)"
STATS = (
    "stats AS (SELECT term, count(DISTINCT doc_id)::INT AS df, count(*)::BIGINT AS cf "
    "FROM toks GROUP BY term)"
)
GLOB = "gl AS (SELECT count(*)::BIGINT AS n, avg(doclen)::DOUBLE AS avgdl FROM dl)"


def _sql_query_values(queries) -> str:
    from collections import Counter

    rows = []
    for q in queries:
        toks = [t for t in q["query"].lower().split(" ") if t]
        for term, qtf in sorted(Counter(toks).items()):
            rows.append(f"('{q['qid']}', '{term}', {qtf})")
    return "q(qid, term, qtf) AS (VALUES " + ", ".join(rows) + ")"


QV = _sql_query_values(IR.GATE_QUERIES)

BM25_CONTRIB = (
    "q.qtf * ln((gl.n - stats.df + 0.5) / (stats.df + 0.5)) * "
    "((1.2 + 1) * tf.tf) / (1.2 * ((1 - 0.75) + 0.75 * dl.doclen / gl.avgdl) + tf.tf)"
)

_MINHASH_N = 12
_MINHASH_BAND = 3
_SIMHASH_BITS = 16

_DW = "dw AS (SELECT DISTINCT doc_id, term FROM toks)"


def _sql_minhash_sigs() -> str:
    cols = ", ".join(
        f"min(('0x' || substr(md5('{j}:' || term), 1, 15))::BIGINT) AS m{j}"
        for j in range(_MINHASH_N)
    )
    return f"WITH {TOKS}, {_DW} SELECT doc_id, {cols} FROM dw GROUP BY doc_id"


def _sql_minhash_pairs_ctes(threshold: float = 0.8) -> str:
    """CTE chain ending in vpairs(doc_a, doc_b, jaccard) — the verified
    minhash near-dup pairs, shared by the pairs gate and the clusters
    gate (which closes the pairs into connected components)."""
    sig_cols = ", ".join(
        f"min(('0x' || substr(md5('{j}:' || term), 1, 15))::BIGINT) AS m{j}"
        for j in range(_MINHASH_N)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, ".format(b=b)
        + " || '_' || ".join(f"m{b * _MINHASH_BAND + j}::VARCHAR" for j in range(_MINHASH_BAND))
        + " AS bkey FROM sigs"
        for b in range(_MINHASH_N // _MINHASH_BAND)
    )
    return f"""{TOKS}, {_DW},
sigs AS (SELECT doc_id, {sig_cols} FROM dw GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         WHERE a.doc_id < b.doc_id),
nw AS (SELECT doc_id, count(*) AS n FROM dw GROUP BY doc_id),
iw AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
       FROM cand c JOIN dw wa ON wa.doc_id = c.doc_a
       JOIN dw wb ON wb.doc_id = c.doc_b AND wb.term = wa.term
       GROUP BY c.doc_a, c.doc_b),
vpairs AS (SELECT c.doc_a, c.doc_b,
       round(coalesce(iw.inter, 0) / (na.n + nb.n - coalesce(iw.inter, 0)), 6) AS jaccard
FROM cand c
LEFT JOIN iw ON iw.doc_a = c.doc_a AND iw.doc_b = c.doc_b
JOIN nw na ON na.doc_id = c.doc_a
JOIN nw nb ON nb.doc_id = c.doc_b
WHERE round(coalesce(iw.inter, 0) / (na.n + nb.n - coalesce(iw.inter, 0)), 6) >= {threshold})"""


def _sql_minhash_pairs(threshold: float = 0.8) -> str:
    return f"""
WITH {_sql_minhash_pairs_ctes(threshold)}
SELECT doc_a, doc_b, jaccard FROM vpairs
"""


def _sql_minhash_clusters(threshold: float = 0.8) -> str:
    """Connected components over the verified pairs via a recursive
    transitive closure; cluster_id = min doc id of the component — the
    exact twin of ops/dedup.dedup_clusters' min-label fixpoint."""
    return f"""
WITH RECURSIVE {_sql_minhash_pairs_ctes(threshold)},
cedges AS (SELECT doc_a AS a, doc_b AS b FROM vpairs
           UNION SELECT doc_b, doc_a FROM vpairs),
reach(a, b) AS (
  SELECT a, b FROM cedges
  UNION
  SELECT r.a, e.b FROM reach r JOIN cedges e ON e.a = r.b
),
cnodes AS (SELECT DISTINCT a AS id FROM cedges)
SELECT n.id AS doc_id, least(n.id, min(r.b))::BIGINT AS cluster_id
FROM cnodes n JOIN reach r ON r.a = n.id
GROUP BY n.id
"""


def _sql_simhash_expr() -> str:
    bits = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN tf ELSE -tf END) > 0 "
        f"THEN {2**b} ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    return f"""
WITH {TOKS}, {TF},
h AS (SELECT doc_id, term, tf, ('0x' || substr(md5('0:' || term), 1, 15))::BIGINT AS h FROM tf)
SELECT doc_id, ({bits})::BIGINT AS simhash FROM h GROUP BY doc_id
"""


def _sql_langid() -> str:
    score_cols = []
    for lang, markers in sorted(TS.LANG_MARKERS.items()):
        in_list = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"sum(CASE WHEN term IN ({in_list}) THEN 1 ELSE 0 END)::INT AS s_{lang}"
        )
    langs = sorted(TS.LANG_MARKERS)
    m = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    case = "CASE " + " ".join(f"WHEN s_{la} = m THEN '{la}'" for la in langs) + " END"
    return f"""
WITH {TOKS},
sc AS (SELECT doc_id, {", ".join(score_cols)} FROM toks GROUP BY doc_id)
SELECT doc_id, {case} AS pred_lang, m::INT AS score
FROM (SELECT *, {m} AS m FROM sc)
"""


# ---------------------------------------------------------------------------
# entry / queries / oracle_sql
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 documents table."""
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    return IR.bm25_top10(spark, docs, IR.GATE_QUERIES)


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def _docs_structured(spark, sf_dir):
    """documents with deterministic line/paragraph structure injected
    (the synthetic text has no newlines, which would leave the
    repetition gate's line/paragraph columns degenerate): ' table ' ->
    blank line, then ' the ' -> newline. The DuckDB twin applies the
    identical literal replaces, so the gate exercises every column of
    repetition_stats on real variation."""
    d = _docs(spark, sf_dir)
    t = F.regexp_replace(F.col("text"), " table ", "\n\n")
    t = F.regexp_replace(t, " the ", "\n")
    return d.select("doc_id", t.alias("text"))


# DuckDB twin of _docs_structured's text expression
_SQL_STRUCTURED_TEXT = (
    "replace(replace(text, ' table ', chr(10) || chr(10)), ' the ', chr(10))"
)


def _docs_pii(spark, sf_dir):
    """documents with deterministic PII injected (the synthetic text has
    no emails/phones/IPs, which would leave the PII gates all-zero):
    every 3rd doc gains two emails, every 4th an international phone,
    every 5th an IPv4 — so the gates exercise multi-match counting,
    redaction order, and the untouched-text path on one table. The
    DuckDB twin applies the identical concatenation."""
    d = _docs(spark, sf_dir)
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit(" contact alice.smith+spam@mail.example.org or Bob.J@EX.co now"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0, F.lit(" call +1 555-867 5309 today")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit(" host 10.0.254.7 responded")
        ).otherwise(F.lit("")),
    )
    return d.select("doc_id", t.alias("text"))


# DuckDB twin of _docs_pii's text expression
_SQL_PII_TEXT = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN"
    " ' contact alice.smith+spam@mail.example.org or Bob.J@EX.co now' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' call +1 555-867 5309 today' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.254.7 responded' ELSE '' END"
)

# gate parameters for the sampling suite (shared by queries() and oracle_sql())
_SPLIT_WEIGHTS = {"train": 8.0, "val": 1.0, "test": 1.0}
_MIX_RATES = {"src0": 0.9, "src1": 0.5, "src2": 0.25, "src3": 1.0}
# per-source epoch counts for the upsampling gate: covers >1 whole part,
# frac-only (0.75 drops some docs entirely), and integer (no frac branch)
_EPOCHS = {"src0": 2.5, "src1": 1.25, "src2": 0.75, "src3": 3.0}

# BPE gate fixture: 24 merges learned by ops/bpe.train_bpe from the
# sf0.01 documents word counts (deterministic: count desc, pair-lex
# tie-break) — pinned here so the oracle can replay them as literal
# string replaces. All merges have a != b (encode_fingerprint
# precondition). Recorded in FIXTURES.md.
_BPE_MERGES = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"), ("o", "w"),
    ("ow", "</w>"), ("o", "r"), ("s", "t"), ("h", "</w>"), ("a", "t"),
    ("l", "u"), ("i", "n"), ("a", "</w>"), ("g", "</w>"), ("y", "</w>"),
    ("a", "r"), ("p", "ar"), ("t", "</w>"), ("i", "n</w>"), ("j", "o"),
    ("jo", "in</w>"), ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"),
]

# DSIR gate parameters: 64 hash buckets (the oracle recomputes the full
# fit in SQL via generate_series, so the bucket table is never injected
# as literals), target = two of the twenty synthetic sources.
_DSIR_BUCKETS = 64
_DSIR_TARGET = ("src0", "src1")


def _pii_redact_fp(spark, sf_dir):
    """redact_pii projected to a hashable gate shape: (doc_id, fp16 =
    md5 prefix of the redacted text, n_chars)."""
    r = PII.redact_pii(_docs_pii(spark, sf_dir))
    return r.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fp16"),
        F.length("text").cast("int").alias("n_chars"),
    )


# Duplicate canary for the curate_pipeline gate: every 13th doc's text is
# replaced wholesale by this constant, so the exact-dedup stage visibly
# collapses 39 docs -> 1 at sf0.01. Built from tokens outside the synthetic
# vocabulary (no 4-gram run of stopwords reaches length 4), so the canary
# never trips the decontamination stage; 9/22 stopwords + 22 distinct
# tokens put its quality score at 1.0, clearing the gate's 0.6 floor.
_CURATE_CANARY = (
    "zanzibar quokka and the xylophone of a marimba is qwerty for wombat"
    " on kumquat with jacaranda in bandicoot narwhal axolotl pangolin vicuna"
)


def _docs_curate(spark, sf_dir):
    """curate_pipeline gate input: PII-injected documents with the
    duplicate canary overriding every 13th doc, so one table exercises
    the quality gate (min_quality=0.6 keeps ~half), exact dedup (39
    identical canaries), decontamination (vs the doc_id%17 benchmark
    slice) and redaction (the injected PII) in a single composed run."""
    d = _docs_pii(spark, sf_dir)
    t = F.when(F.col("doc_id") % 13 == 0, F.lit(_CURATE_CANARY)).otherwise(
        F.col("text")
    )
    return d.select("doc_id", t.alias("text"))


# DuckDB twin of _docs_curate's text expression
_SQL_CURATE_TEXT = (
    f"CASE WHEN doc_id % 13 = 0 THEN '{_CURATE_CANARY}' ELSE {_SQL_PII_TEXT} END"
)


def _curate_pipeline(spark, sf_dir):
    """One-call curation recipe (ops/curate.curate_corpus) over the
    canary+PII table: quality gate -> exact dedup -> benchmark
    decontamination -> PII redaction -> hash split, projected to a
    hashable shape (doc_id, fp16 of the redacted text, n_chars, split).
    The repetition and near-dup stages are disabled here — each has its
    own dedicated gate — keeping the oracle a five-stage CTE chain."""
    docs = _docs_curate(spark, sf_dir)
    bench = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", "text")
    )
    out = CU.curate_corpus(
        docs,
        min_quality=0.6,
        max_dup_line_frac=None,
        max_top_ngram_char_frac=None,
        exact_dedup=True,
        neardup_threshold=None,
        benchmark=bench,
        decontaminate_ngram=4,
        redact=True,
        split_weights=_SPLIT_WEIGHTS,
    )
    return out.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fp16"),
        F.length("text").cast("int").alias("n_chars"),
        "split",
    )


def _source_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the documents table: parquet file names,
    sizes and mtimes. Regenerated testdata at the same path invalidates
    the cached corpus/index instead of silently reusing a stale one."""
    import hashlib

    p = os.path.join(sf_dir, "documents.parquet")
    parts = []
    if os.path.isdir(p):
        for name in sorted(os.listdir(p)):
            st = os.stat(os.path.join(p, name))
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(p):
        st = os.stat(p)
        parts.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:12]


def _engine_index(
    spark: SparkSession, sf_dir: str, positional: bool = False,
    tokenizer: str = "code_v1",
) -> "object":
    """Build (or resume) the engine index over documents-as-corpus in a
    temp workdir keyed by sf_dir + source content fingerprint."""
    from ivory_spark.index.build import IndexConfig, build_index
    from ivory_spark.index.reader import open_index

    tag = sf_dir.strip("/").replace("/", "_") + "_" + _source_fingerprint(sf_dir)
    work = os.path.join(tempfile.gettempdir(), f"ivory_engine_{tag}")
    corpus_path = os.path.join(work, "corpus.parquet")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        documents_as_corpus(spark, sf_dir).write.mode("overwrite").parquet(corpus_path)
    name = "index_pos" if positional else "index"
    if tokenizer != "code_v1":
        name += "_" + tokenizer
    root = os.path.join(work, name)
    build_index(
        spark, corpus_path, root, IndexConfig(positional=positional, tokenizer=tokenizer)
    )
    return open_index(spark, root)


def _engine_nl_bm25_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end under the nl_nostem analysis chain (stoplisted NL
    tokenization, no stemming): the one NL chain whose every step is
    SQL-expressible, so the DuckDB oracle hash-verifies a full
    non-code-tokenizer build + query — the stemmed chains (galago_en/de,
    lucene_cs/ar) are pytest-verified instead (no SQL stemmer)."""
    from ivory_spark.query.wand import bm25_topk_wand

    index = _engine_index(spark, sf_dir, tokenizer="nl_nostem")
    return _round4(bm25_topk_wand(spark, index, IR.GATE_QUERIES, k=10))


def _round4(df: DataFrame) -> DataFrame:
    """Gate shape: float32 score promoted to double (exact) then rounded —
    reproducible bit-for-bit by the float32-emulating DuckDB oracles."""
    return df.withColumn("score", F.round(F.col("score").cast("double"), 4))


def _engine_bm25_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real engine end-to-end: build (or resume) the float32 index
    over documents-as-corpus, then block-max WAND top-10."""
    from ivory_spark.query.wand import bm25_topk_wand

    index = _engine_index(spark, sf_dir)
    return _round4(bm25_topk_wand(spark, index, IR.GATE_QUERIES, k=10))


def _engine_sd_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-dependence MRF (term + #od1 + #uw8 features) over a
    positional index — the engine-native SD model (float32-emulating
    DuckDB oracle below; bit-exact golden tests in tests/test_mrf.py)."""
    from ivory_spark.query.mrf import MrfModel, mrf_topk

    index = _engine_index(spark, sf_dir, positional=True)
    return _round4(mrf_topk(spark, index, IR.GATE_QUERIES, MrfModel(dependence="sd")))


_SD_RUNFILE_XML = """
<model id="gate-sd" type="Feature" hits="10">
  <feature id="termWt" weight="0.82"
           cliqueSet="ivory.smrf.model.builder.TermCliqueSet"
           potential="ivory.smrf.model.potential.QueryPotential"
           generator="ivory.smrf.model.builder.TermExpressionGenerator"
           scoreFunction="ivory.smrf.model.score.BM25ScoringFunction" />
  <feature id="orderedWt" weight="0.09"
           cliqueSet="ivory.smrf.model.builder.OrderedCliqueSet" dependence="sequential"
           potential="ivory.smrf.model.potential.QueryPotential"
           generator="ivory.smrf.model.builder.OrderedWindowExpressionGenerator" width="1"
           scoreFunction="ivory.smrf.model.score.BM25ScoringFunction" />
  <feature id="unorderedWt" weight="0.09"
           cliqueSet="ivory.smrf.model.builder.OrderedCliqueSet" dependence="sequential"
           potential="ivory.smrf.model.potential.QueryPotential"
           generator="ivory.smrf.model.builder.UnorderedWindowExpressionGenerator" width="4"
           scoreFunction="ivory.smrf.model.score.BM25ScoringFunction" />
</model>
"""


def _engine_xml_sd_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-XML wiring gated end-to-end: a reference-shaped
    type="Feature" run file (weights/width matching the default SD model)
    parses via parse_model_xml and runs through run_batch — the result
    must hash-match the SAME DuckDB oracle as the programmatic SD gate
    (run.robust04.basic.xml replay, S8 + FeatureBasedMRFBuilder parity)."""
    from ivory_spark.query.batch import parse_model_xml, run_batch

    index = _engine_index(spark, sf_dir, positional=True)
    model = parse_model_xml(_SD_RUNFILE_XML)
    return _round4(run_batch(spark, index, IR.GATE_QUERIES, model))


def _engine_cascade_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage cascade (K5): WAND BM25 stage 1 keeps the top 20, the
    SD MRF reranks only those survivors — the CascadeEval-shaped path
    with a DuckDB twin (float32 BM25 stage-1 emulation restricting the
    SD oracle's candidate set)."""
    from ivory_spark.query.cascade import cascade_topk
    from ivory_spark.query.mrf import MrfModel

    index = _engine_index(spark, sf_dir, positional=True)
    return _round4(
        cascade_topk(
            spark, index, IR.GATE_QUERIES, stage1_k=20,
            model=MrfModel(dependence="sd", k=10),
        )
    )


def _engine_cascade_pruned_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade with a CascadeEval pruning function between stages
    (query/cascade.prune_retain_size, CascadeEval.java:148-227): WAND
    keeps the top 20, an SD stage ranks ALL survivors and the mean-max
    pruner (param 0.6, K floor 3) retains the leading float32-threshold
    run, then the final SD stage cuts to 10. Both MRF stages share the
    SD model on purpose: the output is then exactly the pruned prefix of
    the ranked list, so the gate hash pins the float32 retain-size
    computation itself."""
    from ivory_spark.query.cascade import cascade_topk
    from ivory_spark.query.mrf import MrfModel

    index = _engine_index(spark, sf_dir, positional=True)
    stages = [
        {"model": MrfModel(dependence="sd"), "pruner": "mean-max",
         "pruner_param": 0.6, "K": 3},
        {"model": MrfModel(dependence="sd"), "k": 10},
    ]
    return _round4(
        cascade_topk(spark, index, IR.GATE_QUERIES, stage1_k=20, stages=stages)
    )


def _bitext_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext parallel-sentence mining (ops/bitext.py, reproducing
    ivory/lsh/bitext/FindParallelSentencePairs.java) over a deterministic
    two-language fixture from the documents table: even doc_ids are the
    "English" side, odd doc_ids the "foreign" side, candidate doc pairs
    are (e, e+1), and the translation table is the identity over foreign
    tokens of length <= 8 (longer tokens have no translation — exercising
    the untranslatable-term drop). Full pipeline: sentence split +
    MinSentenceLength/MinVectorTerms filters, vector translation, 2x
    length-ratio cutoff, cosine >= 0.6."""
    from ivory_spark.ops.bitext import (
        docs_to_sentences,
        find_parallel_sentence_pairs,
        translate_vectors,
    )

    docs = _docs(spark, sf_dir)
    e_sents = docs_to_sentences(
        docs.filter(F.col("doc_id") % 2 == 0), docno_col="doc_id", text_col="text"
    )
    f_sents = docs_to_sentences(
        docs.filter(F.col("doc_id") % 2 == 1), docno_col="doc_id", text_col="text"
    )
    # ttable is a broadcast model artifact by nature; collecting the
    # short-token foreign vocabulary stands in for loading one
    vocab = sorted(
        r[0]
        for r in f_sents.select(
            F.explode(F.map_keys("vector")).alias("t")
        ).distinct().collect()
        if len(r[0]) <= 8
    )
    f_tr = translate_vectors(f_sents, {t: [(t, 1.0)] for t in vocab})
    ids = docs.select("doc_id")
    pairs = (
        ids.filter(F.col("doc_id") % 2 == 0)
        .select(F.col("doc_id").alias("e_docno"), (F.col("doc_id") + 1).alias("f_docno"))
        .join(ids.select(F.col("doc_id").alias("f_docno")), "f_docno")
    )
    return find_parallel_sentence_pairs(pairs, e_sents, f_tr, threshold=0.6)


def _sql_bitext_pairs(threshold: float = 0.6) -> str:
    """DuckDB twin of _bitext_pairs: tf vectors are integer-valued
    doubles, so every sum (dot, squared norms) is exact regardless of
    fold order — cosine is bit-deterministic without ordered folds."""
    rx = "[a-z_][a-z0-9_]*|[0-9]+"
    side = (
        "SELECT docno, gs - 1 AS sent_id, sentence, "
        f"list_filter(regexp_extract_all(lower(sentence), '{rx}'), "
        "t -> length(t) <= 126) AS toks "
        "FROM (SELECT doc_id AS docno, "
        "unnest(regexp_split_to_array(text, '[.!?\\n。！？]+')) AS sentence, "
        "generate_subscripts(regexp_split_to_array(text, '[.!?\\n。！？]+'), 1) AS gs "
        "FROM documents WHERE {cond}) WHERE trim(sentence) != ''"
    )
    return f"""
WITH eraw AS ({side.format(cond='doc_id % 2 = 0')}),
fraw AS ({side.format(cond='doc_id % 2 = 1')}),
elen AS (SELECT docno, sent_id, sentence, len(toks) AS length, toks FROM eraw WHERE len(toks) >= 5),
flen AS (SELECT docno, sent_id, sentence, len(toks) AS length, toks FROM fraw WHERE len(toks) >= 5),
etf AS (SELECT docno, sent_id, t AS term, count(*)::DOUBLE AS w
        FROM (SELECT docno, sent_id, unnest(toks) AS t FROM elen) GROUP BY ALL),
ftf AS (SELECT docno, sent_id, t AS term, count(*)::DOUBLE AS w
        FROM (SELECT docno, sent_id, unnest(toks) AS t FROM flen) GROUP BY ALL),
evok AS (SELECT docno, sent_id FROM etf GROUP BY docno, sent_id HAVING count(DISTINCT term) >= 3),
fvok AS (SELECT docno, sent_id FROM ftf GROUP BY docno, sent_id HAVING count(DISTINCT term) >= 3),
ettf AS (SELECT e.* FROM etf e JOIN evok USING (docno, sent_id)),
fttf AS (SELECT f.* FROM ftf f JOIN fvok USING (docno, sent_id) WHERE length(term) <= 8),
emeta AS (SELECT l.docno, l.sent_id, l.sentence, l.length FROM elen l JOIN evok USING (docno, sent_id)),
fmeta AS (SELECT l.docno, l.sent_id, l.sentence, l.length
          FROM flen l JOIN (SELECT DISTINCT docno, sent_id FROM fttf) s USING (docno, sent_id)),
enorm AS (SELECT docno, sent_id, sqrt(sum(w*w)) AS nrm FROM ettf GROUP BY ALL),
fnorm AS (SELECT docno, sent_id, sqrt(sum(w*w)) AS nrm FROM fttf GROUP BY ALL),
pairs AS (SELECT a.doc_id AS e_docno, b.doc_id AS f_docno FROM documents a
          JOIN documents b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 2 = 0),
cand AS (SELECT p.e_docno, p.f_docno, e.sent_id AS e_sent_id, f.sent_id AS f_sent_id,
                e.sentence AS e_sentence, f.sentence AS f_sentence
         FROM pairs p JOIN emeta e ON e.docno = p.e_docno
         JOIN fmeta f ON f.docno = p.f_docno
         WHERE NOT (e.length > 2.0*f.length OR f.length > 2.0*e.length)),
dots AS (SELECT c.e_docno, c.f_docno, c.e_sent_id, c.f_sent_id, sum(e.w * f.w) AS dot
         FROM cand c JOIN ettf e ON e.docno = c.e_docno AND e.sent_id = c.e_sent_id
         JOIN fttf f ON f.docno = c.f_docno AND f.sent_id = c.f_sent_id AND f.term = e.term
         GROUP BY ALL)
SELECT c.e_docno, c.f_docno, c.e_sent_id::INT AS e_sent_id, c.f_sent_id::INT AS f_sent_id,
       c.e_sentence, c.f_sentence,
       round(CASE WHEN en.nrm > 0 AND fn.nrm > 0
                  THEN coalesce(d.dot, 0) / (en.nrm * fn.nrm) ELSE 0 END, 6) AS cosine
FROM cand c
LEFT JOIN dots d USING (e_docno, f_docno, e_sent_id, f_sent_id)
JOIN enorm en ON en.docno = c.e_docno AND en.sent_id = c.e_sent_id
JOIN fnorm fn ON fn.docno = c.f_docno AND fn.sent_id = c.f_sent_id
WHERE CASE WHEN en.nrm > 0 AND fn.nrm > 0
           THEN coalesce(d.dot, 0) / (en.nrm * fn.nrm) ELSE 0 END >= {threshold}
"""


def _ptc_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-test-collection generation (ops/ptc.py): synthetic anchor
    links derived deterministically from the documents table — anchor
    text = the doc's first two code_v1 tokens, source = the doc, target
    = (doc_id % 23) + 1 (collisions create multi-link targets) — then
    the full reference pipeline: anchor inverted index (distinct in-link
    weights), top-5 judgment extractor, sum/count query scores, top-30
    sampling criterion."""
    from ivory_spark.ops.ptc import anchor_text_inverted_index, pseudo_test_collection

    docs = _docs(spark, sf_dir)
    toks = F.expr(
        "filter(regexp_extract_all(lower(text), '[a-z_][a-z0-9_]*|[0-9]+', 0), "
        "t -> length(t) <= 126)"
    )
    anchors = (
        docs.select(F.col("doc_id").alias("src_docno"), toks.alias("l"))
        .filter(F.size("l") >= 2)
        .select(
            "src_docno",
            F.concat_ws(" ", F.col("l")[0], F.col("l")[1]).alias("anchor_text"),
            ((F.col("src_docno") % 23) + 1).alias("target_docno"),
        )
    )
    col = pseudo_test_collection(
        anchor_text_inverted_index(anchors),
        judgments=("top_n", 5),
        criterion=("top_n", 30),
    )
    return col.select(
        "qid", "query",
        F.round(F.col("score").cast("double"), 6).alias("score"),
        "n_targets",
    )


def _sql_ptc_queries() -> str:
    return """
WITH toks AS (SELECT doc_id,
      list_filter(regexp_extract_all(lower(text), '[a-z_][a-z0-9_]*|[0-9]+'),
                  t -> length(t) <= 126) AS l FROM documents),
anch AS (SELECT doc_id AS src, l[1] || ' ' || l[2] AS anchor_text,
                (doc_id % 23) + 1 AS target
         FROM toks WHERE len(l) >= 2),
ai AS (SELECT anchor_text, target, count(DISTINCT src)::FLOAT AS w
       FROM anch GROUP BY anchor_text, target),
tr AS (SELECT *, row_number() OVER (PARTITION BY anchor_text
                 ORDER BY w DESC, target) AS trank FROM ai),
cut AS (SELECT * FROM tr WHERE trank <= 5),
q AS (SELECT anchor_text AS query, (sum(w) / count(*))::FLOAT AS score,
             count(*)::INT AS n_targets
      FROM cut GROUP BY anchor_text),
ranked AS (SELECT *, row_number() OVER (ORDER BY score DESC, query)::INT AS qid
           FROM q)
SELECT qid, query, round(score::DOUBLE, 6) AS score, n_targets
FROM ranked WHERE qid <= 30
"""


def _sqe_gate_queries() -> list[dict]:
    """Structured (sqe) twins of the gate queries, one fixed shape that
    exercises every operator: #combine[ #weight(0.7 t0, 0.3 t1),
    t2..., phrase(t0 t1) ] — tf/df blending, plain leaves, an
    ordered-window-2 phrase, and (g5) an OOV term inside the blend plus
    an OOV phrase."""
    from ivory_spark.functions.tokenizer import tokenize_py

    out = []
    for q in IR.GATE_QUERIES:
        toks = tokenize_py(q["query"])
        children = (
            [{"#weight": [0.7, toks[0], 0.3, toks[1]]}]
            + list(toks[2:])
            + [" ".join(toks[:2])]
        )
        out.append({"qid": q["qid"], "query": {"#combine": children}})
    return out


def _engine_sqe_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIR structured-query retrieval (query/sqe.py): #weight blends
    weighted tf/df BEFORE one fixed-parameter BM25 (the probabilistic
    structured-query semantics, sqe/retrieval/PostingsReaderWrapper.java:
    176-190), #combine sums child scores, phrases are ordered windows of
    size 2 with default df."""
    from ivory_spark.query.sqe import sqe_topk

    index = _engine_index(spark, sf_dir, positional=True)
    return _round4(sqe_topk(spark, index, _sqe_gate_queries(), k=10))


def _sql_engine_sqe_top10(k: int = 10) -> str:
    """DuckDB float32 oracle for _engine_sqe_top10. Per gate query the
    children are (cidx 0) the #weight blend node, (1..) single-term
    leaves, (last) the 2-term phrase. TfDfWeight.getScore is emulated
    with Java's exact float grouping — ((k1+1)*tf) / (k1*((1-b) +
    (b*dl)/avgdl) + tf) * idf with k1=0.5, b=0.3, avgdl = clen // n
    (integer division), idf = float32(ln(((N - df) + 0.5)/(df + 0.5)))
    on float32-blended fractional tf/df. Zero-score children drop out of
    the child-ordered float32 fold (+0.0/-0.0 are fold identities).
    Candidates = docs matching >= 1 leaf (blend terms, plain terms, or a
    phrase window match)."""
    from ivory_spark.functions.tokenizer import tokenize_py

    wrows, trows, prows = [], [], []
    for q in IR.GATE_QUERIES:
        toks = tokenize_py(q["query"])
        wrows.append(f"('{q['qid']}', 0, 0.7::FLOAT, '{toks[0]}')")
        wrows.append(f"('{q['qid']}', 1, 0.3::FLOAT, '{toks[1]}')")
        for i, t in enumerate(toks[2:]):
            trows.append(f"('{q['qid']}', {i + 1}, '{t}')")
        kind = "same" if toks[0] == toks[1] else "diff"
        prows.append(
            f"('{q['qid']}', {1 + len(toks[2:])}, '{toks[0]}', '{toks[1]}', '{kind}')"
        )
    wvals = "wch(qid, widx, w, term) AS (VALUES " + ", ".join(wrows) + ")"
    tvals = (
        "tch(qid, cidx, term) AS (VALUES " + ", ".join(trows) + ")"
        if trows
        else "tch(qid, cidx, term) AS (SELECT NULL, NULL, NULL WHERE FALSE)"
    )
    pvals = "pch(qid, cidx, t1, t2, kind) AS (VALUES " + ", ".join(prows) + ")"
    avgdl = "((egl.clen // egl.n)::FLOAT)"
    default_df = "((egl.n // 100)::FLOAT)"

    def score(tf: str, df: str) -> str:
        return f"""(((((0.5::FLOAT + 1.0::FLOAT) * {tf})
      / ((0.5::FLOAT * ((1.0::FLOAT - 0.3::FLOAT)
           + ((0.3::FLOAT * edl.dl::FLOAT) / {avgdl})))
         + {tf}))
      * (ln((((egl.n::FLOAT - {df}) + 0.5::FLOAT) / ({df} + 0.5::FLOAT))::DOUBLE)::FLOAT)))"""

    return f"""
WITH {_ENGINE_CTES}, {wvals}, {tvals}, {pvals},
epos AS (SELECT p.docno, p.term, p.pos FROM (
   SELECT docno, unnest(l) AS term, generate_subscripts(l, 1)::BIGINT AS pos
   FROM (SELECT docno, list_filter(regexp_extract_all(lower(content),
        '[a-z_][a-z0-9_]*|[0-9]+'), t -> length(t) <= 126) AS l FROM edocmap)
 ) p JOIN etf ON etf.docno = p.docno AND etf.term = p.term),
-- blended df per qid: float32 fold of w*df in child order, OOV df = 0
wdf AS (SELECT qid, list_reduce(list((w * coalesce(edict.df, 0)::FLOAT)::FLOAT
                                     ORDER BY widx), (a, b) -> (a + b)::FLOAT) AS dfb
        FROM wch LEFT JOIN edict USING (term) GROUP BY qid),
-- blended tf per (qid, docno): fold of w*tf over PRESENT terms (w*0 is identity)
wtf AS (SELECT wch.qid, etf.docno,
        list_reduce(list((wch.w * etf.tf::FLOAT)::FLOAT ORDER BY wch.widx),
                    (a, b) -> (a + b)::FLOAT) AS tfb
        FROM wch JOIN edict USING (term) JOIN etf USING (term)
        GROUP BY wch.qid, etf.docno),
wscore AS (SELECT w.qid, w.docno, 0 AS cidx, {score("w.tfb", "wdf.dfb")} AS c
           FROM wtf w JOIN wdf USING (qid)
           JOIN edl ON edl.docno = w.docno CROSS JOIN egl),
tscore AS (SELECT tch.qid, etf.docno, tch.cidx,
           {score("etf.tf::FLOAT", "edict.df::FLOAT")} AS c
           FROM tch JOIN edict USING (term) JOIN etf USING (term)
           JOIN edl ON edl.docno = etf.docno CROSS JOIN egl),
-- phrase tf: ordered window 2; duplicate-token closed form od(t,t) = |P|
podx AS (SELECT pch.qid, pch.cidx, a.docno, a.pos AS pa, min(b.pos) AS mb
         FROM pch JOIN epos a ON a.term = pch.t1
         JOIN epos b ON b.docno = a.docno AND b.term = pch.t2 AND b.pos > a.pos
         WHERE pch.kind = 'diff'
         GROUP BY pch.qid, pch.cidx, a.docno, a.pos),
ptf AS (SELECT qid, cidx, docno, least(count(*), 32767)::BIGINT AS tf
        FROM podx WHERE mb - pa <= 2 GROUP BY qid, cidx, docno
        UNION ALL
        SELECT pch.qid, pch.cidx, e.docno, least(count(*), 32767)::BIGINT AS tf
        FROM pch JOIN epos e ON e.term = pch.t1 WHERE pch.kind = 'same'
        GROUP BY pch.qid, pch.cidx, e.docno),
pscore AS (SELECT p.qid, p.docno, p.cidx, {score("p.tf::FLOAT", default_df)} AS c
           FROM ptf p JOIN edl ON edl.docno = p.docno CROSS JOIN egl),
allc AS (SELECT * FROM wscore UNION ALL SELECT * FROM tscore
         UNION ALL SELECT * FROM pscore),
scored AS (SELECT qid, docno,
           list_reduce(list(c ORDER BY cidx), (a, b) -> (a + b)::FLOAT) AS score
           FROM allc GROUP BY qid, docno),
top AS (SELECT qid, docno, score,
        row_number() OVER (PARTITION BY qid ORDER BY score DESC, docno DESC)::INT AS rank
        FROM scored)
SELECT t.qid, t.rank, t.docno, {_ENGINE_DOCID} AS docid,
       round(t.score::DOUBLE, 4) AS score
FROM top t JOIN edocmap d USING (docno) WHERE t.rank <= {k}
"""


def _wsd_gate_model():
    """Weighted-SD gate model: deterministic concept-importance values
    derived from the gate queries' own concept strings (value =
    (len(concept) % 7 + 1) / 4), two metafeatures with defaults — both
    the Spark path and the SQL generator call build_cliques on THIS
    model, so the clique VALUES embed identical combined weights."""
    from ivory_spark.functions.tokenizer import tokenize_py
    from ivory_spark.query.importance import LinearImportanceModel, MetaFeature
    from ivory_spark.query.mrf import FeatureSpec, MrfModel

    concepts = set()
    for q in IR.GATE_QUERIES:
        toks = tokenize_py(q["query"])
        concepts.update(toks)
        concepts.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    values = {c: (len(c) % 7 + 1) / 4.0 for c in sorted(concepts)}
    imodel = LinearImportanceModel([
        MetaFeature("lenmod", 0.7, values, 0.25),
        MetaFeature("flat", 0.3, {}, 0.5),
    ])
    return MrfModel(
        dependence="sd",
        features=[
            FeatureSpec("term", 0.8, name="termWt", importance="wsd"),
            FeatureSpec("od", 0.1, width=1, name="orderedWt", importance="wsd"),
            FeatureSpec("uw", 0.1, width=4, name="unorderedWt"),
        ],
        importance_models={"wsd": imodel},
        normalize_importance=True,
        pruning_threshold_bigram=0.01,
        k=10,
    )


def _engine_wsd_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Sequential Dependence (smrf/model/importance): term and
    ordered-window cliques carry query-dependent importance weights from
    a LinearImportanceModel (normalized, bigram-pruned), folded through
    the same float32 MRF kernel — oracle = the SD SQL twin fed the WSD
    model's combined clique weights."""
    from ivory_spark.query.mrf import mrf_topk

    index = _engine_index(spark, sf_dir, positional=True)
    return _round4(mrf_topk(spark, index, IR.GATE_QUERIES, _wsd_gate_model()))


_LTR_FEATURE_COLS = ("sdm-termWt", "sdm-orderedWt", "sdm-unorderedWt")

# Fixed "hand-learned" ranking model for the ltr_model_scores gate: one
# of each LtrFeature kind over the three base columns, scored with the
# sequential float32 translate fold (ltr.py LearnedModel.score,
# reproducing ivory/ltr Rank.java:55-60 / ScoreTable.java:40-46).
_LTR_GATE_FEATURES = (
    ("simple", 0, -1), ("log", 1, -1), ("product", 0, 2), ("quotient", 2, 0),
)
_LTR_GATE_WEIGHTS = (0.4, 0.3, 0.2, 0.1)


def _ltr_qrels(n_docs: int) -> dict:
    """Deterministic graded judgments both sides can derive from docno
    alone: every 5th doc judged (docno % 5 == 1), grade = docno % 4."""
    judged = {d: float(d % 4) for d in range(1, n_docs + 1, 5)}
    return {q["qid"]: judged for q in IR.GATE_QUERIES}


def _ltr_feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw (unrounded) ExtractFeatures frame over the judged grid — the
    shared input of the ltr_features and ltr_model_scores gates."""
    from ivory_spark.query.features import extract_features
    from ivory_spark.query.mrf import FeatureSpec, MrfModel

    index = _engine_index(spark, sf_dir, positional=True)
    model = MrfModel(
        dependence="sd",
        features=[
            FeatureSpec("term", 0.82, name="termWt"),
            FeatureSpec("od", 0.09, width=1, name="orderedWt"),
            FeatureSpec("uw", 0.09, width=4, name="unorderedWt"),
        ],
    )
    return extract_features(
        spark, index, IR.GATE_QUERIES, _ltr_qrels(index.properties["n_docs"]),
        {"sdm": model},
    )


def _ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ltr feature extraction (ExtractFeatures parity): per judged doc,
    the UNWEIGHTED per-spec clique potential sums of the SD model —
    term / ordered-window / unordered-window columns — plus the grade.
    Feature values are float32 ordered folds, so the DuckDB oracle
    reproduces them bit-for-bit."""
    df = _ltr_feature_frame(spark, sf_dir)
    cols = [F.col("qid"), F.col("docno"), F.col("grade").cast("double").alias("grade")]
    cols += [
        F.round(F.col(f"`{nm}`").cast("double"), 4).alias(nm)
        for nm in _LTR_FEATURE_COLS
    ]
    return df.select(*cols)


def _ltr_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end learned-model ranking scores (ltr.py LearnedModel.score
    — the sequential float32 translate fold of Rank.java:55-60) over the
    extracted feature matrix, one fixed model (_LTR_GATE_FEATURES /
    _LTR_GATE_WEIGHTS) so the DuckDB twin can replay the fold exactly.
    Scoring runs distributed in Arrow batches (mapInPandas); features
    enter the fold RAW (float32), only the output score is rounded."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from ivory_spark.ltr import LearnedModel, LtrFeature

    model = LearnedModel(
        [LtrFeature(kind, a, b) for kind, a, b in _LTR_GATE_FEATURES],
        list(_LTR_GATE_WEIGHTS),
    )
    cols = list(_LTR_FEATURE_COLS)

    def score_batches(it):
        for pdf in it:
            out = pdf[["qid", "docno"]].copy()
            out["grade"] = pdf["grade"].astype("float64")
            out["score"] = model.score(pdf[cols].to_numpy(dtype=np.float32))
            yield out

    df = _ltr_feature_frame(spark, sf_dir)
    scored = df.mapInPandas(
        score_batches, schema="qid string, docno long, grade double, score float"
    )
    return _round4(scored)


def _sql_ltr_features(model_score: bool = False) -> str:
    """DuckDB float32 oracle for _ltr_features. Clique construction is
    DYNAMIC: extract_features drops OOV query tokens BEFORE building
    cliques (ExtractFeatures.java:83-97 rebuilds the query from terms
    with postings — adjacency is over the KEPT sequence), so the SQL
    derives the kept token sequence by joining the raw token VALUES
    against the corpus dictionary, re-indexes it, and forms term cliques
    (cidx 0..k-1), od bigrams (k..2k-2) and uw bigrams (2k-1..3k-3) in
    build_cliques' emission order. Window tf semantics and the
    duplicate-token closed forms are the ones proven in
    _sql_engine_sd_top10; per-spec values are UNWEIGHTED float32 folds
    ordered by cidx (zero-contribution cliques drop out: +0.0f is exact
    identity)."""
    from ivory_spark.functions.tokenizer import tokenize_py

    rows = []
    for q in IR.GATE_QUERIES:
        for i, t in enumerate(tokenize_py(q["query"])):
            rows.append(f"('{q['qid']}', {i}, '{t}')")
    qtok = "qtok(qid, idx, term) AS (VALUES " + ", ".join(rows) + ")"
    prox_df = "(egl.n // 100)"
    feat_cases = ", ".join(
        f"""coalesce(max(CASE WHEN fid = {fid} THEN v END), 0.0::FLOAT) AS "{nm}" """
        for fid, nm in enumerate(_LTR_FEATURE_COLS)
    )
    if model_score:
        f1, f2, f3 = (f'"{nm}"' for nm in _LTR_FEATURE_COLS)
        # LtrFeature evals of _LTR_GATE_MODEL (ltr.py LtrFeature.eval):
        # simple(0), log(1), product(0,2), quotient(2,0) — float32 each
        evals = [
            f1,
            f"(CASE WHEN {f2} > 0 THEN ln({f2}::DOUBLE)::FLOAT ELSE 0.0::FLOAT END)",
            f"({f1} * {f3})::FLOAT",
            f"(CASE WHEN {f1} != 0 THEN ({f3} / {f1})::FLOAT ELSE 0.0::FLOAT END)",
        ]
        # ScoreTable.translate fold (ltr.py:_translate): float32 of
        # (float64 score + w * float64 feature), sequentially per feature
        fold = "0.0::DOUBLE"
        for w, e in zip(_LTR_GATE_WEIGHTS, evals):
            fold = f"(({fold} + {w!r}::DOUBLE * ({e})::DOUBLE)::FLOAT)::DOUBLE"
        final_select = (
            "SELECT qid, docno, grade, "
            f"round(({fold})::FLOAT::DOUBLE, 4) AS score FROM pv"
        )
    else:
        final_select = (
            "SELECT qid, docno, grade, "
            + ", ".join(
                f'round("{nm}"::DOUBLE, 4) AS "{nm}"' for nm in _LTR_FEATURE_COLS
            )
            + " FROM pv"
        )
    return f"""
WITH {_ENGINE_CTES}, {qtok},
judged AS (SELECT docno, (docno % 4)::DOUBLE AS grade FROM edocmap WHERE docno % 5 = 1),
ktok AS (SELECT q.qid, q.term,
         row_number() OVER (PARTITION BY q.qid ORDER BY q.idx)::BIGINT AS kidx
         FROM qtok q JOIN edict USING (term)),
kcnt AS (SELECT qid, count(*)::BIGINT AS k FROM ktok GROUP BY qid),
clt AS (SELECT qid, kidx - 1 AS cidx, 0 AS fid, term FROM ktok),
clp AS (SELECT a.qid, a.kidx, a.term AS t1, b.term AS t2
        FROM ktok a JOIN ktok b ON b.qid = a.qid AND b.kidx = a.kidx + 1),
clod AS (SELECT p.qid, c.k + p.kidx - 1 AS cidx, 1 AS fid,
         CASE WHEN t1 = t2 THEN 'od_same' ELSE 'od' END AS kind, t1, t2, 1 AS win
         FROM clp p JOIN kcnt c USING (qid)),
cluw AS (SELECT p.qid, c.k + (c.k - 1) + p.kidx - 1 AS cidx, 2 AS fid,
         CASE WHEN t1 = t2 THEN 'uw_same' ELSE 'uw' END AS kind, t1, t2, 8 AS win
         FROM clp p JOIN kcnt c USING (qid)),
cl AS (SELECT * FROM clod UNION ALL SELECT * FROM cluw),
epos AS (SELECT p.docno, p.term, p.pos FROM (
   SELECT docno, unnest(l) AS term, generate_subscripts(l, 1)::BIGINT AS pos
   FROM (SELECT docno, list_filter(regexp_extract_all(lower(content),
        '[a-z_][a-z0-9_]*|[0-9]+'), t -> length(t) <= 126) AS l FROM edocmap)
 ) p JOIN etf ON etf.docno = p.docno AND etf.term = p.term),
tcon AS (
  SELECT clt.qid, etf.docno, clt.cidx, clt.fid,
         {_f32_bm25_clique("etf.tf", "edict.df")} AS c
  FROM clt JOIN edict ON edict.term = clt.term
  JOIN etf ON etf.term = clt.term
  JOIN judged ON judged.docno = etf.docno
  JOIN edl ON edl.docno = etf.docno CROSS JOIN egl),
odx AS (SELECT cl.qid, cl.cidx, cl.win, a.docno, a.pos AS pa, min(b.pos) AS mb
        FROM cl JOIN epos a ON a.term = cl.t1
        JOIN epos b ON b.docno = a.docno AND b.term = cl.t2 AND b.pos > a.pos
        WHERE cl.kind = 'od'
        GROUP BY cl.qid, cl.cidx, cl.win, a.docno, a.pos),
odc AS (SELECT qid, cidx, docno, least(count(*), 32767)::BIGINT AS tf
        FROM odx WHERE mb - pa <= win GROUP BY qid, cidx, docno),
odsc AS (SELECT cl.qid, cl.cidx, e.docno, least(count(*), 32767)::BIGINT AS tf
         FROM cl JOIN epos e ON e.term = cl.t1 WHERE cl.kind = 'od_same'
         GROUP BY cl.qid, cl.cidx, e.docno),
uwx AS (
  SELECT DISTINCT cl.qid, cl.cidx, a.docno, a.pos
  FROM cl JOIN epos a ON a.term = cl.t1
  JOIN epos b ON b.docno = a.docno AND b.term = cl.t2
       AND b.pos > a.pos AND b.pos - a.pos <= cl.win - 1
  WHERE cl.kind = 'uw'
  UNION ALL
  SELECT DISTINCT cl.qid, cl.cidx, b.docno, b.pos
  FROM cl JOIN epos b ON b.term = cl.t2
  JOIN epos a ON a.docno = b.docno AND a.term = cl.t1
       AND a.pos > b.pos AND a.pos - b.pos <= cl.win - 1
  WHERE cl.kind = 'uw'),
uwc AS (SELECT qid, cidx, docno, least(count(*), 32767)::BIGINT AS tf
        FROM uwx GROUP BY qid, cidx, docno),
uwsc AS (SELECT qid, cidx, docno, least(sum(tf), 32767)::BIGINT AS tf FROM (
    SELECT cl.qid, cl.cidx, e.docno, count(*) AS tf
    FROM cl JOIN epos e ON e.term = cl.t1 WHERE cl.kind = 'uw_same'
    GROUP BY cl.qid, cl.cidx, e.docno
    UNION ALL
    SELECT cl.qid, cl.cidx, a.docno, count(DISTINCT a.pos) AS tf
    FROM cl JOIN epos a ON a.term = cl.t1
    JOIN epos b ON b.docno = a.docno AND b.term = cl.t1
         AND b.pos > a.pos AND b.pos - a.pos <= cl.win - 1
    WHERE cl.kind = 'uw_same'
    GROUP BY cl.qid, cl.cidx, a.docno
  ) GROUP BY qid, cidx, docno),
prox AS (SELECT * FROM odc UNION ALL SELECT * FROM odsc
         UNION ALL SELECT * FROM uwc UNION ALL SELECT * FROM uwsc),
pcon AS (
  SELECT p.qid, p.docno, p.cidx, cl.fid,
         {_f32_bm25_clique("p.tf", prox_df)} AS c
  FROM prox p JOIN cl ON cl.qid = p.qid AND cl.cidx = p.cidx
  JOIN judged ON judged.docno = p.docno
  JOIN edl ON edl.docno = p.docno CROSS JOIN egl),
allc AS (SELECT * FROM tcon UNION ALL SELECT * FROM pcon),
fold AS (SELECT qid, docno, fid,
         list_reduce(list(c ORDER BY cidx), (a, b) -> (a + b)::FLOAT) AS v
         FROM allc GROUP BY qid, docno, fid),
grid AS (SELECT q.qid, j.docno, j.grade
         FROM (SELECT DISTINCT qid FROM ktok) q CROSS JOIN judged j),
pv AS (SELECT g.qid, g.docno, g.grade, {feat_cases}
       FROM grid g LEFT JOIN fold f ON f.qid = g.qid AND f.docno = g.docno
       GROUP BY g.qid, g.docno, g.grade)
{final_select}
"""


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded (media_id, kind, n_bytes, dim, feature) — scalar rows so
    the gate's sorted compare works; the features are sha256-derived and
    therefore reproducible by the DuckDB oracle bit-for-bit."""
    from ivory_spark.ops.multimodal import decode_features, explode_features, synthesize_media

    return explode_features(decode_features(synthesize_media(spark, _docs(spark, sf_dir))))


def _sql_multimodal_features() -> str:
    """DuckDB twin of synthesize_media + decode_features + explode_features:
    payload = utf-8 bytes of text, feature[j] = float32(u32_le(sha256(payload),
    4j) / 2^32) rounded to 6 dp after exact promotion to double."""
    dim_rows = []
    for j in range(8):  # FEATURE_DIM
        p = 8 * j  # 0-based hex offset of the 4 little-endian bytes
        le = (
            f"substr(h, {p + 7}, 2) || substr(h, {p + 5}, 2) || "
            f"substr(h, {p + 3}, 2) || substr(h, {p + 1}, 2)"
        )
        dim_rows.append(
            f"SELECT media_id, kind, n_bytes, {j} AS dim, "
            f"round(((('0x' || {le})::BIGINT)::DOUBLE / 4294967296.0)::FLOAT::DOUBLE, 6) "
            f"AS feature FROM m"
        )
    return (
        "WITH m AS (SELECT doc_id AS media_id, "
        "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' "
        "ELSE 'video' END AS kind, strlen(text)::BIGINT AS n_bytes, "
        "sha256(text) AS h FROM documents) " + " UNION ALL ".join(dim_rows)
    )


def _engine_prf_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback expansion + weighted retrieval (MRFExpander
    analogue; rows-only — bit-exact goldens in tests/test_expansion.py)."""
    from ivory_spark.query.exact import bm25_topk
    from ivory_spark.query.expander import expand_queries

    index = _engine_index(spark, sf_dir)
    wq = expand_queries(spark, index, IR.GATE_QUERIES, fb_docs=5, fb_terms=8)
    return _round4(bm25_topk(spark, index, wq, k=10, weighted=True))


def _engine_lce_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latent-concept-expansion variant (UnigramLatentConceptExpander
    analogue): feedback docs weighted by exp(doc score) in concept
    mining, then the same weighted retrieval."""
    from ivory_spark.query.exact import bm25_topk
    from ivory_spark.query.expander import expand_queries

    index = _engine_index(spark, sf_dir)
    wq = expand_queries(
        spark, index, IR.GATE_QUERIES, fb_docs=5, fb_terms=8, method="lce"
    )
    return _round4(bm25_topk(spark, index, wq, k=10, weighted=True))


# ---------------------------------------------------------------------------
# engine-path oracles: float32-emulating DuckDB SQL
#
# DuckDB FLOAT arithmetic is IEEE float32 (verified: FLOAT op FLOAT computes
# in single precision, matching numpy float32 bit-for-bit), and
# list_reduce(list(x ORDER BY termid), (a,b) -> (a+b)::FLOAT) reproduces the
# engine's canonical termid-ordered float32 fold (functions/scoring.py
# group_sum_f32). These oracles rebuild the engine's docmap/dictionary/
# postings semantics in SQL and score with the same float32 operation
# order, so round(score::DOUBLE, 4) matches exactly.
# ---------------------------------------------------------------------------

# engine corpus + index CTEs (mirror sources/testdata.documents_as_corpus,
# index/build.build_docmap + tdf + dictionary; tokenizer = code_v1 regex)
def _engine_ctes(tokenizer: str = "code_v1") -> str:
    """The engine build emulated in SQL, parameterized by the (SQL-
    expressible) analysis chain: code_v1 or nl_nostem (stoplist, no
    stem). Stemmed chains have no SQL twin and stay pytest-verified."""
    if tokenizer == "code_v1":
        tok = (
            "list_filter(regexp_extract_all(lower(content), "
            "'[a-z_][a-z0-9_]*|[0-9]+'), t -> length(t) <= 126)"
        )
    elif tokenizer == "nl_nostem":
        from ivory_spark.functions.stopwords import STOPWORDS_EN

        stop = ", ".join(f"'{w}'" for w in sorted(STOPWORDS_EN))
        tok = (
            "list_filter(regexp_extract_all(lower(content), '[a-z0-9]+'), "
            f"t -> length(t) <= 126 AND NOT list_contains([{stop}], t))"
        )
    else:
        raise ValueError(f"no SQL twin for tokenizer {tokenizer!r}")
    return f"""
ecorpus AS (SELECT source AS repo, 'doc/' || doc_id::VARCHAR AS path,
            substr(sha256(text), 1, 40) AS commit, text AS content FROM documents),
eded AS (SELECT repo, path, commit, content FROM (
           SELECT *, row_number() OVER (PARTITION BY sha256(content)
                     ORDER BY repo, path, commit) AS rn FROM ecorpus) WHERE rn = 1),
edocmap AS (SELECT repo, path, commit, content,
            row_number() OVER (ORDER BY repo, path, commit)::BIGINT AS docno FROM eded),
etoks AS (SELECT docno, unnest({tok}) AS term FROM edocmap),
etf AS (SELECT docno, term, count(*)::BIGINT AS tf FROM etoks
        GROUP BY docno, term HAVING count(*) <= 32767),
edl AS (SELECT docno, sum(tf)::BIGINT AS dl FROM etf GROUP BY docno),
edict AS (SELECT term, count(*)::INT AS df, sum(tf)::BIGINT AS cf,
          row_number() OVER (ORDER BY count(*) DESC, term)::BIGINT AS termid
          FROM etf GROUP BY term),
egl AS (SELECT (SELECT count(*) FROM edocmap)::BIGINT AS n,
               (SELECT coalesce(sum(dl), 0) FROM edl)::BIGINT AS clen)
"""


_ENGINE_CTES = _engine_ctes()

_ENGINE_DOCID = "d.repo || '/' || d.path || '@' || d.commit"


def _sql_engine_query_values(queries, tokenizer: str = "code_v1") -> str:
    """(qid, term, qtf) rows tokenized with the ENGINE tokenizer
    (same registry chain as the index) — duplicate tokens fold to qtf."""
    from collections import Counter

    from ivory_spark.functions.tokenizer import get_tokenizer

    tokenize = get_tokenizer(tokenizer).tokenize_py
    rows = []
    for q in queries:
        for term, qtf in sorted(Counter(tokenize(q["query"])).items()):
            rows.append(f"('{q['qid']}', '{term}', {qtf})")
    return "eq(qid, term, qtf) AS (VALUES " + ", ".join(rows) + ")"


# float32 BM25 contribution, matching functions/scoring.py exactly:
# qtf_f32 * (idf_f32 * tf_part_f32) with idf = float32(ln_double(...)) and
# tf_part computed entirely in float32 (same operation order/grouping)
_F32_AVGDL = "((egl.clen::DOUBLE / egl.n::DOUBLE))::FLOAT"
_F32_BM25_CONTRIB = f"""
  ((eq.qtf::FLOAT) * (
     (ln((egl.n::DOUBLE - edict.df::DOUBLE + 0.5) / (edict.df::DOUBLE + 0.5))::FLOAT)
     * (((1.2::FLOAT + 1.0::FLOAT) * etf.tf::FLOAT)
        / ((1.2::FLOAT * ((1.0::FLOAT - 0.75::FLOAT)
             + (0.75::FLOAT * (edl.dl::FLOAT / {_F32_AVGDL}))))
           + etf.tf::FLOAT))))
"""


def _sql_engine_bm25_top10(k: int = 10, tokenizer: str = "code_v1") -> str:
    return f"""
WITH {_engine_ctes(tokenizer)}, {_sql_engine_query_values(IR.GATE_QUERIES, tokenizer)},
contrib AS (
  SELECT eq.qid, etf.docno, edict.termid, {_F32_BM25_CONTRIB} AS c
  FROM eq JOIN edict USING (term) JOIN etf USING (term)
  JOIN edl ON edl.docno = etf.docno CROSS JOIN egl),
scored AS (
  SELECT qid, docno,
         list_reduce(list(c ORDER BY termid), (a, b) -> (a + b)::FLOAT) AS score
  FROM contrib GROUP BY qid, docno),
top AS (SELECT qid, docno, score,
        row_number() OVER (PARTITION BY qid ORDER BY score DESC, docno DESC)::INT AS rank
        FROM scored)
SELECT t.qid, t.rank, t.docno, {_ENGINE_DOCID} AS docid,
       round(t.score::DOUBLE, 4) AS score
FROM top t JOIN edocmap d USING (docno) WHERE t.rank <= {k}
"""


def _engine_scored(spark: SparkSession, sf_dir: str, scorer: str) -> DataFrame:
    """Engine-native non-BM25 retrieval (scored_topk) over the cached index."""
    from ivory_spark.query.exact import scored_topk

    index = _engine_index(spark, sf_dir)
    return _round4(scored_topk(spark, index, IR.GATE_QUERIES, scorer=scorer, k=10))


# float32 contribution expressions for the non-BM25 engine scorers,
# matching functions/scoring.py operation-for-operation (double inner
# arithmetic in the numpy kernels' order, one cast to FLOAT, qtf as a
# float32 multiplier). Column sources: m = candidate matrix rows.
_F32_SCORER_CONTRIB = {
    # dirichlet_score: float32(ln((tf + mu*(cf/clen)) / (dl + mu))), mu=2500
    "dirichlet": (
        "((qtf::FLOAT) * (ln((tf::DOUBLE + (2500.0::DOUBLE * (cf::DOUBLE / egl.clen::DOUBLE)))"
        " / (dl::DOUBLE + 2500.0::DOUBLE))::FLOAT))"
    ),
    # jelinek_mercer_score: float32(ln((1-λ)*(tf/max(dl,1)) + λ*(cf/clen))), λ=0.5
    "jm": (
        "((qtf::FLOAT) * (ln(((1.0::DOUBLE - 0.5::DOUBLE) * (tf::DOUBLE / greatest(dl, 1)::DOUBLE))"
        " + (0.5::DOUBLE * (cf::DOUBLE / egl.clen::DOUBLE)))::FLOAT))"
    ),
    # tfidf_score: float32(tf * ln(N/df))
    "tfidf": "((qtf::FLOAT) * ((tf::DOUBLE * ln(egl.n::DOUBLE / df::DOUBLE))::FLOAT))",
    # f2exp_score: float32(((N+1)/df) * tf / ((tf + s) + s*(dl/avgdl))), s=0.5, k=1
    "f2exp": (
        "((qtf::FLOAT) * (((((egl.n::DOUBLE + 1.0::DOUBLE) / df::DOUBLE) * tf::DOUBLE)"
        " / ((tf::DOUBLE + 0.5::DOUBLE)"
        " + (0.5::DOUBLE * (dl::DOUBLE / (egl.clen::DOUBLE / egl.n::DOUBLE)))))::FLOAT))"
    ),
}


def _sql_engine_scored_top10(scorer: str, k: int = 10) -> str:
    """DuckDB float32 oracle for scored_topk: LM scorers use the full
    candidate x query-term matrix (tf=0 background rows); tf-proportional
    scorers use matching rows only."""
    lm = scorer in ("dirichlet", "jm")
    if lm:
        matrix = """
qd AS (SELECT eq.qid, eq.term, eq.qtf, edict.termid, edict.df, edict.cf
       FROM eq JOIN edict USING (term)),
ecand AS (SELECT DISTINCT qd.qid, etf.docno FROM qd JOIN etf USING (term)),
m AS (SELECT c.qid, c.docno, qd.termid, qd.qtf, qd.df, qd.cf,
             coalesce(etf.tf, 0) AS tf, edl.dl
      FROM ecand c JOIN qd ON qd.qid = c.qid
      LEFT JOIN etf ON etf.docno = c.docno AND etf.term = qd.term
      JOIN edl ON edl.docno = c.docno)"""
    else:
        matrix = """
m AS (SELECT eq.qid, etf.docno, edict.termid, eq.qtf, edict.df, edict.cf,
             etf.tf, edl.dl
      FROM eq JOIN edict USING (term) JOIN etf USING (term)
      JOIN edl ON edl.docno = etf.docno)"""
    return f"""
WITH {_ENGINE_CTES}, {_sql_engine_query_values(IR.GATE_QUERIES)}, {matrix},
contrib AS (SELECT qid, docno, termid, {_F32_SCORER_CONTRIB[scorer]} AS c
            FROM m CROSS JOIN egl),
scored AS (
  SELECT qid, docno,
         list_reduce(list(c ORDER BY termid), (a, b) -> (a + b)::FLOAT) AS score
  FROM contrib GROUP BY qid, docno),
top AS (SELECT qid, docno, score,
        row_number() OVER (PARTITION BY qid ORDER BY score DESC, docno DESC)::INT AS rank
        FROM scored)
SELECT t.qid, t.rank, t.docno, {_ENGINE_DOCID} AS docid,
       round(t.score::DOUBLE, 4) AS score
FROM top t JOIN edocmap d USING (docno) WHERE t.rank <= {k}
"""


# float32 BM25 clique score with explicit df/dl/tf sources (for the SD
# oracle, where proximity cliques use the df = N//100 heuristic)
def _f32_bm25_clique(tf: str, df: str) -> str:
    return f"""((ln((egl.n::DOUBLE - {df}::DOUBLE + 0.5) / ({df}::DOUBLE + 0.5))::FLOAT)
      * (((1.2::FLOAT + 1.0::FLOAT) * {tf}::FLOAT)
         / ((1.2::FLOAT * ((1.0::FLOAT - 0.75::FLOAT)
              + (0.75::FLOAT * (edl.dl::FLOAT / {_F32_AVGDL}))))
            + {tf}::FLOAT)))"""


def _sql_engine_sd_top10(
    k: int = 10, stage1_k: int | None = None, model=None,
    pruner: str | None = None, pruner_param: float = 0.0, prune_K: int = 10,
) -> str:
    """DuckDB float32 oracle for the SD MRF engine path (query/mrf.py).
    stage1_k: when set, restrict SD scoring to the float32-BM25
    top-stage1_k docs per query — the cascade-ranking gate twin
    (query/cascade.cascade_topk: WAND stage 1, SD rerank of survivors).
    pruner: when set ("mean-max"), apply the CascadeEval pruning function
    (query/cascade.prune_retain_size, CascadeEval.java:148-227) to the
    ranked SD list before the final top-k cut: float32 threshold =
    param*max + (1-param)*mean with the mean a rank-ordered float32 fold,
    a K floor of prune_K, and the leading >=-threshold run retained.

    Clique list (term cliques per token occurrence, #od1 / #uw8 adjacent
    pairs) is generated by the same build_cliques the engine uses and
    inlined as VALUES; the 2-term window-scan semantics of
    count_ordered_matches / count_unordered_matches reduce to:
      od(t1,t2,g):   |{a in P1 : min(P2 > a) - a <= g}|
      uw(t1,t2,w):   |{a in P1 : exists b in P2, 0 < b-a <= w-1}|
                   + |{b in P2 : exists a in P1, 0 < a-b <= w-1}|
      od(t,t,g):     |P|           (duplicate-token pair, e.g. "data data")
      uw(t,t,w):     |P| + |{p in P : exists q in P, 0 < q-p <= w-1}|
    Zero-contribution cliques (tf=0 / OOV) are dropped: adding +0.0f to a
    float32 accumulator is exact identity, so the ordered fold over the
    remaining cliques is bit-identical to the engine's."""
    import numpy as _np

    from ivory_spark.functions.tokenizer import tokenize_py
    from ivory_spark.query.mrf import MrfModel, build_cliques

    if model is None:
        model = MrfModel(dependence="sd")
    # build_cliques bakes any importance model into each clique's weight
    # (WSD combinedWeight), so the VALUES below carry query-dependent
    # weights automatically — the same clique generator both sides use
    rows = []
    for q in IR.GATE_QUERIES:
        for ci, c in enumerate(build_cliques(tokenize_py(q["query"]), model)):
            wf = repr(float(_np.float32(c["weight"])))  # exact float32 literal
            if c["kind"] == "term":
                rows.append(f"('{q['qid']}', {ci}, 'term', '{c['terms'][0]}', "
                            f"'{c['terms'][0]}', {wf}::FLOAT, 0)")
            else:
                t1, t2 = c["terms"]
                kind = c["kind"] + ("_same" if t1 == t2 else "")
                rows.append(f"('{q['qid']}', {ci}, '{kind}', '{t1}', '{t2}', "
                            f"{wf}::FLOAT, {c['window']})")
    cl_values = "cl(qid, cidx, kind, t1, t2, w, win) AS (VALUES " + ", ".join(rows) + ")"
    prox_df = "(egl.n // 100)"
    stage1 = ""
    stage1_join = ""
    if stage1_k is not None:
        stage1 = f""",
{_sql_engine_query_values(IR.GATE_QUERIES)},
contrib1 AS (
  SELECT eq.qid, etf.docno, edict.termid, {_F32_BM25_CONTRIB} AS c
  FROM eq JOIN edict USING (term) JOIN etf USING (term)
  JOIN edl ON edl.docno = etf.docno CROSS JOIN egl),
s1 AS (SELECT qid, docno,
       list_reduce(list(c ORDER BY termid), (a, b) -> (a + b)::FLOAT) AS score
       FROM contrib1 GROUP BY qid, docno),
cand1 AS (SELECT qid, docno FROM (
        SELECT qid, docno,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, docno DESC) AS rnk
        FROM s1) WHERE rnk <= {stage1_k})"""
        stage1_join = "JOIN cand1 USING (qid, docno)"
    prune_ctes, prune_join, prune_pred = "", "", ""
    if pruner is not None:
        if pruner != "mean-max":
            raise ValueError("the SQL twin implements the mean-max pruner")
        p32 = repr(float(_np.float32(pruner_param)))
        one_minus = repr(float(_np.float32(1.0) - _np.float32(pruner_param)))
        prune_ctes = f""",
pstat AS (
  SELECT qid, count(*)::INT AS n, max(score)::FLOAT AS mx,
         (list_reduce(list(score ORDER BY rank), (a, b) -> (a + b)::FLOAT)
          / count(*)::FLOAT)::FLOAT AS mean
  FROM top GROUP BY qid),
pthr AS (SELECT qid, n,
         (({p32}::FLOAT * mx)::FLOAT + ({one_minus}::FLOAT * mean)::FLOAT)::FLOAT AS thr
         FROM pstat),
praw AS (SELECT t.qid, p.n,
         COALESCE(min(t.rank) FILTER (WHERE t.score < p.thr) - 1, p.n) AS r
         FROM top t JOIN pthr p USING (qid) GROUP BY t.qid, p.n, p.thr),
pret AS (SELECT qid,
         least(CASE WHEN r < {prune_K} THEN least({prune_K}, n) ELSE r END, n) AS retain
         FROM praw)"""
        prune_join = "JOIN pret ON pret.qid = t.qid "
        prune_pred = " AND t.rank <= pret.retain"
    return f"""
WITH {_ENGINE_CTES}, {cl_values}{stage1},
epos AS (SELECT p.docno, p.term, p.pos FROM (
   SELECT docno, unnest(l) AS term, generate_subscripts(l, 1)::BIGINT AS pos
   FROM (SELECT docno, list_filter(regexp_extract_all(lower(content),
        '[a-z_][a-z0-9_]*|[0-9]+'), t -> length(t) <= 126) AS l FROM edocmap)
 ) p JOIN etf ON etf.docno = p.docno AND etf.term = p.term),
tcon AS (
  SELECT cl.qid, etf.docno, cl.cidx,
         ((cl.w) * {_f32_bm25_clique("etf.tf", "edict.df")}) AS c
  FROM cl JOIN edict ON edict.term = cl.t1
  JOIN etf ON etf.term = cl.t1
  JOIN edl ON edl.docno = etf.docno CROSS JOIN egl
  WHERE cl.kind = 'term'),
odx AS (SELECT cl.qid, cl.cidx, cl.win, a.docno, a.pos AS pa, min(b.pos) AS mb
        FROM cl JOIN epos a ON a.term = cl.t1
        JOIN epos b ON b.docno = a.docno AND b.term = cl.t2 AND b.pos > a.pos
        WHERE cl.kind = 'od'
        GROUP BY cl.qid, cl.cidx, cl.win, a.docno, a.pos),
odc AS (SELECT qid, cidx, docno, least(count(*), 32767)::BIGINT AS tf
        FROM odx WHERE mb - pa <= win GROUP BY qid, cidx, docno),
odsc AS (SELECT cl.qid, cl.cidx, e.docno, least(count(*), 32767)::BIGINT AS tf
         FROM cl JOIN epos e ON e.term = cl.t1 WHERE cl.kind = 'od_same'
         GROUP BY cl.qid, cl.cidx, e.docno),
uwx AS (
  SELECT DISTINCT cl.qid, cl.cidx, a.docno, a.pos
  FROM cl JOIN epos a ON a.term = cl.t1
  JOIN epos b ON b.docno = a.docno AND b.term = cl.t2
       AND b.pos > a.pos AND b.pos - a.pos <= cl.win - 1
  WHERE cl.kind = 'uw'
  UNION ALL
  SELECT DISTINCT cl.qid, cl.cidx, b.docno, b.pos
  FROM cl JOIN epos b ON b.term = cl.t2
  JOIN epos a ON a.docno = b.docno AND a.term = cl.t1
       AND a.pos > b.pos AND a.pos - b.pos <= cl.win - 1
  WHERE cl.kind = 'uw'),
uwc AS (SELECT qid, cidx, docno, least(count(*), 32767)::BIGINT AS tf
        FROM uwx GROUP BY qid, cidx, docno),
uwsc AS (SELECT qid, cidx, docno, least(sum(tf), 32767)::BIGINT AS tf FROM (
    SELECT cl.qid, cl.cidx, e.docno, count(*) AS tf
    FROM cl JOIN epos e ON e.term = cl.t1 WHERE cl.kind = 'uw_same'
    GROUP BY cl.qid, cl.cidx, e.docno
    UNION ALL
    SELECT cl.qid, cl.cidx, a.docno, count(DISTINCT a.pos) AS tf
    FROM cl JOIN epos a ON a.term = cl.t1
    JOIN epos b ON b.docno = a.docno AND b.term = cl.t1
         AND b.pos > a.pos AND b.pos - a.pos <= cl.win - 1
    WHERE cl.kind = 'uw_same'
    GROUP BY cl.qid, cl.cidx, a.docno
  ) GROUP BY qid, cidx, docno),
prox AS (SELECT * FROM odc UNION ALL SELECT * FROM odsc
         UNION ALL SELECT * FROM uwc UNION ALL SELECT * FROM uwsc),
pcon AS (
  SELECT p.qid, p.docno, p.cidx,
         ((cl.w) * {_f32_bm25_clique("p.tf", prox_df)}) AS c
  FROM prox p JOIN cl ON cl.qid = p.qid AND cl.cidx = p.cidx
  JOIN edl ON edl.docno = p.docno CROSS JOIN egl),
allc AS (SELECT * FROM tcon UNION ALL SELECT * FROM pcon),
scored AS (
  SELECT qid, docno,
         list_reduce(list(c ORDER BY cidx), (a, b) -> (a + b)::FLOAT) AS score
  FROM allc {stage1_join} GROUP BY qid, docno),
top AS (SELECT qid, docno, score,
        row_number() OVER (PARTITION BY qid ORDER BY score DESC, docno DESC)::INT AS rank
        FROM scored){prune_ctes}
SELECT t.qid, t.rank, t.docno, {_ENGINE_DOCID} AS docid,
       round(t.score::DOUBLE, 4) AS score
FROM top t JOIN edocmap d USING (docno) {prune_join}WHERE t.rank <= {k}{prune_pred}
"""


def _sql_engine_prf_top10(
    fb_docs: int = 5, fb_terms: int = 8, alpha: float = 0.5, k: int = 10,
    method: str = "rm",
) -> str:
    """DuckDB twin of expand_queries + bm25_topk(weighted=True):
    stage 1 = float32 BM25 top-fb_docs (same emulation as the bm25
    oracle); RM mining reproduces expander.rm_weights' docno-ordered
    double folds via list_reduce; mixing matches _mix's operation order;
    the weighted rerun casts each mixed weight to float32 exactly as the
    weighted query table stores it. method="lce" weights each feedback
    doc's contribution by exp(stage-1 score) — the lce_weights twin."""
    from collections import Counter

    from ivory_spark.functions.tokenizer import tokenize_py

    qtot_rows = []
    for q in IR.GATE_QUERIES:
        qtot_rows.append(f"('{q['qid']}', {sum(Counter(tokenize_py(q['query'])).values())})")
    one_minus_alpha = repr(1.0 - alpha)
    return f"""
WITH {_ENGINE_CTES}, {_sql_engine_query_values(IR.GATE_QUERIES)},
qtot(qid, qtotal) AS (VALUES {", ".join(qtot_rows)}),
contrib1 AS (
  SELECT eq.qid, etf.docno, edict.termid, {_F32_BM25_CONTRIB} AS c
  FROM eq JOIN edict USING (term) JOIN etf USING (term)
  JOIN edl ON edl.docno = etf.docno CROSS JOIN egl),
s1 AS (SELECT qid, docno,
       list_reduce(list(c ORDER BY termid), (a, b) -> (a + b)::FLOAT) AS score
       FROM contrib1 GROUP BY qid, docno),
fb AS (SELECT qid, docno, score FROM (
        SELECT qid, docno, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, docno DESC) AS rnk
        FROM s1) WHERE rnk <= {fb_docs}),
recs AS (SELECT fb.qid, etf.term, etf.docno, etf.tf, edl.dl, fb.score
         FROM fb JOIN etf USING (docno) JOIN edl ON edl.docno = fb.docno
         JOIN edict ON edict.term = etf.term),
smax AS (SELECT qid, max(score) AS smax FROM fb GROUP BY qid),
rmw AS (SELECT qid, term,
        list_reduce(list({'exp(score::DOUBLE - smax::DOUBLE) * (tf::DOUBLE / dl::DOUBLE)' if method == 'lce' else 'tf::DOUBLE / dl::DOUBLE'} ORDER BY docno), (a, b) -> a + b) AS w
        FROM recs JOIN smax USING (qid) WHERE dl > 0 GROUP BY qid, term),
kept AS (SELECT qid, term, w FROM (
          SELECT qid, term, w,
                 row_number() OVER (PARTITION BY qid ORDER BY w DESC, term) AS rnk
          FROM rmw) WHERE rnk <= {fb_terms}),
tot AS (SELECT qid,
        list_reduce(list(w ORDER BY w DESC, term), (a, b) -> a + b) AS total
        FROM kept GROUP BY qid),
expw AS (SELECT kept.qid, kept.term, {alpha!r} * (kept.w / tot.total) AS wexp
         FROM kept JOIN tot ON tot.qid = kept.qid),
orig AS (SELECT eq.qid, eq.term,
         {one_minus_alpha} * (eq.qtf::DOUBLE / qtot.qtotal::DOUBLE) AS worig
         FROM eq JOIN qtot ON qtot.qid = eq.qid),
mixed AS (SELECT coalesce(o.qid, e.qid) AS qid, coalesce(o.term, e.term) AS term,
          coalesce(o.worig, 0.0) + coalesce(e.wexp, 0.0) AS wt
          FROM orig o FULL JOIN expw e ON o.qid = e.qid AND o.term = e.term),
contrib2 AS (
  SELECT m.qid, etf.docno, edict.termid,
    ((m.wt::FLOAT) * (
       (ln((egl.n::DOUBLE - edict.df::DOUBLE + 0.5) / (edict.df::DOUBLE + 0.5))::FLOAT)
       * (((1.2::FLOAT + 1.0::FLOAT) * etf.tf::FLOAT)
          / ((1.2::FLOAT * ((1.0::FLOAT - 0.75::FLOAT)
               + (0.75::FLOAT * (edl.dl::FLOAT / {_F32_AVGDL}))))
             + etf.tf::FLOAT)))) AS c
  FROM mixed m JOIN edict ON edict.term = m.term
  JOIN etf ON etf.term = m.term
  JOIN edl ON edl.docno = etf.docno CROSS JOIN egl),
s2 AS (SELECT qid, docno,
       list_reduce(list(c ORDER BY termid), (a, b) -> (a + b)::FLOAT) AS score
       FROM contrib2 GROUP BY qid, docno),
top AS (SELECT qid, docno, score,
        row_number() OVER (PARTITION BY qid ORDER BY score DESC, docno DESC)::INT AS rank
        FROM s2)
SELECT t.qid, t.rank, t.docno, {_ENGINE_DOCID} AS docid,
       round(t.score::DOUBLE, 4) AS score
FROM top t JOIN edocmap d USING (docno) WHERE t.rank <= {k}
"""


def _ann_queries(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    return emb, SIM.query_vectors(spark, emb, n=10)


def _sql_ann_lsh_top5(n_planes: int = 8, dim: int = 64, multiprobe: int = 1, k: int = 5) -> str:
    """DuckDB twin of similarity.lsh_bucketed_topk: the Rademacher planes
    are md5-derived (portable), and each SRP dot product is the same
    ordered left fold Spark's F.aggregate computes, so bucket bits match
    bit-for-bit at the sign boundary."""
    from itertools import combinations

    from ivory_spark.ops.similarity import rademacher_planes

    planes = rademacher_planes(dim, n_planes)

    def dot(vcol: str, b: int) -> str:
        lits = "[" + ", ".join("1.0" if x > 0 else "-1.0" for x in planes[b]) + "]"
        return (
            f"list_reduce(list_transform(list_zip({vcol}, {lits}), "
            f"x -> x[1] * x[2]), (a, b) -> a + b)"
        )

    bucket = " + ".join(
        f"(CASE WHEN {dot('v', b)} > 0 THEN {2**b} ELSE 0 END)" for b in range(n_planes)
    )
    masks = [0]
    for h in range(1, multiprobe + 1):
        for bits in combinations(range(n_planes), h):
            masks.append(sum(1 << b for b in bits))
    probes = ", ".join(f"xor(bucket, {m})" for m in masks)
    cos = (
        "round(list_dot_product(q.qv, eb.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(eb.v, eb.v))), 6)"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ebk AS (SELECT vec_id, v, ({bucket})::BIGINT AS bucket FROM e),
q0 AS (SELECT vec_id AS qid, v AS qv, bucket FROM ebk WHERE vec_id < 10),
qp AS (SELECT qid, qv, unnest([{probes}]) AS bucket FROM q0),
cand AS (SELECT DISTINCT qp.qid, eb2.vec_id FROM qp
         JOIN ebk eb2 USING (bucket) WHERE eb2.vec_id <> qp.qid),
j AS (SELECT c.qid, c.vec_id, {cos} AS cosine
      FROM cand c JOIN q0 q ON q.qid = c.qid JOIN ebk eb ON eb.vec_id = c.vec_id)
SELECT qid, rank, vec_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id)::INT AS rank
  FROM j) WHERE rank <= {k}
"""


def _sql_ann_ivf_top5(n_centroids: int = 16, nprobe: int = 6, k: int = 5) -> str:
    """DuckDB twin of similarity.ivf_topk: centroids are the md5-ranked
    vector sample (pure SQL — no literals needed); every cosine used for
    cell assignment / probe selection is the same ordered left fold both
    engines compute, so argmax cells agree at boundaries."""
    fold_dot = (
        "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]), "
        "(a, b) -> a + b)"
    )
    fold_norm = "sqrt(list_reduce(list_transform({a}, x -> x * x), (a, b) -> a + b))"
    asgn_cos = (
        fold_dot.format(a="t.v", b="c.cv")
        + " / (" + fold_norm.format(a="t.v") + " * c.cnorm)"
    )
    out_cos = (
        "round(" + fold_dot.format(a="q.qv", b="eb.v")
        + " / (" + fold_norm.format(a="q.qv") + " * " + fold_norm.format(a="eb.v") + "), 6)"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ch AS (SELECT vec_id, v,
       ('0x' || substr(md5('0:' || vec_id::VARCHAR), 1, 15))::BIGINT AS h FROM e),
cents AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cidx, v AS cv,
          {fold_norm.format(a="v")} AS cnorm
          FROM ch ORDER BY h, vec_id LIMIT {n_centroids}),
asgn AS (SELECT t.vec_id, c.cidx, {asgn_cos} AS cos
         FROM (SELECT vec_id, v FROM e) t(vec_id, v) CROSS JOIN cents c),
cell AS (SELECT a.vec_id, a.cidx AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY cos DESC, cidx) AS rn FROM asgn) a WHERE rn = 1),
q0 AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
qasgn AS (SELECT t.qid, c.cidx, {asgn_cos.replace('t.v', 't.qv')} AS cos
          FROM (SELECT qid, qv FROM q0) t(qid, qv) CROSS JOIN cents c),
qp AS (SELECT qid, cidx AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                  ORDER BY cos DESC, cidx) AS rn FROM qasgn) WHERE rn <= {nprobe}),
cand AS (SELECT DISTINCT qp.qid, ce.vec_id FROM qp
         JOIN cell ce USING (cell) WHERE ce.vec_id <> qp.qid),
j AS (SELECT c.qid, c.vec_id, {out_cos} AS cosine
      FROM cand c JOIN q0 q ON q.qid = c.qid JOIN e eb ON eb.vec_id = c.vec_id)
SELECT qid, rank, vec_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id)::INT AS rank
  FROM j) WHERE rank <= {k}
"""


def _sql_gram_ctes(n: int, text_expr: str = "text") -> str:
    """Shared CTE chain t -> g producing per-doc word n-gram rows (DuckDB
    twin of ops/repetition._grams: lowercase, single-space split, empties
    dropped, overlapping n-grams joined by spaces)."""
    return f"""
t AS (SELECT doc_id, length({text_expr}) AS n_chars,
        list_filter(list_transform(string_split({text_expr}, chr(10)), s -> trim(s)), s -> s <> '') AS lines,
        list_filter(list_transform(string_split({text_expr}, chr(10) || chr(10)), s -> trim(s)), s -> s <> '') AS paras,
        list_filter(string_split(lower({text_expr}), ' '), s -> s <> '') AS toks
      FROM documents),
g AS (SELECT doc_id, array_to_string(toks[p:p+{n - 1}], ' ') AS gram
      FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - {n - 1}, 0))) AS p) l)"""


def _sql_text_repetition(n: int = 3) -> str:
    """DuckDB twin of repetition_stats over the newline-injected text."""

    def seg(col):
        chars = f"coalesce(list_sum(list_transform({col}, s -> length(s))), 0)"
        dchars = f"coalesce(list_sum(list_transform(list_distinct({col}), s -> length(s))), 0)"
        return (
            f"len({col})::INT AS n_{col},\n"
            f"  round(CASE WHEN len({col}) > 0 THEN (len({col}) - len(list_distinct({col}))) / len({col}) ELSE 0 END, 6) AS dup_{col[:-1]}_frac,\n"
            f"  round(CASE WHEN {chars} > 0 THEN ({chars} - {dchars}) / {chars} ELSE 0 END, 6) AS dup_{col[:-1]}_char_frac"
        )

    return f"""
WITH {_sql_gram_ctes(n, _SQL_STRUCTURED_TEXT)},
gc AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
gt AS (SELECT doc_id, cnt, length(gram) AS lg,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn,
         sum(cnt) OVER (PARTITION BY doc_id) AS ng,
         count(*) OVER (PARTITION BY doc_id) AS ndg
       FROM gc),
top AS (SELECT doc_id, ng, ndg, cnt * lg AS topchars FROM gt WHERE rn = 1)
SELECT t.doc_id,
  {seg("lines")},
  {seg("paras")},
  coalesce(top.ng, 0)::INT AS n_ngrams,
  round(CASE WHEN coalesce(top.ng, 0) > 0 THEN (top.ng - top.ndg) / top.ng ELSE 0 END, 6) AS dup_ngram_frac,
  round(CASE WHEN t.n_chars > 0 THEN coalesce(top.topchars, 0) / t.n_chars ELSE 0 END, 6) AS top_ngram_char_frac
FROM t LEFT JOIN top USING (doc_id)"""


def _sql_common_ngrams(n: int = 3, min_docs: int = 5) -> str:
    return f"""
WITH {_sql_gram_ctes(n)},
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram)
SELECT gram, count(*)::INT AS n_docs, sum(c)::BIGINT AS n_total
FROM gc GROUP BY gram HAVING count(*) >= {min_docs}"""


def _sql_decontaminate(n: int = 4, mod: int = 17) -> str:
    return f"""
WITH {_sql_gram_ctes(n)},
gd AS (SELECT DISTINCT doc_id, gram FROM g),
b AS (SELECT DISTINCT gram FROM gd WHERE doc_id % {mod} = 0),
ns AS (SELECT doc_id, count(*) AS n_shingles FROM gd WHERE doc_id % {mod} <> 0 GROUP BY doc_id),
h AS (SELECT gd.doc_id, count(*) AS n_hits FROM gd JOIN b USING (gram)
      WHERE gd.doc_id % {mod} <> 0 GROUP BY gd.doc_id)
SELECT h.doc_id, ns.n_shingles::INT AS n_shingles, h.n_hits::INT AS n_hits,
       round(h.n_hits / ns.n_shingles, 6) AS contamination_frac
FROM h JOIN ns USING (doc_id)"""


def _sql_u60(salt: str, key: str = "doc_id") -> str:
    """DuckDB twin of ops/sampling._u: 60-bit md5 hash scaled to [0,1)
    by the exact power-of-two 2^60."""
    return (
        f"(('0x' || substr(md5('{salt}:' || {key}::VARCHAR), 1, 15))::BIGINT"
        " / 1152921504606846976.0)"
    )


def _sql_pii_stats() -> str:
    e, p, i = PII.EMAIL_RE, PII.PHONE_RE, PII.IPV4_RE
    return f"""
WITH t AS (SELECT doc_id, {_SQL_PII_TEXT} AS t FROM documents),
c AS (SELECT doc_id,
  len(regexp_extract_all(t, '{e}'))::INT AS n_emails,
  len(regexp_extract_all(t, '{p}'))::INT AS n_phones,
  len(regexp_extract_all(t, '{i}'))::INT AS n_ipv4 FROM t)
SELECT doc_id, n_emails, n_phones, n_ipv4,
       (n_emails + n_phones + n_ipv4 > 0) AS has_pii FROM c"""


def _sql_pii_redact() -> str:
    e, p, i = PII.EMAIL_RE, PII.PHONE_RE, PII.IPV4_RE
    red = (
        f"regexp_replace(regexp_replace(regexp_replace({_SQL_PII_TEXT}, "
        f"'{e}', '<EMAIL>', 'g'), '{p}', '<PHONE>', 'g'), '{i}', '<IP>', 'g')"
    )
    return (
        f"SELECT doc_id, substr(md5({red}), 1, 16) AS fp16, "
        f"length({red})::INT AS n_chars FROM documents"
    )


def _sql_hash_split() -> str:
    cases = " ".join(
        f"WHEN u < {acc!r}::DOUBLE THEN '{name}'"
        for name, acc in SP.split_boundaries(_SPLIT_WEIGHTS)
    )
    last = list(_SPLIT_WEIGHTS)[-1]
    return (
        f"WITH u AS (SELECT doc_id, {_sql_u60('split')} AS u FROM documents) "
        f"SELECT doc_id, CASE {cases} ELSE '{last}' END AS split FROM u"
    )


def _sql_mixture_sample() -> str:
    cases = " ".join(f"WHEN '{s}' THEN {r!r}::DOUBLE" for s, r in _MIX_RATES.items())
    return (
        f"SELECT doc_id, source FROM documents "
        f"WHERE {_sql_u60('mix')} < CASE source {cases} ELSE 0.0::DOUBLE END"
    )


def _sql_pack_sequences(budget: int = 256, n_shards: int = 4) -> str:
    return f"""
WITH b AS (SELECT doc_id,
    (('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 15))::BIGINT % {n_shards})::INT AS shard,
    len(list_filter(string_split(lower(text), ' '), x -> x <> ''))::BIGINT AS n_tokens
  FROM documents),
p AS (SELECT doc_id, shard, n_tokens,
    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_start
  FROM b)
SELECT doc_id, shard, n_tokens, tok_start,
  (tok_start // {budget})::BIGINT AS seq_first,
  (CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // {budget}
        ELSE tok_start // {budget} END)::BIGINT AS seq_last,
  (tok_start % {budget})::BIGINT AS offset_in_seq
FROM p"""


def _sql_materialize_sequences(
    budget: int = 64,
    n_shards: int = 4,
    bounds: bool = False,
    prelude: str = "",
    src: str = "documents",
) -> str:
    """DuckDB twin of ops/sampling.materialize_sequences: same layout
    CTEs as _sql_pack_sequences, then LATERAL generate_series over the
    touched sequences, 1-based inclusive list slices, and an ordered
    string_agg per (shard, seq). bounds=True swaps the projection for
    the comma-joined document-boundary offsets (empty string for a
    wholly mid-document sequence, matching Spark's array_join)."""
    b = budget
    proj = (
        """coalesce(string_agg(boundary::VARCHAR, ',' ORDER BY tok_start)
        FILTER (WHERE boundary IS NOT NULL), '') AS bounds"""
        if bounds
        else """string_agg(array_to_string(piece, ' '), ' ' ORDER BY tok_start) AS text,
    sum(len(piece)) AS n_tokens"""
    )
    final = (
        "SELECT shard, seq::BIGINT AS seq, bounds FROM s"
        if bounds
        else "SELECT shard, seq::BIGINT AS seq, n_tokens::INT AS n_tokens,\n"
        "       substr(md5(text), 1, 16) AS fp16 FROM s"
    )
    return f"""
WITH {prelude}t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM {src}),
base AS (SELECT doc_id,
    (('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 15))::BIGINT % {n_shards})::INT AS shard,
    len(toks)::BIGINT AS n_tokens, toks FROM t),
p AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_start
  FROM base),
x AS (SELECT shard, tok_start, n_tokens, toks, gs AS seq
  FROM p, LATERAL (SELECT unnest(generate_series(tok_start // {b},
       (tok_start + n_tokens - 1) // {b})) AS gs) l
  WHERE n_tokens > 0),
pieces AS (SELECT shard, seq, tok_start,
    toks[(greatest(0, seq * {b} - tok_start) + 1):least(n_tokens, (seq + 1) * {b} - tok_start)] AS piece,
    CASE WHEN tok_start >= seq * {b} THEN (tok_start - seq * {b})::INT END AS boundary
  FROM x),
s AS (SELECT shard, seq, {proj} FROM pieces GROUP BY shard, seq)
{final}"""


def _sql_weighted_sample() -> str:
    """DuckDB twin of ops/sampling.weighted_sample over quality_score:
    same 6-dp quality formula as the text_quality oracle, then the
    survive-iff-u<p filter (quality is already in [0,1]; the clamp is a
    no-op both sides)."""
    stop_list = ", ".join(f"'{s}'" for s in TS.STOPWORDS_EN)
    return f"""
WITH {TOKS},
agg AS (SELECT doc_id, count(*) AS n,
               sum(CASE WHEN term IN ({stop_list}) THEN 1 ELSE 0 END) AS ns,
               count(DISTINCT term) AS nd
        FROM toks GROUP BY doc_id),
q AS (SELECT doc_id,
        round(((CASE WHEN n >= 10 AND n <= 100000 THEN 1.0 ELSE 0.0 END)
               + least(ns / greatest(n, 1) * 5.0, 1.0)
               + nd / greatest(n, 1)) / 3.0, 6) AS quality
      FROM agg)
SELECT doc_id, quality FROM q WHERE {_sql_u60('wsample')} < quality"""


def _sql_assemble_pipeline(budget: int = 64, n_shards: int = 4) -> str:
    """DuckDB twin of ops/sampling.assemble_corpus(_MIX_RATES, _EPOCHS):
    mixture filter -> epoch copies with derived ids -> the materialize
    chain over the upsampled CTE."""
    mix_cases = " ".join(
        f"WHEN '{s}' THEN {r!r}::DOUBLE" for s, r in _MIX_RATES.items()
    )
    whole_cases = " ".join(
        f"WHEN '{s}' THEN {int(float(e))}" for s, e in _EPOCHS.items()
    )
    frac_cases = " ".join(
        f"WHEN '{s}' THEN {float(e) - int(float(e))!r}::DOUBLE"
        for s, e in _EPOCHS.items()
    )
    k = int(max(float(e) for e in _EPOCHS.values())) + 1
    prelude = f"""mix AS (SELECT doc_id, source, text FROM documents
  WHERE {_sql_u60('mix')} < CASE source {mix_cases} ELSE 0.0::DOUBLE END),
eu AS (SELECT doc_id, text,
    (CASE source {whole_cases} ELSE 0 END
     + CASE WHEN {_sql_u60('epoch')} < CASE source {frac_cases} ELSE 0.0::DOUBLE END
            THEN 1 ELSE 0 END) AS n
  FROM mix),
up AS (SELECT doc_id * {k} + (gs - 1) AS doc_id, text
  FROM eu, LATERAL (SELECT unnest(generate_series(1, n)) AS gs) l),
"""
    return _sql_materialize_sequences(budget, n_shards, prelude=prelude, src="up")


def _sql_corpus_shuffle(n_buckets: int = 8) -> str:
    """DuckDB twin of ops/sampling.corpus_shuffle: a plain global
    row_number over (key, doc_id) — equal to Spark's bucketed
    offset+rank because buckets are contiguous hash ranges."""
    bits = n_buckets.bit_length() - 1
    return f"""
WITH k AS (SELECT doc_id,
    ('0x' || substr(md5('shuffle:' || doc_id::VARCHAR), 1, 15))::BIGINT AS key
  FROM documents)
SELECT doc_id, (key >> {60 - bits})::INT AS bucket,
       (row_number() OVER (ORDER BY key, doc_id) - 1)::BIGINT AS pos
FROM k"""


def _sql_epoch_upsample() -> str:
    whole_cases = " ".join(
        f"WHEN '{s}' THEN {int(float(e))}" for s, e in _EPOCHS.items()
    )
    frac_cases = " ".join(
        f"WHEN '{s}' THEN {float(e) - int(float(e))!r}::DOUBLE"
        for s, e in _EPOCHS.items()
    )
    return f"""
WITH c AS (SELECT doc_id, source,
    (CASE source {whole_cases} ELSE 0 END
     + CASE WHEN {_sql_u60('epoch')} < CASE source {frac_cases} ELSE 0.0::DOUBLE END
            THEN 1 ELSE 0 END) AS n
  FROM documents)
SELECT doc_id, source, (gs - 1)::INT AS epoch
FROM c, LATERAL (SELECT unnest(generate_series(1, n)) AS gs) l"""


def _sql_substring_ctes(k: int, min_count: int) -> str:
    """Shared CTE chain t -> w -> s -> marked -> spans: the DuckDB twin
    of ops/substring.duplicate_spans (k-token window hashes, global
    count + first occurrence, keep-first marking, interval merge). The
    first occurrence is ordered by the packed key doc_id*1e9+pos, which
    equals Spark's lexicographic min(struct(doc_id, pos)) for any
    realistic document length."""
    return f"""
t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents),
w AS (SELECT doc_id, p - 1 AS pos, md5(array_to_string(toks[p:p+{k - 1}], ' ')) AS h
      FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - {k - 1}, 0))) AS p) l),
s AS (SELECT h, count(*) AS cnt, min(doc_id * 1000000000 + pos) AS fk FROM w GROUP BY h),
marked AS (SELECT w.doc_id, w.pos FROM w JOIN s USING (h)
           WHERE cnt >= {min_count} AND w.doc_id * 1000000000 + w.pos <> fk),
m2 AS (SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + {k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
              THEN 1 ELSE 0 END AS new_span
       FROM marked),
m3 AS (SELECT doc_id, pos, sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       FROM m2),
spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + {k - 1} AS span_end,
            (max(pos) + {k - 1} - min(pos) + 1)::INT AS n_tokens, count(*)::INT AS n_windows
          FROM m3 GROUP BY doc_id, span_id)"""


def _sql_substring_spans(k: int = 5, min_count: int = 2) -> str:
    return f"""
WITH {_sql_substring_ctes(k, min_count)}
SELECT doc_id, span_start, span_end, n_tokens, n_windows FROM spans"""


def _sql_substring_strip(k: int = 5, min_count: int = 2) -> str:
    """DuckDB twin of strip_duplicate_spans projected to the gate shape
    (doc_id, fp16 of the stripped canonical text, n_kept, n_removed)."""
    return f"""
WITH {_sql_substring_ctes(k, min_count)},
tok AS (SELECT doc_id, gs - 1 AS pos, toks[gs] AS term
        FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS gs) l),
keep AS (SELECT tok.doc_id, tok.pos, tok.term FROM tok
         WHERE NOT EXISTS (SELECT 1 FROM spans sp
               WHERE sp.doc_id = tok.doc_id
                 AND tok.pos BETWEEN sp.span_start AND sp.span_end)),
agg AS (SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS rt, count(*) AS nk
        FROM keep GROUP BY doc_id)
SELECT t.doc_id, substr(md5(coalesce(agg.rt, '')), 1, 16) AS fp16,
       coalesce(agg.nk, 0)::INT AS n_kept,
       (len(t.toks) - coalesce(agg.nk, 0))::INT AS n_removed
FROM t LEFT JOIN agg USING (doc_id)"""


def _substring_strip_fp(spark, sf_dir):
    """strip_duplicate_spans projected to a hashable gate shape."""
    r = SUB.strip_duplicate_spans(_docs(spark, sf_dir), k=5)
    return r.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fp16"),
        "n_kept",
        "n_removed",
    )


def _docs_url(spark, sf_dir):
    """domain-gate input: documents with a deterministic URL injected
    (the synthetic table has none) — seven siteN.example.com hosts by
    doc_id%7, every 13th doc scheme-less so the empty-domain path is
    exercised. The DuckDB twin concatenates identically."""
    d = _docs(spark, sf_dir)
    url = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(F.lit("bare.example/path/"), F.col("doc_id").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/a/"),
            F.col("doc_id").cast("string"),
        )
    )
    return d.select("doc_id", url.alias("url"), "text")


# DuckDB twin of _docs_url's url expression
_SQL_URL = (
    "CASE WHEN doc_id % 13 = 0 THEN 'bare.example/path/' || doc_id::VARCHAR"
    " ELSE 'https://site' || (doc_id % 7)::VARCHAR || '.example.com/a/'"
    " || doc_id::VARCHAR END"
)

# shared CTE: url injection + domain extraction (twin of extract_domain)
_SQL_DOMAIN_CTE = f"""
u AS (SELECT doc_id, {_SQL_URL} AS url, text FROM documents),
d AS (SELECT doc_id, lower(regexp_extract(url, '{DOM.DOMAIN_RE}', 1)) AS domain, text
      FROM u)"""


def _sql_domain_stats() -> str:
    return f"""
WITH {_SQL_DOMAIN_CTE}
SELECT domain, count(*)::INT AS n_docs, sum(length(text))::BIGINT AS n_chars
FROM d GROUP BY domain"""


def _sql_domain_cap(max_docs: int = 20) -> str:
    return f"""
WITH {_SQL_DOMAIN_CTE},
r AS (SELECT doc_id, row_number() OVER (PARTITION BY domain
        ORDER BY {_sql_u60("domain-cap")}, doc_id) AS rn FROM d)
SELECT doc_id FROM r WHERE rn <= {max_docs}"""


def _sql_domain_cap_approx(max_docs: int = 20) -> str:
    return f"""
WITH {_SQL_DOMAIN_CTE},
c AS (SELECT domain, count(*) AS cnt FROM d GROUP BY domain)
SELECT doc_id FROM d JOIN c USING (domain)
WHERE {_sql_u60("domain-cap")} < least(1.0, {float(max_docs)!r} / cnt)"""


def _sql_domain_blocklist(blocked: str) -> str:
    return f"""
WITH {_SQL_DOMAIN_CTE}
SELECT doc_id FROM d WHERE domain <> '{blocked}'"""


def _sql_line_strip(min_count: int = 2) -> str:
    """DuckDB twin of strip_duplicate_lines over the newline-injected
    text, projected to (doc_id, fp16 of the rewritten text, n_kept,
    n_removed). Grouping directly on the line is equivalent to Spark's
    md5(line) shuffle key; the packed key replays min(struct(doc_id,
    pos)) for the keep-first rule."""
    return f"""
WITH t AS (SELECT doc_id, list_filter(list_transform(string_split({_SQL_STRUCTURED_TEXT},
             chr(10)), s -> trim(s)), s -> s <> '') AS lines FROM documents),
l AS (SELECT doc_id, gs - 1 AS pos, lines[gs] AS line
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(lines))) AS gs) g),
s AS (SELECT line, count(*) AS cnt, min(doc_id * 1000000000 + pos) AS fk
      FROM l GROUP BY line),
keep AS (SELECT l.doc_id, l.pos, l.line FROM l JOIN s USING (line)
         WHERE cnt < {min_count} OR doc_id * 1000000000 + pos = fk),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS rt, count(*) AS nk
        FROM keep GROUP BY doc_id)
SELECT t.doc_id, substr(md5(coalesce(agg.rt, '')), 1, 16) AS fp16,
       coalesce(agg.nk, 0)::INT AS n_kept,
       (len(t.lines) - coalesce(agg.nk, 0))::INT AS n_removed
FROM t LEFT JOIN agg USING (doc_id)"""


def _line_strip_fp(spark, sf_dir):
    """strip_duplicate_lines over the newline-injected documents,
    projected to a hashable gate shape."""
    r = SUB.strip_duplicate_lines(_docs_structured(spark, sf_dir))
    return r.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fp16"),
        "n_kept",
        "n_removed",
    )


def _sql_cluster_reps(threshold: float = 0.8) -> str:
    """DuckDB twin of cluster_representatives over the minhash duplicate
    clusters: quality-ranked representative per cluster (row_number by
    quality DESC, doc_id ASC == Spark's max over the (quality, -id)
    struct)."""
    stop = ", ".join(f"'{s}'" for s in TS.STOPWORDS_EN)
    return f"""
WITH clus AS (SELECT * FROM ({_sql_minhash_clusters(threshold)}) c),
{TOKS},
qa AS (SELECT doc_id, count(*) AS n,
         sum(CASE WHEN term IN ({stop}) THEN 1 ELSE 0 END) AS ns,
         count(DISTINCT term) AS nd
       FROM toks GROUP BY doc_id),
qual AS (SELECT doc_id,
           round(((CASE WHEN n >= 10 AND n <= 100000 THEN 1.0 ELSE 0.0 END)
             + least(ns / greatest(n, 1) * 5.0, 1.0)
             + nd / greatest(n, 1)) / 3.0, 6) AS quality
         FROM qa),
scored AS (SELECT clus.cluster_id, clus.doc_id, qual.quality
           FROM clus JOIN qual USING (doc_id))
SELECT cluster_id, doc_id, quality FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
            ORDER BY quality DESC, doc_id) AS rn
  FROM scored) WHERE rn = 1"""


def _sql_curate_pipeline() -> str:
    """DuckDB twin of _curate_pipeline: the five enabled curation stages
    composed as one CTE chain — quality floor (0.6), exact dedup (min id
    per sha256), 4-gram decontamination vs the doc_id%17 slice, PII
    redaction (email -> phone -> IPv4, the redact_pii order), md5 hash
    split. Reuses the per-stage oracle arithmetic verbatim."""
    stop = ", ".join(f"'{s}'" for s in TS.STOPWORDS_EN)
    e, p, i = PII.EMAIL_RE, PII.PHONE_RE, PII.IPV4_RE
    red = (
        "regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{e}', '<EMAIL>', 'g'), '{p}', '<PHONE>', 'g'), '{i}', '<IP>', 'g')"
    )
    cases = " ".join(
        f"WHEN u < {acc!r}::DOUBLE THEN '{name}'"
        for name, acc in SP.split_boundaries(_SPLIT_WEIGHTS)
    )
    last = list(_SPLIT_WEIGHTS)[-1]
    grams = (
        "SELECT DISTINCT doc_id, array_to_string(toks[p:p+3], ' ') AS gram "
        "FROM {src}, LATERAL (SELECT unnest(generate_series(1, "
        "greatest(len(toks) - 3, 0))) AS p) l"
    )
    return f"""
WITH src AS (SELECT doc_id, {_SQL_CURATE_TEXT} AS text FROM documents),
qt AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term FROM src),
qa AS (SELECT doc_id, count(*) AS n,
         sum(CASE WHEN term IN ({stop}) THEN 1 ELSE 0 END) AS ns,
         count(DISTINCT term) AS nd
       FROM qt GROUP BY doc_id),
q AS (SELECT doc_id FROM qa
      WHERE round(((CASE WHEN n >= 10 AND n <= 100000 THEN 1.0 ELSE 0.0 END)
            + least(ns / greatest(n, 1) * 5.0, 1.0)
            + nd / greatest(n, 1)) / 3.0, 6) >= 0.6),
k1 AS (SELECT s.doc_id, s.text FROM src s JOIN q USING (doc_id)),
d AS (SELECT min(doc_id) AS doc_id FROM k1 GROUP BY sha256(text)),
k2 AS (SELECT k1.doc_id, k1.text FROM k1 JOIN d USING (doc_id)),
ct AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks FROM k2),
cg AS ({grams.format(src="ct")}),
bt AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
       FROM documents WHERE doc_id % 17 = 0),
bg AS (SELECT DISTINCT gram FROM ({grams.format(src="bt")})),
kill AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram)),
k3 AS (SELECT doc_id, {red} AS rt FROM k2
       WHERE doc_id NOT IN (SELECT doc_id FROM kill))
SELECT doc_id, substr(md5(rt), 1, 16) AS fp16, length(rt)::INT AS n_chars,
       CASE {cases} ELSE '{last}' END AS split
FROM (SELECT doc_id, rt, {_sql_u60('split')} AS u FROM k3)
"""


# ---------------------------------------------------------------------------
# BPE tokenizer + DSIR importance-resampling gates
# ---------------------------------------------------------------------------


def _dsir_logratio(spark, sf_dir) -> list[int]:
    """Fit the quantized per-bucket log-ratio on (target = _DSIR_TARGET
    sources, raw = all documents) — the model half of the DSIR gates."""
    d = _docs(spark, sf_dir)
    tgt = d.filter(F.col("source").isin(*_DSIR_TARGET))
    return DS.fit_logratio(
        DS.ngram_bucket_counts(tgt, _DSIR_BUCKETS),
        DS.ngram_bucket_counts(d, _DSIR_BUCKETS),
        _DSIR_BUCKETS,
    )


def _lm_nll(spark, sf_dir):
    """CCNet-style perplexity filter gate: reference model fit on the
    _DSIR_TARGET sources, mean NLL scored over every document."""
    d = _docs(spark, sf_dir)
    ref = d.filter(F.col("source").isin(*_DSIR_TARGET))
    lp = DS.fit_logprob(
        DS.ngram_bucket_counts(ref, _DSIR_BUCKETS), _DSIR_BUCKETS
    )
    return DS.lm_perplexity(d, lp)


def _sql_lm_nll() -> str:
    """DuckDB twin of _lm_nll: the dsir gram/bucket CTEs, a log-prob
    table over all buckets fit on the reference sources (floor(x+0.5)
    micro-nat quantization), then nll = -sum(lp)/(n*QUANT) — a ratio of
    exact integers, rounded to 6 dp like the Spark side."""
    b, q = _DSIR_BUCKETS, DS.QUANT
    tgt = ", ".join(f"'{s}'" for s in _DSIR_TARGET)
    return f"""
WITH w AS (SELECT doc_id, source,
    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents),
uni AS (SELECT doc_id, source, unnest(ws) AS gram FROM w),
bi AS (SELECT doc_id, source, ws[gs] || ' ' || ws[gs+1] AS gram
       FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS gs) l),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
bk AS (SELECT doc_id, source,
    (('0x' || substr(md5('dsir:' || gram), 1, 15))::BIGINT % {b})::INT AS bucket
  FROM grams),
tb AS (SELECT bucket, count(*)::BIGINT AS c FROM bk WHERE source IN ({tgt}) GROUP BY 1),
tt AS (SELECT count(*)::DOUBLE + {b} AS t FROM bk WHERE source IN ({tgt})),
lp AS (SELECT gs.g::INT AS bucket,
    floor({q} * ln((coalesce(tb.c, 0) + 1) / tt.t) + 0.5)::BIGINT AS lp
  FROM (SELECT unnest(generate_series(0, {b - 1})) AS g) gs
  LEFT JOIN tb ON tb.bucket = gs.g, tt)
SELECT bk.doc_id, count(*)::BIGINT AS n_grams,
       round(-sum(lp.lp) / (count(*) * {q}.0), 6) AS nll
FROM bk JOIN lp USING (bucket) GROUP BY bk.doc_id"""


def _sql_bpe_encode_fixed() -> str:
    """DuckDB twin of ops/bpe.encode_fingerprint(_BPE_MERGES): doc-level
    space-joined char stream, each merge replayed as TWO literal
    ' a b ' -> ' ab ' replaces (two passes == the per-word left-to-right
    scan for a != b merges; see ops/bpe.encode_fingerprint)."""
    expr = "' ' || stream || ' '"
    for a, b in _BPE_MERGES:
        for _ in range(2):
            expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
    return rf"""
WITH s AS (SELECT doc_id,
  coalesce(list_aggregate(list_transform(
      list_filter(string_split(lower(text), ' '), w -> w <> ''),
      w -> rtrim(regexp_replace(w, '(.)', '\1 ', 'g')) || ' </w>'),
    'string_agg', ' '), '') AS stream
  FROM documents),
enc AS (SELECT doc_id, trim({expr}) AS enc FROM s)
SELECT doc_id,
       (CASE WHEN enc = '' THEN 0 ELSE len(string_split(enc, ' ')) END)::INT
         AS n_tokens,
       substr(md5(enc), 1, 16) AS enc_fp
FROM enc"""


def _pack_materialize_ids(spark, sf_dir):
    """materialize_token_sequences over SQL-reproducible synthetic token
    ids (h60('tokid:'||word) % 1000 per whitespace token) so the packed
    id sequences hash-compare against the DuckDB twin. The real
    producer is ops/bpe.encode, whose merge semantics carry their own
    gate (bpe_encode_fixed); this gate pins the id-array packing."""
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    ids = F.transform(
        toks, lambda w: (SP._h60("tokid", w) % F.lit(1000)).cast("int")
    )
    enc = d.select("doc_id", ids.alias("token_ids"))
    out = SP.materialize_token_sequences(enc, budget=64, n_shards=4)
    return out.select(
        "shard",
        "seq",
        "n_tokens",
        F.array_join(
            F.transform("boundaries", lambda o: o.cast("string")), ","
        ).alias("bounds"),
        F.substring(
            F.md5(
                F.array_join(
                    F.transform("token_ids", lambda i: i.cast("string")), ","
                )
            ),
            1,
            16,
        ).alias("ids_fp"),
    )


def _sql_materialize_token_sequences(budget: int = 64, n_shards: int = 4) -> str:
    """DuckDB twin of _pack_materialize_ids: the materialize CTE chain
    with list_transform'd synthetic token ids and a comma-joined
    ordered id-string aggregation (string_agg of per-piece
    array_to_string == array_join of the flattened id array because
    every piece is non-empty)."""
    b = budget
    return f"""
WITH t AS (SELECT doc_id,
    list_transform(list_filter(string_split(lower(text), ' '), x -> x <> ''),
      w -> (('0x' || substr(md5('tokid:' || w), 1, 15))::BIGINT % 1000)::INT) AS toks
  FROM documents),
base AS (SELECT doc_id,
    (('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 15))::BIGINT % {n_shards})::INT AS shard,
    len(toks)::BIGINT AS n_tokens, toks FROM t),
p AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_start
  FROM base),
x AS (SELECT shard, tok_start, n_tokens, toks, gs AS seq
  FROM p, LATERAL (SELECT unnest(generate_series(tok_start // {b},
       (tok_start + n_tokens - 1) // {b})) AS gs) l
  WHERE n_tokens > 0),
pieces AS (SELECT shard, seq, tok_start,
    toks[(greatest(0, seq * {b} - tok_start) + 1):least(n_tokens, (seq + 1) * {b} - tok_start)] AS piece,
    CASE WHEN tok_start >= seq * {b} THEN (tok_start - seq * {b})::INT END AS boundary
  FROM x),
s AS (SELECT shard, seq,
    string_agg(array_to_string(piece, ','), ',' ORDER BY tok_start) AS idstr,
    sum(len(piece)) AS n_tokens,
    coalesce(string_agg(boundary::VARCHAR, ',' ORDER BY tok_start)
      FILTER (WHERE boundary IS NOT NULL), '') AS bounds
  FROM pieces GROUP BY shard, seq)
SELECT shard, seq::BIGINT AS seq, n_tokens::INT AS n_tokens, bounds,
       substr(md5(idstr), 1, 16) AS ids_fp FROM s"""


def _sql_dsir(final: str) -> str:
    """Shared DuckDB body for the DSIR gates: hashed unigram+bigram
    bucket counts, the full smoothed log-ratio fit recomputed in SQL
    (generate_series over all buckets, floor(x + 0.5) micro-nat
    quantization — the ops/dsir.fit_logratio semantics), exact int64
    per-doc scores."""
    b, q = _DSIR_BUCKETS, DS.QUANT
    tgt = ", ".join(f"'{s}'" for s in _DSIR_TARGET)
    return f"""
WITH w AS (SELECT doc_id, source,
    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents),
uni AS (SELECT doc_id, source, unnest(ws) AS gram FROM w),
bi AS (SELECT doc_id, source, ws[gs] || ' ' || ws[gs+1] AS gram
       FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS gs) l),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
bk AS (SELECT doc_id, source,
    (('0x' || substr(md5('dsir:' || gram), 1, 15))::BIGINT % {b})::INT AS bucket
  FROM grams),
cnt AS (SELECT doc_id, bucket, count(*)::BIGINT AS cnt FROM bk GROUP BY 1, 2),
tb AS (SELECT bucket, count(*)::BIGINT AS c FROM bk WHERE source IN ({tgt}) GROUP BY 1),
rb AS (SELECT bucket, count(*)::BIGINT AS c FROM bk GROUP BY 1),
tt AS (SELECT count(*)::DOUBLE + {b} AS t FROM bk WHERE source IN ({tgt})),
rt AS (SELECT count(*)::DOUBLE + {b} AS t FROM bk),
lr AS (SELECT gs.g::INT AS bucket,
    floor({q} * ln(((coalesce(tb.c, 0) + 1) / tt.t)
                   / ((coalesce(rb.c, 0) + 1) / rt.t)) + 0.5)::BIGINT AS lr
  FROM (SELECT unnest(generate_series(0, {b - 1})) AS g) gs
  LEFT JOIN tb ON tb.bucket = gs.g LEFT JOIN rb ON rb.bucket = gs.g, tt, rt),
sc AS (SELECT c.doc_id, sum(c.cnt * l.lr)::BIGINT AS score
       FROM cnt c JOIN lr l USING (bucket) GROUP BY 1)
{final}"""


def _sql_dsir_scores() -> str:
    return _sql_dsir("SELECT doc_id, score FROM sc")


def _sql_dsir_top50() -> str:
    q = DS.QUANT
    return _sql_dsir(
        f""", k AS (SELECT doc_id, score,
    score / {q}.0 + (-ln(-ln({_sql_u60('gumbel:dsir')}))) AS key FROM sc)
SELECT doc_id, score, round(key, 6) AS key FROM k
ORDER BY key DESC, doc_id LIMIT 50"""
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- IR pipeline (SURVEY.md §2: A1-A8, F1/F2/F5, K1/K2, J4/J5, P1) ---
        "ir_term_stats": lambda s, d: IR.term_stats(_docs(s, d)),
        "ir_dictionary": lambda s, d: IR.dictionary(_docs(s, d)),
        "ir_doclens": lambda s, d: IR.doclens(_docs(s, d)),
        "ir_postings": lambda s, d: IR.postings(_docs(s, d)),
        "ir_term_positions": lambda s, d: IR.term_positions(_docs(s, d)),
        "ir_bm25_scores": lambda s, d: IR.bm25_scores(s, _docs(s, d), IR.GATE_QUERIES),
        "ir_bm25_top10": lambda s, d: IR.bm25_top10(s, _docs(s, d), IR.GATE_QUERIES),
        "ir_tfidf_scores": lambda s, d: IR.tfidf_scores(s, _docs(s, d), IR.GATE_QUERIES),
        "ir_dirichlet_top10": lambda s, d: IR.dirichlet_top10(s, _docs(s, d), IR.GATE_QUERIES),
        "ir_conjunctive_docs": lambda s, d: IR.conjunctive_docs(_docs(s, d)),
        # --- dedup suite -------------------------------------------------
        "dedup_exact": lambda s, d: D.exact_dedup(_docs(s, d)),
        "dedup_minhash_sigs": lambda s, d: D.minhash_signatures(_docs(s, d)),
        "dedup_minhash_pairs": lambda s, d: D.minhash_dedup_pairs(_docs(s, d), threshold=0.8),
        "dedup_minhash_clusters": lambda s, d: D.dedup_clusters(
            D.minhash_dedup_pairs(_docs(s, d), threshold=0.8)
        ),
        "dedup_simhash": lambda s, d: D.simhash(_docs(s, d)),
        "dedup_simhash_pairs": lambda s, d: D.simhash_pairs(D.simhash(_docs(s, d)), max_hamming=2),
        "dedup_ngram_jaccard": lambda s, d: D.ngram_jaccard_pairs(_docs(s, d), threshold=0.5),
        "dedup_substring_spans": lambda s, d: SUB.duplicate_spans(_docs(s, d), k=5),
        "dedup_substring_strip": _substring_strip_fp,
        "dedup_line_strip": _line_strip_fp,
        "domain_stats": lambda s, d: DOM.domain_stats(_docs_url(s, d)),
        "domain_cap": lambda s, d: DOM.cap_per_domain(_docs_url(s, d), 20).select("doc_id"),
        "domain_cap_approx": lambda s, d: DOM.cap_per_domain_approx(
            _docs_url(s, d), 20
        ).select("doc_id"),
        "domain_blocklist": lambda s, d: DOM.filter_blocklist(
            _docs_url(s, d),
            s.createDataFrame([("site3.example.com",)], ["domain"]),
        ).select("doc_id"),
        "dedup_cluster_reps": lambda s, d: D.cluster_representatives(
            D.dedup_clusters(D.minhash_dedup_pairs(_docs(s, d), threshold=0.8)),
            TS.quality_score(_docs(s, d)).select("doc_id", "quality"),
            score_col="quality",
        ),
        "dedup_embedding_cosine": lambda s, d: D.embedding_neardup_pairs(
            read_table(s, d, "embeddings"), threshold=0.3
        ),
        # --- similarity search -------------------------------------------
        "ann_cosine_top5": lambda s, d: SIM.brute_force_topk(*_ann_queries(s, d), k=5),
        "ann_lsh_top5": lambda s, d: SIM.lsh_bucketed_topk(*_ann_queries(s, d), k=5),
        "ann_ivf_top5": lambda s, d: SIM.ivf_topk(
            *_ann_queries(s, d), k=5, n_centroids=16, nprobe=6
        ),
        # --- text analysis ------------------------------------------------
        "text_token_count": lambda s, d: TS.token_count(_docs(s, d)),
        "text_bpe_token_count": lambda s, d: TS.bpe_token_count(_docs(s, d)),
        "text_quality": lambda s, d: TS.quality_score(_docs(s, d)),
        "text_langid": lambda s, d: TS.langid(_docs(s, d)),
        "text_fingerprint": lambda s, d: TS.fingerprint(_docs(s, d)),
        "text_repetition": lambda s, d: RP.repetition_stats(_docs_structured(s, d), ngram=3),
        "dedup_common_ngrams": lambda s, d: RP.common_ngrams(_docs(s, d), n=3, min_docs=5),
        "dedup_decontaminate": lambda s, d: RP.decontaminate(
            _docs(s, d).filter(F.col("doc_id") % 17 != 0),
            _docs(s, d).filter(F.col("doc_id") % 17 == 0),
            n=4,
        ),
        # --- pipeline assembly: PII / sampling / packing ------------------
        "pii_stats": lambda s, d: PII.pii_stats(_docs_pii(s, d)),
        "pii_redact": _pii_redact_fp,
        "sample_hash_split": lambda s, d: SP.hash_split(
            _docs(s, d), _SPLIT_WEIGHTS
        ).select("doc_id", "split"),
        "sample_mixture": lambda s, d: SP.mixture_sample(_docs(s, d), _MIX_RATES).select(
            "doc_id", "source"
        ),
        "pack_sequences": lambda s, d: SP.pack_sequences(_docs(s, d), budget=256, n_shards=4),
        "pack_materialize": lambda s, d: SP.materialize_sequences(
            _docs(s, d), budget=64, n_shards=4
        ).select(
            "shard", "seq", "n_tokens", F.substring(F.md5("text"), 1, 16).alias("fp16")
        ),
        "pack_materialize_bounds": lambda s, d: SP.materialize_sequences(
            _docs(s, d), budget=64, n_shards=4
        ).select(
            "shard",
            "seq",
            F.array_join(
                F.transform("boundaries", lambda o: o.cast("string")), ","
            ).alias("bounds"),
        ),
        "sample_corpus_shuffle": lambda s, d: SP.corpus_shuffle(_docs(s, d), n_buckets=8),
        "sample_epoch_upsample": lambda s, d: SP.epoch_upsample(
            _docs(s, d), _EPOCHS
        ).select("doc_id", "source", "epoch"),
        "sample_weighted": lambda s, d: SP.weighted_sample(
            TS.quality_score(_docs(s, d)).select("doc_id", "quality"), "quality"
        ),
        "pack_materialize_ids": _pack_materialize_ids,
        "bpe_word_counts": lambda s, d: BP.word_counts(_docs(s, d)),
        "bpe_encode_fixed": lambda s, d: BP.encode_fingerprint(
            _docs(s, d), _BPE_MERGES
        ),
        "dsir_scores": lambda s, d: DS.dsir_score(
            _docs(s, d), _dsir_logratio(s, d)
        ),
        "dsir_top50": lambda s, d: DS.dsir_resample(
            _docs(s, d), _dsir_logratio(s, d), k=50
        ),
        "lm_perplexity_nll": _lm_nll,
        "curate_pipeline": _curate_pipeline,
        "assemble_pipeline": lambda s, d: SP.assemble_corpus(
            _docs(s, d), budget=64, rates=_MIX_RATES, epochs=_EPOCHS, n_shards=4
        ).select(
            "shard", "seq", "n_tokens", F.substring(F.md5("text"), 1, 16).alias("fp16")
        ),
        # --- engine-native (float32 kernels; DuckDB float32-emulating oracles)
        "engine_bm25_top10": _engine_bm25_top10,
        "engine_nl_bm25_top10": _engine_nl_bm25_top10,
        "engine_dirichlet_top10": lambda s, d: _engine_scored(s, d, "dirichlet"),
        "engine_jm_top10": lambda s, d: _engine_scored(s, d, "jm"),
        "engine_tfidf_top10": lambda s, d: _engine_scored(s, d, "tfidf"),
        "engine_f2exp_top10": lambda s, d: _engine_scored(s, d, "f2exp"),
        "engine_sd_top10": _engine_sd_top10,
        "engine_cascade_top10": _engine_cascade_top10,
        "engine_cascade_pruned_top10": _engine_cascade_pruned_top10,
        "engine_xml_sd_top10": _engine_xml_sd_top10,
        "engine_prf_top10": _engine_prf_top10,
        "engine_lce_top10": _engine_lce_top10,
        "engine_sqe_top10": _engine_sqe_top10,
        "engine_wsd_top10": _engine_wsd_top10,
        "ltr_features": _ltr_features,
        "ltr_model_scores": _ltr_model_scores,
        "ptc_queries": _ptc_queries,
        "bitext_pairs": _bitext_pairs,
        "multimodal_features": _multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ir_term_stats": f"WITH {TOKS} SELECT term, count(DISTINCT doc_id)::INT AS df, "
        "count(*)::BIGINT AS cf FROM toks GROUP BY term",
        "ir_dictionary": f"WITH {TOKS}, {STATS} SELECT term, "
        "row_number() OVER (ORDER BY df DESC, term)::INT AS termid, df, cf FROM stats",
        "ir_doclens": f"WITH {TOKS} SELECT doc_id, count(*)::INT AS doclen "
        "FROM toks GROUP BY doc_id",
        "ir_postings": f"WITH {TOKS} SELECT doc_id, term, count(*)::INT AS tf "
        "FROM toks GROUP BY doc_id, term",
        "ir_term_positions": "SELECT doc_id, unnest(l) AS term, "
        "generate_subscripts(l, 1)::INT AS pos FROM (SELECT doc_id, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS l FROM documents)",
        "ir_bm25_scores": f"""
WITH {TOKS}, {TF}, {DL}, {STATS}, {GLOB}, {QV}
SELECT q.qid, tf.doc_id, round(sum({BM25_CONTRIB}), 4) AS score
FROM q JOIN stats USING (term) JOIN tf USING (term)
JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN gl
GROUP BY q.qid, tf.doc_id""",
        "ir_bm25_top10": f"""
WITH {TOKS}, {TF}, {DL}, {STATS}, {GLOB}, {QV},
scored AS (
  SELECT q.qid, tf.doc_id, round(sum({BM25_CONTRIB}), 4) AS score
  FROM q JOIN stats USING (term) JOIN tf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN gl
  GROUP BY q.qid, tf.doc_id)
SELECT qid, rank, doc_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INT AS rank
  FROM scored) WHERE rank <= 10""",
        "ir_tfidf_scores": f"""
WITH {TOKS}, {TF}, {STATS}, {DL}, {GLOB}, {QV}
SELECT q.qid, tf.doc_id, round(sum(q.qtf * tf.tf * ln(gl.n / stats.df)), 4) AS score
FROM q JOIN stats USING (term) JOIN tf USING (term) CROSS JOIN gl
GROUP BY q.qid, tf.doc_id""",
        "ir_dirichlet_top10": f"""
WITH {TOKS}, {TF}, {DL}, {STATS}, {QV},
clen AS (SELECT count(*)::BIGINT AS clen FROM toks),
qd AS (SELECT q.qid, q.term, q.qtf, stats.cf FROM q JOIN stats USING (term)),
cand AS (SELECT DISTINCT qd.qid, tf.doc_id FROM qd JOIN tf USING (term)),
full_m AS (
  SELECT c.qid, c.doc_id, qd.qtf, qd.cf, coalesce(tf.tf, 0) AS tf, dl.doclen
  FROM cand c JOIN qd ON qd.qid = c.qid
  LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.term = qd.term
  JOIN dl ON dl.doc_id = c.doc_id),
scored AS (
  SELECT qid, doc_id,
         round(sum(qtf * ln((tf + 2500.0 * cf / clen.clen) / (doclen + 2500.0))), 4) AS score
  FROM full_m CROSS JOIN clen GROUP BY qid, doc_id)
SELECT qid, rank, doc_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INT AS rank
  FROM scored) WHERE rank <= 10""",
        "ir_conjunctive_docs": f"""
WITH {TOKS}
SELECT doc_id FROM toks WHERE term IN ({", ".join(f"'{t}'" for t in IR.CONJ_TERMS)})
GROUP BY doc_id HAVING count(DISTINCT term) = {len(IR.CONJ_TERMS)}""",
        "dedup_exact": "SELECT min(doc_id) AS doc_id, sha256(text) AS sha256, "
        "count(*)::INT AS n_dupes FROM documents GROUP BY sha256(text)",
        "dedup_minhash_sigs": _sql_minhash_sigs(),
        "dedup_minhash_pairs": _sql_minhash_pairs(0.8),
        "dedup_minhash_clusters": _sql_minhash_clusters(0.8),
        "dedup_simhash": _sql_simhash_expr(),
        "dedup_simhash_pairs": f"""
WITH {TOKS}, {TF},
h AS (SELECT doc_id, term, tf, ('0x' || substr(md5('0:' || term), 1, 15))::BIGINT AS h FROM tf),
sh AS (SELECT doc_id, ({" + ".join(
            f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN tf ELSE -tf END) > 0 THEN {2**b} ELSE 0 END)"
            for b in range(_SIMHASH_BITS)
        )})::BIGINT AS simhash FROM h GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2""",
        "dedup_ngram_jaccard": """
WITH t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
sh AS (SELECT DISTINCT doc_id, toks[p] || ' ' || toks[p+1] || ' ' || toks[p+2] AS g
       FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS p) l),
ns AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b, round(i / (na.n + nb.n - i), 6) AS jaccard
FROM inter JOIN ns na ON na.doc_id = doc_a JOIN ns nb ON nb.doc_id = doc_b
WHERE round(i / (na.n + nb.n - i), 6) >= 0.5""",
        "dedup_embedding_cosine": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3""",
        "ann_cosine_top5": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
pairs AS (
  SELECT q.qid, e.vec_id,
         round(list_dot_product(q.qv, e.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
  FROM q JOIN e ON e.vec_id <> q.qid)
SELECT qid, rank, vec_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id)::INT AS rank
  FROM pairs) WHERE rank <= 5""",
        "text_token_count": "SELECT doc_id, "
        "len(list_filter(string_split(lower(text), ' '), x -> x <> ''))::INT AS n_tokens, "
        "len(list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')))::INT AS n_distinct, "
        "length(text)::INT AS n_chars FROM documents",
        "text_quality": f"""
WITH {TOKS},
agg AS (SELECT doc_id, count(*) AS n, sum(length(term)) AS sl,
               sum(CASE WHEN term IN ({", ".join(f"'{s}'" for s in TS.STOPWORDS_EN)})
                   THEN 1 ELSE 0 END) AS ns,
               count(DISTINCT term) AS nd
        FROM toks GROUP BY doc_id)
SELECT doc_id, n::INT AS n_tokens,
       round(sl / greatest(n, 1), 6) AS avg_token_len,
       round(ns / greatest(n, 1), 6) AS stopword_ratio,
       round(nd / greatest(n, 1), 6) AS distinct_ratio,
       round(((CASE WHEN n >= 10 AND n <= 100000 THEN 1.0 ELSE 0.0 END)
              + least(ns / greatest(n, 1) * 5.0, 1.0)
              + nd / greatest(n, 1)) / 3.0, 6) AS quality
FROM agg""",
        "text_bpe_token_count": """
WITH b AS (SELECT doc_id,
    regexp_extract_all(lower(text),
      '''(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s'']+|\\s+') AS p,
    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_ws
  FROM documents)
SELECT doc_id, len(p)::INT AS n_pieces,
       len(list_filter(p, x -> trim(x) <> ''))::INT AS n_word_pieces,
       round(len(list_filter(p, x -> trim(x) <> '')) / greatest(n_ws, 1), 6)
         AS pieces_per_ws_token
FROM b""",
        "text_langid": _sql_langid(),
        "text_repetition": _sql_text_repetition(3),
        "dedup_common_ngrams": _sql_common_ngrams(3, 5),
        "dedup_decontaminate": _sql_decontaminate(4, 17),
        "pii_stats": _sql_pii_stats(),
        "pii_redact": _sql_pii_redact(),
        "sample_hash_split": _sql_hash_split(),
        "sample_mixture": _sql_mixture_sample(),
        "pack_sequences": _sql_pack_sequences(256, 4),
        "pack_materialize": _sql_materialize_sequences(64, 4),
        "pack_materialize_bounds": _sql_materialize_sequences(64, 4, bounds=True),
        "sample_corpus_shuffle": _sql_corpus_shuffle(8),
        "sample_epoch_upsample": _sql_epoch_upsample(),
        "sample_weighted": _sql_weighted_sample(),
        "pack_materialize_ids": _sql_materialize_token_sequences(64, 4),
        "bpe_word_counts": "WITH " + TOKS + " SELECT term AS word, "
        "count(*)::BIGINT AS cnt FROM toks GROUP BY term",
        "bpe_encode_fixed": _sql_bpe_encode_fixed(),
        "dsir_scores": _sql_dsir_scores(),
        "dsir_top50": _sql_dsir_top50(),
        "lm_perplexity_nll": _sql_lm_nll(),
        "curate_pipeline": _sql_curate_pipeline(),
        "assemble_pipeline": _sql_assemble_pipeline(64, 4),
        "dedup_substring_spans": _sql_substring_spans(5, 2),
        "dedup_substring_strip": _sql_substring_strip(5, 2),
        "dedup_line_strip": _sql_line_strip(2),
        "dedup_cluster_reps": _sql_cluster_reps(0.8),
        "domain_stats": _sql_domain_stats(),
        "domain_cap": _sql_domain_cap(20),
        "domain_cap_approx": _sql_domain_cap_approx(20),
        "domain_blocklist": _sql_domain_blocklist("site3.example.com"),
        "text_fingerprint": "SELECT doc_id, substr(md5(array_to_string("
        "list_filter(string_split(lower(text), ' '), x -> x <> ''), ' ')), 1, 16) AS fp16 "
        "FROM documents",
        "multimodal_features": _sql_multimodal_features(),
        "engine_bm25_top10": _sql_engine_bm25_top10(),
        "engine_nl_bm25_top10": _sql_engine_bm25_top10(tokenizer="nl_nostem"),
        "engine_dirichlet_top10": _sql_engine_scored_top10("dirichlet"),
        "engine_jm_top10": _sql_engine_scored_top10("jm"),
        "engine_tfidf_top10": _sql_engine_scored_top10("tfidf"),
        "engine_f2exp_top10": _sql_engine_scored_top10("f2exp"),
        "engine_sd_top10": _sql_engine_sd_top10(),
        "engine_cascade_top10": _sql_engine_sd_top10(stage1_k=20),
        "engine_cascade_pruned_top10": _sql_engine_sd_top10(
            stage1_k=20, pruner="mean-max", pruner_param=0.6, prune_K=3
        ),
        "engine_xml_sd_top10": _sql_engine_sd_top10(),
        "ann_lsh_top5": _sql_ann_lsh_top5(),
        "ann_ivf_top5": _sql_ann_ivf_top5(),
        "engine_prf_top10": _sql_engine_prf_top10(),
        "engine_lce_top10": _sql_engine_prf_top10(method="lce"),
        "engine_sqe_top10": _sql_engine_sqe_top10(),
        "engine_wsd_top10": _sql_engine_sd_top10(model=_wsd_gate_model()),
        "ltr_features": _sql_ltr_features(),
        "ltr_model_scores": _sql_ltr_features(model_score=True),
        "ptc_queries": _sql_ptc_queries(),
        "bitext_pairs": _sql_bitext_pairs(),
    }
