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

from ivory_spark.ops import dedup as D
from ivory_spark.ops import ir_relational as IR
from ivory_spark.ops import similarity as SIM
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


def _sql_minhash_pairs(threshold: float = 0.8) -> str:
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
    return f"""
WITH {TOKS}, {_DW},
sigs AS (SELECT doc_id, {sig_cols} FROM dw GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         WHERE a.doc_id < b.doc_id),
nw AS (SELECT doc_id, count(*) AS n FROM dw GROUP BY doc_id),
iw AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
       FROM cand c JOIN dw wa ON wa.doc_id = c.doc_a
       JOIN dw wb ON wb.doc_id = c.doc_b AND wb.term = wa.term
       GROUP BY c.doc_a, c.doc_b)
SELECT c.doc_a, c.doc_b,
       round(coalesce(iw.inter, 0) / (na.n + nb.n - coalesce(iw.inter, 0)), 6) AS jaccard
FROM cand c
LEFT JOIN iw ON iw.doc_a = c.doc_a AND iw.doc_b = c.doc_b
JOIN nw na ON na.doc_id = c.doc_a
JOIN nw nb ON nb.doc_id = c.doc_b
WHERE round(coalesce(iw.inter, 0) / (na.n + nb.n - coalesce(iw.inter, 0)), 6) >= {threshold}
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


def _engine_bm25_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real engine end-to-end: build (or resume) the float32 index
    over documents-as-corpus, then block-max WAND top-10."""
    from ivory_spark.index.build import IndexConfig, build_index
    from ivory_spark.index.reader import open_index
    from ivory_spark.query.wand import bm25_topk_wand

    corpus = documents_as_corpus(spark, sf_dir)
    tag = sf_dir.strip("/").replace("/", "_")
    work = os.path.join(tempfile.gettempdir(), f"ivory_engine_{tag}")
    corpus_path = os.path.join(work, "corpus.parquet")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus.write.mode("overwrite").parquet(corpus_path)
    root = os.path.join(work, "index")
    build_index(spark, corpus_path, root, IndexConfig())
    index = open_index(spark, root)
    return bm25_topk_wand(spark, index, IR.GATE_QUERIES, k=10)


def _engine_sd_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-dependence MRF (term + #od1 + #uw8 features) over a
    positional index — the engine-native SD model (rows-only check here;
    bit-exact golden tests in tests/test_mrf.py)."""
    from ivory_spark.index.build import IndexConfig, build_index
    from ivory_spark.index.reader import open_index
    from ivory_spark.query.mrf import MrfModel, mrf_topk

    corpus = documents_as_corpus(spark, sf_dir)
    tag = sf_dir.strip("/").replace("/", "_")
    work = os.path.join(tempfile.gettempdir(), f"ivory_engine_{tag}")
    corpus_path = os.path.join(work, "corpus.parquet")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus.write.mode("overwrite").parquet(corpus_path)
    root = os.path.join(work, "index_pos")
    build_index(spark, corpus_path, root, IndexConfig(positional=True))
    index = open_index(spark, root)
    return mrf_topk(spark, index, IR.GATE_QUERIES, MrfModel(dependence="sd"))


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ivory_spark.ops.multimodal import decode_features, synthesize_media

    return decode_features(synthesize_media(spark, _docs(spark, sf_dir)))


def _engine_prf_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback expansion + weighted retrieval (MRFExpander
    analogue; rows-only — bit-exact goldens in tests/test_expansion.py)."""
    from ivory_spark.index.build import IndexConfig, build_index
    from ivory_spark.index.reader import open_index
    from ivory_spark.query.exact import bm25_topk
    from ivory_spark.query.expander import expand_queries

    corpus = documents_as_corpus(spark, sf_dir)
    tag = sf_dir.strip("/").replace("/", "_")
    work = os.path.join(tempfile.gettempdir(), f"ivory_engine_{tag}")
    corpus_path = os.path.join(work, "corpus.parquet")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus.write.mode("overwrite").parquet(corpus_path)
    root = os.path.join(work, "index")
    build_index(spark, corpus_path, root, IndexConfig())
    index = open_index(spark, root)
    wq = expand_queries(spark, index, IR.GATE_QUERIES, fb_docs=5, fb_terms=8)
    return bm25_topk(spark, index, wq, k=10, weighted=True)


def _ann_queries(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    return emb, SIM.query_vectors(spark, emb, n=10)


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
        "dedup_simhash": lambda s, d: D.simhash(_docs(s, d)),
        "dedup_simhash_pairs": lambda s, d: D.simhash_pairs(D.simhash(_docs(s, d)), max_hamming=2),
        "dedup_ngram_jaccard": lambda s, d: D.ngram_jaccard_pairs(_docs(s, d), threshold=0.5),
        "dedup_embedding_cosine": lambda s, d: D.embedding_neardup_pairs(
            read_table(s, d, "embeddings"), threshold=0.3
        ),
        # --- similarity search -------------------------------------------
        "ann_cosine_top5": lambda s, d: SIM.brute_force_topk(*_ann_queries(s, d), k=5),
        "ann_lsh_top5": lambda s, d: SIM.lsh_bucketed_topk(*_ann_queries(s, d), k=5),
        # --- text analysis ------------------------------------------------
        "text_token_count": lambda s, d: TS.token_count(_docs(s, d)),
        "text_quality": lambda s, d: TS.quality_score(_docs(s, d)),
        "text_langid": lambda s, d: TS.langid(_docs(s, d)),
        "text_fingerprint": lambda s, d: TS.fingerprint(_docs(s, d)),
        # --- engine-native (float32 kernels; pytest-verified, rows-only here)
        "engine_bm25_top10": _engine_bm25_top10,
        "engine_sd_top10": _engine_sd_top10,
        "engine_prf_top10": _engine_prf_top10,
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
        "text_langid": _sql_langid(),
        "text_fingerprint": "SELECT doc_id, substr(md5(array_to_string("
        "list_filter(string_split(lower(text), ' '), x -> x <> ''), ' ')), 1, 16) AS fp16 "
        "FROM documents",
    }
