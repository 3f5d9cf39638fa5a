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
from functools import lru_cache

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


def _positions_from_tokens(tokens: list[str]) -> dict[str, list[int]]:
    """term -> 1-based positions over a token stream; tf-overflow terms
    dropped (DocumentProcessingUtils.java:42,102-113)."""
    pos: dict[str, list[int]] = defaultdict(list)
    for i, t in enumerate(tokens, start=1):
        pos[t].append(i)
    return {t: p for t, p in pos.items() if len(p) <= MAX_TF}


def term_positions_py(content: str) -> dict[str, list[int]]:
    """term -> 1-based positions; tf-overflow terms dropped."""
    return _positions_from_tokens(tokenize_py(content))


def doclen_py(content: str) -> int:
    return sum(len(p) for p in term_positions_py(content).values())


def tokens_expr(content: Column) -> Column:
    """JVM-side token array (codegen; no Python)."""
    toks = F.regexp_extract_all(F.lower(content), F.lit(TOKEN_PATTERN), 0)
    return F.filter(toks, lambda t: F.length(t) <= MAX_TOKEN_LEN)


def _jvm_doc_terms(expr_fn, positional: bool):
    """(docno, term, tf[, positions]) builder for fully-JVM token
    expressions — the map phase of BuildTermDocVectors re-expressed as
    (pos)explode + groupBy; Catalyst supplies partial aggregation."""

    def build(df: DataFrame, docno: str = "docno", content: str = "content") -> DataFrame:
        from ivory_spark.functions.gmap import spread_partitions

        # a small corpus parquet is often one unsplittable row group, so
        # the regexp tokenize + explode (the map side of the groupBy)
        # would run in 1-3 tasks regardless of cores; no-op at scale
        df = spread_partitions(df)
        if not positional:
            toks = df.select(F.col(docno), F.explode(expr_fn(F.col(content))).alias("term"))
            tf = toks.groupBy(docno, "term").agg(F.count(F.lit(1)).cast("int").alias("tf"))
            return tf.filter(F.col("tf") <= MAX_TF)
        toks = df.select(
            F.col(docno), F.posexplode(expr_fn(F.col(content))).alias("pos0", "term")
        )
        grouped = toks.groupBy(docno, "term").agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.sort_array(F.collect_list((F.col("pos0") + 1).cast("int"))).alias("positions"),
        )
        return grouped.filter(F.col("tf") <= MAX_TF)

    return build


# public single-tokenizer forms (code_v1); positional = 1-based positions
# over the token stream (DocumentProcessingUtils.java:84-92)
doc_terms = _jvm_doc_terms(tokens_expr, positional=False)
doc_terms_positional = _jvm_doc_terms(tokens_expr, positional=True)


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


# ---------------------------------------------------------------------------
# galago_en: natural-language analysis chain — split on non-alphanumeric,
# stopword removal, Porter stemming — the analogue of Ivory's default
# English path (ivory/core/tokenize/GalagoTokenizer.java:33-777 stoplist,
# :788-832 stemming; reproduced, not copied). Positions are assigned over
# the post-stopword, post-stem token stream, as the reference's
# processContent output feeds DocumentProcessingUtils.
#
# Stemming is not a JVM column expression, so galago_en's build path is an
# Arrow-batched mapInPandas (the documented Python-UDF path); the code_v1
# tokenizer keeps the pure-JVM codegen path.
# ---------------------------------------------------------------------------

GALAGO_TOKEN_PATTERN = r"[a-z0-9]+"
_GRX = re.compile(GALAGO_TOKEN_PATTERN)


# Stem memoization: the reference tokenizer keeps a stem cache so each
# distinct surface form is stemmed once per JVM
# (ivory/core/tokenize/GalagoTokenizer.java:788-832). Same here, per
# Python worker process: Zipf makes distinct terms a tiny fraction of
# occurrences, so a 256k-entry LRU turns stemming from per-occurrence to
# per-distinct-term work.
@lru_cache(maxsize=1 << 18)
def _stem_en(token: str) -> str:
    from ivory_spark.functions.stemmer import porter_stem

    return porter_stem(token)


@lru_cache(maxsize=1 << 18)
def _stem_de(token: str) -> str:
    from ivory_spark.functions.stemmer_de import german_stem

    return german_stem(token)


def galago_tokenize_py(content: str) -> list[str]:
    from ivory_spark.functions.stopwords import STOPWORDS_EN

    if not content:
        return []
    return [
        _stem_en(t)
        for t in _GRX.findall(content.lower())
        if len(t) <= MAX_TOKEN_LEN and t not in STOPWORDS_EN
    ]


def galago_term_positions_py(content: str) -> dict[str, list[int]]:
    return _positions_from_tokens(galago_tokenize_py(content))


# German chain: umlaut-aware word split, German stoplist, Snowball German
# stemmer — the analogue of the reference's German analysis chain
# (ivory/core/tokenize multilingual tokenizer family).
GALAGO_DE_PATTERN = r"[a-zäöüß0-9]+"
_GRX_DE = re.compile(GALAGO_DE_PATTERN)


def galago_de_tokenize_py(content: str) -> list[str]:
    from ivory_spark.functions.stopwords import STOPWORDS_DE

    if not content:
        return []
    return [
        _stem_de(t)
        for t in _GRX_DE.findall(content.lower())
        if len(t) <= MAX_TOKEN_LEN and t not in STOPWORDS_DE
    ]


# ---------------------------------------------------------------------------
# nl_nostem: stoplisted natural-language tokenization WITHOUT stemming —
# the stem-free slice of the GalagoTokenizer chain. Fully JVM-side
# (regexp + filter + isin; no Python UDF in the build), and every step is
# ANSI-SQL-expressible, so this chain gets a hash-verified DuckDB gate
# (engine_nl_bm25_top10) where the stemmed chains can only be pytest-
# verified. Use it when index-build throughput matters more than
# inflection folding.
# ---------------------------------------------------------------------------


def nl_tokens_expr(content: Column) -> Column:
    from ivory_spark.functions.stopwords import STOPWORDS_EN

    sw = sorted(STOPWORDS_EN)
    toks = F.regexp_extract_all(F.lower(content), F.lit(GALAGO_TOKEN_PATTERN), 0)
    return F.filter(
        toks, lambda t: (F.length(t) <= MAX_TOKEN_LEN) & ~t.isin(*sw)
    )


def nl_nostem_tokenize_py(content: str) -> list[str]:
    from ivory_spark.functions.stopwords import STOPWORDS_EN

    if not content:
        return []
    return [
        t
        for t in _GRX.findall(content.lower())
        if len(t) <= MAX_TOKEN_LEN and t not in STOPWORDS_EN
    ]


# ---------------------------------------------------------------------------
# lucene_cs / lucene_ar: the reference's cs and ar analysis chains
# (TokenizerFactory.java:15-100 — cs via a Lucene analyzer + CzechStemmer,
# ar via LuceneArabicAnalyzer = normalization + light10 stem), re-expressed
# as published-algorithm Python chains (stemmer_cs.py, stemmer_ar.py).
# ---------------------------------------------------------------------------

GALAGO_CS_PATTERN = r"[a-záčďéěíňóřšťúůýž0-9]+"
_GRX_CS = re.compile(GALAGO_CS_PATTERN)
# Arabic letters (hamza..ya incl. extended) + latin/digits fallback
_GRX_AR = re.compile(r"[ء-غف-يٱa-z0-9]+")


GALAGO_ES_PATTERN = r"[a-záéíóúüñ0-9]+"
_GRX_ES = re.compile(GALAGO_ES_PATTERN)


@lru_cache(maxsize=1 << 18)
def _stem_es(token: str) -> str:
    from ivory_spark.functions.stemmer_es import spanish_stem

    return spanish_stem(token)


def lucene_es_tokenize_py(content: str) -> list[str]:
    from ivory_spark.functions.stopwords import STOPWORDS_ES

    if not content:
        return []
    return [
        _stem_es(t)
        for t in _GRX_ES.findall(content.lower())
        if len(t) <= MAX_TOKEN_LEN and t not in STOPWORDS_ES
    ]


GALAGO_FR_PATTERN = r"[a-zàâçëéêèïîôûùüœ0-9]+"
_GRX_FR = re.compile(GALAGO_FR_PATTERN)


@lru_cache(maxsize=1 << 18)
def _stem_fr(token: str) -> str:
    from ivory_spark.functions.stemmer_fr import french_stem

    return french_stem(token)


def lucene_fr_tokenize_py(content: str) -> list[str]:
    from ivory_spark.functions.stopwords import STOPWORDS_FR

    if not content:
        return []
    return [
        _stem_fr(t)
        for t in _GRX_FR.findall(content.lower())
        if len(t) <= MAX_TOKEN_LEN and t not in STOPWORDS_FR
    ]


# lucene_tr: the reference's tr chain via Lucene's TurkishAnalyzer =
# Turkish case folding (dotted/dotless i: I->ı, İ->i — plain lower()
# is WRONG for Turkish), apostrophe-suffix removal (zürih'e -> zürih),
# stoplist, then stemming. DOCUMENTED SUBSTITUTION: instead of the
# Snowball Turkish stemmer (whose full vowel-harmony rule tables we do
# not reproduce), stemming is the published fixed-prefix F5 truncation
# (Can et al., "Information retrieval on Turkish texts", JASIST 2008 —
# shown competitive with lemmatizer-based stemming for Turkish IR).
_TR_FOLD = str.maketrans({"I": "ı", "İ": "i"})
GALAGO_TR_PATTERN = r"[a-zçğıöşü0-9]+(?:'[a-zçğıöşü0-9]+)?"
_GRX_TR = re.compile(GALAGO_TR_PATTERN)
_TR_PREFIX = 5


def turkish_fold(text: str) -> str:
    return text.translate(_TR_FOLD).lower()


def lucene_tr_tokenize_py(content: str) -> list[str]:
    from ivory_spark.functions.stopwords import STOPWORDS_TR

    if not content:
        return []
    out = []
    for t in _GRX_TR.findall(turkish_fold(content)):
        t = t.split("'", 1)[0]  # drop apostrophe suffix (zürih'e -> zürih)
        if not t or len(t) > MAX_TOKEN_LEN or t in STOPWORDS_TR:
            continue
        out.append(t[:_TR_PREFIX])
    return out


@lru_cache(maxsize=1 << 18)
def _stem_cs(token: str) -> str:
    from ivory_spark.functions.stemmer_cs import czech_stem

    return czech_stem(token)


@lru_cache(maxsize=1 << 18)
def _stem_ar(token: str) -> str:
    from ivory_spark.functions.stemmer_ar import arabic_light

    return arabic_light(token)


def lucene_cs_tokenize_py(content: str) -> list[str]:
    from ivory_spark.functions.stopwords import STOPWORDS_CS

    if not content:
        return []
    return [
        _stem_cs(t)
        for t in _GRX_CS.findall(content.lower())
        if len(t) <= MAX_TOKEN_LEN and t not in STOPWORDS_CS
    ]


def lucene_ar_tokenize_py(content: str) -> list[str]:
    """Stopword removal happens on the SURFACE form, before
    normalization/stemming (LuceneArabicAnalyzer.java:70-78 order)."""
    from ivory_spark.functions.stopwords import STOPWORDS_AR

    if not content:
        return []
    out = []
    for t in _GRX_AR.findall(content.lower()):
        if len(t) > MAX_TOKEN_LEN or t in STOPWORDS_AR:
            continue
        s = _stem_ar(t)
        if s:
            out.append(s)
    return out


def _python_doc_terms(tokenize_fn, positional: bool):
    """mapInPandas (docno, term, tf[, positions]) builder for tokenizers
    that need Python (stemming). One Arrow batch is the unit of work;
    emitting aggregated rows directly avoids the explode+groupBy shuffle
    the JVM path needs."""

    def build(df: DataFrame, docno: str = "docno", content: str = "content") -> DataFrame:
        schema = f"{docno} long, term string, tf int" + (
            ", positions array<int>" if positional else ""
        )

        def gen(batches):
            for pdf in batches:
                d_out, t_out, tf_out, p_out = [], [], [], []
                for dn, c in zip(pdf[docno], pdf[content]):
                    tp = _positions_from_tokens(tokenize_fn(c or ""))
                    for t, p in sorted(tp.items()):
                        d_out.append(dn)
                        t_out.append(t)
                        tf_out.append(len(p))
                        if positional:
                            p_out.append(p)
                data = {docno: pd.Series(d_out, dtype="int64"),
                        "term": pd.Series(t_out, dtype="object"),
                        "tf": pd.Series(tf_out, dtype="int32")}
                if positional:
                    data["positions"] = pd.Series(p_out, dtype="object")
                yield pd.DataFrame(data)

        from ivory_spark.functions.gmap import spread_partitions

        # spread scan-bound inputs so the Python tokenizer runs on every
        # core, not one unsplittable row group's task (no-op at scale)
        return spread_partitions(df.select(docno, content)).mapInPandas(
            gen, schema=schema
        )

    return build


class TokenizerSpec:
    """Registry entry: shared tokenize_py (query side + oracle) and the
    Spark-side (docno, term, tf[, positions]) builders (index side).
    The extension point IndexConfig.tokenizer selects from TOKENIZERS —
    the analogue of Ivory's tokenizer class option
    (app/PreprocessCollection.java tokenizer_class)."""

    def __init__(self, name, tokenize_py_fn, doc_terms_fn, doc_terms_positional_fn):
        self.name = name
        self.tokenize_py = tokenize_py_fn
        self.doc_terms = doc_terms_fn
        self.doc_terms_positional = doc_terms_positional_fn


TOKENIZERS: dict[str, TokenizerSpec] = {}


def register_tokenizer(spec: TokenizerSpec) -> None:
    TOKENIZERS[spec.name] = spec


def get_tokenizer(name: str) -> TokenizerSpec:
    if name not in TOKENIZERS:
        raise ValueError(f"unknown tokenizer '{name}' (have: {sorted(TOKENIZERS)})")
    return TOKENIZERS[name]


# ---------------------------------------------------------------------------
# cjk_bigram: multilingual path for unsegmented CJK scripts — latin/digit
# runs tokenize as words, CJK runs emit overlapping character bigrams (the
# standard Lucene-CJKAnalyzer strategy Ivory uses for its Chinese corpora,
# ivory/core/tokenize/*Tokenizer.java multilingual family; reproduced
# behavior). Single isolated CJK chars emit as unigrams so they remain
# searchable.
# ---------------------------------------------------------------------------

# letter ranges only: U+3000-303F (ideographic space + CJK punctuation
# like 。、「」) is deliberately EXCLUDED so punctuation breaks bigram
# runs instead of entering them (the analyzer treats it as a separator)
_CJK_RANGES = (
    (0x2E80, 0x2FFF),   # CJK radicals
    (0x3005, 0x3007),   # 々 iteration mark, 〆, 〇 (letter-class, e.g. 人々)
    (0x303B, 0x303C),   # 〻 vertical iteration mark, 〼 masu mark
    (0x3040, 0x30FA),   # hiragana + katakana letters
    (0x30FC, 0x30FF),   # prolonged sound mark + digraphs (letters)
    (0x3400, 0x4DBF),   # CJK ext A
    (0x4E00, 0x9FFF),   # CJK unified
    (0xF900, 0xFAFF),   # CJK compat
    (0xAC00, 0xD7AF),   # hangul syllables
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


_LATIN_RX = re.compile(r"[a-z0-9]+")


def cjk_bigram_tokenize_py(content: str) -> list[str]:
    if not content:
        return []
    out: list[str] = []
    run: list[str] = []  # current CJK run

    def flush():
        if len(run) == 1:
            out.append(run[0])
        else:
            out.extend(run[i] + run[i + 1] for i in range(len(run) - 1))
        run.clear()

    buf: list[str] = []  # current latin run
    for ch in content.lower():
        if _is_cjk(ch):
            if buf:
                out.extend(t for t in _LATIN_RX.findall("".join(buf)))
                buf.clear()
            run.append(ch)
        else:
            if run:
                flush()
            buf.append(ch)
    if run:
        flush()
    if buf:
        out.extend(_LATIN_RX.findall("".join(buf)))
    return [t for t in out if len(t) <= MAX_TOKEN_LEN]


def zh_dict_tokenize_py(content: str) -> list[str]:
    """Dictionary-segmented Chinese: CJK runs are segmented by greedy
    forward maximum matching over the embedded lexicon (the documented
    Stanford-segmenter substitution, functions/segment_zh.py; reference:
    TokenizerFactory.java zh -> StanfordChineseTokenizer); latin/digit
    runs tokenize as words, punctuation breaks runs — identical run
    splitting to cjk_bigram, so only the CJK-run treatment differs."""
    from ivory_spark.functions.segment_zh import segment_zh

    if not content:
        return []
    out: list[str] = []
    run: list[str] = []
    buf: list[str] = []
    for ch in content.lower():
        if _is_cjk(ch):
            if buf:
                out.extend(_LATIN_RX.findall("".join(buf)))
                buf.clear()
            run.append(ch)
        else:
            if run:
                out.extend(segment_zh("".join(run)))
                run.clear()
            buf.append(ch)
    if run:
        out.extend(segment_zh("".join(run)))
    if buf:
        out.extend(_LATIN_RX.findall("".join(buf)))
    return [t for t in out if len(t) <= MAX_TOKEN_LEN]


register_tokenizer(TokenizerSpec("code_v1", tokenize_py, doc_terms, doc_terms_positional))
register_tokenizer(
    TokenizerSpec(
        "galago_en",
        galago_tokenize_py,
        _python_doc_terms(galago_tokenize_py, positional=False),
        _python_doc_terms(galago_tokenize_py, positional=True),
    )
)
register_tokenizer(
    TokenizerSpec(
        "galago_de",
        galago_de_tokenize_py,
        _python_doc_terms(galago_de_tokenize_py, positional=False),
        _python_doc_terms(galago_de_tokenize_py, positional=True),
    )
)
register_tokenizer(
    TokenizerSpec(
        "cjk_bigram",
        cjk_bigram_tokenize_py,
        _python_doc_terms(cjk_bigram_tokenize_py, positional=False),
        _python_doc_terms(cjk_bigram_tokenize_py, positional=True),
    )
)
register_tokenizer(
    TokenizerSpec(
        "zh_dict",
        zh_dict_tokenize_py,
        _python_doc_terms(zh_dict_tokenize_py, positional=False),
        _python_doc_terms(zh_dict_tokenize_py, positional=True),
    )
)
register_tokenizer(
    TokenizerSpec(
        "nl_nostem",
        nl_nostem_tokenize_py,
        _jvm_doc_terms(nl_tokens_expr, positional=False),
        _jvm_doc_terms(nl_tokens_expr, positional=True),
    )
)
register_tokenizer(
    TokenizerSpec(
        "lucene_cs",
        lucene_cs_tokenize_py,
        _python_doc_terms(lucene_cs_tokenize_py, positional=False),
        _python_doc_terms(lucene_cs_tokenize_py, positional=True),
    )
)
register_tokenizer(
    TokenizerSpec(
        "lucene_ar",
        lucene_ar_tokenize_py,
        _python_doc_terms(lucene_ar_tokenize_py, positional=False),
        _python_doc_terms(lucene_ar_tokenize_py, positional=True),
    )
)
register_tokenizer(
    TokenizerSpec(
        "lucene_es",
        lucene_es_tokenize_py,
        _python_doc_terms(lucene_es_tokenize_py, positional=False),
        _python_doc_terms(lucene_es_tokenize_py, positional=True),
    )
)
register_tokenizer(
    TokenizerSpec(
        "lucene_tr",
        lucene_tr_tokenize_py,
        _python_doc_terms(lucene_tr_tokenize_py, positional=False),
        _python_doc_terms(lucene_tr_tokenize_py, positional=True),
    )
)
register_tokenizer(
    TokenizerSpec(
        "lucene_fr",
        lucene_fr_tokenize_py,
        _python_doc_terms(lucene_fr_tokenize_py, positional=False),
        _python_doc_terms(lucene_fr_tokenize_py, positional=True),
    )
)
