"""Text-analysis operators over the ``documents`` table.

Token counting, quality scoring, heuristic language ID and content
fingerprinting — all pure JVM-side SQL expressions (codegen-friendly, no
UDFs), each with an exact DuckDB oracle.  Ratios are single divisions of
exact integers, so doubles hash-match across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# tiny per-language stopword lists for the heuristic language ID
_LANGS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "les", "des"],
}
_EN_STOP = _LANGS["en"] + ["in", "is", "it", "for", "on"]


def _view(spark: SparkSession, sf_dir: str) -> None:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )


_SPARK_TOK = "split(lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' ')"
_DUCK_TOK = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"


def _count_in(tokens_expr: str, words: list[str], dialect: str) -> str:
    """# of tokens that are in `words` (exact membership)."""
    lst = ", ".join(f"'{w}'" for w in words)
    if dialect == "spark":
        return (
            f"size(filter({tokens_expr}, t -> array_contains(array({lst}), t)))"
        )
    return f"len(list_filter({tokens_expr}, t -> list_contains([{lst}], t)))"


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics: counts are exact integers."""
    _view(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT doc_id,
               size({_SPARK_TOK}) AS n_tokens,
               length(text) AS text_len,
               size(array_distinct({_SPARK_TOK})) AS n_unique_tokens
        FROM documents
        """
    )


_TOKENS_ORACLE = f"""
SELECT doc_id,
       CAST(len({_DUCK_TOK}) AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS text_len,
       CAST(len(list_distinct({_DUCK_TOK})) AS INTEGER) AS n_unique_tokens
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: length, stopword ratio, type-token ratio."""
    _view(spark, sf_dir)
    stop = _count_in("tok", _EN_STOP, "spark")
    return spark.sql(
        f"""
        WITH t AS (SELECT doc_id, {_SPARK_TOK} AS tok FROM documents)
        SELECT doc_id,
               size(tok) AS n_tokens,
               CAST({stop} AS DOUBLE) / size(tok) AS stopword_ratio,
               CAST(size(array_distinct(tok)) AS DOUBLE) / size(tok)
                 AS type_token_ratio,
               size(tok) BETWEEN 20 AND 1000
                 AND CAST(size(array_distinct(tok)) AS DOUBLE) / size(tok) > 0.2
                 AS quality_pass
        FROM t WHERE size(tok) > 0
        """
    )


_QUALITY_ORACLE = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOK} AS tok FROM documents)
SELECT doc_id,
       CAST(len(tok) AS INTEGER) AS n_tokens,
       CAST({_count_in('tok', _EN_STOP, 'duck')} AS DOUBLE) / len(tok)
         AS stopword_ratio,
       CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok)
         AS type_token_ratio,
       len(tok) BETWEEN 20 AND 1000
         AND CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok) > 0.2
         AS quality_pass
FROM t WHERE len(tok) > 0
"""


def _langid_case(dialect: str) -> str:
    """Argmax over per-language stopword hits, deterministic tie-break by
    language-code order."""
    counts = {
        lang: _count_in("tok", words, dialect) for lang, words in _LANGS.items()
    }
    langs = sorted(_LANGS)  # de, en, es, fr — fixed tie-break order
    best = " , ".join(counts[lang] for lang in langs)
    clauses = []
    for lang in langs:
        others = [counts[o] for o in langs if o != lang]
        gt = " AND ".join(f"{counts[lang]} >= {o}" for o in others)
        clauses.append(f"WHEN {counts[lang]} > 0 AND {gt} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic n-gram/stopword language ID (deterministic argmax)."""
    _view(spark, sf_dir)
    return spark.sql(
        f"""
        WITH t AS (SELECT doc_id, lang, {_SPARK_TOK} AS tok FROM documents)
        SELECT doc_id, lang AS labeled_lang,
               {_langid_case('spark')} AS predicted_lang
        FROM t
        """
    )


_LANGID_ORACLE = f"""
WITH t AS (SELECT doc_id, lang, {_DUCK_TOK} AS tok FROM documents)
SELECT doc_id, lang AS labeled_lang,
       {_langid_case('duck')} AS predicted_lang
FROM t
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content + shingle fingerprints (md5 — identical across engines).

    content_fp  : digest of whitespace-normalized text
    shingle_fp  : digest of the sorted distinct 3-gram shingle set (robust
                  to token reordering at window granularity)
    """
    _view(spark, sf_dir)
    return spark.sql(
        f"""
        WITH t AS (SELECT doc_id, {_SPARK_TOK} AS tok, text FROM documents)
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))) AS content_fp,
               md5(concat_ws('|', array_sort(array_distinct(
                 CASE WHEN size(tok) >= 3 THEN transform(
                   sequence(1, size(tok) - 2),
                   i -> concat_ws(' ', element_at(tok, i),
                        element_at(tok, i + 1), element_at(tok, i + 2)))
                 ELSE array() END)))) AS shingle_fp
        FROM t
        """
    )


_FINGERPRINT_ORACLE = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOK} AS tok, text FROM documents)
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_fp,
       md5(array_to_string(list_sort(list_distinct(
         list_transform(generate_series(1, len(tok) - 2),
           i -> tok[i] || ' ' || tok[i + 1] || ' ' || tok[i + 2]))), '|'))
         AS shingle_fp
FROM t
"""


# ---------------------------------------------------------------------------
# Corpus bigram language model (add-one smoothed) scoring each document by
# its mean log2 bigram probability — the classic cheap quality/fluency
# filter for pretraining corpora (gibberish and boilerplate both score
# far from the corpus mode).
#
# Determinism: per-bigram log-probs are quantized to 1e-4 via
# FLOOR(log2(p) * 10000) BEFORE summation, so the per-document total is
# an exact BIGINT sum — associative, order-free, identical across engines
# and partitionings.  log2() implementations may differ in the last ulp
# between Spark (JVM) and DuckDB (libm), but a 1-ulp error ~1e-15 flips
# the floor only within ~1e-15 of a 1e-4 boundary — vanishing even at
# corpus scale.  p itself is a single correctly-rounded division of
# exact integer-valued doubles.
#
# Scale shape: the bigram explode is linear in token count; dbg
# (per-doc distinct bigram + count) pre-aggregates with map-side combine
# so the model join touches one row per distinct (doc, bigram), not per
# occurrence; cnt/uni are term-keyed shuffles with map-side combine; V
# is a scalar subquery (one count job, no join node).  Hot bigrams
# ("of the") skew the dbg-cnt join key — AQE skew-join splits them; both
# sides arrive pre-aggregated so no row explosion is possible.
# ---------------------------------------------------------------------------

_LM_SCALE = 10000


def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log2 bigram probability under the corpus LM."""
    _view(spark, sf_dir)
    return spark.sql(
        f"""
        WITH t AS (SELECT doc_id, {_SPARK_TOK} AS tok FROM documents),
        bg AS (
          SELECT doc_id, element_at(tok, i) AS w1,
                 element_at(tok, i + 1) AS w2
          FROM t LATERAL VIEW explode(sequence(1, size(tok) - 1)) s AS i
          WHERE size(tok) >= 2
        ),
        dbg AS (
          SELECT doc_id, w1, w2, COUNT(*) AS k
          FROM bg GROUP BY doc_id, w1, w2
        ),
        cnt AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
        uni AS (SELECT w1, COUNT(*) AS cu FROM bg GROUP BY w1),
        scored AS (
          SELECT d.doc_id, d.k,
                 CAST(FLOOR(log2(
                   CAST(cnt.c + 1 AS DOUBLE) /
                   CAST(uni.cu + (SELECT COUNT(DISTINCT w2) FROM cnt)
                        AS DOUBLE)) * {_LM_SCALE}) AS BIGINT) AS s
          FROM dbg d
          JOIN cnt ON d.w1 = cnt.w1 AND d.w2 = cnt.w2
          JOIN uni ON d.w1 = uni.w1
        )
        SELECT doc_id, SUM(k) AS n_bigrams, SUM(k * s) AS lp_sum_q,
               CAST(SUM(k * s) AS DOUBLE) / SUM(k) / {_LM_SCALE}
                 AS avg_log2_prob
        FROM scored GROUP BY doc_id
        """
    )


_BIGRAM_LM_ORACLE = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOK} AS tok FROM documents),
bg AS (
  SELECT doc_id, tok[i] AS w1, tok[i + 1] AS w2
  FROM t, unnest(generate_series(1, len(tok) - 1)) AS s(i)
  WHERE len(tok) >= 2
),
dbg AS (
  SELECT doc_id, w1, w2, COUNT(*) AS k FROM bg GROUP BY doc_id, w1, w2
),
cnt AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
uni AS (SELECT w1, COUNT(*) AS cu FROM bg GROUP BY w1),
scored AS (
  SELECT d.doc_id, d.k,
         CAST(FLOOR(log2(
           CAST(cnt.c + 1 AS DOUBLE) /
           CAST(uni.cu + (SELECT COUNT(DISTINCT w2) FROM cnt)
                AS DOUBLE)) * {_LM_SCALE}) AS BIGINT) AS s
  FROM dbg d
  JOIN cnt ON d.w1 = cnt.w1 AND d.w2 = cnt.w2
  JOIN uni ON d.w1 = uni.w1
)
SELECT doc_id, SUM(k) AS n_bigrams, SUM(k * s) AS lp_sum_q,
       CAST(SUM(k * s) AS DOUBLE) / SUM(k) / {_LM_SCALE} AS avg_log2_prob
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Token-distribution entropy: H = log2(n) - (1/n) * sum c_i*log2(c_i)
# over per-document token frequencies — near-zero for degenerate
# repetition, high for diverse text; the information-theoretic quality
# signal next to type-token ratio.  Same determinism treatment as the
# bigram LM: per-term log2 AND the final log2(n) are both quantized to
# 1e-4 (an unquantized closing log2(n) differed in the last ulp between
# JVM and libm), so every sum is an order-free BIGINT sum and the
# remaining double ops are scalar and engine-identical.  One doc-keyed shuffle with map-side combine.
# ---------------------------------------------------------------------------


def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token entropy (bits), quantized-log construction."""
    _view(spark, sf_dir)
    return spark.sql(
        f"""
        WITH tf AS (
          SELECT doc_id, term, COUNT(*) AS c
          FROM (SELECT doc_id, explode({_SPARK_TOK}) AS term
                FROM documents)
          GROUP BY doc_id, term
        )
        SELECT doc_id, SUM(c) AS n_tokens,
               SUM(c * CAST(FLOOR(log2(CAST(c AS DOUBLE)) * {_LM_SCALE})
                            AS BIGINT)) AS clogc_q,
               (CAST(CAST(FLOOR(log2(CAST(SUM(c) AS DOUBLE)) * {_LM_SCALE})
                     AS BIGINT) AS DOUBLE)
                 - CAST(SUM(c * CAST(FLOOR(log2(CAST(c AS DOUBLE))
                            * {_LM_SCALE}) AS BIGINT)) AS DOUBLE) / SUM(c))
                 / {_LM_SCALE} AS entropy_bits
        FROM tf GROUP BY doc_id
        """
    )


_ENTROPY_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS c
  FROM (SELECT doc_id, unnest({_DUCK_TOK}) AS term FROM documents)
  GROUP BY doc_id, term
)
SELECT doc_id, SUM(c) AS n_tokens,
       SUM(c * CAST(FLOOR(log2(CAST(c AS DOUBLE)) * {_LM_SCALE})
                    AS BIGINT)) AS clogc_q,
       (CAST(CAST(FLOOR(log2(CAST(SUM(c) AS DOUBLE)) * {_LM_SCALE})
             AS BIGINT) AS DOUBLE)
         - CAST(SUM(c * CAST(FLOOR(log2(CAST(c AS DOUBLE))
                    * {_LM_SCALE}) AS BIGINT)) AS DOUBLE) / SUM(c))
         / {_LM_SCALE} AS entropy_bits
FROM tf GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization: GPT-2-style piece splitting (letter runs,
# digit runs, punctuation runs) — the pre-tokenizer pass every BPE
# vocabulary trains over.  The pattern stays in the Java/RE2 common
# subset (character classes + alternation, no lookaround), so Spark and
# DuckDB produce the identical piece sequence; all outputs are exact
# integer counts plus one ratio division.  Pure scan-side expression —
# no shuffle, no UDF.
# ---------------------------------------------------------------------------

_BPE_RE_SPARK = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]+"
_BPE_RE_DUCK = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piece statistics under BPE-style regex pre-tokenization."""
    _view(spark, sf_dir)
    return spark.sql(
        f"""
        WITH p AS (
          SELECT doc_id,
                 regexp_extract_all(text, '{_BPE_RE_SPARK}', 0) AS pieces,
                 size({_SPARK_TOK}) AS n_words
          FROM documents
        )
        SELECT doc_id,
               size(pieces) AS n_pieces,
               size(filter(pieces, x -> x RLIKE '^[A-Za-z]+$')) AS n_alpha,
               size(filter(pieces, x -> x RLIKE '^[0-9]+$')) AS n_num,
               size(filter(pieces,
                    x -> NOT x RLIKE '^[A-Za-z0-9]')) AS n_punct,
               CAST(size(pieces) AS DOUBLE) / n_words AS pieces_per_word
        FROM p WHERE n_words > 0
        """
    )


_TOKENS_BPE_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
         regexp_extract_all(text, '{_BPE_RE_DUCK}') AS pieces,
         len({_DUCK_TOK}) AS n_words
  FROM documents
)
SELECT doc_id,
       CAST(len(pieces) AS INTEGER) AS n_pieces,
       CAST(len(list_filter(pieces, x -> regexp_matches(x, '^[A-Za-z]+$')))
            AS INTEGER) AS n_alpha,
       CAST(len(list_filter(pieces, x -> regexp_matches(x, '^[0-9]+$')))
            AS INTEGER) AS n_num,
       CAST(len(list_filter(pieces,
            x -> NOT regexp_matches(x, '^[A-Za-z0-9]')))
            AS INTEGER) AS n_punct,
       CAST(len(pieces) AS DOUBLE) / n_words AS pieces_per_word
FROM p WHERE n_words > 0
"""


TFIDF_TOP_K = 5


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K salient terms per document by tf-idf.

    The idf factor is the exact rational ``(N+1)/(df+1)`` rather than
    its logarithm: log is monotone, so the per-document RANKING is
    identical, and every arithmetic step (int->double cast, one
    multiply, one divide) is a correctly-rounded IEEE op — bit-equal
    across engines, where ln() implementations may differ in the last
    ulp and flip near-tie ranks.

    Scale shape: tf is one doc-keyed shuffle with map-side combine; df
    is term-keyed with map-side combine; N is a scalar subquery (one
    count job, no join node — a 1-row CROSS JOIN would plan a
    BroadcastNestedLoopJoin); the rank window lowers to
    WindowGroupLimit (per-partition top-K before the merge), so no
    full per-doc term lists ever gather."""
    _view(spark, sf_dir)
    return spark.sql(
        f"""
        WITH tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM (SELECT doc_id, explode({_SPARK_TOK}) AS term
                FROM documents)
          GROUP BY doc_id, term
        ),
        df AS (
          SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
        ),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 (CAST(tf.tf AS DOUBLE) *
                  CAST((SELECT COUNT(*) + 1 FROM documents) AS DOUBLE))
                   / CAST(df.df + 1 AS DOUBLE) AS score
          FROM tf JOIN df ON tf.term = df.term
        )
        SELECT doc_id, CAST(rank AS INT) AS rank, term, score
        FROM (
          SELECT doc_id, term, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, term) AS rank
          FROM scored
        )
        WHERE rank <= {TFIDF_TOP_K}
        """
    )


_TFIDF_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_DUCK_TOK}) AS term FROM documents)
  GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         (CAST(tf.tf AS DOUBLE) *
          CAST((SELECT COUNT(*) + 1 FROM documents) AS DOUBLE))
           / CAST(df.df + 1 AS DOUBLE) AS score
  FROM tf JOIN df ON tf.term = df.term
)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score
FROM (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rank
  FROM scored
)
WHERE rank <= {TFIDF_TOP_K}
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_entropy": text_entropy,
        "text_tokens_bpe": text_tokens_bpe,
        "text_bigram_lm": text_bigram_lm,
        "text_tfidf": text_tfidf,
        "text_tokens": text_tokens,
        "text_quality": text_quality,
        "text_lang_id": text_lang_id,
        "text_fingerprint": text_fingerprint,
    }


def oracles() -> dict[str, str]:
    return {
        "text_entropy": _ENTROPY_ORACLE,
        "text_tokens_bpe": _TOKENS_BPE_ORACLE,
        "text_bigram_lm": _BIGRAM_LM_ORACLE,
        "text_tfidf": _TFIDF_ORACLE,
        "text_tokens": _TOKENS_ORACLE,
        "text_quality": _QUALITY_ORACLE,
        "text_lang_id": _LANGID_ORACLE,
        "text_fingerprint": _FINGERPRINT_ORACLE,
    }
