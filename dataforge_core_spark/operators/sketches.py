"""Mergeable distinct-count sketches over the ``documents`` table.

KMV ("k minimum values" / bottom-k) sketches: keep the K smallest hash
values of a set; the K-th smallest order statistic estimates the
distinct count as (K-1) * |hash space| / h_K.  Unlike HLL-family
sketches, a bottom-k sketch built from a FIXED deterministic hash is
bit-reproducible on any engine — every value here is an exact integer
the DuckDB oracle reproduces, so the lane gets the full value-hash
correctness gate, not a tolerance check.

The operational point at 100 TB is MERGEABILITY: per-partition (here
per-source) sketches are tiny (K bigints) and union+re-truncate to the
corpus-level sketch without rescanning — the merged ``__all__`` row in
this lane is computed exactly that way (bottom-K of the union of the
per-source bottom-Ks), demonstrating in-plan that the merge IS the
global sketch.  The classic reference is Bar-Yossef et al., "Counting
distinct elements in a data stream" (RANDOM 2002); DataSketches' theta
sketch is the production descendant.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

KMV_K = 64
# 56-bit hash space (14 hex chars of md5 -> BIGINT), the same
# engine-portable construction as the dedup shingle hash (dedup._SPARK_H)
_HSPACE = 1 << 56


def _kmv_sql(dialect: str) -> str:
    k = KMV_K
    # The sketched universe is the 3-gram SHINGLE set (the near-dup
    # pipeline's unit), not single tokens: the synthetic corpus draws
    # from a ~31-word pool, so a token-level sketch would sit in the
    # exact (n < K) branch everywhere and never exercise the order-
    # statistic estimator; shingle cardinality is in the thousands at
    # every SF, so both branches run and err_ppm is a live signal.
    if dialect == "spark":
        toks = (
            "SELECT DISTINCT source, "
            "CAST(conv(substr(md5(sh), 1, 14), 16, 10) AS BIGINT) AS h "
            "FROM (SELECT source, "
            "array_join(slice(tok, i, 3), ' ') AS sh "
            "FROM (SELECT source, split(lower(trim("
            "regexp_replace(text, '\\\\s+', ' '))), ' ') AS tok "
            "FROM documents) "
            "LATERAL VIEW explode(sequence(1, size(tok) - 2)) s AS i "
            "WHERE size(tok) >= 3)"
        )
        idiv = "DIV"
    else:
        toks = (
            "SELECT DISTINCT source, "
            "('0x' || substr(md5(sh), 1, 14))::BIGINT AS h "
            "FROM (SELECT source, "
            "array_to_string(list_slice(tok, i, i + 2), ' ') AS sh "
            "FROM (SELECT source, string_split(lower(trim("
            "regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS tok "
            "FROM documents), "
            "unnest(generate_series(1, len(tok) - 2)) AS s(i) "
            "WHERE len(tok) >= 3)"
        )
        idiv = "//"
    # When a scope holds fewer than K distinct hashes the sketch IS the
    # set and the estimate is exact (n_kept); otherwise the order
    # statistic h_K estimates (K-1) * 2^56 / h_K.  (K-1) * 2^56 < 2^62:
    # no int64 overflow.  GREATEST(h_k, 1) guards the measure-zero
    # h_K = 0 hash.
    est = (
        f"CASE WHEN n_kept < {k} THEN n_kept "
        f"ELSE CAST(({k - 1} * {_HSPACE}) {idiv} GREATEST(h_k, 1) "
        f"AS BIGINT) END"
    )
    return f"""
WITH toks AS ({toks}),
exact AS (SELECT source, COUNT(*) AS n_exact FROM toks GROUP BY source),
ranked AS (
  SELECT source, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM toks
),
bk AS (SELECT source, h FROM ranked WHERE rn <= {k}),
per_source AS (
  SELECT b.source, e.n_exact,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         MAX(b.h) AS h_k
  FROM bk b JOIN exact e ON b.source = e.source
  GROUP BY b.source, e.n_exact
),
merged_candidates AS (SELECT DISTINCT h FROM bk),
merged_ranked AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM merged_candidates
),
merged AS (
  SELECT '__all__' AS source,
         (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) FROM toks) AS n_exact,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         MAX(h) AS h_k
  FROM merged_ranked WHERE rn <= {k}
),
scoped AS (
  SELECT * FROM per_source UNION ALL SELECT * FROM merged
)
SELECT source AS scope, CAST(n_exact AS BIGINT) AS n_exact,
       CAST({est} AS BIGINT) AS kmv_est,
       CAST((1000000 * ABS({est} - n_exact)) {idiv} n_exact AS BIGINT)
         AS err_ppm
FROM scoped
"""


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source + merged KMV distinct-token sketch vs exact counts.

    The ``__all__`` row is served FROM the per-source sketches (union of
    bottom-Ks re-truncated to bottom-K — any global bottom-K hash is
    necessarily in its own source's bottom-K), not from a second corpus
    scan: the mergeability contract, checked exactly by the oracle.  The
    one global ROW_NUMBER runs over <= K * n_sources sketch rows
    (aggregated input — the bounded-global-window rule)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_kmv_sql("spark"))


_KMV_ORACLE = _kmv_sql("duck")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"sketch_kmv_distinct": sketch_kmv_distinct}


def oracles() -> dict[str, str]:
    return {"sketch_kmv_distinct": _KMV_ORACLE}
