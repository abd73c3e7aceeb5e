"""Similarity search over the ``embeddings`` table (array<float> column).

- brute-force top-k : exact cosine of a (small) query set against the full
                      corpus.  The corpus side streams through executors;
                      the query set is broadcast — at 100 TB this is the
                      "re-rank" stage, not the recall stage.
- IVF-bucketed top-k: coarse partition (here: the ``label`` column plays
                      the role of the coarse quantizer's assignment) and
                      search only within the probed bucket — the scale
                      path: shuffle is keyed by bucket, each bucket's
                      candidate set is small.

Dot products use explicit float->double casts and a strict left fold
(``aggregate``) so the result is bit-deterministic; ranking tie-breaks on
vec_id.  Scores are not emitted (rank + ids only) to keep the oracle
comparison independent of last-ulp floating-point association.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TOP_K = 10
N_QUERIES = 8  # vec_id < N_QUERIES form the query set

_SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
_DUCK_DOT = (
    "list_aggregate(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
)


# norms are precomputed once per vector (a "v" CTE) — cosine per pair is
# then a single dot product, 3x less arithmetic than norm-per-pair
def _spark_norm(a: str) -> str:
    return f"sqrt({_SPARK_DOT.format(a=a, b=a)})"


def _duck_norm(a: str) -> str:
    return f"sqrt({_DUCK_DOT.format(a=a, b=a)})"


def _spark_cosine(a: str, b: str, na: str, nb: str) -> str:
    return f"({_SPARK_DOT.format(a=a, b=b)}) / ({na} * {nb})"


def _duck_cosine(a: str, b: str, na: str, nb: str) -> str:
    return f"({_DUCK_DOT.format(a=a, b=b)}) / ({na} * {nb})"


def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    cos = _spark_cosine("q.embedding", "c.embedding", "q.nrm", "c.nrm")
    return spark.sql(
        f"""
        WITH v AS (
          SELECT vec_id, label, embedding,
                 {_spark_norm('embedding')} AS nrm
          FROM embeddings
        ),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {cos} AS score
          FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
          JOIN v c ON q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT query_id, rank, neighbor_id FROM ranked
        WHERE rank <= {TOP_K}
        """
    )


def _bruteforce_oracle() -> str:
    cos = _duck_cosine("q.embedding", "c.embedding", "q.nrm", "c.nrm")
    return f"""
WITH v AS (
  SELECT vec_id, label, embedding, {_duck_norm('embedding')} AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked
WHERE rank <= {TOP_K}
"""


def ann_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: search only the query's coarse bucket (label).

    At scale: corpus pre-partitioned by bucket (one shuffle at build
    time), probes shuffle only to their bucket's partition.
    """
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    cos = _spark_cosine("q.embedding", "c.embedding", "q.nrm", "c.nrm")
    return spark.sql(
        f"""
        WITH v AS (
          SELECT vec_id, label, embedding,
                 {_spark_norm('embedding')} AS nrm
          FROM embeddings
        ),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {cos} AS score
          FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
          JOIN v c
            ON q.label = c.label AND q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT query_id, rank, neighbor_id FROM ranked
        WHERE rank <= {TOP_K}
        """
    )


def _ivf_oracle() -> str:
    cos = _duck_cosine("q.embedding", "c.embedding", "q.nrm", "c.nrm")
    return f"""
WITH v AS (
  SELECT vec_id, label, embedding, {_duck_norm('embedding')} AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c
    ON q.label = c.label AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked
WHERE rank <= {TOP_K}
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ann_bruteforce": ann_bruteforce,
        "ann_ivf_label": ann_ivf_label,
    }


def oracles() -> dict[str, str]:
    return {
        "ann_bruteforce": _bruteforce_oracle(),
        "ann_ivf_label": _ivf_oracle(),
    }
