"""Lakehouse MERGE targets for the incremental upsert path.

``compiler.incremental_upsert`` computes the post-MERGE hub as a
DataFrame (semantic MERGE over parquet frames — correct at any scale
but a full-table rewrite on write).  On a real lakehouse table format
the same operation is a storage-level ``MERGE INTO``: with the table
partitioned by the window key, the format's file-level stats prune the
rewrite to the displaced partitions only — the difference between
touching GBs and touching the whole 100 TB hub on a daily upsert.

The Delta Lake wiring below is REAL (merge builder, partition-pruned
condition, null-safe key matching identical to
``compiler._nullsafe_key_split``) but gated behind a classpath probe,
exactly like the Kafka source/sink (streaming/pipeline.py:255):
environments with delta-spark installed get it for free; this
container does not bundle it, so the gated tests skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataforge_core_spark.model import ProjectError


def delta_available(spark: SparkSession) -> bool:
    """True when the Delta Lake runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.delta.DeltaLog"
        )
        return True
    except Exception:
        return False


# Upper bound on the driver-collected changed-partition value list used
# for MERGE file pruning.  Date-like window keys (the intended use) have
# at most a few thousand distinct values; a high-cardinality key would
# otherwise pull an unbounded list into the driver, so past the cap the
# key contributes no pruning predicate (full MERGE — correct, just
# unpruned).
MAX_PRUNE_VALUES = 10_000


def _prune_condition(new_df: DataFrame, key: str):
    """Static Column predicate ``t.<key> IN (changed values)``, or None
    when the key's distinct changed-value count exceeds
    ``MAX_PRUNE_VALUES`` (see the cap comment above)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    vals = [
        r[0]
        for r in new_df.select(key)
        .distinct()
        .limit(MAX_PRUNE_VALUES + 1)
        .collect()
    ]
    if len(vals) > MAX_PRUNE_VALUES:
        return None  # high-cardinality key: full MERGE, no pruning
    non_null = [v for v in vals if v is not None]
    p = None
    if non_null:
        p = F.col(f"t.`{key}`").isin(*non_null)
    if any(v is None for v in vals):
        isnull = F.col(f"t.`{key}`").isNull()
        p = isnull if p is None else (p | isnull)
    return p


def _require_delta(spark: SparkSession) -> None:
    if not delta_available(spark):
        raise ProjectError(
            "Delta Lake runtime not on the classpath; add the "
            "delta-spark package (and its SparkSession extensions) to "
            "use lakehouse merge targets"
        )


def write_delta(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Initial materialization of a hub as a Delta table.

    ``partition_by`` should be the window-confinement key
    (``compiler.window_partition_keys``) so later MERGEs prune at file
    level."""
    _require_delta(df.sparkSession)
    w = df.write.format("delta").mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def merge_upsert_delta(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    upsert_keys: list[str],
    prune_keys: list[str] | None = None,
) -> None:
    """Storage-level MERGE: rows of ``new_df`` REPLACE target rows with
    null-safely matching ``upsert_keys`` values and append otherwise —
    the same key semantics as ``compiler.incremental_upsert``'s
    frame-level merge (`<=>` match: a NULL-keyed incoming row replaces
    the NULL-keyed target row, so re-running the same upsert is a
    no-op).  One precondition the frame-level path does not have: the
    ``upsert_keys`` tuple must be UNIQUE within ``new_df`` (the
    standard SQL MERGE constraint — Delta rejects a target row matched
    by multiple source rows, where the frame path would keep them all);
    violating batches raise Delta's multiple-matches error rather than
    silently diverging.

    ``prune_keys``: window partition-key columns of the target table.
    When given, the merge condition is AND-ed with
    ``target.<key> IN (distinct incoming values)`` — a static predicate
    on the table's partition columns, which Delta turns into file-level
    pruning: only displaced partitions' files are rewritten.  The
    condition is built from Column expressions (``isin`` over the
    collected Python values), so dates/timestamps/decimals become
    proper typed literals — never string-formatted SQL.  The distinct
    value list is collected driver-side — BOUNDED: at most
    ``MAX_PRUNE_VALUES + 1`` values are fetched (a ``limit`` before the
    collect), and a key whose changed-value set exceeds the cap simply
    skips pruning for that key (correct, just unpruned) instead of
    pulling an unbounded list into the driver.  Date-like partition
    keys stay far under the cap; a caller who passes a
    high-cardinality key degrades to a full MERGE rather than an OOM.
    """
    _require_delta(spark)
    from delta.tables import DeltaTable  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    target = DeltaTable.forPath(spark, path)
    cond = None
    for k in upsert_keys:
        c = F.col(f"t.`{k}`").eqNullSafe(F.col(f"s.`{k}`"))
        cond = c if cond is None else (cond & c)
    if prune_keys:
        for k in prune_keys:
            p = _prune_condition(new_df, k)
            if p is not None:
                cond = cond & p
    (
        target.alias("t")
        .merge(new_df.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
