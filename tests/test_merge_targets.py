"""Lakehouse MERGE target wiring (classpath-gated, like the Kafka
probe): real Delta merge-builder code, skipped where delta-spark is not
installed; the availability error path always runs."""

from __future__ import annotations

import pytest


def test_delta_unavailable_raises_helpful_error(spark, tmp_path):
    from dataforge_core_spark.model import ProjectError
    from dataforge_core_spark.sources import merge_targets as mt

    if mt.delta_available(spark):
        pytest.skip("delta on classpath; error path not reachable")
    df = spark.range(3)
    with pytest.raises(ProjectError, match="delta-spark"):
        mt.write_delta(df, str(tmp_path / "t"))
    with pytest.raises(ProjectError, match="delta-spark"):
        mt.merge_upsert_delta(spark, str(tmp_path / "t"), df, ["id"])


def test_write_output_delta_format_gated(spark, tmp_path):
    from dataforge_core_spark.model import ProjectError
    from dataforge_core_spark.sources.merge_targets import delta_available
    from dataforge_core_spark.sources.readers import write_output

    if delta_available(spark):
        pytest.skip("covered by test_delta_merge_prunes_partitions")
    with pytest.raises(ProjectError, match="delta-spark"):
        write_output(
            spark.range(3),
            "d_out",
            output_type="file",
            file_format="delta",
            base_dir=str(tmp_path),
        )


def test_delta_merge_prunes_partitions(spark, tmp_path):
    """With delta-spark present: MERGE rewrites ONLY the displaced
    window partitions' files (file-level pruning via the static
    partition-column predicate), and the post-merge table equals the
    frame-level incremental_upsert result."""
    from dataforge_core_spark.sources import merge_targets as mt

    if not mt.delta_available(spark):
        pytest.skip("delta-spark not installed in this environment")
    import os

    path = str(tmp_path / "hub")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)],
        "id long, grp string, amt long",
    )
    mt.write_delta(base, path, partition_by=["grp"])
    files_before = {
        f
        for root, _, fs in os.walk(os.path.join(path, "grp=b"))
        for f in fs
        if f.endswith(".parquet")
    }
    new = spark.createDataFrame([(1, "a", 99)], "id long, grp string, amt long")
    mt.merge_upsert_delta(spark, path, new, ["id"], prune_keys=["grp"])
    files_after = {
        f
        for root, _, fs in os.walk(os.path.join(path, "grp=b"))
        for f in fs
        if f.endswith(".parquet")
    }
    # untouched partition keeps its exact file set
    assert files_before == files_after
    got = {
        (r.id, r.grp): r.amt
        for r in spark.read.format("delta").load(path).collect()
    }
    assert got == {(1, "a"): 99, (2, "b"): 20, (3, "a"): 30}


def test_prune_value_collect_is_capped(spark):
    """The changed-partition value list for MERGE pruning is bounded:
    a high-cardinality prune key yields NO pruning predicate (full
    MERGE) instead of collecting an unbounded list to the driver; a
    normal key still yields the typed IN predicate, nulls included."""
    from dataforge_core_spark.sources import merge_targets as mt

    # the limit(cap+1) means at most cap+1 rows ever reach the driver
    wide = spark.range(0, 50_000).selectExpr("id AS k")
    old_cap = mt.MAX_PRUNE_VALUES
    try:
        mt.MAX_PRUNE_VALUES = 100
        assert mt._prune_condition(wide, "k") is None
        narrow = spark.sql(
            "SELECT CASE WHEN id = 3 THEN NULL ELSE id % 3 END AS k "
            "FROM range(10)"
        )
        p = mt._prune_condition(narrow, "k")
        assert p is not None
        s = str(p)
        assert "in(t.k" in s and "isNull(t.k)" in s
    finally:
        mt.MAX_PRUNE_VALUES = old_cap
