"""Events-table invariants the operators rely on."""

from __future__ import annotations


def test_events_event_id_unique(spark, sf_dir):
    """events_asof_order emits one row per event row (no GROUP BY), which
    equals the oracle's grouped form only while event rows are unique —
    assert the invariant the rewrite depends on (ADVICE r5)."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = df.count()
    assert df.select("event_id").distinct().count() == total
    assert (
        df.select("event_id", "user_id", "ts").distinct().count() == total
    )
