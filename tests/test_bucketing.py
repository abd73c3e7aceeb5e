"""Bucketed hub materialization (scale path).

Hubs are the repeatedly-joined side of every lookup; writing them
bucketed on their relation-graph join key lets downstream sort-merge
joins and aggregate groupBys reuse the write-time partitioning instead
of shuffling.  Verifies: auto key derivation, catalog bucket spec,
value parity with the plain parquet path, and the shuffle-free plan.
"""

import os
import tempfile

import pytest

from dataforge_core_spark.loader import load_project
from dataforge_core_spark.runner import ProjectRunner

PROJ = os.path.join(os.path.dirname(os.path.dirname(__file__)), "projects", "tpch_demo")


@pytest.fixture(scope="module")
def project():
    return load_project(PROJ)


def test_bucket_keys_from_relation_graph(project, spark):
    r = ProjectRunner(spark, project)
    keys = r.bucket_keys()
    # cardinality-1 lookup targets keyed by their related-side column
    assert keys["tpch_orders"] == ["o_orderkey"]
    assert keys["tpch_customer"] == ["c_custkey"]
    assert keys["tpch_nation"] == ["n_nationkey"]
    assert keys["tpch_region"] == ["r_regionkey"]
    # the non-column (CAST...) relation side must not produce a key;
    # supplier's only bare-column relation is the reverse 1-M from nation
    assert keys["tpch_supplier"] == ["s_nationkey"]
    # M endpoints vote too (groupBy side of decorrelated aggregates)
    assert keys["tpch_lineitem"] in (["l_orderkey"], ["l_partkey"])


def test_bucketed_materialize_parity_and_plan(project, spark, sf_dir):
    r = ProjectRunner(spark, project, {"DATA_DIR": sf_dir})
    plain_dir = tempfile.mkdtemp(prefix="dfspark_plain_")
    buck_dir = tempfile.mkdtemp(prefix="dfspark_buck_")
    plain = r.materialize(plain_dir)
    bucketed = r.materialize(buck_dir, bucket_by="auto", n_buckets=4)
    assert set(plain) == set(bucketed)

    # catalog records the bucket spec
    desc = spark.sql("DESCRIBE EXTENDED enriched_customer").collect()
    desc_map = {row[0]: row[1] for row in desc}
    assert desc_map.get("Num Buckets") == "4"
    assert "c_custkey" in desc_map.get("Bucket Columns", "")

    # value parity between the bucketed and plain hub
    a = spark.read.parquet(plain["enriched_customer"])
    b = spark.table("enriched_customer")
    assert a.count() == b.count()
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    assert (
        a.select(*cols).exceptAll(b.select(*cols)).count() == 0
    ), "bucketed hub differs from plain hub"

    # with broadcast off, a join of two hubs bucketed on the same key
    # count must not shuffle the bucketed sides
    orders = spark.table("enriched_orders")
    cust = spark.table("enriched_customer")
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # customer side is bucketed on c_custkey -> no Exchange above its
        # scan; orders is bucketed on o_orderkey -> its side may shuffle,
        # so at most one Exchange total (zero if AQE reuses bucketing)
        assert plan.count("Exchange hashpartitioning") <= 1
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_emitter_clustered_by_ddl(project, spark):
    """The SQL artifact path gets the same bucketing property via
    CLUSTERED BY CTAS, and the DDL executes."""
    from dataforge_core_spark.sql_emitter import SqlEmitter, run_statements

    em = SqlEmitter(
        project,
        {"DATA_DIR": "/root/testdata/sf0.001"},
        spark=spark,
        bucket_by="auto",
        n_buckets=4,
    )
    sql = em.emit_source(project.source_by_name()["tpch_region"])
    assert "CLUSTERED BY (`r_regionkey`)" in sql
    assert "INTO 4 BUCKETS" in sql
    spark.sql("DROP TABLE IF EXISTS enriched_region")
    # a prior pytest process's managed table may have left files the
    # in-memory catalog no longer knows about — CTAS refuses the location
    import shutil

    shutil.rmtree("spark-warehouse/enriched_region", ignore_errors=True)
    run_statements(spark, sql)
    desc = {r[0]: r[1] for r in spark.sql("DESCRIBE EXTENDED enriched_region").collect()}
    assert desc.get("Num Buckets") == "4"
    spark.sql("DROP TABLE IF EXISTS enriched_region")
