"""Recalculation mode (W4): only keep_current rules + their dependency
closure are recomputed from an existing hub; the result equals a full
rebuild (u_enr_query_generate_elements.sql:62-75)."""

from __future__ import annotations


def test_recalculation_closure(spark, sf_dir):
    from dataforge_core_spark.compiler import SourceCompiler
    from dataforge_core_spark.loader import load_project

    project = load_project("projects/tpch_demo")
    compiler = SourceCompiler(spark, project)
    orders = project.source_by_name()["tpch_orders"]
    # cust_order_rank is the only window (auto keep_current) rule; nothing
    # depends on it inside orders
    assert compiler.recalculation_closure(orders) == {"cust_order_rank"}


def test_recalculation_matches_full_rebuild(spark, sf_dir):
    from dataforge_core_spark.compiler import SourceCompiler
    from dataforge_core_spark.loader import load_project
    from dataforge_core_spark.runner import ProjectRunner

    project = load_project("projects/tpch_demo")
    runner = ProjectRunner(spark, project, {"DATA_DIR": sf_dir})
    hubs = runner.build()
    orders = project.source_by_name()["tpch_orders"]
    full = hubs["tpch_orders"]

    # simulate a stale hub: corrupt the window column, then recalculate
    from pyspark.sql import functions as F

    stale = full.withColumn("cust_order_rank", F.lit(-1))
    recalced = runner.compiler.recalculate(orders, stale, hubs)

    assert sorted(recalced.columns) == sorted(full.columns)
    cols = sorted(full.columns)
    a = sorted([tuple(repr(r[c]) for c in cols) for r in full.collect()])
    b = sorted([tuple(repr(r[c]) for c in cols) for r in recalced.collect()])
    assert a == b


def test_recalculation_noop_without_keep_current(spark, sf_dir):
    from dataforge_core_spark.compiler import SourceCompiler
    from dataforge_core_spark.loader import load_project
    from dataforge_core_spark.runner import ProjectRunner

    project = load_project("projects/tpch_demo")
    runner = ProjectRunner(spark, project, {"DATA_DIR": sf_dir})
    hubs = runner.build()
    region = project.source_by_name()["tpch_region"]
    assert runner.compiler.recalculation_closure(region) == set()
    out = runner.compiler.recalculate(region, hubs["tpch_region"], hubs)
    assert out is hubs["tpch_region"]
