"""Probe-based type inference tests (SURVEY §5 mechanism 1 parity)."""

import pytest

from dataforge_core_spark.model import ProjectError
from dataforge_core_spark.probe import build_probe_sql, check_boolean, run_probe


def test_probe_success_type(spark):
    res = run_probe(spark, "[This].a + 1", {"This.a": "bigint"})
    assert res.status == "success"
    assert res.data_type == "bigint"


def test_probe_decimal_inference(spark):
    res = run_probe(spark, "[This].a * 2", {"This.a": "decimal"})
    assert res.status == "success"
    assert res.data_type.startswith("decimal")


def test_probe_date_function(spark):
    res = run_probe(
        spark, "date_format([This].d, 'yyyyMM')", {"This.d": "timestamp"}
    )
    assert res.status == "success"
    assert res.data_type == "string"


def test_probe_null_warning(spark):
    # miniSparky.py:66-72: NULL first row -> 'improper type casting' warning.
    # (The reference runs Spark 3.5 non-ANSI where CAST('zzz' AS int) is
    # silently NULL; under Spark 4 ANSI the same silent-NULL path is
    # try_cast — the probe mechanism is identical.)
    res = run_probe(spark, "try_cast('zzz' AS int)")
    assert res.status == "warning"
    assert "improper type casting" in res.message


def test_probe_extraneous_input(spark):
    # miniSparky.py:73-77: injected extra select item -> error
    res = run_probe(spark, "1 as col1, 2")
    assert res.status == "error"
    assert "Extraneous input" in res.message


def test_probe_aggregate_wrapping(spark):
    sql = build_probe_sql(
        "SUM([orders].x) + [This].y",
        {"orders.x": "bigint", "This.y": "int"},
    )
    assert "first_value(" in sql  # non-aggregated param wrapped (:51-53)
    res = run_probe(
        spark,
        "SUM([orders].x) + [This].y",
        {"orders.x": "bigint", "This.y": "int"},
    )
    assert res.status == "success"
    assert res.data_type == "bigint"


def test_check_boolean(spark):
    check_boolean(spark, "[This].a = [Related].b", {"This.a": "bigint", "Related.b": "bigint"})
    with pytest.raises(ProjectError, match="must be boolean"):
        check_boolean(spark, "[This].a + 1", {"This.a": "bigint"})


def test_probe_window_expression(spark):
    res = run_probe(
        spark,
        "ROW_NUMBER() OVER (PARTITION BY [This].k ORDER BY [This].t)",
        {"This.k": "string", "This.t": "timestamp"},
    )
    assert res.status == "success"
    assert res.data_type == "int"


def test_validate_project_demo(spark):
    """Dependency-ordered probe waves over the demo project: everything
    probes clean with correctly inferred types."""
    from dataforge_core_spark.loader import load_project
    from dataforge_core_spark.probe import validate_project

    project = load_project("projects/tpch_demo")
    report = validate_project(spark, project)
    errors = [r for r in report if r["status"] == "error"]
    assert not errors, errors
    by_name = {r["name"]: r for r in report if r["kind"] == "rule"}
    assert by_name["tpch_lineitem.net_price_int"]["data_type"] == "bigint"
    assert by_name["tpch_customer.order_statuses"]["data_type"] == "array<string>"
    assert all(
        r["data_type"] == "boolean"
        for r in report
        if r["kind"] in ("relation", "filter")
    )


def test_probe_cache_no_requery(spark):
    """Second validation of the same project issues ZERO probe queries:
    probe results are pure functions of (expression, param types) over a
    constant literal view, cached per session by probe SQL (the
    reference caches equivalently in its metadata DB, SURVEY §7.3)."""
    from dataforge_core_spark.loader import load_project
    from dataforge_core_spark.probe import probe_stats, validate_project

    project = load_project("projects/tpch_demo")
    first = validate_project(spark, project)
    runs_after_first = probe_stats["runs"]
    second = validate_project(spark, project)
    assert probe_stats["runs"] == runs_after_first, "probe re-queried"
    assert probe_stats["hits"] >= len(second)
    assert [r["status"] for r in first] == [r["status"] for r in second]
