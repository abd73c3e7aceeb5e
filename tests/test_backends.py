"""Warehouse backend parity (databricks_sql.py:20-81): run.sql execution
statement-at-a-time, failing-statement logging, connection validation,
and the preserved Databricks config surface."""

from __future__ import annotations

import os
import shutil

import pytest


def test_spark_backend_runs_built_artifact(spark, sf_dir, tmp_path):
    from dataforge_core_spark.backends import SparkWarehouse
    from dataforge_core_spark.loader import load_project
    from dataforge_core_spark.model import Project
    from dataforge_core_spark.sql_emitter import SqlEmitter

    shutil.rmtree("spark-warehouse", ignore_errors=True)
    full = load_project("projects/tpch_demo")
    orders = full.source_by_name()["tpch_orders"]
    project = Project(sources=[orders], relations=[], outputs=[])
    SqlEmitter(project, {"DATA_DIR": sf_dir}, spark=spark).emit_all(
        str(tmp_path)
    )
    backend = SparkWarehouse(spark, log_path=str(tmp_path))
    backend.run(os.path.join(str(tmp_path), "run.sql"))
    assert spark.table(orders.target_table).count() > 0


def test_spark_backend_missing_run_file(spark, tmp_path):
    from dataforge_core_spark.backends import BackendError, SparkWarehouse

    backend = SparkWarehouse(spark, log_path=str(tmp_path))
    with pytest.raises(BackendError, match="Run dataforge --build first"):
        backend.run(str(tmp_path / "nope" / "run.sql"))


def test_spark_backend_logs_failing_statement(spark, tmp_path):
    from dataforge_core_spark.backends import BackendError, SparkWarehouse

    backend = SparkWarehouse(spark, log_path=str(tmp_path))
    with pytest.raises(BackendError, match="run.log"):
        backend.execute("SELECT 1 as i; SELECT * FROM table_that_is_missing")
    log = (tmp_path / "run.log").read_text()
    # reference format: "Error {e} while executing statement {statement}"
    assert log.startswith("Error ")
    assert "while executing statement" in log
    assert "table_that_is_missing" in log


def test_spark_backend_validate_and_quoted_semicolons(spark, tmp_path):
    from dataforge_core_spark.backends import SparkWarehouse

    backend = SparkWarehouse(spark, log_path=str(tmp_path))
    backend.validate()  # SELECT 1 as i
    # unquoted ';' splits, quoted ';' does not (databricks_sql.py:48-49)
    backend.execute(
        "CREATE OR REPLACE TEMP VIEW semi_t AS SELECT 'a;b' AS v; "
        "SELECT v FROM semi_t"
    )
    assert spark.sql("SELECT v FROM semi_t").collect()[0][0] == "a;b"


def test_databricks_backend_config_surface(tmp_path):
    from dataforge_core_spark.backends import (
        BackendError,
        DatabricksWarehouse,
    )

    good = {
        "hostname": "h",
        "http_path": "p",
        "access_token": "t",
        "catalog": "c",
        "schema": "s",
    }
    backend = DatabricksWarehouse(good, log_path=str(tmp_path))
    # connector not installed in this container -> clean gated error
    with pytest.raises(BackendError, match="databricks-sql-connector"):
        backend.execute("SELECT 1 as i")

    for missing in DatabricksWarehouse.REQUIRED:
        cfg = {k: v for k, v in good.items() if k != missing}
        with pytest.raises(BackendError, match=f"{missing} is required"):
            DatabricksWarehouse(cfg, log_path=str(tmp_path))


def test_cli_run_sql(tmp_path):
    from dataforge_core_spark.cli import main

    rc = main(
        [
            "--build",
            "projects/tpch_demo",
            "--target",
            str(tmp_path / "target"),
            "--data-dir",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    shutil.rmtree("spark-warehouse", ignore_errors=True)
    rc = main(["--run-sql", str(tmp_path / "target")])
    assert rc == 0
