"""Engine-level sub-sources (§2.11): element rules over a parent's
array<struct> attribute, re-packed in place; DataFrame and emitted-SQL
paths agree with the flat computation."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def nested_parquet(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("subsource") / "orders_nested")
    spark.sql(
        f"""
        SELECT o.o_orderkey, o.o_custkey,
               collect_list(struct(
                 l.l_linenumber, l.l_quantity, l.l_extendedprice, l.l_discount
               )) AS items
        FROM parquet.`{sf_dir}/orders.parquet` o
        JOIN parquet.`{sf_dir}/lineitem.parquet` l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_custkey
        """
    ).write.mode("overwrite").parquet(path)
    return path


_ITEM_FIELDS = [
    ("l_linenumber", "integer"),
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_discount", "double"),
]


def _project(path):
    from dataforge_core_spark.loader import parse_source_dict
    from dataforge_core_spark.model import Project

    items_schema = {
        "type": "array",
        "elementType": {
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in _ITEM_FIELDS
            ],
        },
        "containsNull": True,
    }
    parent = parse_source_dict(
        {
            "source_name": "orders_n",
            "source_table": path,
            "target_table": "hub_orders_n",
            "raw_attributes": [
                "o_orderkey long",
                "o_custkey long",
                {"name": "items", "schema": items_schema},
            ],
        }
    )
    sub = parse_source_dict(
        {
            "source_name": "order_items",
            "sub_source": {"parent": "orders_n", "attribute": "items"},
            "raw_attributes": [f"{n} {t}" for n, t in _ITEM_FIELDS],
            "rules": [
                {
                    "name": "net_price",
                    "expression": (
                        "CAST(CAST([This].l_extendedprice AS decimal(18,2)) "
                        "* CAST(1 - [This].l_discount AS decimal(8,4)) "
                        "AS decimal(38,12))"
                    ),
                },
                # rule composing another element rule
                {
                    "name": "big_item",
                    "expression": "[This].net_price > 50000 AND [This].l_quantity > 10",
                },
            ],
        }
    )
    return Project(sources=[parent, sub])


def test_sub_source_enrichment(spark, nested_parquet):
    from dataforge_core_spark.runner import ProjectRunner

    project = _project(nested_parquet)
    runner = ProjectRunner(spark, project, persist_hubs=False)
    assert runner.topo_order() == [["orders_n"]]  # sub not a hub
    hubs = runner.build()
    hub = hubs["orders_n"]
    assert "order_items" in hub.columns
    # element schema: raw fields + rules
    el = hub.schema["order_items"].dataType.elementType
    assert [f.name for f in el.fields] == [
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "net_price",
        "big_item",
    ]
    # flat verification: explode the enriched array, compare to direct calc
    hub.createOrReplaceTempView("hub_orders_n_v")
    flat = spark.sql(
        """
        SELECT o_orderkey, x.l_linenumber AS ln, x.net_price AS np,
               x.big_item AS bi
        FROM hub_orders_n_v LATERAL VIEW explode(order_items) t AS x
        """
    )
    expect = spark.sql(
        f"""
        SELECT o_orderkey, x.l_linenumber AS ln,
               CAST(CAST(x.l_extendedprice AS decimal(18,2))
                    * CAST(1 - x.l_discount AS decimal(8,4))
                    AS decimal(38,12)) AS np
        FROM parquet.`{nested_parquet}` LATERAL VIEW explode(items) t AS x
        """
    )
    got = {(r["o_orderkey"], r["ln"]): r["np"] for r in flat.collect()}
    want = {(r["o_orderkey"], r["ln"]): r["np"] for r in expect.collect()}
    assert got == want
    assert any(r["bi"] for r in flat.collect())


def test_sub_source_sql_artifact(spark, nested_parquet, tmp_path):
    import shutil

    from dataforge_core_spark.runner import ProjectRunner
    from dataforge_core_spark.sql_emitter import SqlEmitter, run_statements

    shutil.rmtree("spark-warehouse", ignore_errors=True)
    project = _project(nested_parquet)
    emitter = SqlEmitter(project, spark=spark)
    run_sql = emitter.emit_all(str(tmp_path))
    run_statements(spark, run_sql)
    sql_df = spark.table("hub_orders_n")
    df = ProjectRunner(spark, project, persist_hubs=False).build()["orders_n"]
    cols = sorted(df.columns)
    norm = lambda d: sorted(  # noqa: E731
        tuple(repr(r[c]) for c in cols) for r in d.collect()
    )
    assert norm(sql_df) == norm(df)


def test_sub_source_rejects_lookups(spark, nested_parquet):
    from dataforge_core_spark.loader import parse_source_dict
    from dataforge_core_spark.model import Project, ProjectError
    from dataforge_core_spark.runner import ProjectRunner

    project = _project(nested_parquet)
    sub = project.source_by_name()["order_items"]
    from dataforge_core_spark.model import Rule

    sub.rules.append(Rule(name="bad", expression="SUM([orders_n].o_custkey)"))
    runner = ProjectRunner(spark, project, persist_hubs=False)
    with pytest.raises(ProjectError):
        runner.build()
