"""JSON schema registry: explicit-schema from_json extraction."""

import pytest

from dataforge_core_spark.functions.json_registry import (
    json_schema,
    json_struct_type,
    parse_json,
    parse_json_sql,
    register_json_schema,
)


def test_registry_lookup_and_registration(spark):
    assert json_schema("events.props") == "k BIGINT"
    register_json_schema("t.c", "a STRING, b ARRAY<INT>")
    assert json_struct_type("t.c").fieldNames() == ["a", "b"]
    with pytest.raises(KeyError):
        json_schema("nope.nope")


def test_parse_json_typed(spark):
    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"k": null}',), ("not json",), (None,)],
        "props string",
    )
    out = df.select(parse_json("events.props", "props").alias("v")).select("v.k")
    assert [r.k for r in out.collect()] == [7, None, None, None]
    assert dict(out.dtypes)["k"] == "bigint"


def test_parse_json_sql_matches_get_json_object(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events_jr"
    )
    a = spark.sql(
        f"SELECT event_id, {parse_json_sql('events.props', 'props')}.k AS k "
        "FROM events_jr"
    )
    b = spark.sql(
        "SELECT event_id, CAST(get_json_object(props, '$.k') AS BIGINT) AS k "
        "FROM events_jr"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
