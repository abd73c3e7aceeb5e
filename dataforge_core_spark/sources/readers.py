"""Source readers + output writers.

The reference reads catalog-qualified tables only
(u_get_source_table_name.sql; sample ``samples.tpch.*``) and writes hubs /
outputs with ``DROP TABLE IF EXISTS …; CREATE TABLE … AS`` wrappers
(u_enr_query_generate_query.sql:121-142, u_output_generate_query.sql:152-155).
Output sub-types table/virtual/file(parquet|avro|text) are validated in
u_validate_output.sql:21-76.

This module keeps those semantics but adds direct-path reading (parquet /
csv / json / orc) so the engine also runs without a metastore.  All reads
go through ``spark.read`` — scans are DataSource-v2, so Catalyst pushes
filters and prunes columns into the file format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataforge_core_spark.model import ProjectError, Source


def resolve_table_ref(ref: str, substitutions: dict[str, str] | None) -> str:
    out = ref
    for k, v in (substitutions or {}).items():
        out = out.replace("${" + k + "}", v)
    return out


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    lower = ref.lower()
    if lower.endswith(".parquet") or lower.endswith(".pq"):
        return spark.read.parquet(ref)
    if lower.endswith(".csv"):
        return spark.read.option("header", "true").csv(ref)
    if lower.endswith(".json") or lower.endswith(".jsonl"):
        return spark.read.json(ref)
    if lower.endswith(".orc"):
        return spark.read.orc(ref)
    if lower.endswith(".avro"):
        return spark.read.format("avro").load(ref)
    if os.path.sep in ref and os.path.isdir(ref):
        return spark.read.parquet(ref)
    return spark.table(ref)


def parse_datatype_json(schema_json):
    """Spark DataType from its JSON form, via the public
    StructType.fromJson one-field round-trip (datatype_schema columns
    store field.dataType.json() — miniSparky.py:63)."""
    from pyspark.sql import types as T

    return (
        T.StructType.fromJson(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "f",
                        "type": schema_json,
                        "nullable": True,
                        "metadata": {},
                    }
                ],
            }
        )
        .fields[0]
        .dataType
    )


def read_source(
    spark: SparkSession,
    source: Source,
    substitutions: dict[str, str] | None = None,
) -> DataFrame:
    """Read + project + cast a source to its declared raw attributes.

    Emits only declared columns (ReadSchema pruning reaches the scan) and
    casts each to the declared type — the reference trusts the catalog
    schema instead; the explicit cast makes local files behave the same.
    """
    from pyspark.sql import types as T

    df = read_table(spark, resolve_table_ref(source.source_table, substitutions))
    cols = []
    have = {c.lower() for c in df.columns}
    for attr in source.raw_attributes:
        if attr.name.lower() not in have:
            raise ProjectError(
                f"Source {source.source_name!r}: column {attr.name!r} not "
                f"present in {source.source_table!r}"
            )
        if attr.schema_json is not None:
            cols.append(
                F.col(attr.name)
                .cast(parse_datatype_json(attr.schema_json))
                .alias(attr.name)
            )
        else:
            cols.append(F.col(attr.name).cast(attr.spark_ddl).alias(attr.name))
    return df.select(*cols)


def write_output(
    df: DataFrame,
    name: str,
    output_type: str = "table",
    file_format: str | None = None,
    base_dir: str | None = None,
    partition_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> None:
    """table -> saveAsTable (overwrite, CREATE-TABLE-AS parity);
    virtual -> temp view; file -> parquet/avro/text under base_dir.

    Hint scope: ``partition_by`` and ``zorder_by`` are WRITE-side
    layout hints — they shape files on disk.  A ``virtual`` output is a
    temp view with no storage, so both hints are no-ops there (declared
    ordinals are accepted for project portability but nothing is
    clustered); they take effect when the same output is re-declared as
    ``table``/``file``.

    ``zorder_by``: output columns with a ``zorder_ordinal`` hint
    (Output.zorder_columns) — rows are clustered within each write task
    via ``sortWithinPartitions`` on (partition keys, then zorder keys),
    which is a LOCAL sort (no extra shuffle): per-file min/max column
    statistics on the hinted keys become tight, so point/range scans
    skip whole files at the footer — the parquet-native approximation
    of Z-ordering at 100 TB (bit-interleaved multi-column clustering
    needs a table format's OPTIMIZE pass; on one hinted column the two
    are identical).  Prefixing the partition keys also caps open
    writers at one file per directory per task.

    ``partition_by``: output columns with a ``partition_ordinal`` hint
    (Output.partition_columns) — written as hive-style directory
    partitions, so downstream reads with a filter on the key prune at
    the directory level (the 100 TB reason the hint exists).  Hive
    directory caveat for parquet/avro path reads: readers re-infer
    partition-column types from the directory strings (a numeric-looking
    ``day=20240101`` string column reads back as INT unless
    ``spark.sql.sources.partitionColumnTypeInference.enabled`` is off)
    and partition columns re-appear LAST in the schema — select by name,
    not position.  Delta/catalog reads keep the declared schema."""

    def _w(writer):
        return writer.partitionBy(*partition_by) if partition_by else writer

    if zorder_by and output_type in ("table", "file"):
        if (file_format or "parquet").lower() == "text":
            raise ProjectError("text outputs cannot be zordered")
        df = df.sortWithinPartitions(*((partition_by or []) + zorder_by))

    if partition_by and output_type == "file" and (
        (file_format or "parquet").lower() == "text"
    ):
        # a text output is single-column; partitioning it by that column
        # would leave empty files — reject rather than silently ignore
        raise ProjectError("text outputs cannot be partitioned")

    if output_type == "table":
        if base_dir:
            _w(df.write.mode("overwrite")).parquet(
                os.path.join(base_dir, name)
            )
        else:
            _w(df.write.mode("overwrite")).saveAsTable(name)
    elif output_type == "virtual":
        df.createOrReplaceTempView(name)
    elif output_type == "file":
        fmt = (file_format or "parquet").lower()
        if base_dir is None:
            raise ProjectError("file outputs need base_dir")
        path = os.path.join(base_dir, name)
        if fmt == "parquet":
            _w(df.write.mode("overwrite")).parquet(path)
        elif fmt == "avro":
            _w(df.write.mode("overwrite").format("avro")).save(path)
        elif fmt == "text":
            # text outputs must be single-column (u_validate_output.sql:39-41)
            if len(df.columns) != 1:
                raise ProjectError("text output must have exactly one column")
            df.write.mode("overwrite").text(path)
        elif fmt == "csv":
            # extension beyond the reference's parquet/avro/text: header
            # row for interchange; complex columns rejected by Spark's
            # CSV writer itself (arrays/structs have no CSV encoding)
            _w(df.write.mode("overwrite").option("header", "true")).csv(path)
        elif fmt == "json":
            # extension: JSON-lines — the interchange format most
            # downstream training-data tooling ingests directly
            _w(df.write.mode("overwrite")).json(path)
        elif fmt == "delta":
            # lakehouse target (classpath-gated — sources/merge_targets):
            # enables storage-level MERGE for the incremental upsert path
            from dataforge_core_spark.sources.merge_targets import (
                write_delta,
            )

            write_delta(df, path, partition_by=partition_by)
        else:
            raise ProjectError(f"Unknown file format {fmt!r}")
    else:
        raise ProjectError(f"Unknown output type {output_type!r}")
