"""Scale-out extension operators beyond the reference's surface.

The reference compiles ELT rules; a 100 TB training-data pipeline also
needs dedup, similarity search, text analysis and multimodal handling.
Each operator module exposes plain (spark, sf_dir) -> DataFrame callables
plus a DuckDB oracle where the semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def extension_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dataforge_core_spark.operators import dedup, similarity, text, events

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(dedup.queries())
    q.update(similarity.queries())
    q.update(text.queries())
    q.update(events.queries())
    return q


def extension_oracles() -> dict[str, str]:
    from dataforge_core_spark.operators import dedup, similarity, text, events

    o: dict[str, str] = {}
    o.update(dedup.oracles())
    o.update(similarity.oracles())
    o.update(text.oracles())
    o.update(events.oracles())
    return o
