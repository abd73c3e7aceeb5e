"""JSON schema registry for semi-structured text columns.

``get_json_object`` re-parses the document once *per extracted path* and
returns strings that need per-field casts; ``from_json`` with an explicit
schema parses once per record into a typed struct, and Catalyst prunes
the parse to just the referenced fields (OptimizeJsonExprs /
schema-pruning).  At ingest scale the difference is one Jackson pass per
record vs one per path — the registry makes the explicit-schema form the
default and keeps schemas in one auditable place (schema inference on a
100 TB column is both slow and a correctness hazard).

Registered schemas are DDL strings (``'k BIGINT, tag STRING'``) keyed by
``table.column``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

_REGISTRY: dict[str, str] = {
    # the driver testdata's events.props payload
    "events.props": "k BIGINT",
}


def register_json_schema(name: str, ddl: str) -> None:
    _REGISTRY[name] = ddl


def json_schema(name: str) -> str:
    """Registered DDL schema for ``table.column`` (KeyError if absent —
    never silently infer)."""
    return _REGISTRY[name]


def json_struct_type(name: str) -> T.StructType:
    return T.StructType.fromDDL(json_schema(name))


def parse_json(name: str, col: str | Column) -> Column:
    """Typed struct column for a registered JSON text column."""
    return F.from_json(col if isinstance(col, Column) else F.col(col), json_schema(name))


def parse_json_sql(name: str, col_sql: str) -> str:
    """SQL-text form (for generated queries): ``from_json(col, 'ddl')``."""
    ddl = json_schema(name).replace("'", "''")
    return f"from_json({col_sql}, '{ddl}')"
