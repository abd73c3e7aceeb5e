"""Probe-based expression type inference on a live SparkSession.

Reimplements the reference's compile-time test mechanism
(cli/dataforge/miniSparky.py:23-89 + u_build_datatype_test_expr.sql:26-74):
every rule / relation predicate / output filter is rewritten into a probe
query over a 2-row literal ``datatypes`` view (one column per scalar type)
and *executed*; the result column's type becomes the expression's inferred
type.  Three behaviors replicated exactly:

- success: non-NULL first row -> record data_type + Spark schema JSON
  (miniSparky.py:63 stores ``field.dataType.json()``)
- warning: NULL first row -> "improper type casting" (miniSparky.py:66-72)
- error: extra columns in the result (col_name != 'col1') ->
  "Extraneous input detected" (miniSparky.py:73-77) — the injection /
  extra-expression guard

Probes substitute each ``[Source].attr`` parameter with a typed literal
column of the view; aggregate-containing expressions wrap non-aggregated
parameters in ``first_value(...)`` to stay valid SQL
(u_build_datatype_test_expr_from_parsed, :51-53).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from dataforge_core_spark.model import ProjectError
from dataforge_core_spark.parser import parse_expression, rewrite

# 2-row literal fixture, verbatim from miniSparky.py:32-36 (FIXTURES.md §2)
_DATATYPES_SQL = """
SELECT * FROM VALUES
  (CAST(-87.68 AS DECIMAL(10,2)), CAST(13518864 AS BIGINT),
   'Western Ave & Walton St', CAST(130 AS INT), CAST(130 AS INT),
   CAST(41.90331 AS FLOAT), CAST(87.67695 AS DOUBLE),
   DATE '2017-03-31', TIMESTAMP '2017-03-31 23:19:17', true,
   CAST(9999999999 AS BIGINT)),
  (CAST(-8127.68 AS DECIMAL(10,2)), CAST(1518864 AS BIGINT),
   'Western Ave & Walton St', CAST(130 AS INT), CAST(130 AS INT),
   CAST(41.90331 AS FLOAT), CAST(87.67695 AS DOUBLE),
   DATE '2020-03-31', TIMESTAMP '2020-03-31 23:19:17', true,
   CAST(99999999991 AS BIGINT))
AS datatypes(decimal, bigint, string, int, integer, float, double,
             date, timestamp, boolean, long)
"""

VIEW_NAME = "datatypes"


@dataclass
class ProbeResult:
    status: str  # 'success' | 'warning' | 'error'
    data_type: str | None = None  # simple Spark type name
    schema_json: str | None = None  # field.dataType.json()
    message: str | None = None


def ensure_datatypes_view(spark: SparkSession) -> None:
    if VIEW_NAME not in [t.name for t in spark.catalog.listTables()]:
        spark.sql(_DATATYPES_SQL).createOrReplaceTempView(VIEW_NAME)


def build_probe_sql(
    expression: str, param_types: dict[str, str] | None = None
) -> str:
    """Rewrite tokens to typed literal columns of the datatypes view.

    ``param_types`` maps 'Source.attr' or 'attr' to a hive/scalar type name
    (a datatypes-view column).  Unknown parameters default to 'string'.
    Mirrors u_build_datatype_test_expr.sql:26-74: the probe is
    ``WITH ct AS (SELECT <typed literal per parameter> FROM datatypes)
    SELECT <expr> as col1 FROM ct``.
    """
    parsed = parse_expression(expression, allow_this_agg=True)
    param_types = param_types or {}
    selects: list[str] = []
    spans: list[tuple[int, int, str]] = []
    names: dict[str, str] = {}

    def param_col(source: str, attr: str) -> str:
        key = f"{source}.{attr}"
        if key not in names:
            t = param_types.get(key, param_types.get(attr, "string"))
            col = f"p{len(names)}"
            selects.append(f"`{t}` AS {col}")
            names[key] = col
        return names[key]

    has_agg = bool(parsed.aggs)
    for tok in parsed.tokens:
        col = param_col(tok.source, tok.attr)
        # outside aggregates: wrap in first_value when the rule aggregates
        repl = f"first_value({col})" if has_agg else col
        spans.append((tok.start, tok.end, repl))
    for call in parsed.aggs:
        inner_spans = []
        for tok in call.tokens:
            col = param_col(tok.source, tok.attr)
            inner_spans.append(
                (tok.start - call.inner_offset, tok.end - call.inner_offset, col)
            )
        new_inner = rewrite(call.inner, inner_spans)
        spans.append((call.start, call.end, f"{call.func}({new_inner})"))

    body = rewrite(expression, spans)
    ct = ", ".join(selects) if selects else "1 AS p_dummy"
    return f"WITH ct AS (SELECT {ct} FROM {VIEW_NAME}) SELECT {body} as col1 FROM ct"


def run_probe(
    spark: SparkSession,
    expression: str,
    param_types: dict[str, str] | None = None,
) -> ProbeResult:
    ensure_datatypes_view(spark)
    sql = build_probe_sql(expression, param_types)
    try:
        df = spark.sql(sql)
        rows = df.limit(1).collect()
    except Exception as e:  # surface Spark analysis errors per-rule
        return ProbeResult(status="error", message=str(e))
    fields = df.schema.fields
    if len(fields) != 1 or fields[0].name != "col1":
        # miniSparky.py:73-77
        extra = [f.name for f in fields[1:]] or [fields[0].name]
        return ProbeResult(
            status="error",
            message=f"Extraneous input detected: {', '.join(extra)}",
        )
    field = fields[0]
    if rows and rows[0][0] is None:
        # miniSparky.py:66-72
        return ProbeResult(
            status="warning",
            data_type=field.dataType.simpleString(),
            schema_json=field.dataType.json(),
            message="improper type casting",
        )
    return ProbeResult(
        status="success",
        data_type=field.dataType.simpleString(),
        schema_json=field.dataType.json(),
    )


def check_boolean(
    spark: SparkSession,
    expression: str,
    param_types: dict[str, str] | None = None,
    context: str = "expression",
) -> None:
    """Relation predicates / channel filters must type-check to boolean
    (impc_update_test_results.sql:36-48,65-76)."""
    res = run_probe(spark, expression, param_types)
    if res.status == "error":
        raise ProjectError(f"{context} failed type check: {res.message}")
    if res.data_type != "boolean":
        raise ProjectError(
            f"{context} must be boolean, got {res.data_type}: {expression!r}"
        )
