"""Aggregate-function whitelist + result-type metadata.

Re-expresses the seed data of ``meta.aggregate``
(database/schema/"10 aggregateTable.sql":10-55 in /root/reference): the 45
aggregate functions a rule may apply over an M-cardinality relation path,
each with result-type metadata that drives enrichment typing.

``result_type``:
  None      -> result has the argument's type (subject to numeric_flag)
  otherwise -> fixed hive_type ("long", "double", "decimal", "boolean",
               "array", "string")
``numeric_flag`` -> argument must be numeric.

Every one of these maps to a Spark SQL built-in aggregate, so the engine
executes them JVM-side (whole-stage codegen) via ``F.expr`` — no UDAFs.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class AggregateInfo:
    name: str
    result_type: str | None  # fixed hive_type or None = same-as-arg
    numeric_flag: bool = False


_A = AggregateInfo

# name -> metadata; mirrors "10 aggregateTable.sql":11-54
AGGREGATE_WHITELIST: dict[str, AggregateInfo] = {
    a.name: a
    for a in [
        _A("any", "boolean"),
        _A("any_value", None),
        _A("approx_count_distinct", "long"),
        _A("approx_percentile", None, numeric_flag=True),
        _A("avg", "double", numeric_flag=True),
        _A("bit_or", "long", numeric_flag=True),
        _A("bit_xor", "long", numeric_flag=True),
        _A("bool_and", "boolean"),
        _A("bool_or", "boolean"),
        _A("some", "boolean"),
        _A("collect_list", "array"),
        _A("array_agg", "array"),
        _A("collect_set", "array"),
        _A("corr", "double", numeric_flag=True),
        _A("count", "long"),
        _A("count_if", "long"),
        _A("count_min_sketch", "string"),
        _A("covar_pop", "double", numeric_flag=True),
        _A("covar_samp", "double", numeric_flag=True),
        _A("every", "boolean"),
        _A("first", None),
        _A("first_value", None),
        _A("kurtosis", "double", numeric_flag=True),
        _A("last", None),
        _A("last_value", None),
        _A("max", None),
        _A("max_by", None),
        _A("mean", "double", numeric_flag=True),
        _A("median", "double", numeric_flag=True),
        _A("mode", None),
        _A("min", None),
        _A("min_by", None),
        _A("percentile", "double", numeric_flag=True),
        _A("percentile_approx", None, numeric_flag=True),
        _A("skewness", "double", numeric_flag=True),
        _A("std", "double", numeric_flag=True),
        _A("stddev", "double", numeric_flag=True),
        _A("stddev_pop", "double", numeric_flag=True),
        _A("stddev_samp", "double", numeric_flag=True),
        _A("schema_of_json_agg", "string"),
        _A("sum", None, numeric_flag=True),
        _A("var_pop", "double", numeric_flag=True),
        _A("var_samp", "double", numeric_flag=True),
        _A("variance", "double", numeric_flag=True),
    ]
}
