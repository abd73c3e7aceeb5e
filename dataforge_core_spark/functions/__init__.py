from dataforge_core_spark.functions.aggregates import (  # noqa: F401
    AGGREGATE_WHITELIST,
    AggregateInfo,
)
