from dataforge_core_spark.streaming.pipeline import (  # noqa: F401
    compile_stream_source,
    stream_events,
    validate_stream_rules,
    windowed_aggregate,
    sessionize_stateful,
)
