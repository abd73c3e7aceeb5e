from dataforge_core_spark.streaming.pipeline import (  # noqa: F401
    attribution_join,
    compile_stream_source,
    kafka_available,
    kafka_sink,
    kafka_source,
    sessionize_stateful,
    stream_documents,
    stream_embeddings,
    stream_events,
    stream_stream_join,
    validate_stream_rules,
    windowed_aggregate,
)
