from dataforge_core_spark.sources.readers import read_source, write_output  # noqa: F401
