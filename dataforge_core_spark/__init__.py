"""dataforge_core_spark — a PySpark-native declarative ELT engine.

A brand-new implementation (not a port) of the capabilities of
``dataforgelabs/dataforge-core``: YAML projects of *sources* (typed raw
attributes), *rules* (pure single-column Spark SQL expressions over
``[This]`` / ``[Source]`` tokens), *relations* (cardinality-annotated join
predicates) and *outputs* (mapped, filtered, optionally aggregated target
tables) are compiled entirely in-process into dependency-stratified Spark
DataFrame pipelines.

Architecture (Spark-first, no metadata database):

- ``model``     : dataclasses for the project model
- ``loader``    : YAML -> model with reference-equivalent validations
- ``parser``    : expression tokenizer + aggregate extractor
- ``paths``     : relation graph + BFS path auto-discovery
- ``plans``     : dependency stratification of the column DAG
- ``compiler``  : DataFrame pipeline builder (+ SQL text emitter)
- ``runner``    : topologically-ordered hub/output materialization
- ``probe``     : live-Spark expression type inference (datatypes view)
- ``functions`` : aggregate whitelist + result-type metadata
- ``operators`` : scale-out extensions (dedup, similarity, text, multimodal)
- ``streaming`` : Structured Streaming extension (reference-constrained)

Reference behaviors are cited by file:line of the snapshot at
``/root/reference`` throughout the codebase so parity can be checked.
"""

from dataforge_core_spark.model import (  # noqa: F401
    Project,
    Source,
    RawAttribute,
    Rule,
    Relation,
    Output,
    OutputColumn,
    Channel,
    Mapping,
)
from dataforge_core_spark.loader import load_project  # noqa: F401
from dataforge_core_spark.compiler import SourceCompiler  # noqa: F401
from dataforge_core_spark.runner import ProjectRunner  # noqa: F401

__version__ = "0.1.0"
