"""Project runner: topologically-ordered hub + output builds.

Replaces the reference's run.sql orchestration
(svc_generate_queries.sql:18-53,85-127 — sources leveled so that every
query reads already-materialized hubs; "Circular dependencies in sources"
on cycles) and the sequential statement runner
(cli/dataforge/databricks_sql.py:47-60).

Two execution modes:

- ``build()``         : hubs as *lazy* DataFrames — downstream reads compose
                        into one Catalyst plan (best for correctness tests
                        and for letting AQE see the whole pipeline)
- ``materialize(dir)``: hubs written to parquet level-by-level and re-read
                        (the reference's hub-table semantics — hubs are
                        reusable assets; at 100 TB this bounds any single
                        plan's size and makes each hub's stats available to
                        downstream joins)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dataforge_core_spark.compiler import SourceCompiler
from dataforge_core_spark.model import Project, ProjectError
from dataforge_core_spark.sources.readers import read_source, write_output


class ProjectRunner:
    def __init__(
        self,
        spark: SparkSession,
        project: Project,
        substitutions: dict[str, str] | None = None,
        persist_hubs: bool = True,
    ):
        self.spark = spark
        self.project = project
        self.substitutions = substitutions or {}
        self.compiler = SourceCompiler(spark, project)
        # Hubs are reusable assets in the reference (always materialized
        # tables).  In lazy build mode, downstream hubs re-expand every
        # referenced hub's plan per reference — persisting each hub keeps
        # one copy per hub (Catalyst does not dedup identical subtrees).
        # materialize() is the full parquet-checkpoint equivalent.
        self.persist_hubs = persist_hubs

    # ------------------------------------------------------------------
    def topo_order(self) -> list[list[str]]:
        """Source build levels (svc_generate_queries.sql:18-53).

        Sub-sources are not standalone hubs — their element rules compile
        into the parent hub's array enrichment (§2.11)."""
        deps: dict[str, set[str]] = {}
        for s in self.project.sources:
            if s.sub_source_parent:
                continue
            if s.processing_type == "stream":
                # stream sources run via streaming/, not the batch runner
                # (the reference routes them to meta.process, outside
                # run.sql — u_enr_query_generate_query.sql:101-104)
                continue
            plan = self.compiler.plan(s)
            deps[s.source_name] = set(plan.hub_deps)
        placed: set[str] = set()
        levels: list[list[str]] = []
        remaining = set(deps)
        while remaining:
            level = sorted(
                n for n in remaining if deps[n] <= placed
            )
            if not level:
                raise ProjectError(
                    "Circular dependencies in sources: "
                    + ", ".join(sorted(remaining))
                )
            levels.append(level)
            placed |= set(level)
            remaining -= set(level)
        return levels

    # ------------------------------------------------------------------
    def build(self) -> dict[str, DataFrame]:
        """Compile all hubs as lazy DataFrames, in dependency order."""
        by_name = self.project.source_by_name()
        hubs: dict[str, DataFrame] = {}
        for level in self.topo_order():
            for name in level:
                src = by_name[name]
                base = read_source(self.spark, src, self.substitutions)
                df = self.compiler.compile_source(src, base, hubs)
                hubs[name] = df.persist() if self.persist_hubs else df
        return hubs

    def build_outputs(
        self, hubs: dict[str, DataFrame] | None = None
    ) -> dict[str, DataFrame]:
        hubs = hubs if hubs is not None else self.build()
        return {
            out.output_name: self.compiler.compile_output(out, hubs)
            for out in self.project.outputs
        }

    # ------------------------------------------------------------------
    def materialize(self, base_dir: str) -> dict[str, str]:
        """Write hubs level-by-level (each level's hubs are independent),
        re-reading parquet for downstream levels; then write outputs.

        Returns {name: path}.  At scale each write is a natural pipeline
        checkpoint: downstream plans start from compact columnar files
        with accurate size stats (broadcast decisions stay correct).
        """
        from concurrent.futures import ThreadPoolExecutor

        by_name = self.project.source_by_name()
        paths: dict[str, str] = {}
        hubs: dict[str, DataFrame] = {}
        os.makedirs(base_dir, exist_ok=True)
        for level in self.topo_order():
            # hubs within a topological level are independent — submit
            # their writes concurrently (Spark's scheduler interleaves
            # the jobs; svc_generate_queries.sql orders only across
            # levels)
            def _write(name: str) -> None:
                src = by_name[name]
                base = read_source(self.spark, src, self.substitutions)
                df = self.compiler.compile_source(src, base, hubs)
                df.write.mode("overwrite").parquet(
                    os.path.join(base_dir, src.target_table)
                )

            if len(level) == 1:
                _write(level[0])
            else:
                with ThreadPoolExecutor(max_workers=len(level)) as pool:
                    list(pool.map(_write, level))
            for name in level:
                src = by_name[name]
                path = os.path.join(base_dir, src.target_table)
                paths[src.target_table] = path
                hubs[name] = self.spark.read.parquet(path)
        for out in self.project.outputs:
            df = self.compiler.compile_output(out, hubs)
            write_output(
                df,
                out.output_name,
                out.output_type,
                out.file_format,
                base_dir=base_dir,
            )
            if out.output_type in ("table", "file"):
                paths[out.output_name] = os.path.join(base_dir, out.output_name)
        return paths
