#!/usr/bin/env python
"""Benchmark: run the headline queries end-to-end and print one JSON line.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Each query executes fully (noop sink — no driver collection) and is timed
wall-clock.  The metric value is the total seconds across all headline
queries at the given scale factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

EXCLUDE: set[str] = set()


def main() -> None:
    from dataforge_core_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="dataforge_bench")
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    queries = {k: v for k, v in entry.queries().items() if k not in EXCLUDE}

    # Warm the session before timing: executor-thread spin-up, parquet
    # datasource init, scan-path JIT.  Touches only the smallest table —
    # per-query caches/codegen still accrue to the queries that build
    # them.  (Standard warmup/measure separation; without it the
    # alphabetically-first query absorbs ~3s of one-time JVM cost.)
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    total = 0.0
    for name in sorted(queries):
        q = queries[name]
        t0 = time.perf_counter()
        df = q(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
