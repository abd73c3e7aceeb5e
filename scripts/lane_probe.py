#!/usr/bin/env python
"""Isolate bench lanes: replicate bench.py's warmup + index phases,
then time the requested lanes N times each (noop sink), printing
per-run seconds.  For adjudicating whether a lane's bench number is a
lane property or a phase/position artifact.

Usage: python scripts/lane_probe.py [--runs N] [--sleep S] lane [lane ...]
  --runs N    runs per lane (default 6)
  --sleep S   seconds to sleep between index phase and queries
              (default 0; use e.g. 60 to let JIT/cleaner churn settle)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs, settle = 6, 0.0
    lanes: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sleep":
            settle = float(args[i + 1]); i += 2
        else:
            lanes.append(args[i]); i += 1

    import bench
    import __spark_entry__ as entry
    from dataforge_core_spark.session import get_spark

    sf_dir = bench.SF_DIR
    spark = get_spark(app_name="lane_probe")
    qs = entry.queries()

    # phase 1+2 exactly as bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    bench._clear_operator_caches(spark)
    t0 = time.perf_counter()
    _, wall = bench._run_index_builds(spark)
    print(f"index phase wall {wall:.1f}s", flush=True)
    if settle:
        time.sleep(settle)

    out = {}
    for name in lanes:
        q = qs[name]
        rs = []
        for _ in range(runs):
            t = time.perf_counter()
            q(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rs.append(round(time.perf_counter() - t, 3))
        out[name] = rs
        print(name, rs, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
