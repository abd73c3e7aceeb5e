#!/usr/bin/env python
"""Reproduce the r12 driver-stamp bench inflation (r12 verdict item 1).

The official BENCH_r12 record (driver stamp) measured 0.703 s/query
while the builder's stamp of the SAME code 30 minutes earlier measured
0.539 — uniform session inflation plus concentrated outliers
(dedup_cluster_stats 0.29 -> 1.61s, stable across its in-session runs).
The driver's sequence differs from the builder's in exactly one way:
its bench shares a JVM with a FULL correctness sweep at sf0.01 run
just before (every queries() lane executed and collected, DuckDB
oracles run side-by-side).

This script replays that sequence in one process:

  phase A  - correctness-sweep simulation at sf0.01: every lane is
             executed AND collected (driver-style), with the DuckDB
             oracle run next to it (CPU/allocator pressure parity).
  phase B  - bench.main() in the same process (getOrCreate -> same
             JVM session), stamped with SPARK_GRAFT_BENCH_TAG=repro so
             it cannot clobber a round stamp.

Control arm = a plain `python bench.py` in a fresh process (the
builder's shape).  Compare BENCH_DETAIL_r13_repro.json against
BENCH_DETAIL_r13_control.json per suspect lane.

Usage:
  python scripts/driver_session_repro.py            # full replay (A+B)
  python scripts/driver_session_repro.py --skip-oracle   # A without DuckDB
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF001 = "/root/testdata/sf0.01"


def jvm_stats(spark) -> dict:
    """Driver-JVM pressure gauges: GC time/count, heap occupancy, and
    BlockManager block count — the candidate explanations for the r12
    driver-stamp inflation."""
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    gc_n = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += b.getCollectionTime()
        gc_n += b.getCollectionCount()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    # JIT CodeCache occupancy: a 380-execution session (sf0.01 sweep +
    # sf0.1 bench) generates thousands of codegen classes; if the code
    # cache fills, the JVM disables the JIT compiler process-wide —
    # exactly the uniform-inflation signature on the r12 driver stamp.
    pools = {}
    pit = mf.getMemoryPoolMXBeans().iterator()
    while pit.hasNext():
        p = pit.next()
        nm = p.getName()
        if "CodeHeap" in nm or "Metaspace" in nm or "CodeCache" in nm:
            u = p.getUsage()
            pools[nm] = {
                "used_mb": u.getUsed() // (1 << 20),
                "max_mb": (
                    u.getMax() // (1 << 20) if u.getMax() > 0 else -1
                ),
            }
    try:
        env = jvm.org.apache.spark.SparkEnv.get()
        status = env.blockManager().master().getStorageStatus()
        n_blocks = sum(status[i].numBlocks() for i in range(len(status)))
    except Exception:
        n_blocks = -1
    return {
        "gc_ms": gc_ms,
        "gc_count": gc_n,
        "heap_used_mb": heap.getUsed() // (1 << 20),
        "heap_committed_mb": heap.getCommitted() // (1 << 20),
        "n_blocks": n_blocks,
        "pools": pools,
    }


def phase_a(spark, run_oracle: bool = True) -> None:
    import __spark_entry__ as entry
    from tests.test_oracle import _oracle_run

    queries = entry.queries()
    oracles = entry.oracle_sql()
    t0 = time.perf_counter()
    for i, (name, q) in enumerate(queries.items()):
        t1 = time.perf_counter()
        df = q(spark, SF001)
        rows = df.collect()
        if run_oracle and name in oracles:

            def _fetch(con, _sql=oracles[name]):
                res = con.execute(_sql)
                return res.fetchall()

            _oracle_run(SF001, _fetch)
        print(
            f"[A {i + 1:3d}/{len(queries)}] {name}: {len(rows)} rows "
            f"{time.perf_counter() - t1:6.2f}s",
            flush=True,
        )
    print(f"[A] total {time.perf_counter() - t0:.1f}s", flush=True)


def main() -> None:
    run_oracle = "--skip-oracle" not in sys.argv
    os.environ.setdefault("SPARK_GRAFT_BENCH_TAG", "repro")

    from dataforge_core_spark.session import get_spark

    spark = get_spark(app_name="driver_session_repro")
    print("[jvm] fresh:", jvm_stats(spark), flush=True)
    phase_a(spark, run_oracle=run_oracle)
    print("[jvm] after A:", jvm_stats(spark), flush=True)

    # Phase B: bench in the SAME process/JVM (bench.main's get_spark
    # getOrCreate returns this session).
    import bench

    bench.main()
    print("[jvm] after B:", jvm_stats(spark), flush=True)


if __name__ == "__main__":
    main()
