"""One-off oracle check for named queries: ``python tests/quickcheck.py
name [name ...] [--sf DIR]``.  Mirrors tests/test_oracle.py's protocol
(row count + sorted-column values) without the pytest session overhead —
for fast iteration while developing a new operator."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_oracle import _duck, _normalize_rows  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    import __spark_entry__ as e

    q, o = e.all_queries(), e.all_oracles()
    rc = 0
    for name in args:
        sdf = q[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in o:
            print(f"{name}: rows-only, {len(srows)} rows")
            continue
        con = _duck(sf_dir)
        try:
            res = con.execute(o[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        finally:
            con.close()
        ok_cols = sorted(sdf.columns) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        cols, sn = _normalize_rows(list(sdf.columns), srows)
        _, dn = _normalize_rows(dcols, drows)
        mism = [(a, b) for a, b in zip(sn, dn) if a != b]
        ok = ok_cols and ok_n and not mism
        print(
            f"{name}: {'OK' if ok else 'FAIL'} rows={len(srows)}/{len(drows)}"
            f" cols_match={ok_cols} mismatches={len(mism)}"
        )
        if not ok:
            rc = 1
            if not ok_cols:
                print("  spark:", sorted(sdf.columns))
                print("  duck :", sorted(dcols))
            for a, b in mism[:3]:
                print("  spark:", a)
                print("  duck :", b)
    return rc


if __name__ == "__main__":
    sys.exit(main())
