"""Capture .explain('formatted') output for declared queries.

Usage: python scripts/capture_plans.py <suffix> <lane> [<lane> ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<lane>_<suffix>.txt for each lane
(suffix: before/after; round dir defaults to r16).
Uses $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) like bench.py.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    lanes = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from dataforge_core_spark.session import get_spark

    spark = get_spark()
    qs = entry.all_queries()
    rd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rd)
    os.makedirs(outdir, exist_ok=True)
    for lane in lanes:
        df = qs[lane](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{lane}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
