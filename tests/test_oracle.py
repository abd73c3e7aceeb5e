"""Self-check mirroring the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet, compare row count + column names + values
(order-insensitive, column-name-sorted) — the same protocol the round
driver applies at sf0.01.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str):
    """Fresh connection with the parquet views registered.

    Callers must close it: duckdb 1.0 has an allocator flake
    (``std::bad_alloc`` on KB-sized blocks with >100 GB free RAM) that
    strikes REPEAT executions of the heavy list-CTE graph oracles on
    one connection — reproduced in isolation at iteration 2 of a
    pagerank-oracle loop, no Spark involved.  A fresh connection resets
    the allocator, so the harness runs each oracle execution on its own
    short-lived connection; never share one across queries (a poisoned
    connection fails everything after it), and never leak them (~130
    live instances also exhaust the process)."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _oracle_run(sf_dir: str, fn):
    """``fn(con)`` on a fresh connection, closed after; one retry on
    the duckdb-1.0 allocator flake (see ``_duck``)."""
    last = None
    for _ in range(2):
        con = _duck(sf_dir)
        try:
            return fn(con)
        except duckdb.OutOfMemoryException as e:  # pragma: no cover
            last = e
        finally:
            con.close()
    raise last


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm(x) for x in v))
    return v


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def _entry():
    import __spark_entry__ as e

    return e


def _pairs():
    e = _entry()
    q = e.all_queries()  # full inventory == driver contract
    o = e.all_oracles()
    assert set(e.queries()) == set(q), (
        "driver contract must expose the full implemented inventory"
    )
    assert set(e.oracle_sql()) == set(e.queries()), (
        "driver queries/oracles keysets must match"
    )
    return sorted(q), q, o


NAMES, _Q, _O = _pairs()


def _norm_spark_type(dt: str) -> str:
    dt = dt.lower()
    if dt in ("bigint", "long"):
        return "i64"
    if dt in ("int", "integer"):
        return "i32"
    if dt == "double":
        return "f64"
    if dt == "string":
        return "str"
    if dt == "boolean":
        return "bool"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "ts"
    if dt.startswith("decimal"):
        return "dec:" + dt.replace(" ", "")
    if dt.startswith("array"):
        return "arr"
    return dt


def _norm_arrow_type(t) -> str:
    s = str(t)
    if s == "int64":
        return "i64"
    if s == "int32":
        return "i32"
    if s in ("double", "float64"):
        return "f64"
    if s in ("string", "large_string"):
        return "str"
    if s == "bool":
        return "bool"
    if s == "date32[day]":
        return "date"
    if s.startswith("timestamp"):
        return "ts"
    if s.startswith("decimal") and "(" in s:
        return "dec:decimal(" + s.split("(")[1].rstrip(")").replace(
            " ", ""
        ) + ")"
    if s.startswith(("list", "large_list")):
        return "arr"
    return s


@pytest.mark.slow  # 192-pair sweep, multi-minute: deselected from the
# default profile (the round driver's own oracle gate re-runs every
# pair at gate scale; run locally with SPARK_GRAFT_SLOW_TESTS=1)
@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, sf_dir):
    q = _Q[name]
    sdf = q(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    if name not in _O:
        # rows-only check for non-SQL-expressible ops
        assert len(spark_rows) >= 0
        return

    def _fetch(con):
        res = con.execute(_O[name])
        return [d[0] for d in res.description], res.fetchall()

    duck_cols, duck_rows = _oracle_run(sf_dir, _fetch)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {sorted(spark_cols)} vs {sorted(duck_cols)}"
    )
    # dtype WIDTH parity, not just names: the driver's schema compare is
    # opaque, and an engine-side BIGINT vs oracle-side HUGEINT/decimal128
    # (DuckDB SUM) is exactly the knife-edge class that went red in
    # round 6 — gate it here so a new lane can't drift
    sdt = dict(sdf.dtypes)
    ddt = _oracle_run(
        sf_dir,
        lambda con: {
            f.name: f.type for f in con.execute(_O[name]).arrow().schema
        },
    )
    tmism = {
        c: (sdt[c], str(ddt[c]))
        for c in sdt
        if _norm_spark_type(sdt[c]) != _norm_arrow_type(ddt[c])
    }
    assert not tmism, f"{name}: dtype width mismatch {tmism}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    cols, s_norm = _normalize_rows(spark_cols, spark_rows)
    _, d_norm = _normalize_rows(duck_cols, duck_rows)
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mism, (
        f"{name}: {len(mism)} row mismatches; first 3 (cols={cols}): "
        + "; ".join(f"spark={a} duck={b}" for _, a, b in mism[:3])
    )


def test_entry_smoke(spark):
    e = _entry()
    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
