"""Pure-Python integer differential for the DD-style quantile sketch:
milli-quantization, bit-length log-bucketing, per-scope + merged
histograms and the nearest-rank bucket-lower-bound picks re-derived
with exact Python ints from the raw events parquet and compared to
sketch_dd_quantiles by equality — the SQL-free third derivation,
completing the set (minhash, PC fits, HLL, DD)."""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest

from tests.conftest import spark  # noqa: F401

SF = "/root/testdata/sf0.001"


def _bucket(m: int, s: int) -> tuple[int, int]:
    msb = max(m.bit_length(), 1)  # LENGTH(bin(m)): bin(0) = '0'
    w = 1 << max(msb - s, 0)
    return msb * (1 << s) + m // w, (m // w) * w


def _picks(hist: dict[int, tuple[int, int]]) -> tuple[int, int, list[int]]:
    ids = sorted(hist)
    n = sum(c for _lo, c in hist.values())
    out = []
    for q in (50, 90, 99):
        target = 1 + (q * (n - 1)) // 100
        cum = 0
        got = None
        for i in ids:
            lo, c = hist[i]
            cum += c
            if got is None and cum >= target:
                got = lo
        out.append(got)
    return n, len(ids), out


def test_dd_quantiles_match_python_ledger(spark):  # noqa: F811
    import dataforge_core_spark.operators.sketches as SK

    t = pq.read_table(f"{SF}/events.parquet")
    hists: dict[str, dict[int, tuple[int, int]]] = {}
    merged: dict[int, tuple[int, int]] = {}
    for et, v in zip(
        t.column("event_type").to_pylist(), t.column("value").to_pylist()
    ):
        if v is None or v < 0:
            continue
        m = math.floor(float(v) * 1000)
        bid, lo = _bucket(m, SK.HIST_S)
        for h in (hists.setdefault(et, {}), merged):
            plo, c = h.get(bid, (lo, 0))
            h[bid] = (plo, c + 1)
    hists["__all__"] = merged

    exp = {}
    for scope, h in hists.items():
        n, nb, (p50, p90, p99) = _picks(h)
        exp[scope] = (n, nb, p50, p90, p99)
    got = {
        r.scope: (
            r.n_total,
            r.n_buckets,
            r.est_p50_milli,
            r.est_p90_milli,
            r.est_p99_milli,
        )
        for r in SK.sketch_dd_quantiles(spark, SF).collect()
    }
    assert got == exp
