"""Pure-Python integer differential for the HLL lane: universe build
(per-source distinct 3-gram md5 hashes), register tables, bucket-wise
`__all__` merge, and the WHOLE integer-exact estimator (harmonic sum,
two-step long division, Q14 alpha, qlog2 linear-counting correction)
re-derived with hashlib + exact Python ints and compared to
sketch_hll_distinct by equality — the SQL-free third derivation next
to the Spark plan and the DuckDB oracle."""

from __future__ import annotations

import hashlib
import math
import re

import pyarrow.parquet as pq
import pytest

from tests.conftest import spark  # noqa: F401

SF = "/root/testdata/sf0.001"


def _qlog2(n: int) -> int:
    # text._qlog2's exact definition: top-10-bit mantissa via the
    # floor(log2 * 1e4) lookup + 1e4 * shift
    b = n.bit_length()
    e = max(b - 10, 0)
    mant = n >> e
    return math.floor(math.log2(mant) * 10000) + 10000 * e


def _py_universe() -> dict[str, set[int]]:
    t = pq.read_table(f"{SF}/documents.parquet")
    out: dict[str, set[int]] = {}
    for src, text in zip(
        t.column("source").to_pylist(), t.column("text").to_pylist()
    ):
        if text is None:
            continue
        toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
        s = out.setdefault(src, set())
        for i in range(len(toks) - 2):
            sh = " ".join(toks[i : i + 3])
            s.add(int(hashlib.md5(sh.encode()).hexdigest()[:14], 16))
    return out


def _py_estimate(regs: dict[int, int], m: int, rmax: int,
                 alpha_q14: int) -> tuple[int, int, int]:
    v_zero = m - len(regs)
    sints = sum(1 << (rmax - r) for r in regs.values()) + v_zero * (
        1 << rmax
    )
    q, rem = divmod(m * (1 << rmax), sints)
    qc = min(q, 1 << 40)
    refine = (m * rem) // sints if sints < (1 << 55) else 0
    est_raw = (alpha_q14 * (m * qc + refine)) // (1 << 14)
    dq = _qlog2(m) - _qlog2(max(v_zero, 1))
    est_lin = (m * dq * 693147) // (10000 * 10**6)
    est = est_lin if (v_zero > 0 and est_raw <= (5 * m) // 2) else est_raw
    return v_zero, sints, est


def test_hll_lane_matches_python_ledger(spark):  # noqa: F811
    import dataforge_core_spark.operators.sketches as SK

    uni = _py_universe()
    w, rmax, m = SK._HLL_W, SK._HLL_RMAX, SK.HLL_M

    def regs_of(hs: set[int]) -> dict[int, int]:
        regs: dict[int, int] = {}
        for h in hs:
            b, ww = divmod(h, w)
            r = rmax if ww == 0 else rmax - ww.bit_length()
            regs[b] = max(regs.get(b, 0), r)
        return regs

    exp = {}
    merged: dict[int, int] = {}
    all_h: set[int] = set()
    for src, hs in uni.items():
        regs = regs_of(hs)
        for b, r in regs.items():
            merged[b] = max(merged.get(b, 0), r)
        all_h |= hs
        v_zero, _s, est = _py_estimate(regs, m, rmax, SK.ALPHA_Q14)
        n = len(hs)
        exp[src] = (n, v_zero, est, (1000000 * abs(est - n)) // n)
    v_zero, _s, est = _py_estimate(merged, m, rmax, SK.ALPHA_Q14)
    n = len(all_h)
    exp["__all__"] = (n, v_zero, est, (1000000 * abs(est - n)) // n)

    got = {
        r.scope: (r.n_exact, r.v_zero, r.hll_est, r.err_ppm)
        for r in SK.sketch_hll_distinct(spark, SF).collect()
    }
    assert got == exp


def test_kmv_lane_matches_python_ledger(spark):  # noqa: F811
    """Same SQL-free protocol for the KMV sketch: per-source bottom-K,
    the order-statistic estimate (exact when n < K), and the merged
    __all__ sketch (union of bottom-K sets re-truncated to bottom-K)
    re-derived with hashlib + exact Python ints and compared to
    sketch_kmv_distinct by equality."""
    import dataforge_core_spark.operators.sketches as SK

    uni = _py_universe()
    k, hspace = SK.KMV_K, 1 << 56

    def est_of(hs: set[int]) -> tuple[int, int]:
        bot = sorted(hs)[:k]
        n_kept, h_k = len(bot), (bot[-1] if bot else 0)
        est = n_kept if n_kept < k else ((k - 1) * hspace) // max(h_k, 1)
        return est, n_kept

    exp = {}
    merged: set[int] = set()
    all_h: set[int] = set()
    for src, hs in uni.items():
        est, _n = est_of(hs)
        n = len(hs)
        exp[src] = (n, est, (1000000 * abs(est - n)) // n)
        merged |= set(sorted(hs)[:k])
        all_h |= hs
    est, _n = est_of(merged)
    n = len(all_h)
    exp["__all__"] = (n, est, (1000000 * abs(est - n)) // n)

    got = {
        r.scope: (r.n_exact, r.kmv_est, r.err_ppm)
        for r in SK.sketch_kmv_distinct(spark, SF).collect()
    }
    assert got == exp


def test_simhash_signatures_match_python_ledger(spark):  # noqa: F811
    """SQL-free derivation of the simhash signatures: per token
    OCCURRENCE the 64-bit md5 prefix votes +-1 on each bit, digit =
    majority (ties set the bit) — recomputed with hashlib and compared
    to the lane's 16-hex signatures by equality for every doc."""
    import hashlib as _hl

    import dataforge_core_spark.operators.simhash as SH

    t = pq.read_table(f"{SF}/documents.parquet")
    hexd = "0123456789abcdef"
    exp = {}
    for did, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        toks = re.sub(r"\s+", " ", (text or "")).strip().lower().split(" ")
        sums = [[0] * 4 for _ in range(16)]
        for tk in toks:
            h = int(_hl.md5(tk.encode()).hexdigest()[:16], 16)
            for j in range(16):
                d = (h >> (60 - 4 * j)) & 15
                for k in range(4):
                    sums[j][k] += 1 if (d >> (3 - k)) & 1 else -1
        exp[did] = "".join(
            hexd[
                sum((8 >> k) if sums[j][k] >= 0 else 0 for k in range(4))
            ]
            for j in range(16)
        )
    got = {
        r.doc_id: r.simhash for r in SH._sig_df(spark, SF).collect()
    }
    assert got == exp


def test_kmv_setops_match_python_ledger(spark):  # noqa: F811
    """SQL-free re-derivation of the theta set algebra: per source
    pair, the merged bottom-K with membership flags, the union
    estimate, the exact floor-decomposed intersection product, the
    clamped differences and the exact baselines — compared to
    sketch_kmv_setops by equality."""
    import dataforge_core_spark.operators.sketches as SK

    uni = _py_universe()
    k, hspace = SK.KMV_K, 1 << 56

    def est(n_kept: int, h_k: int) -> int:
        return n_kept if n_kept < k else ((k - 1) * hspace) // max(h_k, 1)

    bots = {s: sorted(hs)[:k] for s, hs in uni.items()}
    exp = {}
    for sa in sorted(uni):
        for sb in sorted(uni):
            if sa >= sb:
                continue
            sa_set, sb_set = set(bots[sa]), set(bots[sb])
            merged = sorted(sa_set | sb_set)[:k]
            m_n = len(merged)
            m_inter = sum(1 for h in merged if h in sa_set and h in sb_set)
            est_u = est(m_n, merged[-1] if merged else 0)
            est_i = (est_u // m_n) * m_inter + ((est_u % m_n) * m_inter) // m_n
            est_a = est(len(bots[sa]), bots[sa][-1])
            est_b = est(len(bots[sb]), bots[sb][-1])
            n_i = len(uni[sa] & uni[sb])
            n_u = len(uni[sa] | uni[sb])
            exp[(sa, sb)] = (
                n_u, est_u, (1000000 * abs(est_u - n_u)) // n_u,
                n_i, est_i,
                len(uni[sa] - uni[sb]), max(est_a - est_i, 0),
                len(uni[sb] - uni[sa]), max(est_b - est_i, 0),
            )
    got = {
        (r.sa, r.sb): (
            r.n_union, r.est_union, r.err_union_ppm,
            r.n_inter, r.est_inter,
            r.n_diff_ab, r.est_diff_ab,
            r.n_diff_ba, r.est_diff_ba,
        )
        for r in SK.sketch_kmv_setops(spark, SF).collect()
    }
    assert got == exp
