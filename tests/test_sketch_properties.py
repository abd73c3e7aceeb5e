"""Property-based tests (hypothesis) for the sketch algebra — the
pure-integer constructions the engines must agree on bit-for-bit.
These pin the PYTHON-side referee laws on arbitrary inputs; the
engine-vs-referee agreement on real data lives in
test_pipeline_invariants.py, and engine-vs-engine in test_oracle.py."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from dataforge_core_spark.operators.sketches import HIST_S, KMV_K


def _bucket(m: int, s: int = HIST_S) -> tuple[int, int]:
    """(bucket id, lower bound) — the same bit-length decomposition the
    SQL emits (LENGTH(bin(m)) == bit_length for m >= 1, 1 for m == 0)."""
    msb = m.bit_length() or 1
    sh = max(msb - s, 0)
    return (msb << s) + (m >> sh), (m >> sh) << sh


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1))
@settings(max_examples=300, deadline=None)
def test_dd_bucket_monotone_and_bounds(ms):
    """Bucket id must be monotone non-decreasing in the value (so
    cumulative-count quantile reads are order-correct), the lower bound
    must bracket the value within one relative bucket width, and values
    below 2^HIST_S must map to singleton buckets (exact)."""
    pairs = sorted((m, _bucket(m)) for m in ms)
    for (m1, (b1, lo1)), (m2, (b2, _)) in zip(pairs, pairs[1:]):
        assert b1 <= b2, (m1, m2)
    for m, (b, lo) in pairs:
        assert lo <= m
        width = 1 << max((m.bit_length() or 1) - HIST_S, 0)
        assert m < lo + width
        assert width - 1 <= (lo >> (HIST_S - 1)) or m < (1 << HIST_S)
        if m < (1 << HIST_S):
            assert lo == m  # exact region


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1),
    st.integers(min_value=2, max_value=7),
)
@settings(max_examples=200, deadline=None)
def test_dd_histogram_merge_is_global(ms, nparts):
    """Per-partition histograms merged by count addition == the global
    histogram, for ANY partitioning — the mergeability law the streaming
    lane's micro-batch accumulation and a 1000-executor map-side combine
    both rely on."""
    global_h = Counter(_bucket(m)[0] for m in ms)
    parts = [Counter() for _ in range(nparts)]
    for i, m in enumerate(ms):
        parts[i % nparts][_bucket(m)[0]] += 1
    merged = Counter()
    for p in parts:
        merged.update(p)
    assert merged == global_h


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 56) - 1),
        min_size=1,
        unique=True,
    ),
    st.integers(min_value=2, max_value=5),
)
@settings(max_examples=200, deadline=None)
def test_kmv_union_of_bottoms_is_global_bottom(hashes, nparts):
    """bottom-K(union of per-partition bottom-Ks) == bottom-K(all) —
    the law that lets the __all__ sketch be served from the per-source
    sketches without a second corpus scan: any global bottom-K element
    is necessarily in its own partition's bottom-K."""
    k = KMV_K
    parts = [[] for _ in range(nparts)]
    for i, h in enumerate(hashes):
        parts[i % nparts].append(h)
    union_of_bottoms = sorted(
        h for p in parts for h in sorted(p)[:k]
    )[:k]
    assert union_of_bottoms == sorted(hashes)[:k]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # token id
            st.integers(min_value=0, max_value=3),  # partition
        ),
        min_size=1,
    )
)
@settings(max_examples=200, deadline=None)
def test_cms_merge_and_one_sided(rows):
    """Cell-wise addition of per-partition CMS matrices == the global
    matrix, and the min-across-rows estimate never undercounts — for
    arbitrary token streams and partitionings (d=2, w=8 miniature so
    collisions actually occur)."""
    d, w = 2, 8

    def bucket(r, tok):
        return (tok * 31 + r * 17) % w  # any fixed hash family works

    global_m = Counter()
    parts = [Counter() for _ in range(4)]
    exact = Counter()
    for tok, p in rows:
        exact[tok] += 1
        for r in range(d):
            global_m[(r, bucket(r, tok))] += 1
            parts[p][(r, bucket(r, tok))] += 1
    merged = Counter()
    for p in parts:
        merged.update(p)
    assert merged == global_m
    for tok, cnt in exact.items():
        est = min(global_m[(r, bucket(r, tok))] for r in range(d))
        assert est >= cnt


def test_accuracy_eval_error_bounds(spark):
    """sketch_accuracy_eval rows must honor each family's guarantee on
    real data: DD quantile lower bounds never overshoot and sit within
    the 2^(1-HIST_S) relative band; CMS never undercounts; HLL rows
    match the standalone lane and stay within the estimator's sane
    range; every row's abs_err/err_ppm are consistent with
    (est, exact)."""
    import dataforge_core_spark.operators.sketches as SK

    sf = "/root/testdata/sf0.001"
    rows = SK.sketch_accuracy_eval(spark, sf).collect()
    assert {r.sketch for r in rows} == {"kmv", "dd", "cms", "hll"}
    for r in rows:
        assert r.abs_err == abs(r.est - r.exact), r
        assert r.err_ppm == (1000000 * r.abs_err) // max(r.exact, 1), r
        if r.sketch == "dd":
            assert r.est <= r.exact, r
            # bucket width w <= m * 2^(1-s): est==exact below 2^s
            assert r.est == r.exact or (r.exact - r.est) * (
                1 << (SK.HIST_S - 1)
            ) < r.exact, r
        elif r.sketch == "cms":
            assert r.est >= r.exact, r
    # hll rows are the standalone lane's (scope, est, exact) verbatim
    hll_lane = {
        r.scope: (r.hll_est, r.n_exact)
        for r in SK.sketch_hll_distinct(spark, sf).collect()
    }
    hll_eval = {
        r.scope: (r.est, r.exact) for r in rows if r.sketch == "hll"
    }
    assert hll_eval == hll_lane
    # dd covers all three percentiles for every scope
    dd_scopes = {}
    for r in rows:
        if r.sketch == "dd":
            dd_scopes.setdefault(r.scope, set()).add(r.metric)
    assert "__all__" in dd_scopes
    assert all(
        v == {"p50_milli", "p90_milli", "p99_milli"}
        for v in dd_scopes.values()
    )


def test_hll_register_merge_is_global(spark):
    """HLL mergeability on real data: bucket-wise MAX of the per-source
    register tables must equal the registers of a direct global build —
    the property that lets 1000 executors sketch independently and
    combine.  Also pins the estimator's sane-range behavior: every
    scope's estimate within 3 sigma (sigma ~ 1.04/sqrt(m)) of exact."""
    import dataforge_core_spark.operators.sketches as SK

    sf = "/root/testdata/sf0.001"
    toks = SK._toks_view(spark, sf)
    w = SK._HLL_W
    rmax = SK._HLL_RMAX
    rows = spark.sql(
        f"""
        SELECT source, h DIV {w} AS bucket,
               CASE WHEN h % {w} = 0 THEN {rmax}
                    ELSE {rmax} - LENGTH(bin(h % {w})) END AS r
        FROM {toks}
        """
    ).collect()
    per_source: dict = {}
    direct: dict = {}
    for row in rows:
        key = (row.source, row.bucket)
        per_source[key] = max(per_source.get(key, 0), row.r)
        direct[row.bucket] = max(direct.get(row.bucket, 0), row.r)
    merged: dict = {}
    for (_s, b), r in per_source.items():
        merged[b] = max(merged.get(b, 0), r)
    assert merged == direct

    est = {
        r.scope: (r.hll_est, r.n_exact)
        for r in SK.sketch_hll_distinct(spark, sf).collect()
    }
    sigma = 1.04 / (SK.HLL_M ** 0.5)
    for scope, (e, exact) in est.items():
        assert abs(e - exact) <= 3 * sigma * exact + 2, (scope, e, exact)


def test_kmv_setops_algebra_referees(spark, sf_dir):
    """sketch_kmv_setops must be pure set algebra over the other two
    KMV lanes' quantities: per-source union estimates re-derive from
    sketch_kmv_distinct's estimator; est_inter re-derives as
    floor(est_union * m_inter / m_n) with (m_inter, m_n) exactly the
    theta-intersection counts behind sketch_kmv_jaccard's est_ppm; the
    differences are the clamped per-source remainders; and the exact
    baseline obeys inclusion-exclusion row-wise."""
    import dataforge_core_spark.operators.sketches as SK

    per_src = {
        r.scope: r.kmv_est
        for r in SK.sketch_kmv_distinct(spark, sf_dir).collect()
        if r.scope != "__all__"
    }
    jac = {
        (r.sa, r.sb): r.est_ppm
        for r in SK.sketch_kmv_jaccard(spark, sf_dir).collect()
    }
    rows = SK.sketch_kmv_setops(spark, sf_dir).collect()
    assert {(r.sa, r.sb) for r in rows} == set(jac)
    for r in rows:
        # inclusion-exclusion on the exact side
        assert r.n_union == r.n_diff_ab + r.n_diff_ba + r.n_inter
        # estimates are internally consistent
        assert 0 <= r.est_inter <= r.est_union
        assert r.est_diff_ab == max(per_src[r.sa] - r.est_inter, 0)
        assert r.est_diff_ba == max(per_src[r.sb] - r.est_inter, 0)
        # the intersection ratio matches the jaccard lane's estimate:
        # est_inter/est_union and est_ppm/1e6 are the same m_inter/m_n
        # rational, so floor(est_union * est_ppm / 1e6) can differ from
        # est_inter only by the two floors' interaction — bound it
        approx = (r.est_union * jac[(r.sa, r.sb)]) // 1_000_000
        assert abs(r.est_inter - approx) <= 1 + r.est_union // 1_000_000


def test_intersection_eval_referees(spark, sf_dir):
    """sketch_intersection_eval's theta side must equal
    sketch_kmv_setops' est_inter pair-for-pair (same machinery through
    a different statement), its exact baseline must match, and the
    HLL-IE side must re-derive from sketch_hll_distinct's per-source
    estimates plus the pair-union register merge (checked via the
    identity est_hll_ie = est_a + est_b - est_union, where the union
    estimate is recovered from the lane's own row)."""
    import dataforge_core_spark.operators.sketches as SK

    setops = {
        (r.sa, r.sb): (r.n_inter, r.est_inter)
        for r in SK.sketch_kmv_setops(spark, sf_dir).collect()
    }
    hll = {
        r.scope: r.hll_est
        for r in SK.sketch_hll_distinct(spark, sf_dir).collect()
    }
    rows = SK.sketch_intersection_eval(spark, sf_dir).collect()
    assert {(r.sa, r.sb) for r in rows} == set(setops)
    for r in rows:
        n_inter, est_inter = setops[(r.sa, r.sb)]
        assert r.n_inter == n_inter
        assert r.est_theta == est_inter
        # est_hll_ie = e_a + e_b - e_union: recover e_union and check
        # register-MAX monotonicity (union registers dominate each
        # side pointwise and the raw-branch estimator is monotone in
        # them; NO upper bound exists — estimator noise legitimately
        # puts e_union above e_a + e_b, which is exactly why IE
        # intersections go negative)
        e_union = hll[r.sa] + hll[r.sb] - r.est_hll_ie
        assert e_union >= max(hll[r.sa], hll[r.sb]) - 1, (
            "register-MAX union estimate below a single side"
        )


from hypothesis import given, strategies as st


@given(
    u=st.integers(min_value=0, max_value=(63 * (1 << 56))),
    i=st.integers(min_value=0, max_value=64),
    n=st.integers(min_value=1, max_value=64),
)
def test_theta_floor_decomposition_identity(u, i, n):
    """The overflow-free intersection product used by _theta_msk_ctes:
    (u // n) * i + ((u % n) * i) // n == (u * i) // n for every u up to
    the KMV estimator's ceiling and every 0 <= i <= n <= K — the
    identity that lets the SQL stay in int64 where the naive u*i
    product would overflow."""
    if i > n:
        i = n  # m_inter <= m_n by construction
    assert (u // n) * i + ((u % n) * i) // n == (u * i) // n
    # and the int64 ledger holds at the extremes
    assert (u // n) * i <= (1 << 63) - 1
    assert (u % n) * i < 64 * 64
