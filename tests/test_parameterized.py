"""Parameterized driver contract (__spark_entry__.queries_parameterized):
every entry's dials must be LIVE — running the fn at a non-default
setting and the oracle builder at the same setting must value-match,
the same Spark-vs-DuckDB protocol as tests/test_oracle.py."""

from __future__ import annotations

import pytest

from tests.test_oracle import _normalize_rows, _oracle_run

SF = "/root/testdata/sf0.001"


def _entry():
    import __spark_entry__ as e

    return e


def test_contract_shape():
    pq = _entry().queries_parameterized()
    assert "ann_ivf_search" in pq
    for name, spec in pq.items():
        assert set(spec) == {"fn", "params", "oracle_sql"}, name
        assert spec["params"], f"{name}: no dials declared"
        # the builder must accept every declared dial at its default
        sql = spec["oracle_sql"](**spec["params"])
        assert isinstance(sql, str) and "SELECT" in sql, name


@pytest.mark.parametrize(
    "name,params",
    [
        ("ann_ivf_search", {"nprobe": 3, "top_k": 5}),
        ("ann_ivf_pq", {"nprobe": 2}),
        ("ann_ivf_pq", {"pq_m": 4}),
        ("ann_ivf_pq", {"nprobe": 2, "pq_m": 16}),
        ("ann_ivf_pq_residual", {"nprobe": 2}),
        ("ann_ivf_pq_residual", {"pq_m": 4}),
        ("ann_ivf_pq_trained", {"nprobe": 2}),
        ("ann_ivf_search", {"nprobe": 4, "top_k": 3}),
        ("ann_ivf_search", {"nprobe": 1, "top_k": 7}),
        ("ann_filtered_search", {"nprobe": 3, "top_k": 4}),
        ("ann_semantic_decontaminate", {"nprobe": 3, "thresh_q": 300_000}),
        ("dedup_minhash", {"max_band_bucket": 25}),
        ("dedup_minhash", {"bands": 6, "rows": 2}),
        ("dedup_minhash", {"bands": 2, "rows": 6, "max_band_bucket": 100}),
        ("embeddings_top_pcs", {"n_pc": 3}),
        ("embeddings_whiten", {"n_pc": 3}),
        ("dedup_cos_threshold_curve", {"bucket_cap": 10}),
        ("stream_near_dedup", {"threshold": 0.35}),
        ("stream_semantic_gate", {"nprobe": 4, "thresh_q": 300_000}),
        ("stream_ann_topk", {"nprobe": 2, "top_k": 5}),
        # cap 2 forces the salt guard on the planted-dup-heavy fixture
        ("multimodal_phash_neardup", {"max_bucket": 2}),
        # cap 5 forces the salt guard on the slope-concentrated buckets
        ("multimodal_audio_neardup", {"max_bucket": 5}),
        # tighter near-dup radii (still pigeonhole-exact below bands-1);
        # ham_max 0 = exact-duplicate-only reading of the same index
        ("multimodal_phash_neardup", {"ham_max": 1}),
        ("multimodal_phash_neardup", {"ham_max": 0, "max_bucket": 2}),
        ("multimodal_audio_neardup", {"ham_max": 2}),
        # simhash verify threshold: the pigeonhole-exact radius (3),
        # identical-hash-only (0), and a wider recall sweep (20); the
        # bucket cap forces the salt guard
        ("dedup_simhash_pairs", {"ham_max": 3}),
        ("dedup_simhash_pairs", {"ham_max": 0}),
        ("dedup_simhash_pairs", {"ham_max": 20, "max_block_bucket": 10}),
        ("train_perplexity_filter", {"pct": 50}),
        ("ann_mrl_rerank", {"c_short": 16}),
        ("train_ingest_decision", {"media_policy": "reject"}),
        # sequence-length retarget: shorter context window, denser packs
        ("train_pack", {"token_budget": 256}),
        # non-overlapping chunks (stride == window) and gap subsampling
        ("train_chunk", {"chunk_tokens": 32, "chunk_stride": 32}),
        ("train_chunk", {"chunk_tokens": 16, "chunk_stride": 48}),
        # finer boilerplate granularity: shorter repeated chrome spans
        ("dedup_boilerplate", {"span": 8}),
        # tighter per-domain cap and a wider vocabulary cut
        ("train_cap_per_source", {"cap": 5}),
        ("train_top_tokens", {"k": 25}),
        # tighter inactivity gap splits sessions the default merges
        ("events_sessionize", {"gap_min": 5}),
        # bounded stage-completion windows (stage gaps on this corpus
        # run ~100-5400 min, so both settings actually drop converts)
        ("events_funnel", {"window_min": 1440}),
        ("events_funnel", {"window_min": 120}),
        # denser / sparser corruption and span-length retargets
        ("train_span_corruption", {"rate_pct": 30}),
        ("train_span_corruption", {"rate_pct": 5, "span_max": 1}),
        ("train_span_corruption", {"span_max": 8}),
        # bot-filter strictness: lower volume floor, stricter CV²
        # rational, and a looser-than-Poisson sweep point
        ("events_bot_detection", {"min_gaps": 5}),
        ("events_bot_detection", {"cv2_num": 1, "cv2_den": 2}),
        ("events_bot_detection", {"min_gaps": 50, "cv2_num": 9, "cv2_den": 8}),
        # tighter hot-shingle cap (forces the df guard on planted
        # dups) and a stricter near-dup cut
        ("dedup_ngram_jaccard", {"max_shingle_df": 5}),
        ("dedup_ngram_jaccard", {"threshold": 0.5}),
        ("dedup_ngram_jaccard", {"max_shingle_df": 3, "threshold": 0.05}),
    ],
)
def test_dials_are_live(name, params, spark):
    spec = _entry().queries_parameterized()[name]
    sdf = spec["fn"](spark, SF, **params)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    if "query_id" in spark_cols and "top_k" in params:
        # top_k must actually bind: no query may exceed it
        per_q = {}
        for r in spark_rows:
            per_q[r[0]] = per_q.get(r[0], 0) + 1
        assert max(per_q.values()) <= params["top_k"]

    sql = spec["oracle_sql"](**params)

    def _fetch(con):
        res = con.execute(sql)
        return [d[0] for d in res.description], res.fetchall()

    duck_cols, duck_rows = _oracle_run(SF, _fetch)
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    cols, s_norm = _normalize_rows(spark_cols, spark_rows)
    _, d_norm = _normalize_rows(duck_cols, duck_rows)
    mism = [x for x in zip(s_norm, d_norm) if x[0] != x[1]]
    assert not mism, f"{name}{params}: {len(mism)} row mismatches"


def test_nprobe_widens_candidates(spark):
    """Monotonicity: a higher nprobe can only improve agreement with
    brute force (more cells scanned => recall non-decreasing)."""
    import dataforge_core_spark.operators.similarity as S

    brute = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_bruteforce(spark, SF).collect()
    }
    rec = []
    for nprobe in (1, 4, 8):
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.ann_ivf_search(spark, SF, nprobe=nprobe).collect()
        }
        rec.append(len(got & brute) / len(brute))
    assert rec[0] <= rec[1] <= rec[2]
    # nprobe=K scans every cell == exact WHILE every cell fits under
    # IVF_CELL_CAP (true at every test sf; above the cap the search
    # intentionally measures nprobe loss + cap loss — see the
    # ann_nprobe_recall_curve docstring).  Guard the regime so the
    # assertion can't silently turn into a flake at a bigger fixture.
    from dataforge_core_spark.operators.similarity import IVF_CELL_CAP

    af, _cv = S._kmeans_index(spark, SF)
    max_cell = spark.sql(
        f"SELECT max(cnt) m FROM (SELECT cid, count(*) cnt FROM {af} "
        "GROUP BY cid)"
    ).collect()[0].m
    assert max_cell <= IVF_CELL_CAP, "fixture outgrew the cap regime"
    assert rec[2] == 1.0  # exact in the cap regime


def test_curve_nprobe1_matches_recall_eval(spark):
    """Cross-lane referee: ann_nprobe_recall_curve's nprobe=1 rows must
    equal ann_recall_eval (both are recall@K of the nprobe=1 search vs
    brute force, built through different plans)."""
    import dataforge_core_spark.operators.similarity as S

    curve = {
        r.query_id: (r.n_exact, r.n_hits)
        for r in S.ann_nprobe_recall_curve(spark, SF).collect()
        if r.nprobe == 1
    }
    ref = {
        r.query_id: (r.n_exact, r.n_hits)
        for r in S.ann_recall_eval(spark, SF).collect()
    }
    assert curve == ref


def test_pc2_orthogonal_to_pc1(spark):
    """Deflation sanity: the fitted second direction must be
    near-orthogonal to the first (|cos| small — exact orthogonality is
    not preserved by the 1e6 fixed-point ledger, but both engines share
    the same residual) and not a rescaling of it."""
    import math

    import dataforge_core_spark.operators.similarity as S

    pc1 = dict(S._fit_top_pc(spark, SF))
    pc2 = dict(S._fit_top_pc2(spark, SF))
    assert set(pc1) == set(pc2) == set(range(S.DIM))
    dot = sum(pc1[i] * pc2[i] for i in range(S.DIM))
    n1 = math.sqrt(sum(v * v for v in pc1.values()))
    n2 = math.sqrt(sum(v * v for v in pc2.values()))
    assert n1 > 0 and n2 > 0
    assert abs(dot) / (n1 * n2) < 0.05


def test_abtt_proj1_matches_pc_project_and_reduces_energy(spark):
    """Cross-lane referee: embeddings_abtt's proj1_q must equal
    embeddings_pc_project's proj_q (same definition through different
    plans), and removing two directions can only reduce a vector's
    energy: resid_ssq_q <= ssq of the original quantized components."""
    import dataforge_core_spark.operators.similarity as S

    abtt = {r.vec_id: r for r in S.embeddings_abtt(spark, SF).collect()}
    proj = {
        r.vec_id: r.proj_q
        for r in S.embeddings_pc_project(spark, SF).collect()
    }
    assert set(abtt) == set(proj)
    assert all(abtt[v].proj1_q == proj[v] for v in proj)
    x = S._xq_view(spark, SF)
    ssq = {
        r.vec_id: r.ssq
        for r in spark.sql(
            f"SELECT vec_id, CAST(SUM(eq * eq) DIV {S.PI_SCALE} AS BIGINT)"
            f" AS ssq FROM {x} GROUP BY vec_id"
        ).collect()
    }
    # quantization slack: one ledger unit per removed direction
    assert all(abtt[v].resid_ssq_q <= ssq[v] + 2 for v in abtt)


def test_kmv_k_curve_k64_matches_kmv_distinct(spark):
    """Cross-lane referee: the K=64 rows of the sketch-size curve must
    equal sketch_kmv_distinct (same estimator through different
    plans), and each scope's bottom-k rows must nest (prefix
    property => estimates exist for every K)."""
    import dataforge_core_spark.operators.sketches as SK

    curve = {
        (r.scope, r.k): (r.n_exact, r.kmv_est, r.err_ppm)
        for r in SK.sketch_kmv_k_curve(spark, SF).collect()
    }
    ref = {
        r.scope: (r.n_exact, r.kmv_est, r.err_ppm)
        for r in SK.sketch_kmv_distinct(spark, SF).collect()
    }
    assert {s for s, _k in curve} == set(ref)
    for s, v in ref.items():
        assert curve[(s, max(SK.KMV_K_GRID))] == v, s
    for k in SK.KMV_K_GRID:
        assert {s for s, kk in curve if kk == k} == set(ref)


def test_band_layout_refinement_chain(spark):
    """Monotone refinement along the divisor chain: every full r-row
    band match implies a match of each of its sub-bands, so the
    verified pair set can only grow as rows shrink —
    (1x12) <= (4x3) <= (12x1).  The liveness half of the (bands, rows)
    dial: the inclusions must also be strict somewhere at this fixture
    or the dial isn't doing anything."""
    import dataforge_core_spark.operators.dedup as D

    sets = {}
    for bands, rows in ((1, 12), (4, 3), (12, 1)):
        sets[bands] = {
            (r.doc_a, r.doc_b)
            for r in D.dedup_minhash(
                spark, SF, bands=bands, rows=rows
            ).collect()
        }
    assert sets[1] <= sets[4] <= sets[12]
    assert sets[1] != sets[12], "layout dial is dead at this fixture"


def test_band_curve_matches_dialed_operator(spark):
    """Cross-lane referee closing the tuning loop (r10 verdict #6): the
    S-curve's total caught count at layout (bc, 12/bc) must equal the
    number of production-verified pairs the DIALED operator also finds
    at that layout — the curve prices exactly the operator the dial
    instantiates.  (Exact while no band bucket exceeds the cap: the
    curve's caught flag is unsalted; true by construction at this
    fixture, |docs| < MAX_BAND_BUCKET.)"""
    import dataforge_core_spark.operators.dedup as D

    prod = {
        (r.doc_a, r.doc_b) for r in D.dedup_minhash(spark, SF).collect()
    }
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n_docs <= D.MAX_BAND_BUCKET, "fixture outgrew the unsalted regime"
    caught = {}
    for r in D.dedup_lsh_band_curve(spark, SF).collect():
        caught[r.bands] = caught.get(r.bands, 0) + r.n_caught
    for bc in (1, 2, 6, 12):
        got = {
            (r.doc_a, r.doc_b)
            for r in D.dedup_minhash(
                spark, SF, bands=bc, rows=12 // bc
            ).collect()
        }
        assert caught[bc] == len(got & prod), f"bands={bc}"


def test_top_pcs_orthogonal_family_and_matches_single_lanes(spark):
    """Multi-PC whitening invariants (r10 verdict #5): the N_PC fitted
    directions are pairwise near-orthogonal (deflation sanity — exact
    orthogonality is not preserved by the 1e6 ledger, but |cos| must
    stay small), none is degenerate, and the pc=1/pc=2 rows equal the
    standalone embeddings_top_pc / embeddings_top_pc2 lanes (the fits
    are shared, so this pins the frame assembly, not just the math)."""
    import math

    import dataforge_core_spark.operators.similarity as S

    rows = S.embeddings_top_pcs(spark, SF).collect()
    dirs = {}
    for r in rows:
        dirs.setdefault(r.pc, {})[r.dim] = r.pc_q
    assert set(dirs) == set(range(1, S.N_PC + 1))
    norms = {}
    for pc, v in dirs.items():
        assert set(v) == set(range(S.DIM))
        norms[pc] = math.sqrt(sum(q * q for q in v.values()))
        assert norms[pc] > 0
    for a in range(1, S.N_PC + 1):
        for b in range(a + 1, S.N_PC + 1):
            dot = sum(dirs[a][i] * dirs[b][i] for i in range(S.DIM))
            assert abs(dot) / (norms[a] * norms[b]) < 0.05, (a, b)
    pc1 = {r.dim: r.pc_q for r in S.embeddings_top_pc(spark, SF).collect()}
    pc2 = {r.dim: r.pc2_q for r in S.embeddings_top_pc2(spark, SF).collect()}
    assert dirs[1] == pc1
    assert dirs[2] == pc2


def test_whiten_extends_abtt_and_reduces_energy(spark):
    """embeddings_whiten is abtt continued to N_PC directions: its
    proj1_q/proj2_q equal abtt's verbatim (same fits, same ledger), and
    removing two MORE directions can only reduce the residual energy —
    resid_ssq_q(whiten) <= resid_ssq_q(abtt) + quantization slack."""
    import dataforge_core_spark.operators.similarity as S

    wh = {r.vec_id: r for r in S.embeddings_whiten(spark, SF).collect()}
    ab = {r.vec_id: r for r in S.embeddings_abtt(spark, SF).collect()}
    assert set(wh) == set(ab)
    for v in wh:
        assert wh[v].proj1_q == ab[v].proj1_q, v
        assert wh[v].proj2_q == ab[v].proj2_q, v
        # one ledger unit of slack per extra removed direction
        assert wh[v].resid_ssq_q <= ab[v].resid_ssq_q + 2, v
        assert wh[v].resid_ssq_q >= 0, v


def test_cos_threshold_curve_monotone_and_matches_lane(spark):
    """Threshold-curve invariants: n_pairs/n_docs non-increasing in the
    threshold, and the production grid point (COSINE_DUP_THRESHOLD =
    0.400) reproduces dedup_embedding's pair count exactly — the curve
    prices the operator it tunes."""
    import dataforge_core_spark.operators.similarity as S

    rows = sorted(
        (r.thresh_milli, r.n_pairs, r.n_docs)
        for r in S.dedup_cos_threshold_curve(spark, SF).collect()
    )
    assert [t for t, _p, _d in rows] == sorted(S.COS_CURVE_GRID)
    for (t1, p1, d1), (t2, p2, d2) in zip(rows, rows[1:]):
        assert p1 >= p2 and d1 >= d2, (t1, t2)
    prod = dict((t, p) for t, p, _d in rows)[
        int(S.COSINE_DUP_THRESHOLD * 1000)
    ]
    assert prod == S.dedup_embedding(spark, SF).count()


def test_band_layout_rejects_oversized(spark):
    """A (bands, rows) layout needing more than MINHASH_N signature
    columns must fail loudly, not silently read garbage columns."""
    import pytest

    import dataforge_core_spark.operators.dedup as D

    with pytest.raises(ValueError, match="exceeds"):
        D.dedup_minhash(spark, SF, bands=5, rows=3)
    with pytest.raises(ValueError, match="exceeds"):
        D.dedup_minhash(spark, SF, bands=0, rows=1)


def test_ham_max_dial_monotone_and_bounded(spark):
    """Tightening ham_max can only shrink the near-dup neighborhood
    (pairs are filtered by hamming <= ham_max over the same candidate
    set), and widening past the pigeonhole-exact bound (bands - 1) is
    rejected — a wider radius needs more bands, not a bigger threshold
    on this index."""
    import pytest

    import dataforge_core_spark.operators.multimodal as M

    by_ham = {
        h: {r["doc_id"]: r["n_near"]
            for r in M.multimodal_phash_neardup(spark, SF, ham_max=h)
            .collect()}
        for h in range(M.PHASH_BANDS)
    }
    for h in range(1, M.PHASH_BANDS):
        assert set(by_ham[h]) == set(by_ham[h - 1])  # full LEFT-join base
        assert all(
            by_ham[h - 1][d] <= by_ham[h][d] for d in by_ham[h]
        ), f"n_near not monotone in ham_max at {h}"

    with pytest.raises(ValueError, match="pigeonhole"):
        M.multimodal_phash_neardup(spark, SF, ham_max=M.PHASH_BANDS)
    with pytest.raises(ValueError, match="pigeonhole"):
        M.multimodal_audio_neardup(spark, SF, ham_max=-1)

    # simhash: recall/cost semantics — any threshold on the 64-bit
    # distance domain is valid, outside it is not
    import dataforge_core_spark.operators.simhash as SH

    with pytest.raises(ValueError, match="64-bit"):
        SH.dedup_simhash_pairs(spark, SF, ham_max=65)
    with pytest.raises(ValueError, match="64-bit"):
        SH.dedup_simhash_pairs(spark, SF, ham_max=-1)


def test_funnel_window_monotone_and_bounded(spark):
    """A tighter stage-completion window can only lose conversions
    (fewer clicks qualify as-after-view within the window, and the
    qualifying first_click is never earlier), and the dial actually
    binds on this corpus; window_min < 1 is rejected."""
    import pytest

    import dataforge_core_spark.operators.events as E

    unbounded = {
        r["user_id"]: (r["clicked"], r["converted"])
        for r in E.events_funnel(spark, SF).collect()
    }
    day = {
        r["user_id"]: (r["clicked"], r["converted"])
        for r in E.events_funnel(spark, SF, window_min=1440).collect()
    }
    assert set(day) == set(unbounded)  # the view base is unchanged
    assert all(day[u] <= unbounded[u] for u in day)  # True >= False
    assert sum(c for c, _ in day.values()) < sum(
        c for c, _ in unbounded.values()
    ), "window_min=1440 should drop some clicks on this corpus"

    with pytest.raises(ValueError, match="window_min"):
        E.events_funnel(spark, SF, window_min=0)


def test_k_recall_curve_referees_and_monotone(spark):
    """Cross-lane referee: ann_k_recall_curve's K=TOP_K rows equal the
    nprobe curve's nprobe=1 rows (same recall@TOP_K of the nprobe=1
    search, built through different rankings); per query, n_hits is
    non-decreasing in K and n_exact == K (corpus >> K at every sf)."""
    import dataforge_core_spark.operators.similarity as S

    rows = S.ann_k_recall_curve(spark, SF).collect()
    byq: dict = {}
    for r in rows:
        assert r.n_exact == r.k, (r.query_id, r.k)
        byq.setdefault(r.query_id, {})[r.k] = r.n_hits
    ks = sorted(S.ANN_K_GRID)
    for q, m in byq.items():
        assert set(m) == set(ks)
        for a, b in zip(ks, ks[1:]):
            assert m[a] <= m[b], q
    k10 = {
        r.query_id: (r.n_exact, r.n_hits)
        for r in rows
        if r.k == S.TOP_K
    }
    np1 = {
        r.query_id: (r.n_exact, r.n_hits)
        for r in S.ann_nprobe_recall_curve(spark, SF).collect()
        if r.nprobe == 1
    }
    assert k10 == np1


def test_mrl_rerank_anchors(spark):
    """Degenerate-dial anchors of the two-stage MRL eval: at
    c_short = TOP_K the two-stage and prefix-only readings share one
    candidate set (rerank reorders, membership identical), and at
    c_short >= corpus the two-stage result IS exact (recall 1.0)."""
    import dataforge_core_spark.operators.similarity as S

    at_k = S.ann_mrl_rerank(spark, SF, c_short=S.TOP_K).collect()
    assert all(r.n_hits_two_stage == r.n_hits_prefix_only for r in at_k)
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    full = S.ann_mrl_rerank(spark, SF, c_short=n).collect()
    assert all(r.recall == 1.0 for r in full)
    # and the production C sits strictly between: rerank must add hits
    # somewhere on this fixture (else the lane demonstrates nothing)
    prod = S.ann_mrl_rerank(spark, SF).collect()
    assert sum(r.n_hits_two_stage for r in prod) > sum(
        r.n_hits_prefix_only for r in prod
    )


def test_span_corruption_rate_monotone(spark):
    """The mask-position sets are NESTED in rate_pct (h % 100 < rate),
    so row count is non-decreasing and rate 100 masks every position;
    span_len never exceeds the span_max dial; out-of-domain dials are
    rejected."""
    import dataforge_core_spark.operators.training as T

    counts = {}
    for rate in (5, 15, 60, 100):
        rows = T.train_span_corruption(spark, SF, rate_pct=rate).collect()
        counts[rate] = len(rows)
        assert all(r.span_len <= T.SPAN_MAX for r in rows)
    assert counts[5] <= counts[15] <= counts[60] <= counts[100]
    assert counts[5] < counts[100], "rate dial not binding"
    n_positions = (
        T.train_span_corruption(spark, SF, rate_pct=100, span_max=1)
        .count()
    )
    assert n_positions == counts[100]
    wide = T.train_span_corruption(spark, SF, span_max=8).collect()
    assert max(r.span_len for r in wide) > T.SPAN_MAX, (
        "span_max dial not binding on this corpus"
    )
    for bad in ({"rate_pct": 0}, {"rate_pct": 150}, {"rate_pct": 2.5},
                {"span_max": 0}, {"span_max": True}):
        with pytest.raises(ValueError):
            T._span_sql("spark", **bad)


def test_bot_threshold_monotone(spark):
    """Stricter settings flag SUBSETS: raising min_gaps or shrinking
    the CV² rational can only unflag users (the gap statistics are
    setting-independent); degenerate dials are rejected."""
    import dataforge_core_spark.operators.events as E

    def flagged(**kw):
        return {
            r.user_id
            for r in E.events_bot_detection(spark, SF, **kw).collect()
            if r.is_bot
        }

    base = flagged()
    assert flagged(min_gaps=50) <= base
    assert flagged(cv2_num=1, cv2_den=2) <= base
    assert base <= flagged(min_gaps=5)
    assert base <= flagged(cv2_num=9, cv2_den=8)
    looser = flagged(min_gaps=2, cv2_num=2, cv2_den=1)
    assert base <= looser and len(looser) > len(base), (
        "bot dials not binding on this corpus"
    )
    for bad in ({"min_gaps": 1}, {"min_gaps": 2.5}, {"cv2_den": 0},
                {"cv2_num": -1}, {"min_gaps": True}):
        with pytest.raises(ValueError):
            E._bot_sql("spark", **bad)


def test_ngram_jaccard_dials_monotone(spark):
    """Stricter settings flag SUBSETS: a higher threshold filters the
    same scored pairs, and a lower df cap can only shrink each pair's
    intersection count (sizes stay full, so Jaccard is non-increasing
    in the cap); degenerate dials are rejected."""
    import dataforge_core_spark.operators.dedup as D

    def pairs(**kw):
        return {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.dedup_ngram_jaccard(spark, SF, **kw).collect()
        }

    base = pairs()
    # the sf0.001 planted dups all score >= 0.95, so the binding
    # demonstration needs a cut inside the observed score range
    strict = pairs(threshold=0.96)
    assert set(strict) <= set(base)
    assert len(strict) < len(base), "threshold dial not binding"
    capped = pairs(max_shingle_df=3)
    assert set(capped) <= set(pairs(threshold=0.0001)) or set(
        capped
    ) <= set(base) | set(capped)  # capped pairs score <= base pairs
    for k, v in capped.items():
        if k in base:
            assert v <= base[k] + 1e-12, "cap increased a Jaccard score"
    for bad in ({"max_shingle_df": 1}, {"max_shingle_df": 2.5},
                {"threshold": 0.0}, {"threshold": 1.5},
                {"threshold": True}):
        with pytest.raises(ValueError):
            D._ngram_oracle(**bad)
