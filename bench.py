#!/usr/bin/env python
"""Benchmark: run the headline queries end-to-end and print one JSON line.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_RUNS)

Protocol (three phases):

1. **Session warmup** — one noop write of the smallest table, so
   executor-thread spin-up / parquet datasource init / scan JIT don't
   land on the alphabetically-first query.
2. **Index builds, timed cold** — operator-level shared indexes (the
   persisted shingle relation, minhash pair table, simhash signatures,
   normalized embeddings, the IVF k-means index, and the engine hub
   compile) are built from a cleared-cache state and each build is timed
   explicitly.  These are one-time costs a long-lived session pays once;
   previously they hid inside the first run's spread.
3. **Queries, timed warm** — each query executes fully (noop sink — no
   driver collection) N times (default 3); the per-query number is the
   MEDIAN, so one contended run on a noisy box cannot distort the
   record.  ``cold_s`` (first run) and ``warm_s`` (median of the rest)
   are recorded separately per query.

The final stdout line is kept deliberately COMPACT (the round driver's
tail capture is ~2000 chars; the full 89-query map overflowed it in
r6): totals + the 15 slowest lanes only, medians rounded to 2dp.  Full
detail — per-query cold/warm/spread/raw runs, the index-build split,
and totals — is written to BENCH_DETAIL.json next to this file.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
_REPO = os.path.dirname(os.path.abspath(__file__))
DETAIL_PATH = os.path.join(_REPO, "BENCH_DETAIL.json")


def _next_round() -> int:
    """Round number this bench run belongs to: one past the highest
    recorded CORRECTNESS round (the driver writes CORRECTNESS_r{N}
    after the round's bench)."""
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)", os.path.basename(p)))
    ]
    return max(rounds, default=0) + 1

EXCLUDE: set[str] = set()

# Lanes whose recorded spread exceeded their median (r6 driver record;
# ann_ivf_probe2 r7: runs [1.016, 0.903, 7.749] — one outlier polluted
# warm_s while the median was fine): 5 runs instead of 3 so the median
# is trustworthy for regression calls.
NOISY_LANES = {
    "dedup_simhash_pairs",
    "engine_subsource",
    "engine_subsource_chain",
    "engine_sql_artifact",
    "ann_ivf_probe2",
    # serial-CPU-bound (few tasks at sf0.1, see ROADMAP r9 note):
    # wall tracks host contention 1:1, r9 builder spread 2.2 > median
    "nested_roundtrip",
    # micro-batch state-store lanes with GC-sensitive commit costs:
    # r9 builder spreads 1.4/1.1 vs medians 1.9/2.1
    "stream_sessionize",
    "stream_attribution",
    # three ADC chains + exact baseline in one statement: the first
    # run pays multi-chain codegen/JIT (observed colds 2-3x the warm
    # runs), so 5 runs keep the median trustworthy
    "ann_pq_residual_recall",
}
NOISY_RUNS = 5


def _host_speed() -> float:
    """Pure-Python CPU microbenchmark (seconds; LOWER is faster) stamped
    into every bench record so cross-round lane ratios can be
    drift-normalized mechanically: r7 lost ~33% host speed mid-session
    and r8's driver host ran ~1.45x slower than the builder's — without
    a stamp, uniform host drift reads as a uniform perf regression.
    20M-iteration arithmetic loop, best of 3 (same probe the r7 drift
    was verified with)."""
    import time as _t

    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i * 3 // 7
        best = min(best, _t.perf_counter() - t0)
    # scale the 2M loop to the historical 20M-loop unit
    return round(best * 10, 3)


def _mt_probe_worker(_i: int) -> float:
    import time as _t

    t0 = _t.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * 3 // 7
    return _t.perf_counter() - t0


def _host_speed_mt(workers: int = 8) -> float:
    """The same arithmetic probe run in ``workers`` CONCURRENT
    processes (median worker time, scaled to the 20M unit).  The r12
    driver stamp inflated ~1.4x per lane while its single-thread
    host_speed matched the builder's — multi-core contention (another
    job sharing the box's cores) is invisible to a lone probe but
    inflates every 32-thread Spark stage.  A gap between this and
    host_speed_s in a stamp attributes uniform lane inflation to the
    environment, not the code."""
    import concurrent.futures as _cf
    import multiprocessing as _mp
    import statistics as _st

    try:
        # spawn, never fork: callers (the driver-replay harness, any
        # embedding of bench.main) may already have the Spark JVM's
        # py4j threads running, and forking a multi-threaded process
        # can deadlock a child on a copied lock — a hang the except
        # clause cannot catch (review fix, r13)
        ctx = _mp.get_context("spawn")
        with _cf.ProcessPoolExecutor(
            max_workers=workers, mp_context=ctx
        ) as ex:
            times = list(ex.map(_mt_probe_worker, range(workers)))
        return round(_st.median(times) * 10, 3)
    except Exception:  # pragma: no cover - sandboxed spawn failure
        return -1.0


def _cpu_ticks() -> list[int]:
    """Aggregate /proc/stat cpu ticks (user..guest_nice), [] off-Linux.
    Sampled at session start and end so the stamp carries the run's own
    STEAL share: r16 measured 6.1% steal with a ±17% per-vCPU spread
    under a full 32-wide spin on an 'idle' box — hypervisor-side
    throttling that inflates every straggler-bound stage while the
    single-thread host_speed probe and the MEDIAN-of-workers mt probe
    both stay in-band.  A stamp whose lanes read uniformly slow at
    in-band speed gauges but elevated steal is priced by the host, not
    the code."""
    try:
        with open("/proc/stat") as f:
            return [int(v) for v in f.readline().split()[1:]]
    except Exception:  # pragma: no cover - non-Linux
        return []


def _steal_pct(t0: list[int], t1: list[int]) -> float:
    """Steal share (%) of all cpu ticks between two _cpu_ticks samples;
    -1.0 when unavailable."""
    if not t0 or not t1 or len(t0) < 8 or len(t1) < 8:
        return -1.0
    tot = sum(b - a for a, b in zip(t0, t1))
    if tot <= 0:
        return -1.0
    return round(100.0 * (t1[7] - t0[7]) / tot, 2)


def _loadavg() -> list[float]:
    """Host 1/5/15-minute load averages, [-1,-1,-1] off-Linux.  The
    speed probes run ONCE, before the session — load arriving mid-run
    is invisible to them (r14: a builder stamp inflated uniformly at a
    QUIET pre-session mt gauge; /proc/loadavg during the follow-up
    probe read 7.26 with zero session processes running).  Sampled at
    start AND end so a stamp carries before/after evidence."""
    try:
        with open("/proc/loadavg") as f:
            return [round(float(x), 2) for x in f.read().split()[:3]]
    except Exception:  # pragma: no cover - non-Linux
        return [-1.0, -1.0, -1.0]


def _jvm_gauges(spark) -> dict:
    """Driver-JVM pressure gauges stamped into the detail record so an
    inflated official stamp carries its own diagnosis (r12: the driver
    record regressed 1.44x with no local repro — the replayed
    correctness-then-bench sequence measured FASTER than fresh, so the
    cause must be visible only on the driver's box/JVM)."""
    try:
        jvm = spark.sparkContext._jvm
        mf = jvm.java.lang.management.ManagementFactory
        gc_ms = 0
        it = mf.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            gc_ms += it.next().getCollectionTime()
        heap = mf.getMemoryMXBean().getHeapMemoryUsage()
        return {
            "gc_ms": gc_ms,
            "heap_used_mb": heap.getUsed() // (1 << 20),
            "heap_max_mb": heap.getMax() // (1 << 20),
            "driver_memory_conf": spark.conf.get(
                "spark.driver.memory", "unset"
            ),
        }
    except Exception:  # pragma: no cover - py4j surface drift
        return {}


def _clear_operator_caches(spark) -> None:
    """Drop every operator-level cache so index builds measure cold."""
    import __spark_entry__ as entry
    from dataforge_core_spark.operators import (
        dedup,
        multimodal,
        simhash,
        similarity,
        sketches,
        text,
        training,
    )
    from dataforge_core_spark.session import free_local_checkpoint

    # the DSIR feature-bucket relation (checkpointed)
    for _name, df in training._dsir_bkt_cache.values():
        free_local_checkpoint(df)
    training._dsir_bkt_cache.clear()
    # the five-gate ingest verdict relation (checkpointed)
    for df in training._ingest_base_cache.values():
        free_local_checkpoint(df)
    training._ingest_base_cache.clear()
    # merge tables are plain tuples (the train loop frees its own
    # blocks) — cleared so the timed train row measures a real build;
    # the encode lane's (word, n_pieces) vocabulary is checkpointed
    for df in text._bpe_wp_cache.values():
        free_local_checkpoint(df)
    text._bpe_wp_cache.clear()
    text._bpe_cache.clear()
    for _m, _u, _qv, _t, mdf, udf, cntdf in (
        text._ppl_model_cache.values()
    ):
        free_local_checkpoint(mdf)
        free_local_checkpoint(udf)
        free_local_checkpoint(cntdf)
    text._ppl_model_cache.clear()
    # the per-document LM score relation (checkpointed, r15)
    for _name, df in text._lm_scores_cache.values():
        free_local_checkpoint(df)
    text._lm_scores_cache.clear()
    for hubs, _outs in entry._hub_cache.values():
        for df in hubs.values():
            free_local_checkpoint(df)
    # both label caches hold localCheckpoint-ed frames — free the
    # blocks eagerly (clear() alone leaves them to the async
    # ContextCleaner, which lets superseded blocks linger through the
    # timed phase)
    for df in dedup._labels_cache.values():
        free_local_checkpoint(df)
    dedup._labels_cache.clear()
    for df in dedup._full_labels_cache.values():
        free_local_checkpoint(df)
    dedup._full_labels_cache.clear()
    for _p, _l, pos, lens in dedup._substr_cache.values():
        free_local_checkpoint(pos)
        free_local_checkpoint(lens)
    dedup._substr_cache.clear()
    for _b, _k, bands, kdf in dedup._nd_index_cache.values():
        free_local_checkpoint(bands)
        free_local_checkpoint(kdf)
    dedup._nd_index_cache.clear()
    for df in dedup._tokbase_cache.values():
        free_local_checkpoint(df)
    dedup._tokbase_cache.clear()
    for df in dedup._ex_cache.values():
        free_local_checkpoint(df)
    dedup._ex_cache.clear()
    for cache in (dedup._pairs_cache,):
        for df in cache.values():
            try:
                df.unpersist()
            except Exception:
                pass
        cache.clear()
    # the signature relation is checkpointed (narrow build) as of r15
    for df in simhash._sig_cache.values():
        free_local_checkpoint(df)
    simhash._sig_cache.clear()
    for df in simhash._salted_cache.values():
        free_local_checkpoint(df)
    simhash._salted_cache.clear()
    similarity._v_cache.clear()
    similarity._kmeans_cache.clear()
    similarity._centroid_cache.clear()
    # _pr_edges_cache holds views over the same checkpointed graph
    # frames _knn_cache owns — free the blocks once, clear both
    for df in similarity._knn_cache.values():
        free_local_checkpoint(df)
    similarity._knn_cache.clear()
    similarity._pr_edges_cache.clear()
    for _name, df in similarity._xq_cache.values():
        free_local_checkpoint(df)
    similarity._xq_cache.clear()
    similarity._top_pc_cache.clear()
    similarity._pc2_cache.clear()
    similarity._pcs_cache.clear()
    for _name, df in similarity._x2_cache.values():
        free_local_checkpoint(df)
    similarity._x2_cache.clear()
    for _out, ckpts in similarity._kcore_cache.values():
        for df in ckpts:
            free_local_checkpoint(df)
    similarity._kcore_cache.clear()
    for _name, df in similarity._sq_cache.values():
        free_local_checkpoint(df)
    similarity._sq_cache.clear()
    for _name, df in similarity._nprobe_scored_cache.values():
        free_local_checkpoint(df)
    similarity._nprobe_scored_cache.clear()
    for _name, df in similarity._pq_curve_cache.values():
        free_local_checkpoint(df)
    similarity._pq_curve_cache.clear()
    for _rn, _cn, _con, rs_df, cb_df, codes_df in (
        similarity._trained_cb_cache.values()
    ):
        free_local_checkpoint(rs_df)
        free_local_checkpoint(cb_df)
        free_local_checkpoint(codes_df)
    similarity._trained_cb_cache.clear()
    for cache in (similarity._pq_codes_cache, similarity._rpq_codes_cache):
        for _name, df in cache.values():
            free_local_checkpoint(df)
        cache.clear()
    for df in multimodal._phash_cache.values():
        free_local_checkpoint(df)
    multimodal._phash_cache.clear()
    # the stored salted LSH band tables (image + audio, per cap)
    for df in multimodal._salted_bands_cache.values():
        free_local_checkpoint(df)
    multimodal._salted_bands_cache.clear()
    for df in multimodal._afp_cache.values():
        free_local_checkpoint(df)
    multimodal._afp_cache.clear()
    for _name, df in multimodal._phash_probe_cache.values():
        free_local_checkpoint(df)
    multimodal._phash_probe_cache.clear()
    for _name, df in multimodal._afp_probe_cache.values():
        free_local_checkpoint(df)
    multimodal._afp_probe_cache.clear()
    for df in multimodal._phash_clusters_cache.values():
        free_local_checkpoint(df)
    multimodal._phash_clusters_cache.clear()
    for df in multimodal._afp_clusters_cache.values():
        free_local_checkpoint(df)
    multimodal._afp_clusters_cache.clear()
    for _name, df in sketches._toks_cache.values():
        free_local_checkpoint(df)
    sketches._toks_cache.clear()
    # the stored bottom-K sketch rows (r15)
    for _name, df in sketches._bk_cache.values():
        free_local_checkpoint(df)
    sketches._bk_cache.clear()
    for _name, df in sketches._hll_regs_cache.values():
        free_local_checkpoint(df)
    sketches._hll_regs_cache.clear()
    for _m, _t, mat, topdf in sketches._cms_cache.values():
        free_local_checkpoint(mat)
        free_local_checkpoint(topdf)
    sketches._cms_cache.clear()
    entry._hub_cache.clear()
    spark.catalog.clearCache()


# Builder dependency edges: which builders' cached artifacts each one
# consumes.  The index phase runs builders CONCURRENTLY (round-13: the
# sequential phase cost 49-55s, most of it per-build JIT / scheduling
# latency on otherwise idle executor threads; a real cluster submits
# independent index jobs concurrently too).  Declared edges keep a
# shared prologue from being raced into twice; conf-mutating builds
# (the CC label loops, the k-means Lloyd loop) additionally serialize
# their shuffle-width override through session.shuffle_override's lock.
_INDEX_DEPS: dict[str, list[str]] = {
    "engine_hub_compile": [],
    "token_base": [],
    "dedup_shingles": ["token_base"],
    "dedup_substr_positions": ["token_base"],
    "dedup_minhash_pairs": ["dedup_shingles"],
    "dedup_cluster_labels": ["dedup_minhash_pairs"],
    "near_dedup_probe_index": ["dedup_minhash_pairs"],
    "simhash_signatures": ["token_base"],
    "simhash_salted_bands": ["simhash_signatures"],
    # review fix (r13): _toks_view derives from dedup._ex_df — without
    # the edge, kmv and the shingle builders race the unguarded
    # _ex_cache/_tokbase_cache check-then-act at phase start
    "ann_normed": [],
    "ann_sq_codes": ["ann_normed"],
    "ann_knn_edges": ["ann_normed"],
    "ann_kcore_peel": ["ann_knn_edges"],
    "kmv_shingle_toks": ["dedup_shingles"],
    "kmv_bottomk": ["kmv_shingle_toks"],
    "cms_matrix": ["token_base"],
    "hll_registers": ["kmv_shingle_toks"],
    "embeddings_pc_fit": ["ann_normed"],
    "embeddings_pc2_fit": ["embeddings_pc_fit"],
    "embeddings_pcs_fit": ["embeddings_pc2_fit"],
    "embedding_cluster_labels": ["ann_normed"],
    "ann_ivf_kmeans_index": ["ann_normed"],
    "ann_outlier_centroids": ["ann_normed"],
    "pq_codes": ["ann_normed"],
    "pq_residual_codes": ["ann_ivf_kmeans_index"],
    "pq_trained_codebook": ["ann_ivf_kmeans_index"],
    "multimodal_phash_index": [],
    "phash_probe_index": ["multimodal_phash_index"],
    "phash_cluster_labels": ["multimodal_phash_index"],
    "phash_salted_bands": ["multimodal_phash_index"],
    "audio_afp_index": [],
    "afp_probe_index": ["audio_afp_index"],
    "afp_cluster_labels": ["audio_afp_index"],
    "afp_salted_bands": ["audio_afp_index"],
    "train_bpe_merge_train": [],
    # review fix (r13): text._ppl_model reads dedup._token_base_view
    "ppl_gate_model": ["token_base"],
    "lm_doc_scores": ["token_base"],
    "dsir_bucket_rows": [],
    # the stored five-gate verdict relation: each gate probes its own
    # stored index, so the base depends on all five (r14)
    "ingest_gate_base": [
        "near_dedup_probe_index",
        "phash_probe_index",
        "afp_probe_index",
        "ppl_gate_model",
        "ann_ivf_kmeans_index",
    ],
}


def _run_index_builds(spark) -> tuple[dict[str, float], float]:
    """Run every index builder, concurrently where the dependency
    edges allow, and return (per-builder wall seconds, phase wall
    seconds).  Per-builder times overlap under concurrency, so the
    PHASE wall is the session's real one-time cost; both are stamped.
    ``SPARK_GRAFT_INDEX_SEQ=1`` restores the sequential pre-r13
    behavior (then phase wall == sum of builds)."""
    import concurrent.futures as _cf

    builders = _index_builders()
    order = [name for name, _ in builders]
    thunks = dict(builders)
    missing = set(order) ^ set(_INDEX_DEPS)
    assert not missing, f"_INDEX_DEPS out of sync with builders: {missing}"
    # dict(builders) dedupes thunks; a duplicate name would make
    # len(done) unable to reach len(order) and the scheduler loop below
    # would spin forever — and the symmetric-difference check above
    # cannot see duplicates (r13 advice)
    assert len(set(order)) == len(order), (
        f"duplicate index-builder names: "
        f"{sorted(n for n in set(order) if order.count(n) > 1)}"
    )

    times: dict[str, float] = {}
    t_phase = time.perf_counter()

    def _run(name: str) -> None:
        t0 = time.perf_counter()
        thunks[name](spark)
        times[name] = round(time.perf_counter() - t0, 3)

    if os.environ.get("SPARK_GRAFT_INDEX_SEQ"):
        for name in order:
            _run(name)
        return times, round(time.perf_counter() - t_phase, 3)

    done: set[str] = set()
    in_flight: dict = {}
    # 4-way submission, not 8 (r16 measured, quiet box): 8 concurrent
    # builders oversubscribe the 32-thread local scheduler, so a
    # builder's WALL includes waiting on cores held by the other seven
    # — per-builder times (and their sum) read 2-7x the uncontended
    # cost and swing wildly run-to-run (pq_trained_codebook 2.9s <->
    # 20.9s between back-to-back stamps) without buying any phase wall
    # (w8 walls 37.7/39.6 vs w4 29.6/36.0; sums 221/276 vs 112/140;
    # sequential truth: sum == wall == 85.9).  Four in flight keeps the
    # tail back-filled (guide §2.6: 2-3 jobs in flight is plenty) and
    # keeps the stamped per-builder costs meaningful.
    workers = int(os.environ.get("SPARK_GRAFT_INDEX_WORKERS", "4"))
    with _cf.ThreadPoolExecutor(max_workers=workers) as ex:
        while len(done) < len(order):
            for name in order:
                if (
                    name not in done
                    and name not in in_flight
                    and all(d in done for d in _INDEX_DEPS[name])
                ):
                    in_flight[name] = ex.submit(_run, name)
            done_now, _ = _cf.wait(
                in_flight.values(), return_when=_cf.FIRST_COMPLETED
            )
            for name in [n for n, f in in_flight.items() if f in done_now]:
                in_flight.pop(name).result()  # re-raise builder errors
                done.add(name)
    return times, round(time.perf_counter() - t_phase, 3)


def _index_builders():
    """(name, thunk) per shared index, in dependency order (the
    sequential-fallback order; concurrent execution derives its
    schedule from _INDEX_DEPS)."""
    import __spark_entry__ as entry
    from dataforge_core_spark.operators import (
        dedup,
        multimodal,
        simhash,
        similarity,
        sketches,
        text,
        training,
    )

    return [
        # entry._build checkpoints every hub eagerly (see its comment),
        # so this build IS the materialization — hub/output query lanes
        # then read checkpointed blocks
        ("engine_hub_compile", lambda s: entry._build(s, SF_DIR)),
        # THE corpus tokenize pass — every token-consuming index below
        # (shingles, substring windows, CMS, simhash) derives from it
        ("token_base", lambda s: dedup._token_base(s, SF_DIR).count()),
        ("dedup_shingles", lambda s: dedup._ex_df(s, SF_DIR).count()),
        # the checkpointed sliding-window position relation (substring
        # measurement + removal lanes)
        (
            "dedup_substr_positions",
            lambda s: dedup._substr_views(s, SF_DIR),
        ),
        # pairs BEFORE labels: the cluster build consumes the cached
        # pair frame (otherwise the full minhash pipeline runs cold
        # inside the label timing and the pairs row measures a no-op)
        (
            "dedup_minhash_pairs",
            lambda s: dedup.dedup_minhash(s, SF_DIR).count(),
        ),
        (
            "dedup_cluster_labels",
            # the FULL-corpus assignment (singletons attached,
            # checkpointed) — what the cluster/stats/keep-best/report
            # lanes actually consume; builds the endpoint labels
            # transitively
            lambda s: dedup._full_labels(s, SF_DIR, False).count(),
        ),
        # the corpus-side probe index of the streaming near-dedup gate
        (
            "near_dedup_probe_index",
            lambda s: dedup._near_dedup_index(s, SF_DIR),
        ),
        (
            "simhash_signatures",
            lambda s: simhash._sig_df(s, SF_DIR).count(),
        ),
        # the checkpointed banded+salted LSH table (pairs base)
        (
            "simhash_salted_bands",
            lambda s: simhash._salted_bands(
                s, SF_DIR, simhash.MAX_BLOCK_BUCKET
            ).count(),
        ),
        ("ann_normed", lambda s: similarity._normed(s, SF_DIR)),
        # the checkpointed SQ8 code table
        (
            "ann_sq_codes",
            lambda s: similarity._sq_index_view(s, SF_DIR),
        ),
        # the checkpointed kNN edge list (pagerank / triangles base)
        (
            "ann_knn_edges",
            lambda s: similarity._knn_edges_view(s, SF_DIR),
        ),
        # the materialized k-core peel rounds (survivor node sets)
        (
            "ann_kcore_peel",
            lambda s: similarity.ann_kcore(s, SF_DIR).count(),
        ),
        # the checkpointed (source, shingle-hash) sketch universe
        (
            "kmv_shingle_toks",
            lambda s: sketches._toks_view(s, SF_DIR),
        ),
        # the stored bottom-K sketch rows (source, h, rn) — the KMV
        # counterpart of the HLL register table; five estimator lanes
        # read it instead of re-ranking the universe (r15)
        (
            "kmv_bottomk",
            lambda s: sketches._bk_view(s, SF_DIR),
        ),
        # the checkpointed CMS counter matrix + exact top tokens
        (
            "cms_matrix",
            lambda s: sketches._cms_views(s, SF_DIR),
        ),
        # the stored HLL register table (m=256 rows per source)
        (
            "hll_registers",
            lambda s: sketches._hll_regs_view(s, SF_DIR),
        ),
        # power-iteration PC fits (the whitening-direction index;
        # pc2 = deflation pass over the same checkpointed matrix)
        (
            "embeddings_pc_fit",
            lambda s: similarity._fit_top_pc(s, SF_DIR),
        ),
        (
            "embeddings_pc2_fit",
            lambda s: similarity._fit_top_pc2(s, SF_DIR),
        ),
        # deflation continued to N_PC directions (PCs 3-4: one deflate
        # pass + one chain each over the re-checkpointed residuals)
        (
            "embeddings_pcs_fit",
            lambda s: similarity._fit_top_pcs(s, SF_DIR),
        ),
        (
            "embedding_cluster_labels",
            lambda s: similarity.dedup_semantic_cluster(s, SF_DIR).count(),
        ),
        (
            "ann_ivf_kmeans_index",
            lambda s: similarity._kmeans_assignments(s, SF_DIR),
        ),
        (
            "ann_outlier_centroids",
            lambda s: similarity._label_centroids(s, SF_DIR),
        ),
        # the stored PQ code tables (raw + untrained-residual): encode
        # once per session, every ADC consumer reads codes
        (
            "pq_codes",
            lambda s: similarity._pq_codes_view(s, SF_DIR),
        ),
        (
            "pq_residual_codes",
            lambda s: similarity._rpq_codes_view(s, SF_DIR),
        ),
        # the trained residual-PQ codebook + its stored codes
        # (per-subspace Lloyd rounds over the checkpointed
        # residual-subvector relation; needs the k-means index above)
        (
            "pq_trained_codebook",
            lambda s: similarity._trained_rcb(s, SF_DIR),
        ),
        # the checkpointed image-hash index (the Python decode+hash
        # pass both phash lanes serve from)
        (
            "multimodal_phash_index",
            lambda s: multimodal._phash_df(s, SF_DIR).count(),
        ),
        # the corpus-side band table of the streaming image gate
        (
            "phash_probe_index",
            lambda s: multimodal._phash_probe_index(s, SF_DIR),
        ),
        # the stored salted LSH band table of the image near-dup lane
        (
            "phash_salted_bands",
            lambda s: multimodal._salted_hash_bands(
                s, SF_DIR, "phash", multimodal.MAX_PHASH_BUCKET
            ).count(),
        ),
        # the checkpointed audio-fingerprint index (the fused
        # synth+parse+fingerprint Arrow pass both audio-fp lanes
        # serve from)
        (
            "audio_afp_index",
            lambda s: multimodal._afp_df(s, SF_DIR).count(),
        ),
        # the corpus-side band table of the streaming audio gate
        (
            "afp_probe_index",
            lambda s: multimodal._afp_probe_index(s, SF_DIR),
        ),
        # the stored salted LSH band table of the audio near-dup lane
        (
            "afp_salted_bands",
            lambda s: multimodal._salted_hash_bands(
                s, SF_DIR, "afp", multimodal.MAX_AFP_BUCKET
            ).count(),
        ),
        # the audio dup-cluster labels (CC over the fingerprint pair
        # graph, cached in multimodal._afp_clusters_cache)
        (
            "afp_cluster_labels",
            lambda s: multimodal.multimodal_audio_clusters(
                s, SF_DIR
            ).count(),
        ),
        # the image dup-cluster labels (CC over the phash pair graph,
        # cached in multimodal._phash_clusters_cache)
        (
            "phash_cluster_labels",
            lambda s: multimodal.multimodal_phash_clusters(
                s, SF_DIR
            ).count(),
        ),
        # the BPE merge-train loop (its lane then serves literal rows)
        (
            "train_bpe_merge_train",
            lambda s: text.train_bpe_merges(s, SF_DIR).count(),
        ),
        # the stored LM-gate model (bigram scores + smoothing
        # denominators + threshold scalars, corpus split only)
        (
            "ppl_gate_model",
            lambda s: text._ppl_model(s, SF_DIR),
        ),
        # the per-document LM score relation — text_bigram_lm serves
        # it directly and the perplexity filter's threshold subtree and
        # output are projections over it (r15)
        (
            "lm_doc_scores",
            lambda s: text._lm_scores(s, SF_DIR),
        ),
        # the checkpointed DSIR (doc_id, bkt, is_bench) feature-bucket
        # relation (both DSIR passes + every lane run read it)
        (
            "dsir_bucket_rows",
            lambda s: training._dsir_bucket_view(s, SF_DIR),
        ),
        # the stored five-gate ingest verdict relation — both
        # media_policy decision lanes are projections over it
        (
            "ingest_gate_base",
            lambda s: training._ingest_base(s, SF_DIR).count(),
        ),
    ]


def main() -> None:
    from dataforge_core_spark.session import get_spark

    import __spark_entry__ as entry

    from pyspark.sql import SparkSession as _SS

    # Provenance: a session that existed BEFORE bench ran was
    # configured by the caller, not by get_spark — its JVM heap /
    # parallelism may differ from the 16g/local[32] bench baseline,
    # and that difference belongs in the stamp (r12: driver-stamp
    # inflation with no local repro).
    preexisting_session = _SS.getActiveSession() is not None
    # probe BEFORE creating the session when we can: with no JVM in
    # the process yet, the pool is safe under any start method
    host_speed_mt = _host_speed_mt()
    loadavg_start = _loadavg()
    cpu_ticks_start = _cpu_ticks()
    spark = get_spark(app_name="dataforge_bench")
    host_speed = _host_speed()
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    queries = {k: v for k, v in entry.queries().items() if k not in EXCLUDE}

    # Phase 1: session warmup (smallest table, noop sink) + one tiny
    # synthetic query exercising the engine machinery the index builds
    # use (shuffle, window, join, aggregate, md5/conv, posexplode):
    # first-touch costs — Janino/classloading, JIT of the shuffle
    # writer/sorter/codegen framework — land here instead of inside the
    # timed cold builds.  1000 synthetic rows; touches no operator cache.
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.sql(
        """
        WITH t AS (SELECT id, CAST(id % 37 AS STRING) s FROM range(1000)),
        x AS (SELECT id, s,
                     CAST(conv(substr(md5(s),1,14),16,10) AS BIGINT) h,
                     ROW_NUMBER() OVER (PARTITION BY s ORDER BY id) rn,
                     lead(id,1) OVER (PARTITION BY s ORDER BY id) nx
              FROM t),
        e AS (SELECT id, posexplode(array(s, s)) AS (p, tk) FROM t)
        SELECT a.s, COUNT(DISTINCT a.h) c, SUM(a.rn) r
        FROM x a JOIN x b ON a.s = b.s AND a.id < b.id
        JOIN (SELECT DISTINCT id, tk FROM e) ee ON ee.id = a.id
        GROUP BY a.s
        """
    ).write.format("noop").mode("overwrite").save()
    # ...and the object-hash / typed-imperative aggregate machinery the
    # wide engine rows hit (median/percentile/collect/min_by + the
    # multi-distinct Expand path): without this, the FIRST engine
    # aggregate row pays ~20s+ of Janino+JIT inside its timed cold run.
    spark.sql(
        """
        WITH t AS (SELECT id, id % 13 AS g, CAST(id % 7 AS STRING) s
                   FROM range(1000))
        SELECT g, median(id), percentile(id, 0.5), collect_set(s),
               collect_list(s), min_by(s, id), max_by(s, id),
               count(DISTINCT id), sum(DISTINCT id), avg(DISTINCT id),
               count_if(id > 3), every(id >= 0), bit_or(id), bit_xor(id),
               approx_count_distinct(id), any_value(s)
        FROM t GROUP BY g
        """
    ).write.format("noop").mode("overwrite").save()
    # ...and the Python-worker / Arrow lane (mapInPandas): worker spawn,
    # Arrow serde init and the numpy import otherwise land inside the
    # first mapInPandas row's timed cold run (ann_rerank in sorted order)

    def _py_warm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"x": np.asarray(pdf["id"]) * 2})

    spark.range(1000).mapInPandas(_py_warm, "x long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Phase 2: shared index builds, timed cold (concurrent where the
    # dependency edges allow — see _run_index_builds).
    _clear_operator_caches(spark)
    index_build, index_wall = _run_index_builds(spark)

    # Phase 3: queries, indexes warm.  Each lane also records its
    # START OFFSET from the phase clock ("at_s", paired with the
    # payload's query_phase_started_unix): the box carries intermittent
    # external load (watched 0.16 -> 7.26 within an hour in r14), and
    # pre/post gauges alone can't say WHICH lanes a mid-run spike hit —
    # the offsets let a contaminated stamp be partially salvaged by
    # mapping the spike's wall-clock window onto the lanes inside it
    # (r14 verdict item 4).
    detail: dict[str, dict] = {}
    timings: dict[str, float] = {}
    total = cold_total = warm_total = 0.0
    phase3_wall0 = time.time()
    phase3_t0 = time.perf_counter()
    for name in sorted(queries):
        q = queries[name]
        runs: list[float] = []
        lane_at = time.perf_counter() - phase3_t0
        n_runs = max(N_RUNS, NOISY_RUNS) if name in NOISY_LANES else N_RUNS
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = q(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        med = round(statistics.median(runs), 3)
        cold = round(runs[0], 3)
        warm = round(statistics.median(runs[1:]) if len(runs) > 1 else runs[0], 3)
        timings[name] = med
        detail[name] = {
            "median_s": med,
            "cold_s": cold,
            "warm_s": warm,
            "spread_s": round(max(runs) - min(runs), 3),
            "runs_s": [round(r, 3) for r in runs],
            "at_s": round(lane_at, 3),
        }
        total += med
        cold_total += cold
        warm_total += warm

    # post-run gauges, computed once and stamped in BOTH payloads
    host_speed_post = _host_speed()
    loadavg_end = _loadavg()
    steal_pct = _steal_pct(cpu_ticks_start, _cpu_ticks())

    # Written twice: the mutable latest-run copy AND a round-stamped
    # copy (BENCH_DETAIL_r{N}.json) that persists the FULL per-lane map
    # for every round — the driver's BENCH_r{N}.json stores only a
    # truncated stdout tail (r6's cut mid-JSON and lost ~14 lanes from
    # the cross-round comparison), so the stamped file is the durable
    # record cross-round perf analysis should read.
    detail_payload = {
        "sf": float(sf),
        "runs_per_query": N_RUNS,
        # the harness core count (r15 verdict item 9: the driver's
        # 8-core rerun overwrote the 32-core detail stamp; the count in
        # the payload + the _c{cpus} stamped copy below keep every
        # config's record distinguishable and durable)
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "host_speed_s": host_speed,
        # Provenance (r12 judge: the stamp NAME alone is ambiguous —
        # the round driver writes CORRECTNESS_r{N} BEFORE its bench, so
        # its round-N detail lands at _r{N+1}, while the builder's
        # mid-round runs see max=N-1 and land at _r{N}).  These two
        # fields disambiguate regardless of filename: the round a stamp
        # belongs to is latest_correctness_round (+1 if bench_tag is
        # "builder", since the builder runs before the round's record).
        "latest_correctness_round": _next_round() - 1,
        "bench_tag": os.environ.get("SPARK_GRAFT_BENCH_TAG", "")
        or "untagged",
        "host_speed_mt_s": host_speed_mt,
        # post-run single-thread probe + host load at both ends: load
        # arriving AFTER the pre-session probes is otherwise invisible
        # (r14 blind spot — see _loadavg)
        "host_speed_post_s": host_speed_post,
        "loadavg_start": loadavg_start,
        "loadavg_end": loadavg_end,
        # hypervisor steal share over the whole run (see _cpu_ticks)
        "steal_pct": steal_pct,
        "preexisting_session": preexisting_session,
        "jvm": _jvm_gauges(spark),
        "totals": {
            "median_total_s": round(total, 3),
            "cold_total_s": round(cold_total, 3),
            "warm_total_s": round(warm_total, 3),
            # index_build_total_s keeps its pre-r13 meaning (sum of
            # per-builder times) so cross-round stamp comparisons stay
            # definitionally stable; the concurrent phase's real
            # one-time cost is the WALL, stamped under its own new key
            # (r13 advice: the r13 stamp had silently repointed
            # _total_s at the wall)
            "index_build_total_s": round(sum(index_build.values()), 3),
            "index_build_sum_s": round(sum(index_build.values()), 3),
            "index_build_wall_s": index_wall,
        },
        # Self-describing key semantics (r14 advice: in the r13-round
        # stamps index_build_total_s carried the concurrent-phase WALL;
        # every other round it is the per-builder SUM — a cross-round
        # consumer comparing stamps under that one key would silently
        # mix the two definitions; stamps without this marker need the
        # README Verification note to disambiguate).
        "stamp_schema": {
            "index_build_total_s": "sum_of_builders",
            "index_build_sum_s": "sum_of_builders",
            "index_build_wall_s": "concurrent_phase_wall",
            "queries.at_s": "lane start offset from query_phase_started_unix",
        },
        "query_phase_started_unix": round(phase3_wall0, 1),
        "index_build_s": index_build,
        "queries": detail,
    }
    # SPARK_GRAFT_BENCH_TAG=builder for the builder's own mid-round
    # runs, so they never clobber the round driver's stamp for the same
    # round number (both compute max-recorded-round + 1; the r8-round
    # driver stamp and the r9-round builder stamp otherwise collide on
    # _r09 — observed and restored from git this round)
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "")
    suffix = f"_{tag}" if tag else ""
    stamped = os.path.join(
        _REPO, f"BENCH_DETAIL_r{_next_round():02d}{suffix}.json"
    )
    # a cpus-suffixed copy in addition to the plain stamped name: the
    # round driver reruns the bench at a lower core count with the SAME
    # round number and no tag, which overwrote the official 32-core
    # per-lane record in r15 (verdict item 9) — the _c{cpus} copy
    # survives any same-name rerun at a different width
    stamped_c = stamped.replace(
        ".json", f"_c{detail_payload['cpus']}.json"
    )
    for path in (DETAIL_PATH, stamped, stamped_c):
        with open(path, "w") as f:
            json.dump(detail_payload, f, indent=1, sort_keys=True)
            f.write("\n")

    # Final line LAST and compact.  The round driver captures only the
    # last ~2000 chars of stdout; the full 89-query map overflowed that
    # window in r6 (BENCH_r06 parsed: null), so the final line carries
    # the totals plus only the TOP-15 slowest lanes — the complete
    # per-query map lives in BENCH_DETAIL.json.
    top = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    )
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in top.items()},
                "n_queries": len(timings),
                "cold_total_s": round(cold_total, 3),
                "warm_total_s": round(warm_total, 3),
                # index_build_s keeps its pre-r13 sum-of-builds meaning;
                # the concurrent phase wall gets its own key (r13 advice)
                "index_build_s": round(sum(index_build.values()), 3),
                "index_build_wall_s": index_wall,
                "detail": "BENCH_DETAIL.json",
                "sf": float(sf),
                "runs_per_query": N_RUNS,
                "host_speed_s": host_speed,
                "host_speed_mt_s": host_speed_mt,
                "host_speed_post_s": host_speed_post,
                "loadavg_end": loadavg_end,
                "steal_pct": steal_pct,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
