"""Semantic invariants of the round-7 graph / PC / dedup-eval lanes —
properties the row-by-row oracle comparison cannot express (it proves
engine agreement, not that the construction means what it claims)."""

from pyspark.sql import functions as F


def test_kcore_membership_respects_degree(spark, sf_dir):
    """A node in the k-core after peeling must have full-graph degree
    >= K (peeling only removes nodes; it never raises degree), and the
    node set must equal the undirected kNN graph's node set."""
    from dataforge_core_spark.operators import similarity as S

    rows = S.ann_kcore(spark, sf_dir).collect()
    assert rows, "empty k-core output"
    for r in rows:
        if r.in_core == 1:
            assert r.degree >= S.KCORE_K, f"core node {r.vec_id} degree {r.degree}"
    edges = S.ann_knn_graph(spark, sf_dir)
    nodes = (
        edges.selectExpr("src AS n")
        .union(edges.selectExpr("dst AS n"))
        .distinct()
        .count()
    )
    assert len(rows) == nodes


def test_triangles_vs_bruteforce(spark, sf_dir):
    """Per-node triangle counts must equal a brute-force recount from
    the undirected edge set done in plain Python."""
    from itertools import combinations

    from dataforge_core_spark.operators import similarity as S

    edges = {
        tuple(sorted((r.src, r.dst)))
        for r in S.ann_knn_graph(spark, sf_dir).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect: dict = {}
    for n, nbrs in adj.items():
        t = sum(
            1 for u, v in combinations(sorted(nbrs), 2) if v in adj.get(u, ())
        )
        expect[n] = t
    got = {
        r.vec_id: r.tri_cnt for r in S.ann_triangles(spark, sf_dir).collect()
    }
    assert got == expect


def test_top_pc_is_dominant_direction(spark, sf_dir):
    """The power-iterated direction must capture more variance (sum of
    squared projections) than any single coordinate axis — otherwise
    three iterations produced something no better than a trivial
    baseline and the 'principal' claim is empty."""
    from dataforge_core_spark.operators import similarity as S

    x = S._xq_view(spark, sf_dir)
    fitted = dict(S._fit_top_pc(spark, sf_dir))
    arr = ", ".join(str(fitted[d]) for d in sorted(fitted))
    pc_var = spark.sql(
        f"""
        SELECT SUM(CAST(p AS DOUBLE) * p) AS v FROM (
          SELECT SUM(eq * element_at(array({arr}), CAST(i AS INT) + 1))
                   / {S.PI_SCALE} AS p
          FROM {x} GROUP BY vec_id
        )
        """
    ).collect()[0].v
    axis_max = spark.sql(
        f"SELECT MAX(v) AS m FROM (SELECT SUM(CAST(eq AS DOUBLE) * eq) AS v"
        f" FROM {x} GROUP BY i)"
    ).collect()[0].m
    # pc projections are in the same 1e6-quantized units as eq
    assert pc_var > axis_max, (pc_var, axis_max)


def test_minhash_accuracy_bounds(spark, sf_dir):
    """sig_matched must lie in [0, N]; est/exact ppm in [0, 1e6]; and
    the mean estimator error must be well under the half-range 500000
    (12 signatures carry real signal, not noise)."""
    from dataforge_core_spark.operators import dedup as D

    rows = D.dedup_minhash_accuracy(spark, sf_dir).collect()
    assert rows, "no verified pairs to evaluate"
    for r in rows:
        assert 0 <= r.sig_matched <= D.MINHASH_N
        assert 0 <= r.est_ppm <= 1_000_000
        assert 0 <= r.exact_ppm <= 1_000_000
        assert r.err_ppm == abs(r.est_ppm - r.exact_ppm)
    mean_err = sum(r.err_ppm for r in rows) / len(rows)
    assert mean_err < 500_000, mean_err


def test_purged_split_has_no_leakage_window(spark, sf_dir):
    """No train event may fall inside the embargo window before the
    earliest test event — the invariant the split exists to provide."""
    from dataforge_core_spark.operators import events as E

    df = E.events_purged_split(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.unix_timestamp("ts").alias("s")
    )
    j = df.join(ev, "event_id")
    first_test = j.filter("split = 'test'").agg(F.min("s")).collect()[0][0]
    last_train = j.filter("split = 'train'").agg(F.max("s")).collect()[0][0]
    counts = {r.split for r in j.select("split").distinct().collect()}
    assert counts == {"train", "embargo", "test"}
    assert last_train < first_test - E.PURGE_EMBARGO_S + 1


def test_incremental_dedup_consistent_with_exact(spark, sf_dir):
    """Every new-batch doc flagged exact_dup must share a normalized
    digest with a corpus doc, and every unique-flagged doc must not."""
    from dataforge_core_spark.operators import dedup as D

    disp = {r.doc_id: r.status for r in D.dedup_incremental(spark, sf_dir).collect()}
    docs = spark.sql(
        f"""SELECT doc_id, md5({D._SPARK_NORM}) AS k
            FROM parquet.`{sf_dir}/documents.parquet`"""
    ).collect()
    corpus = {
        r.k for r in docs if r.doc_id % D.INCR_MOD < D.INCR_NEW_GE
    }
    for r in docs:
        if r.doc_id % D.INCR_MOD >= D.INCR_NEW_GE:
            if disp[r.doc_id] == "exact_dup":
                assert r.k in corpus
            elif disp[r.doc_id] == "unique":
                assert r.k not in corpus
