"""Similarity search over the ``embeddings`` table (array<float> column).

- brute-force top-k : exact cosine of a (small) query set against the full
                      corpus.  The corpus side streams through executors;
                      the query set is broadcast — at 100 TB this is the
                      "re-rank" stage, not the recall stage.
- IVF-bucketed top-k: coarse partition (here: the ``label`` column plays
                      the role of the coarse quantizer's assignment) and
                      search only within the probed bucket — the scale
                      path: shuffle is keyed by bucket, each bucket's
                      candidate set is small.

Dot products use explicit float->double casts and a strict left fold
(``aggregate``) so the result is bit-deterministic; ranking tie-breaks on
vec_id.  Scores are not emitted (rank + ids only) to keep the oracle
comparison independent of last-ulp floating-point association.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataforge_core_spark.session import session_key

TOP_K = 10
N_QUERIES = 8  # vec_id < N_QUERIES form the query set
DIM = 64  # embedding dimensionality of the testdata corpus


def _unrolled_dot(a: str, b: str, dialect: str) -> str:
    """Fully-unrolled dot product as a *balanced* addition tree over
    already-double arrays (the ``emb`` column of :func:`_normed`).

    Unrolled (vs higher-order lambdas): stays in whole-stage codegen —
    Spark interprets lambda folds row-at-a-time.  Balanced (vs
    left-leaning): a 64-deep nested add tree takes seconds of Janino
    compilation; the balanced tree is depth 6.  Operands are cast to
    double *once per vector* (a whole-array cast in ``_normed``), not per
    term — float->double is exact, and halving the expression node count
    halves Janino compile time.  The exact same tree shape is emitted for
    DuckDB, so the floating-point result is bit-deterministic across
    engines.  Spark arrays are 0-based, DuckDB lists 1-based."""
    off = 0 if dialect == "spark" else 1
    terms = [
        f"({a}[{i + off}] * {b}[{i + off}])"
        for i in range(DIM)
    ]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})" if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


_SPARK_DOT = None  # built per use via _unrolled_dot
_DUCK_DOT = None


# norms are precomputed once per vector (a "v" CTE) — cosine per pair is
# then a single dot product, 3x less arithmetic than norm-per-pair
def _spark_norm(a: str) -> str:
    return f"sqrt({_unrolled_dot(a, a, 'spark')})"


def _duck_norm(a: str) -> str:
    return f"sqrt({_unrolled_dot(a, a, 'duck')})"


def _spark_cosine(a: str, b: str, na: str, nb: str) -> str:
    return f"({_unrolled_dot(a, b, 'spark')}) / ({na} * {nb})"


def _duck_cosine(a: str, b: str, na: str, nb: str) -> str:
    return f"({_unrolled_dot(a, b, 'duck')}) / ({na} * {nb})"


_v_cache: dict = {}


def _normed(spark: SparkSession, sf_dir: str) -> str:
    """Persisted (vec_id, label, emb, nrm, bucket) relation.

    Norms, the double-cast array, and the LSH bucket id are computed once
    per vector and *materialized*: left inline, Catalyst collapses the
    CTE into the pair projection and the combined norm+dot expression
    tree blows past JIT/codegen size limits (and gets re-evaluated per
    pair).  At scale this is the stored "vector index" side: norms and
    bucket ids persist alongside the vectors.

    ``localCheckpoint(eager=True)`` rather than ``persist()``: queries
    reach this frame by re-resolving the temp view from SQL text, and
    CacheManager does not reliably substitute the cached relation into
    the re-derived plan (nested cached views defeat the canonical-plan
    match), silently recomputing the index per query.  The checkpoint
    truncates lineage to the materialized blocks, so the view *cannot*
    be recomputed.  On a cluster, a reliable checkpoint dir / written
    parquet index replaces it.
    """
    key = (session_key(spark), sf_dir)
    if key not in _v_cache:
        # full session width ON PURPOSE (r15 measured-and-rejected:
        # sizing this to the relation like the simhash band table made
        # the ANN lanes 2x SLOWER — their per-row work is compute-dense
        # unrolled 64-dim arithmetic multiplied by candidate fan-out,
        # so the serving scans want the parallelism; only the
        # aggregate-shaped _xq consumers won, and _xq sizes itself)
        par = spark.sparkContext.defaultParallelism
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
            par
        ).createOrReplaceTempView("embeddings")
        v = spark.sql(
            f"""
            SELECT vec_id, label, emb,
                   {_spark_norm('emb')} AS nrm,
                   {_bucket_expr('emb', 'spark')} AS bucket
            FROM (
              SELECT vec_id, label,
                     CAST(embedding AS array<double>) AS emb
              FROM embeddings
            )
            """
        ).localCheckpoint(eager=True)
        name = f"embeddings_normed_{abs(hash(key)) % 10**8}"
        v.createOrReplaceTempView(name)
        _v_cache[key] = name
    return _v_cache[key]


# DuckDB-side equivalent of _normed's projection (shared by all oracles).
# MATERIALIZED: duckdb 1.0 inlines plain CTEs, so the self-joining graph
# oracles would compute the normalization once per reference; pinning one
# evaluation also sidesteps a duckdb-1.0 allocator flake (std::bad_alloc
# with ample free RAM) that strikes repeated heavy list-CTE expansions.
def _duck_v_cte() -> str:
    return f"""
v AS MATERIALIZED (
  SELECT vec_id, label, emb,
         {_duck_norm('emb')} AS nrm,
         {_bucket_expr('emb', 'duck')} AS bucket
  FROM (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
    FROM embeddings
  )
)"""


def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _normed(spark, sf_dir)
    cos = _spark_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return spark.sql(
        f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {cos} AS score
          FROM (SELECT * FROM {v} WHERE vec_id < {N_QUERIES}) q
          JOIN {v} c ON q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
        FROM ranked WHERE rank <= {TOP_K}
        """
    )


def _bruteforce_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return f"""
WITH {_duck_v_cte()},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked
WHERE rank <= {TOP_K}
"""


def ann_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: search only the query's coarse bucket (label).

    At scale: corpus pre-partitioned by bucket (one shuffle at build
    time), probes shuffle only to their bucket's partition.
    """
    v = _normed(spark, sf_dir)
    cos = _spark_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return spark.sql(
        f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {cos} AS score
          FROM (SELECT * FROM {v} WHERE vec_id < {N_QUERIES}) q
          JOIN {v} c
            ON q.label = c.label AND q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
        FROM ranked WHERE rank <= {TOP_K}
        """
    )


def _ivf_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return f"""
WITH {_duck_v_cte()},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c
    ON q.label = c.label AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked
WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (the recall stage at scale): N_PLANES signed-sum
# projections -> bucket id; candidates share a bucket; exact cosine
# re-ranks.  The hyperplanes are +-1 sign matrices derived from md5 in
# *Python at codegen time* — the emitted SQL is pure signed addition,
# identical text/arithmetic for Spark and DuckDB.
# ---------------------------------------------------------------------------

# 6 planes = 64 buckets: ~30 candidates per bucket at the test corpus
# size; at scale N_PLANES is the recall/cost dial (more planes = smaller
# buckets; multi-probe or band-OR raises recall)
N_PLANES = 6


def _plane_signs() -> list[list[int]]:
    import hashlib

    signs = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"plane{p}_{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        signs.append(row)
    return signs


def _bucket_expr(col: str, dialect: str) -> str:
    """Signed-sum hyperplane bucket over an already-double array column."""
    off = 0 if dialect == "spark" else 1
    bits = []
    for p, row in enumerate(_plane_signs()):
        terms = [
            f"({'' if s > 0 else '-'}{col}[{d + off}])"
            for d, s in enumerate(row)
        ]
        while len(terms) > 1:
            terms = [
                f"({terms[i]} + {terms[i + 1]})"
                if i + 1 < len(terms)
                else terms[i]
                for i in range(0, len(terms), 2)
            ]
        bits.append(f"(CASE WHEN {terms[0]} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def ann_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k: candidates share the 12-bit hyperplane bucket,
    exact cosine re-ranks within the bucket.  At 100 TB the bucket id is
    the shuffle/partition key; each probe touches one bucket."""
    v = _normed(spark, sf_dir)
    cos = _spark_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return spark.sql(
        f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {cos} AS score
          FROM (SELECT * FROM {v} WHERE vec_id < {N_QUERIES}) q
          JOIN {v} c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
        FROM ranked WHERE rank <= {TOP_K}
        """
    )


def _lsh_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return f"""
WITH {_duck_v_cte()},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked
WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Re-rank stage: the cross-encoder slot of a retrieval pipeline.  Recall
# (LSH buckets) -> shortlist (top-K cosine) -> model re-rank (top-K2).
# The scorer is a mapInPandas Arrow-batched stage — the exact shape a
# learned cross-encoder drops into (swap `_score_batches`).  The stub
# scores by *unnormalized* dot product computed in numpy with the same
# balanced-tree association as the SQL expression, so results are
# bit-identical to the DuckDB oracle and the re-ranked order genuinely
# differs from the cosine shortlist (norms vary).
# ---------------------------------------------------------------------------

RERANK_K = 5


def ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-rank the LSH shortlist with an Arrow-batched pairwise scorer.

    At scale the candidate set is |queries| x TOP_K rows — embarrassingly
    parallel, no shuffle besides the final per-query window; batches hit
    the Python worker as Arrow columns, scored vectorized."""
    v = _normed(spark, sf_dir)
    shortlist = ann_lsh_hyperplane(spark, sf_dir)
    shortlist.createOrReplaceTempView("ann_rerank_shortlist")
    pairs = spark.sql(
        f"""
        SELECT c.query_id, c.neighbor_id, q.emb AS q_emb, n.emb AS n_emb
        FROM ann_rerank_shortlist c
        JOIN {v} q ON q.vec_id = c.query_id
        JOIN {v} n ON n.vec_id = c.neighbor_id
        """
    )

    def _score_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["q_emb"].to_numpy()).astype("float64")
            n = np.stack(pdf["n_emb"].to_numpy()).astype("float64")
            # balanced pairwise-adjacent adds — the same association as
            # _unrolled_dot, so the double result is bit-identical
            prod = q * n
            while prod.shape[1] > 1:
                prod = prod[:, 0::2] + prod[:, 1::2]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "score": prod[:, 0],
                }
            )

    scored = pairs.mapInPandas(
        _score_batches, "query_id long, neighbor_id long, score double"
    )
    scored.createOrReplaceTempView("ann_rerank_scored")
    return spark.sql(
        f"""
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
        FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS rank
          FROM ann_rerank_scored
        )
        WHERE rank <= {RERANK_K}
        """
    )


def _rerank_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    dot = _unrolled_dot("q.emb", "n.emb", "duck")
    return f"""
WITH {_duck_v_cte()},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
shortlist AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
    FROM scored
  )
  WHERE rank <= {TOP_K}
),
re AS (
  SELECT s.query_id, s.neighbor_id, {dot} AS score
  FROM shortlist s
  JOIN v q ON q.vec_id = s.query_id
  JOIN v n ON n.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id
FROM (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
  FROM re
)
WHERE rank <= {RERANK_K}
"""


# ---------------------------------------------------------------------------
# True k-means IVF: Lloyd's algorithm with a FIXED iteration count and
# fixed-point centroid accumulation, so the coarse quantizer itself is
# part of the verified query (the DuckDB oracle runs the identical
# unrolled iterations).  This replaces the label-as-bucket stand-in
# (ann_ivf_label keeps documenting that shape).
#
# Determinism across engines: double addition is not associative, so a
# naive AVG(emb[d]) per centroid would depend on each engine's (and each
# partition layout's) summation order.  Instead components are scaled by
# 2^32 (exact — power-of-two multiply only shifts the exponent), floored
# to BIGINT, and summed in *integer* arithmetic (exact, associative,
# order-free), then divided back in double.  On a 1000-executor cluster
# this also means the centroids are reproducible run-to-run regardless
# of partitioning — the same property Spark's own MLlib KMeans does NOT
# give you.  Assignment = argmin ||a-c||^2 = argmin (c.c - 2 a.c); the
# per-centroid self-dot is precomputed once per centroid row, so each
# vector x centroid pair costs ONE unrolled dot product, broadcast-joined
# (K rows) with no shuffle on the corpus side.  The only shuffles per
# iteration are the ROW_NUMBER partition-by-vector (argmin) and the
# K-group centroid aggregate (map-side combinable).
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2
_FP_SCALE = "4294967296.0"  # 2^32 — exact double multiply

# Cell-size guard for the per-cell candidate joins: the IVF assignment
# index carries a per-cell rank (``cellrn``, ROW_NUMBER by vec_id,
# computed ONCE at index build on the cid partitioning the checkpoint
# already pays for) and every cell search filters ``cellrn <= cap`` —
# so a skewed centroid cell contributes at most cap candidates per
# probe instead of going quadratic at 100x data.  Deterministic
# (vec_id order) and applied identically in the DuckDB oracles; far
# above any balanced cell size, so it binds only on pathological skew.
IVF_CELL_CAP = 100_000


def _kmeans_update(src: str, dialect: str) -> str:
    """Fixed-point centroid recompute: exact integer sums per dimension."""
    off = 0 if dialect == "spark" else 1
    arr_open, arr_close = ("array(", ")") if dialect == "spark" else ("[", "]")
    elems = ",\n       ".join(
        f"CAST(SUM(CAST(FLOOR(emb[{d + off}] * {_FP_SCALE}) AS BIGINT))"
        f" AS DOUBLE) / (COUNT(*) * {_FP_SCALE})"
        for d in range(DIM)
    )
    return (
        f"SELECT cid, {arr_open}{elems}{arr_close} AS emb"
        f" FROM {src} GROUP BY cid"
    )


def _kmeans_assign(
    v: str, csrc: str, dialect: str, with_label: bool = False
) -> str:
    """argmin-distance assignment; cid tie-break keeps it deterministic.

    ``with_label`` threads the metadata column into the FINAL (stored)
    assignment only — the Lloyd-loop iterations stay narrow.  A stored
    IVF index carries the filterable attributes alongside the vectors so
    filtered search never joins back to the corpus (see
    ann_filtered_search)."""
    dot = _unrolled_dot("a.emb", "c.emb", dialect)
    lab_out = ", label" if with_label else ""
    lab_in = ", a.label" if with_label else ""
    return f"""SELECT vec_id, emb, nrm, cid{lab_out} FROM (
    SELECT a.vec_id, a.emb, a.nrm{lab_in}, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY (c.cc - (2 * ({dot}))) ASC, c.cid) AS rn
    FROM {v} a CROSS JOIN {csrc} c) t WHERE rn = 1"""


def _kmeans_ctes(v: str, dialect: str) -> str:
    """CTE chain c0 -> (assign -> update -> self-dot) x ITERS -> af."""
    self_dot = _unrolled_dot("emb", "emb", dialect)
    parts = [
        f"c0 AS (SELECT vec_id AS cid, emb, {self_dot} AS cc"
        f" FROM {v} WHERE vec_id < {KMEANS_K})"
    ]
    prev = "c0"
    for i in range(1, KMEANS_ITERS + 1):
        parts.append(f"a{i} AS ({_kmeans_assign(v, prev, dialect)})")
        parts.append(f"u{i} AS ({_kmeans_update(f'a{i}', dialect)})")
        parts.append(
            f"c{i} AS (SELECT cid, emb, {self_dot} AS cc FROM u{i})"
        )
        prev = f"c{i}"
    parts.append(
        "af AS (SELECT vec_id, emb, nrm, cid, label,"
        " ROW_NUMBER() OVER (PARTITION BY cid ORDER BY vec_id) AS cellrn"
        f" FROM ({_kmeans_assign(v, prev, dialect, with_label=True)}) af_in)"
    )
    return ",\n".join(parts)


_kmeans_cache: dict = {}


def _centroid_literal_sql(rows) -> str:
    """8-row centroid relation as a SQL literal (cid, emb, cc).

    Each component is emitted via ``repr`` — Python's shortest
    round-trip decimal — and re-parsed by Spark's Double.parseDouble,
    which is correctly rounded, so the binary64 values survive the
    driver round-trip EXACTLY; cc is recomputed in SQL with the same
    unrolled tree the oracle uses, so it stays bit-identical too."""
    self_dot = _unrolled_dot("emb", "emb", "spark")
    selects = " UNION ALL ".join(
        f"SELECT {int(r['cid'])} AS cid, array("
        + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in r["emb"])
        + ") AS emb"
        for r in rows
    )
    return f"SELECT cid, emb, {self_dot} AS cc FROM ({selects}) lit"


def _kmeans_assignments(spark: SparkSession, sf_dir: str) -> str:
    """Persisted (vec_id, emb, nrm, cid) view — the 'index build' side.

    Materialized so the query-side/corpus-side self-join of the search
    doesn't recompute the Lloyd iterations twice.  At scale this is the
    stored IVF index: assignments persist alongside the vectors,
    partitioned by cid.  Eager ``localCheckpoint`` (not lazy persist) —
    see ``_normed``: view re-resolution bypassed the cache and re-ran
    the whole Lloyd chain on every search.

    Centroids live DRIVER-SIDE between iterations (8 x 64 doubles — the
    canonical k-means driver state, same as MLlib's implementation):
    each Lloyd iteration is ONE Spark job (assign+update fused) ending
    in an 8-row collect that is inlined as literals into the next
    iteration, instead of a checkpoint + temp-view round-trip per
    iteration.  The math is unchanged — the DuckDB oracle still runs
    the fully-inlined chain (_kmeans_ctes) and matches bit-for-bit
    (see _centroid_literal_sql for why the round-trip is exact)."""
    key = (session_key(spark), sf_dir)
    if key not in _kmeans_cache:
        v = _normed(spark, sf_dir)
        tag = abs(hash(key)) % 10**8
        cview = f"kmeans_c_{tag}"
        # the per-iteration frames are K-group aggregates over ~corpus/K
        # rows — size the build's shuffle width to that, not the session
        # default.  The narrow width lives in a SIBLING session's conf
        # (narrow_session), not a save/restore on the main session, so
        # it cannot leak into builders planning concurrently (r13
        # advice); the checkpointed output is rebound to the main
        # session below and queries are unaffected.
        from dataforge_core_spark.session import narrow_session, rebind

        ns = narrow_session(spark, 8)
        rebind(spark.table(v), ns).createOrReplaceTempView(v)
        cent = ns.sql(
            f"SELECT vec_id AS cid, emb FROM {v} "
            f"WHERE vec_id < {KMEANS_K} ORDER BY cid"
        ).collect()
        for _ in range(KMEANS_ITERS):
            csrc = f"({_centroid_literal_sql(cent)})"
            assign = _kmeans_assign(v, csrc, "spark")
            update = _kmeans_update(f"({assign}) a_it", "spark")
            cent = ns.sql(update).collect()
        csrc = f"({_centroid_literal_sql(cent)})"
        # cellrn rides the cid repartition the checkpoint pays
        # anyway — the cell-size cap is then a free query-time
        # filter (see IVF_CELL_CAP)
        df = rebind(
            ns.sql(
                "SELECT vec_id, emb, nrm, cid, label,"
                " ROW_NUMBER() OVER (PARTITION BY cid"
                " ORDER BY vec_id) AS cellrn"
                f" FROM ({_kmeans_assign(v, csrc, 'spark', with_label=True)})"
                " af_in"
            )
            .repartition("cid")
            .localCheckpoint(eager=True),
            spark,
        )
        name = f"kmeans_assign_{tag}"
        df.createOrReplaceTempView(name)
        # keep the final centroid view too: nprobe>1 search needs
        # per-query centroid distances at query time (literal-backed —
        # 8 rows of constants, no recompute possible)
        spark.sql(_centroid_literal_sql(cent)).createOrReplaceTempView(
            cview
        )
        # the collected centroid rows ride in the cache too: probe
        # expressions can then be emitted as pure literal projections
        # (no join at all — see _probe_cids_expr)
        _kmeans_cache[key] = (name, cview, [
            (int(r["cid"]), [float(x) for x in r["emb"]]) for r in cent
        ])
    return _kmeans_cache[key][0]


def _kmeans_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """(assignment view, final centroid view) for the IVF index."""
    _kmeans_assignments(spark, sf_dir)
    return _kmeans_cache[(session_key(spark), sf_dir)][:2]


def _kmeans_centroids(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, list[float]]]:
    """Final (cid, components) centroid rows of the stored IVF index —
    exact binary64 values (collect round-trips doubles bit-exactly)."""
    _kmeans_assignments(spark, sf_dir)
    return _kmeans_cache[(session_key(spark), sf_dir)][2]


def _py_tree_dot(a: list[float], b: list[float]) -> float:
    """Python replica of _unrolled_dot's balanced tree — same operand
    order, same IEEE binary64 round-to-nearest ops, so the result is
    bit-identical to the SQL expression over the same values."""
    terms = [x * y for x, y in zip(a, b)]
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _lit_dot(a: str, vals: list[float], dialect: str) -> str:
    """_unrolled_dot with the right operand inlined as exact double
    literals (repr = shortest round-trip decimal; both engines parse it
    correctly rounded, so the binary64 centroid survives exactly)."""
    off = 0 if dialect == "spark" else 1
    terms = [
        f"({a}[{i + off}] * CAST({v!r} AS DOUBLE))"
        for i, v in enumerate(vals)
    ]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})" if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _probe_sorted_expr(
    cent: list[tuple[int, list[float]]], emb: str
) -> str:
    """Spark expression: the K centroid cells as a (distance, cid)
    struct array sorted nearest-first for ``emb`` — a PURE PROJECTION
    over the K driver-side centroid literals (no join, no broadcast,
    stays in the scan's codegen span); the caller picks its nprobe
    cells off the front.

    Distance key and tie-break are the assignment's exactly
    (cc - 2*dot, then cid; cc is computed in Python with the same
    balanced tree as the SQL self-dot, so it is the same binary64 the
    oracle's inlined chain produces): the struct array sorts by
    (d, c) lexicographically == ORDER BY dist ASC, cid ASC."""
    structs = ", ".join(
        f"named_struct('d', CAST({_py_tree_dot(v, v)!r} AS DOUBLE)"
        f" - (2 * ({_lit_dot(emb, v, 'spark')})), 'c', {cid})"
        for cid, v in cent
    )
    return f"array_sort(array({structs}))"


def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a real k-means coarse quantizer: search only the query's
    centroid cell.  nprobe=1 here; raising nprobe = OR-ing more cids into
    the join key (recall dial, same plan shape)."""
    af = _kmeans_assignments(spark, sf_dir)
    cos = _spark_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return spark.sql(
        f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {cos} AS score
          FROM (SELECT * FROM {af} WHERE vec_id < {N_QUERIES}) q
          JOIN {af} c ON q.cid = c.cid AND c.cellrn <= {IVF_CELL_CAP} AND q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
        FROM ranked WHERE rank <= {TOP_K}
        """
    )


def ann_ivf_search(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int = 1,
    corpus_filter: str | None = None,
    top_k: int = TOP_K,
) -> DataFrame:
    """IVF search with a configurable probe count — THE recall dial of
    an IVF index.  Each query probes its ``nprobe`` nearest centroid
    cells: the probe assignment is a PURE LITERAL PROJECTION over the
    K driver-side centroid literals (_probe_sorted_expr — no cross
    join, so the whole family plans WITHOUT BroadcastNestedLoopJoin;
    round-10 rebuild of the former 8-row broadcast cross join), and
    the cell search is the same cid-keyed equi-join for every nprobe;
    a corpus vector lives in exactly one cell, so probing distinct
    cells can never produce duplicate pairs.  nprobe=1 short-circuits
    the probe stage entirely (a vector's nearest centroid IS its
    assigned cell, so the assignment column already holds the answer).

    ``nprobe``/``top_k`` are the DRIVER-VISIBLE dials of the
    parameterized contract (__spark_entry__.queries_parameterized);
    ann_ivf_probe2 / ann_ivf_probe3_k5 are the driver-proven
    instantiations."""
    if nprobe < 1 or nprobe > KMEANS_K:
        raise ValueError(f"nprobe must be in [1, {KMEANS_K}]")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    af, _cv = _kmeans_index(spark, sf_dir)
    cos = _spark_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    cf = f" AND ({corpus_filter})" if corpus_filter else ""
    if nprobe == 1:
        qsrc = f"(SELECT * FROM {af} WHERE vec_id < {N_QUERIES})"
    else:
        sa = _probe_sorted_expr(_kmeans_centroids(spark, sf_dir), "emb")
        picks = ", ".join(f"__sa[{j}].c" for j in range(nprobe))
        qsrc = f"""(
          SELECT vec_id, emb, nrm, pcid AS cid FROM (
            SELECT vec_id, emb, nrm, {sa} AS __sa
            FROM {af} WHERE vec_id < {N_QUERIES}
          ) t LATERAL VIEW explode(array({picks})) p AS pcid
        )"""
    return spark.sql(
        f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {cos} AS score
          FROM {qsrc} q
          JOIN {af} c ON q.cid = c.cid AND c.cellrn <= {IVF_CELL_CAP} AND q.vec_id <> c.vec_id{cf}
        ),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
        FROM ranked WHERE rank <= {top_k}
        """
    )


def ann_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: IVF top-K restricted to corpus vectors
    satisfying a metadata predicate (here ``label % 2 = 0``) — the
    vector-database "filtered ANN" shape.  The filterable attribute is
    STORED IN THE INDEX (``_kmeans_assignments`` threads ``label``
    into the final assignment), so the predicate is a free conjunct on
    the cell join — no join back to the corpus table, no second scan.
    nprobe=2 compensates the candidate thinning the filter causes (the
    standard recall dial for filtered IVF search)."""
    return ann_ivf_search(
        spark, sf_dir, nprobe=2, corpus_filter="c.label % 2 = 0"
    )


def _ivf_search_oracle(
    nprobe: int = 1,
    top_k: int = TOP_K,
    corpus_filter: str | None = None,
) -> str:
    """DuckDB oracle builder mirroring :func:`ann_ivf_search` for ANY
    (nprobe, top_k, corpus_filter) — the oracle side of the
    parameterized driver contract.  The probe CTE runs the rn <=
    nprobe form for every nprobe (for nprobe=1 the rank-1 pick IS the
    assigned cell, bit-identically, so it matches Spark's
    short-circuit)."""
    qdot = _unrolled_dot("a.emb", "c.emb", "duck")
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    cf = f" AND ({corpus_filter})" if corpus_filter else ""
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
afm AS MATERIALIZED (SELECT * FROM af),
qp AS (
  SELECT vec_id, emb, nrm, cid FROM (
    SELECT a.vec_id, a.emb, a.nrm, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY (c.cc - (2 * ({qdot}))) ASC, c.cid) AS rn
    FROM (SELECT * FROM afm WHERE vec_id < {N_QUERIES}) a
    CROSS JOIN c{KMEANS_ITERS} c
  ) t WHERE rn <= {nprobe}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS score
  FROM qp q JOIN afm c ON q.cid = c.cid AND c.cellrn <= {IVF_CELL_CAP}
   AND q.vec_id <> c.vec_id{cf}
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked
WHERE rank <= {top_k}
"""


def _filtered_search_oracle() -> str:
    return _ivf_search_oracle(
        nprobe=2, top_k=TOP_K, corpus_filter="c.label % 2 = 0"
    )


def ann_ivf_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with nprobe=2 — the driver-checked instantiation of
    :func:`ann_ivf_search`'s probe dial."""
    return ann_ivf_search(spark, sf_dir, nprobe=2)


def _ivf_probe2_oracle() -> str:
    return _ivf_search_oracle(nprobe=2, top_k=TOP_K)


def ann_ivf_probe3_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search at nprobe=3 / top_k=5 — the driver-proven row for the
    PARAMETERIZED contract (__spark_entry__.queries_parameterized):
    both dials off their defaults, value-hashed against the oracle
    builder's SQL at the same settings, so the dials are demonstrably
    live end-to-end rather than compile-time constants."""
    return ann_ivf_search(spark, sf_dir, nprobe=3, top_k=5)


def _ivf_probe3_k5_oracle() -> str:
    return _ivf_search_oracle(nprobe=3, top_k=5)


def _ivf_kmeans_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS score
  FROM (SELECT * FROM af WHERE vec_id < {N_QUERIES}) q
  JOIN af c ON q.cid = c.cid AND c.cellrn <= {IVF_CELL_CAP} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked
WHERE rank <= {TOP_K}
"""


# real deployments use ~0.95+; the synthetic corpus has no planted
# near-dups (max pairwise cosine ~0.51), so the demo threshold sits where
# the operator produces verifiable pairs
COSINE_DUP_THRESHOLD = 0.40


# skew guard for the hyperplane-bucket self-join (same rule as the
# minhash/simhash band paths): the bucket key space is fixed by the
# plane count regardless of corpus size, so an oversized bucket is
# SALTED into ceil(n/cap) deterministic vec_id residue groups and pairs
# generate only within a group — partial recall, bounded fan-out.
EMB_BUCKET_CAP = 1000


def _emb_pairs_sql(
    dialect: str,
    v: str,
    cap: int,
    select: str | None = None,
    min_cos: float = COSINE_DUP_THRESHOLD,
) -> str:
    """Salted bucket self-join emitting (vec_a, vec_b) near-dup pairs.

    ``v`` is the normed relation's name (Spark temp view or the
    oracle's ``v`` CTE); identical construction in both dialects.
    ``select``/``min_cos`` let the threshold-curve lane reuse the exact
    same candidate join with the cosine carried along and a lower
    verification floor (defaults emit the historical pair shape
    verbatim)."""
    cosf = _spark_cosine if dialect == "spark" else _duck_cosine
    cos = cosf("a.emb", "b.emb", "a.nrm", "b.nrm")
    sel = select or "a.vec_id AS vec_a, b.vec_id AS vec_b"
    sel = sel.replace("{cos}", cos)
    return f"""
SELECT {sel}
FROM (
  SELECT vv.*, vv.vec_id % COALESCE(h.nsalt, 1) AS salt
  FROM {v} vv LEFT JOIN (
    SELECT bucket,
           CAST(CEIL(CAST(COUNT(*) AS DOUBLE) / {cap}) AS BIGINT) AS nsalt
    FROM {v} GROUP BY bucket HAVING COUNT(*) > {cap}
  ) h ON vv.bucket = h.bucket
) a JOIN (
  SELECT vv.*, vv.vec_id % COALESCE(h.nsalt, 1) AS salt
  FROM {v} vv LEFT JOIN (
    SELECT bucket,
           CAST(CEIL(CAST(COUNT(*) AS DOUBLE) / {cap}) AS BIGINT) AS nsalt
    FROM {v} GROUP BY bucket HAVING COUNT(*) > {cap}
  ) h ON vv.bucket = h.bucket
) b
  ON a.bucket = b.bucket AND a.salt = b.salt AND a.vec_id < b.vec_id
WHERE {cos} >= {min_cos}
"""


def dedup_embedding(
    spark: SparkSession, sf_dir: str, bucket_cap: int | None = None
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH buckets as the recall
    stage (near-identical vectors share every hyperplane side), exact
    cosine as the verifier.  Output is the candidate duplicate pair list;
    clustering (connected components) is a driver-side/iterative step
    downstream."""
    cap = EMB_BUCKET_CAP if bucket_cap is None else bucket_cap
    v = _normed(spark, sf_dir)
    return spark.sql(_emb_pairs_sql("spark", v, cap))


def _dedup_embedding_oracle(bucket_cap: int | None = None) -> str:
    cap = EMB_BUCKET_CAP if bucket_cap is None else bucket_cap
    return f"""
WITH {_duck_v_cte()}
{_emb_pairs_sql("duck", "v", cap)}
"""


# milli-cosine grid for the threshold tuning curve; COSINE_DUP_THRESHOLD
# (400) must be a grid point so the curve cross-checks the production lane
COS_CURVE_GRID = (300, 350, 400, 450, 500)


def _cos_curve_sql(dialect: str, v: str, cap: int) -> str:
    """Threshold tuning curve for the embedding near-dup verifier —
    the dedup_lsh_band_curve pattern applied to the cosine floor: ONE
    candidate relation (the same salted bucket join, floored at the
    grid minimum) carries its cosine, and every grid threshold is a
    pure CASE expression over it — no per-config re-join.  Per
    threshold: surviving pair count and distinct docs touched (the
    removal-budget number a deployment reads the curve for)."""
    grid = ", ".join(str(t) for t in COS_CURVE_GRID)
    lo = min(COS_CURVE_GRID) / 1000.0
    cand = _emb_pairs_sql(
        dialect,
        v,
        cap,
        select="a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cos",
        min_cos=lo,
    )
    if dialect == "spark":
        fan = (
            f"LATERAL VIEW explode(array({grid})) g AS thresh\n"
            "  LATERAL VIEW explode(array(0, 1)) sd AS s"
        )
        idiv = "DIV"
    else:
        fan = f", unnest([{grid}]) AS g(thresh), unnest([0, 1]) AS sd(s)"
        idiv = "//"
    return f"""
WITH cand AS ({cand}),
fan AS (
  SELECT g.thresh,
         CASE WHEN cos >= g.thresh / 1000.0 THEN 1 ELSE 0 END AS hit,
         CASE WHEN sd.s = 0 THEN vec_a ELSE vec_b END AS vec
  FROM cand
  {fan}
)
SELECT CAST(thresh AS INTEGER) AS thresh_milli,
       CAST(SUM(hit) {idiv} 2 AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT CASE WHEN hit = 1 THEN vec END) AS BIGINT)
         AS n_docs
FROM fan GROUP BY thresh
"""


def dedup_cos_threshold_curve(
    spark: SparkSession, sf_dir: str, bucket_cap: int | None = None
) -> DataFrame:
    """Cosine-threshold tuning curve for embedding near-dup removal:
    (thresh_milli, n_pairs, n_docs) per grid point from one candidate
    pass.  n_pairs is non-increasing in the threshold and the 400-milli
    row equals dedup_embedding's pair count (both pinned by test) —
    completes the per-index tuning-artifact family (nprobe cells, LSH
    bands, sketch size, cosine floor)."""
    cap = EMB_BUCKET_CAP if bucket_cap is None else bucket_cap
    v = _normed(spark, sf_dir)
    return spark.sql(_cos_curve_sql("spark", v, cap))


def _cos_curve_oracle(bucket_cap: int | None = None) -> str:
    cap = EMB_BUCKET_CAP if bucket_cap is None else bucket_cap
    return f"""
WITH {_duck_v_cte()},
curve AS ({_cos_curve_sql("duck", "v", cap)})
SELECT * FROM curve
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization: per-vector symmetric quantization to 8 bits
# (q_i = floor(v_i * 127 / max|v|)) — the 4x storage/bandwidth
# compression every large vector store applies before (or instead of)
# PQ.  Emitted per vector: an exact integer checksum of the codes and
# the 1e-6-quantized max reconstruction error, so the full
# quantize -> dequantize round-trip is oracle-verified.
#
# Determinism: max|v| is an unrolled GREATEST tree (max of doubles is
# exact, any shape works — same shape emitted for both engines anyway);
# scale and per-element floor/mults are scalar double ops with identical
# association; code sums are integer.  All scan-side, no shuffle.
# ---------------------------------------------------------------------------


def _q8_exprs(a: str, dialect: str) -> tuple[str, str, str]:
    """(max_abs, code_sum, max_err) unrolled expression trees."""
    off = 0 if dialect == "spark" else 1
    cast_int = "INT" if dialect == "spark" else "INTEGER"
    els = [f"{a}[{i + off}]" for i in range(DIM)]

    def tree(terms, op):
        while len(terms) > 1:
            terms = [
                f"{op}({terms[i]}, {terms[i + 1]})"
                if i + 1 < len(terms) else terms[i]
                for i in range(0, len(terms), 2)
            ]
        return terms[0]

    max_abs = tree([f"ABS({e})" for e in els], "GREATEST")
    code = [
        f"CAST(FLOOR({e} * (127.0 / __m)) AS {cast_int})" for e in els
    ]
    # sum tree: plain + over bigints
    terms = [f"CAST({c} AS BIGINT)" for c in code]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})"
            if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    code_sum = terms[0]
    err = [
        f"ABS({e} - {c} * (__m / 127.0))" for e, c in zip(els, code)
    ]
    max_err = tree(err, "GREATEST")
    return max_abs, code_sum, max_err


def embeddings_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension scaling statistics (min/max/sum/count) — the
    normalizer-fitting pass every embedding pipeline runs before
    quantization or whitening.  Components are quantized per element to
    1e-6 BIGINT (truncated — the engines' CAST semantics differ, so the
    oracle mirrors with trunc()) BEFORE aggregating, making the sums
    integer-associative and the row hash partition-order-free.  Scale
    shape: one explode + one map-side-combinable 64-group aggregate."""
    v = _normed(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT CAST(i AS INT) AS dim,
               MIN(eq) AS min_q, MAX(eq) AS max_q,
               SUM(eq) AS sum_q, COUNT(*) AS n
        FROM (
          SELECT i, CAST(e * 1000000 AS BIGINT) AS eq
          FROM (SELECT posexplode(emb) AS (i, e) FROM {v})
        )
        GROUP BY i
        """
    )


_DIM_STATS_ORACLE = f"""
WITH {_duck_v_cte()},
ex AS (
  SELECT u.i - 1 AS i,
         CAST(trunc(v.emb[u.i] * 1000000) AS BIGINT) AS eq
  FROM v, (SELECT unnest(generate_series(1, {DIM})) AS i) u
)
SELECT CAST(i AS INTEGER) AS dim,
       MIN(eq) AS min_q, MAX(eq) AS max_q,
       CAST(SUM(eq) AS BIGINT) AS sum_q, COUNT(*) AS n
FROM ex GROUP BY i
"""


def embeddings_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization checksum + max reconstruction error."""
    v = _normed(spark, sf_dir)
    max_abs, code_sum, max_err = _q8_exprs("emb", "spark")
    return spark.sql(
        f"""
        SELECT vec_id, code_sum,
               CAST(FLOOR(max_err * 1000000) AS BIGINT) AS max_err_q
        FROM (
          SELECT vec_id, {code_sum} AS code_sum, {max_err} AS max_err
          FROM (SELECT vec_id, emb, {max_abs} AS __m FROM {v})
        )
        """
    )


def _quantize_oracle() -> str:
    max_abs, code_sum, max_err = _q8_exprs("emb", "duck")
    return f"""
WITH {_duck_v_cte()}
SELECT vec_id, code_sum,
       CAST(FLOOR(max_err * 1000000) AS BIGINT) AS max_err_q
FROM (
  SELECT vec_id, {code_sum} AS code_sum, {max_err} AS max_err
  FROM (SELECT vec_id, emb, {max_abs} AS __m FROM v)
)
"""


# ---------------------------------------------------------------------------
# Scalar-quantized (SQ8) search — the third compression point of the
# ANN family here (hyperplane LSH = 1 bit/dim, PQ = sub-vector
# codebooks, SQ8 = 8 bits/dim with a per-vector scale; faiss's
# ScalarQuantizer default).  The stored index is (vec_id, int8 code
# array, 1e-6-BIGINT scale); the approximate dot between query q and
# candidate c is (q_scale * c_scale / 127^2) * SUM_i cq_i*cc_i, and
# per query the q-side factor is constant — so candidates rank by the
# EXACT INTEGER product c_scale_q * SUM_i cq_i*cc_i (|dot| <=
# 64 * 127^2 ~= 1.03e6, scale_q <= 1e6 on normalized vectors: the
# product fits BIGINT with 10^5 headroom).  No doubles anywhere in the
# ranking key: bit-identical on any engine, full value-hash oracle.
#
# Scale shape: the code table is the checkpointed index (at 100 TB, a
# written int8 column ~4x smaller than the float vectors — the reason
# SQ8 exists); the search is a broadcast 8-row query-code join against
# the index scan with the top-k lowered to WindowGroupLimit — the same
# intentional all-pairs shape as ann_bruteforce, in 1/4 the bytes.
# ---------------------------------------------------------------------------


def _sq_exprs(a: str, dialect: str) -> tuple[str, str, str]:
    """(max_abs, code_array, scale_q) over ``a`` (needs __m bound)."""
    off = 0 if dialect == "spark" else 1
    cast_int = "INT" if dialect == "spark" else "INTEGER"
    els = [f"{a}[{i + off}]" for i in range(DIM)]

    def tree(terms, op):
        while len(terms) > 1:
            terms = [
                f"{op}({terms[i]}, {terms[i + 1]})"
                if i + 1 < len(terms) else terms[i]
                for i in range(0, len(terms), 2)
            ]
        return terms[0]

    # GREATEST(.., 1e-30): an all-zero embedding would make 127.0 / __m
    # infinite and 0 * inf = NaN, whose integer cast is engine-dependent
    # (Spark CAST(NaN AS INT) = 0, DuckDB errors).  Clamping the divisor
    # to a tiny epsilon makes zero vectors quantize to all-zero codes
    # deterministically on both engines; any vector with a non-degenerate
    # component (>= 1e-30) is untouched.
    max_abs = (
        f"GREATEST({tree([f'ABS({e})' for e in els], 'GREATEST')}, 1e-30)"
    )
    codes = [
        f"CAST(FLOOR({e} * (127.0 / __m)) AS {cast_int})" for e in els
    ]
    arr = (
        f"array({', '.join(codes)})"
        if dialect == "spark"
        else f"[{', '.join(codes)}]"
    )
    scale = "CAST(FLOOR(__m * 1000000) AS BIGINT)"
    return max_abs, arr, scale


def _sq_dot(qa: str, ca: str, dialect: str) -> str:
    """Exact-integer code dot product, balanced sum tree."""
    off = 0 if dialect == "spark" else 1
    terms = [
        f"(CAST({qa}[{i + off}] AS BIGINT) * {ca}[{i + off}])"
        for i in range(DIM)
    ]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})"
            if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


_sq_cache: dict = {}


def _sq_index_view(spark: SparkSession, sf_dir: str) -> str:
    """Temp-view name of the checkpointed SQ8 code table."""
    key = (session_key(spark), sf_dir)
    if key not in _sq_cache:
        v = _normed(spark, sf_dir)
        max_abs, arr, scale = _sq_exprs("emb", "spark")
        idx = spark.sql(
            f"""
            SELECT vec_id, {arr} AS code, {scale} AS scale_q
            FROM (SELECT vec_id, emb, {max_abs} AS __m FROM {v})
            """
        ).localCheckpoint(eager=True)
        name = f"sq_index_{abs(hash(key)) % 10**8}"
        idx.createOrReplaceTempView(name)
        _sq_cache[key] = (name, idx)
    return _sq_cache[key][0]


def ann_sq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per query over the stored SQ8 code table; integer-exact
    ranking key (candidate scale x code dot)."""
    idx = _sq_index_view(spark, sf_dir)
    dot = _sq_dot("q.code", "c.code", "spark")
    return spark.sql(
        f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 c.scale_q * ({dot}) AS score_q
          FROM (SELECT * FROM {idx} WHERE vec_id < {N_QUERIES}) q
          JOIN {idx} c ON q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id, score_q,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score_q DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               score_q
        FROM ranked WHERE rank <= {TOP_K}
        """
    )


def _sq_search_oracle() -> str:
    max_abs, arr, scale = _sq_exprs("emb", "duck")
    dot = _sq_dot("q.code", "c.code", "duck")
    return f"""
WITH {_duck_v_cte()},
sq AS MATERIALIZED (
  SELECT vec_id, {arr} AS code, {scale} AS scale_q
  FROM (SELECT vec_id, emb, {max_abs} AS __m FROM v)
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         c.scale_q * ({dot}) AS score_q
  FROM (SELECT * FROM sq WHERE vec_id < {N_QUERIES}) q
  JOIN sq c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score_q,
         ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score_q DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       CAST(score_q AS BIGINT) AS score_q
FROM ranked WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# k-NN graph construction: EVERY vector's top-k neighbors within its
# coarse bucket — the build step of graph-based dedup/cluster/ANN
# methods (kNN-graph clustering, NN-Descent seeding).  Unlike the ann_*
# search rows (a small query set against the corpus), this is
# corpus x corpus, made tractable the IVF way: pairs exist only within
# a bucket, so the join is bucket-keyed (shuffle by bucket, quadratic
# only in bucket size — bounded by the quantizer), and the per-vector
# top-k lowers to WindowGroupLimit.  Output is the directed edge list.
# ---------------------------------------------------------------------------

KNN_K = 5

# corpus x corpus cell guard: the candidate (b) side of the kNN-graph
# join keeps at most this many vectors per label cell (deterministic —
# lowest vec_id first, ROW_NUMBER lowers to WindowGroupLimit), so a
# skewed label cannot make the self-join quadratic in its cell size.
# Identical rule in the DuckDB oracle; far above balanced cell sizes.
KNN_CELL_CAP = 100_000


_knn_cache: dict = {}


def ann_knn_graph(
    spark: SparkSession, sf_dir: str, cell_cap: int | None = None
) -> DataFrame:
    """Directed kNN edges (vec -> its KNN_K nearest in its label cell).

    With the default cap the computed graph is checkpointed once per
    (session, sf) — it is the stored kNN index that PageRank, the
    triangle count, and the graph lane itself all read; an explicit
    ``cell_cap`` (tests, dials) bypasses the cache and computes raw."""
    if cell_cap is None:
        key = (session_key(spark), sf_dir)
        if key not in _knn_cache:
            _knn_cache[key] = _knn_graph_raw(
                spark, sf_dir, KNN_CELL_CAP
            ).localCheckpoint(eager=True)
        return _knn_cache[key]
    return _knn_graph_raw(spark, sf_dir, cell_cap)


def _knn_graph_raw(
    spark: SparkSession, sf_dir: str, cap: int
) -> DataFrame:
    v = _normed(spark, sf_dir)
    cos = _spark_cosine("a.emb", "b.emb", "a.nrm", "b.nrm")
    return spark.sql(
        f"""
        SELECT src, CAST(rank AS INTEGER) AS rank, dst FROM (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                      ORDER BY ({cos}) DESC, b.vec_id) AS rank
          FROM {v} a JOIN (
            SELECT * FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                   ORDER BY vec_id) AS lrn FROM {v}
            ) cb WHERE lrn <= {cap}
          ) b
            ON a.label = b.label AND a.vec_id <> b.vec_id
        ) t WHERE rank <= {KNN_K}
        """
    )


# ---------------------------------------------------------------------------
# Mean-reciprocal-rank eval — the second standard retrieval metric next
# to ann_recall_eval's recall@K: per query, the rank of the FIRST
# relevant neighbor (relevance = shared ground-truth label) in the
# exact brute-force top-K, and its reciprocal rank in exact ppm
# (1e6 integer-divided by the rank; 0 when no relevant neighbor lands
# in the window).  Ranks are the same deterministic (score DESC,
# vec_id) total order ann_bruteforce is driver-proven on; everything
# else is MIN/CASE over integers, so the engines cannot disagree.
# Scale shape: identical to ann_bruteforce (the broadcast-rerank
# primitive — a tiny query set against the corpus), plus one
# query-keyed aggregate.
# ---------------------------------------------------------------------------


def _mrr_sql(v: str, cos: str, idiv: str) -> str:
    return f"""
WITH ranked AS (
  SELECT q.vec_id AS query_id, c.label AS nlab, q.label AS qlab,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ({cos}) DESC, c.vec_id) AS rank
  FROM (SELECT * FROM {v} WHERE vec_id < {N_QUERIES}) q
  JOIN {v} c ON q.vec_id <> c.vec_id
)
SELECT query_id,
       CAST(MIN(CASE WHEN nlab = qlab THEN rank END) AS INTEGER)
         AS first_rel_rank,
       CAST(COALESCE(
            1000000 {idiv} MIN(CASE WHEN nlab = qlab THEN rank END), 0)
         AS BIGINT) AS rr_ppm
FROM ranked WHERE rank <= {TOP_K}
GROUP BY query_id
"""


def ann_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query first-relevant rank + reciprocal rank (ppm) in the
    brute-force top-K."""
    v = _normed(spark, sf_dir)
    cos = _spark_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return spark.sql(_mrr_sql(v, cos, "DIV"))


def _mrr_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return f"WITH {_duck_v_cte()}" + _mrr_sql("v", cos, "//").replace(
        "WITH ranked AS", ", ranked AS", 1
    )


def _knn_graph_body(cell_cap: int | None = None) -> str:
    """The DuckDB kNN-edge SELECT over relation ``v`` (no WITH)."""
    cap = KNN_CELL_CAP if cell_cap is None else cell_cap
    cos = _duck_cosine("a.emb", "b.emb", "a.nrm", "b.nrm")
    return f"""SELECT src, rank, dst FROM (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
              ORDER BY ({cos}) DESC, b.vec_id) AS INTEGER) AS rank
  FROM v a JOIN (
    SELECT * FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY label
           ORDER BY vec_id) AS lrn FROM v
    ) cb WHERE lrn <= {cap}
  ) b
    ON a.label = b.label AND a.vec_id <> b.vec_id
) t WHERE rank <= {KNN_K}
"""


# ---------------------------------------------------------------------------
# PageRank over the kNN graph — graph centrality for data curation:
# high-rank vectors are the "representative" corpus members that many
# nearest-neighbor chains point at (the selection signal for coreset /
# prototype sampling at 100 TB).  Fixed damped iterations in EXACT
# integer arithmetic: ranks live at PR_SCALE, every per-edge
# contribution is one integer division of POSITIVE values (trunc ==
# floor, so the engines cannot disagree), and the sums are
# integer-associative — the result is bit-identical on any engine and
# any partitioning.
#
# Scale shape: each iteration is ONE edges-keyed join against the
# current rank table + a dst-keyed map-side-combinable aggregate — the
# canonical distributed PageRank step, no driver-side graph state; the
# edge relation is the checkpointed kNN index built once per session.
# ---------------------------------------------------------------------------

# deterministic negative-draw constants (Kirsch-Mitzenmacher style,
# same family as the minhash permutations); 4 probe candidates
TRIPLET_PROBES = 4
_TRI_M = 1_000_003


def _triplet_sql(dialect: str, edges: str, v: str) -> str:
    """(anchor, positive, hard-negative, easy-negative) triplets from
    the kNN edge list: pos = rank-1 neighbor, hard_neg = rank-K
    neighbor (similar-but-not-nearest — the standard hard negative),
    easy_neg = first of TRIPLET_PROBES deterministic hash draws that
    collides with neither the anchor, the positive, nor any kNN
    neighbor (falls back to draw 0 with neg_valid = 0 — total and
    engine-identical either way).  The draw maps into [0, n_vecs) and
    assumes dense vec_ids (true of the testdata; a production corpus
    keeps a ROW_NUMBER side table and joins the draw through it)."""
    if dialect == "spark":
        mx, contains = "max_by(dst, rank)", "array_contains(arr, cand)"
        arr_agg = "collect_set(dst)"
        fan = (
            f"LATERAL VIEW explode(sequence(0, {TRIPLET_PROBES - 1}))"
            " s AS j"
        )
        icast = "INT"
    else:
        mx, contains = "max_by(dst, rank)", "list_contains(arr, cand)"
        arr_agg = "list(dst)"
        fan = f", unnest(generate_series(0, {TRIPLET_PROBES - 1})) AS s(j)"
        icast = "INTEGER"
    cand = (
        f"((anchor_id % {_TRI_M}) * 2654435761 + j * 40503 + 17)"
        f" % (SELECT n FROM nv)"
    )
    return f"""
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {v}),
agg AS (
  SELECT src AS anchor_id,
         MAX(CASE WHEN rank = 1 THEN dst END) AS pos_id,
         {mx} AS hard_neg_id,
         {arr_agg} AS arr
  FROM {edges} GROUP BY src
),
c AS (
  SELECT anchor_id, pos_id, hard_neg_id, j,
         CAST({cand} AS BIGINT) AS cand, arr
  FROM agg {fan}
),
p AS (
  SELECT anchor_id, pos_id, hard_neg_id, cand,
         (cand <> anchor_id AND cand <> pos_id
          AND NOT {contains}) AS ok,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
              ORDER BY (cand <> anchor_id AND cand <> pos_id
                        AND NOT {contains}) DESC, j) AS rn
  FROM c
)
SELECT anchor_id, pos_id, hard_neg_id, cand AS easy_neg_id,
       CAST(CASE WHEN ok THEN 1 ELSE 0 END AS {icast}) AS neg_valid
FROM p WHERE rn = 1
"""


def train_contrastive_triplets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contrastive training triplets (anchor, positive, hard negative,
    easy negative) mined from the stored kNN index — the data-prep
    step for contrastive embedding training (SimCSE/InfoNCE-style):
    positives come from the nearest neighbor, hard negatives from the
    edge of the neighborhood, easy negatives from a deterministic
    corpus draw that provably avoids the neighborhood.  One aggregate
    over the checkpointed kNN edges + a TRIPLET_PROBES-way fanout over
    the K-row-per-anchor result; no corpus re-scan."""
    v = _normed(spark, sf_dir)
    edges = ann_knn_graph(spark, sf_dir)
    tag = abs(hash((session_key(spark), sf_dir))) % 10**8
    name = f"knn_full_{tag}"
    edges.createOrReplaceTempView(name)
    return spark.sql(f"WITH {_triplet_sql('spark', name, v)}")


def _triplet_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
e AS MATERIALIZED ({_knn_graph_body()}),
{_triplet_sql('duck', 'e', 'v')}
"""


PR_SCALE = 1_000_000
PR_ITERS = 3
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100

_pr_edges_cache: dict = {}


def _pagerank_tail(idiv: str, edges: str, mat: str = "") -> str:
    """The shared post-edges CTE chain: nodes/outd/r0 -> rK, one CTE
    pair per iteration (the oracle runs the identical unrolled chain).

    ``mat`` — ``"MATERIALIZED "`` on the duck side: duckdb 1.0 inlines
    plain CTEs, so the unrolled r1..rK chain would re-expand nodes/outd
    (and through them the whole edge relation) multiplicatively per
    iteration; Spark's duplicated subtrees read the checkpointed edge
    view and dedup via ReuseExchange, same as _kcore_tail."""
    parts = [
        f"""nodes AS {mat}(
  SELECT src AS node FROM {edges}
  UNION
  SELECT dst FROM {edges}
)""",
        f"outd AS {mat}(SELECT src, COUNT(*) AS d FROM {edges} GROUP BY src)",
        f"r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes)",
    ]
    # spark-only join-strategy hints: the checkpointed edge scan has no
    # stats, so every per-iteration join planned as sort-merge — the
    # edge side was re-SORTED each of the 3 iterations.  SHUFFLE_HASH
    # builds the per-partition rank/degree maps instead (no sort on
    # either side), and stays scale-safe: the build side per partition
    # is the rank slice, 16 bytes/node (guide §3.1; duck ignores the
    # comment-style hints but is kept hint-free anyway).
    sh = (lambda a: f"/*+ SHUFFLE_HASH({a}) */ ") if idiv == "DIV" \
        else (lambda a: "")
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        parts.append(
            f"""c{k} AS {mat}(
  SELECT {sh('r, o')}e.dst AS node,
         CAST(SUM(r.r {idiv} o.d) AS BIGINT) AS s
  FROM {edges} e
  JOIN {prev} r ON r.node = e.src
  JOIN outd o ON o.src = e.src
  GROUP BY e.dst
)"""
        )
        parts.append(
            f"""r{k} AS {mat}(
  SELECT {sh('c')}n.node,
         CAST(({PR_SCALE} * {PR_DAMP_DEN - PR_DAMP_NUM}) {idiv} {PR_DAMP_DEN}
              + ({PR_DAMP_NUM} * COALESCE(c.s, 0)) {idiv} {PR_DAMP_DEN}
           AS BIGINT) AS r
  FROM nodes n LEFT JOIN c{k} c ON n.node = c.node
)"""
        )
        prev = f"r{k}"
    return (
        ",\n".join(parts)
        + f"\nSELECT node AS vec_id, r AS rank_q FROM {prev}"
    )


def _knn_edges_view(spark: SparkSession, sf_dir: str) -> str:
    """Temp-view name of the checkpointed kNN edge list (src, dst),
    built once per (session, sf) — the shared graph index of the
    PageRank and triangle-count lanes."""
    key = (session_key(spark), sf_dir)
    if key not in _pr_edges_cache:
        # the graph itself is already checkpointed (ann_knn_graph's
        # default-cap cache); the view is a cheap projection over the
        # materialized blocks.  The frame rides along so cache-clearers
        # can free those blocks (the view name alone can't).
        graph = ann_knn_graph(spark, sf_dir)
        edges = graph.select("src", "dst")
        name = f"pr_edges_{abs(hash(key)) % 10**8}"
        edges.createOrReplaceTempView(name)
        _pr_edges_cache[key] = (name, graph)
    return _pr_edges_cache[key][0]


def ann_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact damped PageRank over the checkpointed kNN edges."""
    edges = _knn_edges_view(spark, sf_dir)
    return spark.sql(f"WITH {_pagerank_tail('DIV', edges)}")


def _pagerank_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
pr_edges AS MATERIALIZED (
  SELECT src, dst FROM ({_knn_graph_body()})
),
{_pagerank_tail('//', 'pr_edges', 'MATERIALIZED ')}
"""


# ---------------------------------------------------------------------------
# Triangle count + local clustering coefficient over the kNN graph —
# the standard graph-quality signal for neighbor indexes (a healthy
# kNN graph of a clusterable corpus is triangle-dense; triangle-poor
# nodes are hubs/noise, another curation signal).  Exact integers
# throughout: the triangle enumeration is the canonical two-join over
# the oriented edge list (a<b<c, each triangle counted once), degrees
# are COUNTs, and the coefficient is one positive integer division at
# ppm scale — bit-identical on both engines.
#
# Scale shape: orienting edges low->high bounds the join fan-out by
# the max out-degree (<= 2*KNN_K here, since the base graph has
# out-degree KNN_K), so the e1-e2 join is linear in edges with a
# constant factor, the classic distributed triangle recipe; no driver
# state, two shuffles keyed by node/edge.
# ---------------------------------------------------------------------------


def _triangle_tail(idiv: str, edges: str, mat: str = "") -> str:
    """Shared post-edges CTE chain: orient -> enumerate -> per-node
    counts -> degree join -> clustering coefficient (ppm).

    ``mat`` — ``"MATERIALIZED "`` on the duck side (``und`` is consumed
    three times by the enumeration join and ``tri`` three times by the
    per-node UNION ALL; duckdb 1.0 inlines plain CTEs, re-running the
    whole edge pipeline per reference); Spark reads the checkpointed
    edge view and dedups the repeats via ReuseExchange."""
    return f"""und AS {mat}(
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM {edges}
),
tri AS {mat}(
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
pern AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
)
SELECT d.node AS vec_id, d.degree,
       COALESCE(t.tri_cnt, CAST(0 AS BIGINT)) AS tri_cnt,
       CASE WHEN d.degree >= 2
            THEN CAST((2000000 * COALESCE(t.tri_cnt, 0))
                 {idiv} (d.degree * (d.degree - 1)) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS cc_ppm
FROM deg d LEFT JOIN pern t ON t.node = d.node"""


def ann_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count + clustering coefficient (ppm) over the
    undirected kNN graph."""
    edges = _knn_edges_view(spark, sf_dir)
    return spark.sql(f"WITH {_triangle_tail('DIV', edges)}")


def _triangles_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
pr_edges AS MATERIALIZED (
  SELECT src, dst FROM ({_knn_graph_body()})
),
{_triangle_tail('//', 'pr_edges', 'MATERIALIZED ')}
"""


# ---------------------------------------------------------------------------
# k-core membership (fixed-round peeling) over the undirected kNN
# graph: nodes below degree K are peeled, degrees recompute on the
# induced subgraph, repeat — survivors of the fixed unrolled rounds are
# the dense-core members (the "well-embedded" corpus: peeled nodes are
# weakly connected outliers/noise, the complement curation signal to
# ann_outliers).  True coreness needs peel-to-fixpoint; KCORE_ROUNDS
# rounds is the deterministic bounded approximation (documented, same
# rule both engines), exactly how CC_MAX_ITERS bounds the cluster loop.
# Each round is one semi-join + degree aggregate over the checkpointed
# edge index — no driver state, integer-only.
# ---------------------------------------------------------------------------

KCORE_K = 4
KCORE_ROUNDS = 3


def _kcore_tail(edges: str, dialect: str) -> str:
    """Shared CTE chain over ``{edges}``: undirected edges -> peel
    rounds -> per-node final degree + membership flag.

    Structured so every round consumes its edge set ONCE (endpoints
    come from one explode/unnest, not a UNION ALL referencing the CTE
    twice) — a doubly-referenced chain inlines exponentially in the
    round count.  The remaining 2x (both endpoints semi-join the
    surviving node set) is pinned to one evaluation per CTE in DuckDB
    via MATERIALIZED; Spark's duplicated subtrees share the
    checkpointed edge scan and its exchanges are deduped by
    ReuseExchange."""
    mat = "MATERIALIZED " if dialect == "duck" else ""
    ends = (
        "explode(array(a, b))" if dialect == "spark" else "unnest([a, b])"
    )
    parts = [
        f"""u AS {mat}(
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM {edges}
)""",
        f"""n0 AS {mat}(
  SELECT node FROM (SELECT {ends} AS node FROM u)
  GROUP BY node HAVING COUNT(*) >= {KCORE_K}
)""",
    ]
    prev = "n0"
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f"""e{r} AS {mat}(
  SELECT u.a, u.b FROM u
  JOIN {prev} x ON x.node = u.a
  JOIN {prev} y ON y.node = u.b
)"""
        )
        parts.append(
            f"""n{r} AS {mat}(
  SELECT node FROM (SELECT {ends} AS node FROM e{r})
  GROUP BY node HAVING COUNT(*) >= {KCORE_K}
)"""
        )
        prev = f"n{r}"
    return (
        ",\n".join(parts)
        + f"""
SELECT t.node AS vec_id,
       CAST(COUNT(*) AS BIGINT) AS degree,
       CAST(CASE WHEN k.node IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS in_core
FROM (SELECT {ends} AS node FROM u) t
LEFT JOIN {prev} k ON k.node = t.node
GROUP BY t.node, k.node"""
    )


_kcore_cache: dict = {}


def ann_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree + KCORE_ROUNDS-round k-core membership per graph node.

    The Spark side MATERIALIZES each peel round (localCheckpoint of the
    undirected edge set once, then of every round's survivor node set —
    all bounded by the graph, the survivor sets shrinking) instead of
    running the unrolled CTE chain: each round references the previous
    survivor set TWICE (both endpoints semi-join it), so the un-pinned
    chain relied on ReuseExchange to dedup the doubled subtrees — which
    AQE does not guarantee across hosts/plans, and when it didn't fire
    the doubled subtrees compounded per round (4.9s vs 0.7s on the two
    r8 bench hosts).  Checkpoints make it deterministic O(rounds) scans,
    the same recipe as the CC label loop and the index tables.  The
    oracle runs the identical algebra as one MATERIALIZED-pinned CTE
    chain (_kcore_tail)."""
    key = (session_key(spark), sf_dir)
    if key in _kcore_cache:
        return _kcore_cache[key][0]
    edges = _knn_edges_view(spark, sf_dir)
    tag = abs(hash(key)) % 10**8
    ckpts = []
    u = spark.sql(
        f"SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
        f"FROM {edges}"
    ).localCheckpoint(eager=True)
    ckpts.append(u)
    uname = f"kcore_u_{tag}"
    u.createOrReplaceTempView(uname)
    surv = spark.sql(
        f"SELECT node FROM "
        f"(SELECT explode(array(a, b)) AS node FROM {uname}) "
        f"GROUP BY node HAVING COUNT(*) >= {KCORE_K}"
    ).localCheckpoint(eager=True)
    ckpts.append(surv)
    for r in range(1, KCORE_ROUNDS + 1):
        sname = f"kcore_n{r - 1}_{tag}"
        surv.createOrReplaceTempView(sname)
        surv = spark.sql(
            f"""SELECT node FROM (
  SELECT explode(array(a, b)) AS node FROM (
    SELECT u.a, u.b FROM {uname} u
    JOIN {sname} x ON x.node = u.a
    JOIN {sname} y ON y.node = u.b
  )
) GROUP BY node HAVING COUNT(*) >= {KCORE_K}"""
        ).localCheckpoint(eager=True)
        ckpts.append(surv)
    kname = f"kcore_final_{tag}"
    surv.createOrReplaceTempView(kname)
    out = spark.sql(
        f"""SELECT t.node AS vec_id,
       CAST(COUNT(*) AS BIGINT) AS degree,
       CAST(CASE WHEN k.node IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS in_core
FROM (SELECT explode(array(a, b)) AS node FROM {uname}) t
LEFT JOIN {kname} k ON k.node = t.node
GROUP BY t.node, k.node"""
    )
    _kcore_cache[key] = (out, ckpts)
    return out


def _kcore_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
kc_edges AS MATERIALIZED (
  SELECT src, dst FROM ({_knn_graph_body()})
),
{_kcore_tail('kc_edges', 'duck')}
"""


# ---------------------------------------------------------------------------
# Top principal component by power iteration — the fitting pass of
# whitening / PCA-truncation stages, as distributed linear algebra:
# each iteration is two map-side-combinable aggregates over the
# exploded (vec_id, dim, component) relation (s = X v, then w = X^T s),
# the exact shape a 1000-executor covariance multiply has.  All
# arithmetic is QUANTIZED-EXACT integers: components at 1e-6, the
# iterate renormalized to ~1e6 through sign-split divisions
# (sign(x) * (|x| DIV d) — positive-only DIV, so trunc == floor and the
# engines cannot disagree), integer-associative sums.  Fixed PI_ITERS
# unrolled, bit-identical on any partitioning.
#
# Overflow ledger (int64): |eq| <= ~1e6, |vq| <= ~1e6 =>
# |s| <= DIM * 1e12 ~ 6.4e13; sp = s DIV 1e8 <= 6.4e5;
# |w| <= n * 6.4e5 * 1e6 = n * 6.4e11 — safe to n ~ 1.4e7 rows; at
# larger n, PI_RESCALE grows with log10(n) (a quantization knob, not a
# structural limit).
# ---------------------------------------------------------------------------

PI_ITERS = 3
PI_SCALE = 1_000_000
PI_RESCALE = 100_000_000


def _sidiv(x: str, d: str, op: str) -> str:
    """Sign-split integer division: engine-identical for signed x."""
    return (
        f"(CASE WHEN ({x}) < 0 THEN -1 ELSE 1 END) * (ABS({x}) {op} ({d}))"
    )


def _power_iter_chain(op: str, src: str = "x", pfx: str = "") -> str:
    """Shared CTE chain {pfx}v0 -> {pfx}vK over relation
    ``src``(vec_id, i, eq); the dialect differs only in the
    integer-division operator.  ``pfx`` namespaces the CTEs so two
    chains (PC1 fit, deflated PC2 fit) compose in one statement."""
    parts = [
        f"{pfx}v0 AS (SELECT DISTINCT i, CAST({PI_SCALE} AS BIGINT) AS vq"
        " FROM " + src + ")",
    ]
    for k in range(1, PI_ITERS + 1):
        parts += [
            f"""{pfx}s{k} AS (
  SELECT x.vec_id, CAST(SUM(x.eq * v.vq) AS BIGINT) AS s
  FROM {src} x JOIN {pfx}v{k - 1} v ON v.i = x.i GROUP BY x.vec_id
)""",
            f"""{pfx}p{k} AS (
  SELECT vec_id, {_sidiv('s', str(PI_RESCALE), op)} AS sp FROM {pfx}s{k}
)""",
            f"""{pfx}w{k} AS (
  SELECT x.i, CAST(SUM(p.sp * x.eq) AS BIGINT) AS w
  FROM {src} x JOIN {pfx}p{k} p ON p.vec_id = x.vec_id GROUP BY x.i
)""",
            f"""{pfx}m{k} AS (
  SELECT GREATEST(MAX(ABS(w)) {op} {PI_SCALE}, 1) AS d FROM {pfx}w{k}
)""",
            f"""{pfx}v{k} AS (
  SELECT i, {_sidiv('w', f'(SELECT d FROM {pfx}m{k})', op)} AS vq FROM {pfx}w{k}
)""",
        ]
    return ",\n".join(parts)


def _power_iter_tail(op: str) -> str:
    return (
        _power_iter_chain(op)
        + f"\nSELECT CAST(i AS INT) AS dim,"
        f" CAST(vq AS BIGINT) AS pc_q FROM v{PI_ITERS}"
    )


_xq_cache: dict = {}
_top_pc_cache: dict = {}


def _power_iter_fit(spark: SparkSession, src: str) -> list[tuple[int, int]]:
    """Spark-side power iteration as a DRIVER LOOP with literal
    directions (the Lloyd's-k-means pattern): each of the PI_ITERS
    rounds is ONE small query — a vec_id-window sum against the
    64-int literal v_{k-1} plus a 64-group aggregate — whose 64-row
    result becomes the next round's literal; the max-normalize runs on
    exact Python ints.  Bit-identical to the inlined CTE chain the
    oracles keep (window SUM == GROUP BY SUM for integer multisets,
    same _sidiv ledger), at a fraction of the plan depth: the chain
    form planned 6 shuffles and a deep codegen DAG per fit."""
    v = [PI_SCALE] * DIM  # v0
    for _ in range(PI_ITERS):
        u = (
            f"element_at(array({', '.join(str(q) for q in v)}),"
            " CAST(i AS INT) + 1)"
        )
        sp = _sidiv(
            f"CAST(SUM(eq * {u}) OVER (PARTITION BY vec_id) AS BIGINT)",
            str(PI_RESCALE),
            "DIV",
        )
        rows = spark.sql(
            f"SELECT i, CAST(SUM(sp * eq) AS BIGINT) AS w FROM"
            f" (SELECT i, eq, {sp} AS sp FROM {src}) t GROUP BY i"
        ).collect()
        w = {r.i: r.w for r in rows}
        wv = [w.get(i, 0) for i in range(DIM)]
        d = max(max(abs(x) for x in wv) // PI_SCALE, 1)
        v = [(-1 if x < 0 else 1) * (abs(x) // d) for x in wv]
    return sorted((i, v[i]) for i in range(DIM))


def _xq_view(spark: SparkSession, sf_dir: str) -> str:
    """Checkpointed exploded quantized-component relation
    (vec_id, i, eq) — the matrix the power-iteration aggregates
    multiply against.  Left as an inline CTE, Catalyst re-expands the
    explode at every one of the chain's ~7 references (measured 4.0s
    -> 2.4s at sf0.1 just from checkpointing it)."""
    key = (session_key(spark), sf_dir)
    if key not in _xq_cache:
        from dataforge_core_spark.session import index_width

        v = _normed(spark, sf_dir)
        # width sized to the exploded matrix (r15): unlike the
        # compute-dense ANN serving scans, every consumer of this
        # relation is aggregate-shaped (vec_id windows, 64-group SUMs)
        # with trivial per-row work, so inheriting the 32-wide scan
        # partitioning just multiplies task overhead per power-iteration
        # round (measured: pc_project 0.25 -> 0.11s warm)
        x = spark.sql(
            f"""
            SELECT vec_id, i, CAST(e * {PI_SCALE} AS BIGINT) AS eq
            FROM (SELECT vec_id, posexplode(emb) AS (i, e) FROM {v})
            """
        )
        x = x.repartition(
            index_width(spark.table(v).count() * DIM, 32_000)
        ).localCheckpoint(eager=True)
        name = f"xq_{abs(hash(key)) % 10**8}"
        x.createOrReplaceTempView(name)
        _xq_cache[key] = (name, x)
    return _xq_cache[key][0]


def _fit_top_pc(spark: SparkSession, sf_dir: str) -> list[tuple[int, int]]:
    """Run the power iteration once per (session, sf) and cache the
    fitted 64-int direction — an index artifact exactly like the
    k-means centroids (``_kmeans_assignments``): the fit is charged as
    an index build, queries serve from the fitted vector."""
    key = (session_key(spark), sf_dir)
    if key not in _top_pc_cache:
        _top_pc_cache[key] = _power_iter_fit(
            spark, _xq_view(spark, sf_dir)
        )
    return _top_pc_cache[key]


def _deflate_ctes(op: str, x: str, v1: str, pfx: str = "") -> str:
    """CTEs n1/cf/x2: subtract each vector's PC1 component from the
    quantized matrix ``x`` (deflation), keeping every quantity in the
    same 1e6 fixed-point ledger.  True coefficient <e,u>/<u,u> maps to
    cp = sidiv(sum(eq*vq), 1e6) over n1 = sidiv(sum(vq^2), 1e6), so
    eq2 = eq - sidiv(cp*vq, n1) is the projection residual at eq's own
    scale.  Overflow ledger: |cp| <= ~3e8, |cp*vq| <= ~3e14 — int64
    safe; identical expression trees on both engines.  ``pfx``
    namespaces the CTEs so deflations chain (ABTT removes two
    directions sequentially)."""
    return f"""{pfx}n1 AS (
  SELECT GREATEST(CAST(SUM(vq * vq) AS BIGINT) {op} {PI_SCALE}, 1) AS d
  FROM {v1}
),
{pfx}cf AS (
  SELECT x.vec_id,
         {_sidiv('CAST(SUM(x.eq * v.vq) AS BIGINT)', str(PI_SCALE), op)}
           AS cp
  FROM {x} x JOIN {v1} v ON v.i = x.i GROUP BY x.vec_id
),
{pfx}x2 AS (
  SELECT x.vec_id, x.i,
         x.eq - {_sidiv('c.cp * v.vq', f'(SELECT d FROM {pfx}n1)', op)}
           AS eq
  FROM {x} x
  JOIN {pfx}cf c ON c.vec_id = x.vec_id
  JOIN {v1} v ON v.i = x.i
)"""


_pc2_cache: dict = {}
# the deflated (x - PC1) matrix checkpoint, kept for the multi-PC fit
# to continue from (freed by the bench clearer, not eagerly — the
# deeper fits would otherwise re-pay the first deflate pass)
_x2_cache: dict = {}


def _deflate_projection(fit: list[tuple[int, int]], src: str) -> str:
    """Spark-side deflation as a JOIN-FREE window projection (the abtt
    pattern): the fitted direction is a 64-int literal array, cp is a
    vec_id-window sum, n1 is computed in Python — one exchange instead
    of a 64-way literal-union join.  Integer sums are order-free, so
    the values are bit-identical to the oracle's join-CTE deflation
    (_deflate_ctes) — the equality embeddings_abtt's oracle already
    proves for this exact shape."""
    arr = ", ".join(str(q) for _d, q in fit)
    n1 = max(sum(q * q for _d, q in fit) // PI_SCALE, 1)
    u = f"element_at(array({arr}), CAST(i AS INT) + 1)"
    cp = _sidiv(
        f"CAST(SUM(eq * {u}) OVER (PARTITION BY vec_id) AS BIGINT)",
        str(PI_SCALE),
        "DIV",
    )
    return (
        f"SELECT vec_id, i,"
        f" eq - {_sidiv(f'({cp}) * {u}', str(n1), 'DIV')} AS eq"
        f" FROM {src}"
    )


def _fit_top_pc2(spark: SparkSession, sf_dir: str) -> list[tuple[int, int]]:
    """Second principal direction by DEFLATION: subtract the fitted
    PC1 component from every vector (one pass over the checkpointed
    quantized matrix, itself checkpointed) and re-run the same
    quantized power iteration on the residuals.  Cached per
    (session, sf) like the PC1 fit; the deflated matrix stays
    checkpointed in _x2_cache so _fit_top_pcs continues the deflation
    without re-paying this pass."""
    key = (session_key(spark), sf_dir)
    if key not in _pc2_cache:
        x = _xq_view(spark, sf_dir)
        x2 = spark.sql(
            _deflate_projection(_fit_top_pc(spark, sf_dir), x)
        ).localCheckpoint(eager=True)
        name = f"xq2_{abs(hash(key)) % 10**8}"
        x2.createOrReplaceTempView(name)
        _x2_cache[key] = (name, x2)
        _pc2_cache[key] = _power_iter_fit(spark, name)
    return _pc2_cache[key]


def embeddings_top_pc2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second principal direction (quantized to ~1e6) via deflation
    power iteration — with embeddings_top_pc this is the start of the
    PCA-k / whitening family: at 100 TB the fit is one extra pass over
    the stored quantized matrix per additional component.
    Near-orthogonality to PC1 is pinned by
    tests/test_parameterized.py::test_pc2_orthogonal_to_pc1."""
    fitted = _fit_top_pc2(spark, sf_dir)
    return spark.createDataFrame(fitted, "dim int, pc2_q bigint")


def _top_pc2_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
x AS MATERIALIZED (
  SELECT v.vec_id, u.i - 1 AS i,
         CAST(trunc(v.emb[u.i] * {PI_SCALE}) AS BIGINT) AS eq
  FROM v, (SELECT unnest(generate_series(1, {DIM})) AS i) u
),
{_power_iter_chain('//')},
{_deflate_ctes('//', 'x', f'v{PI_ITERS}')},
x2m AS MATERIALIZED (SELECT * FROM x2),
{_power_iter_chain('//', src='x2m', pfx='b')}
SELECT CAST(i AS INTEGER) AS dim, CAST(vq AS BIGINT) AS pc2_q
FROM bv{PI_ITERS}
"""


def embeddings_abtt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top post-processing (Mu & Viswanath, ICLR 2018):
    remove the top TWO principal directions from every embedding —
    the standard isotropy fix before cosine retrieval.  Sequential
    integer deflation: cp1 = component along the fitted PC1, residual
    r1 = e - proj1, cp2 = component of r1 along the fitted PC2,
    r2 = r1 - proj2; emits (vec_id, proj1_q, proj2_q, resid_ssq_q)
    with resid_ssq_q = SUM(r2^2) DIV 1e6 — all in the shared 1e6
    fixed-point ledger, so integer sums are order-free and the oracle
    value-hashes.  Plan shape: the fitted directions are 64-int
    LITERAL arrays (the centroid pattern) — two vec_id-partitioned
    window sums + one aggregate over the checkpointed component
    relation, one exchange, no joins."""
    fitted1 = _fit_top_pc(spark, sf_dir)
    fitted2 = _fit_top_pc2(spark, sf_dir)
    a1 = ", ".join(str(q) for _d, q in fitted1)
    a2 = ", ".join(str(q) for _d, q in fitted2)
    n1 = max(sum(q * q for _d, q in fitted1) // PI_SCALE, 1)
    n2 = max(sum(q * q for _d, q in fitted2) // PI_SCALE, 1)
    x = _xq_view(spark, sf_dir)
    u1 = f"element_at(array({a1}), CAST(i AS INT) + 1)"
    u2 = f"element_at(array({a2}), CAST(i AS INT) + 1)"
    w = "OVER (PARTITION BY vec_id)"
    cp1 = _sidiv(f"CAST(SUM(eq * {u1}) {w} AS BIGINT)", str(PI_SCALE), "DIV")
    return spark.sql(
        f"""
        WITH r1 AS (
          SELECT vec_id, i,
                 eq - {_sidiv(f'({cp1}) * {u1}', str(n1), 'DIV')} AS eq,
                 {cp1} AS cp1
          FROM {x}
        ),
        r2 AS (
          SELECT vec_id, cp1,
                 {_sidiv(f"CAST(SUM(eq * {u2}) {w} AS BIGINT)",
                         str(PI_SCALE), 'DIV')} AS cp2,
                 eq, i
          FROM r1
        ),
        res AS (
          SELECT vec_id, cp1, cp2,
                 eq - {_sidiv(f'cp2 * {u2}', str(n2), 'DIV')} AS r
          FROM r2
        )
        SELECT vec_id, MIN(cp1) AS proj1_q, MIN(cp2) AS proj2_q,
               CAST(SUM(r * r) DIV {PI_SCALE} AS BIGINT) AS resid_ssq_q
        FROM res GROUP BY vec_id
        """
    )


def _abtt_oracle() -> str:
    """Full inlined re-derivation: chain1 -> deflate -> chain2 ->
    second deflate (pfx 'c', over the SAME x2 the pc2 fit used) ->
    per-vector stats.  cf/ccf are exactly the lane's cp1/cp2 (integer
    sums are order-free, so window-vs-join grouping cannot differ)."""
    op = "//"
    return f"""
WITH {_duck_v_cte()},
x AS MATERIALIZED (
  SELECT v.vec_id, u.i - 1 AS i,
         CAST(trunc(v.emb[u.i] * {PI_SCALE}) AS BIGINT) AS eq
  FROM v, (SELECT unnest(generate_series(1, {DIM})) AS i) u
),
{_power_iter_chain(op)},
{_deflate_ctes(op, 'x', f'v{PI_ITERS}')},
x2m AS MATERIALIZED (SELECT * FROM x2),
{_power_iter_chain(op, src='x2m', pfx='b')},
{_deflate_ctes(op, 'x2m', f'bv{PI_ITERS}', pfx='c')}
SELECT r.vec_id, c1.cp AS proj1_q, c2.cp AS proj2_q,
       CAST(SUM(r.eq * r.eq) {op} {PI_SCALE} AS BIGINT) AS resid_ssq_q
FROM cx2 r
JOIN cf c1 ON c1.vec_id = r.vec_id
JOIN ccf c2 ON c2.vec_id = r.vec_id
GROUP BY r.vec_id, c1.cp, c2.cp
"""


N_PC = 4  # depth of the multi-PC whitening family
_pcs_cache: dict = {}


def _fit_top_pcs(
    spark: SparkSession, sf_dir: str, n_pc: int = N_PC
) -> list[list[tuple[int, int]]]:
    """Top-``n_pc`` principal directions by SEQUENTIAL deflation power
    iteration (the r10 pc2 machinery generalized, r10 verdict #5):
    x_{k+1} = deflate(x_k, v_k), v_{k+1} = the same quantized chain
    over the re-checkpointed residual matrix.  PCs 1-2 reuse the cached
    PC1/PC2 fits (their chains are bit-identical to this loop's);
    deeper directions cost one deflate pass + one 3-step chain each —
    at 100 TB that is one extra pass over the stored quantized matrix
    per component, the same cost model the pc2 docstring promises.
    Every intermediate checkpoint is freed as soon as the next matrix
    is pinned; only the 64-int fits stay resident."""
    from dataforge_core_spark.session import free_local_checkpoint

    key = (session_key(spark), sf_dir, n_pc)
    if key not in _pcs_cache:
        fits: list[list[tuple[int, int]]] = [
            _fit_top_pc(spark, sf_dir),
            _fit_top_pc2(spark, sf_dir),
        ][:n_pc]
        # continue from the pc2 fit's deflated matrix (x - PC1), kept
        # checkpointed in _x2_cache — the first deflate pass is paid
        # exactly once across the pc2 and multi-PC fits
        cur, cur_df = _x2_cache[(session_key(spark), sf_dir)]
        owned = False
        for k in range(1, n_pc):
            if k >= len(fits):
                fits.append(_power_iter_fit(spark, cur))
            if k < n_pc - 1:
                nxt = spark.sql(
                    _deflate_projection(fits[k], cur)
                ).localCheckpoint(eager=True)
                name = f"xq{k + 2}_{abs(hash(key)) % 10**8}"
                nxt.createOrReplaceTempView(name)
                if owned:
                    free_local_checkpoint(cur_df)
                cur, cur_df, owned = name, nxt, True
        if owned:
            free_local_checkpoint(cur_df)
        _pcs_cache[key] = fits
    return _pcs_cache[key]


def _pcs_oracle_base(n_pc: int = N_PC) -> tuple[str, list, list, str]:
    """The inlined DuckDB derivation shared by the top-pcs and whiten
    oracles: x -> (chain -> deflate -> materialize)^n_pc.  Returns
    (cte_text, fit CTE names, per-direction cf names, final residual
    matrix name); DuckDB prunes whatever a consumer doesn't reference.
    Every multiply-referenced relation is MATERIALIZED (duck 1.0
    inlines plain CTEs — the ROADMAP oracle rule)."""
    op = "//"
    chain_pfx = ["", "b", "d", "f", "h"]
    parts = [
        _duck_v_cte(),
        f"""x AS MATERIALIZED (
  SELECT v.vec_id, u.i - 1 AS i,
         CAST(trunc(v.emb[u.i] * {PI_SCALE}) AS BIGINT) AS eq
  FROM v, (SELECT unnest(generate_series(1, {DIM})) AS i) u
)""",
    ]
    fit_names, cf_names = [], []
    src = "x"
    for k in range(n_pc):
        parts.append(_power_iter_chain(op, src=src, pfx=chain_pfx[k]))
        fit = f"{chain_pfx[k]}v{PI_ITERS}"
        fit_names.append(fit)
        dp = f"c{k + 1}"
        parts.append(_deflate_ctes(op, src, fit, pfx=dp))
        cf_names.append(f"{dp}cf")
        nxt = f"x{k + 2}m"
        parts.append(f"{nxt} AS MATERIALIZED (SELECT * FROM {dp}x2)")
        src = nxt
    return ",\n".join(parts), fit_names, cf_names, src


def embeddings_top_pcs(
    spark: SparkSession, sf_dir: str, n_pc: int | None = None
) -> DataFrame:
    """The top-N_PC principal directions in one frame — rows
    (pc, dim, pc_q), pc in 1..N_PC.  With embeddings_top_pc/pc2 this
    completes the dim-reduction eval family; pairwise near-
    orthogonality and agreement with the single-PC lanes are pinned in
    tests/test_parameterized.py."""
    fits = _fit_top_pcs(spark, sf_dir, N_PC if n_pc is None else n_pc)
    rows = [
        (k + 1, d, q) for k, f in enumerate(fits) for d, q in f
    ]
    return spark.createDataFrame(rows, "pc int, dim int, pc_q bigint")


def _top_pcs_oracle(n_pc: int = N_PC) -> str:
    ctes, fit_names, _cf, _res = _pcs_oracle_base(n_pc)
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({k + 1} AS INTEGER) AS pc, CAST(i AS INTEGER) AS dim,"
        f" CAST(vq AS BIGINT) AS pc_q FROM {name}"
        for k, name in enumerate(fit_names)
    )
    return f"WITH {ctes}\n{union}"


def embeddings_whiten(
    spark: SparkSession, sf_dir: str, n_pc: int | None = None
) -> DataFrame:
    """All-but-the-top-N_PC whitening: embeddings_abtt generalized from
    2 to N_PC removed directions (Mu & Viswanath's D ~ dim/100 rule at
    a 64-dim corpus).  Emits (vec_id, proj1_q..proj{N_PC}_q,
    resid_ssq_q), all in the shared 1e6 fixed-point ledger.  Plan
    shape: the fitted directions are 64-int LITERAL arrays — N_PC
    chained vec_id-partitioned window sums + one aggregate over the
    checkpointed component relation, one exchange, no joins.  Overflow
    ledger: |eq| <= ~1e6, DIM=64 => |sum(eq*u)| <= 6.4e13,
    |cp| <= ~6.4e7, |cp*vq| <= 6.4e13 — int64-safe at every step."""
    fits = _fit_top_pcs(spark, sf_dir, N_PC if n_pc is None else n_pc)
    x = _xq_view(spark, sf_dir)
    w = "OVER (PARTITION BY vec_id)"
    ctes = []
    src = x
    for k, f in enumerate(fits, 1):
        arr = ", ".join(str(q) for _d, q in f)
        nk = max(sum(q * q for _d, q in f) // PI_SCALE, 1)
        uk = f"element_at(array({arr}), CAST(i AS INT) + 1)"
        cpk = _sidiv(
            f"CAST(SUM(eq * {uk}) {w} AS BIGINT)", str(PI_SCALE), "DIV"
        )
        carry = "".join(f", cp{j}" for j in range(1, k))
        ctes.append(
            f"r{k} AS (SELECT vec_id, i,"
            f" eq - {_sidiv(f'({cpk}) * {uk}', str(nk), 'DIV')} AS eq,"
            f" {cpk} AS cp{k}{carry} FROM {src})"
        )
        src = f"r{k}"
    projs = ", ".join(
        f"MIN(cp{k}) AS proj{k}_q" for k in range(1, len(fits) + 1)
    )
    return spark.sql(
        f"""
        WITH {",".join(ctes)}
        SELECT vec_id, {projs},
               CAST(SUM(eq * eq) DIV {PI_SCALE} AS BIGINT) AS resid_ssq_q
        FROM {src} GROUP BY vec_id
        """
    )


def _whiten_oracle(n_pc: int = N_PC) -> str:
    ctes, _fits, cf_names, res = _pcs_oracle_base(n_pc)
    joins = "\n".join(
        f"JOIN {cf} c{k + 1} ON c{k + 1}.vec_id = r.vec_id"
        for k, cf in enumerate(cf_names)
    )
    projs = ", ".join(
        f"c{k + 1}.cp AS proj{k + 1}_q" for k in range(len(cf_names))
    )
    group = ", ".join(f"c{k + 1}.cp" for k in range(len(cf_names)))
    return f"""
WITH {ctes}
SELECT r.vec_id, {projs},
       CAST(SUM(r.eq * r.eq) // {PI_SCALE} AS BIGINT) AS resid_ssq_q
FROM {res} r
{joins}
GROUP BY r.vec_id, {group}
"""


def embeddings_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction (quantized to ~1e6) via power iteration."""
    fitted = _fit_top_pc(spark, sf_dir)
    return spark.createDataFrame(fitted, "dim int, pc_q bigint")


def _top_pc_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
x AS (
  SELECT v.vec_id, u.i - 1 AS i,
         CAST(trunc(v.emb[u.i] * {PI_SCALE}) AS BIGINT) AS eq
  FROM v, (SELECT unnest(generate_series(1, {DIM})) AS i) u
),
{_power_iter_tail('//')}
"""


# ---------------------------------------------------------------------------
# Dominant-direction projection (the "all-but-the-top" embedding
# post-process): each vector's component along the fitted top PC —
# subtracting it is the standard isotropy fix for text embeddings.
# One extra x-join-v aggregate on top of the power-iteration chain;
# same quantized-exact integer discipline (|proj_q| <= ~6.4e7).
# ---------------------------------------------------------------------------


def _pc_project_select(op: str) -> str:
    return f"""pj AS (
  SELECT x.vec_id, CAST(SUM(x.eq * v.vq) AS BIGINT) AS s
  FROM x JOIN v{PI_ITERS} v ON v.i = x.i GROUP BY x.vec_id
)
SELECT vec_id,
       CAST({_sidiv('s', str(PI_SCALE), op)} AS BIGINT) AS proj_q
FROM pj"""


def embeddings_pc_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector quantized projection onto the power-iterated top PC.

    The fitted direction is a 64-int literal array (the centroid
    pattern), so the projection is ONE map-side-combinable aggregate
    over the checkpointed component relation — no joins at all."""
    fitted = _fit_top_pc(spark, sf_dir)
    arr = ", ".join(str(q) for _d, q in fitted)
    x = _xq_view(spark, sf_dir)
    s = f"SUM(eq * element_at(array({arr}), CAST(i AS INT) + 1))"
    return spark.sql(
        f"""
        SELECT vec_id,
               CAST({_sidiv(f'CAST({s} AS BIGINT)', str(PI_SCALE), 'DIV')}
                 AS BIGINT) AS proj_q
        FROM {x} GROUP BY vec_id
        """
    )


def _pc_project_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
x AS (
  SELECT v.vec_id, u.i - 1 AS i,
         CAST(trunc(v.emb[u.i] * {PI_SCALE}) AS BIGINT) AS eq
  FROM v, (SELECT unnest(generate_series(1, {DIM})) AS i) u
),
{_power_iter_chain('//')},
{_pc_project_select('//')}
"""


def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic duplicate clusters: connected components over the
    embedding near-duplicate pair graph — the same min-label
    propagation the text-side ``dedup_cluster`` uses, applied to the
    LSH+cosine pair list (dedup is modality-agnostic once pairs exist).
    cluster_id = min vec_id of the component; singletons map to
    themselves.  Labels cached per (session, sf) like every other index
    artifact."""
    from pyspark.sql import functions as F

    from dataforge_core_spark.operators.dedup import (
        _cc_min_label,
        _labels_cache,
    )

    key = (session_key(spark), sf_dir, "embedding")
    if key not in _labels_cache:
        pairs = dedup_embedding(spark, sf_dir).selectExpr(
            "vec_a AS doc_a", "vec_b AS doc_b"
        )
        _labels_cache[key] = _cc_min_label(pairs)[0]
    labels = _labels_cache[key]
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id")
    return vecs.join(
        labels, vecs.vec_id == labels.doc_id, "left"
    ).select(
        "vec_id",
        F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
    )


def _semantic_cluster_oracle() -> str:
    return f"""
WITH RECURSIVE {_duck_v_cte()},
pairs AS ({_emb_pairs_sql("duck", "v", EMB_BUCKET_CAP)}),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL
  SELECT vec_b AS a, vec_a AS b FROM pairs
),
reach AS (
  SELECT vec_id AS node, vec_id AS lab FROM embeddings
  UNION
  SELECT e.b AS node, r.lab FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS vec_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# Embedding outlier detection: distance to the own-class centroid.
# A training-data curation primitive — mislabeled / corrupted vectors sit
# far from their class mean.  Centroids use the same order-free
# fixed-point integer sums as the k-means quantizer (bit-deterministic
# regardless of partitioning); the per-vector distance is then
# ||a||^2 - 2 a.c + ||c||^2 with every dot product on the shared unrolled
# balanced tree, so ranking is reproducible across engines.  At scale:
# the centroid relation is |labels| rows (broadcast), the corpus side
# never shuffles for the join; the only shuffles are the map-side
# combinable centroid aggregate and the per-label top-k window, which
# Spark executes as WindowGroupLimit (per-partition pre-limit to K before
# the label shuffle).
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Recall evaluation: how much of the EXACT top-K does the IVF index
# recover per query?  The metric every ANN deployment tunes nprobe
# against; here computed engine-side so the recall/latency trade-off is
# measurable inside the same pipeline that serves the search.
#
# Determinism: both rankings are already engine-identical (shared
# unrolled dot trees); hits and totals are exact integer counts, recall
# one division.  Scale shape: the exact side is the (small) query set
# vs corpus scan the bruteforce row already plans; the overlap join is
# keyed (query_id, neighbor_id) — K rows per query on each side.
# ---------------------------------------------------------------------------


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@K of the IVF (k-means, nprobe=1) search vs the
    exact brute-force top-K."""
    from pyspark.sql import functions as F

    brute = ann_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = (
        ann_ivf_search(spark, sf_dir, nprobe=1)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        brute.join(F.broadcast(ivf), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("n_hits"),
            (
                F.count("hit").cast("double") / F.count(F.lit(1))
            ).alias("recall"),
        )
    )


def _recall_eval_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
bscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c ON q.vec_id <> c.vec_id
),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
    FROM bscored
  ) t WHERE rank <= {TOP_K}
),
iscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS score
  FROM (SELECT * FROM af WHERE vec_id < {N_QUERIES}) q
  JOIN af c ON q.cid = c.cid AND c.cellrn <= {IVF_CELL_CAP} AND q.vec_id <> c.vec_id
),
ivf AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
    FROM iscored
  ) t WHERE rank <= {TOP_K}
)
SELECT b.query_id,
       COUNT(*) AS n_exact,
       COUNT(i.hit) AS n_hits,
       CAST(COUNT(i.hit) AS DOUBLE) / COUNT(*) AS recall
FROM brute b
LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
GROUP BY b.query_id
"""


# nprobe settings the recall-curve eval sweeps — the IVF tuning grid
PROBE_GRID = (1, 2, 4, 8)


def _nprobe_qp_sql(dialect: str, af: str, cv: str) -> str:
    """qp body: the K centroid cells ranked by distance per query."""
    dot = _unrolled_dot("a.emb", "c.emb", dialect)
    hint = "/*+ BROADCAST(c) */ " if dialect == "spark" else ""
    return f"""
  SELECT vec_id, emb, nrm, cid, rn AS cellrank FROM (
    SELECT {hint}a.vec_id, a.emb, a.nrm, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY (c.cc - (2 * ({dot}))) ASC, c.cid) AS rn
    FROM (SELECT * FROM {af} WHERE vec_id < {N_QUERIES}) a
    CROSS JOIN {cv} c
  ) t"""


def _nprobe_scored_body(dialect: str, af: str) -> str:
    """scored body: every (query, corpus vector) pair with the rank of
    the vector's cell among the query's centroid distances.  One
    probe-assignment pass + one cid equi-join serve the exact baseline
    AND every probe depth."""
    cosf = _spark_cosine if dialect == "spark" else _duck_cosine
    cos = cosf("q.emb", "c.emb", "q.nrm", "c.nrm")
    return f"""
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.cellrank, c.cellrn <= {IVF_CELL_CAP} AS capped, {cos} AS score
  FROM qp q JOIN {af} c
    ON q.cid = c.cid AND q.vec_id <> c.vec_id"""


def _nprobe_curve_blocks(dialect: str, scored: str) -> str:
    """Brute baseline + per-nprobe recall blocks over a shared
    ``scored`` relation: brute = rank over ALL rows (every corpus
    vector's cell has exactly one rank per query, so the unfiltered
    relation IS the all-pairs set); found at nprobe=np = rank over
    cellrank <= np (cell-cap conjunct as in the probed searches)."""
    np_cast = "INT" if dialect == "spark" else "INTEGER"
    blocks = []
    for np in PROBE_GRID:
        blocks.append(f"""
  SELECT CAST({np} AS {np_cast}) AS nprobe, b.query_id,
         COUNT(*) AS n_exact, COUNT(h.hit) AS n_hits,
         CAST(COUNT(h.hit) AS DOUBLE) / COUNT(*) AS recall
  FROM brute b LEFT JOIN (
    SELECT query_id, neighbor_id, 1 AS hit FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS rank
      FROM {scored} WHERE cellrank <= {np} AND capped
    ) t WHERE rank <= {TOP_K}
  ) h ON b.query_id = h.query_id AND b.neighbor_id = h.neighbor_id
  GROUP BY b.query_id""")
    union = "\n  UNION ALL\n".join(blocks)
    return f"""brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
    FROM {scored}
  ) t WHERE rank <= {TOP_K}
)
{union}"""


_nprobe_scored_cache: dict = {}


def ann_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tuning curve: per-query recall@K at nprobe in
    PROBE_GRID, in one frame — the acceptance artifact for the
    parameterized nprobe dial (queries_parameterized): a deployment
    reads this to pick the cheapest nprobe meeting its recall floor.
    nprobe=K scans every cell, so its rows are recall=1.0 exactly
    WHILE every cell fits under IVF_CELL_CAP (pinned for that regime in
    tests/test_parameterized.py's monotonicity check and by the oracle);
    the per-nprobe 'found' blocks rank only capped candidates
    (cellrn <= IVF_CELL_CAP) while the brute baseline ranks uncapped
    rows, so above the cap the curve measures nprobe loss PLUS cap loss
    — the oracle mirrors the cap, so correctness holds at any scale,
    but the =1.0 endpoint claim is cap-regime-only by design (the cap
    is the scale guard; an uncapped curve would be the quadratic scan
    the guard exists to prevent).

    Plan shape: the scored (query x corpus, cellrank) relation is
    computed ONCE and localCheckpoint-ed per (session, sf), then the brute
    baseline and all four probe depths are rankings over the
    materialized rows — without the pin, Spark re-evaluates the shared
    CTE per reference (five corpus-shaped joins; measured 2.2 -> 0.6s
    at sf0.1).  Query-set-bounded x corpus rows: the same eval-lane
    cost model as ann_pq_recall, paid once instead of five times."""
    return spark.sql(
        f"WITH {_nprobe_curve_blocks('spark', _nprobe_scored_view(spark, sf_dir))}"
    )


def _nprobe_scored_view(spark: SparkSession, sf_dir: str) -> str:
    """The checkpointed scored (query x corpus, cellrank) relation —
    the shared base of ann_nprobe_recall_curve and ann_k_recall_curve
    (one probe-assignment pass + one cid equi-join serve the exact
    baseline and every probe depth / K)."""
    key = (session_key(spark), sf_dir)
    if key not in _nprobe_scored_cache:
        af, _cv = _kmeans_index(spark, sf_dir)
        # literal-projection probe (no cross join, like ann_ivf_search):
        # cellrank = 1 + position in the sorted (dist, cid) struct array
        sa = _probe_sorted_expr(_kmeans_centroids(spark, sf_dir), "emb")
        qp = f"""
          SELECT vec_id, emb, nrm, pcid AS cid, idx + 1 AS cellrank
          FROM (
            SELECT vec_id, emb, nrm, {sa} AS __sa
            FROM {af} WHERE vec_id < {N_QUERIES}
          ) t LATERAL VIEW posexplode(transform(__sa, s -> s.c))
            p AS idx, pcid
        """
        sc = spark.sql(
            f"WITH qp AS ({qp})"
            f"{_nprobe_scored_body('spark', af)}"
        ).localCheckpoint(eager=True)
        name = f"nprobe_scored_{abs(hash(key)) % 10**8}"
        sc.createOrReplaceTempView(name)
        _nprobe_scored_cache[key] = (name, sc)
    return _nprobe_scored_cache[key][0]


def _nprobe_curve_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
afm AS MATERIALIZED (SELECT * FROM af),
qp AS ({_nprobe_qp_sql('duck', 'afm', f'c{KMEANS_ITERS}')}),
scored AS MATERIALIZED ({_nprobe_scored_body('duck', 'afm')}),
{_nprobe_curve_blocks('duck', 'scored')}
"""


ANN_K_GRID = (1, 5, 10)  # TOP_K must be a grid point (cross-lane referee)
K_CURVE_NPROBE = 1


def _k_recall_sql(dialect: str, scored: str, nprobe: int) -> str:
    """Recall@K across ANN_K_GRID at fixed nprobe from the shared
    scored relation: ONE brute ranking + ONE found ranking (windows
    over the materialized rows), then every K is a rank filter inside
    a conditional sum — no per-K re-rank, the same one-pass grid
    pattern as the nprobe/band/threshold/sketch-size curves."""
    kmax = max(ANN_K_GRID)
    grid = ", ".join(str(k) for k in ANN_K_GRID)
    if dialect == "spark":
        fan = f"LATERAL VIEW explode(array({grid})) g AS k"
        idiv = "DIV"
        kcast = "INT"
    else:
        fan = f", unnest([{grid}]) AS g(k)"
        idiv = "//"
        kcast = "INTEGER"
    return f"""
brute AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS brank
  FROM {scored}
),
found AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS frank
  FROM {scored} WHERE cellrank <= {nprobe} AND capped
),
j AS (
  SELECT b.query_id, b.brank, f.frank
  FROM brute b LEFT JOIN found f
    ON f.query_id = b.query_id AND f.neighbor_id = b.neighbor_id
  WHERE b.brank <= {kmax}
),
fan AS (
  SELECT query_id, g.k,
         CASE WHEN brank <= g.k THEN 1 ELSE 0 END AS ex,
         CASE WHEN brank <= g.k AND frank IS NOT NULL
                   AND frank <= g.k THEN 1 ELSE 0 END AS hit
  FROM j
  {fan}
)
SELECT CAST(k AS {kcast}) AS k, query_id,
       CAST(SUM(ex) AS BIGINT) AS n_exact,
       CAST(SUM(hit) AS BIGINT) AS n_hits,
       CAST((1000000 * SUM(hit)) {idiv} GREATEST(SUM(ex), 1) AS BIGINT)
         AS recall_ppm
FROM fan GROUP BY k, query_id
"""


def ann_k_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K for K in ANN_K_GRID (the recall@1/@5/@10 table every
    ANN eval reports) at nprobe=K_CURVE_NPROBE, per query, from the
    SAME checkpointed scored relation as the nprobe curve — together
    the two curves span the (nprobe, K) tuning plane from one index
    pass each way.  The K=TOP_K rows equal the nprobe curve's
    nprobe=1 rows (cross-lane referee in tests/test_parameterized.py)."""
    return spark.sql(
        "WITH "
        + _k_recall_sql(
            "spark", _nprobe_scored_view(spark, sf_dir), K_CURVE_NPROBE
        )
    )


def _k_recall_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
afm AS MATERIALIZED (SELECT * FROM af),
qp AS ({_nprobe_qp_sql('duck', 'afm', f'c{KMEANS_ITERS}')}),
scored AS MATERIALIZED ({_nprobe_scored_body('duck', 'afm')}),
{_k_recall_sql('duck', 'scored', K_CURVE_NPROBE)}
"""


OUTLIER_TOP_K = 5


def _centroid_by_label(src: str, dialect: str) -> str:
    """Per-label fixed-point centroid: exact integer sums per dimension
    (same construction as :func:`_kmeans_update`, keyed by label)."""
    off = 0 if dialect == "spark" else 1
    arr_open, arr_close = ("array(", ")") if dialect == "spark" else ("[", "]")
    elems = ",\n       ".join(
        f"CAST(SUM(CAST(FLOOR(emb[{d + off}] * {_FP_SCALE}) AS BIGINT))"
        f" AS DOUBLE) / (COUNT(*) * {_FP_SCALE})"
        for d in range(DIM)
    )
    return (
        f"SELECT label, {arr_open}{elems}{arr_close} AS emb"
        f" FROM {src} GROUP BY label"
    )


_centroid_cache: dict = {}


def _label_centroids(spark: SparkSession, sf_dir: str) -> str:
    """Cached |labels|-row centroid view (label, emb, cc) — the outlier
    detector's 'index build'.  Like the k-means quantizer, the collected
    rows round-trip the driver as ``repr`` literals (exactly — see
    _centroid_literal_sql), so re-running the query costs one broadcast
    of constants, not a re-aggregation plus a fresh 64-wide codegen."""
    key = (session_key(spark), sf_dir)
    if key not in _centroid_cache:
        v = _normed(spark, sf_dir)
        rows = spark.sql(
            f"SELECT label AS cid, emb FROM ({_centroid_by_label(v, 'spark')})"
        ).collect()
        name = f"outlier_cent_{abs(hash(key)) % 10**8}"
        spark.sql(
            f"SELECT cid AS label, emb, cc FROM ({_centroid_literal_sql(rows)})"
        ).createOrReplaceTempView(name)
        _centroid_cache[key] = name
    return _centroid_cache[key]


def ann_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K farthest vectors from their own label's centroid.

    The rank key is nrm^2 - 2 a.c + ||c||^2: ``nrm * nrm`` is not
    bit-equal to the unrolled self-dot (nrm went through sqrt), but BOTH
    engines compute it the same way, so the ordering stays
    engine-identical — and it saves a second 64-term tree per row."""
    v = _normed(spark, sf_dir)
    cent = _label_centroids(spark, sf_dir)
    ac = _unrolled_dot("a.emb", "c.emb", "spark")
    return spark.sql(
        f"""
        SELECT label, CAST(rank AS INTEGER) AS rank, vec_id FROM (
          SELECT /*+ BROADCAST(c) */ a.label, a.vec_id,
                 ROW_NUMBER() OVER (PARTITION BY a.label
                      ORDER BY ((a.nrm * a.nrm) - (2 * ({ac})) + c.cc) DESC,
                               a.vec_id) AS rank
          FROM {v} a JOIN {cent} c ON a.label = c.label
        ) t WHERE rank <= {OUTLIER_TOP_K}
        """
    )


def _outliers_oracle() -> str:
    ac = _unrolled_dot("a.emb", "c.emb", "duck")
    cc = _unrolled_dot("emb", "emb", "duck")
    return f"""
WITH {_duck_v_cte()},
cent AS (
  SELECT label, emb, {cc} AS cc
  FROM ({_centroid_by_label('v', 'duck')})
)
SELECT label, rank, vec_id FROM (
  SELECT a.label, a.vec_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY a.label
              ORDER BY (((a.nrm * a.nrm)) - (2 * ({ac})) + c.cc) DESC,
                       a.vec_id) AS INTEGER) AS rank
  FROM v a JOIN cent c ON a.label = c.label
) t WHERE rank <= {OUTLIER_TOP_K}
"""


# ---------------------------------------------------------------------------
# Product-quantization encode: split each vector into PQ_M subvectors
# and assign every subvector to its nearest codeword — the encode stage
# of IVF-PQ, the index family behind billion-scale ANN (the int8 row
# ``embeddings_quantize`` is the scalar sibling).  The codebook here is
# externally supplied (the first PQ_K vectors' subvectors — in
# production the codebook is trained offline and loaded, exactly like
# this); the encode itself is the full PQ machinery: per-subspace
# squared-L2 argmin over the codebook, deterministic code tie-break.
#
# Scale shape: the codebook is PQ_K whole vectors (a broadcast literal
# relation in any deployment); the corpus side explodes x PQ_M and
# scans — no shuffle except the argmin window, which lowers to
# WindowGroupLimit on the (vec_id, subspace) key.  The squared-distance
# expression is the same balanced unrolled tree both engines emit, so
# the argmin is bit-deterministic; only integer codes are emitted.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_K = 16  # codewords per subspace
_PQ_SUBDIM = DIM // PQ_M


def _pq_subdim(pq_m: int) -> int:
    """Subvector width for a pq_m-subspace layout; validates the dial
    (pq_m must divide DIM so subspaces tile the vector exactly)."""
    if pq_m < 1 or DIM % pq_m != 0:
        raise ValueError(f"pq_m must divide DIM={DIM}, got {pq_m}")
    return DIM // pq_m


def _pq_dist(dialect: str, a: str, c: str, m: str, pq_m: int = PQ_M) -> str:
    """Unrolled squared L2 between subvectors m of ``a`` and ``c``."""
    off = 0 if dialect == "spark" else 1
    subdim = _pq_subdim(pq_m)
    terms = [
        f"(({a}[{m} * {subdim} + {i + off}]"
        f" - {c}[{m} * {subdim} + {i + off}])"
        f" * ({a}[{m} * {subdim} + {i + off}]"
        f" - {c}[{m} * {subdim} + {i + off}]))"
        for i in range(subdim)
    ]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})"
            if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _pq_codes_ctes(dialect: str, v: str, pq_m: int = PQ_M) -> str:
    """The shared ``cb`` / ``sub`` / ``codes`` CTE chain: per-subspace
    squared-L2 argmin of every vector's subvectors over the codebook.
    ``codes`` has raw (vec_id, m, code) — callers cast for output."""
    dist = _pq_dist(dialect, "s.emb", "cb.cemb", "s.m", pq_m)
    enum = (
        f"explode(sequence(0, {pq_m - 1}))"
        if dialect == "spark"
        else f"unnest(generate_series(0, {pq_m - 1}))"
    )
    return f"""cb AS (
  SELECT vec_id AS code, emb AS cemb FROM {v} WHERE vec_id < {PQ_K}
),
sub AS (
  SELECT vec_id, emb, {enum} AS m FROM {v}
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, cb.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                ORDER BY ({dist}) ASC, cb.code) AS rn
    FROM sub s CROSS JOIN cb
  ) t WHERE rn = 1
)"""


_pq_codes_cache: dict = {}


def _pq_codes_view(spark: SparkSession, sf_dir: str) -> str:
    """Checkpointed raw-PQ code table (vec_id, m, code) — the STORED
    index.  Encode runs once per (session, sf); every ADC consumer
    reads codes instead of re-running the corpus x codebook argmin
    (the same stored-index treatment the SQ8 codes, kNN edges and HLL
    registers already get — a production PQ index never re-encodes at
    query time)."""
    key = (session_key(spark), sf_dir)
    if key not in _pq_codes_cache:
        v = _normed(spark, sf_dir)
        name = f"pq_codes_{abs(hash(key)) % 10**8}"
        df = spark.sql(
            f"WITH {_pq_codes_ctes('spark', v)}"
            " SELECT vec_id, m, code FROM codes"
        ).localCheckpoint(eager=True)
        df.createOrReplaceTempView(name)
        _pq_codes_cache[key] = (name, df)
    return _pq_codes_cache[key][0]


_rpq_codes_cache: dict = {}


def _rpq_codes_view(spark: SparkSession, sf_dir: str) -> str:
    """Checkpointed untrained-residual code table — see
    ``_pq_codes_view``."""
    key = (session_key(spark), sf_dir)
    if key not in _rpq_codes_cache:
        af, cv = _kmeans_index(spark, sf_dir)
        name = f"rpq_codes_{abs(hash(key)) % 10**8}"
        df = spark.sql(
            f"WITH {_res_codes_ctes('spark', af, cv)}"
            " SELECT vec_id, m, code FROM rcodes"
        ).localCheckpoint(eager=True)
        df.createOrReplaceTempView(name)
        _rpq_codes_cache[key] = (name, df)
    return _rpq_codes_cache[key][0]


def _pq_stored_prelude(src: str, view: str) -> str:
    """Spark-side cb + codes CTE pair serving the stored code table
    (drop-in for ``_pq_codes_ctes`` in any ADC body)."""
    return f"""cb AS (
  SELECT vec_id AS code, emb AS cemb FROM {src} WHERE vec_id < {PQ_K}
),
codes AS (SELECT vec_id, m, code FROM {view})"""


def ann_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codes: nearest codeword per (vector, subspace) — served from
    the stored code table."""
    view = _pq_codes_view(spark, sf_dir)
    return spark.sql(
        f"SELECT vec_id, CAST(m AS INT) AS subspace,"
        f" CAST(code AS INT) AS code FROM {view}"
    )


def _pq_encode_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
{_pq_codes_ctes('duck', 'v')}
SELECT vec_id, CAST(m AS INTEGER) AS subspace, CAST(code AS INTEGER) AS code
FROM codes
"""


# ---------------------------------------------------------------------------
# PQ asymmetric-distance search (ADC) — the query stage of IVF-PQ: the
# query vector stays full-precision, every corpus vector is its PQ_M
# one-byte codes, and the approximate distance is a sum of PQ_M lookups
# into a per-query table of query-subvector -> codeword distances.  This
# is how billion-scale indexes answer queries without touching raw
# vectors (Jégou et al., "Product Quantization for Nearest Neighbor
# Search").
#
# Scale shape: the LUT is N_QUERIES x PQ_M x PQ_K rows — a broadcast
# literal in any deployment; the codes relation (the stored index,
# PQ_M rows/vector) joins it broadcast-side, and the per-(query, vector)
# ADC reduce is a map-side-combinable aggregate on the key the index is
# already laid out on.  No raw-vector scan in the query path at all.
#
# Determinism: the PQ_M partial distances are pivoted into fixed columns
# (conditional MAX over the m key) and summed in the same balanced tree
# on both engines, so the ADC double is bit-identical and only integer
# ranks are emitted.
# ---------------------------------------------------------------------------


def _pq_adc_tree(pq_m: int = PQ_M) -> str:
    """Fixed balanced-tree sum of the pq_m pivoted partials."""
    terms = [f"s{i}" for i in range(pq_m)]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})"
            if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _pq_search_body(dialect: str) -> str:
    """Shared post-``codes`` SQL: LUT, pivot, ADC rank, top-K."""
    qdist = _pq_dist(dialect, "q.qemb", "cb.cemb", "mm.m")
    enum = (
        f"explode(sequence(0, {PQ_M - 1}))"
        if dialect == "spark"
        else f"unnest(generate_series(0, {PQ_M - 1}))"
    )
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN c.m = {i} THEN l.d END) AS s{i}"
        for i in range(PQ_M)
    )
    int_t = "INT" if dialect == "spark" else "INTEGER"
    return f"""qs AS (
  SELECT vec_id AS query_id, emb AS qemb FROM {{v}}
  WHERE vec_id < {N_QUERIES}
),
mm AS (SELECT {enum} AS m),
lut AS (
  SELECT q.query_id, mm.m, cb.code, ({qdist}) AS d
  FROM qs q CROSS JOIN mm CROSS JOIN cb
),
adc AS (
  SELECT {"/*+ BROADCAST(l) */" if dialect == "spark" else ""} l.query_id, c.vec_id,
         {pivots}
  FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.code
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
)
SELECT query_id, CAST(rank AS {int_t}) AS rank, vec_id AS neighbor_id
FROM (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ({_pq_adc_tree()}) ASC, vec_id) AS rank
  FROM adc
) t WHERE rank <= {TOP_K}"""


def _probe_cte(
    dialect: str,
    af: str,
    cv: str | None,
    nprobe: int,
    probe_sql: str | None,
    name: str = "qp",
) -> str:
    """``<name>(query_id, cid)`` — the probed (query, cell) pairs
    shared by every IVF-PQ flavor.  nprobe=1 reads the assignment
    column (a vector's nearest centroid IS its cell, the same
    short-circuit ann_ivf_search uses); nprobe>1 takes the
    caller-supplied literal probe projection on Spark (``probe_sql``,
    built from the driver-side centroids — no join) and the
    rn<=nprobe cross-join form on DuckDB (mirroring
    _ivf_search_oracle's qp).  ``name`` lets the trained body emit a
    collision-free CTE in the combined recall eval (parameter, not
    string surgery — a r12 review fix)."""
    if nprobe == 1:
        return f"""{name} AS (
  SELECT vec_id AS query_id, cid FROM {af} WHERE vec_id < {N_QUERIES}
)"""
    if dialect == "spark":
        if probe_sql is None:
            raise ValueError("spark nprobe>1 needs probe_sql")
        return f"{name} AS ({probe_sql})"
    if cv is None:
        raise ValueError("duck nprobe>1 needs the centroid relation")
    qdot = _unrolled_dot("a.emb", "c.emb", "duck")
    return f"""{name} AS (
  SELECT query_id, cid FROM (
    SELECT a.vec_id AS query_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY (c.cc - (2 * ({qdot}))) ASC, c.cid) AS rn
    FROM (SELECT * FROM {af} WHERE vec_id < {N_QUERIES}) a
    CROSS JOIN {cv} c
  ) t WHERE rn <= {nprobe}
)"""


def _spark_probe_sql(
    spark: SparkSession, sf_dir: str, af: str, nprobe: int
) -> str:
    """Spark-side qp(query_id, cid) at nprobe>1: the sorted-centroid
    literal projection (_probe_sorted_expr) + explode of the first
    nprobe cells — no join, no BroadcastNestedLoopJoin."""
    sa = _probe_sorted_expr(_kmeans_centroids(spark, sf_dir), "emb")
    picks = ", ".join(f"__sa[{j}].c" for j in range(nprobe))
    return f"""
  SELECT vec_id AS query_id, pcid AS cid FROM (
    SELECT vec_id, {sa} AS __sa FROM {af} WHERE vec_id < {N_QUERIES}
  ) t LATERAL VIEW explode(array({picks})) p AS pcid"""


def _ivf_pq_body(
    dialect: str,
    af: str,
    cv: str | None = None,
    nprobe: int = 1,
    pq_m: int = PQ_M,
    probe_sql: str | None = None,
) -> str:
    """Shared post-``codes`` SQL for IVF+ADC: probe the query's
    ``nprobe`` nearest cells, then score ONLY those cells' candidates
    by ADC lookups.  The LUT is probe-independent (raw-PQ codewords
    are global, not cell-relative), so nprobe only widens ``cand``; a
    corpus vector lives in exactly one cell, so probing distinct cells
    cannot duplicate candidates.  ``nprobe``/``pq_m`` are the
    driver-visible dials (queries_parameterized)."""
    qdist = _pq_dist(dialect, "q.qemb", "cb.cemb", "mm.m", pq_m)
    enum = (
        f"explode(sequence(0, {pq_m - 1}))"
        if dialect == "spark"
        else f"unnest(generate_series(0, {pq_m - 1}))"
    )
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN co.m = {i} THEN l.d END) AS s{i}"
        for i in range(pq_m)
    )
    hint_q = "/*+ BROADCAST(q) */ " if dialect == "spark" else ""
    hint_l = "/*+ BROADCAST(ca, l) */ " if dialect == "spark" else ""
    int_t = "INT" if dialect == "spark" else "INTEGER"
    return f"""qs AS (
  SELECT vec_id AS query_id, emb AS qemb FROM {af}
  WHERE vec_id < {N_QUERIES}
),
{_probe_cte(dialect, af, cv, nprobe, probe_sql)},
mm AS (SELECT {enum} AS m),
lut AS (
  SELECT q.query_id, mm.m, cb.code, ({qdist}) AS d
  FROM qs q CROSS JOIN mm CROSS JOIN cb
),
cand AS (
  SELECT {hint_q}q.query_id, c.vec_id
  FROM qp q JOIN {af} c
    ON q.cid = c.cid AND c.cellrn <= {IVF_CELL_CAP}
   AND c.vec_id <> q.query_id
),
adc AS (
  SELECT {hint_l}ca.query_id, ca.vec_id,
         {pivots}
  FROM cand ca
  JOIN codes co ON co.vec_id = ca.vec_id
  JOIN lut l ON l.query_id = ca.query_id
            AND l.m = co.m AND l.code = co.code
  GROUP BY ca.query_id, ca.vec_id
)
SELECT query_id, CAST(rank AS {int_t}) AS rank, vec_id AS neighbor_id
FROM (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ({_pq_adc_tree(pq_m)}) ASC, vec_id) AS rank
  FROM adc
) t WHERE rank <= {TOP_K}"""


def ann_ivf_pq(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int = 1,
    pq_m: int = PQ_M,
) -> DataFrame:
    """Full IVF-PQ query path: coarse-probe the query's ``nprobe``
    nearest k-means cells, then rank those cells' candidates by PQ
    asymmetric distance — neither a raw vector scan nor an all-cells
    ADC.  This is the billion-scale ANN architecture end to end: the
    coarse quantizer bounds the candidate set (cellrn cap guards
    skewed cells), the PQ codes bound the bytes read per candidate,
    and the only per-query work is a broadcast-LUT hash join over the
    probed cells' codes.

    ``nprobe`` (recall dial) and ``pq_m`` (subspace count —
    compression-vs-accuracy dial) are driver-visible through
    queries_parameterized.  At the default ``pq_m`` the codes come
    from the STORED code table (a production index never re-encodes
    at query time); an off-default ``pq_m`` re-encodes inline, which
    is the value-check path for the dial, not a deployment shape — a
    deployment re-builds the stored index at the new m."""
    if nprobe < 1 or nprobe > KMEANS_K:
        raise ValueError(f"nprobe must be in [1, {KMEANS_K}]")
    _pq_subdim(pq_m)
    v = _normed(spark, sf_dir)
    af = _kmeans_assignments(spark, sf_dir)
    probe_sql = (
        _spark_probe_sql(spark, sf_dir, af, nprobe) if nprobe > 1 else None
    )
    if pq_m == PQ_M:
        prelude = _pq_stored_prelude(v, _pq_codes_view(spark, sf_dir))
    else:
        prelude = _pq_codes_ctes("spark", v, pq_m)
    return spark.sql(
        f"""
        WITH {prelude},
        {_ivf_pq_body('spark', af, nprobe=nprobe, pq_m=pq_m,
                      probe_sql=probe_sql)}
        """
    )


def _ivf_pq_oracle(nprobe: int = 1, pq_m: int = PQ_M) -> str:
    """DuckDB oracle builder mirroring :func:`ann_ivf_pq` for ANY
    (nprobe, pq_m) — the oracle side of the parameterized contract.
    cvm pinned MATERIALIZED like the sibling oracles: duckdb 1.0
    inlines plain CTEs, so an unpinned centroid reference in the
    nprobe>1 probe re-runs the whole Lloyd chain (measured 2.9s vs
    1.4s at nprobe=2, and the repeat evaluation is the r7-documented
    allocator-flake trigger)."""
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
afm AS MATERIALIZED (SELECT * FROM af),
cvm AS MATERIALIZED (SELECT * FROM c{KMEANS_ITERS}),
{_pq_codes_ctes('duck', 'v', pq_m)},
{_ivf_pq_body('duck', 'afm', cv='cvm', nprobe=nprobe, pq_m=pq_m)}
"""


# ---------------------------------------------------------------------------
# Residual IVF-PQ — IVFADC proper (Jégou et al., "Product Quantization
# for Nearest Neighbor Search", §IV-A): PQ-encode the RESIDUAL
# x - centroid(cell(x)) instead of the raw vector.  Residuals
# concentrate around zero with far less spread than raw vectors, so the
# same PQ_K codewords quantize them with lower error — this is the
# variant every production IVFADC index (FAISS IVFxx,PQyy) actually
# ships.  The codebook follows the same external-supply convention as
# ann_pq_encode: the first PQ_K vectors' RESIDUALS.
#
# Query path (nprobe=1, the ann_ivf_pq shape): the query's OWN residual
# q - centroid(cell(q)) builds the LUT against the residual codebook,
# and candidates come from the query's cell — asymmetric distance in
# residual space, exactly ADC.  Scale shape identical to ann_ivf_pq:
# encode is corpus x PQ_K-codebook (broadcast literal at deployment),
# query work is a broadcast-LUT hash join over one cell's codes; the
# centroid join adds only an 8-row broadcast.
#
# Determinism: residual arithmetic is two chained binary64 subtractions
# inside the same balanced unrolled tree both engines emit, so argmin
# codes and ADC ranks stay bit-identical; only integer ranks are output.
# ---------------------------------------------------------------------------


def _pq_rdist(
    dialect: str, a: str, ctr: str, c: str, m: str, pq_m: int = PQ_M
) -> str:
    """Unrolled squared L2 between subvector m of the residual
    (``a`` - ``ctr``) and codeword subvector m of ``c``."""
    off = 0 if dialect == "spark" else 1
    subdim = _pq_subdim(pq_m)
    idx = [f"{m} * {subdim} + {i + off}" for i in range(subdim)]
    terms = [
        f"((({a}[{ix}] - {ctr}[{ix}]) - {c}[{ix}])"
        f" * (({a}[{ix}] - {ctr}[{ix}]) - {c}[{ix}]))"
        for ix in idx
    ]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})"
            if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _res_codes_ctes(
    dialect: str, af: str, cv: str, pq_m: int = PQ_M
) -> str:
    """rcb + rsub + rcodes — the untrained-residual encode chain."""
    enum = (
        f"explode(sequence(0, {pq_m - 1}))"
        if dialect == "spark"
        else f"unnest(generate_series(0, {pq_m - 1}))"
    )
    rdist = _pq_rdist(dialect, "s.emb", "s.ctr", "rcb.cemb", "s.m", pq_m)
    return f"""{_res_cb_cte(dialect, af, cv)},
rsub AS (
  SELECT a.vec_id, a.emb, c.emb AS ctr, {enum} AS m
  FROM {af} a JOIN {cv} c ON a.cid = c.cid
),
rcodes AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, rcb.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                ORDER BY ({rdist}) ASC, rcb.code) AS rn
    FROM rsub s CROSS JOIN rcb
  ) t WHERE rn = 1
)"""


def _res_cb_cte(dialect: str, af: str, cv: str) -> str:
    """Just the residual codebook CTE (the LUT build needs it even
    when codes come from the stored index)."""
    off = 0 if dialect == "spark" else 1
    res_elems = ", ".join(
        f"(a.emb[{i + off}] - c.emb[{i + off}])" for i in range(DIM)
    )
    res_arr = (
        f"array({res_elems})" if dialect == "spark" else f"[{res_elems}]"
    )
    return f"""rcb AS (
  SELECT a.vec_id AS code, {res_arr} AS cemb
  FROM {af} a JOIN {cv} c ON a.cid = c.cid
  WHERE a.vec_id < {PQ_K}
)"""


def _ivf_pq_residual_body(
    dialect: str,
    af: str,
    cv: str,
    codes_src: str | None = None,
    nprobe: int = 1,
    pq_m: int = PQ_M,
    probe_sql: str | None = None,
) -> str:
    """Residual codebook + residual encode + residual-ADC search, shared
    between the Spark lane (checkpointed ``af``/literal ``cv`` views,
    codes served from the STORED code table via ``codes_src``) and the
    DuckDB oracle (fully inlined chain, ``codes_src=None``).

    Unlike raw PQ, the residual LUT is CELL-RELATIVE (the query's
    residual is taken against each probed centroid — IVFADC proper),
    so at nprobe>1 the LUT carries a cid key and the ADC join matches
    the candidate's cell; at nprobe=1 the cid join is degenerate and
    the plan is unchanged from the single-probe form."""
    enum = (
        f"explode(sequence(0, {pq_m - 1}))"
        if dialect == "spark"
        else f"unnest(generate_series(0, {pq_m - 1}))"
    )
    qrdist = _pq_rdist(dialect, "q.qemb", "c.emb", "rcb.cemb", "mm.m", pq_m)
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN co.m = {i} THEN l.d END) AS s{i}"
        for i in range(pq_m)
    )
    hint_q = "/*+ BROADCAST(q) */ " if dialect == "spark" else ""
    hint_l = "/*+ BROADCAST(ca, l) */ " if dialect == "spark" else ""
    int_t = "INT" if dialect == "spark" else "INTEGER"
    codes_part = (
        _res_codes_ctes(dialect, af, cv, pq_m)
        if codes_src is None
        else f"{_res_cb_cte(dialect, af, cv)},\n"
        f"rcodes AS (SELECT vec_id, m, code FROM {codes_src})"
    )
    return f"""{codes_part},
qs AS (
  SELECT vec_id AS query_id, emb AS qemb FROM {af}
  WHERE vec_id < {N_QUERIES}
),
{_probe_cte(dialect, af, cv if dialect == 'duck' else None,
            nprobe, probe_sql)},
mm AS (SELECT {enum} AS m),
lut AS (
  SELECT q.query_id, p.cid, mm.m, rcb.code, ({qrdist}) AS d
  FROM qs q JOIN qp p ON q.query_id = p.query_id
  JOIN {cv} c ON p.cid = c.cid
  CROSS JOIN mm CROSS JOIN rcb
),
cand AS (
  SELECT {hint_q}q.query_id, q.cid, c.vec_id
  FROM qp q JOIN {af} c
    ON q.cid = c.cid AND c.cellrn <= {IVF_CELL_CAP}
   AND c.vec_id <> q.query_id
),
adc AS (
  SELECT {hint_l}ca.query_id, ca.vec_id,
         {pivots}
  FROM cand ca
  JOIN rcodes co ON co.vec_id = ca.vec_id
  JOIN lut l ON l.query_id = ca.query_id AND l.cid = ca.cid
            AND l.m = co.m AND l.code = co.code
  GROUP BY ca.query_id, ca.vec_id
)
SELECT query_id, CAST(rank AS {int_t}) AS rank, vec_id AS neighbor_id
FROM (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ({_pq_adc_tree(pq_m)}) ASC, vec_id) AS rank
  FROM adc
) t WHERE rank <= {TOP_K}"""


def ann_ivf_pq_residual(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int = 1,
    pq_m: int = PQ_M,
) -> DataFrame:
    """IVFADC with residual encoding — the production IVF-PQ variant.
    At the default ``pq_m`` codes are served from the stored
    residual-code table; an off-default ``pq_m`` re-encodes inline
    (the dial's value-check path — a deployment re-builds the stored
    index instead).  ``nprobe`` probes more cells with per-cell query
    residuals (IVFADC multi-probe)."""
    if nprobe < 1 or nprobe > KMEANS_K:
        raise ValueError(f"nprobe must be in [1, {KMEANS_K}]")
    _pq_subdim(pq_m)
    af, cv = _kmeans_index(spark, sf_dir)
    probe_sql = (
        _spark_probe_sql(spark, sf_dir, af, nprobe) if nprobe > 1 else None
    )
    codes_src = (
        _rpq_codes_view(spark, sf_dir) if pq_m == PQ_M else None
    )
    return spark.sql(
        "WITH "
        + _ivf_pq_residual_body(
            "spark", af, cv, codes_src=codes_src,
            nprobe=nprobe, pq_m=pq_m, probe_sql=probe_sql,
        )
    )


def _ivf_pq_residual_oracle(nprobe: int = 1, pq_m: int = PQ_M) -> str:
    # afm/cvm: duckdb 1.0 INLINES plain CTEs, so every one of the
    # body's af/centroid references would re-run the whole Lloyd chain
    # (the r7-documented allocator flake) — pin them MATERIALIZED
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
afm AS MATERIALIZED (SELECT * FROM af),
cvm AS MATERIALIZED (SELECT * FROM c{KMEANS_ITERS}),
{_ivf_pq_residual_body('duck', 'afm', 'cvm', nprobe=nprobe, pq_m=pq_m)}
"""


def _pq_full_l2(dialect: str, a: str, b: str) -> str:
    """Exact squared L2 over the full vector — the PQ_M per-subspace
    trees combined by the same balanced reduce as the ADC sum, so the
    exact baseline ranks with bit-identical arithmetic on both
    engines."""
    terms = [f"({_pq_dist(dialect, a, b, str(m))})" for m in range(PQ_M)]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})"
            if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _recall_arms_sql(dialect: str = "duck") -> str:
    """One recall@K arm per (variant label, top-K relation) — a single
    template so the recall computation cannot drift between variants.
    Both eval sides are N_QUERIES * TOP_K rows — broadcast on spark
    (guide §3.1)."""
    bc = "/*+ BROADCAST(r) */ " if dialect == "spark" else ""
    return "\nUNION ALL\n".join(
        f"""SELECT {bc}e.query_id, '{variant}' AS variant,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(r.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(r.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
FROM exact e LEFT JOIN {rel} r
  ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
GROUP BY e.query_id"""
        for variant, rel in (
            ("raw", "rawk"),
            ("residual", "resk"),
            ("residual_trained", "trk"),
        )
    )


def _pq_residual_recall_body(
    dialect: str, af: str, cv: str, rsub: str, cb: str,
    codes_src: str | None = None,
    raw_codes_src: str | None = None,
    res_codes_src: str | None = None,
) -> str:
    """raw-PQ vs residual-PQ vs TRAINED-residual-PQ ADC recall against
    the exact in-cell top-K — the acceptance artifact of the IVF-PQ
    family (the sketch_accuracy_eval counterpart for quantized search).
    All ADC variants rank the SAME candidate set as the exact baseline
    (the query's own cell), so the recall gaps isolate pure
    quantization loss — no coarse-probe loss mixed in — and the
    raw -> residual -> trained progression is the codebook-engineering
    story measured end to end."""
    full_l2 = _pq_full_l2(dialect, "q.qemb", "c.emb")
    raw_prelude = (
        _pq_codes_ctes(dialect, af)
        if raw_codes_src is None
        else _pq_stored_prelude(af, raw_codes_src)
    )
    return f"""rawk AS (
  WITH {raw_prelude},
  {_ivf_pq_body(dialect, af)}
),
resk AS (
  WITH {_ivf_pq_residual_body(dialect, af, cv, codes_src=res_codes_src)}
),
{_ivf_pq_trained_body(dialect, af, cv, rsub, cb, out='trk', codes_src=codes_src)},
exq AS (
  SELECT vec_id AS query_id, emb AS qemb, cid FROM {af}
  WHERE vec_id < {N_QUERIES}
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                ORDER BY ({full_l2}) ASC, c.vec_id) AS rank
    FROM exq q JOIN {af} c
      ON q.cid = c.cid AND c.cellrn <= {IVF_CELL_CAP}
     AND c.vec_id <> q.query_id
  ) t WHERE rank <= {TOP_K}
)
{_recall_arms_sql(dialect)}"""


# ---------------------------------------------------------------------------
# TRAINED residual codebook — per-subspace k-means over the residual
# distribution (the codebook-training step every production IVFADC
# index runs; FAISS's `train()`).  Init = the external-supply codebook
# (first PQ_K residual subvectors), then TRAINED_PQ_ITERS Lloyd rounds:
# argmin-assign every (vector, subspace) residual to its nearest
# codeword, recompute codewords as fixed-point-exact means — the same
# integer-sum construction as the coarse k-means (_kmeans_update), so
# codebooks are bit-reproducible under any partitioning and the DuckDB
# oracle's fully-inlined chain matches exactly.
#
# Spark runs the loop driver-side like the coarse quantizer and the PC
# fits: each round is ONE job ending in a <=PQ_M*PQ_K-row collect that
# is inlined as literals into the next round (repr round-trip — see
# _centroid_literal_sql).  Lloyd monotonicity gives the testable
# invariant: total quantization distortion(trained) <= distortion(init).
# ---------------------------------------------------------------------------

TRAINED_PQ_ITERS = 2


def _rsub_sql(dialect: str, af: str, cv: str) -> str:
    """(vec_id, m, r[8]) residual subvectors of every corpus vector."""
    off = 0 if dialect == "spark" else 1
    elems = ", ".join(
        f"(emb[m * {_PQ_SUBDIM} + {i + off}]"
        f" - ctr[m * {_PQ_SUBDIM} + {i + off}])"
        for i in range(_PQ_SUBDIM)
    )
    if dialect == "spark":
        return f"""SELECT vec_id, m, array({elems}) AS r FROM (
  SELECT a.vec_id, a.emb, c.emb AS ctr,
         explode(sequence(0, {PQ_M - 1})) AS m
  FROM {af} a JOIN {cv} c ON a.cid = c.cid)"""
    return f"""SELECT a.vec_id, s.m, [{elems}] AS r FROM
  (SELECT a.vec_id, a.emb, c.emb AS ctr FROM {af} a
   JOIN {cv} c ON a.cid = c.cid) a,
  unnest(generate_series(0, {PQ_M - 1})) AS s(m)"""


def _r8_dist(dialect: str, r: str, c: str) -> str:
    """Unrolled squared L2 between two 8-component arrays."""
    off = 0 if dialect == "spark" else 1
    terms = [
        f"(({r}[{i + off}] - {c}[{i + off}])"
        f" * ({r}[{i + off}] - {c}[{i + off}]))"
        for i in range(_PQ_SUBDIM)
    ]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})"
            if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _tcb_assign_sql(dialect: str, rsub: str, cb: str) -> str:
    """argmin codeword per (vec_id, m) residual subvector.

    Spark emits a MIN(struct(d, code, r)) hash aggregate instead of
    the ROW_NUMBER window: struct comparison is lexicographic, (d,
    code) is unique per group (codes are distinct), so the minimum is
    exactly the window's (dist ASC, code) top row — bit-identical,
    r12-verified — but the aggregate gets map-side partial combine
    over the vec x M x K exploded join instead of a full shuffle+sort
    (the r12 driver-loop measurement: 2 Lloyd iters 2.39 -> 1.26s
    warm together with the VALUES literal below).  DuckDB keeps the
    window form; its materialized-CTE chain is not the hot path."""
    dist = _r8_dist(dialect, "s.r", "cb.cemb")
    if dialect == "spark":
        return f"""SELECT vec_id, m, w.r AS r, w.code AS code FROM (
  SELECT s.vec_id, s.m,
         MIN(struct(({dist}) AS d, cb.code AS code, s.r AS r)) AS w
  FROM {rsub} s JOIN {cb} cb ON s.m = cb.m
  GROUP BY s.vec_id, s.m) t"""
    return f"""SELECT vec_id, m, r, code FROM (
  SELECT s.vec_id, s.m, s.r, cb.code,
         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
              ORDER BY ({dist}) ASC, cb.code) AS rn
  FROM {rsub} s JOIN {cb} cb ON s.m = cb.m) t WHERE rn = 1"""


def _tcb_update_sql(dialect: str, assigned: str) -> str:
    """Fixed-point-exact codeword means (mirrors _kmeans_update)."""
    off = 0 if dialect == "spark" else 1
    arr_open, arr_close = ("array(", ")") if dialect == "spark" else ("[", "]")
    elems = ",\n       ".join(
        f"CAST(SUM(CAST(FLOOR(r[{i + off}] * {_FP_SCALE}) AS BIGINT))"
        f" AS DOUBLE) / (COUNT(*) * {_FP_SCALE})"
        for i in range(_PQ_SUBDIM)
    )
    return (
        f"SELECT m, code, {arr_open}{elems}{arr_close} AS cemb"
        f" FROM {assigned} GROUP BY m, code"
    )


def _tcb_literal_sql(rows) -> str:
    """(m, code, cemb[8]) codebook as a SQL literal — repr round-trip,
    exact (see _centroid_literal_sql).  One VALUES LocalRelation, not
    a 128-way UNION ALL: the union form re-entered analysis once per
    branch and dominated the Lloyd-loop wall clock (r12 measured the
    2-iteration loop at 4.0s cold / 2.4s warm with unions vs 1.4/1.3s
    with VALUES, rows bit-identical).  Spark-only — the DuckDB oracle
    inlines the training chain as CTEs (_tcb_chain_sql) instead."""
    vals = ",\n".join(
        f"({int(r['m'])}, {int(r['code'])}, array("
        + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in r["cemb"])
        + "))"
        for r in rows
    )
    return (
        "SELECT m, code, cemb FROM VALUES\n"
        f"{vals}\nAS lit(m, code, cemb)"
    )


_trained_cb_cache: dict = {}


def _trained_rcb(spark: SparkSession, sf_dir: str) -> tuple[str, str, str]:
    """(rsub view, trained-codebook view, stored-codes view) — the
    trained-PQ index.  rsub is checkpointed (corpus x PQ_M narrow
    rows); the Lloyd loop runs driver-side with literal codebooks per
    round; the final CODES are checkpointed too — encode happens once
    at index build, exactly like a production IVFADC index stores
    codes, so the query path never re-runs the corpus x codebook
    argmin (measured 2.46 -> ~0.6s on the trained search lane at
    sf0.1)."""
    key = (session_key(spark), sf_dir)
    if key not in _trained_cb_cache:
        af, cv = _kmeans_index(spark, sf_dir)
        tag = abs(hash(key)) % 10**8
        rsub_name = f"pq_rsub_{tag}"
        rs = spark.sql(_rsub_sql("spark", af, cv)).localCheckpoint(
            eager=True
        )
        rs.createOrReplaceTempView(rsub_name)
        rows = spark.sql(
            f"SELECT m, vec_id AS code, r AS cemb FROM {rsub_name}"
            f" WHERE vec_id < {PQ_K}"
        ).collect()
        for _ in range(TRAINED_PQ_ITERS):
            cb_lit = f"({_tcb_literal_sql(rows)})"
            assigned = _tcb_assign_sql("spark", rsub_name, cb_lit)
            rows = spark.sql(
                _tcb_update_sql("spark", f"({assigned}) a_it")
            ).collect()
        cb_name = f"pq_tcb_{tag}"
        # checkpointed, not a literal view: the 128-row UNION ALL
        # literal re-enters analysis/codegen on every consumer (the
        # trained lane measured ~1MB task binaries); the checkpoint is
        # a plain LogicalRDD with the identical binary64 rows
        # coalesce(1): the codebook is PQ_K * m rows (128) by
        # construction — stored at the literal plan's 32 partitions,
        # every consumer's broadcast collect paid one task per
        # near-empty partition (r15)
        cb_df = spark.sql(_tcb_literal_sql(rows)).coalesce(
            1
        ).localCheckpoint(eager=True)
        cb_df.createOrReplaceTempView(cb_name)
        codes_name = f"pq_tcodes_{tag}"
        cdf = spark.sql(
            "SELECT vec_id, m, code FROM ("
            + _tcb_assign_sql("spark", rsub_name, cb_name)
            + ") asg"
        ).localCheckpoint(eager=True)
        cdf.createOrReplaceTempView(codes_name)
        # rs/cb_df/cdf kept so bench's cold path can free the checkpoints
        _trained_cb_cache[key] = (
            rsub_name, cb_name, codes_name, rs, cb_df, cdf
        )
    return _trained_cb_cache[key][:3]


def _tcb_chain_sql(dialect: str, af: str, cv: str) -> str:
    """DuckDB-side inlined training chain (rsub -> tcb0 -> ... ->
    tcb{ITERS}); every relation MATERIALIZED (multiply referenced)."""
    # NOTE the relation is named trsub, NOT rsub: _ivf_pq_residual_body
    # defines its own nested rsub CTE, and shadowing an outer
    # MATERIALIZED CTE of the same name trips duckdb 1.0's binder
    # ('LATERAL join cannot contain window functions') when both appear
    # in one statement (the recall eval does exactly that)
    parts = [
        f"trsub AS MATERIALIZED ({_rsub_sql(dialect, af, cv)})",
        f"tcb0 AS MATERIALIZED (SELECT m, vec_id AS code, r AS cemb"
        f" FROM trsub WHERE vec_id < {PQ_K})",
    ]
    prev = "tcb0"
    for i in range(1, TRAINED_PQ_ITERS + 1):
        parts.append(
            f"ta{i} AS ({_tcb_assign_sql(dialect, 'trsub', prev)})"
        )
        parts.append(
            f"tcb{i} AS MATERIALIZED ({_tcb_update_sql(dialect, f'ta{i}')})"
        )
        prev = f"tcb{i}"
    return ",\n".join(parts)


def _ivf_pq_trained_body(
    dialect: str, af: str, cv: str, rsub: str, cb: str,
    out: str = "trained_topk", codes_src: str | None = None,
    nprobe: int = 1, probe_sql: str | None = None,
) -> str:
    """Residual-ADC search with the TRAINED codebook: codes = argmin
    over ``cb``; LUT from the query's per-probed-cell residual
    subvectors (own cell at nprobe=1; IVFADC multi-probe recomputes
    the residual against each probed centroid, so tqr/tlut carry a
    cid key and the ADC join matches the candidate's cell).
    Emitted as a FLAT CTE chain ending in the ``out`` relation (never
    a nested parenthesized WITH: duckdb 1.0's binder rejects window
    functions inside a nested-WITH subquery that also carries the
    lateral unnest — 'LATERAL join cannot contain window functions').

    No pq_m dial here by design: the trained codebook is a STORED
    index artifact whose subspace count is fixed at train time
    (FAISS's index factory works the same way) — re-training at a new
    m is an index build, exercised through the raw/untrained lanes'
    pq_m dial which shares these generators."""
    off = 0 if dialect == "spark" else 1
    qr_elems = ", ".join(
        f"(qemb[m * {_PQ_SUBDIM} + {i + off}]"
        f" - ctr[m * {_PQ_SUBDIM} + {i + off}])"
        for i in range(_PQ_SUBDIM)
    )
    probe = _probe_cte(
        dialect, af, cv if dialect == "duck" else None, nprobe,
        probe_sql, name="tqp",
    )
    if dialect == "spark":
        qr = f"""SELECT query_id, cid, m, array({qr_elems}) AS r FROM (
    SELECT q.vec_id AS query_id, q.emb AS qemb, c.emb AS ctr, p.cid,
           explode(sequence(0, {PQ_M - 1})) AS m
    FROM {af} q JOIN tqp p ON q.vec_id = p.query_id
    JOIN {cv} c ON p.cid = c.cid
    WHERE q.vec_id < {N_QUERIES})"""
    else:
        qr = f"""SELECT a.query_id, a.cid, s.m, [{qr_elems}] AS r FROM
    (SELECT q.vec_id AS query_id, q.emb AS qemb, c.emb AS ctr, p.cid
     FROM {af} q JOIN tqp p ON q.vec_id = p.query_id
     JOIN {cv} c ON p.cid = c.cid
     WHERE q.vec_id < {N_QUERIES}) a,
    unnest(generate_series(0, {PQ_M - 1})) AS s(m)"""
    ldist = _r8_dist(dialect, "q.r", "cb.cemb")
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN co.m = {i} THEN l.d END) AS s{i}"
        for i in range(PQ_M)
    )
    hint_q = "/*+ BROADCAST(q) */ " if dialect == "spark" else ""
    hint_l = "/*+ BROADCAST(ca, l) */ " if dialect == "spark" else ""
    int_t = "INT" if dialect == "spark" else "INTEGER"
    tcodes = (
        f"SELECT vec_id, m, code FROM {codes_src}"
        if codes_src
        else f"SELECT vec_id, m, code"
        f" FROM ({_tcb_assign_sql(dialect, rsub, cb)}) asg"
    )
    return f"""tcodes AS (
  {tcodes}
),
{probe},
tqr AS ({qr}),
tlut AS (
  SELECT q.query_id, q.cid, q.m, cb.code, ({ldist}) AS d
  FROM tqr q JOIN {cb} cb ON q.m = cb.m
),
tcand AS (
  SELECT {hint_q}q.query_id, q.cid, c.vec_id
  FROM tqp q JOIN {af} c
    ON q.cid = c.cid AND c.cellrn <= {IVF_CELL_CAP}
   AND c.vec_id <> q.query_id
),
tadc AS (
  SELECT {hint_l}ca.query_id, ca.vec_id,
         {pivots}
  FROM tcand ca
  JOIN tcodes co ON co.vec_id = ca.vec_id
  JOIN tlut l ON l.query_id = ca.query_id AND l.cid = ca.cid
            AND l.m = co.m AND l.code = co.code
  GROUP BY ca.query_id, ca.vec_id
),
{out} AS (
  SELECT query_id, CAST(rank AS {int_t}) AS rank, vec_id AS neighbor_id
  FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY ({_pq_adc_tree()}) ASC, vec_id) AS rank
    FROM tadc
  ) t WHERE rank <= {TOP_K}
)"""


def ann_ivf_pq_trained(
    spark: SparkSession, sf_dir: str, nprobe: int = 1
) -> DataFrame:
    """IVFADC with the k-means-TRAINED residual codebook — the full
    production index: train(), encode, probed-cell ADC search.
    ``nprobe`` is the query-time recall dial (per-cell query
    residuals); the codebook's subspace count is fixed at train time
    (see _ivf_pq_trained_body)."""
    if nprobe < 1 or nprobe > KMEANS_K:
        raise ValueError(f"nprobe must be in [1, {KMEANS_K}]")
    af, cv = _kmeans_index(spark, sf_dir)
    rsub, cb, codes = _trained_rcb(spark, sf_dir)
    probe_sql = (
        _spark_probe_sql(spark, sf_dir, af, nprobe) if nprobe > 1 else None
    )
    return spark.sql(
        "WITH "
        + _ivf_pq_trained_body(
            "spark", af, cv, rsub, cb, codes_src=codes,
            nprobe=nprobe, probe_sql=probe_sql,
        )
        + " SELECT * FROM trained_topk"
    )


def _ivf_pq_trained_oracle(nprobe: int = 1) -> str:
    cvn = f"c{KMEANS_ITERS}"
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
afm AS MATERIALIZED (SELECT * FROM af),
cvm AS MATERIALIZED (SELECT * FROM {cvn}),
{_tcb_chain_sql('duck', 'afm', 'cvm')},
{_ivf_pq_trained_body('duck', 'afm', 'cvm', 'trsub',
                      f'tcb{TRAINED_PQ_ITERS}', nprobe=nprobe)}
SELECT * FROM trained_topk
"""


# ---------------------------------------------------------------------------
# Trained-IVFADC nprobe tuning curve — the FULL-SYSTEM counterpart of
# ann_nprobe_recall_curve (exact distances, probe loss only) and
# ann_pq_residual_recall (fixed candidates, quantization loss only):
# per-query recall@K of the trained residual-ADC search at every
# PROBE_GRID depth against the exact-L2 global top-K, so the curve
# shows probe loss AND quantization loss together — the artifact a
# deployment actually reads to pick nprobe for an IVFADC index (the
# plateau as nprobe -> K is the quantization ceiling, NOT 1.0; the
# exact-distance curve's =1.0 endpoint shows the difference).
#
# Plan shape mirrors the exact curve: the (query x corpus) scored
# relation — every pair's cellrank, exact L2, and trained-ADC distance
# — is computed ONCE per (session, sf) and localCheckpoint-ed; the
# brute baseline and every probe depth are rankings over the
# materialized rows.  The probe assignment is the literal
# sorted-centroid projection (no cross join); the ADC side reads the
# STORED trained codes and joins a per-(query, probed-cell) residual
# LUT (cell-relative, IVFADC proper) — query-set-bounded x corpus
# rows, the standard eval-lane cost model.
# ---------------------------------------------------------------------------


def _pq_curve_scored_sql(
    dialect: str, af: str, cv: str, cb: str, tcodes: str, qp: str
) -> str:
    """pqscored (query_id, vec_id, cellrank, capped, exd, adcd): every
    (query, corpus-vector) pair with the rank of the vector's cell
    among the query's centroid distances, the exact full-vector L2,
    and the trained-residual ADC distance (NULL on uncapped rows —
    the probed searches never score them).  ``qp`` must yield
    (query_id, qemb, cid, cellrank) covering ALL {KMEANS_K} cells.
    Emitted as a FLAT CTE chain ending in the ``pqscored`` relation
    (duckdb 1.0 binder: no nested WITH around windows + unnest)."""
    off = 0 if dialect == "spark" else 1
    enum = (
        f"explode(sequence(0, {PQ_M - 1}))"
        if dialect == "spark"
        else f"unnest(generate_series(0, {PQ_M - 1}))"
    )
    qr_elems = ", ".join(
        f"(qemb[m * {_PQ_SUBDIM} + {i + off}]"
        f" - ctr[m * {_PQ_SUBDIM} + {i + off}])"
        for i in range(_PQ_SUBDIM)
    )
    if dialect == "spark":
        pqr = f"""SELECT query_id, cid, m, array({qr_elems}) AS r FROM (
    SELECT p.query_id, p.qemb, c.emb AS ctr, p.cid,
           explode(sequence(0, {PQ_M - 1})) AS m
    FROM pcqp p JOIN {cv} c ON p.cid = c.cid)"""
    else:
        pqr = f"""SELECT a.query_id, a.cid, s.m, [{qr_elems}] AS r FROM
    (SELECT p.query_id, p.qemb, c.emb AS ctr, p.cid
     FROM pcqp p JOIN {cv} c ON p.cid = c.cid) a,
    unnest(generate_series(0, {PQ_M - 1})) AS s(m)"""
    ldist = _r8_dist(dialect, "q.r", "cb.cemb")
    exd = _pq_full_l2(dialect, "p.qemb", "c.emb")
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN co.m = {i} THEN l.d END) AS s{i}"
        for i in range(PQ_M)
    )
    hint_l = "/*+ BROADCAST(l) */ " if dialect == "spark" else ""
    return f"""pcqp AS ({qp}),
pqr AS ({pqr}),
plut AS (
  SELECT q.query_id, q.cid, q.m, cb.code, ({ldist}) AS d
  FROM pqr q JOIN {cb} cb ON q.m = cb.m
),
pqpairs AS (
  SELECT p.query_id, c.vec_id, p.cid, p.cellrank,
         c.cellrn <= {IVF_CELL_CAP} AS capped, ({exd}) AS exd
  FROM pcqp p JOIN {af} c
    ON p.cid = c.cid AND c.vec_id <> p.query_id
),
pqadc AS (
  SELECT query_id, vec_id, ({_pq_adc_tree()}) AS adcd
  FROM (
    SELECT {hint_l}pa.query_id, pa.vec_id,
           {pivots}
    FROM (SELECT * FROM pqpairs WHERE capped) pa
    JOIN {tcodes} co ON co.vec_id = pa.vec_id
    JOIN plut l ON l.query_id = pa.query_id AND l.cid = pa.cid
               AND l.m = co.m AND l.code = co.code
    GROUP BY pa.query_id, pa.vec_id
  ) px
),
pqscored AS (
  SELECT p.query_id, p.vec_id, p.cellrank, p.capped, p.exd, a.adcd
  FROM pqpairs p LEFT JOIN pqadc a
    ON a.query_id = p.query_id AND a.vec_id = p.vec_id
)"""


def _pq_curve_blocks(dialect: str, scored: str) -> str:
    """Brute exact-L2 baseline + per-nprobe trained-ADC recall blocks
    over the shared scored relation (ADC ranks ascending — it is a
    distance, unlike the cosine curve's score)."""
    np_cast = "INT" if dialect == "spark" else "INTEGER"
    hint_h = "/*+ BROADCAST(h) */ " if dialect == "spark" else ""
    blocks = []
    for np in PROBE_GRID:
        blocks.append(f"""
  SELECT {hint_h}CAST({np} AS {np_cast}) AS nprobe, b.query_id,
         COUNT(*) AS n_exact, COUNT(h.hit) AS n_hits,
         CAST(COUNT(h.hit) AS DOUBLE) / COUNT(*) AS recall
  FROM pqbrute b LEFT JOIN (
    SELECT query_id, vec_id, 1 AS hit FROM (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY adcd ASC, vec_id) AS rank
      FROM {scored} WHERE cellrank <= {np} AND capped
    ) t WHERE rank <= {TOP_K}
  ) h ON b.query_id = h.query_id AND b.vec_id = h.vec_id
  GROUP BY b.query_id""")
    union = "\n  UNION ALL\n".join(blocks)
    return f"""pqbrute AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY exd ASC, vec_id) AS rank
    FROM {scored}
  ) t WHERE rank <= {TOP_K}
)
{union}"""


_pq_curve_cache: dict = {}


def _pq_curve_scored_view(spark: SparkSession, sf_dir: str) -> str:
    """The checkpointed (query x corpus) scored relation of the
    trained-IVFADC curve — one probe-assignment pass, one exact-L2
    pass and one stored-codes ADC pass serve the brute baseline and
    every probe depth."""
    key = (session_key(spark), sf_dir)
    if key not in _pq_curve_cache:
        af, cv = _kmeans_index(spark, sf_dir)
        _rsub, cb, codes = _trained_rcb(spark, sf_dir)
        sa = _probe_sorted_expr(_kmeans_centroids(spark, sf_dir), "emb")
        qp = f"""
          SELECT vec_id AS query_id, emb AS qemb, pcid AS cid,
                 idx + 1 AS cellrank
          FROM (
            SELECT vec_id, emb, {sa} AS __sa
            FROM {af} WHERE vec_id < {N_QUERIES}
          ) t LATERAL VIEW posexplode(transform(__sa, s -> s.c))
            p AS idx, pcid
        """
        sc = spark.sql(
            "WITH "
            + _pq_curve_scored_sql("spark", af, cv, cb, codes, qp)
            + " SELECT * FROM pqscored"
        ).localCheckpoint(eager=True)
        name = f"pq_curve_scored_{abs(hash(key)) % 10**8}"
        sc.createOrReplaceTempView(name)
        _pq_curve_cache[key] = (name, sc)
    return _pq_curve_cache[key][0]


def ann_pq_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@K of the trained IVFADC search at every
    PROBE_GRID depth vs the exact-L2 global top-K — the deployment
    tuning artifact for the (nprobe, trained-codebook) index.  See
    the section comment: unlike ann_nprobe_recall_curve this curve
    plateaus at the quantization ceiling rather than 1.0.

    Honest testdata reading (sf0.001): mean recall 0.41 at nprobe=1,
    flat ~0.40 at nprobe 2/4/8 — the quantization ceiling dominates
    probe loss on this corpus, and the curve is NOT monotone in
    nprobe: widening the probe admits candidates whose quantized
    distances displace true neighbors from the top-K (ADC noise), a
    real IVFADC effect — and the measured argument for the
    shortlist-then-rerank architecture (ann_rerank / ann_mrl_rerank)
    rather than trusting raw ADC ranks.  The exact-distance curve's
    monotonicity test (test_parameterized) deliberately does NOT
    apply here."""
    return spark.sql(
        "WITH "
        + _pq_curve_blocks(
            "spark", _pq_curve_scored_view(spark, sf_dir)
        )
    )


def _pq_nprobe_curve_oracle() -> str:
    qdot = _unrolled_dot("a.emb", "c.emb", "duck")
    cvn = f"c{KMEANS_ITERS}"
    qp = f"""
  SELECT query_id, qemb, cid, cellrank FROM (
    SELECT a.vec_id AS query_id, a.emb AS qemb, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY (c.cc - (2 * ({qdot}))) ASC, c.cid) AS cellrank
    FROM (SELECT * FROM afm WHERE vec_id < {N_QUERIES}) a
    CROSS JOIN cvm c
  ) t"""
    tcodes_sql = _tcb_assign_sql("duck", "trsub", f"tcb{TRAINED_PQ_ITERS}")
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
afm AS MATERIALIZED (SELECT * FROM af),
cvm AS MATERIALIZED (SELECT * FROM {cvn}),
{_tcb_chain_sql('duck', 'afm', 'cvm')},
ptc AS MATERIALIZED (SELECT vec_id, m, code FROM ({tcodes_sql}) asg),
{_pq_curve_scored_sql('duck', 'afm', 'cvm', f'tcb{TRAINED_PQ_ITERS}',
                      'ptc', qp)},
pqscored_m AS MATERIALIZED (SELECT * FROM pqscored),
{_pq_curve_blocks('duck', 'pqscored_m')}
"""


# ---------------------------------------------------------------------------
# pq_m compression-accuracy curve — the dial-justification artifact
# for the IVF-PQ subspace count (the sibling of ann_pq_nprobe_curve
# for nprobe and ann_nprobe_recall_curve for the exact search): total
# quantization distortion of the raw-PQ encode at every PQ_M_GRID
# layout, against the code size it buys.  More subspaces = narrower
# subvectors = each codeword approximates less = lower distortion at
# linearly more bits/vector; the curve is what a deployment reads to
# pick m.  Distortion is quantized per (vector, subspace) BEFORE the
# sum (FLOOR(d * 2^20) — double summation order would otherwise make
# the total partition-dependent), so the artifact is an exact integer
# on both engines.
# ---------------------------------------------------------------------------

PQ_M_GRID = (2, 4, 8, 16)
_PQDQ_SCALE = 1 << 20
# One code per subspace indexes a PQ_K-entry codebook, so it costs
# log2(PQ_K) bits; derived (not hardcoded) so a PQ_K change cannot
# silently misreport the curve's cost axis (r12 advice).
_PQ_CODE_BITS = PQ_K.bit_length() - 1
# ValueError, not assert: the guard must survive `python -O`
# (r13 advice — asserts are stripped under optimization)
if (1 << _PQ_CODE_BITS) != PQ_K:
    raise ValueError("PQ_K must be a power of two")


def _pq_m_curve_block(dialect: str, v: str, pq_m: int) -> str:
    """One grid point: encode at ``pq_m``, reconstruct, sum quantized
    subspace distortions (codes' argmin distance IS the subspace
    distortion — no second lookup needed)."""
    dist = _pq_dist(dialect, "s.emb", "cb.cemb", "s.m", pq_m)
    enum = (
        f"explode(sequence(0, {pq_m - 1}))"
        if dialect == "spark"
        else f"unnest(generate_series(0, {pq_m - 1}))"
    )
    int_t = "INT" if dialect == "spark" else "INTEGER"
    return f"""
  SELECT CAST({pq_m} AS {int_t}) AS pq_m,
         CAST({pq_m * _PQ_CODE_BITS} AS {int_t}) AS bits_per_vec,
         CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors,
         CAST(SUM(dq) AS BIGINT) AS total_dist_q
  FROM (
    SELECT vec_id, CAST(FLOOR(mind * {_PQDQ_SCALE}) AS BIGINT) AS dq
    FROM (
      SELECT s.vec_id, s.m, MIN({dist}) AS mind
      FROM (SELECT vec_id, emb, {enum} AS m FROM {v}) s
      CROSS JOIN (SELECT vec_id AS code, emb AS cemb FROM {v}
                  WHERE vec_id < {PQ_K}) cb
      GROUP BY s.vec_id, s.m
    ) t
  ) q"""


def ann_pq_m_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total raw-PQ quantization distortion at every PQ_M_GRID
    subspace count vs the bits/vector it costs — the measured
    justification for the pq_m dial (queries_parameterized): a
    deployment reads this curve with ann_pq_nprobe_curve to pick the
    (m, nprobe) operating point."""
    v = _normed(spark, sf_dir)
    union = "\n  UNION ALL\n".join(
        _pq_m_curve_block("spark", v, m) for m in PQ_M_GRID
    )
    return spark.sql(union)


def _pq_m_curve_oracle() -> str:
    union = "\n  UNION ALL\n".join(
        _pq_m_curve_block("duck", "vm", m) for m in PQ_M_GRID
    )
    return f"""
WITH {_duck_v_cte()},
vm AS MATERIALIZED (SELECT vec_id, emb FROM v)
{union}
"""


def ann_pq_residual_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-loss eval: raw vs residual IVF-PQ recall@K against
    the exact in-cell ranking (3 rows per query: raw, residual,
    residual_trained).

    Honest driver-testdata reading, measured at sf0.01: raw 0.39,
    untrained residual 0.35, TRAINED residual 0.45 mean recall.  The
    untrained rows show the external-supply codebook gives residual
    encoding no edge by itself; the residual_trained rows show the
    k-means training step (TRAINED_PQ_ITERS Lloyd rounds on the
    residual distribution — what FAISS train() does) is where the
    IVFADC win actually comes from.  The Lloyd distortion monotonicity
    (trained <= init on total quantization error) is pinned by
    tests/test_pipeline_invariants.py; the recall improvement is the
    measured consequence, not an assumed one."""
    af, cv = _kmeans_index(spark, sf_dir)
    rsub, cb, codes = _trained_rcb(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _pq_residual_recall_body(
            "spark", af, cv, rsub, cb, codes_src=codes,
            raw_codes_src=_pq_codes_view(spark, sf_dir),
            res_codes_src=_rpq_codes_view(spark, sf_dir),
        )
    )


def _pq_residual_recall_oracle() -> str:
    # see _ivf_pq_residual_oracle: af is referenced ~8x across the three
    # ADC variants + the exact baseline — MATERIALIZED or the inlined
    # Lloyd chains blow duckdb 1.0's allocator
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
afm AS MATERIALIZED (SELECT * FROM af),
cvm AS MATERIALIZED (SELECT * FROM c{KMEANS_ITERS}),
{_tcb_chain_sql('duck', 'afm', 'cvm')},
{_pq_residual_recall_body('duck', 'afm', 'cvm', 'trsub',
                          f'tcb{TRAINED_PQ_ITERS}')}
"""


MRL_DIM = 16  # Matryoshka prefix length


def _prefix_dot(a: str, b: str, dialect: str, dim: int = MRL_DIM) -> str:
    """Balanced unrolled dot over the first ``dim`` components — the
    Matryoshka-truncated score (same tree discipline as _unrolled_dot,
    so it is bit-deterministic across engines)."""
    off = 0 if dialect == "spark" else 1
    terms = [f"({a}[{i + off}] * {b}[{i + off}])" for i in range(dim)]
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})"
            if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def ann_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of prefix-dimension (Matryoshka) search vs full-dim
    exact — how much accuracy a 4x-cheaper 16-of-64-component scan
    keeps.  This is the evaluation behind MRL-style embedding
    deployments: score candidates on a short prefix (4x less I/O and
    compute per pair at 100 TB), then decide whether a full-dim rerank
    is needed.  Prefix cosine = prefix dot / prefix norms; sqrt is
    IEEE-correctly-rounded on both engines, so ranks are
    engine-identical."""
    from pyspark.sql import functions as F

    v = _normed(spark, sf_dir)
    pd_ = _prefix_dot("q.emb", "c.emb", "spark")
    pq_ = _prefix_dot("q.emb", "q.emb", "spark")
    pc_ = _prefix_dot("c.emb", "c.emb", "spark")
    brute = ann_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    mrl = spark.sql(
        f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ({pd_}) / (sqrt({pq_}) * sqrt({pc_})) AS score
          FROM (SELECT * FROM {v} WHERE vec_id < {N_QUERIES}) q
          JOIN {v} c ON q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS rank
          FROM scored
        ) t WHERE rank <= {TOP_K}
        """
    ).withColumn("hit", F.lit(1))
    return (
        brute.join(F.broadcast(mrl), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("n_hits"),
            (
                F.count("hit").cast("double") / F.count(F.lit(1))
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# MRL two-stage retrieval (the actual Matryoshka deployment pattern):
# shortlist top-C by the cheap 16-of-64-component prefix score, then
# re-rank ONLY the shortlist at full precision — per-pair scan cost
# stays at prefix width while the full-dim work is C rows per query.
# The eval carries three readings per query: exact-baseline recall of
# the two-stage result, of the prefix-only top-K (what you get without
# the rerank — the measured value of stage 2), and the candidate
# budget C is a driver-visible dial.  Degenerate anchors are pinned by
# test: C = TOP_K makes the two readings share one candidate set, and
# C >= corpus makes the two-stage exact (recall 1.0).
# ---------------------------------------------------------------------------

MRL_RERANK_C = 32  # shortlist budget (candidates per query)


def _mrl_rerank_body(dialect: str, v: str, c_short: int) -> str:
    # both eval sides are N_QUERIES * TOP_K rows; the stats-less stored
    # scan otherwise falls back to sort-merge (guide §3.1)
    hint_t = "/*+ BROADCAST(t, p) */ " if dialect == "spark" else ""
    cosf = (_spark_cosine if dialect == "spark" else _duck_cosine)(
        "q.emb", "c.emb", "q.nrm", "c.nrm"
    )
    pd_ = _prefix_dot("q.emb", "c.emb", dialect)
    pq_ = _prefix_dot("q.emb", "q.emb", dialect)
    pc_ = _prefix_dot("c.emb", "c.emb", dialect)
    return f"""qv AS (SELECT * FROM {v} WHERE vec_id < {N_QUERIES}),
pscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ({pd_}) / (sqrt({pq_}) * sqrt({pc_})) DESC,
                       c.vec_id) AS prank
  FROM qv q JOIN {v} c ON q.vec_id <> c.vec_id
),
short AS (SELECT query_id, neighbor_id, prank FROM pscored
          WHERE prank <= {c_short}),
reranked AS (
  SELECT s.query_id, s.neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY s.query_id
              ORDER BY ({cosf}) DESC, s.neighbor_id) AS rank
  FROM short s
  JOIN qv q ON q.vec_id = s.query_id
  JOIN {v} c ON c.vec_id = s.neighbor_id
),
two AS (SELECT query_id, neighbor_id FROM reranked
        WHERE rank <= {TOP_K}),
pre_only AS (SELECT query_id, neighbor_id FROM short
             WHERE prank <= {TOP_K}),
exactk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY ({cosf}) DESC, c.vec_id) AS rank
    FROM qv q JOIN {v} c ON q.vec_id <> c.vec_id
  ) t WHERE rank <= {TOP_K}
)
SELECT {hint_t}e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_hits_two_stage,
       CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_hits_prefix_only,
       CAST(COUNT(t.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
FROM exactk e
LEFT JOIN two t
  ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
LEFT JOIN pre_only p
  ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
GROUP BY e.query_id"""


def ann_mrl_rerank(
    spark: SparkSession, sf_dir: str, c_short: int = MRL_RERANK_C
) -> DataFrame:
    """Two-stage MRL retrieval eval: prefix shortlist (top-C), full-dim
    rerank, recall vs exact alongside the prefix-only reading."""
    v = _normed(spark, sf_dir)
    return spark.sql(
        f"WITH {_mrl_rerank_body('spark', v, c_short)}"
    )


def _mrl_rerank_oracle(c_short: int = MRL_RERANK_C) -> str:
    return f"""
WITH {_duck_v_cte()},
{_mrl_rerank_body('duck', 'v', c_short)}
"""


def _mrl_recall_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    pd_ = _prefix_dot("q.emb", "c.emb", "duck")
    pq_ = _prefix_dot("q.emb", "q.emb", "duck")
    pc_ = _prefix_dot("c.emb", "c.emb", "duck")
    return f"""
WITH {_duck_v_cte()},
bscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c ON q.vec_id <> c.vec_id
),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
    FROM bscored
  ) t WHERE rank <= {TOP_K}
),
mscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ({pd_}) / (sqrt({pq_}) * sqrt({pc_})) AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c ON q.vec_id <> c.vec_id
),
mrl AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
    FROM mscored
  ) t WHERE rank <= {TOP_K}
)
SELECT b.query_id,
       COUNT(*) AS n_exact,
       COUNT(m.hit) AS n_hits,
       CAST(COUNT(m.hit) AS DOUBLE) / COUNT(*) AS recall
FROM brute b
LEFT JOIN mrl m
  ON b.query_id = m.query_id AND b.neighbor_id = m.neighbor_id
GROUP BY b.query_id
"""


def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the PQ/ADC search vs the exact brute-force top-K —
    the acceptance metric of any quantized index (how much accuracy the
    8-byte codes cost).  Same join/aggregate shape as ann_recall_eval;
    the ratio is one division of two exact counts."""
    from pyspark.sql import functions as F

    brute = ann_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    pq = (
        ann_pq_search(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        brute.join(F.broadcast(pq), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("n_hits"),
            (
                F.count("hit").cast("double") / F.count(F.lit(1))
            ).alias("recall"),
        )
    )


def _pq_recall_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return f"""
WITH {_duck_v_cte()},
{_pq_codes_ctes('duck', 'v')},
bscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c ON q.vec_id <> c.vec_id
),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
    FROM bscored
  ) t WHERE rank <= {TOP_K}
),
pq AS (
  WITH {_pq_search_body('duck').format(v='v')}
)
SELECT b.query_id,
       COUNT(*) AS n_exact,
       COUNT(p.hit) AS n_hits,
       CAST(COUNT(p.hit) AS DOUBLE) / COUNT(*) AS recall
FROM brute b
LEFT JOIN (SELECT query_id, neighbor_id, 1 AS hit FROM pq) p
  ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
GROUP BY b.query_id
"""


def ann_sq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the SQ8 code search vs the exact brute-force top-K —
    the acceptance metric of the 8-bit compression (same shape as
    ann_pq_recall; the PQ/SQ recall pair is how a deployment picks its
    compression point)."""
    from pyspark.sql import functions as F

    brute = ann_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    sq = (
        ann_sq_search(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        brute.join(F.broadcast(sq), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("n_hits"),
            (
                F.count("hit").cast("double") / F.count(F.lit(1))
            ).alias("recall"),
        )
    )


def _sq_recall_oracle() -> str:
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    max_abs, arr, scale = _sq_exprs("emb", "duck")
    dot = _sq_dot("q.code", "c.code", "duck")
    return f"""
WITH {_duck_v_cte()},
bscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS score
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
  JOIN v c ON q.vec_id <> c.vec_id
),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
    FROM bscored
  ) t WHERE rank <= {TOP_K}
),
sqc AS MATERIALIZED (
  SELECT vec_id, {arr} AS code, {scale} AS scale_q
  FROM (SELECT vec_id, emb, {max_abs} AS __m FROM v)
),
sq AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY c.scale_q * ({dot}) DESC, c.vec_id) AS rank
    FROM (SELECT * FROM sqc WHERE vec_id < {N_QUERIES}) q
    JOIN sqc c ON q.vec_id <> c.vec_id
  ) t WHERE rank <= {TOP_K}
)
SELECT b.query_id,
       COUNT(*) AS n_exact,
       COUNT(p.hit) AS n_hits,
       CAST(COUNT(p.hit) AS DOUBLE) / COUNT(*) AS recall
FROM brute b
LEFT JOIN (SELECT query_id, neighbor_id, 1 AS hit FROM sq) p
  ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
GROUP BY b.query_id
"""


# cosine * 1e6; >= flags contamination.  Production screens sit at
# ~0.9 for paraphrase catch; the synthetic corpus has no true near-dups
# of the benchmark set (max observed cos 0.49 at sf0.01), so the lane
# pins the threshold at the p99 of the benchmark-similarity
# distribution — both branches of the flag execute end-to-end and the
# per-source contamination rates are a live signal.
SEM_DECON_THRESH_Q = 350_000
SEM_DECON_NPROBE = 2
# sentinel max_cos_q for documents with NO benchmark vector in any of
# their probed cells: below every real quantized cosine (>= -1e6), so
# the "never even close" case is distinguishable from a low score
SEM_DECON_NO_CAND_Q = -2_000_000


def ann_semantic_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int = SEM_DECON_NPROBE,
    thresh_q: int = SEM_DECON_THRESH_Q,
) -> DataFrame:
    """Embedding-space contamination screen — the PARAPHRASE-level
    complement of train_decontaminate_spans' n-gram membership check:
    every corpus document's embedding is scored against the benchmark
    set (vec_id < N_QUERIES stands in for the eval suite) and a
    document whose max cosine reaches SEM_DECON_THRESH_Q is flagged.
    n-gram decontamination misses rewordings; embedding
    decontamination catches them — production pipelines run both.

    IVF-PROBED (round-10 rebuild of the brute-force corpus x benchmark
    scan): each corpus document probes its SEM_DECON_NPROBE nearest
    cells of the stored k-means index and is scored ONLY against
    benchmark vectors assigned to those cells — per-doc cost drops from
    |benchmark| to ~|benchmark| * nprobe / K, the standard IVF recall
    trade (a benchmark vector in an unprobed cell is missed; raise
    nprobe to taste).  The probe assignment is a PURE PROJECTION over
    the K driver-side centroid literals (_probe_sorted_expr — no cross
    join, so NO BroadcastNestedLoopJoin anywhere in this plan, unlike
    the ann_ivf_probe2 probe stage), and the cell match is a broadcast
    equi-join on cid.  Documents with no benchmark vector in any probed
    cell keep their row with the SEM_DECON_NO_CAND_Q sentinel.

    Cross-modal join: vec_id aligns 1:1 with doc_id in the corpus, so
    the flags attach back to the documents table for per-source
    contamination rates.  Scale shape: the per-doc max is a
    map-side-combinable aggregate over the nprobe-way fanout, the
    benchmark cell table is broadcast (eval-suite-sized, never
    corpus-sized), and the doc attach is an equi join on the id
    (bucketable at 100 TB).  max_cos quantized FLOOR * 1e6 — identical
    IEEE expression trees on both engines, full value-hash oracle (the
    DuckDB oracle re-derives the same probed semantics off the inlined
    Lloyd chain)."""
    if nprobe < 1 or nprobe > KMEANS_K:
        raise ValueError(f"nprobe must be in [1, {KMEANS_K}]")
    af = _kmeans_assignments(spark, sf_dir)
    cent = _kmeans_centroids(spark, sf_dir)
    sa = _probe_sorted_expr(cent, "emb")
    picks = ", ".join(f"__sa[{j}].c" for j in range(nprobe))
    cos = _spark_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        f"""
        WITH probed AS (
          SELECT vec_id, emb, nrm, pcid FROM (
            SELECT vec_id, emb, nrm, {sa} AS __sa FROM {af}
          ) t LATERAL VIEW explode(array({picks})) p AS pcid
        ),
        scored AS (
          SELECT /*+ BROADCAST(q) */ c.vec_id, MAX({cos}) AS max_cos
          FROM probed c
          JOIN (SELECT * FROM {af} WHERE vec_id < {N_QUERIES}) q
            ON q.cid = c.pcid AND q.vec_id <> c.vec_id
          GROUP BY c.vec_id
        )
        SELECT /*+ SHUFFLE_HASH(s) */ d.doc_id, d.source,
               CAST(COALESCE(FLOOR(s.max_cos * 1000000),
                             {SEM_DECON_NO_CAND_Q}) AS BIGINT)
                 AS max_cos_q,
               CAST(CASE WHEN FLOOR(s.max_cos * 1000000)
                              >= {thresh_q}
                    THEN 1 ELSE 0 END AS INT) AS contaminated
        FROM (SELECT vec_id FROM {af}) a
        LEFT JOIN scored s ON s.vec_id = a.vec_id
        JOIN documents d ON d.doc_id = a.vec_id
        """
    )


def _semantic_decontaminate_oracle(
    nprobe: int = SEM_DECON_NPROBE,
    thresh_q: int = SEM_DECON_THRESH_Q,
) -> str:
    qdot = _unrolled_dot("a.emb", "c.emb", "duck")
    cos = _duck_cosine("q.emb", "c.emb", "q.nrm", "c.nrm")
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
afm AS MATERIALIZED (SELECT * FROM af),
probed AS (
  SELECT vec_id, emb, nrm, cid AS pcid FROM (
    SELECT a.vec_id, a.emb, a.nrm, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY (c.cc - (2 * ({qdot}))) ASC, c.cid) AS rn
    FROM afm a CROSS JOIN c{KMEANS_ITERS} c
  ) t WHERE rn <= {nprobe}
),
scored AS (
  SELECT c.vec_id, MAX({cos}) AS max_cos
  FROM probed c
  JOIN (SELECT * FROM afm WHERE vec_id < {N_QUERIES}) q
    ON q.cid = c.pcid AND q.vec_id <> c.vec_id
  GROUP BY c.vec_id
)
SELECT d.doc_id, d.source,
       CAST(COALESCE(FLOOR(s.max_cos * 1000000),
                     {SEM_DECON_NO_CAND_Q}) AS BIGINT) AS max_cos_q,
       CAST(CASE WHEN FLOOR(s.max_cos * 1000000)
                      >= {thresh_q}
            THEN 1 ELSE 0 END AS INTEGER) AS contaminated
FROM (SELECT vec_id FROM afm) a
LEFT JOIN scored s ON s.vec_id = a.vec_id
JOIN documents d ON d.doc_id = a.vec_id
"""


def ann_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-K per query over the STORED PQ code table."""
    v = _normed(spark, sf_dir)
    view = _pq_codes_view(spark, sf_dir)
    return spark.sql(
        f"""
        WITH {_pq_stored_prelude(v, view)},
        {_pq_search_body('spark').format(v=v)}
        """
    )


def _pq_search_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
{_pq_codes_ctes('duck', 'v')},
{_pq_search_body('duck').format(v='v')}
"""


# ---------------------------------------------------------------------------
# IVF index balance report: per-cell population plus how much of the
# cell a capped probe actually searches (IVF_CELL_CAP) — the operational
# health check of any IVF deployment (skewed cells = slow probes AND
# degraded recall; this is what you alert on before re-training the
# quantizer).  K rows of exact integers over the stored assignment
# index; the aggregate is map-side combinable on the cid partitioning
# the index is already stored in.
# ---------------------------------------------------------------------------


def ann_ivf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-IVF-cell population and searched-candidate count."""
    af = _kmeans_assignments(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT cid, COUNT(*) AS n_vecs,
               LEAST(COUNT(*), {IVF_CELL_CAP}) AS n_searched,
               MIN(vec_id) AS min_vec_id, MAX(vec_id) AS max_vec_id
        FROM {af} GROUP BY cid
        """
    )


def _ivf_stats_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')}
SELECT CAST(cid AS INTEGER) AS cid, COUNT(*) AS n_vecs,
       LEAST(COUNT(*), {IVF_CELL_CAP}) AS n_searched,
       MIN(vec_id) AS min_vec_id, MAX(vec_id) AS max_vec_id
FROM af GROUP BY cid
"""


# ---------------------------------------------------------------------------
# Incremental index maintenance: a 100 TB vector store doesn't retrain
# its coarse quantizer per ingest batch — new vectors are assigned to
# the FROZEN centroids, and a per-cell drift report decides when a
# retrain is due (a cell whose incoming share diverges from its stored
# share signals distribution shift).  The "incoming batch" is a
# deterministic slice of the corpus (vec_id % INC_MOD == INC_REM);
# assignment is a pure function of (emb, centroids), so the stored
# index already carries the batch's cells — the lane is then ONE
# aggregate over the checkpointed assignment index, with ppm shares by
# window totals over K rows.  All outputs are exact integers.
# ---------------------------------------------------------------------------

INC_MOD = 10
INC_REM = 7  # vec_id % INC_MOD == INC_REM -> the incoming batch


def _inc_assign_agg(dialect: str) -> str:
    div = "DIV" if dialect == "spark" else "//"
    cid = "cid" if dialect == "spark" else "CAST(cid AS INTEGER)"
    return f"""
SELECT {cid} AS cid,
       CAST(SUM(CASE WHEN vec_id % {INC_MOD} = {INC_REM} THEN 0 ELSE 1
                END) AS BIGINT) AS n_index,
       CAST(SUM(CASE WHEN vec_id % {INC_MOD} = {INC_REM} THEN 1 ELSE 0
                END) AS BIGINT) AS n_new,
       (1000000 * CAST(SUM(CASE WHEN vec_id % {INC_MOD} = {INC_REM}
                           THEN 0 ELSE 1 END) AS BIGINT))
         {div} CAST(SUM(SUM(CASE WHEN vec_id % {INC_MOD} = {INC_REM}
                            THEN 0 ELSE 1 END)) OVER () AS BIGINT)
         AS index_share_ppm,
       (1000000 * CAST(SUM(CASE WHEN vec_id % {INC_MOD} = {INC_REM}
                           THEN 1 ELSE 0 END) AS BIGINT))
         {div} CAST(SUM(SUM(CASE WHEN vec_id % {INC_MOD} = {INC_REM}
                            THEN 1 ELSE 0 END)) OVER () AS BIGINT)
         AS new_share_ppm
"""


def ann_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell drift report: incoming-batch share vs stored share."""
    af = _kmeans_assignments(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT cid, n_index, n_new, index_share_ppm, new_share_ppm,
               new_share_ppm - index_share_ppm AS drift_ppm
        FROM ({_inc_assign_agg('spark')} FROM {af} GROUP BY cid) t
        """
    )


def _inc_assign_oracle() -> str:
    return f"""
WITH {_duck_v_cte()},
{_kmeans_ctes('v', 'duck')},
agg AS ({_inc_assign_agg('duck')} FROM af GROUP BY cid)
SELECT cid, n_index, n_new, index_share_ppm, new_share_ppm,
       new_share_ppm - index_share_ppm AS drift_ppm
FROM agg
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ann_filtered_search": ann_filtered_search,
        "ann_incremental_assign": ann_incremental_assign,
        "ann_pq_encode": ann_pq_encode,
        "ann_pq_search": ann_pq_search,
        "ann_ivf_pq": ann_ivf_pq,
        "ann_ivf_pq_residual": ann_ivf_pq_residual,
        "ann_pq_residual_recall": ann_pq_residual_recall,
        "ann_mrl_rerank": ann_mrl_rerank,
        "ann_ivf_pq_trained": ann_ivf_pq_trained,
        "ann_pq_recall": ann_pq_recall,
        "ann_mrl_recall": ann_mrl_recall,
        "ann_pagerank": ann_pagerank,
        "ann_triangles": ann_triangles,
        "ann_kcore": ann_kcore,
        "embeddings_top_pc": embeddings_top_pc,
        "embeddings_top_pc2": embeddings_top_pc2,
        "embeddings_top_pcs": embeddings_top_pcs,
        "embeddings_abtt": embeddings_abtt,
        "embeddings_whiten": embeddings_whiten,
        "dedup_cos_threshold_curve": dedup_cos_threshold_curve,
        "ann_k_recall_curve": ann_k_recall_curve,
        "embeddings_pc_project": embeddings_pc_project,
        "ann_ivf_stats": ann_ivf_stats,
        "ann_outliers": ann_outliers,
        "ann_recall_eval": ann_recall_eval,
        "ann_mrr": ann_mrr,
        "ann_knn_graph": ann_knn_graph,
        "train_contrastive_triplets": train_contrastive_triplets,
        "embeddings_quantize": embeddings_quantize,
        "embeddings_dim_stats": embeddings_dim_stats,
        "ann_bruteforce": ann_bruteforce,
        "ann_sq_search": ann_sq_search,
        "ann_sq_recall": ann_sq_recall,
        "ann_semantic_decontaminate": ann_semantic_decontaminate,
        "ann_ivf_label": ann_ivf_label,
        "ann_ivf_kmeans": ann_ivf_kmeans,
        "ann_ivf_probe2": ann_ivf_probe2,
        "ann_ivf_probe3_k5": ann_ivf_probe3_k5,
        "ann_nprobe_recall_curve": ann_nprobe_recall_curve,
        "ann_pq_nprobe_curve": ann_pq_nprobe_curve,
        "ann_pq_m_curve": ann_pq_m_curve,
        "ann_lsh_hyperplane": ann_lsh_hyperplane,
        "ann_rerank": ann_rerank,
        "dedup_embedding": dedup_embedding,
        "dedup_semantic_cluster": dedup_semantic_cluster,
    }


def oracles() -> dict[str, str]:
    return {
        "ann_filtered_search": _filtered_search_oracle(),
        "ann_incremental_assign": _inc_assign_oracle(),
        "ann_outliers": _outliers_oracle(),
        "ann_pq_encode": _pq_encode_oracle(),
        "ann_pq_search": _pq_search_oracle(),
        "ann_ivf_pq": _ivf_pq_oracle(),
        "ann_ivf_pq_residual": _ivf_pq_residual_oracle(),
        "ann_pq_residual_recall": _pq_residual_recall_oracle(),
        "ann_mrl_rerank": _mrl_rerank_oracle(),
        "ann_ivf_pq_trained": _ivf_pq_trained_oracle(),
        "ann_pq_recall": _pq_recall_oracle(),
        "ann_mrl_recall": _mrl_recall_oracle(),
        "ann_pagerank": _pagerank_oracle(),
        "ann_triangles": _triangles_oracle(),
        "ann_kcore": _kcore_oracle(),
        "embeddings_top_pc": _top_pc_oracle(),
        "embeddings_top_pc2": _top_pc2_oracle(),
        "embeddings_top_pcs": _top_pcs_oracle(),
        "embeddings_abtt": _abtt_oracle(),
        "embeddings_whiten": _whiten_oracle(),
        "dedup_cos_threshold_curve": _cos_curve_oracle(),
        "ann_k_recall_curve": _k_recall_oracle(),
        "embeddings_pc_project": _pc_project_oracle(),
        "ann_ivf_stats": _ivf_stats_oracle(),
        "ann_recall_eval": _recall_eval_oracle(),
        "ann_mrr": _mrr_oracle(),
        "ann_knn_graph": f"WITH {_duck_v_cte()}\n{_knn_graph_body()}",
        "train_contrastive_triplets": _triplet_oracle(),
        "embeddings_quantize": _quantize_oracle(),
        "embeddings_dim_stats": _DIM_STATS_ORACLE,
        "ann_bruteforce": _bruteforce_oracle(),
        "ann_sq_search": _sq_search_oracle(),
        "ann_sq_recall": _sq_recall_oracle(),
        "ann_semantic_decontaminate": _semantic_decontaminate_oracle(),
        "ann_ivf_label": _ivf_oracle(),
        "ann_ivf_kmeans": _ivf_kmeans_oracle(),
        "ann_ivf_probe2": _ivf_probe2_oracle(),
        "ann_ivf_probe3_k5": _ivf_probe3_k5_oracle(),
        "ann_nprobe_recall_curve": _nprobe_curve_oracle(),
        "ann_pq_nprobe_curve": _pq_nprobe_curve_oracle(),
        "ann_pq_m_curve": _pq_m_curve_oracle(),
        "ann_lsh_hyperplane": _lsh_oracle(),
        "ann_rerank": _rerank_oracle(),
        "dedup_embedding": _dedup_embedding_oracle(),
        "dedup_semantic_cluster": _semantic_cluster_oracle(),
    }
