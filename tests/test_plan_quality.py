"""Physical-plan quality gates.

Correctness tests prove the answers match; these prove the *plans* are
the ones that survive a 100x scale-up: column pruning reaching the
parquet scan, predicate pushdown on hub reads, broadcast joins for
dimension hubs, and whole-stage codegen over the rule pipeline.  A
regression here is a silent 10x at 100 TB even while every oracle stays
green.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from dataforge_core_spark.loader import load_project
from dataforge_core_spark.runner import ProjectRunner
from dataforge_core_spark.sources.readers import read_source

PROJ = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "projects", "tpch_demo"
)


@pytest.fixture(scope="module")
def project():
    return load_project(PROJ)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_scan_prunes_to_declared_columns(project, spark, sf_dir):
    """read_source projects only declared raw attributes — the parquet
    ReadSchema must not include undeclared columns (o_comment exists in
    the file but is not declared by the demo project)."""
    src = project.source_by_name()["tpch_orders"]
    df = read_source(spark, src, {"DATA_DIR": sf_dir})
    plan = _plan(df)
    assert "ReadSchema" in plan
    assert "o_comment" not in plan


def test_filter_pushdown_on_materialized_hub(project, spark, sf_dir):
    """An output-channel-style filter over a parquet hub must reach the
    scan as a pushed filter, not sit in a post-scan Filter only."""
    r = ProjectRunner(spark, project, {"DATA_DIR": sf_dir})
    out_dir = tempfile.mkdtemp(prefix="dfspark_plan_")
    paths = r.materialize(out_dir)
    hub = spark.read.parquet(paths["enriched_customer"])
    filtered = hub.filter("c_acctbal > 1000").select("c_custkey")
    plan = _plan(filtered)
    assert "PushedFilters: [" in plan
    assert "c_acctbal" in plan.split("PushedFilters")[1].split("]")[0]


def test_dimension_lookup_broadcasts(project, spark, sf_dir):
    """M-1 lookups against small dimension hubs must be broadcast joins —
    no shuffle of the fact side.  Asserted on the materialized-hub path
    (the production mode: hubs are parquet assets with accurate size
    stats, so Catalyst's broadcast decisions are driven by real file
    sizes, not plan-tree estimates)."""
    from dataforge_core_spark.sources.readers import read_source

    r = ProjectRunner(spark, project, {"DATA_DIR": sf_dir})
    out_dir = tempfile.mkdtemp(prefix="dfspark_bj_")
    paths = r.materialize(out_dir)
    by_name = project.source_by_name()
    hubs = {
        s.source_name: spark.read.parquet(paths[s.target_table])
        for s in project.sources
        if not s.sub_source_parent and s.processing_type != "stream"
    }
    src = by_name["tpch_lineitem"]
    base = read_source(spark, src, {"DATA_DIR": sf_dir})
    df = r.compiler.compile_source(src, base, hubs)
    plan = _plan(df)
    # dimension lookups (supplier incl. the CAST theta key, orders,
    # nation, region) broadcast
    assert plan.count("BroadcastHashJoin") >= 4
    assert "BroadcastHashJoin [cast(" in plan  # theta key still BHJ
    # the only joins allowed to sort-merge are fact-to-fact: the
    # multi-hop chain through orders (fact-sized at scale) keyed on
    # orderkey.  A SMJ on any dimension key would be a regression.
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "orderkey" in line, f"dimension-key SMJ: {line}"


def test_rule_pipeline_stays_in_codegen(project, spark, sf_dir):
    """Derived-column rules compile to F.expr over built-ins — the hub
    projection must sit inside WholeStageCodegen spans (no Python/UDF
    eval nodes in the pipeline)."""
    r = ProjectRunner(spark, project, {"DATA_DIR": sf_dir}, persist_hubs=False)
    hubs = r.build()
    df = hubs["tpch_supplier"]
    # AQE only reveals codegen spans in the finalized plan — execute the
    # dataframe's own query execution first (a write would spawn a fresh
    # QueryExecution and leave this one un-finalized).  In the simple
    # explain, '*(n)' stars mark WholeStageCodegen membership.
    df.collect()
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = qe.explainString(mode)
    assert "isFinalPlan=true" in plan
    assert "*(" in plan, "no whole-stage-codegen span in the hub pipeline"
    for bad in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert bad not in plan


def test_aggregate_rewrite_is_partial_final(project, spark, sf_dir):
    """Decorrelated aggregate lookups (J5) must compile to hash
    aggregates with a partial stage (map-side combine) — not a bare
    shuffle of raw rows."""
    r = ProjectRunner(spark, project, {"DATA_DIR": sf_dir}, persist_hubs=False)
    hubs = r.build()
    plan = _plan(hubs["tpch_customer"])
    assert "HashAggregate" in plan
    assert "partial" in plan.lower()


def test_ann_search_reads_checkpointed_index(spark):
    """The IVF search must scan the materialized (localCheckpoint-ed)
    index, never re-derive the Lloyd chain: a Window or embeddings
    FileScan inside the search plan means the index cache was bypassed
    (the lazy-persist regression fixed in round 2)."""
    from dataforge_core_spark.operators import similarity as S

    sf = "/root/testdata/sf0.001"
    df = S.ann_ivf_kmeans(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan, "search does not read the index RDD"
    assert "parquet" not in plan.lower(), (
        "search plan re-reads embeddings parquet — index checkpoint bypassed"
    )
    # exactly the ranking window of the search itself, not Lloyd argmins —
    # and the top-k filter MUST execute as WindowGroupLimit (partial +
    # final): 0 means a CAST or projection between Filter and Window is
    # defeating InferWindowGroupLimit again and every per-query candidate
    # list is fully materialized before ranking (the round-2 regression)
    assert 1 <= plan.count("WindowGroupLimit") <= 2


def test_top_tokens_limit_pushed_below_window(spark):
    """train_top_tokens' global rank must NOT move the full vocabulary to
    one partition: with the rank filter on the bare ROW_NUMBER attribute,
    LimitPushDownThroughWindow turns it into TakeOrderedAndProject(100)
    below the Window (bounded per-partition heaps, 100-row final merge).
    The round-2 form (CAST between Filter and Window) defeated both this
    rule and InferWindowGroupLimit — at 100 TB that plan funnels billions
    of distinct tokens through a single WindowExec partition."""
    from dataforge_core_spark.operators import training as T

    df = T.train_top_tokens(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, (
        "top-K window is unbounded: full vocabulary on one partition"
    )


def test_ranked_ann_windows_group_limit(spark):
    """Every ann_* per-query ranking window must execute with
    WindowGroupLimit (rank filter on the bare ROW_NUMBER attribute)."""
    from dataforge_core_spark.operators import similarity as S

    sf = "/root/testdata/sf0.001"
    for name, fn in [
        ("ann_bruteforce", S.ann_bruteforce),
        ("ann_ivf_label", S.ann_ivf_label),
        ("ann_lsh_hyperplane", S.ann_lsh_hyperplane),
        ("ann_rerank", S.ann_rerank),
    ]:
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("WindowGroupLimit") >= 1, (
            f"{name}: ranking window has no WindowGroupLimit"
        )


# queries whose plans are cheap to derive (no eager driver-side loops /
# streaming execution at construction time); ann_bruteforce is the one
# intentional all-pairs shapes: ann_bruteforce's re-rank stage scans the
# corpus against a broadcast query set (BroadcastNestedLoopJoin on
# q.vec_id <> c.vec_id); ann_ivf_probe2's probe assignment cross-joins
# the query set against the K=8-row checkpointed centroid table (always
# broadcast, K rows) before the cid-keyed equi-join search
# ann_recall_eval embeds ann_bruteforce as its exact side, so it carries
# the same intentional BNLJ
_CARTESIAN_EXEMPT = {
    "ann_bruteforce",
    # intentional: same broadcast-query all-pairs shape as
    # ann_bruteforce, over the 4x-smaller stored SQ8 code table
    # (the recall eval embeds both the SQ and the exact side)
    "ann_sq_search",
    "ann_sq_recall",
    # NOTE (r10): the IVF probe family (ann_ivf_probe2/probe3_k5,
    # ann_filtered_search, ann_nprobe_recall_curve, and the
    # semantic-decontamination screen) moved OFF this list — their
    # probe assignment is now a literal projection over the K
    # driver-side centroids (_probe_sorted_expr), not a broadcast
    # cross join, so they plan with zero BroadcastNestedLoopJoins.
    "ann_recall_eval",
    # intentional: PQ codebook is a PQ_K-row broadcast relation, and the
    # ADC LUT build is a (queries x subspaces x codewords) cross join of
    # three tiny broadcast relations (N_QUERIES*PQ_M*PQ_K = 1024 rows)
    "ann_pq_encode",
    "ann_pq_search",
    "ann_pq_recall",
    "ann_ivf_pq",
    # intentional: same PQ shapes in residual space — the encode side
    # cross-joins the corpus against the PQ_K-row residual codebook,
    # the LUT against two tiny broadcast relations; the centroid join
    # is an 8-row broadcast equi-join on cid
    "ann_ivf_pq_residual",
    # intentional: the trained-codebook lane carries the same
    # tiny-broadcast LUT cross join in residual space
    "ann_ivf_pq_trained",
    # intentional: embeds ALL THREE ADC variants above, so it carries
    # their tiny-broadcast LUT/codebook cross joins
    "ann_pq_residual_recall",
    # intentional: the exact-baseline side of the Matryoshka recall
    # eval is the same all-pairs shape as ann_bruteforce
    "ann_mrl_recall",
    # intentional: the two-stage MRL eval's prefix scan + exact
    # baseline are the same all-pairs eval shape
    "ann_mrl_rerank",
    # intentional: MRR ranks the same broadcast-query all-pairs scan
    "ann_mrr",
    # intentional: each PQ_M_GRID block encodes the corpus against the
    # PQ_K=16-row broadcast codebook — the same tiny-broadcast encode
    # cross join as ann_pq_encode, repeated once per grid point
    "ann_pq_m_curve",
}


def test_no_cartesian_products_in_driver_queries(spark):
    """No driver query may plan a CartesianProduct, and only the
    explicitly exempted all-pairs shapes may BroadcastNestedLoopJoin —
    an accidental non-equi join is a silent 100x at scale."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    skip_prefixes = ("stream_", "engine_", "dedup_cluster")
    for name, fn in e.queries().items():
        if name.startswith(skip_prefixes):
            continue  # eager side-effects at construction; covered elsewhere
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        if name not in _CARTESIAN_EXEMPT:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name}: unexpected nested-loop join"
            )


def test_semantic_decontaminate_is_probed_not_brute(spark):
    """Round-10 rebuild gate: ann_semantic_decontaminate must ride the
    IVF index — probe assignment as a literal projection (no
    BroadcastNestedLoopJoin against the benchmark set anywhere) and the
    benchmark cell match as a broadcast HASH equi-join.  A regression
    to the corpus x full-benchmark scan reintroduces a per-doc cost
    linear in |benchmark| (10^5+ prompts in a real eval suite)."""
    import dataforge_core_spark.operators.similarity as S

    df = S.ann_semantic_decontaminate(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, "full-bench NLJ is back"
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "bench cell match not broadcast"
    assert "Generate" in plan, "probe fanout (explode) missing"


def _walk_physical(node):
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        # AQE root has no children(); its current plan hangs off
        # executedPlan (finalized or not, this is the live tree)
        yield from _walk_physical(node.executedPlan())
        return
    yield node
    if cls in ("ShuffleQueryStageExec", "BroadcastQueryStageExec"):
        yield from _walk_physical(node.plan())
        return
    for i in range(node.children().length()):
        yield from _walk_physical(node.children().apply(i))


def test_global_windows_only_over_aggregated_relations(spark):
    """Every partition-less WindowExec in the driver registry (global
    ROW_NUMBER ranks: top-token/vocab lanes) must consume an ALREADY
    AGGREGATED (or top-K-limited) relation — a global window funnels its
    whole input through one partition, which is bounded for a
    vocabulary/top-K relation but a 100 TB funnel if one ever lands on a
    corpus-shaped input.  Walks the executed plan tree: any WindowExec /
    WindowGroupLimitExec with an empty partitionSpec must have an
    Aggregate or TakeOrdered node somewhere BELOW it."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    bounded = {
        "HashAggregateExec",
        "SortAggregateExec",
        "ObjectHashAggregateExec",
        "TakeOrderedAndProjectExec",
        "CollectLimitExec",
        "GlobalLimitExec",
        "LocalTableScanExec",  # literal/fitted index artifacts
        "RDDScanExec",  # checkpointed (already-bounded) index frames
    }
    skip_prefixes = ("stream_", "engine_", "dedup_cluster")
    hits = 0
    for name, fn in e.queries().items():
        if name.startswith(skip_prefixes):
            continue  # eager side-effects at construction; covered elsewhere
        root = fn(spark, sf)._jdf.queryExecution().executedPlan()
        for node in _walk_physical(root):
            cls = node.getClass().getSimpleName()
            if cls not in ("WindowExec", "WindowGroupLimitExec"):
                continue
            if not node.partitionSpec().isEmpty():
                continue
            hits += 1
            sub = {
                n.getClass().getSimpleName()
                for n in _walk_physical(node)
            }
            assert sub & bounded, (
                f"{name}: global window over a non-aggregated relation "
                f"(subtree: {sorted(sub)})"
            )
    assert hits >= 2, "expected the known global-rank lanes to be walked"


def test_simhash_signature_integer_bits(spark):
    """The 64 simhash bit extractions must be integer shift/AND over two
    pre-parsed md5 halves, inside a partial+final hash aggregate.  A
    string-walk form (instr/substr per bit) in the plan means the r3
    per-token regression is back: 64 string scans per exploded token.
    Inspected on the BUILD plan (_sig_build_df): the served relation is
    a checkpoint whose scan hides the aggregate (r15)."""
    from dataforge_core_spark.operators import simhash as S

    plan = (
        S._sig_build_df(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "instr" not in plan, "per-bit string walk back in the hot path"
    assert "HashAggregate" in plan
    assert "partial" in plan.lower(), "no map-side combine on signature agg"


def test_simhash_signature_served_from_stored_relation(spark):
    """The signature LANE must serve the stored (narrow-built,
    checkpointed) relation — a scan, no aggregate: re-deriving the
    64-SUM pipeline per query is the pre-r13 shape, and a wide re-plan
    would also undo the width-8 index sizing that keeps the pairs
    lane's task count proportional to the ~n_docs-row relation (r15 —
    the r13 'fast stamps' were this shape by scheduling accident)."""
    from dataforge_core_spark.operators import simhash as S

    df = S.dedup_simhash(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, "signature lane not serving the checkpoint"
    assert "HashAggregate" not in plan, "signature lane re-deriving per query"
    assert df.rdd.getNumPartitions() <= 8, (
        "stored signature relation not narrow-built"
    )


def test_simhash_pairs_bucket_salted(spark):
    """The simhash band self-join must carry the oversized-bucket salt:
    a 16-bit block key space is 65536 buckets REGARDLESS of corpus size,
    so without the salt conjunct a hot block goes quadratic at scale.
    The heavy-bucket relation must attach via broadcast (its cardinality
    is bounded by the block key space, never the corpus)."""
    from dataforge_core_spark.operators import simhash as S

    plan = (
        S.dedup_simhash_pairs(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "salt" in plan, "band join lost the bucket-salt conjunct"
    assert "BroadcastHashJoin" in plan, "heavy-bucket attach not broadcast"


def test_multimodal_decode_single_python_pass(spark):
    """The synth and decode stages must stay FUSED into one mapInPandas
    pass — two MapInPandas nodes means the intermediate payload batches
    round-trip through Arrow twice (the r3 perf regression)."""
    from dataforge_core_spark.operators import multimodal as M

    plan = (
        M.multimodal_decode(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1


def test_asof_order_is_joinless_single_window(spark):
    """The as-of join must stay in its union + running-MAX-window form:
    one shuffle keyed by user, no events-x-orders join whose fan-out a
    hot user multiplies (events*orders rows instead of events+orders)."""
    from dataforge_core_spark.operators import events as E

    plan = (
        E.events_asof_order(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, "as-of regressed to the join+argmax form"
    assert plan.count("Window") >= 1
    assert "Union" in plan


def test_chunk_has_no_exchange(spark):
    """train_chunk is pure per-row array arithmetic — ANY Exchange in
    its plan means the chunking stopped being scan-side."""
    from dataforge_core_spark.operators import training as T

    plan = (
        T.train_chunk(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, "train_chunk plans a shuffle"


def test_cap_and_tfidf_window_group_limit(spark):
    """Per-group top-K rank filters must lower to WindowGroupLimit so
    hot groups carry K rows into the window, not their full count."""
    from dataforge_core_spark.operators import text as X
    from dataforge_core_spark.operators import training as T

    for name, fn in [
        ("train_cap_per_source", T.train_cap_per_source),
        ("text_tfidf", X.text_tfidf),
    ]:
        plan = (
            fn(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "WindowGroupLimit" in plan, f"{name}: unbounded rank window"


def test_outliers_broadcast_and_group_limit(spark):
    """ann_outliers: the |labels|-row centroid relation must broadcast
    onto the corpus scan (no corpus-side shuffle for the join) and the
    per-label top-K must lower to WindowGroupLimit."""
    from dataforge_core_spark.operators import similarity as S

    plan = (
        S.ann_outliers(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, "centroid join is not broadcast"
    assert "WindowGroupLimit" in plan, "outlier rank window unbounded"


def test_mix_domains_scan_side_filter(spark):
    """train_mix_domains: the |domains|-row rate relation broadcasts and
    the total is a scalar subquery — a 1-row CROSS JOIN would plan a
    BroadcastNestedLoopJoin; the keep filter stays scan-side."""
    from dataforge_core_spark.operators import training as T

    plan = (
        T.train_mix_domains(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_anomaly_stats_side_aggregated(spark):
    """events_anomaly: the per-user stats side must be an aggregate
    (partial+final) joined back by user_id — no window over raw events
    (a window would re-sort the full event stream per user)."""
    from dataforge_core_spark.operators import events as E

    plan = (
        E.events_anomaly(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in plan
    assert "WindowExec" not in plan and "Window\n" not in plan


def test_span_corruption_has_no_exchange(spark):
    """train_span_corruption is pure scan-side explode+filter — ANY
    Exchange means the mask generation stopped running at scan speed."""
    from dataforge_core_spark.operators import training as T

    plan = (
        T.train_span_corruption(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, "span corruption plans a shuffle"


def test_gopher_rules_scan_shaped(spark):
    """text_gopher_rules is a pure scalar rule battery — it must ride
    the corpus scan: no Exchange, no Join, no Generate (token explode),
    and no interpreted array lambdas (the alpha-token count is a
    regexp_count precisely so the battery stays in codegen)."""
    from dataforge_core_spark.operators import text as X

    plan = (
        X.text_gopher_rules(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, "gopher battery plans a shuffle"
    assert "Join" not in plan, "gopher battery plans a join"
    assert "Generate" not in plan, "gopher battery explodes tokens"


def test_decontaminate_bench_set_broadcasts(spark):
    """train_decontaminate_spans: the benchmark shingle-hash membership
    check must be a BROADCAST semi join (the bench set is proportional
    to the eval suite, not the corpus) — a shuffled semi join would
    reshuffle every corpus shingle at 100 TB."""
    from dataforge_core_spark.operators import training as T

    plan = (
        T.train_decontaminate_spans(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    semi = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
    assert semi, "bench membership not planned as a semi join"
    assert all("BroadcastHashJoin" in ln for ln in semi), (
        "bench semi join is shuffled, not broadcast"
    )


def test_corpus_pipeline_no_self_join(spark):
    """train_corpus_pipeline computes pass_neardup in ONE window pass
    over base (ordered is_dup ASC first) — the old filtered-rank +
    LEFT-join-back shape planned a corpus x corpus SortMergeJoin (r15
    opt round).  dedup_substring_clean's per-doc lens ⋈ pack join must
    be a hash join, not sort-merge, and its doc-keyed collect_list
    pack must shuffle plain rows (complete-mode ObjectHashAggregate
    after its exchange)."""
    from dataforge_core_spark.operators import dedup as D
    from dataforge_core_spark.operators import training as T

    sf = "/root/testdata/sf0.001"
    pipe = _plan(T.train_corpus_pipeline(spark, sf))
    assert "SortMergeJoin" not in pipe, (
        "corpus_pipeline re-grew the corpus-scale self-join"
    )
    sub = _plan(D.dedup_substring_clean(spark, sf))
    assert "SortMergeJoin" not in sub, (
        "substring_clean lens ⋈ pack fell back to sort-merge"
    )


def test_decon_shingles_are_scan_side(spark):
    """train_decontaminate_spans builds its 3-token shingles scan-side
    (posexplode + in-bounds subscripts + immediate 56-bit hash), NOT
    via lead() windows: the window formulation shuffled and sorted the
    ENTIRE exploded corpus by doc_id — once per consuming branch —
    just to read the next two tokens (r15 opt round, guide §2.4; the
    hash projects to a BIGINT before anything shuffles).  The plan
    must carry no lead(); the two surviving windows are the
    gaps-and-islands pass over collision hits only.  (train_repetition
    deliberately KEEPS its lead() window: there the group-by key is
    the trigram STRING, and the window shape ships narrow tokens
    across the exchange instead — measured 25% faster; see the
    operator comment.)"""
    from dataforge_core_spark.operators import training as T

    dec = _plan(T.train_decontaminate_spans(spark, "/root/testdata/sf0.001"))
    # scoped to the windowed-shingle signature, not a bare "lead(" over
    # the whole plan (r15 advice: a future legitimate lead() elsewhere
    # — e.g. in the gaps-and-islands pass — would trip a global match):
    # the regression this targets is lead(tk, ...) over the exploded
    # token rows, and the island windows never touch a tk column.
    assert "lead(tk" not in dec, (
        "decon shingles re-grew the lead() window over the exploded "
        "corpus"
    )
    # also bound the window count itself: scan-side shingles leave
    # exactly the two gaps-and-islands windows (running MAX + running
    # SUM over collision hits)
    assert dec.count("Window") <= 4, (  # formatted tree prints each once
        "extra Window operators appeared in the decon plan"
    )


def test_tfidf_single_tokenize_pass(spark):
    """text_tfidf: the df branch must reuse the tf branch's exchange
    (one corpus tokenize, not one per CTE reference) — the tf GROUP BY
    is keyed (term, doc_id) to match the shuffle order the df branch
    plans and df's aggregate is written so column pruning cannot strip
    the count from the inlined copy, making the two exchange subtrees
    identical.  AQE applies the reuse at stage materialization, so the
    gate executes the query and reads the FINAL adaptive plan."""
    from dataforge_core_spark.operators import text as X

    df = X.text_tfidf(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, (
        "df branch re-tokenizes the corpus instead of reusing the tf "
        "exchange"
    )
    # exactly one Generate (explode) in the FINAL plan — diagnoses a
    # reuse regression precisely (r15 advice): if a Spark upgrade stops
    # the exchange reuse, the second tokenize shows up as a second
    # Generate even before ReusedExchange disappears.  The adaptive
    # plan string interleaves "== Initial Plan ==" sections (one per
    # AdaptiveSparkPlan, including scalar subqueries), so track the
    # section markers line-by-line and count only final-plan lines.
    # A section's extent is its indentation: content sits deeper than
    # the marker, and a shallower line ends it (nested subquery plans
    # carry their own markers mid-tree).
    n_gen = 0
    initial_indents = []  # indents of open "Initial Plan" sections
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip())
        while initial_indents and indent <= initial_indents[-1]:
            initial_indents.pop()
        if "== Initial Plan ==" in line:
            initial_indents.append(indent)
        elif not initial_indents and "Generate " in line:
            n_gen += 1
    assert n_gen == 1, (
        f"expected exactly one tokenize Generate, found {n_gen}"
    )


def test_vocab_top_v_is_take_ordered(spark):
    """train_tokenizer_vocab's global top-V must plan as
    TakeOrderedAndProject (per-partition heap of V) — a global Sort of
    the whole vocabulary is the 100 TB failure mode."""
    from dataforge_core_spark.operators import text as X

    plan = (
        X.train_tokenizer_vocab(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, "vocab top-V is a global sort"


def test_range_join_is_equi_bucketed(spark):
    """events_range_join must execute as an equi join on the
    (user, hour-bucket) keys — the banded form.  A raw inequality join
    would plan BroadcastNestedLoopJoin (per-user cross products)."""
    from dataforge_core_spark.operators import events as E

    plan = (
        E.events_range_join(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), "range join lost its equi-join form"


def test_shard_assign_partial_final(spark):
    """train_shard_assign is one map-side-combinable aggregate."""
    from dataforge_core_spark.operators import training as T

    plan = (
        T.train_shard_assign(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in plan and "partial" in plan.lower()


def test_pq_search_lut_broadcast_and_group_limit(spark):
    """ann_pq_search: the N_QUERIES*PQ_M*PQ_K-row distance LUT must
    broadcast onto the codes relation (a SortMergeJoin here shuffles the
    whole index on a 128-value key — guaranteed skew at scale), the ADC
    reduce must be partial/final, and the per-query top-K must lower to
    WindowGroupLimit."""
    from dataforge_core_spark.operators import similarity as S

    plan = (
        S.ann_pq_search(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, "ADC LUT join is not broadcast"
    assert "SortMergeJoin" not in plan, "codes side shuffled on (m, code)"
    assert "partial_max" in plan, "ADC pivot not map-side combined"
    assert "WindowGroupLimit" in plan, "per-query top-K window unbounded"


def test_ivf_pq_all_joins_broadcast(spark):
    """ann_ivf_pq: probe (queries->cells), candidate->codes, and
    codes->LUT joins must ALL be broadcast — the stored codes relation
    (corpus-sized at scale) must never shuffle for a per-query probe."""
    from dataforge_core_spark.operators import similarity as S

    plan = (
        S.ann_ivf_pq(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3, "IVF-PQ join not broadcast"
    assert "SortMergeJoin" not in plan, "corpus-side shuffle in IVF-PQ path"
    assert "WindowGroupLimit" in plan, "per-query top-K window unbounded"


def test_pc_project_join_free_partial_final(spark):
    """embeddings_pc_project: the projection must be ONE join-free
    aggregate over the checkpointed component relation with the fitted
    direction folded in as a literal array — any Join node means the
    fit leaked back into the per-query path."""
    from dataforge_core_spark.operators import similarity as S

    plan = (
        S.embeddings_pc_project(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, "pc_project plans a join"
    assert "HashAggregate" in plan and "partial" in plan.lower(), (
        "projection aggregate not map-side combined"
    )


def test_graph_lanes_reuse_checkpointed_edges(spark):
    """ann_pagerank / ann_triangles must read the kNN edge list from
    the checkpointed index (an ExistingRDD scan), not re-run the
    bucket-keyed kNN join per query."""
    from dataforge_core_spark.operators import similarity as S

    for fn in (S.ann_pagerank, S.ann_triangles):
        plan = (
            fn(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ExistingRDD" in plan, f"{fn.__name__}: edges recomputed"
        assert "Parquet" not in plan, (
            f"{fn.__name__}: re-scans the corpus instead of the edge index"
        )


def test_dsir_reads_stored_buckets_broadcast_model(spark):
    """train_dsir_weights must serve BOTH passes (model build +
    scoring) from the checkpointed feature-bucket relation — zero
    feature explodes and zero corpus scans in the lane plan (the
    explode runs once, inside the index build; pre-r13 each execution
    re-ran it twice).  The B-row model side must broadcast; the
    smoothing totals must come from a window over the model relation,
    not another corpus scan."""
    from dataforge_core_spark.operators import training as TR

    plan = (
        TR.train_dsir_weights(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_gen = sum(
        1 for ln in plan.splitlines() if ln.strip("+- :*()").startswith("Generate")
    )
    assert n_gen == 0, f"feature explode evaluated {n_gen}x (want 0)"
    assert "Parquet" not in plan, "lane re-scans the corpus"
    assert plan.count("Scan ExistingRDD") == 2, (
        "model + scoring must each read the stored bucket relation"
    )
    assert "BroadcastHashJoin" in plan, "bucket-model join not broadcast"
    assert "SortMergeJoin" not in plan, "corpus shuffled against B-row model"


def test_quality_linear_is_scan_shaped(spark):
    """text_quality_linear: weights are a pure function of the hashed
    bucket, so the whole scorer must be scan-side — no Join node, one
    partial/final doc-keyed aggregate."""
    from dataforge_core_spark.operators import text as TX

    plan = (
        TX.text_quality_linear(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, "quality scorer plans a join"
    assert "HashAggregate" in plan and "partial" in plan.lower(), (
        "doc aggregate not map-side combined"
    )


def test_bpe_encode_joins_stored_vocab(spark):
    """train_bpe_encode must read the (word, n_pieces) vocabulary from
    the TRAINED index (checkpointed ExistingRDD) — any replay of the
    merge loop inside the encode plan shows up as extra aggregates and
    window rounds.  The word join stays a shuffle join by design
    (vocab is Zipf-unbounded at scale)."""
    from dataforge_core_spark.operators import text as TX

    plan = (
        TX.train_bpe_encode(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ExistingRDD" in plan, "encode replays the merge loop"
    n_win = sum(
        1 for ln in plan.splitlines() if ln.strip("+- :*()").startswith("Window")
    )
    assert n_win == 0, "merge-round windows leaked into the encode plan"


def test_filtered_search_predicate_rides_index(spark):
    """ann_filtered_search: the metadata predicate must be a conjunct on
    the stored index (label lives IN the checkpointed assignment), not a
    join back to the corpus — the plan may contain no Parquet scan and
    no join beyond the broadcast centroid probe + the cell equi-join."""
    from dataforge_core_spark.operators import similarity as S

    plan = (
        S.ann_filtered_search(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ExistingRDD" in plan, "filtered search does not read the index"
    assert "Parquet" not in plan, "filtered search re-scans the corpus"
    n_join = sum(
        1
        for ln in plan.splitlines()
        if "Join" in ln and "BroadcastNestedLoop" not in ln
    )
    assert n_join <= 2, f"filtered search plans {n_join} joins"
    assert "label" in plan, "metadata predicate vanished from the plan"


def test_incremental_assign_one_pass_over_index(spark):
    """ann_incremental_assign: one aggregate over the checkpointed
    assignment index — no corpus re-scan, no join, no Lloyd replay."""
    from dataforge_core_spark.operators import similarity as S

    plan = (
        S.ann_incremental_assign(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ExistingRDD" in plan, "drift report re-derives the index"
    assert "Parquet" not in plan, "drift report re-scans the corpus"
    assert "Join" not in plan, "drift report plans a join"


def test_substring_clean_is_fully_index_served(spark):
    """dedup_substring_clean: positions, lengths AND token rows all come
    from the checkpointed index relations — an execution plans NO parquet
    scan and no tokenize (the r10 inline-toks form re-ran scan + split +
    posexplode over the corpus per execution; serving toks from the token
    base measured 0.87 -> 0.55s warm at sf0.1 and is one corpus read at
    100 TB)."""
    from dataforge_core_spark.operators import dedup as D

    plan = (
        D.dedup_substring_clean(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") == 3, (
        "expected pos + lens + toks index scans"
    )
    assert "parquet" not in plan.lower(), (
        "clean lane re-scans the corpus — toks not served from the base"
    )
    assert "posexplode" not in plan, "clean lane re-tokenizes the corpus"


def test_phash_neardup_salted_and_index_served(spark):
    """multimodal_phash_neardup: the band self-join must carry the
    oversized-bucket salt conjunct (the 14-bit block key space is fixed
    at 4 * 16384 buckets regardless of corpus size — and the synthetic
    images are pathologically self-similar, so hot blocks are the norm,
    not the edge case), the heavy-bucket relation must attach via
    broadcast, and the hash rows must come from the checkpointed image
    index — an execution plans NO Python stage and NO parquet scan (the
    decode pass is paid once per session by the index build)."""
    from dataforge_core_spark.operators import multimodal as M

    plan = (
        M.multimodal_phash_neardup(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "salt" in plan, "band join lost the bucket-salt conjunct"
    assert "BroadcastHashJoin" in plan, "heavy-bucket attach not broadcast"
    assert "MapInPandas" not in plan, "lane re-runs the Python decode pass"
    assert "parquet" not in plan.lower(), "lane re-scans the corpus"
    assert "ExistingRDD" in plan, "hash rows not served from the index"


def test_pq_nprobe_curve_served_from_checkpointed_scored(spark):
    """ann_pq_nprobe_curve: every probe-depth block and the brute
    baseline are rankings over the ONE checkpointed scored relation —
    a warm execution plans only ExistingRDD scans, no parquet and no
    join (the joins all happened once, inside the scored build)."""
    from dataforge_core_spark.operators import similarity as S

    sf = "/root/testdata/sf0.001"
    S._pq_curve_scored_view(spark, sf)  # build the index artifact
    plan = (
        S.ann_pq_nprobe_curve(spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ExistingRDD" in plan, "curve re-derives the scored relation"
    # the per-nprobe blocks LEFT JOIN brute vs found over the same
    # materialized rows — joins over ExistingRDD are expected; what is
    # NOT allowed is any file scan (a parquet read here means the
    # scored checkpoint was bypassed and the corpus re-scanned):
    assert "FileScan" not in plan and "parquet" not in plan.lower()


def test_ingest_decision_is_projection_over_stored_verdicts(spark):
    """Both media_policy decision lanes must be pure projections over
    the checkpointed five-gate verdict relation (r14: each lane
    previously re-ran all five stream-shape index probes per
    execution) — one ExistingRDD scan, zero joins, zero corpus scans,
    zero Python evals in the lane plan."""
    from dataforge_core_spark.operators import training as TR

    sf = "/root/testdata/sf0.001"
    for fn in (TR.train_ingest_decision, TR.train_ingest_media_reject):
        plan = (
            fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Scan ExistingRDD") == 1, (
            f"{fn.__name__} must read exactly the stored verdict "
            "relation"
        )
        for node in ("Join", "Parquet", "Generate", "Eval"):
            assert node not in plan, (
                f"{fn.__name__} plan contains {node} — not a "
                "projection over the stored verdicts"
            )


def test_xq_matrix_sized_to_relation(spark):
    """The stored exploded PC matrix must be sized to its own row
    count, not the 32-wide embeddings scan it derives from: its
    consumers are aggregate-shaped (vec_id windows, 64-group sums)
    with trivial per-row work, so extra near-empty partitions are pure
    task overhead per power-iteration round (r15 — measured 2x on
    pc_project/abtt at sf0.1)."""
    from dataforge_core_spark.operators import similarity as S
    from dataforge_core_spark.session import index_width

    name = S._xq_view(spark, "/root/testdata/sf0.001")
    df = spark.table(name)
    assert df.rdd.getNumPartitions() <= index_width(df.count(), 32_000)


def test_ppl_filter_serves_stored_scores(spark):
    """text_bigram_lm and train_perplexity_filter must serve the
    checkpointed per-doc LM score relation — no Generate (token
    explode) and no parquet scan in either lane plan: re-deriving the
    bigram-LM chain per execution (the filter inlined it twice:
    threshold subtree + output) is the pre-r15 shape."""
    from dataforge_core_spark.operators import text as X

    for fn in (X.train_perplexity_filter, X.text_bigram_lm):
        df = fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        name = fn.__name__
        assert "ExistingRDD" in plan, f"{name} not serving stored scores"
        assert "Generate" not in plan, f"{name} re-derives the explode"
        assert "parquet" not in plan.lower(), f"{name} re-scans the corpus"


def test_shingle_pack_exchange_carries_bigint_keys(spark):
    """The shingle-keyed pair lanes (dedup_ngram_jaccard /
    dedup_containment) shuffle the shared shingle relation grouped by
    the shingle — which _ex_df stores as the 56-bit md5 hash (BIGINT),
    never the 3-gram string (r16 audit of verdict item 6: a regression
    to string group keys ~4x'es the exchange bytes at any corpus
    size).  Asserts the relation's s column is bigint and that every
    lane plan partitions on it as a long (the #NL expression-id
    suffix)."""
    import re

    from dataforge_core_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    ex = dedup._ex_df(spark, sf)
    assert dict(ex.dtypes)["s"] == "bigint"
    for fn in (dedup.dedup_ngram_jaccard, dedup.dedup_containment):
        plan = _plan(fn(spark, sf))
        assert re.search(r"hashpartitioning\(s#\d+L", plan), (
            f"{fn.__name__}: shingle exchange no longer keyed on the "
            f"bigint hash"
        )
