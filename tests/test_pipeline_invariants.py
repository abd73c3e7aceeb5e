"""Semantic invariants of the Gopher rule battery, span decontamination
and filtered ANN search — constructive cases the row-by-row oracle
comparison cannot express (it proves engine agreement, not that each
rule/flag/filter means what it claims)."""

import pytest


def _mini_docs(spark, tmp_path, rows):
    """Write a documents.parquet with the production schema into a tmp
    sf_dir and return that dir."""
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


GOOD = " ".join(["the cat and the dog have fun with all of them today"] * 6)


def test_gopher_rules_hand_corpus(spark, tmp_path):
    """Each rule must trip on a document engineered to violate exactly
    that rule, and pass on a clean one."""
    from dataforge_core_spark.operators import text as X

    sf = _mini_docs(
        spark,
        tmp_path,
        [
            (1, GOOD),  # passes everything
            (2, "too short to count"),  # word count
            (3, " ".join(["a"] * 60)),  # mean word length < 3
            (4, " ".join(["word#"] * 60)),  # symbol ratio > 10%
            (5, " ".join(["12345"] * 60)),  # no alpha words, no stopwords
            (6, "\n".join(["- the bullet item of the day and that"] * 9)),
        ],
    )
    rows = {r.doc_id: r for r in X.text_gopher_rules(spark, sf).collect()}
    assert rows[1].gopher_pass, rows[1]
    assert not rows[2].pass_word_count and not rows[2].gopher_pass
    assert not rows[3].pass_mean_word_len and rows[3].pass_word_count
    assert not rows[4].pass_symbol_ratio, rows[4]
    assert not rows[5].pass_alpha_words and not rows[5].pass_stopwords
    # doc 6: 9 of 9 lines are bullets -> 100% > 90% threshold
    assert rows[6].n_bullet_lines == 9 and not rows[6].pass_line_shape


def test_gopher_alpha_count_matches_python(spark, sf_dir):
    """The double-space regexp alpha-token count must equal a plain
    Python recount over the same normalization for every real doc."""
    import re

    from dataforge_core_spark.operators import text as X

    got = {
        r.doc_id: (r.n_tokens, r.n_alpha_tokens)
        for r in X.text_gopher_rules(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs:
        toks = re.sub(r"\s+", " ", d.text.lower()).strip().split(" ")
        n_alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
        assert got[d.doc_id] == (len(toks), n_alpha), d.doc_id


def test_decontaminate_exact_copy_fully_removed(spark, tmp_path):
    """A training doc that IS a benchmark doc verbatim must be redacted
    to zero surviving tokens; a vocabulary-disjoint doc must survive
    intact with zero spans."""
    from dataforge_core_spark.operators import training as T

    bench = " ".join(f"w{i}" for i in range(30))
    clean = " ".join(f"z{i}" for i in range(40))
    sf = _mini_docs(
        spark,
        tmp_path,
        [(100, bench), (1, bench), (2, clean)],
    )
    rows = {
        r.doc_id: r for r in T.train_decontaminate_spans(spark, sf).collect()
    }
    assert set(rows) == {1, 2}, "benchmark doc leaked into the output"
    assert rows[1].removed_tokens == 30 and rows[1].kept_ppm == 0
    assert rows[2].n_spans == 0 and rows[2].kept_ppm == 1_000_000


def test_decontaminate_span_geometry(spark, tmp_path):
    """A single mid-doc collision trigram must remove exactly the
    radius-widened window: [pos-R, pos+2+R] clamped to the doc."""
    from dataforge_core_spark.operators import training as T

    # trigram 'w0 w1 w2' sits at positions 40..42 of a 100-token doc
    tr = (
        " ".join(f"a{i}" for i in range(40))
        + " w0 w1 w2 "
        + " ".join(f"b{i}" for i in range(57))
    )
    sf = _mini_docs(spark, tmp_path, [(100, "w0 w1 w2"), (1, tr)])
    r = {x.doc_id: x for x in T.train_decontaminate_spans(spark, sf).collect()}[1]
    R = T.DECON_RADIUS
    assert r.n_tokens == 100 and r.n_spans == 1
    assert r.removed_tokens == (42 + R) - (40 - R) + 1
    # invariant: removal never exceeds the doc
    assert 0 <= r.removed_tokens <= r.n_tokens


def test_filtered_search_honors_predicate(spark, sf_dir):
    """Every returned neighbor must satisfy the metadata predicate, and
    per-query ranks must be the contiguous prefix 1..k."""
    from dataforge_core_spark.operators import similarity as S

    res = S.ann_filtered_search(spark, sf_dir).collect()
    assert res, "filtered search returned nothing"
    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    by_q: dict = {}
    for r in res:
        assert labels[r.neighbor_id] % 2 == 0, (
            f"neighbor {r.neighbor_id} label {labels[r.neighbor_id]}"
        )
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= S.TOP_K


def test_filtered_search_subset_of_unfiltered_corpus(spark, sf_dir):
    """The filtered result for a query must never contain a neighbor the
    unfiltered nprobe=2 search over the same index would rank but whose
    label is odd — i.e. filtering only removes candidates, it never
    invents them."""
    from dataforge_core_spark.operators import similarity as S

    filt = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_filtered_search(spark, sf_dir).collect()
    }
    # candidate universe: same probe shape, no predicate
    unfilt = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_ivf_search(spark, sf_dir, nprobe=2).collect()
    }
    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    even_unfilt = {
        (q, n) for (q, n) in unfilt if labels[n] % 2 == 0
    }
    # every even-labeled unfiltered hit must appear in the filtered
    # top-K unless the filtered list is already full of better scores;
    # with TOP_K slots freed by dropping odd neighbors, the filtered set
    # must be a superset of the even-labeled unfiltered hits
    assert even_unfilt <= filt


def test_substring_dedup_constructed_spans(spark, tmp_path):
    """A phrase planted verbatim in two documents must surface as a
    duplicated span in BOTH, and a fully-copied document must be 100%
    duplicated; a document of unique tokens must report zero."""
    from dataforge_core_spark.operators import dedup as D

    w = D.SUBSTR_WIN
    phrase = " ".join(f"p{i}" for i in range(w))  # exactly one window
    uniq_a = " ".join(f"a{i}" for i in range(20))
    uniq_b = " ".join(f"b{i}" for i in range(20))
    copied = " ".join(f"c{i}" for i in range(30))
    sf = _mini_docs(
        spark,
        tmp_path,
        [
            (1, uniq_a + " " + phrase),
            (2, phrase + " " + uniq_b),
            (3, copied),
            (4, copied),  # verbatim copy: every window duplicated
            (5, " ".join(f"u{i}" for i in range(40))),  # all unique
        ],
    )
    rows = {r.doc_id: r for r in D.dedup_substring(spark, sf).collect()}
    # the planted phrase is the only shared window in docs 1/2
    assert rows[1].n_dup_spans == 1 and rows[1].dup_tokens == w
    assert rows[2].n_dup_spans == 1 and rows[2].dup_tokens == w
    # verbatim copies: one maximal span covering the whole doc
    for d in (3, 4):
        assert rows[d].n_dup_spans == 1
        assert rows[d].dup_tokens == rows[d].n_tokens
        assert rows[d].dup_ppm == 1_000_000
    assert rows[5].dup_tokens == 0 and rows[5].n_dup_spans == 0


def test_substring_dedup_span_bounds(spark, sf_dir):
    """Merged spans are disjoint and >= SUBSTR_WIN tokens each, so
    dup_tokens is bounded by n_tokens below and span-count*W above."""
    from dataforge_core_spark.operators import dedup as D

    w = D.SUBSTR_WIN
    for r in D.dedup_substring(spark, sf_dir).collect():
        assert 0 <= r.dup_tokens <= r.n_tokens, r
        assert r.dup_tokens >= w * r.n_dup_spans or r.n_dup_spans == 0, r


def test_kmv_sketch_merge_equals_direct_global_sketch(spark, sf_dir):
    """Mergeability: the __all__ row (bottom-K of the union of
    per-source bottom-Ks) must equal the sketch computed directly from
    the global distinct-hash relation — and when a scope holds fewer
    than K hashes the estimate must be exact."""
    import duckdb

    from dataforge_core_spark.operators import sketches as SK

    rows = {
        r.scope: r for r in SK.sketch_kmv_distinct(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    k = SK.KMV_K
    direct = con.sql(
        f"""
        WITH toks AS (
          SELECT DISTINCT ('0x' || substr(md5(sh), 1, 14))::BIGINT AS h
          FROM (SELECT array_to_string(list_slice(tok, i, i + 2), ' ') AS sh
                FROM (SELECT string_split(lower(trim(
                        regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS tok
                      FROM documents),
                     unnest(generate_series(1, len(tok) - 2)) AS s(i)
                WHERE len(tok) >= 3)
        ),
        bk AS (SELECT h FROM toks ORDER BY h LIMIT {k})
        SELECT COUNT(*) AS n_kept, MAX(h) AS h_k,
               (SELECT COUNT(*) FROM toks) AS n_exact
        FROM bk
        """
    ).fetchone()
    n_kept, h_k, n_exact = direct
    want = (
        n_kept if n_kept < k else ((k - 1) * (1 << 56)) // max(h_k, 1)
    )
    assert rows["__all__"].kmv_est == want
    assert rows["__all__"].n_exact == n_exact
    for scope, r in rows.items():
        if r.n_exact < k:
            assert r.kmv_est == r.n_exact and r.err_ppm == 0, r


def test_sample_quantiles_rank_selection_matches_python(spark, sf_dir):
    """The explicit-rank quantile selection must equal a plain Python
    recount (sort + index) for both the exact side and the sample side,
    and the sample must be the deterministic hash subset."""
    import hashlib

    import duckdb

    from dataforge_core_spark.operators import sketches as SK

    rows = {
        r.event_type: r
        for r in SK.sketch_sample_quantiles(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    ev = con.sql(
        "SELECT event_type, event_id, value FROM "
        f"'{sf_dir}/events.parquet' WHERE value IS NOT NULL"
    ).fetchall()

    def h56(event_id):
        return int(
            hashlib.md5(str(event_id).encode()).hexdigest()[:14], 16
        )

    by_type, sample_by_type = {}, {}
    for et, eid, v in ev:
        by_type.setdefault(et, []).append((v, eid))
        if h56(eid) < SK._THRESH:
            sample_by_type.setdefault(et, []).append((v, eid))

    def pick(vals, p):
        vals = sorted(vals)
        return vals[(p * (len(vals) - 1)) // 100][0]

    for et, r in rows.items():
        assert r.n_total == len(by_type[et])
        assert r.n_sample == len(sample_by_type[et])
        assert r.exact_p50 == pick(by_type[et], 50)
        assert r.exact_p90 == pick(by_type[et], 90)
        assert r.est_p50 == pick(sample_by_type[et], 50)
        assert r.est_p90 == pick(sample_by_type[et], 90)


def test_substring_clean_keeps_canonical_copy(spark, tmp_path):
    """The removal transform must keep exactly the canonical (smallest
    (doc_id, position)) occurrence: a verbatim copy of an earlier doc
    cleans to empty while the earlier doc survives intact, and a
    phrase shared with an earlier doc is cut only from the later one."""
    from dataforge_core_spark.operators import dedup as D

    w = D.SUBSTR_WIN
    phrase = " ".join(f"p{i}" for i in range(w))
    uniq_b = " ".join(f"b{i}" for i in range(20))
    copied = " ".join(f"c{i}" for i in range(30))
    sf = _mini_docs(
        spark,
        tmp_path,
        [
            (1, phrase),
            (2, phrase + " " + uniq_b),
            (3, copied),
            (4, copied),
        ],
    )
    rows = {
        r.doc_id: r for r in D.dedup_substring_clean(spark, sf).collect()
    }
    assert rows[1].n_removed == 0 and rows[1].cleaned_text == phrase
    assert rows[2].n_removed == w
    assert rows[2].cleaned_text == uniq_b
    assert rows[3].n_removed == 0 and rows[3].cleaned_text == copied
    assert rows[4].n_removed == rows[4].n_tokens
    assert rows[4].cleaned_text == ""
    # bookkeeping invariant on the real corpus shape too
    for r in rows.values():
        kept = [t for t in r.cleaned_text.split(" ") if t]
        assert len(kept) == r.n_tokens - r.n_removed


def test_kmv_jaccard_identical_and_disjoint_sources(spark, tmp_path):
    """Sketch-estimated Jaccard must be EXACT when the pair's union
    fits in the sketch: identical sources -> 1e6 ppm, disjoint
    sources -> 0, a half-overlap -> its true ratio."""
    from dataforge_core_spark.operators import sketches as SK

    text_a = " ".join(f"a{i}" for i in range(12))  # 10 shingles
    text_b = " ".join(f"b{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            (1, text_a, "en", "s1", len(text_a)),
            (2, text_a, "en", "s2", len(text_a)),  # s2 == s1
            (3, text_b, "en", "s3", len(text_b)),  # s3 disjoint
            (4, text_a + " " + text_b, "en", "s4", 1),  # s4 superset
        ],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    rows = {
        (r.sa, r.sb): r
        for r in SK.sketch_kmv_jaccard(spark, str(tmp_path)).collect()
    }
    assert rows[("s1", "s2")].est_ppm == 1_000_000
    assert rows[("s1", "s2")].exact_ppm == 1_000_000
    assert rows[("s1", "s3")].est_ppm == 0
    assert rows[("s1", "s3")].exact_ppm == 0
    # s4 = a-shingles + b-shingles + 2 bridge shingles (23 total, 10
    # shared with s1): small union -> estimate equals exact
    r = rows[("s1", "s4")]
    assert r.est_ppm == r.exact_ppm and r.err_ppm == 0
    for r in rows.values():
        assert 0 <= r.est_ppm <= 1_000_000


def test_dd_quantiles_merge_and_error_bound(spark, sf_dir):
    """The log-bucket histogram sketch's mergeability contract, refereed
    in Python: per-partition histograms merged by bucket-wise count
    addition must equal the global histogram (the property the
    hash-sample sketch cannot give); the lane's __all__ row must equal a
    quantile read off the merged per-type histograms; and every estimate
    must LOWER-BOUND the true ranked element within one bucket width
    (relative error <= 2^-(HIST_S-1), exact below 2^HIST_S)."""
    import math
    from collections import Counter, defaultdict

    import duckdb

    from dataforge_core_spark.operators import sketches as SK

    rows = {
        r.scope: r for r in SK.sketch_dd_quantiles(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    ev = con.sql(
        "SELECT event_type, event_id, value FROM "
        f"'{sf_dir}/events.parquet' "
        "WHERE value IS NOT NULL AND value >= 0"
    ).fetchall()
    con.close()
    s = SK.HIST_S

    def bkt(m):
        msb = m.bit_length() or 1
        sh = max(msb - s, 0)
        return (msb << s) + (m >> sh), (m >> sh) << sh

    global_hist = defaultdict(Counter)
    part_hists = defaultdict(lambda: defaultdict(Counter))
    exact = defaultdict(list)
    lo_of = {}
    for et, eid, v in ev:
        m = int(math.floor(v * 1000))
        i, lo = bkt(m)
        lo_of[i] = lo
        global_hist[et][i] += 1
        part_hists[eid % 4][et][i] += 1
        exact[et].append(m)

    # mergeability: partition-wise build + count-add == global build
    for et in global_hist:
        merged = Counter()
        for p in part_hists.values():
            merged.update(p[et])
        assert merged == global_hist[et]

    allc = Counter()
    all_vals = []
    for et in global_hist:
        allc.update(global_hist[et])
        all_vals.extend(exact[et])

    def read_q(hist, q):
        n = sum(hist.values())
        target = 1 + (q * (n - 1)) // 100
        cum = 0
        for i in sorted(hist):
            cum += hist[i]
            if cum >= target:
                return lo_of[i]

    scopes = dict(global_hist)
    scopes["__all__"] = allc
    for scope, hist in scopes.items():
        r = rows[scope]
        assert r.n_total == sum(hist.values())
        assert r.n_buckets == len(hist)
        vals = sorted(exact[scope]) if scope != "__all__" else sorted(all_vals)
        for q in (50, 90, 99):
            est = getattr(r, f"est_p{q}_milli")
            assert est == read_q(hist, q), (scope, q)
            ex = vals[(q * (len(vals) - 1)) // 100]
            assert est <= ex, (scope, q, est, ex)
            assert ex - est <= (est >> (s - 1)), (scope, q, est, ex)


def test_cms_matches_python_referee_and_merges(spark, sf_dir):
    """The Count-Min lane must equal an independent Python CMS build
    (same fixed md5 row hashes), per-partition matrices must sum to
    exactly the global matrix (cell-wise addition = the CMS merge), and
    every estimate must respect the one-sided guarantee (est >= exact
    for EVERY token, not just the evaluated top-K)."""
    import hashlib
    import re
    from collections import Counter

    import duckdb

    from dataforge_core_spark.operators import sketches as SK

    rows = {
        r.tok: r
        for r in SK.sketch_cms_heavy_hitters(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()

    def toks(text):
        return [
            t
            for t in re.sub(r"\s+", " ", text).strip().lower().split(" ")
            if t
        ]

    def bucket(r, tok):
        return (
            int(
                hashlib.md5(f"{r}:{tok}".encode()).hexdigest()[:14], 16
            )
            % SK.CMS_W
        )

    global_cms = Counter()
    part_cms = [Counter() for _ in range(4)]
    exact = Counter()
    for doc_id, text in docs:
        for tok in toks(text):
            exact[tok] += 1
            for r in range(SK.CMS_D):
                cell = (r, bucket(r, tok))
                global_cms[cell] += 1
                part_cms[doc_id % 4][cell] += 1

    merged = Counter()
    for p in part_cms:
        merged.update(p)
    assert merged == global_cms  # cell-wise addition IS the merge

    def est(tok):
        return min(
            global_cms[(r, bucket(r, tok))] for r in range(SK.CMS_D)
        )

    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: SK.CMS_TOP]
    assert set(rows) == {t for t, _ in top}
    for tok, cnt in top:
        r = rows[tok]
        assert r.exact_cnt == cnt
        assert r.cms_est == est(tok), tok
    for tok, cnt in exact.items():  # one-sided, corpus-wide
        assert est(tok) >= cnt


def test_stream_dd_quantiles_matches_batch_referee(spark, sf_dir):
    """The streaming histogram's micro-batch accumulation must land on
    exactly the batch sketch: rebuild the per-(hour, type) histograms in
    Python from the raw events and assert every window's n_events and
    p50/p90 bucket lower bounds match the streaming lane's output."""
    import math
    from collections import Counter, defaultdict

    import duckdb

    from dataforge_core_spark.operators import sketches as SK
    from dataforge_core_spark.operators import streaming_rows as SR

    rows = {
        (r.window_start, r.event_type): r
        for r in SR.stream_dd_quantiles(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    ev = con.sql(
        "SELECT date_trunc('hour', ts) AS w, event_type, value FROM "
        f"'{sf_dir}/events.parquet' "
        "WHERE value IS NOT NULL AND value >= 0"
    ).fetchall()
    con.close()
    s = SK.HIST_S

    def bkt(m):
        msb = m.bit_length() or 1
        sh = max(msb - s, 0)
        return (msb << s) + (m >> sh), (m >> sh) << sh

    hists = defaultdict(Counter)
    lo_of = {}
    for w, et, v in ev:
        m = int(math.floor(v * 1000))
        i, lo = bkt(m)
        lo_of[i] = lo
        hists[(w, et)][i] += 1

    def read_q(hist, q):
        n = sum(hist.values())
        target = 1 + (q * (n - 1)) // 100
        cum = 0
        for i in sorted(hist):
            cum += hist[i]
            if cum >= target:
                return lo_of[i]

    assert set(rows) == set(hists)
    for key, hist in hists.items():
        r = rows[key]
        assert r.n_events == sum(hist.values()), key
        assert r.est_p50_milli == read_q(hist, 50), key
        assert r.est_p90_milli == read_q(hist, 90), key
        assert r.est_p99_milli == read_q(hist, 99), key


def test_lsh_band_curve_structure(spark):
    """dedup_lsh_band_curve invariants on real data: (1) every config
    whose layout refines the production 4x3 banding (bands 4, 6, 12 —
    each aligned 3-row production band contains a full band of theirs)
    must catch every verified pair; (2) along divisor chains
    (1|2|4|12 and 1|3|6|12) a finer layout can only catch more, so
    catch_ppm is non-decreasing per Jaccard decile."""
    from collections import defaultdict

    import dataforge_core_spark.operators.dedup as D

    rows = D.dedup_lsh_band_curve(spark, "/root/testdata/sf0.001").collect()
    by_cfg = defaultdict(dict)
    for r in rows:
        by_cfg[r.bands][r.jac_decile] = r
    assert set(by_cfg) == set(D.BAND_GRID)
    for bc in (4, 6, 12):
        for r in by_cfg[bc].values():
            assert r.catch_ppm == 1_000_000, (bc, r)
    for chain in ((1, 2, 4, 12), (1, 3, 6, 12)):
        for lo, hi in zip(chain, chain[1:]):
            for dec, r in by_cfg[lo].items():
                assert r.catch_ppm <= by_cfg[hi][dec].catch_ppm, (
                    lo,
                    hi,
                    dec,
                )
    # deciles partition the same pair set in every config
    counts = {bc: sum(r.n_pairs for r in m.values()) for bc, m in by_cfg.items()}
    assert len(set(counts.values())) == 1


def test_contrastive_triplets_semantics(spark):
    """Constructive check on real data: pos = the anchor's rank-1
    neighbor, hard_neg = its rank-K neighbor, easy_neg (when flagged
    valid) collides with neither the anchor, the positive, nor ANY kNN
    neighbor."""
    from collections import defaultdict

    import dataforge_core_spark.operators.similarity as S

    sf = "/root/testdata/sf0.001"
    edges = defaultdict(dict)
    for r in S.ann_knn_graph(spark, sf).collect():
        edges[r.src][r.rank] = r.dst
    rows = S.train_contrastive_triplets(spark, sf).collect()
    assert {r.anchor_id for r in rows} == set(edges)
    for r in rows:
        e = edges[r.anchor_id]
        assert r.pos_id == e[1], r
        assert r.hard_neg_id == e[max(e)], r
        if r.neg_valid:
            assert r.easy_neg_id != r.anchor_id
            assert r.easy_neg_id != r.pos_id
            assert r.easy_neg_id not in set(e.values())
    assert sum(r.neg_valid for r in rows) > 0.9 * len(rows)


def test_tokenizer_fertility_consistent_with_encode(spark, sf_dir):
    """Cross-lane referee: train_tokenizer_fertility's per-language
    totals must sum to train_bpe_encode's per-doc totals (same word
    extract, same vocab join, different grouping), and fertility is
    bounded below by construction: >= 1 piece per word."""
    import dataforge_core_spark.operators.text as T

    fert = T.train_tokenizer_fertility(spark, sf_dir).collect()
    enc = T.train_bpe_encode(spark, sf_dir).collect()
    assert sum(r.n_words for r in fert) == sum(r.n_words for r in enc)
    assert sum(r.n_bpe_tokens for r in fert) == sum(
        r.n_bpe_tokens for r in enc
    )
    assert sum(r.n_docs for r in fert) == len(enc)
    for r in fert:
        assert r.n_bpe_tokens >= r.n_words, r.lang
        assert r.pieces_per_kword >= 1000, r.lang


def test_quality_calibration_matches_joined_lanes(spark, sf_dir):
    """Cross-lane referee: text_quality_calibration's per-source
    confusion matrix must equal the row-wise join of the two standalone
    lanes it calibrates (text_quality_linear.keep vs
    text_quality.quality_pass), recomputed in Python."""
    from collections import Counter

    import dataforge_core_spark.operators.text as T

    keep = {
        r.doc_id: bool(r.keep)
        for r in T.text_quality_linear(spark, sf_dir).collect()
    }
    qp = {
        r.doc_id: bool(r.quality_pass)
        for r in T.text_quality(spark, sf_dir).collect()
    }
    src = {
        r.doc_id: r.source
        for r in spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).collect()
    }
    assert set(keep) == set(qp)
    exp: dict = {}
    for d in keep:
        c = exp.setdefault(src[d], Counter())
        c[(keep[d], qp[d])] += 1
    got = {
        r.source: r for r in T.text_quality_calibration(
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(exp)
    for s, c in exp.items():
        r = got[s]
        assert (r.tp, r.fp, r.fn, r.tn) == (
            c[(True, True)],
            c[(True, False)],
            c[(False, True)],
            c[(False, False)],
        ), s
        assert r.precision_ppm == (1000000 * r.tp) // max(r.tp + r.fp, 1)
        assert r.recall_ppm == (1000000 * r.tp) // max(r.tp + r.fn, 1)


def test_index_skew_report_referees(spark, sf_dir):
    """dedup_index_skew cross-checks against the index relations it
    reports on: row totals equal 4 bands per signature doc (minhash /
    simhash) and one row per vector (buckets / cells); the worst
    ivf cell equals a direct count over the assignment index; at the
    test fixtures nothing exceeds any cap."""
    import dataforge_core_spark.operators.dedup as D
    import dataforge_core_spark.operators.similarity as S

    rows = {r.index_name: r for r in D.dedup_index_skew(spark, sf_dir).collect()}
    assert set(rows) == {
        "minhash_bands",
        "simhash_bands",
        "embedding_buckets",
        "ivf_cells",
        "phash_bands",
    }
    n_sig_docs = D._minhash_sig_df(spark, sf_dir).count()
    assert rows["minhash_bands"].n_rows == 4 * n_sig_docs
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows["simhash_bands"].n_rows == 4 * n_docs
    from dataforge_core_spark.operators import multimodal as MM

    assert rows["phash_bands"].n_rows == MM.PHASH_BANDS * n_docs
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert rows["embedding_buckets"].n_rows == n_vec
    assert rows["ivf_cells"].n_rows == n_vec
    af, _cv = S._kmeans_index(spark, sf_dir)
    mx = spark.sql(
        f"SELECT MAX(cnt) m FROM (SELECT cid, COUNT(*) cnt FROM {af}"
        " GROUP BY cid)"
    ).collect()[0].m
    assert rows["ivf_cells"].max_bucket == mx
    for r in rows.values():
        assert r.n_over_cap == 0, r.index_name
        assert r.max_bucket <= r.n_rows


def test_phash_neardup_hand_hashes(spark):
    """Banded-dHash near-dup semantics on planted 56-bit hashes where
    every hamming distance and band collision is hand-checkable:

      doc1 = 0          doc2 = 0b111 (3 bits in band 0)
      doc3 = 0 (exact dup of doc1)
      doc4 = one flipped bit in EACH of the 4 bands (hamming 4 from
             doc1 AND no shared band -> invisible to the LSH, correctly
             so: 4 > PHASH_HAMMING_MAX)
      doc5 = 0b11

    Expected pairs at threshold 3: (1,2,3) (1,3,0) (1,5,2) (2,3,3)
    (2,5,1) (3,5,2); doc4 isolated.  The identical planted table runs
    through the DuckDB dialect of the SAME body as a mini-differential.
    """
    import duckdb

    from dataforge_core_spark.operators import multimodal as M

    assert M.PHASH_BANDS == 4 and M.PHASH_HAMMING_MAX == 3
    hashes = {
        1: 0,
        2: 0b111,
        3: 0,
        4: (1 << 0) | (1 << 14) | (1 << 28) | (1 << 42),
        5: 0b11,
    }
    spark.createDataFrame(
        list(hashes.items()), "doc_id bigint, phash bigint"
    ).createOrReplaceTempView("phash_hand")
    got = {
        r.doc_id: (r.n_near, r.min_hamming, r.nearest)
        for r in spark.sql(
            f"WITH {M._phash_neardup_body('spark', 'phash_hand', 1000)}"
        ).collect()
    }
    expect = {
        1: (3, 0, 3),
        2: (3, 1, 5),
        3: (3, 0, 1),
        4: (0, None, None),
        5: (3, 1, 2),
    }
    assert got == expect
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE phash_hand AS SELECT * FROM (VALUES "
            + ", ".join(f"({d}, {h})" for d, h in hashes.items())
            + ") t(doc_id, phash)"
        )
        duck = {
            r[0]: (r[2], r[3], r[4])
            for r in con.execute(
                "WITH "
                + M._phash_neardup_body("duck", "phash_hand", 1000)
            ).fetchall()
        }
    finally:
        con.close()
    assert duck == expect


def test_lang_id_eval_hand_corpus(spark, tmp_path):
    """Confusion-matrix semantics on a planted corpus where every
    stopword count, argmax tie-break, and ppm share is hand-checkable
    (doc6 'la la la' ties es==fr on 3 hits and must resolve to 'es' —
    the documented fixed tie-break order de < en < es < fr)."""
    from dataforge_core_spark.operators import text as X

    rows = [
        (1, "the a of cat", "en"),
        (2, "der die und hund", "de"),
        (3, "el la y gato", "es"),
        (4, "xyz qqq", "zh"),
        (5, "le la et chien", "fr"),
        (6, "la la la", "fr"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, "test", len(t)) for i, t, lang in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    got = {
        (r.labeled_lang, r.predicted_lang): (
            r.n_docs, r.recall_ppm, r.precision_ppm
        )
        for r in X.text_lang_id_eval(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("en", "en"): (1, 1000000, 1000000),
        ("de", "de"): (1, 1000000, 1000000),
        ("es", "es"): (1, 1000000, 500000),
        ("zh", "und"): (1, 1000000, 1000000),
        ("fr", "fr"): (1, 500000, 1000000),
        ("fr", "es"): (1, 500000, 500000),
    }


def test_trained_pq_codebook_reduces_distortion(spark):
    """Lloyd monotonicity: the trained residual codebook's total
    quantization distortion (sum over every (vector, subspace) residual
    of the squared distance to its nearest codeword) must be <= the
    init codebook's (the first-PQ_K external-supply convention) —
    k-means never increases distortion over its own init.  This is the
    invariant behind ann_pq_residual_recall's measured recall gain."""
    from dataforge_core_spark.operators import similarity as S

    SF = "/root/testdata/sf0.001"
    rsub, cb, _codes = S._trained_rcb(spark, SF)
    dist = S._r8_dist("spark", "s.r", "cb.cemb")

    def distortion(cb_rel):
        return spark.sql(
            f"""SELECT SUM(d) AS total FROM (
              SELECT MIN({dist}) AS d
              FROM {rsub} s JOIN {cb_rel} cb ON s.m = cb.m
              GROUP BY s.vec_id, s.m)"""
        ).collect()[0].total

    init = (
        f"(SELECT m, vec_id AS code, r AS cemb FROM {rsub}"
        f" WHERE vec_id < {S.PQ_K})"
    )
    d_init = distortion(init)
    d_trained = distortion(cb)
    assert d_trained <= d_init
    assert d_trained > 0  # not degenerate


def test_perplexity_filter_referee_and_threshold(spark, sf_dir):
    """train_perplexity_filter semantics: (1) mean_nll_q re-derives
    from text_bigram_lm row-by-row (truncating division of the negated
    quantized log-prob sum); (2) the gate is the exact nearest-rank
    percentile — kept count >= the rank index, and the threshold is
    minimal (tightening it by one value group would drop below)."""
    from dataforge_core_spark.operators import text as X

    lm = {
        r.doc_id: (r.n_bigrams, r.lp_sum_q)
        for r in X.text_bigram_lm(spark, sf_dir).collect()
    }
    rows = X.train_perplexity_filter(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(lm)
    for r in rows:
        nb, lp = lm[r.doc_id]
        assert r.n_bigrams == nb
        assert r.mean_nll_q == (-lp) // nb  # non-negative: // == trunc
    n = len(rows)
    rank = 1 + (X.PPL_KEEP_PCT * (n - 1)) // 100
    kept = sorted(r.mean_nll_q for r in rows if r.ppl_keep)
    assert len(kept) >= rank, "kept fewer than the rank index"
    thr = max(kept)
    below = sum(1 for r in rows if r.mean_nll_q < thr)
    assert below < rank, "threshold not minimal"


def test_perplexity_filter_pct_dial_live(spark, sf_dir):
    """A stricter pct keeps a subset of the default's keep set."""
    from dataforge_core_spark.operators import text as X

    d75 = {r.doc_id for r in
           X.train_perplexity_filter(spark, sf_dir).collect() if r.ppl_keep}
    d50 = {r.doc_id for r in
           X.train_perplexity_filter(spark, sf_dir, pct=50).collect()
           if r.ppl_keep}
    assert d50 < d75


def test_stream_ppl_gate_hand_corpus(spark, tmp_path):
    """The streaming LM gate's three smoothing branches (seen bigram /
    unseen w2 under a seen w1 / unseen w1 -> vocabulary fallback), the
    stored threshold (nearest-rank pct of the CORPUS docs' own means)
    and the keep flag, all hand-computed with an independent Python
    replica of the quantized log2."""
    import math

    from dataforge_core_spark.operators import streaming_rows as SR
    from dataforge_core_spark.operators import text as X

    def qlog2(n: int) -> int:
        b = n.bit_length()
        e = max(b - X._QL_BITS, 0)
        return math.floor(math.log2(n >> e) * X._QL_SCALE) + X._QL_SCALE * e

    # corpus = doc_id % 10 < 8; new = >= 8
    rows = [
        (1, "a b a b c"),   # corpus: bigrams (a,b)x2 (b,a) (b,c)
        (2, "a b"),         # corpus: (a,b)
        (8, "a b x c q q"),  # new: seen / unseen-w2 / unseen-w1 cases
        (9, "q q"),         # new: all unseen-w1
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)

    # model by hand: cnt {(a,b):3 (b,a):1 (b,c):1}, V=3,
    # uni cuv: a=3+3=6, b=2+3=5
    s_ab = qlog2(4) - qlog2(6)
    s_ba = qlog2(2) - qlog2(5)
    s_bc = qlog2(2) - qlog2(5)
    # corpus means: doc1 = -(2*s_ab+s_ba+s_bc) // 4, doc2 = -s_ab // 1
    m1 = (-(2 * s_ab + s_ba + s_bc)) // 4
    m2 = -s_ab
    # nearest-rank p75 of 2 values: rank = 1 + (75*1)//100 = 1 -> min
    thr = min(m1, m2)
    # doc 8: (a,b)=s_ab, (b,x)=-qlog2(5), (x,c)=(c,q)=(q,q)=-qlog2(3)
    nll8 = -(s_ab - qlog2(5) - 3 * qlog2(3))
    # doc 9: (q,q) = -qlog2(3)
    expect = {
        8: (5, nll8 // 5, nll8 // 5 <= thr),
        9: (1, qlog2(3), qlog2(3) <= thr),
    }
    got = {
        r.doc_id: (r.n_bigrams, r.mean_nll_q, r.ppl_keep)
        for r in SR.stream_ppl_gate(spark, str(tmp_path)).collect()
    }
    assert got == expect
    # the stored scalars match the hand model too
    _m, _u, ql_v, t = X._ppl_model(spark, str(tmp_path))
    assert ql_v == qlog2(3) and t == thr


def test_stream_semantic_gate_matches_batch_lane(spark, sf_dir):
    """Cross-lane referee: the streaming semantic gate's per-doc
    (max_cos_q, contaminated) must equal the BATCH
    ann_semantic_decontaminate rows for the incoming-split ids — same
    stored index, same cosine trees, same quantization, different
    execution paths (micro-batch stream-static join vs batch IVF
    probe)."""
    from dataforge_core_spark.operators.dedup import INCR_MOD, INCR_NEW_GE
    from dataforge_core_spark.operators.similarity import (
        ann_semantic_decontaminate,
    )
    from dataforge_core_spark.operators.streaming_rows import (
        stream_semantic_gate,
    )

    batch = {
        r.doc_id: (r.max_cos_q, r.contaminated)
        for r in ann_semantic_decontaminate(spark, sf_dir).collect()
        if r.doc_id % INCR_MOD >= INCR_NEW_GE
    }
    stream = {
        r.vec_id: (r.max_cos_q, r.contaminated)
        for r in stream_semantic_gate(spark, sf_dir).collect()
    }
    assert stream == batch
    assert stream, "empty incoming split"


def _py_tree(terms):
    """The engines' balanced pairwise reduce, re-derived: fold adjacent
    pairs left-to-right per level, odd leftover passes through —
    bit-identical to the SQL expression tree given IEEE doubles."""
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def test_pq_nprobe_curve_np1_matches_trained_search(spark, sf_dir):
    """Cross-lane referee for ann_pq_nprobe_curve: at nprobe=1 its
    found set is by construction the trained IVFADC search's top-K
    (same stored codes, same per-own-cell LUT), so n_hits must equal
    |trained_topk(q) ∩ exactL2topK(q)| with the exact side re-derived
    in pure Python using the engines' balanced summation trees."""
    from dataforge_core_spark.operators.similarity import (
        _PQ_SUBDIM,
        N_QUERIES,
        PQ_M,
        TOP_K,
        ann_ivf_pq_trained,
        ann_pq_nprobe_curve,
    )

    embs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(
            f"{sf_dir}/embeddings.parquet"
        ).collect()
    }

    def l2(a, b):
        subs = []
        for m in range(PQ_M):
            terms = [
                (a[m * _PQ_SUBDIM + i] - b[m * _PQ_SUBDIM + i])
                * (a[m * _PQ_SUBDIM + i] - b[m * _PQ_SUBDIM + i])
                for i in range(_PQ_SUBDIM)
            ]
            subs.append(_py_tree(terms))
        return _py_tree(subs)

    queries = [v for v in sorted(embs) if v < N_QUERIES]
    exact = {
        q: {
            n
            for _, n in sorted(
                (l2(embs[q], embs[c]), c) for c in embs if c != q
            )[:TOP_K]
        }
        for q in queries
    }
    trained: dict[int, set] = {}
    for r in ann_ivf_pq_trained(spark, sf_dir).collect():
        trained.setdefault(r.query_id, set()).add(r.neighbor_id)
    curve = {
        r.query_id: (r.n_exact, r.n_hits)
        for r in ann_pq_nprobe_curve(spark, sf_dir).collect()
        if r.nprobe == 1
    }
    assert set(curve) == set(exact)
    for q in exact:
        assert curve[q][0] == TOP_K
        assert curve[q][1] == len(trained.get(q, set()) & exact[q]), q


def test_ingest_decision_referees_components_and_policy(spark, sf_dir):
    """Cross-lane referee for the composite ingest record: every
    component column must equal the standalone gate lane's output
    (batch==stream semantics), and admit/reason must re-derive from
    the components under the documented policy — so the composite can
    never drift from the gates it claims to summarize."""
    from dataforge_core_spark.operators import streaming_rows as SR
    from dataforge_core_spark.operators.training import (
        train_ingest_decision,
    )

    comp = {
        r.doc_id: r
        for r in train_ingest_decision(spark, sf_dir).collect()
    }
    text = {
        r.doc_id: r.status
        for r in SR.stream_near_dedup(spark, sf_dir).collect()
    }
    image = {
        r.doc_id: r.status
        for r in SR.stream_phash_gate(spark, sf_dir).collect()
    }
    audio = {
        r.doc_id: r.status
        for r in SR.stream_afp_gate(spark, sf_dir).collect()
    }
    ppl = {
        r.doc_id: r.ppl_keep
        for r in SR.stream_ppl_gate(spark, sf_dir).collect()
    }
    sem = {
        r.vec_id: r.contaminated
        for r in SR.stream_semantic_gate(spark, sf_dir).collect()
    }
    assert set(comp) == set(text)
    reasons = set()
    for d, r in comp.items():
        assert r.text_status == text[d], d
        assert r.image_status == image.get(d), d
        assert r.audio_status == audio.get(d), d
        assert r.ppl_keep == ppl.get(d), d
        assert r.contaminated == sem.get(d), d
        if r.text_status == "exact_dup":
            want = "text_exact"
        elif r.text_status == "near_dup":
            want = "text_near"
        elif r.contaminated == 1:
            want = "benchmark_contamination"
        elif not (r.ppl_keep if r.ppl_keep is not None else True):
            want = "lm_quality"
        else:
            want = None
        assert r.reason == want, d
        assert r.admit == (want is None), d
        reasons.add(want)
    # the fixture must exercise both admit and at least two reject
    # reasons, or the policy test is vacuous
    assert None in reasons and len(reasons - {None}) >= 2, reasons


def test_ingest_media_reject_policy_rederives_from_flag_variant(
    spark, sf_dir
):
    """media_policy='reject' (the cross-modal referee dial) must differ
    from the default ONLY on rows whose flag-variant columns carry a
    media dup status, with the media reason slotted between the
    text-dup and content checks — re-derived here row by row from the
    flag variant's own columns, so the dial cannot drift from the
    documented policy.  Non-vacuity: the fixture must produce at least
    one media rejection AND keep at least one text-side reason."""
    from dataforge_core_spark.operators.training import (
        train_ingest_decision,
    )

    flag = {
        r.doc_id: r
        for r in train_ingest_decision(spark, sf_dir).collect()
    }
    rej = {
        r.doc_id: r
        for r in train_ingest_decision(
            spark, sf_dir, media_policy="reject"
        ).collect()
    }
    assert set(flag) == set(rej)
    reasons = set()
    for d, f in flag.items():
        r = rej[d]
        # component columns are policy-independent
        for col in (
            "text_status",
            "image_status",
            "audio_status",
            "ppl_keep",
            "contaminated",
        ):
            assert getattr(f, col) == getattr(r, col), (d, col)
        if f.reason in ("text_exact", "text_near"):
            want = f.reason  # text dups outrank media dups
        elif f.image_status == "exact_dup":
            want = "image_exact"
        elif f.image_status == "near_dup":
            want = "image_near"
        elif f.audio_status == "exact_dup":
            want = "audio_exact"
        elif f.audio_status == "near_dup":
            want = "audio_near"
        else:
            want = f.reason  # no media dup -> policies agree
        assert r.reason == want, d
        assert r.admit == (want is None), d
        reasons.add(r.reason)
    assert {"image_exact"} & reasons, reasons
    assert {"text_exact", "text_near"} & reasons, reasons


def test_ingest_media_policy_rejects_unknown(spark, sf_dir):
    import pytest

    from dataforge_core_spark.operators.training import (
        train_ingest_decision,
    )

    with pytest.raises(ValueError, match="media_policy"):
        train_ingest_decision(spark, sf_dir, media_policy="drop")


def test_kmv_stored_bottomk_matches_inline_ranking(spark, sf_dir):
    """The stored bottom-K sketch view (r15) must hold exactly the rows
    the estimator lanes' previous inline window derived — same (source,
    h, rn) triples, rn dense from 1 per source, nothing past
    KMV_BK_MAX."""
    from dataforge_core_spark.operators import sketches as K

    bk = K._bk_view(spark, sf_dir)
    toks = K._toks_view(spark, sf_dir)
    stored = {
        (r.source, r.h, r.rn)
        for r in spark.table(bk).collect()
    }
    inline = {
        (r.source, r.h, r.rn)
        for r in spark.sql(
            f"""
            SELECT source, h, rn FROM (
              SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY h) AS rn
              FROM {toks}
            ) WHERE rn <= {K.KMV_BK_MAX}
            """
        ).collect()
    }
    assert stored == inline and stored
    by_src = {}
    for s, _h, rn in stored:
        by_src.setdefault(s, []).append(rn)
    for s, rns in by_src.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), s
        assert max(rns) <= K.KMV_BK_MAX, s
