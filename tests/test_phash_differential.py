"""End-to-end differential for the perceptual-hash image-dedup path
against an independent pure-Python reference: the synthetic pixel
function, block sums, dHash bit packing, pigeonhole banding, salting,
hamming verification and the per-image report all re-derived from first
principles — no SQL reused, and no BMP bytes either, so a shared
Spark/DuckDB SQL-idiom bug AND a byte-path (stride/row-order/bit-order)
bug are both catchable.  Adversarial companion of the oracle check,
like tests/test_minhash_differential.py.
"""

from __future__ import annotations

from tests.conftest import spark  # noqa: F401  (session fixture)

SF = "/root/testdata/sf0.001"


def _py_phash(doc_id: int, img: int, grid: int, blk: int) -> int:
    sums = [[0] * grid for _ in range(grid)]
    for y in range(img):
        for x in range(img):
            sums[y // blk][x // blk] += (x * 7 + y * 13 + doc_id) % 256
    out = 0
    for by in range(grid):
        for bx in range(grid - 1):
            if sums[by][bx + 1] > sums[by][bx]:
                out |= 1 << (by * (grid - 1) + bx)
    return out


def _py_report(hashes: dict[int, int], bands: int, band_bits: int,
               hmax: int, cap: int):
    """Banded candidate generation + hamming verify + per-doc report,
    INCLUDING the salt guard (doc_id % ceil(n/cap) within oversized
    buckets), re-derived independently."""
    mask = (1 << band_bits) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, h in hashes.items():
        for b in range(bands):
            buckets.setdefault((b, (h >> (band_bits * b)) & mask),
                               []).append(d)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        nsalt = -(-len(members) // cap) if len(members) > cap else 1
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                lo, hi = min(a, b), max(a, b)
                if lo % nsalt != hi % nsalt:
                    continue
                if bin(hashes[lo] ^ hashes[hi]).count("1") <= hmax:
                    pairs.add((lo, hi))
    report = {}
    for d in hashes:
        nbrs = [(bin(hashes[d] ^ hashes[o]).count("1"), o)
                for (a, b) in pairs for o in ((b,) if a == d else
                                              (a,) if b == d else ())]
        if nbrs:
            mh, nearest = min(nbrs)
            report[d] = (len(nbrs), mh, nearest)
        else:
            report[d] = (0, None, None)
    return report


def test_phash_neardup_matches_python_reference(spark):
    from dataforge_core_spark.operators import multimodal as M

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id").collect()
    ]
    hashes = {
        d: _py_phash(d, M.PATCH_IMG, M.PHASH_GRID, M._PHASH_BLOCK)
        for d in docs
    }
    # the hash itself: Python pixel-function reference vs the lane's
    # REAL BMP synth -> parse -> hash byte round-trip
    got_hashes = {
        r.doc_id: r.phash
        for r in M._phash_df(spark, SF).collect()
    }
    assert got_hashes == hashes

    expect = _py_report(
        hashes, M.PHASH_BANDS, M._PHASH_BAND_BITS,
        M.PHASH_HAMMING_MAX, M.MAX_PHASH_BUCKET,
    )
    got = {
        r.doc_id: (r.n_near, r.min_hamming, r.nearest)
        for r in M.multimodal_phash_neardup(spark, SF).collect()
    }
    assert got == expect
    # the fixture must actually exercise the interesting region
    assert any(v[0] > 0 for v in expect.values()), "no near-dups hit"


def test_phash_neardup_salting_matches_python_reference(spark):
    """Same differential with cap=2 so the salt guard actually fires
    (every shared bucket oversizes) — recall loss across salt groups
    must match the Python reference exactly, both engines."""
    from dataforge_core_spark.operators import multimodal as M

    hashes = {
        d: _py_phash(d, M.PATCH_IMG, M.PHASH_GRID, M._PHASH_BLOCK)
        for d in (
            r.doc_id
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id").collect()
        )
    }
    expect = _py_report(
        hashes, M.PHASH_BANDS, M._PHASH_BAND_BITS,
        M.PHASH_HAMMING_MAX, 2,
    )
    got = {
        r.doc_id: (r.n_near, r.min_hamming, r.nearest)
        for r in M.multimodal_phash_neardup(spark, SF, max_bucket=2)
        .collect()
    }
    assert got == expect


def test_stream_phash_gate_matches_python_reference(spark):
    """The streaming image gate's statuses re-derived in pure Python:
    corpus band buckets (rn-capped by doc order), probe, hamming
    classify — validates the stream-static join path end to end,
    including the mapInPandas hash stage running inside a streaming
    query."""
    from dataforge_core_spark.operators import multimodal as M
    from dataforge_core_spark.operators import streaming_rows as SR
    from dataforge_core_spark.operators.dedup import INCR_MOD, INCR_NEW_GE

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id").collect()
    ]
    hashes = {
        d: _py_phash(d, M.PATCH_IMG, M.PHASH_GRID, M._PHASH_BLOCK)
        for d in docs
    }
    mask = (1 << M._PHASH_BAND_BITS) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for d in sorted(d for d in docs if d % INCR_MOD < INCR_NEW_GE):
        for b in range(M.PHASH_BANDS):
            key = (b, (hashes[d] >> (M._PHASH_BAND_BITS * b)) & mask)
            members = buckets.setdefault(key, [])
            if len(members) < M.MAX_PHASH_BUCKET:
                members.append(d)
    expect = {}
    for d in docs:
        if d % INCR_MOD < INCR_NEW_GE:
            continue
        hams = [
            bin(hashes[d] ^ hashes[c]).count("1")
            for b in range(M.PHASH_BANDS)
            for c in buckets.get(
                (b, (hashes[d] >> (M._PHASH_BAND_BITS * b)) & mask), []
            )
        ]
        if any(h == 0 for h in hams):
            expect[d] = "exact_dup"
        elif any(h <= M.PHASH_HAMMING_MAX for h in hams):
            expect[d] = "near_dup"
        else:
            expect[d] = "unique"
    got = {
        r.doc_id: r.status
        for r in SR.stream_phash_gate(spark, SF).collect()
    }
    assert got == expect
    # the synthetic corpus is exact-dup-saturated (most new images have
    # a pixel-identical corpus sibling via the mod-256 doc_id offset or
    # an accidental hash collision) — the multi-status classify logic
    # is exercised by the planted-hash constructive test instead; here
    # we only require the gate to have actually classified something
    assert expect and "exact_dup" in expect.values()


def test_phash_clusters_match_python_reference(spark):
    """HASH-SPACE connected components re-derived with a pure-Python
    union-find: distinct hashes are the nodes (exact dups collapse
    before the CC, exactly as the lane does), banded+salted+verified
    pairs are the edges, and each image's cluster_id must be the min
    doc_id among the documents of its hash component."""
    from dataforge_core_spark.operators import multimodal as M

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id").collect()
    ]
    hashes = {
        d: _py_phash(d, M.PATCH_IMG, M.PHASH_GRID, M._PHASH_BLOCK)
        for d in docs
    }
    nodes = sorted(set(hashes.values()))
    parent = {h: h for h in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mask = (1 << M._PHASH_BAND_BITS) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for h in nodes:
        for b in range(M.PHASH_BANDS):
            buckets.setdefault(
                (b, (h >> (M._PHASH_BAND_BITS * b)) & mask), []
            ).append(h)
    for members in buckets.values():
        nsalt = (
            -(-len(members) // M.MAX_PHASH_BUCKET)
            if len(members) > M.MAX_PHASH_BUCKET else 1
        )
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                lo, hi = min(a, b), max(a, b)
                if lo % nsalt != hi % nsalt:
                    continue
                if bin(lo ^ hi).count("1") <= M.PHASH_HAMMING_MAX:
                    ra, rb = find(lo), find(hi)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    root_min_doc: dict[int, int] = {}
    for d, h in hashes.items():
        r = find(h)
        root_min_doc[r] = min(root_min_doc.get(r, d), d)
    expect = {d: root_min_doc[find(h)] for d, h in hashes.items()}
    got = {
        r.doc_id: r.cluster_id
        for r in M.multimodal_phash_clusters(spark, SF).collect()
    }
    assert got == expect
    assert len(set(expect.values())) < len(docs), "no clustering happened"
