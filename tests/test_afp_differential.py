"""End-to-end differential for the acoustic-fingerprint audio-dedup
path against an independent pure-Python reference: the trio-track
waveform closed form, delta-sign bit packing, pigeonhole banding,
salting, hamming verification and the per-track report all re-derived
from first principles — no SQL reused, and no WAV bytes either, so a
shared Spark/DuckDB SQL-idiom bug AND a byte-path (chunk-walk /
int16-unpack / bit-order) bug are both catchable.  Mirrors
tests/test_phash_differential.py (whose generic banded-report
reference is reused as-is)."""

from __future__ import annotations

from tests.conftest import spark  # noqa: F401  (session fixture)
from tests.test_phash_differential import _py_report

SF = "/root/testdata/sf0.001"


def _py_afp(doc_id: int, n_samples: int, perturb: int) -> int:
    ck = doc_id - (doc_id % 3)
    p = 1 + (doc_id % 3) * 19
    vs = []
    ck16 = ck % 65536  # mirrors the engine's overflow-safe reduction
    for i in range(n_samples):
        v = (ck16 * 7919 * (i + 1)) % 65536
        if i == p:
            v = (v + perturb) % 65536
        vs.append(v)
    out = 0
    for i in range(n_samples - 1):
        if vs[i + 1] > vs[i]:
            out |= 1 << i
    return out


def _doc_ids(spark):
    return [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]


def test_afp_matches_python_reference(spark):
    """The fingerprint itself: Python closed-form reference vs the
    lane's REAL WAV synth -> chunk-walk parse -> fingerprint byte
    round-trip."""
    from dataforge_core_spark.operators import multimodal as M

    want = {
        d: _py_afp(d, M.AFP_N_SAMPLES, M._AFP_PERTURB)
        for d in _doc_ids(spark)
    }
    got = {
        r.doc_id: r.afp
        for r in M.multimodal_audio_fingerprint(spark, SF)
        .select("doc_id", "afp")
        .collect()
    }
    assert got == want


def test_afp_neardup_matches_python_reference(spark):
    from dataforge_core_spark.operators import multimodal as M

    hashes = {
        d: _py_afp(d, M.AFP_N_SAMPLES, M._AFP_PERTURB)
        for d in _doc_ids(spark)
    }
    want = _py_report(
        hashes, M.AFP_BANDS, M._AFP_BAND_BITS,
        M.AFP_HAMMING_MAX, M.MAX_AFP_BUCKET,
    )
    got = {
        r.doc_id: (r.n_near, r.min_hamming, r.nearest)
        for r in M.multimodal_audio_neardup(spark, SF).collect()
    }
    assert got == want


def test_afp_trio_pigeonhole_recall(spark):
    """Constructive recall guarantee: any same-trio pair within
    AFP_HAMMING_MAX (the planted one-corrupted-sample near-dups) MUST
    appear in the lane's report — 5 x 12-bit bands pigeonhole hamming
    <= 4 — unless the salt guard separated an oversized bucket (not
    the case at this fixture, asserted)."""
    from dataforge_core_spark.operators import multimodal as M

    docs = _doc_ids(spark)
    hashes = {
        d: _py_afp(d, M.AFP_N_SAMPLES, M._AFP_PERTURB) for d in docs
    }
    # cap regime: no bucket big enough to trip the salt guard here
    mask = (1 << M._AFP_BAND_BITS) - 1
    buckets: dict[tuple[int, int], int] = {}
    for h in hashes.values():
        for b in range(M.AFP_BANDS):
            k = (b, (h >> (M._AFP_BAND_BITS * b)) & mask)
            buckets[k] = buckets.get(k, 0) + 1
    assert max(buckets.values()) <= M.MAX_AFP_BUCKET, (
        "fixture outgrew the cap regime; the guarantee below weakens"
    )
    report = {
        r.doc_id: (r.n_near, r.min_hamming)
        for r in M.multimodal_audio_neardup(spark, SF).collect()
    }
    planted = 0
    for d in docs:
        for o in (d + 1, d + 2):
            if o in hashes and o - (o % 3) == d - (d % 3):
                ham = bin(hashes[d] ^ hashes[o]).count("1")
                if ham <= M.AFP_HAMMING_MAX:
                    planted += 1
                    assert report[d][0] >= 1, (d, o, ham)
                    assert report[d][1] <= M.AFP_HAMMING_MAX
    assert planted > 0, "fixture lost its planted trio near-dups"


def test_afp_clusters_match_python_reference(spark):
    """HASH-SPACE connected components re-derived with a pure-Python
    union-find over the fingerprint graph — the audio counterpart of
    test_phash_clusters_match_python_reference."""
    from dataforge_core_spark.operators import multimodal as M

    docs = _doc_ids(spark)
    hashes = {
        d: _py_afp(d, M.AFP_N_SAMPLES, M._AFP_PERTURB) for d in docs
    }
    nodes = sorted(set(hashes.values()))
    parent = {h: h for h in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mask = (1 << M._AFP_BAND_BITS) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for h in nodes:
        for b in range(M.AFP_BANDS):
            buckets.setdefault(
                (b, (h >> (M._AFP_BAND_BITS * b)) & mask), []
            ).append(h)
    for members in buckets.values():
        nsalt = (
            -(-len(members) // M.MAX_AFP_BUCKET)
            if len(members) > M.MAX_AFP_BUCKET else 1
        )
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                lo, hi = min(a, b), max(a, b)
                if lo % nsalt != hi % nsalt:
                    continue
                if bin(lo ^ hi).count("1") <= M.AFP_HAMMING_MAX:
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
        for r in M.multimodal_audio_clusters(spark, SF).collect()
    }
    assert got == expect
    assert len(set(expect.values())) < len(docs), "no clustering happened"
