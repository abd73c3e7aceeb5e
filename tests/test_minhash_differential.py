"""End-to-end differential for dedup_minhash at EVERY band layout
against an independent pure-Python reference (hashlib md5, no SQL
reused): candidate generation (all rows of >= 1 band match), exact
Jaccard verification, and the layout dial all re-derived from first
principles on a planted-near-dup corpus.  This is the adversarial
companion of tests/test_parameterized.py's oracle checks — DuckDB and
Spark could in principle share a bug in a common SQL idiom; hashlib
cannot."""

from __future__ import annotations

import hashlib
import re

import pytest

from tests.conftest import spark  # noqa: F401  (session fixture)

P = 1_000_000_007


def _py_tokens(text: str | None) -> list[str]:
    return re.sub(r"\s+", " ", (text or "")).strip().lower().split(" ")


def _py_shingle_hashes(text: str | None) -> set[int]:
    toks = _py_tokens(text)
    out = set()
    for i in range(len(toks) - 2):
        s = " ".join(toks[i : i + 3])
        out.add(int(hashlib.md5(s.encode()).hexdigest()[:14], 16))
    return out


def _py_signature(hs: set[int], consts) -> list[int]:
    hm = [h % P for h in hs]
    return [min((a * h + b) % P for h in hm) for a, b in consts]


@pytest.mark.parametrize("bands,rows", [(1, 12), (2, 6), (4, 3), (6, 2), (12, 1)])
def test_minhash_layout_matches_python_reference(
    spark, tmp_path, bands, rows  # noqa: F811
):
    import dataforge_core_spark.operators.dedup as D

    # planted corpus: 0/1 exact-ish near-dups, 2/3 partial overlap,
    # 4/5 disjoint, 6 short (no shingles), 7 repeated-token boilerplate
    texts = [
        (0, "the quick brown fox jumps over the lazy dog tonight again"),
        (1, "the quick brown fox jumps over the lazy dog tonight today"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "alpha beta gamma delta epsilon zeta eta theta omega psi"),
        (4, "one two three four five six seven eight nine ten"),
        (5, "red green blue cyan magenta yellow black white gray pink"),
        (6, "too short"),
        (7, "spam spam spam spam spam spam spam spam spam spam"),
        (8, "spam spam spam spam spam spam spam spam spam ham"),
        (9, None),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(texts, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )

    got = {
        (r.doc_a, r.doc_b)
        for r in D.dedup_minhash(spark, d, bands=bands, rows=rows).collect()
    }

    consts = D._perm_consts(D.MINHASH_N)
    hs = {i: _py_shingle_hashes(t) for i, t in texts}
    sig = {i: _py_signature(h, consts) for i, h in hs.items() if h}
    exp = set()
    ids = sorted(sig)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            caught = any(
                all(
                    sig[a][bd * rows + j] == sig[b][bd * rows + j]
                    for j in range(rows)
                )
                for bd in range(bands)
            )
            if not caught:
                continue
            inter = len(hs[a] & hs[b])
            union = len(hs[a] | hs[b])
            if inter > 0 and inter / union >= D.JACCARD_THRESHOLD:
                exp.add((a, b))
    assert got == exp, (bands, rows)
    # the planted structure must actually exercise the machinery: the
    # near-identical pair is caught at the production layout, and the
    # recall-max layout (12x1: any single sig match) also catches the
    # subset-boilerplate pair ((7,8) is a legitimate LSH false negative
    # at longer rows: doc 7 has ONE distinct shingle, so full-band
    # agreement is probabilistic — exactly the trade the curve prices)
    if (bands, rows) == (4, 3):
        assert (0, 1) in exp
    if (bands, rows) == (12, 1):
        assert (0, 1) in exp and (7, 8) in exp


def test_stream_near_dedup_matches_python_reference(spark, tmp_path):  # noqa: F811
    """End-to-end Python reference for the streaming near-dup gate on a
    planted corpus: split by doc_id % INCR_MOD, exact = normalized-text
    md5 match with ANY corpus doc, near = any shared band between the
    new doc's signature and a corpus doc's, verified at exact Jaccard —
    all re-derived with hashlib, then compared to the lane's statuses
    by equality.  Together with the oracle this gives the lane three
    independent derivations (stream plan / DuckDB / Python)."""
    import dataforge_core_spark.operators.dedup as D
    from dataforge_core_spark.operators.streaming_rows import (
        stream_near_dedup,
    )

    texts = [
        # corpus (doc_id % 10 < 8)
        (0, "the quick brown fox jumps over the lazy dog tonight again"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (4, "one two three four five six seven eight nine ten"),
        (5, "  The   QUICK brown fox jumps over the lazy dog tonight again "),
        (6, "spam spam spam spam spam spam spam spam spam spam"),
        # new batch (doc_id % 10 >= 8)
        (8, "the quick brown fox jumps over the lazy dog tonight again"),
        (9, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra"),
        (18, "totally unrelated words with no overlap whatsoever here now"),
        (19, "xs"),
        (28, None),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(texts, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )

    got = {
        r.doc_id: r.status
        for r in stream_near_dedup(spark, d).collect()
    }

    def norm(t):
        return re.sub(r"\s+", " ", (t or "")).strip().lower()

    consts = D._perm_consts(D.MINHASH_N)
    corp = [(i, t) for i, t in texts if i % D.INCR_MOD < D.INCR_NEW_GE]
    newb = [(i, t) for i, t in texts if i % D.INCR_MOD >= D.INCR_NEW_GE]
    corp_keys = {
        hashlib.md5(norm(t).encode()).hexdigest() for _i, t in corp
    }
    chs = {i: _py_shingle_hashes(t) for i, t in corp}
    csig = {i: _py_signature(h, consts) for i, h in chs.items() if h}

    def bands_of(sig):
        # band identity includes the band INDEX, as in _band_keys'
        # md5(concat(band, sigs)) — band b only matches band b
        return {
            (b, tuple(sig[b * D.MINHASH_R + j] for j in range(D.MINHASH_R)))
            for b in range(D.MINHASH_BANDS)
        }

    cbands = {i: bands_of(s) for i, s in csig.items()}
    exp = {}
    for i, t in newb:
        if hashlib.md5(norm(t).encode()).hexdigest() in corp_keys:
            exp[i] = "exact_dup"
            continue
        hs = _py_shingle_hashes(t)
        near = False
        if hs:
            sig = _py_signature(hs, consts)
            nb = bands_of(sig)
            for c, cb in cbands.items():
                if nb & cb:
                    inter = len(hs & chs[c])
                    if inter and inter / len(hs | chs[c]) >= (
                        D.JACCARD_THRESHOLD
                    ):
                        near = True
                        break
        exp[i] = "near_dup" if near else "unique"
    assert got == exp
    # planted structure: 8 is an exact dup (also of the
    # whitespace/case-variant doc 5), 9 a near dup, 18/19/28 unique
    assert exp == {
        8: "exact_dup",
        9: "near_dup",
        18: "unique",
        19: "unique",
        28: "unique",
    }
