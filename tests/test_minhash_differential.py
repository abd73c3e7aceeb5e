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
