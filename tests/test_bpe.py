"""Differential test for the BPE merge trainer.

A 20-line pure-Python reference (the Sennrich et al. train loop with
greedy left-to-right merge application) is run against the SAME
synthetic corpus as the Spark lane and the DuckDB oracle — all three
must produce the identical merge table.  The corpus is adversarial for
the greedy-application window construction: same-symbol runs of odd and
even length (overlapping candidates), alternating pairs, repeated
merges whose OUTPUT symbol collides with later candidates, and
single-character pieces (excluded from pairing).
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

_BPE_PY_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

DOCS = [
    "aaaa aaa aa a",          # odd/even same-symbol runs
    "abab ababab abababab",   # alternating pairs
    "aabb aabbaabb",          # run then pair
    "xxxxxxxx",               # long run
    "mississippi mississippi",
    "the theme there them",
    "12341234 1234 99",
    "a,b,,c!!d",              # punct runs
]


def _ref_bpe(word_counts: dict[str, int], rounds: int):
    segs = {w: list(w) for w in word_counts if len(w) >= 2}
    merges = []
    for k in range(1, rounds + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            c = word_counts[w]
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] = pc.get((x, y), 0) + c
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((k, a, b, n))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges


def _expected():
    from dataforge_core_spark.operators.text import BPE_ROUNDS

    counts: dict[str, int] = {}
    for d in DOCS:
        for w in re.findall(_BPE_PY_RE, d):
            counts[w] = counts.get(w, 0) + 1
    return _ref_bpe(counts, BPE_ROUNDS)


@pytest.fixture(scope="module")
def synth_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bpe_synth"))
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_spark_lane_matches_python_reference(spark, synth_dir):
    from dataforge_core_spark.operators.text import train_bpe_merges

    got = sorted(tuple(r) for r in train_bpe_merges(spark, synth_dir).collect())
    assert got == sorted(_expected())


def test_duck_oracle_matches_python_reference(synth_dir):
    from dataforge_core_spark.operators.text import _bpe_merges_oracle

    con = duckdb.connect()
    try:
        path = os.path.join(synth_dir, "documents.parquet")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
        )
        got = sorted(tuple(r) for r in con.execute(_bpe_merges_oracle()).fetchall())
    finally:
        con.close()
    assert got == sorted(_expected())


# --- property: the relational greedy-merge construction is exactly the
# procedural left-to-right scan, on ARBITRARY corpora.  DuckDB stands in
# for the SQL side (identical CTE text modulo dialect; the Spark lane is
# pinned to the same reference by the fixed-corpus test above) so each
# example runs in milliseconds without a Spark job.
from hypothesis import given, settings, strategies as st  # noqa: E402

_words = st.text(alphabet="aabbcx1,", min_size=1, max_size=8)
_corpora = st.lists(
    st.lists(_words, min_size=1, max_size=6).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(_corpora)
@settings(max_examples=60, deadline=None)
def test_duck_oracle_matches_reference_on_random_corpora(docs):
    from dataforge_core_spark.operators.text import (
        BPE_ROUNDS,
        _bpe_merges_oracle,
    )

    counts: dict[str, int] = {}
    for d in docs:
        for w in re.findall(_BPE_PY_RE, d):
            counts[w] = counts.get(w, 0) + 1
    expected = sorted(_ref_bpe(counts, BPE_ROUNDS))

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", list(enumerate(docs))
        )
        got = sorted(
            tuple(r) for r in con.execute(_bpe_merges_oracle()).fetchall()
        )
    finally:
        con.close()
    assert got == expected
