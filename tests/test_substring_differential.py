"""Differential test for the exact-substring dedup pair.

A pure-Python reference (sliding SUBSTR_WIN-token windows, >= 2 corpus
occurrences marks duplication, canonical = smallest (doc_id, position)
per window, gaps-and-islands span merge) runs against a seeded random
corpus with planted phrase/doc repeats — the Spark measurement lane and
the removal transform must reproduce it exactly.  This is the
constructive check the row-by-row oracle protocol cannot give (the
oracle proves engine agreement, not that the span algebra is right).
"""

from __future__ import annotations

import random
import re


def _tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text).strip().lower().split(" ")


def _windows(tok: list[str], w: int):
    if len(tok) < w:
        return []
    return [" ".join(tok[i : i + w]) for i in range(len(tok) - w + 1)]


def _spans(marked: list[int], w: int) -> list[tuple[int, int]]:
    """Merge marked window starts into maximal [s, e) token spans —
    starts within <= w of the previous merge (overlap or touch)."""
    spans: list[tuple[int, int]] = []
    for i in sorted(marked):
        if spans and i - spans[-1][1] <= w:  # i <= prev_max + w
            s, prev_max = spans[-1]
            spans[-1] = (s, max(prev_max, i))
        else:
            spans.append((i, i))
    return [(s, m + w) for s, m in spans]


def _reference(docs: dict[int, str], w: int):
    """-> per doc: (dup spans, removal spans) as token index sets."""
    occs: dict[str, list[tuple[int, int]]] = {}
    toks = {d: _tokens(t) for d, t in docs.items()}
    for d in sorted(toks):
        for i, win in enumerate(_windows(toks[d], w)):
            occs.setdefault(win, []).append((d, i))
    dup_marked: dict[int, list[int]] = {d: [] for d in docs}
    rm_marked: dict[int, list[int]] = {d: [] for d in docs}
    for win, lst in occs.items():
        if len(lst) < 2:
            continue
        lst.sort()
        for d, i in lst:
            dup_marked[d].append(i)
        for d, i in lst[1:]:  # all but the canonical occurrence
            rm_marked[d].append(i)
    return toks, {
        d: (_spans(dup_marked[d], w), _spans(rm_marked[d], w))
        for d in docs
    }


def _write(spark, tmp_path, docs):
    df = spark.createDataFrame(
        [(d, t, "en", "diff", len(t)) for d, t in sorted(docs.items())],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_substring_lanes_match_python_reference(spark, tmp_path):
    from dataforge_core_spark.operators import dedup as D

    w = D.SUBSTR_WIN
    rng = random.Random(8)
    pool = [f"w{i}" for i in range(40)]
    phrases = [
        " ".join(rng.choice(pool) for _ in range(rng.randint(w, w + 4)))
        for _ in range(6)
    ]
    docs: dict[int, str] = {}
    for d in range(30):
        parts = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.5:
                parts.append(rng.choice(phrases))  # planted repeats
            else:
                parts.append(
                    " ".join(
                        rng.choice(pool)
                        for _ in range(rng.randint(3, 2 * w))
                    )
                )
        docs[d] = " ".join(parts)
    docs[30] = docs[7]  # verbatim copy
    sf = _write(spark, tmp_path, docs)

    toks, ref = _reference(docs, w)

    got = {r.doc_id: r for r in D.dedup_substring(spark, sf).collect()}
    for d, (dup_spans, _rm) in ref.items():
        r = got[d]
        assert r.n_tokens == len(toks[d]), d
        assert r.n_dup_spans == len(dup_spans), (d, dup_spans, r)
        assert r.dup_tokens == sum(e - s for s, e in dup_spans), d

    cleaned = {
        r.doc_id: r for r in D.dedup_substring_clean(spark, sf).collect()
    }
    for d, (_dup, rm_spans) in ref.items():
        removed = set()
        for s, e in rm_spans:
            removed.update(range(s, e))
        want = " ".join(
            t for j, t in enumerate(toks[d]) if j not in removed
        )
        r = cleaned[d]
        assert r.n_removed == len(removed), (d, rm_spans)
        assert r.cleaned_text == want, d
