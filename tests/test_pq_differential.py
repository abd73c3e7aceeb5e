"""End-to-end differential for the TRAINED residual-PQ chain against an
independent pure-Python reference: residual subvectors, the
fixed-point-exact Lloyd rounds, code assignment, the query-side ADC LUT
and the final ranks all re-derived from the collected index inputs
(assignments + centroids) with plain Python floats/ints — every SQL
arithmetic step here is a balanced IEEE-binary64 tree or an exact
integer op, so the comparison is EQUALITY, not tolerance.  Adversarial
companion of the DuckDB oracle for the deepest lane of the PQ family
(the oracle proves Spark==DuckDB; this proves both match the math as
specified, like tests/test_pc_differential.py does for the PC fits).
"""

from __future__ import annotations

import math

from tests.conftest import spark  # noqa: F401  (session fixture)

SF = "/root/testdata/sf0.001"
SCALE = 4294967296.0  # similarity._FP_SCALE


def _tree(terms):
    terms = list(terms)
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _d8(a, b):
    return _tree((a[i] - b[i]) * (a[i] - b[i]) for i in range(8))


def _assign(rsub, cb):
    """argmin codeword per (vec_id, m); cb: {(m, code): [8 floats]}."""
    out = {}
    for (v, m), r in rsub.items():
        best = min(
            ((_d8(r, c), code) for (cm, code), c in cb.items() if cm == m),
        )
        out[(v, m)] = best[1]
    return out


def _update(rsub, assign):
    """Fixed-point-exact codeword means, mirroring _tcb_update_sql."""
    groups: dict[tuple[int, int], list] = {}
    for (v, m), code in assign.items():
        groups.setdefault((m, code), []).append(rsub[(v, m)])
    cb = {}
    for key, rows in groups.items():
        cb[key] = [
            float(sum(int(math.floor(r[i] * SCALE)) for r in rows))
            / (len(rows) * SCALE)
            for i in range(8)
        ]
    return cb


def test_trained_pq_chain_matches_python_reference(spark):
    import dataforge_core_spark.operators.similarity as S

    af, cv = S._kmeans_index(spark, SF)
    rows = spark.sql(
        f"SELECT vec_id, emb, cid, cellrn FROM {af}"
    ).collect()
    cents = dict(S._kmeans_centroids(spark, SF))
    vecs = {r.vec_id: (list(r.emb), r.cid, r.cellrn) for r in rows}

    # residual subvectors, exactly _rsub_sql's arithmetic
    rsub = {
        (v, m): [
            emb[m * 8 + i] - cents[cid][m * 8 + i] for i in range(8)
        ]
        for v, (emb, cid, _rn) in vecs.items()
        for m in range(S.PQ_M)
    }
    # init codebook = first PQ_K residual subvectors, then Lloyd rounds
    cb = {
        (m, v): rsub[(v, m)]
        for v in range(S.PQ_K)
        for m in range(S.PQ_M)
    }
    for _ in range(S.TRAINED_PQ_ITERS):
        cb = _update(rsub, _assign(rsub, cb))

    # the lane's stored codebook must equal the reference bit-for-bit
    _rs, cbview, _codes = S._trained_rcb(spark, SF)
    got_cb = {
        (r.m, r.code): list(r.cemb)
        for r in spark.sql(f"SELECT * FROM {cbview}").collect()
    }
    assert got_cb == cb

    # stored codes
    codes = _assign(rsub, cb)
    got_codes = {
        (r.vec_id, r.subspace): r.code
        for r in S.ann_pq_encode(spark, SF).collect()
    }  # raw codes lane sanity: same shape, different codebook
    assert set(got_codes) == set(codes)

    # ADC search: per query (vec_id < N_QUERIES), own cell, top-K
    expect = []
    for q in range(S.N_QUERIES):
        qemb, qcid, _ = vecs[q]
        qr = {
            m: [
                qemb[m * 8 + i] - cents[qcid][m * 8 + i] for i in range(8)
            ]
            for m in range(S.PQ_M)
        }
        lut = {
            (m, code): _d8(qr[m], c)
            for (m, code), c in cb.items()
        }
        scored = []
        for v, (_emb, cid, rn) in vecs.items():
            if v == q or cid != qcid or rn > S.IVF_CELL_CAP:
                continue
            d = _tree(lut[(m, codes[(v, m)])] for m in range(S.PQ_M))
            scored.append((d, v))
        scored.sort()
        expect.extend(
            (q, rank + 1, v) for rank, (_d, v) in enumerate(
                scored[: S.TOP_K]
            )
        )
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.ann_ivf_pq_trained(spark, SF).collect()
    )
    assert got == sorted(expect)
