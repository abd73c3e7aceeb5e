"""Pure-Python integer differential for the PC-fit pipeline: the whole
quantize -> power-iterate -> deflate -> re-iterate chain re-derived
with exact Python ints from the raw parquet floats and compared to
_fit_top_pcs EXACTLY.  Spark and DuckDB could share an idiom bug (both
run the same SQL shapes); a from-scratch Python ledger cannot.  Every
step is deterministic integer math, so the comparison is equality, not
tolerance."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.conftest import spark  # noqa: F401

SF = "/root/testdata/sf0.001"


def _sidiv(x: int, d: int) -> int:
    return (-1 if x < 0 else 1) * (abs(x) // d)


def _py_fit(xq: dict[int, list[int]], dim: int, iters: int,
            scale: int, rescale: int) -> list[int]:
    v = [scale] * dim
    for _ in range(iters):
        w = [0] * dim
        for _vec, eq in xq.items():
            s = sum(e * vv for e, vv in zip(eq, v))
            sp = _sidiv(s, rescale)
            for i in range(dim):
                w[i] += sp * eq[i]
        d = max(max(abs(x) for x in w) // scale, 1)
        v = [_sidiv(x, d) for x in w]
    return v


def _py_deflate(xq: dict[int, list[int]], v: list[int],
                scale: int) -> dict[int, list[int]]:
    n1 = max(sum(q * q for q in v) // scale, 1)
    out = {}
    for vec, eq in xq.items():
        cp = _sidiv(sum(e * vv for e, vv in zip(eq, v)), scale)
        out[vec] = [e - _sidiv(cp * vv, n1) for e, vv in zip(eq, v)]
    return out


@pytest.mark.parametrize("n_pc", [4])
def test_fit_top_pcs_matches_python_ledger(spark, n_pc):  # noqa: F811
    import dataforge_core_spark.operators.similarity as S

    t = pq.read_table(f"{SF}/embeddings.parquet")
    emb = t.column("embedding").to_pylist()
    ids = t.column("vec_id").to_pylist()
    # the exact quantization _xq_view applies: CAST(e * 1e6 AS BIGINT)
    # == IEEE double multiply then truncate toward zero
    xq = {
        vid: [int(float(e) * S.PI_SCALE) for e in v]
        for vid, v in zip(ids, emb)
    }
    fits_py = []
    cur = xq
    for k in range(n_pc):
        v = _py_fit(cur, S.DIM, S.PI_ITERS, S.PI_SCALE, S.PI_RESCALE)
        fits_py.append(sorted((i, v[i]) for i in range(S.DIM)))
        if k < n_pc - 1:
            cur = _py_deflate(cur, v, S.PI_SCALE)

    fits_spark = S._fit_top_pcs(spark, SF, n_pc)
    assert fits_spark == fits_py
