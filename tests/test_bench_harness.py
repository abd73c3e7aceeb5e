"""The bench harness is round-critical (the driver records BENCH_r{N}
from its stdout): a builder thunk that raises, or a cache-clear that
misses a new cache, silently breaks the round's perf record.  This
drives every index builder and the cache-clearer end-to-end at sf0.001
— the same code path bench.main() runs at sf0.1."""

from __future__ import annotations

import importlib
import os
import sys


def _bench(sf_dir: str):
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import bench

    return importlib.reload(bench)


def test_index_builders_run_and_caches_clear(spark, sf_dir):
    bench = _bench(sf_dir)
    # cold state -> every builder must construct its index from scratch
    bench._clear_operator_caches(spark)
    for name, build in bench._index_builders():
        build(spark)  # raises = the round's bench would die on this row
    # clearing again must free/forget everything the builders created
    # (a cache the clearer misses keeps serving stale frames after a
    # round driver re-runs bench in one session)
    bench._clear_operator_caches(spark)
    from dataforge_core_spark.operators import (
        dedup,
        similarity,
        simhash,
        sketches,
    )

    for cache in (
        dedup._ex_cache,
        dedup._pairs_cache,
        dedup._labels_cache,
        dedup._substr_cache,
        dedup._tokbase_cache,
        simhash._sig_cache,
        simhash._salted_cache,
        similarity._knn_cache,
        similarity._pr_edges_cache,
        similarity._kcore_cache,
        similarity._kmeans_cache,
        similarity._nprobe_scored_cache,
        similarity._pc2_cache,
        sketches._toks_cache,
    ):
        assert cache == {}, "cache survived _clear_operator_caches"


def test_host_speed_probe_positive():
    bench = _bench("/root/testdata/sf0.001")
    s = bench._host_speed()
    assert 0 < s < 60, s


def test_noisy_lanes_are_registered_queries():
    """Every NOISY_LANES name must exist in the registry — a renamed
    lane silently loses its 5-run treatment otherwise."""
    bench = _bench("/root/testdata/sf0.001")
    import __spark_entry__ as e

    missing = bench.NOISY_LANES - set(e.queries())
    assert not missing, missing


def test_every_operator_cache_is_cleared_by_bench():
    """The cold-path guarantee of bench.py depends on
    _clear_operator_caches knowing EVERY module-level operator cache —
    a forgotten one silently serves warm indexes inside 'cold' index
    timings (continuation-session review finding).  This meta-test
    enumerates every dict named *_cache in the operator/entry modules
    and asserts its name appears in the clear function's source, so
    adding a cache without registering it fails loudly here."""
    import importlib
    import inspect
    import pkgutil

    import bench
    from dataforge_core_spark import operators

    src = inspect.getsource(bench._clear_operator_caches)
    missing = []
    # enumerate the PACKAGE, not a hardcoded module list — a cache in
    # a brand-new operator module must not escape the guard
    mods = [
        importlib.import_module(f"dataforge_core_spark.operators.{m.name}")
        for m in pkgutil.iter_modules(operators.__path__)
    ]
    assert len(mods) >= 11, "operator package enumeration looks broken"
    for mod in mods:
        for name, val in vars(mod).items():
            if name.endswith("_cache") and isinstance(val, dict):
                if f"{mod.__name__.rsplit('.', 1)[-1]}.{name}" not in src:
                    missing.append(f"{mod.__name__}.{name}")
    # the entry module's hub cache is cleared as entry._hub_cache
    import __spark_entry__ as entry

    if "_hub_cache" not in src or not hasattr(entry, "_hub_cache"):
        missing.append("__spark_entry__._hub_cache")
    assert not missing, (
        "caches unknown to bench._clear_operator_caches: " + ", ".join(missing)
    )
