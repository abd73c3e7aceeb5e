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


def test_index_deps_cover_every_builder():
    """_INDEX_DEPS must stay in 1:1 sync with _index_builders() (the
    concurrent scheduler derives its DAG from the dict, so a builder
    missing there dies at phase start) and every edge must point at a
    real builder that precedes its dependent in the sequential order
    (the fallback path must also satisfy the DAG)."""
    bench = _bench("/root/testdata/sf0.001")
    order = [name for name, _ in bench._index_builders()]
    assert set(order) == set(bench._INDEX_DEPS)
    pos = {n: i for i, n in enumerate(order)}
    for name, deps in bench._INDEX_DEPS.items():
        for d in deps:
            assert d in pos, f"{name} depends on unknown builder {d}"
            assert pos[d] < pos[name], (
                f"sequential order violates edge {d} -> {name}"
            )


def test_concurrent_index_scheduler_respects_deps(monkeypatch):
    """Drive _run_index_builds with a fake diamond DAG and record
    completion order: no builder may start before its deps completed,
    and every builder must run exactly once."""
    import threading
    import time as _t

    bench = _bench("/root/testdata/sf0.001")
    lock = threading.Lock()
    events: list[tuple[str, str]] = []

    def mk(name, delay):
        def thunk(_s):
            with lock:
                events.append(("start", name))
            _t.sleep(delay)
            with lock:
                events.append(("end", name))

        return thunk

    fake = [
        ("a", mk("a", 0.05)),
        ("b", mk("b", 0.01)),
        ("c", mk("c", 0.01)),
        ("d", mk("d", 0.01)),
    ]
    deps = {"a": [], "b": ["a"], "c": ["a"], "d": ["b", "c"]}
    monkeypatch.setattr(bench, "_index_builders", lambda: fake)
    monkeypatch.setattr(bench, "_INDEX_DEPS", deps)
    times, wall = bench._run_index_builds(None)
    assert set(times) == {"a", "b", "c", "d"}
    assert wall > 0
    ended = set()
    for kind, name in events:
        if kind == "end":
            ended.add(name)
        else:
            missing = [d for d in deps[name] if d not in ended]
            assert not missing, f"{name} started before {missing}"
    assert sum(1 for k, n in events if k == "start") == 4
