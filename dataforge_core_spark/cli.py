"""CLI — the reference's ``dataforge`` command surface, Spark-native.

    python -m dataforge_core_spark.cli --build <project_dir> [--target DIR]
    python -m dataforge_core_spark.cli --run <project_dir> [--out DIR]
    python -m dataforge_core_spark.cli --validate <project_dir>

--build   : compile and write target/sources/*.sql, target/outputs/*.sql,
            target/run.sql (importProject.py:125-150 artifact layout) —
            no Spark session needed for planning; probe validation is
            part of --validate.
--run     : execute the compiled pipelines on a local session and
            materialize hubs + outputs as parquet (the reference's --run
            sends run.sql to a Databricks warehouse; ours runs in-process).
--validate: probe-based type inference for every rule and boolean checks
            for relation predicates and channel filters (importProject.py
            :81-111 loop).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dataforge-spark")
    p.add_argument("--build", metavar="PROJECT_DIR")
    p.add_argument("--run", metavar="PROJECT_DIR")
    p.add_argument(
        "--run-sql",
        metavar="TARGET_DIR",
        help="execute a built TARGET_DIR/run.sql statement-by-statement "
        "on a warehouse backend (the reference's --run path, "
        "databricks_sql.py:20-31); local Spark unless --backend",
    )
    p.add_argument(
        "--backend",
        choices=["spark", "databricks"],
        default="spark",
        help="warehouse backend for --run-sql",
    )
    p.add_argument("--validate", metavar="PROJECT_DIR")
    p.add_argument(
        "--import",
        dest="import_dir",
        metavar="PROJECT_DIR",
        help="diff-import the project into a metadata store: upsert by "
        "name, delete objects missing from the import, cascade-delete "
        "dependents (the reference's stateful import — impc_execute.sql)",
    )
    p.add_argument(
        "--state",
        default=".dataforge_state",
        help="metadata store directory for --import",
    )
    p.add_argument(
        "--init",
        metavar="PROJECT_DIR",
        help="scaffold a sample project (the reference's --init, "
        "mainConfig.py:43)",
    )
    p.add_argument(
        "--configure",
        action="store_true",
        help="save a Databricks SQL Warehouse connection profile "
        "(interactive on a TTY; otherwise from DATAFORGE_DATABRICKS_* "
        "env vars) — the reference's --configure (mainConfig.py:115-129) "
        "minus its Postgres section, which the stateless design and the "
        "--import MetaStore replace",
    )
    p.add_argument(
        "--profile",
        metavar="PATH",
        default=None,
        help="connection profile path (default ~/Dataforge/profile.yaml, "
        "the reference's location); used by --run-sql --backend "
        "databricks",
    )
    p.add_argument(
        "--from-state",
        action="store_true",
        help="treat the --build/--run path as a MetaStore state dir and "
        "compile from imported metadata (the reference's flow: --import "
        "into the metadata DB, then build from it)",
    )
    p.add_argument(
        "--seed",
        action="store_true",
        help="drop and re-initialize the metadata store in --state (the "
        "reference's --seed drops/recreates its meta+log Postgres "
        "schemas — mainConfig.py:44, pg.py:38-52; the MetaStore dir is "
        "their stateless replacement).  Unlike the reference, "
        "--configure does NOT imply --seed: there is no database to "
        "re-deploy",
    )
    p.add_argument("--version", action="store_true")
    p.add_argument("--target", default="target", help="--build output dir")
    p.add_argument("--out", default="out", help="--run materialization dir")
    p.add_argument(
        "--data-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="substituted for ${DATA_DIR} in source_table",
    )
    args = p.parse_args(argv)

    from dataforge_core_spark.loader import load_project as _load_yaml

    def load_project(path: str):
        if args.from_state:
            from dataforge_core_spark.imports import MetaStore

            return MetaStore(path).to_project()
        return _load_yaml(path)

    subs = {"DATA_DIR": args.data_dir}

    def _profile_path() -> str:
        if args.profile:
            return args.profile
        home = os.environ.get("APPDATA") or os.environ.get("HOME", ".")
        return os.path.join(home, "Dataforge", "profile.yaml")

    if args.configure:
        import yaml

        from dataforge_core_spark.backends import DatabricksWarehouse

        cfg: dict = {}
        if sys.stdin.isatty():
            defaults = {"catalog": "hive_metastore"}
            prompts = {
                "hostname": "Enter Server hostname: ",
                "http_path": "Enter HTTP path: ",
                "access_token": "Enter access token: ",
                "catalog": "Enter catalog name: ",
                "schema": "Enter schema name: ",
            }
            for key in DatabricksWarehouse.REQUIRED:
                raw = input(prompts[key]).strip()
                cfg[key] = raw or defaults.get(key, "")
        else:
            for key in DatabricksWarehouse.REQUIRED:
                v = os.environ.get(f"DATAFORGE_DATABRICKS_{key.upper()}")
                if v is not None:
                    cfg[key] = v
            cfg.setdefault("catalog", "hive_metastore")
            missing = [k for k in DatabricksWarehouse.REQUIRED if k not in cfg]
            if missing:
                print(
                    "Missing required configuration value(s): "
                    + ", ".join(missing)
                    + " (set "
                    + ", ".join(
                        f"DATAFORGE_DATABRICKS_{k.upper()}" for k in missing
                    )
                    + ")"
                )
                return 1
        path = _profile_path()
        if os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            yaml.dump({"databricks": cfg}, f, default_flow_style=False)
        print(f"Profile saved in {path}")
        return 0

    if args.version:
        from dataforge_core_spark import __version__

        print(__version__)
        return 0

    if args.seed:
        from dataforge_core_spark.imports import _STATE_FILE, MetaStore
        from dataforge_core_spark.probe import ProbeStore

        state_file = os.path.join(args.state, _STATE_FILE)
        probe_file = os.path.join(args.state, ProbeStore.FILE)
        existing = [f for f in (state_file, probe_file) if os.path.isfile(f)]
        if existing:
            # confirm-before-drop parity (pg.py:42-44)
            try:
                reply = input(
                    f"All objects in state dir {args.state} will be "
                    "deleted. Do you want to continue (y/n)? "
                )
            except EOFError:
                reply = "n"
            if reply.strip().lower() not in ("y", "yes"):
                return 1
            for f in existing:
                os.remove(f)
        # verbatim progress messages (pg.py:49,52)
        print("Initializing database..")
        MetaStore(args.state).save()
        print("Database initialized")
        return 0

    if args.init:
        import shutil

        sample = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "projects",
            "tpch_demo",
        )
        if os.path.exists(args.init) and os.listdir(args.init):
            print(f"Refusing to init into non-empty directory {args.init!r}")
            return 1
        shutil.copytree(sample, args.init, dirs_exist_ok=True)
        print(f"Initialized sample project at {args.init}")
        return 0

    if args.build:
        from dataforge_core_spark.imports import MetaStore
        from dataforge_core_spark.probe import set_probe_store
        from dataforge_core_spark.session import get_spark
        from dataforge_core_spark.sql_emitter import SqlEmitter

        set_probe_store(MetaStore(args.state).probe_store())
        project = load_project(args.build)
        # a local session is part of --build, as in the reference (type
        # probes run on local Spark at import time — miniSparky.py)
        spark = get_spark(app_name="dataforge_build")
        SqlEmitter(project, subs, spark=spark).emit_all(args.target)
        print(f"Build completed successfully: {args.target}/run.sql")
        return 0

    if args.import_dir:
        import json as _json

        from dataforge_core_spark.imports import MetaStore, import_project

        project = load_project(args.import_dir)
        store = MetaStore(args.state)
        report = import_project(store, project)
        if "error" in report:
            print(_json.dumps(report))
            return 1
        for line in report["log"]:
            print(line)
        return 0

    if args.validate:
        from dataforge_core_spark.imports import MetaStore
        from dataforge_core_spark.probe import (
            set_probe_store,
            validate_project,
        )
        from dataforge_core_spark.session import get_spark

        project = load_project(args.validate)
        spark = get_spark(app_name="dataforge_validate")
        # persist inferred types across runs in the MetaStore state dir
        # (the reference stores them in its metadata DB —
        # impc_update_test_results.sql:80-83): a re-validate of an
        # unchanged project issues zero probe jobs
        set_probe_store(MetaStore(args.state).probe_store())
        failures = 0
        for row in validate_project(spark, project):
            if row["status"] == "error":
                failures += 1
                print(f"ERROR {row['kind']} {row['name']}: {row['message']}")
            elif row["status"] == "warning":
                print(f"WARN  {row['kind']} {row['name']}: {row['message']}")
            else:
                print(f"ok    {row['kind']} {row['name']}: {row['data_type']}")
        if failures:
            print(f"Validation failed: {failures} errors")
            return 1
        print("Import completed successfully")
        return 0

    if args.run_sql:
        from dataforge_core_spark.backends import (
            BackendError,
            DatabricksWarehouse,
            SparkWarehouse,
        )

        run_file = os.path.join(args.run_sql, "run.sql")
        try:
            if args.backend == "databricks":
                # profile file first (reference flow: --configure saves,
                # --run loads), env vars override per key
                cfg = {}
                ppath = _profile_path()
                if os.path.isfile(ppath):
                    import yaml

                    with open(ppath) as f:
                        cfg.update(
                            (yaml.safe_load(f) or {}).get("databricks", {})
                        )
                for k in DatabricksWarehouse.REQUIRED:
                    v = os.environ.get(f"DATAFORGE_DATABRICKS_{k.upper()}")
                    if v is not None:
                        cfg[k] = v
                backend = DatabricksWarehouse(cfg, log_path=args.run_sql)
            else:
                from dataforge_core_spark.session import get_spark

                backend = SparkWarehouse(
                    get_spark(app_name="dataforge_run_sql"),
                    log_path=args.run_sql,
                )
            backend.run(run_file)
        except BackendError as e:
            print(str(e))
            return 1
        print("Execution completed successfully")
        return 0

    if args.run:
        from dataforge_core_spark.runner import ProjectRunner
        from dataforge_core_spark.session import get_spark

        project = load_project(args.run)
        spark = get_spark(app_name="dataforge_run")
        runner = ProjectRunner(spark, project, subs)
        paths = runner.materialize(args.out)
        for name, path in sorted(paths.items()):
            print(f"wrote {name} -> {path}")
        print("Execution completed successfully")
        return 0

    p.print_help()
    return 2


if __name__ == "__main__":
    sys.exit(main())
