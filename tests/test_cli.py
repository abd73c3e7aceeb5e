"""CLI surface parity (--init / --version; build/run/validate are
exercised end-to-end by the sql-emitter and oracle suites)."""

import os
import tempfile

from dataforge_core_spark.cli import main


def test_version(capsys):
    assert main(["--version"]) == 0
    from dataforge_core_spark import __version__

    assert capsys.readouterr().out.strip() == __version__


def test_init_scaffolds_sample_project(capsys):
    target = os.path.join(tempfile.mkdtemp(prefix="dfspark_cli_"), "proj")
    assert main(["--init", target]) == 0
    assert os.path.exists(os.path.join(target, "meta.yaml"))
    assert os.path.isdir(os.path.join(target, "sources"))
    # refuses to clobber a non-empty directory
    assert main(["--init", target]) == 1


def test_configure_writes_profile_from_env(tmp_path, monkeypatch):
    """--configure (non-TTY) builds the profile from env vars and saves
    the reference's profile.yaml shape; --run-sql --backend databricks
    loads it (validated structurally — no warehouse in this container)."""
    import yaml

    from dataforge_core_spark.cli import main

    prof = tmp_path / "profile.yaml"
    for k, v in {
        "HOSTNAME": "dbc.example.com",
        "HTTP_PATH": "/sql/1.0/warehouses/abc",
        "ACCESS_TOKEN": "tok",
        "SCHEMA": "demo",
    }.items():
        monkeypatch.setenv(f"DATAFORGE_DATABRICKS_{k}", v)
    rc = main(["--configure", "--profile", str(prof)])
    assert rc == 0
    cfg = yaml.safe_load(prof.read_text())["databricks"]
    assert cfg["hostname"] == "dbc.example.com"
    assert cfg["catalog"] == "hive_metastore"  # reference default
    assert cfg["schema"] == "demo"
