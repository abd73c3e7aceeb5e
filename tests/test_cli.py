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
