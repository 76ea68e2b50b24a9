"""Registry smoke tests — the round-1 failure class (a module-level
error silently zeroing the whole driver contract) becomes one red test
here instead of a wasted round."""

from __future__ import annotations

import pytest


def test_entry_module_imports():
    import __spark_entry__ as entry

    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert len(qs) >= 30
    # every oracle key is a registered query
    assert set(os_) <= set(qs)


def test_fold_table_aligned():
    from tijdloze_musicbrainz_spark.functions import normalize

    assert len(normalize._ACCENTED) == len(normalize._FOLDED)
    assert normalize._FOLDED.isascii()


def test_every_oracle_parses_in_duckdb(duck):
    import __spark_entry__ as entry

    failures = {}
    for name, sql in entry.oracle_sql().items():
        try:
            duck.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as exc:  # noqa: BLE001
            failures[name] = str(exc).splitlines()[0]
    assert not failures, f"oracle SQL fails to parse/bind: {failures}"


@pytest.mark.slow
def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_pythonpath_export_copies_agree(tmp_path):
    """__spark_entry__ carries a deliberate inline copy of
    session.export_worker_pythonpath (it must not import the package
    at module scope). The foreign-cwd test exercises only the
    entry-module copy, so drift in the session copy would go uncaught
    (r11 ADVICE). Run each copy in a fresh process under a scrubbed
    PYTHONPATH and pin that both export the SAME repo root, and that
    both are idempotent (no duplicate entry on re-run)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    outs = {}
    for label, body in {
        "entry": "import __spark_entry__\n",
        "session": (
            "from tijdloze_musicbrainz_spark.session import"
            " export_worker_pythonpath\n"
            "export_worker_pythonpath()\n"
            "export_worker_pythonpath()\n"
        ),
    }.items():
        script = (
            "import os, sys; sys.path.insert(0, %r)\n" % repo
            + body
            + "print('PP::' + os.environ['PYTHONPATH'])\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", script],
            cwd=tmp_path,
            env=env,
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        outs[label] = [
            ln for ln in out.stdout.splitlines() if ln.startswith("PP::")
        ][0].removeprefix("PP::")
    assert outs["entry"] == outs["session"] == repo


def test_python_worker_queries_survive_foreign_cwd(tmp_path):
    """Python WORKERS resolve imports from the env PYTHONPATH the JVM
    inherits, not the driver's sys.path — so a consumer that starts
    its process outside the repo (the verify recipe runs from /tmp)
    used to get worker-side ModuleNotFoundError on every mapInPandas /
    Python-datasource query. __spark_entry__ now exports the repo root
    into PYTHONPATH at import time (before the JVM exists); this pins
    that contract with a genuinely fresh process, foreign cwd, and a
    scrubbed PYTHONPATH, running the cheapest Python-worker query."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __spark_entry__ as entry\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "         .config('spark.sql.shuffle.partitions', '2')\n"
        "         .config('spark.ui.enabled', 'false').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "n = entry.queries()['multimodal_jpeg_decode_real'](\n"
        "    spark, '/root/testdata/sf0.001').count()\n"
        "print('WORKER_OK', n)\n" % repo
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "WORKER_OK" in out.stdout, out.stderr[-2000:]
