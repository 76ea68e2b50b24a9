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
