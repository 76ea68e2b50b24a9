"""Regression tests for the scoped nanosAsLong override in
catalog.load_table (round-3 ADVICE): the conversion must be pinned at
analysis time so actions AFTER the conf restore still see timestamps,
the conf must actually be restored, and concurrent loads must not leak
the override."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from tijdloze_musicbrainz_spark.catalog import load_table

KEY = "spark.sql.legacy.parquet.nanosAsLong"


def test_events_action_after_conf_restore(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    # conf restored immediately after the load
    assert spark.conf.get(KEY, None) in (None, "false")
    # the action runs AFTER the restore and must still yield timestamps
    row = df.select("ts").limit(1).collect()[0]
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert row["ts"] is not None


def test_concurrent_event_loads_do_not_leak_conf(spark, sf_dir):
    def one(_):
        df = load_table(spark, sf_dir, "events")
        return dict(df.dtypes)["ts"], df.select("ts").limit(1).collect()[0]["ts"]

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one, range(16)))
    assert all(dtype == "timestamp" and ts is not None for dtype, ts in results)
    assert spark.conf.get(KEY, None) in (None, "false")
