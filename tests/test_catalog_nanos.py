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


def _write_nanos_events(tmp_path):
    """A tiny TIMESTAMP(NANOS) events file — the rounds-1-3 testdata
    vintage, which the driver no longer ships (r4 moved to naive
    micros) but load_table/stream_events still promise to read."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_700_000_000_000_000_000
    ts = pa.array(
        np.array([base + i * 10**9 for i in range(5)], dtype="int64"),
        type=pa.timestamp("ns"),
    )
    table = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["click"] * 5),
            "value": pa.array([1.0] * 5),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_nanos_vintage_batch_load(spark, tmp_path):
    df = load_table(spark, _write_nanos_events(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = df.select("ts").orderBy("event_id").collect()
    assert rows[0]["ts"].isoformat() == "2023-11-14T22:13:20"
    assert spark.conf.get(KEY, None) in (None, "false")


def test_nanos_vintage_stream_source(spark, tmp_path):
    from tijdloze_musicbrainz_spark.streaming.jobs import (
        run_stream_to_memory,
        stream_events,
    )

    sf_dir = _write_nanos_events(tmp_path)
    out = run_stream_to_memory(
        stream_events(spark, sf_dir).select("event_id", "ts"),
        output_mode="append",
    )
    rows = {r["event_id"]: r["ts"] for r in out.collect()}
    assert len(rows) == 5
    assert rows[0].isoformat() == "2023-11-14T22:13:20"
    # the legacy conf leak is confined to the nanos path by design;
    # restore for later tests in this session
    spark.conf.unset(KEY)
