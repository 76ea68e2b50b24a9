"""Streaming twins: the windowed agg is oracle-checked via the
registry; here we check the custom stateful sessionizer
(applyInPandasWithState) against the batch sessionization — closed
streaming sessions must exactly equal the batch sessions minus each
user's final (never-closed) session."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_sessionize_stream_matches_batch(spark, sf_dir):
    from tijdloze_musicbrainz_spark.plans.events import events_sessionize
    from tijdloze_musicbrainz_spark.streaming import (
        run_stream_to_memory,
        sessionize_stream,
        stream_events,
    )

    streamed = run_stream_to_memory(
        sessionize_stream(stream_events(spark, sf_dir)), output_mode="append"
    )
    got = {
        (r["user_id"], r["session_start_epoch"], r["n_events"], r["total_value"])
        for r in streamed.collect()
    }

    batch = events_sessionize(spark, sf_dir)
    w_last = F.max("session_seq").over(Window.partitionBy("user_id"))
    closed = batch.withColumn("__last", w_last).filter(
        F.col("session_seq") < F.col("__last")
    )
    want = {
        (r["user_id"], r["session_start_epoch"], r["n_events"], r["total_value"])
        for r in closed.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_upsert_sink(spark, sf_dir, tmp_path_factory):
    import shutil

    from tijdloze_musicbrainz_spark.streaming import stream_events
    from tijdloze_musicbrainz_spark.streaming.jobs import stream_upsert_to_parquet

    base = str(tmp_path_factory.mktemp("stream_upsert"))
    target = f"{base}/events_latest"
    shutil.rmtree(f"{target}__checkpoint", ignore_errors=True)

    # keep the latest event per user via the streaming upsert
    stream = stream_events(spark, sf_dir).select("user_id", "event_id", "ts")
    stream_upsert_to_parquet(
        stream.withColumn("seq", F.col("event_id")),
        target,
        keys=["user_id"],
        priority_col="seq",
    )
    got = {
        (r["user_id"], r["event_id"])
        for r in spark.read.parquet(target).collect()
    }

    from tijdloze_musicbrainz_spark.plans.util import t as load

    ev = load(spark, sf_dir, "events")
    want = {
        (r["user_id"], r["max(event_id)"])
        for r in ev.groupBy("user_id").agg({"event_id": "max"}).collect()
    }
    assert got == want
