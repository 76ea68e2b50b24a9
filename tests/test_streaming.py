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
