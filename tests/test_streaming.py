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


def test_bucketed_upsert_touches_only_its_buckets(spark, tmp_path_factory):
    """A micro-batch whose keys hash to one bucket must rewrite that
    one bucket directory and leave every other bucket's files alone
    (round-3 verdict #3: per-batch work is O(touched buckets), not
    O(target))."""
    import os

    from tijdloze_musicbrainz_spark.operators.upsert import (
        N_MERGE_BUCKETS as N_UPSERT_BUCKETS,
        merge_upsert_bucketed as merge_batch_into_bucketed_parquet,
    )

    base = str(tmp_path_factory.mktemp("bucketed_upsert"))
    target = f"{base}/t"
    full = spark.range(500).selectExpr("id as k", "id as seq", "id * 2 as v")
    touched = merge_batch_into_bucketed_parquet(full, target, ["k"], "seq")
    assert touched == list(range(N_UPSERT_BUCKETS))  # 500 keys cover all buckets

    def bucket_sig(d):
        p = os.path.join(target, d)
        return sorted((f, os.path.getmtime(os.path.join(p, f))) for f in os.listdir(p))

    before = {d: bucket_sig(d) for d in os.listdir(target) if d.startswith("__bucket=")}

    one = spark.createDataFrame([(7, 10_000, 99)], "k long, seq long, v long")
    touched2 = merge_batch_into_bucketed_parquet(one, target, ["k"], "seq")
    assert len(touched2) == 1
    changed = {
        d
        for d in before
        if bucket_sig(d) != before[d]
    }
    assert changed == {f"__bucket={touched2[0]}"}

    got = {(r["k"], r["seq"]) for r in spark.read.parquet(target).collect()}
    assert (7, 10_000) in got
    assert len(got) == 500  # every other key survived the single-bucket merge


def test_checkpoint_restart_processes_only_new_files(spark, sf_dir, tmp_path_factory):
    """Exactly-once across restarts: a file-source stream drained with
    availableNow + a persistent checkpoint must, on restart after new
    files arrive, process ONLY the new files — the checkpointed source
    offsets carry across query instances, so no event is double-counted
    in an idempotent-append sink."""
    from pyspark.sql import functions as F

    root = tmp_path_factory.mktemp("ckpt_restart")
    src = f"{root}/src"
    sink = f"{root}/sink"
    ckpt = f"{root}/ckpt"

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    first, second = (d.coalesce(1) for d in ev.randomSplit([0.5, 0.5], seed=7))
    n_first = first.count()
    n_total = ev.count()
    first.write.mode("overwrite").parquet(src)

    schema = "event_id bigint, user_id bigint, value double"

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(sink).count() == n_first

    # new file lands; SAME checkpoint — restart must pick up only it
    second.write.mode("append").parquet(src)
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == n_total  # nothing reprocessed, nothing lost
    assert out.select(F.countDistinct("event_id")).first()[0] == n_total
