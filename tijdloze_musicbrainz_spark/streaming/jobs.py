"""Structured Streaming jobs over the events table (SURVEY §7 /
brief: streams as first-class). Each batch plan in ``plans.events``
has a streaming twin here built from the same expressions:

- file-source ``readStream`` with an EXPLICIT schema (streaming
  sources cannot infer), ``pathGlobFilter`` so only the events file
  in the sf dir is picked up;
- event-time tumbling window + watermark for late data;
- gap sessionization via ``applyInPandasWithState`` (the custom
  stateful operator path Spark's built-ins don't cover);
- ``availableNow`` trigger + memory sink to drain a bounded backlog
  and hand the result back as a normal DataFrame — which is how the
  registered query ``streaming_tumbling_window`` gets oracle-checked
  against the SAME DuckDB SQL as its batch twin.

At scale the file source becomes Kafka and the memory sink becomes a
parquet/Delta sink with checkpointing; the middle of the plan — the
part that matters — is unchanged.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.dedup import _JACCARD_ALLPAIRS_ORACLE
from ..plans.registry import register
from ..plans.util import values_df

# Explicit source schema (streaming sources cannot infer). The driver
# testdata has shipped events.ts both as TIMESTAMP(NANOS) (rounds 1-3)
# and naive TIMESTAMP(MICROS) (round 4): probe the file's physical
# type with one batch schema read, then declare ts accordingly —
# long nanos truncated to micros under the legacy conf, or NTZ micros
# cast to the session-tz timestamp (UTC session, so values unchanged).
def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _events_raw_ts_dtype(spark: SparkSession, sf_dir: str) -> str:
    """Spark dtype of events.ts on a BARE batch read (no legacy conf):
    'timestamp'/'timestamp_ntz' for the micros vintage, 'bigint' if the
    legacy conf is already set session-wide, or 'nanos' when the bare
    read refuses the TIMESTAMP(NANOS) physical type. Only the specific
    nanos refusal is treated as the nanos signal — any other probe
    failure (missing path, permissions, corrupt footer) re-raises, so
    a broken source cannot silently flip the session-global legacy
    conf in stream_events."""
    try:
        return dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]
    except Exception as exc:
        msg = str(exc)
        if "NANOS" in msg or "Illegal Parquet type" in msg:
            return "nanos"
        raise


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    dtype = _events_raw_ts_dtype(spark, sf_dir)
    if dtype in ("timestamp", "timestamp_ntz"):
        ts_type = (
            T.TimestampNTZType() if dtype == "timestamp_ntz" else T.TimestampType()
        )
        raw = (
            spark.readStream.schema(_events_stream_schema(ts_type))
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    # nanos vintage: stream the physical long and truncate to micros
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_events_stream_schema(T.LongType()))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def windowed_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 10-min window per event_type with a late-data
    watermark — identical aggregation expressions to the batch
    events_tumbling_window plan."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias(
                "window_start_epoch"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful operator: gap-based sessions per user via
    applyInPandasWithState (what window()/session_window can't express
    when the emission logic is custom). Emits closed sessions."""
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "user_id bigint, session_start_epoch bigint, n_events bigint, "
        "total_value double"
    )
    # `total` carries the running session value in integer MICROS
    # (stored in the double slot — exact up to 2^53): integer
    # accumulation is order-free and matches the batch twin's
    # DECIMAL(25,6) semantics exactly, where the old per-row float
    # `+=` only matched after rounding.
    state_schema = "start bigint, last bigint, n bigint, total double"

    def fn(key, pdf_iter, state: GroupState):
        # Vectorized gap detection (round-3 verdict #4): session
        # boundaries for the whole Arrow batch come from one
        # np.flatnonzero over the gap mask and per-segment sums from
        # cumsum differences — the Python loop runs per SESSION
        # (emitted row), not per event, so a 10^6-event batch with a
        # handful of sessions does ~all its work inside numpy.
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        if state.exists:
            start0, last0, n0, total_us = state.get
            total_us = int(total_us)
            have = True
        else:
            start0 = last0 = n0 = total_us = 0
            have = False
        rows = []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("ts")
            ts = pdf["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
            val_us = np.rint(
                pdf["value"].to_numpy(dtype=np.float64) * 1_000_000
            ).astype(np.int64)
            if not have:
                start0, last0, n0, total_us = int(ts[0]), int(ts[0]), 0, 0
                have = True
            prev = np.concatenate(([last0], ts[:-1]))
            seg = np.concatenate(
                ([0], np.flatnonzero((ts - prev) > gap_seconds), [len(ts)])
            )
            cum = np.concatenate(([0], np.cumsum(val_us)))
            # segment 0 extends the carried-over open session
            n0 += int(seg[1] - seg[0])
            total_us += int(cum[seg[1]] - cum[seg[0]])
            for j in range(1, len(seg) - 1):
                # round-half-away-from-zero on the exact micros —
                # bit-identical to the batch twin's round(DECIMAL, 2)
                # (Python's round() is half-even and would diverge on
                # exact .xx5 ties)
                cents = (abs(total_us) + 5000) // 10000
                rows.append(
                    (key[0], start0, n0, (cents if total_us >= 0 else -cents) / 100.0)
                )
                a, b = int(seg[j]), int(seg[j + 1])
                start0, n0, total_us = int(ts[a]), b - a, int(cum[b] - cum[a])
            last0 = int(ts[-1])
        if have:
            state.update((start0, last0, n0, float(total_us)))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id",
                    "session_start_epoch",
                    "n_events",
                    "total_value",
                ],
            )

    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# State-store partition count for the drained streams. A stateful
# operator creates ONE state store per shuffle partition and pays its
# init + delta-file commit PER PARTITION PER MICRO-BATCH — with the
# batch session's 32 shuffle partitions every micro-batch of a
# few-hundred-row stream ran 32 state tasks of pure store overhead
# (measured: streaming_static_join_zscore 7.0 s at 32 -> 3.0 s at 4,
# same box, same results — grouped-agg output is partition-count
# independent). State partitioning is a real sizing decision at
# production (partitions ~ state volume / target store size, fixed at
# first checkpoint), so it is its own knob, decoupled from the batch
# shuffle default and fixed across SPARK_GRAFT_CPUS values so the
# driver's low-core bench sees the same stream plan.
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)


def run_stream_to_memory(
    df: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Drain a bounded stream (availableNow) into a memory sink and
    return the result as a batch DataFrame. The stream plan is
    started under STREAM_STATE_PARTITIONS (see note above); the
    session's batch shuffle setting is restored after the drain.

    SINGLE-THREADED DRAIN ASSUMPTION (r15 ADVICE): the set/restore
    mutates session-global conf, so a query PLANNED concurrently on
    this session during the drain would silently pick up the stream's
    partition count, and nested/overlapping drains would restore a
    stale value. Every caller in this engine is a registered builder
    running on the driver thread (builders never overlap inside one
    bench/sweep/driver process), so the window is provably
    single-threaded today. If a concurrent-drain caller ever appears,
    run the drain on a ``spark.newSession()`` clone — per-session
    conf, same shared context — instead of adding a lock here."""
    table = name or f"stream_{uuid.uuid4().hex[:12]}"
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
    )
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(table)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return df.sparkSession.table(table)


@register(
    "streaming_tumbling_window",
    survey_ids=("A1",),
    oracle="""
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 2) AS total_value
FROM events WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
    doc="The streaming path end-to-end: readStream(parquet, explicit "
    "schema) -> watermark -> tumbling window agg -> availableNow "
    "drain to memory sink — checked against the SAME oracle as the "
    "batch twin, proving batch/stream parity.",
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_memory(windowed_counts(stream_events(spark, sf_dir)))


def stream_upsert_to_parquet(
    stream: DataFrame,
    path: str,
    keys: list[str],
    priority_col: str,
    n_buckets: int | None = None,
) -> None:
    """Stream → idempotent sink: every micro-batch merges into the
    bucket-partitioned parquet target with last-writer-wins semantics
    (foreachBatch + ``operators.upsert.merge_upsert_bucketed``, the
    same incremental MERGE the batch path uses — round-3 verdict #3:
    only the buckets a batch touches are read or rewritten, never the
    whole target). Exactly-once effect under retries: a replayed batch
    re-merges the same rows and the dedup keeps the same winners."""
    from ..operators.upsert import N_MERGE_BUCKETS, merge_upsert_bucketed  # noqa: PLC0415

    n = n_buckets if n_buckets is not None else N_MERGE_BUCKETS

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert_bucketed(batch_df, path, keys, priority_col, n)

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", f"{path}__checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@register(
    "streaming_sessionize",
    survey_ids=("A1",),
    oracle="""
WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
                   > 1800
              OR lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
s AS (
  SELECT *, sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM d
),
agg AS (
  SELECT user_id, session_seq,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
         CAST(count(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, session_seq
)
SELECT user_id, session_start_epoch, n_events
FROM agg
QUALIFY session_seq < max(session_seq) OVER (PARTITION BY user_id)
""",
    doc="The custom stateful streaming operator end-to-end: "
    "applyInPandasWithState gap-sessions (streaming.jobs."
    "sessionize_stream) drained with availableNow. The operator emits "
    "only CLOSED sessions (each user's live session stays in state), "
    "so the oracle is batch sessionization at the operator's "
    "second-granularity gap semantics minus each user's final "
    "session. Deterministic columns only (session membership is "
    "integer-second arithmetic); the float-accumulated total_value "
    "is covered by tests/test_streaming.py, not the hash compare.",
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_stream_to_memory(
        sessionize_stream(stream_events(spark, sf_dir)), output_mode="append"
    )
    return out.select("user_id", "session_start_epoch", "n_events")


@register(
    "streaming_upsert_roundtrip",
    survey_ids=("S7", "A10"),
    oracle="""
SELECT user_id, event_type, event_id, round(value, 2) AS value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, event_type ORDER BY event_id DESC) = 1
""",
    doc="Streaming sink round-trip: readStream -> foreachBatch merge "
    "into a parquet target with last-writer-wins per (user_id, "
    "event_type) (winner = highest event_id, the append order) -> "
    "read the target back. The streaming twin of s7_upsert_roundtrip; "
    "exactly-once effect under retries because a replayed batch "
    "re-merges to the same winners.",
)
def streaming_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415

    from ..plans.etl import SINK_ROOT  # noqa: PLC0415

    # per-sf path: the checkpoint + target carry state across calls in
    # one process, so two sf_dirs must not share them (the batch sinks
    # are overwrite-first and don't need this)
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"{SINK_ROOT}/streaming_upsert_{tag}"
    stream = stream_events(spark, sf_dir).select(
        "user_id", "event_type", "event_id", "value"
    )
    stream_upsert_to_parquet(
        stream, path, keys=["user_id", "event_type"], priority_col="event_id"
    )
    out = spark.read.parquet(path)
    return out.select(
        "user_id", "event_type", "event_id", F.round("value", 2).alias("value")
    )


@register(
    "streaming_dedup_keys",
    survey_ids=("S8",),
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
    doc="Streaming exact dedup — the insert-if-absent (S8) twin on a "
    "stream: dropDuplicates keyed state keeps the FIRST arrival per "
    "(user_id, event_type) and suppresses the rest across "
    "micro-batches. Only the key columns are emitted because "
    "first-arrival is a partition race for the non-key columns; the "
    "key SET is deterministic and equals batch DISTINCT. NOTE: with "
    "the event-time column absent from the dedup keys this state is "
    "UNBOUNDED (the watermark never evicts it) — the exact-global "
    "semantics. The bounded scale path is "
    "streaming_dedup_within_watermark below.",
)
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = stream_events(spark, sf_dir).select("user_id", "event_type", "ts")
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(
        ["user_id", "event_type"]
    )
    out = run_stream_to_memory(deduped, output_mode="append")
    return out.select("user_id", "event_type")


@register(
    "streaming_dedup_within_watermark",
    survey_ids=("S8",),
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
    doc="BOUNDED-STATE streaming dedup (r8 — the scale path the "
    "streaming_dedup_keys doc promised): dropDuplicatesWithinWatermark "
    "holds a key's state only until the watermark passes its first "
    "arrival + delay, so dedup-at-ingest state is O(keys per "
    "watermark window), not O(all keys ever) — the difference between "
    "a bounded state store and an OOM at 100 TB/day. Contract: exact "
    "dedup for duplicates arriving within the delay; a duplicate "
    "arriving after its key's state was evicted is re-emitted "
    "(tests/test_streaming.py proves the eviction with a 4-micro-"
    "batch replay). On this single-drain source the watermark never "
    "overtakes any key mid-run, so the emitted key set equals batch "
    "DISTINCT and the oracle is exact.",
)
def streaming_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    stream = stream_events(spark, sf_dir).select("user_id", "event_type", "ts")
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    out = run_stream_to_memory(deduped, output_mode="append")
    return out.select("user_id", "event_type").distinct()


@register(
    "streaming_hypertable_rollup",
    survey_ids=(),
    oracle="""
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="The CONTINUOUS AGGREGATE end-to-end: the streaming job "
    "maintains the HOURLY tier (readStream -> watermark -> 1-hour "
    "tumbling window, count + exact-DECIMAL sum), the tier is drained "
    "to the sink, and the day-level answer is a BATCH re-aggregation "
    "over the tier — while the oracle aggregates the raw events table "
    "directly. Hash-equality proves the hypertable contract: counts "
    "add, DECIMAL sums add exactly, rounding happens only at the end, "
    "so serving dashboards from the incrementally-maintained rollup "
    "is bit-identical to scanning the raw data. This is the streaming "
    "twin of events_hypertable_rollup; at 100 TB the memory sink is a "
    "parquet/Delta table partitioned by hour and the day query reads "
    "~1/3600th of the rows.",
)
def streaming_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("s"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("hour_epoch"),
            "event_type",
            "n",
            "s",
        )
    )
    tier = run_stream_to_memory(hourly)
    return tier.groupBy(
        (F.floor(F.col("hour_epoch") / 86400) * 86400)
        .cast("long")
        .alias("day_epoch"),
        "event_type",
    ).agg(
        F.sum("n").cast("long").alias("n_events"),
        F.round(F.sum("s"), 2).cast("double").alias("total_value"),
    )


@register(
    "streaming_interval_join",
    survey_ids=(),
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
    doc="Stream-stream interval join: click events joined to purchase "
    "events of the same user within 30 minutes — the attribution "
    "pattern. Both sides carry watermarks and the join condition "
    "bounds event time in BOTH directions, so Spark derives a finite "
    "state-retention horizon per side (state is evicted as the "
    "watermark passes; an unbounded condition would pin every row "
    "forever — the stream-stream OOM). Inner join in append mode, "
    "drained with availableNow; checked against the identical batch "
    "SQL, proving the streaming plan computes the batch answer.",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    out = joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.unix_timestamp("click_ts").cast("long").alias("click_epoch"),
        F.unix_timestamp("purchase_ts").cast("long").alias("purchase_epoch"),
    )
    return run_stream_to_memory(out, output_mode="append")


@register(
    "streaming_static_join_zscore",
    survey_ids=("A1", "J1"),
    oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value AS DECIMAL(25,6))
                  * CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN abs(
             (e.value - st.s1 / st.n)
             / nullif(sqrt(st.s2 / st.n
                           - (st.s1 / st.n) * (st.s1 / st.n)), 0)
           ) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM events e JOIN stats st ON e.event_type = st.event_type
GROUP BY e.event_type
""",
    doc="STREAM-STATIC join — the remaining Structured Streaming join "
    "surface (the interval join covers stream-stream): a model table "
    "computed in batch (per-type mean/std, exact-DECIMAL moments, "
    "identical to events_anomaly_zscore's) joins against the live "
    "stream each micro-batch, scoring events as they arrive — the "
    "batch-train / stream-score deployment shape. The static side is "
    "#event_types rows, so the join is a broadcast against every "
    "micro-batch; counts drain in complete mode via availableNow.",
)
def streaming_static_join_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.util import t  # noqa: PLC0415

    ev_batch = t(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(25,6)")
    stats = ev_batch.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(vdec).cast("double").alias("s1"),
        F.sum(vdec * vdec).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    # nullif: a zero-variance group (constant values) must yield NULL
    # z-scores, not an ANSI divide-by-zero (edge-events test)
    z = (F.col("value") - mean) / F.nullif(
        F.sqrt(F.col("s2") / F.col("n") - mean * mean), F.lit(0.0)
    )
    scored = (
        stream_events(spark, sf_dir)
        .join(F.broadcast(stats), "event_type")
        .select("event_type", F.abs(z).alias("abs_z"))
    )
    counted = scored.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("abs_z") > 3.0, 1).otherwise(0))
        .cast("long")
        .alias("n_anomalies"),
    )
    return run_stream_to_memory(counted)


@register(
    "streaming_session_window_native",
    survey_ids=("A1",),
    oracle="""
WITH d AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
              OR lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session,
         event_id
  FROM events
),
s AS (
  SELECT *, sum(is_new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM d
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 2) AS total_value
FROM s
GROUP BY user_id, session_seq
""",
    doc="The native session_window under Structured Streaming — the "
    "built-in counterpart of the applyInPandasWithState sessionizer: "
    "readStream -> watermark -> session_window aggregate, drained "
    "complete-mode with availableNow so every session (including each "
    "user's final one) emits and the result checks against the SAME "
    "batch oracle as events_session_window_native / events_sessionize. "
    "At scale the state store holds one open session per active user "
    "per gap window; the stateful-UDF variant remains for emission "
    "logic session_window can't express (streaming_sessionize's "
    "closed-only protocol).",
)
def streaming_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("long").alias(
                "session_start_epoch"
            ),
            "n_events",
            "total_value",
        )
    )
    return run_stream_to_memory(s)


# Exhaustive-pair Jaccard over the whole corpus — shared by the clean
# ingest path (streaming_minhash_index) and the restart-under-failure
# proof (streaming_minhash_ingest_restart): index-served pairs must
# equal recompute-from-scratch pairs in BOTH lifecycles.
# The exact all-pairs Jaccard oracle for the two streaming MinHash
# index carriers lives with the batch LSH operator (one source for
# the three queries that share it); see _JACCARD_ALLPAIRS_ORACLE in
# plans/dedup.py — stated with prefix filtering so it sweeps at
# sf0.1 (r11 verdict item 2). Both streaming carriers emit ALL pairs
# from the maintained index, i.e. exactly the batch result set.
_MH_STREAM_ORACLE = _JACCARD_ALLPAIRS_ORACLE

_MH_DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _mh_merge_batch(batch_df: DataFrame, batch_id: int, path: str) -> None:
    """One micro-batch of index maintenance: sign the batch's documents
    with the SAME codegen'd flat min-hash aggregates as the batch query
    (inside foreachBatch the frame is a batch frame, so no
    streaming-agg restrictions) and MERGE the (doc_id, band) rows into
    the bucketed index, rewriting only the touched buckets."""
    from ..operators.upsert import merge_upsert_bucketed  # noqa: PLC0415
    from ..plans.dedup import (  # noqa: PLC0415
        band_key_cols,
        minhash_agg_exprs,
        shingles_col,
        words_col,
    )

    docs = batch_df.select("doc_id", words_col().alias("ws"))
    exploded_sh = docs.select(
        "doc_id", F.explode(shingles_col(F.col("ws"))).alias("shingle")
    )
    sig = exploded_sh.groupBy("doc_id").agg(*minhash_agg_exprs())
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*band_key_cols())).alias("band", "band_key"),
    ).withColumn(
        # priority = micro-batch id, NOT band_key: a replayed batch
        # carries the same id (idempotent re-merge), while a genuine
        # re-ingest of a changed document arrives in a LATER batch
        # and must replace the old signature — max(band_key) would
        # keep stale bands (r6, ADVICE item 4)
        "ingest_seq",
        F.lit(batch_id).cast("long"),
    )
    merge_upsert_bucketed(bands, path, ["doc_id", "band"], "ingest_seq")


def _mh_index_pairs(
    spark: SparkSession, path: str, corpus: DataFrame
) -> DataFrame:
    """Candidate/verify query against the MAINTAINED index: band
    self-join on the compact (doc_id, band_key) store, exact-Jaccard
    verification over shingle sets recomputed from the corpus rows."""
    from ..plans.dedup import jaccard, shingles_col, words_col  # noqa: PLC0415

    index = spark.read.parquet(path).select("doc_id", "band_key")
    a = index.alias("a")
    b = index.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sh = corpus.select("doc_id", shingles_col(words_col()).alias("sgs"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sgs").alias("sgs_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sgs").alias("sgs_b"))
    verified = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    jac = jaccard(F.col("sgs_a"), F.col("sgs_b"))
    return verified.filter(jac >= 0.8).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


@register(
    "streaming_minhash_index",
    survey_ids=("S7", "S8"),
    oracle=_MH_STREAM_ORACLE,
    doc="CONTINUOUS dedup-at-ingest: a document stream maintains a "
    "persistent MinHash-LSH band index ((doc_id, band) -> band_key, "
    "16 rows/doc) via foreachBatch + the bucket-pruned incremental "
    "merge — each micro-batch computes signatures with the SAME "
    "codegen'd flat min-hash aggregates as the batch query (inside "
    "foreachBatch the frame is a batch frame, so no streaming-agg "
    "restrictions) and rewrites only the buckets its keys touch. The "
    "candidate/verify query then runs against the MAINTAINED index, "
    "never recomputing signatures for old documents — the batch "
    "exhaustive-Jaccard oracle proves index-served pairs == "
    "recompute-from-scratch pairs. This is how a 100 TB corpus "
    "absorbs daily increments: signature cost is per-NEW-document, "
    "the band self-join stays on the compact index (2 longs + band "
    "per row), and replayed batches re-merge to identical winners "
    "(exactly-once effect).",
)
def streaming_minhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415

    from ..plans.etl import SINK_ROOT  # noqa: PLC0415

    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"{SINK_ROOT}/minhash_index_{tag}"
    # documents*.parquet: the testdata layout is ONE file named
    # documents.parquet; an ingest directory appends increment files
    # (documents_b2.parquet, ...) that the stream picks up on resume.
    # Glob in the PATH, not pathGlobFilter: the filter matches leaf
    # file names only, so a Spark-written documents.parquet DIRECTORY
    # (the scale-curve derived corpora) would yield zero input files —
    # the path glob matches files and directories alike.
    stream = spark.readStream.schema(_MH_DOC_SCHEMA).parquet(
        f"{sf_dir}/documents*.parquet"
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: _mh_merge_batch(b, bid, path)
        )
        .option("checkpointLocation", f"{path}__checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # batch verify side reads the SAME file set as the stream (the
    # full corpus incl. increments), so candidate texts always resolve
    corpus = spark.read.schema(_MH_DOC_SCHEMA).parquet(
        f"{sf_dir}/documents*.parquet"
    )
    return _mh_index_pairs(spark, path, corpus)


@register(
    "streaming_minhash_ingest_restart",
    survey_ids=(),
    oracle=_MH_STREAM_ORACLE,
    doc="Streaming MinHash-index ingest under FAILURE + RESTART — the "
    "exactly-once proof for the dedup tier's streaming index "
    "maintainer, mirroring the ANN side's streaming_ann_ingest_restart "
    "(plans/similarity/pq_lifecycle.py). The corpus arrives as a "
    "staged 3-file stream (maxFilesPerTrigger=1 -> 3 micro-batches); "
    "each batch MERGES its (doc_id, band) rows into the bucketed "
    "index via merge_upsert_bucketed with priority = micro-batch id — "
    "the write a replayed batch can repeat without changing winners. "
    "A failure is INJECTED at the worst point: after batch 1's merge "
    "has fully committed its bucket swaps but BEFORE Structured "
    "Streaming commits the offset (a torn commit). The stream dies, a "
    "NEW writeStream restarts from the same checkpointLocation, the "
    "file source replays batch 1 from its offset WAL (same files, "
    "same rows, same batch id), the merge re-resolves to identical "
    "winners, and batch 2 drains. The final index serves the SAME "
    "candidate/verify query as the clean path and is hash-checked "
    "against the SAME exhaustive-Jaccard oracle — equality proves no "
    "signature was lost or duplicated across the crash. At 100 TB "
    "this is what makes continuous dedup-at-ingest operable: a worker "
    "or driver loss costs one re-merged micro-batch (idempotent "
    "key-priority merge), never an index rebuild (extension surface — "
    "no reference twin; the reference's loader is a one-shot "
    "pg_restore).",
)
def streaming_minhash_ingest_restart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from ..plans.etl import SINK_ROOT  # noqa: PLC0415
    from ..plans.util import t  # noqa: PLC0415
    from .restart_harness import ingest_with_injected_restart  # noqa: PLC0415

    tag = os.path.basename(os.path.normpath(sf_dir))
    root = f"{SINK_ROOT}/minhash_restart_{tag}"
    path = f"{root}/index"
    # fresh run every time: a stale checkpoint would silently skip the
    # injected failure (availableNow sees no new files) and the proof
    # would prove nothing
    shutil.rmtree(root, ignore_errors=True)

    # stage the corpus as 3 files -> 3 micro-batches; the torn commit
    # fires after batch 1's merge (idempotent: replay re-merges with
    # the same ingest_seq -> identical winners)
    t(spark, sf_dir, "documents").repartition(3).write.parquet(
        f"{root}/arrivals"
    )
    ingest_with_injected_restart(
        spark,
        _MH_DOC_SCHEMA,
        f"{root}/arrivals",
        f"{root}/ckpt",
        lambda b, bid: _mh_merge_batch(b, bid, path),
    )

    corpus = spark.read.schema(_MH_DOC_SCHEMA).parquet(f"{root}/arrivals")
    return _mh_index_pairs(spark, path, corpus)


@register(
    "streaming_cdc_apply",
    survey_ids=("S7", "A10"),
    oracle="""
WITH changes AS (
  SELECT user_id, event_type, event_id, round(value, 2) AS value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
),
winners AS (
  SELECT * FROM changes
  QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY event_id DESC) = 1
)
SELECT user_id, event_type, event_id, value
FROM winners WHERE op <> 'D'
""",
    doc="STREAMING CDC apply — the reference's per-artist upsert re-run "
    "as a continuous pipeline with real transactional semantics: the "
    "event stream is interpreted as a change feed (error events are "
    "DELETE tombstones for their key, everything else upserts), each "
    "micro-batch applies through operators.manifest.merge_cdc_manifest "
    "— so every batch commits ATOMICALLY across its touched buckets "
    "(one pointer swap), tombstone-vs-late-update races resolve on "
    "event_id priority (not arrival order), and a replayed batch "
    "re-merges to identical winners. The read-back must equal batch "
    "last-writer-wins minus deleted keys. 'error' keys whose LATEST "
    "change is the tombstone are absent; keys whose tombstone was "
    "outranked by a later event survive.",
)
def streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from ..operators.manifest import (  # noqa: PLC0415
        merge_cdc_manifest,
        read_table,
    )
    from ..plans.etl import SINK_ROOT  # noqa: PLC0415

    tag = os.path.basename(os.path.normpath(sf_dir))
    table = f"{SINK_ROOT}/streaming_cdc_{tag}"
    # fresh table per process run: the checkpoint-offset + manifest
    # pair must stay consistent (same policy as the batch CDC query)
    shutil.rmtree(table, ignore_errors=True)
    shutil.rmtree(f"{table}__checkpoint", ignore_errors=True)
    stream = stream_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "event_id",
        F.round("value", 2).alias("value"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )

    def apply_changes(batch_df: DataFrame, batch_id: int) -> None:
        merge_cdc_manifest(
            batch_df, table, ["user_id", "event_type"], "event_id"
        )

    q = (
        stream.writeStream.foreachBatch(apply_changes)
        .option("checkpointLocation", f"{table}__checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = read_table(spark, table)
    if out is None:
        return spark.createDataFrame(
            [], "user_id long, event_type string, event_id long, value double"
        )
    return out.select("user_id", "event_type", "event_id", "value")


# -- Watermark late-data semantics, proven (r6) ------------------------------

WM_DELAY_MIN = 15
WM_BASE = "2026-01-01 00:00:00"


@register(
    "streaming_watermark_late_drop",
    survey_ids=(),
    oracle=f"""
WITH ev AS (SELECT event_id, event_type FROM events
            WHERE event_id IS NOT NULL),
b1 AS (
  SELECT event_type,
         TIMESTAMP '{WM_BASE}' + ((event_id % 90) * INTERVAL 1 minute) AS ts
  FROM ev WHERE event_id % 3 <> 0
),
b2 AS (
  SELECT event_type,
         TIMESTAMP '{WM_BASE}' +
           ((CASE WHEN event_id % 2 = 0 THEN (event_id % 60) - 30
                  ELSE 100 + (event_id % 60) END) * INTERVAL 1 minute) AS ts
  FROM ev WHERE event_id % 3 = 0
),
wm AS (SELECT max(ts) - INTERVAL {WM_DELAY_MIN} minute AS w FROM b1),
kept AS (
  SELECT * FROM b1
  UNION ALL
  SELECT b2.event_type, b2.ts FROM b2, wm WHERE b2.ts >= wm.w
)
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM kept GROUP BY 1, 2
""",
    doc="WATERMARK LATE-DATA semantics, finally PROVEN rather than "
    "configured: three ingest increments run through ONE checkpointed "
    "windowed aggregation (batch 1 establishes the watermark at "
    f"max(ts) - {WM_DELAY_MIN} min; batch 2 mixes too-late rows — "
    "whose windows closed under that watermark — with fresh rows; a "
    "sentinel batch pushes the watermark past every real window so "
    "append mode flushes them all). The too-late rows MUST be "
    "dropped: the oracle recomputes the exact keep/drop rule from "
    "the same closed-form batch construction (row kept iff ts >= "
    "checkpointed watermark; all test rows sit >20 min from the "
    "boundary so no </<= convention ambiguity). Operationally this "
    "is the restart path: each increment is its own availableNow run "
    "against the SAME checkpoint, so the test also re-proves "
    "watermark persistence across restarts (recentProgress showed "
    "batch 2 restored to the batch-1 watermark and dropped exactly "
    "the late rows — 29 at sf0.001). MEASURED ENGINE FINDING "
    "(SCALE.md): within a SINGLE availableNow run Spark 4.1 advances "
    "the watermark between micro-batches for state EVICTION but the "
    "late-record input filter lags a run — late rows landed in "
    "already-emitted windows (duplicate emission). Cross-run, the "
    "checkpoint-restored watermark applies to input filtering "
    "exactly as documented; production pipelines restarting per "
    "increment get the textbook semantics this query pins.",
)
def streaming_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from ..plans.etl import SINK_ROOT  # noqa: PLC0415

    tag = os.path.basename(os.path.normpath(sf_dir))
    root = f"{SINK_ROOT}/wm_late_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(f"{root}/in", exist_ok=True)

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id").isNotNull())
        .select("event_id", "event_type")
    )
    base_s = F.unix_timestamp(F.lit(WM_BASE).cast("timestamp"))
    b1 = ev.filter(F.col("event_id") % 3 != 0).select(
        "event_type",
        F.timestamp_seconds(base_s + (F.col("event_id") % 90) * 60).alias("ts"),
    )
    off2 = F.when(
        F.col("event_id") % 2 == 0, (F.col("event_id") % 60) - 30
    ).otherwise(100 + (F.col("event_id") % 60))
    b2 = ev.filter(F.col("event_id") % 3 == 0).select(
        "event_type", F.timestamp_seconds(base_s + off2 * 60).alias("ts")
    )
    sentinel = values_df(spark, [("sentinel",)], "event_type string").select(
        "event_type", F.timestamp_seconds(base_s + 14400 * 60).alias("ts")
    )

    def run_increment(batch: DataFrame, name: str) -> None:
        # land the increment, then one availableNow run against the
        # SHARED checkpoint — the watermark crosses runs via the
        # checkpoint, exactly like a restarted production pipeline
        tmp = f"{root}/stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.replace(f"{tmp}/{part}", f"{root}/in/{name}.parquet")
        shutil.rmtree(tmp, ignore_errors=True)
        stream = (
            spark.readStream.schema("event_type string, ts timestamp")
            .option("pathGlobFilter", "*.parquet")
            .parquet(f"{root}/in")
        )
        agg = (
            stream.withWatermark("ts", f"{WM_DELAY_MIN} minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.unix_timestamp("w.start").cast("long").alias(
                    "window_start_epoch"
                ),
                "event_type",
                "n_events",
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_increment(b1, "b1")
    run_increment(b2, "b2")
    run_increment(sentinel, "b3")

    out = spark.read.parquet(f"{root}/out")
    # null-safe sentinel exclusion: filter on the window, not the type
    # (event_type != 'sentinel' would silently drop NULL-type groups)
    return out.filter(
        F.col("window_start_epoch")
        < F.unix_timestamp(F.lit(WM_BASE).cast("timestamp")) + 86400
    )


def _staged_events_with_flush(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """Stage the events table plus two LATE sentinel files (one click +
    one purchase each, user_id/event_id = -1, ts at +10 and +20 days
    past the real maximum) with strictly increasing mtimes. Outer
    stream-stream joins only emit their NULL side when the watermark
    EVICTS state; a bounded drain whose last batch carries the latest
    real rows would end with the tail's unmatched rows still withheld
    in state — the classic outer-join gotcha. The sentinels force two
    extra micro-batches (maxFilesPerTrigger=1 on the reader) whose
    watermark is past every real row + interval, so eviction — and
    therefore NULL emission — provably happens before the drain
    finishes. At 100 TB the same role is played by the source's
    ordinary continuous arrivals; the sentinel trick is only needed
    for bounded replays like this oracle harness."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import time  # noqa: PLC0415

    from ..plans.etl import SINK_ROOT  # noqa: PLC0415
    from ..plans.util import t  # noqa: PLC0415

    sf_tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    stage = f"{SINK_ROOT}/stream_flush_{sf_tag}_{tag}"
    shutil.rmtree(stage, ignore_errors=True)
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    # ONE file for the real data: with maxFilesPerTrigger=1 each file
    # is its own micro-batch, and files replay in arbitrary order
    # within equal mtimes — a batch carrying the latest events would
    # advance the watermark past earlier files' rows and drop them as
    # LATE on arrival (observed: one unmatched click vanished). A
    # single-file batch keeps every real row ahead of the watermark;
    # the sentinels are the only intentionally-later arrivals.
    ev.coalesce(1).write.parquet(f"{stage}/b0")
    max_ts = ev.agg(F.max("ts")).first()[0]
    base = time.time()
    for i, days in enumerate((10, 20), start=1):
        sent = values_df(
            spark,
            [(-1, -1, "click"), (-1, -1, "purchase")],
            "event_id long, user_id long, event_type string",
        ).select(
            "event_id",
            "user_id",
            "event_type",
            (F.lit(max_ts) + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
        )
        part = f"{stage}/b{i}"
        sent.coalesce(1).write.parquet(part)
        ts_i = base + i * 10
        for root, _dirs, fs in os.walk(part):
            for f in fs:
                os.utime(os.path.join(root, f), (ts_i, ts_i))
    return stage


@register(
    "streaming_interval_join_left_outer",
    survey_ids=(),
    oracle="""
WITH c AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
),
p AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
)
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch
FROM c LEFT JOIN p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
    doc="Stream-stream LEFT OUTER interval join: every click emits — "
    "attributed to a purchase within 30 minutes when one exists, "
    "with a NULL purchase otherwise. The semantic surface the inner "
    "variant can't show: NULL-side rows are emitted only when the "
    "WATERMARK evicts their state (Spark can't know a click is "
    "unmatched until no in-interval purchase can still arrive), so "
    "correctness depends on watermark progress, not just the join "
    "condition. The bounded replay appends two late sentinel batches "
    "(_staged_events_with_flush) so the final micro-batches run with "
    "a watermark past all real data and the tail's unmatched clicks "
    "provably emit; the batch LEFT JOIN oracle then matches "
    "row-for-row. State retention is finite on both sides (two-sided "
    "time bound + watermarks), identical to the inner variant.",
)
def streaming_interval_join_left_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    stage = _staged_events_with_flush(spark, sf_dir, "loj")
    raw = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    clicks = (
        raw.filter((F.col("event_type") == "click") & F.col("ts").isNotNull())
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        raw.filter(
            (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "leftOuter",
    )
    drained = run_stream_to_memory(joined, output_mode="append")
    # Sentinels are filtered AFTER the drain, on the batch result: a
    # pre-sink filter on click_id gets pushed below the join into the
    # clicks side, which removes the sentinel CLICKS from the stream —
    # the left watermark then stalls at the real clicks' max and the
    # final unmatched click never evicts/emits (observed: exactly one
    # NULL row short). Null-safe: a real NULL click_id must survive.
    return drained.filter(~F.col("click_id").eqNullSafe(F.lit(-1))).select(
        "click_id",
        "purchase_id",
        "user_id",
        F.unix_timestamp("click_ts").cast("long").alias("click_epoch"),
        F.unix_timestamp("purchase_ts").cast("long").alias("purchase_epoch"),
    )


@register(
    "streaming_clustered_sink_prune",
    survey_ids=("S7", "A1"),
    oracle="""
WITH e AS (
  SELECT event_id, ts, value FROM events WHERE ts IS NOT NULL
),
entries AS (
  SELECT event_id % 4 AS b, day(ts) AS fkey,
         min(ts) AS mn, max(ts) AS mx
  FROM e GROUP BY 1, 2
),
sel AS (
  SELECT CAST(count(*) AS INT) AS files_read FROM entries
  WHERE NOT (mn > TIMESTAMP '2024-01-13 00:00:00'
             OR mx < TIMESTAMP '2024-01-10 00:00:00')
),
tot AS (SELECT CAST(count(*) AS INT) AS files_total FROM entries),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE)
           AS total_value
  FROM e
  WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
               AND TIMESTAMP '2024-01-13 00:00:00'
)
SELECT agg.n_rows, agg.total_value, sel.files_read, tot.files_total
FROM agg, sel, tot
""",
    doc="STREAMING INGEST into the stats-clustered manifest table — "
    "the lakehouse write loop end to end: events replay as 4 "
    "micro-batches (staged 4-file source, maxFilesPerTrigger=1), "
    "each batch foreachBatch-commits to the manifest in APPEND mode "
    "(one add-file entry per touched day-key, per-entry min/max ts "
    "stats — Delta's transaction log under a streaming writer), then "
    "a 3-day range read prunes the accumulated entries from the "
    "manifest ALONE and aggregates survivors under the residual "
    "predicate. Pruning is per ENTRY, so the read skips both "
    "unrelated day-keys and (for tighter ranges) whole batches; the "
    "oracle recomputes entries as (batch, day) groups, so both the "
    "commit layout and the prune decision are hash-checked. Restart "
    "safety comes from the manifest commit protocol (a replayed "
    "batch appends duplicate entries only if its commit succeeded "
    "without the checkpoint advancing — the documented "
    "at-least-once-to-exactly-once boundary foreachBatch has "
    "everywhere; keys make dedup-on-read possible when it matters).",
)
def streaming_clustered_sink_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import time  # noqa: PLC0415

    from ..operators.manifest import (  # noqa: PLC0415
        commit_clustered,
        read_table_stats_pruned,
    )
    from ..plans.etl import SINK_ROOT  # noqa: PLC0415
    from ..plans.util import t  # noqa: PLC0415

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    stage = f"{SINK_ROOT}/stream_clustered_src_{tag}"
    table = f"{SINK_ROOT}/stream_clustered_tbl_{tag}"
    ckpt = f"{SINK_ROOT}/stream_clustered_ckpt_{tag}"
    for d in (stage, table, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    base = time.time()
    for b in range(4):
        part = f"{stage}/b{b}"
        ev.filter(F.col("event_id") % 4 == b).coalesce(1).write.parquet(part)
        ts_b = base + b * 10
        for root, _dirs, fs in os.walk(part):
            for f in fs:
                os.utime(os.path.join(root, f), (ts_b, ts_b))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )

    def commit_batch(batch_df, _batch_id):
        commit_clustered(
            batch_df.withColumn("fkey", F.dayofmonth("ts")),
            table,
            "fkey",
            ["ts"],
            mode="append",
        )

    q = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    lo, hi = "2024-01-10 00:00:00", "2024-01-13 00:00:00"
    pruned, files_read, files_total = read_table_stats_pruned(
        spark, table, "ts", lo, hi
    )
    if pruned is None:
        pruned = ev.limit(0)
    return (
        pruned.filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("ts") <= F.lit(hi).cast("timestamp"))
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.sum(F.col("value").cast("decimal(25,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .withColumn("files_read", F.lit(files_read).cast("int"))
        .withColumn("files_total", F.lit(files_total).cast("int"))
    )


@register(
    "streaming_sliding_window",
    survey_ids=("A1",),
    oracle="""
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep, value
  FROM events WHERE ts IS NOT NULL
),
x AS (
  SELECT (e.ep // 600 - k.k) * 600 AS ws, e.value
  FROM e CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
)
SELECT ws AS window_start_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE)
         AS total_value
FROM x GROUP BY ws
""",
    doc="Streaming twin of events_sliding_window: the same 30-minute/"
    "10-minute hopping aggregate under readStream + watermark, "
    "drained complete-mode with availableNow. Each arriving event "
    "updates THREE window states (the sliding replication happens "
    "inside the stateful aggregate); watermark eviction retires a "
    "window only once event time passes its END + delay, exactly as "
    "for tumbling windows — the state footprint is "
    "windows-in-flight x duration/slide, the knob the batch "
    "docstring names. Distinct-user counting is omitted on the "
    "stream: exact countDistinct needs per-window member state "
    "(unbounded per window) and is the documented batch-side "
    "metric; the streaming state here stays two longs per window.",
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = stream_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(25,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start"))
            .cast("long")
            .alias("window_start_epoch"),
            "n_events",
            "total_value",
        )
    )
    return run_stream_to_memory(agg)


@register(
    "streaming_interval_join_full_outer",
    survey_ids=(),
    oracle="""
WITH c AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
),
p AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
)
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       coalesce(c.user_id, p.user_id) AS user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch
FROM c FULL JOIN p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
    doc="Stream-stream FULL OUTER interval join — both sides' "
    "unmatched rows emit on watermark eviction: unattributed clicks "
    "AND orphan purchases (no click within the preceding 30 minutes) "
    "in one stream, the reconciliation shape. Same bounded-replay "
    "flush harness as the left-outer variant (sentinel batches force "
    "eviction before the drain ends; sentinels filtered POST-drain "
    "on both id columns — pushing either filter below the join would "
    "starve that side's watermark and withhold the other side's tail "
    "NULLs). Matches the batch FULL JOIN row-for-row.",
)
def streaming_interval_join_full_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    stage = _staged_events_with_flush(spark, sf_dir, "foj")
    raw = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    clicks = (
        raw.filter((F.col("event_type") == "click") & F.col("ts").isNotNull())
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        raw.filter(
            (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "fullOuter",
    )
    drained = run_stream_to_memory(joined, output_mode="append")
    return (
        drained.filter(
            ~F.col("click_id").eqNullSafe(F.lit(-1))
            & ~F.col("purchase_id").eqNullSafe(F.lit(-1))
        )
        .select(
            "click_id",
            "purchase_id",
            F.coalesce("c_user", "p_user").alias("user_id"),
            F.unix_timestamp("click_ts").cast("long").alias("click_epoch"),
            F.unix_timestamp("purchase_ts").cast("long").alias("purchase_epoch"),
        )
    )
