"""Event-stream operators over ``events`` (timestamped rows with a
JSON ``props`` payload) — the semi-structured / event-time tier of
the brief. Batch forms here; the same plans run under Structured
Streaming via ``streaming.jobs`` (readStream + watermark).

All JSON parsing is ``from_json`` with an EXPLICIT schema — at 100 TB
schema inference is a full extra pass; an explicit schema keeps the
scan single-pass and lets Catalyst prune into the parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import register
from .util import t

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


@register(
    "events_json_extract",
    survey_ids=(),
    oracle="""
SELECT event_id, event_type,
       CASE WHEN props IS NOT NULL AND json_valid(props)
                 AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
            THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT)
            ELSE NULL END AS k
FROM events
""",
    doc="from_json with explicit schema over the props payload "
    "(never schema inference at scale). Spark's from_json NULLs "
    "corrupt/empty/NULL payloads rather than failing, and is STRICT "
    "about the value type: only actual JSON integers parse as LongType "
    '({"k": "5"}, {"k": 5.7}, {"k": true} are all NULL — probed). The '
    "oracle therefore gates on json_type IN (BIGINT, UBIGINT) and uses "
    "TRY_CAST (int64 overflow -> NULL on both engines); a plain CAST "
    'would hard-error DuckDB on {"k": "abc"} (ADVICE r4; edge-events '
    "test pins all 11 payload classes).",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.from_json(F.col("props"), PROPS_SCHEMA).getField("k").alias("k"),
    )


@register(
    "events_tumbling_window",
    survey_ids=("A1",),
    oracle="""
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 2) AS total_value
FROM events WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
    doc="10-minute tumbling-window aggregation keyed by event_type — "
    "the batch twin of the streaming windowed agg (window start "
    "emitted as epoch seconds for the cross-engine hash).",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts IS NOT NULL on both engines: Spark's window() silently DROPS
    # NULL event time while a SQL floor(epoch(ts)) group would keep a
    # NULL bucket — exclusion is the explicit, shared policy
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
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


@register(
    "events_sessionize",
    survey_ids=("A1", "O3"),
    oracle="""
WITH d AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
              OR lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session,
         event_id
  FROM events WHERE ts IS NOT NULL
),
s AS (
  SELECT *, sum(is_new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM d
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 2) AS total_value
FROM s
GROUP BY user_id, session_seq
""",
    doc="Gap-based sessionization (30-min inactivity gap) via "
    "lag + running-sum session ids — the batch equivalent of a "
    "session window; the streaming twin uses "
    "applyInPandasWithState (streaming.jobs).",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    # NULL event time joins no session (and ORDER BY ts NULL defaults
    # diverge between engines) — excluded explicitly on both sides
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap compared in MICROSECONDS on both engines: unix_timestamp
    # truncates to seconds while DuckDB's epoch() keeps the fraction,
    # so a gap like 1800.8s would split in one engine and not the
    # other if compared at second granularity.
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    d = ev.withColumn(
        "is_new_session",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    )
    d = d.withColumn(
        "session_seq",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        d.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq"))
        .agg(
            F.unix_timestamp(F.min("ts")).cast("long").alias("session_start_epoch"),
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double"), 2
            ).alias("total_value"),
        )
    )


@register(
    "events_approx_sketches",
    survey_ids=(),
    oracle="""
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       true AS hll_within_5pct,
       true AS p50_within_10pct
FROM events
""",
    doc="The sketch tier: HyperLogLog++ distinct-count "
    "(approx_count_distinct, rsd=2%) and Greenwald-Khanna approximate "
    "median (percentile_approx, accuracy 10k) next to their exact "
    "twins. Sketch VALUES are engine/implementation-specific, so the "
    "differential contract is the error-bound PROPERTY: the query "
    "emits booleans asserting |approx-exact| within 5%/10%, and the "
    "oracle pins them true — if either sketch ever drifts past its "
    "bound, the hash compare goes red. At 100 TB the sketches are the "
    "only affordable form of these statistics (fixed memory, one "
    "pass, mergeable partials), which is why they are first-class "
    "here.",
)
def events_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    agg = ev.agg(
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("hll_users"),
        F.expr("percentile_approx(value, 0.5, 10000)").alias("p50_approx"),
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
    )
    return agg.select(
        "exact_users",
        (
            F.abs(F.col("hll_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_within_5pct"),
        (
            F.abs(F.col("p50_approx") - F.col("p50_exact"))
            <= 0.10 * F.abs(F.col("p50_exact")) + F.lit(1e-9)
        ).alias("p50_within_10pct"),
    )


@register(
    "events_asof_join",
    survey_ids=(),
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events
),
p AS (SELECT * FROM e WHERE event_type = 'purchase'),
c AS (SELECT * FROM e WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id, p.ts_s AS purchase_ts,
       l.event_id AS click_id, l.ts_s AS click_ts
FROM p LEFT JOIN LATERAL (
  SELECT c.event_id, c.ts_s FROM c
  WHERE c.user_id = p.user_id AND c.ts_s <= p.ts_s
  ORDER BY c.ts_s DESC, c.event_id DESC LIMIT 1
) l ON true
""",
    doc="AS-OF JOIN — the custom temporal operator Spark's built-ins "
    "lack: every purchase is joined to the user's most recent click "
    "at-or-before it. Implemented as the single-pass union form: tag "
    "click rows with a (ts, id) struct, one window per user ordered "
    "by (second, type-rank, event_id) carries the last non-null click "
    "forward, then keep the purchase rows — ONE shuffle on user_id "
    "and one sort, vs. the naive range-join's quadratic per-user "
    "blowup. Comparisons run at second granularity on both engines "
    "(the parquet nanos are truncated differently by Spark and "
    "DuckDB, exactly like the sessionizer), ties broken "
    "clicks-before-purchases then by event_id, so the result is "
    "deterministic; the oracle is a LATERAL top-1 lookup. At 100 TB "
    "hot users are the skew risk — AQE skew-split applies to the "
    "user_id exchange, and the window state is O(1) per row.",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    from .util import epoch  # noqa: PLC0415

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("event_id", "user_id", "event_type", epoch("ts").alias("ts_s"))
    )
    is_click = F.col("event_type") == "click"
    tagged = ev.withColumn(
        "click_info",
        F.when(
            is_click,
            F.struct(F.col("ts_s").alias("ts"), F.col("event_id").alias("id")),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", F.when(is_click, 0).otherwise(1), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("lc", F.last("click_info", ignorenulls=True).over(w))
        .filter(~is_click)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_s").alias("purchase_ts"),
            F.col("lc.id").alias("click_id"),
            F.col("lc.ts").alias("click_ts"),
        )
    )


RANGE_WINDOW_S = 60


@register(
    "events_range_join_banded",
    survey_ids=(),
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events WHERE event_type = 'error'
),
c AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events WHERE event_type = 'click'
)
SELECT e.event_id AS error_id, e.user_id, e.ts_s AS error_ts,
       CAST(count(c.ts_s) AS BIGINT) AS n_recent_clicks
FROM e LEFT JOIN c
  ON c.user_id = e.user_id
 AND c.ts_s BETWEEN e.ts_s - {RANGE_WINDOW_S} AND e.ts_s
GROUP BY e.event_id, e.user_id, e.ts_s
""",
    doc="BANDED RANGE JOIN — the interval-predicate custom operator: "
    "for every error event, count the same user's clicks in the "
    "preceding 60 s. The naive plan is a non-equi join (per-user "
    "quadratic; on Spark it degenerates to a nested-loop). Here both "
    "sides are bucketed into 60 s time bands: clicks land in ONE "
    "(user, band) bucket, errors probe their two candidate bands, so "
    "the join is a plain equi-join on (user_id, band) with a cheap "
    "range residual — shuffle volume 2|E|+|C|, never quadratic. A "
    "(error, click) pair can meet in only the click's band, so no "
    "dedup is needed. The same banding is how interval/IP-range/"
    "geo-box joins scale on 100 TB; the oracle is the plain non-equi "
    "SQL.",
)
def events_range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .util import epoch  # noqa: PLC0415

    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        epoch("ts").alias("error_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", epoch("ts").alias("click_ts")
    )
    band = lambda c: F.floor(c / RANGE_WINDOW_S)  # noqa: E731
    cb = clicks.withColumn("band", band(F.col("click_ts")))
    eb = errors.withColumn(
        "band",
        F.explode(
            F.array(band(F.col("error_ts")) - 1, band(F.col("error_ts")))
        ),
    )
    hits = (
        eb.join(cb, ["user_id", "band"])
        .filter(
            F.col("click_ts").between(
                F.col("error_ts") - RANGE_WINDOW_S, F.col("error_ts")
            )
        )
        .groupBy("error_id")
        .agg(F.count("*").alias("n_recent_clicks"))
    )
    return errors.join(hits, "error_id", "left").select(
        "error_id",
        "user_id",
        "error_ts",
        F.coalesce("n_recent_clicks", F.lit(0)).cast("long").alias("n_recent_clicks"),
    )


@register(
    "events_hypertable_rollup",
    survey_ids=(),
    oracle="""
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="HYPERTABLE ROLLUP — the continuous-aggregate pattern: the "
    "plan first aggregates raw events into an HOURLY rollup "
    "(count + exact-DECIMAL sum per (hour, type)), then answers the "
    "day-level question by RE-aggregating the rollup — counts add, "
    "decimal sums add exactly, rounding happens only at the end, so "
    "two-tier equals one-tier bit-for-bit (the oracle aggregates the "
    "raw table directly, proving it). At 100 TB the hourly tier is "
    "materialized incrementally (the streaming tumbling-window job "
    "writes it, partitioned by hour) and every day/week/month "
    "dashboard query reads ~1/3600th of the rows; only re-aggregable "
    "stats (count/sum/min/max/HLL partials — not raw averages or "
    "medians) may live in the rollup, which is exactly what this "
    "query's shape enforces.",
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .util import epoch  # noqa: PLC0415

    ev = t(spark, sf_dir, "events").select(
        epoch("ts").alias("ts_s"),
        "event_type",
        F.col("value").cast("decimal(25,6)").alias("v"),
    )
    hourly = ev.groupBy(
        (F.floor(F.col("ts_s") / 3600) * 3600).alias("hour_epoch"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    return (
        hourly.groupBy(
            (F.floor(F.col("hour_epoch") / 86400) * 86400)
            .cast("long")
            .alias("day_epoch"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("s"), 2).cast("double").alias("total_value"),
        )
    )


@register(
    "events_moving_frame",
    survey_ids=(),
    oracle="""
SELECT user_id, event_id,
       CAST(round(sum(CAST(value AS DECIMAL(25,6))) OVER w, 2) AS DOUBLE)
           AS mov_sum_5,
       CAST(count(*) OVER w AS BIGINT) AS frame_n,
       CAST(round(CAST(value AS DECIMAL(25,6))
                  - coalesce(lag(CAST(value AS DECIMAL(25,6))) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id),
                    CAST(0 AS DECIMAL(25,6))), 2) AS DOUBLE) AS delta_prev
FROM events WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
    doc="BOUNDED window frame + LAG: per-user 5-event moving sum and "
    "the delta vs the previous event, ordered by (ts, event_id) — "
    "the rolling-metric shape (rate smoothing, spend-velocity "
    "monitoring) that complements the unbounded running frames in "
    "events_sessionize/events_asof_join. One shuffle on user_id, "
    "then a single in-partition sort serves BOTH window specs (same "
    "partitioning + ordering -> one Window operator chain, no second "
    "exchange). Terms are cast to DECIMAL(25,6) before the frame sum "
    "so the result is independent of both engines' in-frame "
    "summation strategy (DuckDB uses a segment tree, Spark a sliding "
    "accumulator); cent-rounding happens on identical exact values. "
    "The deterministic (ts, event_id) tie-break makes lag() "
    "reproducible under re-partitioning and task retries.",
)
def events_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = base.rowsBetween(-4, 0)
    v = F.col("value").cast("decimal(25,6)")
    # NULL ts cannot order inside the frame (NULLS FIRST vs LAST
    # divergence) — excluded on both engines
    return t(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        F.round(F.sum(v).over(frame), 2).cast("double").alias("mov_sum_5"),
        F.count("*").over(frame).cast("long").alias("frame_n"),
        F.round(v - F.coalesce(F.lag(v).over(base), F.lit(0).cast("decimal(25,6)")), 2)
        .cast("double")
        .alias("delta_prev"),
    )


@register(
    "events_gap_fill",
    survey_ids=(),
    oracle="""
WITH bounds AS (
  SELECT CAST(floor(epoch(min(ts)) / 3600) AS BIGINT) AS h0,
         CAST(floor(epoch(max(ts)) / 3600) AS BIGINT) AS h1
  FROM events
),
types AS (SELECT DISTINCT event_type FROM events),
slots AS (
  SELECT t.event_type, unnest(range(b.h0, b.h1 + 1)) AS h
  FROM types t, bounds b
),
actual AS (
  SELECT DISTINCT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
  FROM events
)
SELECT s.event_type, s.h * 3600 AS hour_epoch
FROM slots s
WHERE NOT EXISTS (
  SELECT 1 FROM actual a
  WHERE a.event_type = s.event_type AND a.h = s.h
)
""",
    doc="Time-series gap detection: build the dense (event_type x hour) "
    "calendar between the corpus's min and max hour and anti-join the "
    "observed slots — the missing-interval report a hypertable "
    "monitor runs. The calendar is generated IN-ROW (sequence + "
    "explode from a 1-row bounds aggregate crossed with the distinct "
    "type dim — both broadcast), so the dense side costs zero "
    "shuffle; the anti probe is a hash semi-join on (type, hour). "
    "The same shape with a left join + coalesce(n, 0) is the "
    "gap-FILL variant; the report form keeps the result bounded by "
    "the gap count, not the calendar size.",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    ev = t(spark, sf_dir, "events")
    hour = (F.unix_timestamp("ts") / 3600).cast("long")
    # One hash aggregate builds the observed (type, hour) slot set;
    # the global calendar bounds come from an empty-partition window
    # OVER THAT SLOT SET (min/max of a distinct-preserved column are
    # unchanged), so there is no bounds join at all — a 1-row cross
    # join would plan as a BroadcastNestedLoopJoin (Catalyst constant-
    # folds any synthetic equi-key back to a cross). The single-
    # partition window is bounded by |types| x |hours in range|
    # (~1e7 rows for 100 types over a decade), not by the corpus.
    actual = ev.select("event_type", hour.alias("h")).distinct()
    w = Window.partitionBy()
    bounded = actual.groupBy("event_type").agg(
        F.min("h").alias("th0"), F.max("h").alias("th1")
    ).select(
        "event_type",
        F.min("th0").over(w).alias("h0"),
        F.max("th1").over(w).alias("h1"),
    )
    slots = bounded.select(
        "event_type", F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    return (
        slots.join(actual, ["event_type", "h"], "left_anti")
        .select("event_type", (F.col("h") * 3600).alias("hour_epoch"))
    )


@register(
    "events_funnel_conversion",
    survey_ids=("A1", "J3", "A2"),
    oracle="""
WITH views AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), clicks AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN views v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click'
  GROUP BY e.user_id
), purchases AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN clicks c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
)
SELECT CAST(count(*) AS BIGINT) AS users_viewed,
       CAST(count(c.t2) AS BIGINT) AS users_clicked,
       CAST(count(p.t3) AS BIGINT) AS users_purchased,
       round(CAST(count(c.t2) AS DOUBLE) / count(*), 6) AS view_to_click,
       round(CAST(count(p.t3) AS DOUBLE) / count(*), 6) AS view_to_purchase
FROM views v
LEFT JOIN clicks c ON v.user_id = c.user_id
LEFT JOIN purchases p ON v.user_id = p.user_id
""",
    doc="Ordered funnel conversion (view -> click -> purchase): each "
    "step's first-event-time is a correlated MIN over events strictly "
    "AFTER the previous step, decorrelated into per-user aggregates "
    "chained by equi-joins with a residual ts predicate (P9 shape). "
    "Every join keys on user_id — one partitioning reused across all "
    "three steps; timestamps compare exactly (identical parquet "
    "micros on both engines).",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    funnel = views.join(clicks, "user_id", "left").join(purchases, "user_id", "left")
    return funnel.agg(
        F.count("*").alias("users_viewed"),
        F.count("t2").alias("users_clicked"),
        F.count("t3").alias("users_purchased"),
        F.round(F.count("t2").cast("double") / F.count("*"), 6).alias(
            "view_to_click"
        ),
        F.round(F.count("t3").cast("double") / F.count("*"), 6).alias(
            "view_to_purchase"
        ),
    )


@register(
    "events_retention_cohort",
    survey_ids=("A1", "J1", "F15"),
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT CAST(floor(epoch_us(f.first_ts) / 86400000000) AS BIGINT) AS cohort_day,
       CAST(floor((epoch_us(e.ts) - epoch_us(f.first_ts)) / 604800000000)
            AS BIGINT) AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events e
JOIN first_seen f ON e.user_id = f.user_id
GROUP BY cohort_day, week_offset
""",
    doc="Retention cohorts: users bucketed by first-seen day, activity "
    "counted in 7-day offsets from each user's OWN first event — the "
    "classic cohort-retention matrix. Week offsets are pure INTEGER "
    "MICROSECOND arithmetic (unix_micros / epoch_us — exact on both "
    "engines; second-truncating epoch() vs fractional epoch() would "
    "disagree within 1 s of a bucket boundary), no calendar "
    "truncation, so buckets are identical across DST and week-start "
    "conventions. One shuffle on user_id for first-seen, one for the "
    "cohort rollup.",
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    ep = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    joined = ev.join(first_seen, "user_id").select(
        "user_id",
        F.floor(ep("first_ts") / 86_400_000_000).cast("long").alias("cohort_day"),
        F.floor((ep("ts") - ep("first_ts")) / 604_800_000_000)
        .cast("long")
        .alias("week_offset"),
    )
    return joined.groupBy("cohort_day", "week_offset").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "events_anomaly_zscore",
    survey_ids=("A1", "F15", "A2"),
    oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value AS DECIMAL(25,6))
                  * CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
), scored AS (
  SELECT e.event_id, e.event_type, e.value,
         (e.value - st.s1 / st.n)
           / nullif(sqrt(st.s2 / st.n - (st.s1 / st.n) * (st.s1 / st.n)), 0)
           AS z
  FROM events e JOIN stats st ON e.event_type = st.event_type
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies,
       round(max(abs(z)), 6) AS max_abs_z
FROM scored
GROUP BY event_type
""",
    doc="Per-type z-score anomaly flagging. The moments accumulate in "
    "DECIMAL (exact, order-independent — a double sum-of-squares would "
    "differ in final ulps between engines and could flip a |z| > 3 "
    "boundary row); the variance/sqrt happen once per GROUP on "
    "identical doubles. The correlated mean/std is decorrelated into "
    "a per-type aggregate equi-joined back (A2) — at scale that's a "
    "broadcast of #event_types rows against the fact table.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(25,6)")
    stats = ev.groupBy("event_type").agg(
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
    scored = ev.join(F.broadcast(stats), "event_type").select(
        "event_type", F.abs(z).alias("abs_z")
    )
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("abs_z") > 3.0, 1).otherwise(0))
        .cast("long")
        .alias("n_anomalies"),
        F.round(F.max("abs_z"), 6).alias("max_abs_z"),
    )


@register(
    "events_session_window_native",
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
  FROM events WHERE ts IS NOT NULL
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
    doc="Gap sessionization via Spark's NATIVE session_window operator "
    "(the third sessionizer next to the lag+running-sum batch form and "
    "the applyInPandasWithState streaming form — same 30-min gap, "
    "same sessions, pinned against the same oracle). session_window "
    "merges overlapping per-row [ts, ts+gap) intervals inside a "
    "dedicated SessionWindow aggregation — one shuffle on (user_id), "
    "no window-function total sort, and the operator is "
    "streaming-ready (works under watermark unchanged).",
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session_window drops NULL event time silently; the exclusion is
    # explicit and mirrored in the oracle
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
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


# -- KMV distinct sketch ----------------------------------------------------

KMV_K = 64
KMV_P = 2_147_483_647  # Mersenne prime 2^31-1
# Multiplier ~0.62*P: (u%P)*A wraps mod P many times even for small
# consecutive ids, making the hash equidistributed (the original
# minstd 48271 never wrapped for test-scale ids — the map stayed
# ORDER-PRESERVING and the estimator read 44k for 150 users).
# (u%P)*A + B < 2^62: no int64 overflow on either engine.
KMV_A, KMV_B = 1_327_217_885, 11


@register(
    "events_kmv_distinct_sketch",
    survey_ids=("A1",),
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ((user_id % {KMV_P}) * {KMV_A} + {KMV_B}) % {KMV_P} AS hv
  FROM events
  WHERE user_id IS NOT NULL
),
ranked AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_hashes
  FROM h
),
sk AS (
  SELECT event_type,
         CAST(max(CASE WHEN rn <= {KMV_K} THEN hv END) AS BIGINT) AS kth_min,
         CAST(any_value(n_hashes) AS BIGINT) AS n_hashes
  FROM ranked GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, e.n_exact,
       CASE WHEN s.n_hashes < {KMV_K}
            THEN CAST(s.n_hashes AS DOUBLE)
            ELSE round(CAST({KMV_K} - 1 AS BIGINT) * {KMV_P} * 1.0
                       / s.kth_min, 4)
       END AS kmv_estimate
FROM exact e JOIN sk s USING (event_type)
""",
    doc="KMV (k-minimum-values) distinct-user sketch per event_type — "
    "the MERGEABLE distinct sketch a 100 TB rollup pipeline keeps in "
    "its aggregate tables (union two sketches = union the hash sets, "
    "re-truncate to k; estimate = (k-1)*P/kth_min). Unlike "
    "approx_count_distinct (implementation-specific HLL, only "
    "bound-checkable — events_approx_sketches), the KMV sketch is "
    "built from an ENGINE-NEUTRAL universal hash ((u%P)*A+B mod P "
    "with A=1,327,217,885, B=11, exact int64 arithmetic — the SimHash "
    "playbook), so the "
    "DuckDB twin reproduces the sketch VALUE bit-for-bit and the "
    "driver hash-checks the estimator itself, not just its error "
    "bound. Groups with < k distinct hashes report the exact count. "
    "Spark plan: one distinct-aggregate + per-group row_number "
    "window over <= k surviving rows.",
)
def events_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    ev = t(spark, sf_dir, "events")
    # NULL user_id carries no identity: exclude it before hashing on
    # BOTH engines (count(DISTINCT) ignores NULL anyway, and a NULL hv
    # would rank NULLS FIRST in Spark vs NULLS LAST in DuckDB — the
    # row_number ranks would silently diverge).
    h = ev.filter(F.col("user_id").isNotNull()).select(
        "event_type",
        (
            (F.col("user_id") % KMV_P) * KMV_A + KMV_B
        ).cast("long").__mod__(KMV_P).alias("hv"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    ranked = h.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_hashes", F.count("*").over(Window.partitionBy("event_type"))
    )
    sk = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") <= KMV_K, F.col("hv")))
        .cast("long")
        .alias("kth_min"),
        F.first("n_hashes").cast("long").alias("n_hashes"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(sk, "event_type").select(
        "event_type",
        "n_exact",
        F.when(
            F.col("n_hashes") < KMV_K, F.col("n_hashes").cast("double")
        )
        .otherwise(
            F.round((KMV_K - 1) * KMV_P * F.lit(1.0) / F.col("kth_min"), 4)
        )
        .alias("kmv_estimate"),
    )


# -- Count-Min heavy-hitters sketch (r6) ------------------------------------

CMS_D = 4  # hash rows
CMS_W = 64  # buckets per row
# independently-seeded universal hashes h_i(u) = ((u%P)*A_i + B_i) % P % W;
# (u%P)*A_i <= 2.2e9 * 1.33e9 < 2^62 — exact int64 on both engines.
CMS_A = (1_327_217_885, 1_229_331_947, 1_073_741_827, 1_000_000_007)
CMS_B = (11, 101, 1_009, 10_007)


@register(
    "events_heavy_hitters_cms",
    survey_ids=("A1",),
    oracle=f"""
WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
hashes AS (
  SELECT user_id, i,
         ((user_id % {KMV_P})
          * (CASE i WHEN 0 THEN {CMS_A[0]} WHEN 1 THEN {CMS_A[1]}
                    WHEN 2 THEN {CMS_A[2]} ELSE {CMS_A[3]} END)
          + (CASE i WHEN 0 THEN {CMS_B[0]} WHEN 1 THEN {CMS_B[1]}
                    WHEN 2 THEN {CMS_B[2]} ELSE {CMS_B[3]} END))
         % {KMV_P} % {CMS_W} AS bucket
  FROM ev, unnest(range(0, {CMS_D})) AS u(i)
),
counters AS (
  SELECT i, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM hashes GROUP BY i, bucket
),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
  FROM ev GROUP BY user_id
),
est AS (
  SELECT h.user_id, CAST(min(c.cnt) AS BIGINT) AS cms_estimate
  FROM (SELECT DISTINCT user_id, i, bucket FROM hashes) h
  JOIN counters c ON c.i = h.i AND c.bucket = h.bucket
  GROUP BY h.user_id
)
SELECT e.user_id, e.exact_count, s.cms_estimate,
       CAST(s.cms_estimate - e.exact_count AS BIGINT) AS overestimate
FROM exact e JOIN est s USING (user_id)
""",
    doc=f"Count-Min heavy-hitters sketch ({CMS_D} hash rows x {CMS_W} "
    "buckets — Cormode & Muthukrishnan 2005): the MERGEABLE frequency "
    "sketch a 100 TB rollup keeps beside its KMV distinct sketch "
    "(merging two sketches = adding the counter grids cell-wise; the "
    "grid is d*w integers regardless of corpus size). Engine-neutral "
    "universal hashes (the KMV playbook: exact int64 arithmetic, "
    "shared constants) make the sketch VALUE hash-checkable, not just "
    "bound-checkable — and the output certifies the CMS guarantee "
    "itself: overestimate = estimate - exact is >= 0 for EVERY key "
    "(min over d counters can only overcount; a single negative would "
    "hash-mismatch the oracle and flag a broken sketch). Spark plan: "
    "one explode(d) + groupBy(i,bucket) partial-agg shuffle builds "
    "the grid; per-key estimates probe the d cells via a bucket "
    "equi-join + min aggregate. NULL user_id carries no identity "
    "(KMV policy).",
)
def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
    )
    a_arr = F.array(*[F.lit(a).cast("long") for a in CMS_A])
    b_arr = F.array(*[F.lit(b).cast("long") for b in CMS_B])
    bucket = (
        (F.col("user_id") % KMV_P) * F.element_at(a_arr, F.col("i") + 1)
        + F.element_at(b_arr, F.col("i") + 1)
    ).__mod__(KMV_P).__mod__(CMS_W)
    hashes = ev.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("i")
    ).select("user_id", "i", bucket.alias("bucket"))
    counters = hashes.groupBy("i", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )
    exact = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("exact_count")
    )
    probes = hashes.select("user_id", "i", "bucket").distinct()
    est = (
        probes.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )
    return exact.join(est, "user_id").select(
        "user_id",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count"))
        .cast("long")
        .alias("overestimate"),
    )


# -- Mergeable hash-rank quantile sketch (r6) --------------------------------

QSK_K = 48  # sample size per group
QSK_QS = (0.5, 0.9)  # estimated quantiles


@register(
    "events_quantile_sketch_hashsample",
    survey_ids=("A1",),
    oracle=f"""
WITH ev AS (
  SELECT event_type, event_id, round(value, 2) AS value
  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL
),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY ((event_id % {KMV_P}) * {KMV_A} + {KMV_B}) % {KMV_P},
                    event_id) AS rn
  FROM ev
),
sample AS (
  SELECT event_type, list(value ORDER BY value, 1) AS sv
  FROM ranked WHERE rn <= {QSK_K} GROUP BY event_type
),
full_vals AS (
  SELECT event_type, list(value ORDER BY value, 1) AS fv
  FROM ev GROUP BY event_type
)
SELECT s.event_type,
       CAST(len(s.sv) AS BIGINT) AS sample_n,
       s.sv[least(CAST(floor(0.5 * len(s.sv)) AS INT) + 1, len(s.sv))]
         AS est_p50,
       s.sv[least(CAST(floor(0.9 * len(s.sv)) AS INT) + 1, len(s.sv))]
         AS est_p90,
       f.fv[least(CAST(floor(0.5 * len(f.fv)) AS INT) + 1, len(f.fv))]
         AS exact_p50,
       f.fv[least(CAST(floor(0.9 * len(f.fv)) AS INT) + 1, len(f.fv))]
         AS exact_p90
FROM sample s JOIN full_vals f USING (event_type)
""",
    doc=f"Mergeable quantile sketch by HASH-RANK sampling (k={QSK_K} "
    "per group): keep the k rows whose universal event_id hash is "
    "smallest — a uniform sample that is deterministic AND mergeable "
    "(union two sketches = union the rows, re-keep the k smallest "
    "hashes; the same min-k algebra as KMV), so a 100 TB rollup can "
    "maintain it incrementally per partition and merge upward. "
    "Quantile estimates read the sample at the same DISCRETE index "
    "formula both engines share (floor(q*n)+1 of the value-sorted "
    "sample — no engine-specific interpolation), and the exact "
    "quantiles over the full data ride along so the driver "
    "hash-checks estimator AND ground truth. Estimator quality is "
    "pinned separately (tests/test_sketches.py: the k-sample p50 "
    "lands within the exact p25-p75 on every group). Spark plan: one "
    "per-group hash row_number window over <= group-size rows, then "
    "two in-row array reads — no UDFs, no collect.",
)
def events_quantile_sketch_hashsample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type", "event_id", F.round("value", 2).alias("value")
        )
    )
    hv = ((F.col("event_id") % KMV_P) * KMV_A + KMV_B).__mod__(KMV_P)
    w = Window.partitionBy("event_type").orderBy(hv.asc(), F.col("event_id"))
    sample = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QSK_K)
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("sv"))
    )
    full_vals = ev.groupBy("event_type").agg(
        F.sort_array(F.collect_list("value")).alias("fv")
    )

    def q_at(arr: str, q: float):
        n = F.size(arr)
        idx = F.least(F.floor(F.lit(q) * n).cast("int") + 1, n)
        return F.element_at(F.col(arr), idx)

    return sample.join(full_vals, "event_type").select(
        "event_type",
        F.size("sv").cast("long").alias("sample_n"),
        q_at("sv", 0.5).alias("est_p50"),
        q_at("sv", 0.9).alias("est_p90"),
        q_at("fv", 0.5).alias("exact_p50"),
        q_at("fv", 0.9).alias("exact_p90"),
    )


@register(
    "events_kmv_sketch_merge",
    survey_ids=("A1", "SET1"),
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ((user_id % {KMV_P}) * {KMV_A} + {KMV_B}) % {KMV_P} AS hv
  FROM events WHERE user_id IS NOT NULL
),
group_sketches AS (
  SELECT event_type, hv FROM (
    SELECT event_type, hv,
           row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
    FROM h
  ) WHERE rn <= {KMV_K}
),
merged AS (
  SELECT hv FROM (
    SELECT hv, row_number() OVER (ORDER BY hv) AS rn
    FROM (SELECT DISTINCT hv FROM group_sketches)
  ) WHERE rn <= {KMV_K}
),
direct AS (
  SELECT hv FROM (
    SELECT hv, row_number() OVER (ORDER BY hv) AS rn
    FROM (SELECT DISTINCT hv FROM h)
  ) WHERE rn <= {KMV_K}
),
stats AS (
  SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events
          WHERE user_id IS NOT NULL) AS n_exact,
         (SELECT CAST(count(*) AS BIGINT) FROM merged) AS merged_n,
         (SELECT CAST(max(hv) AS BIGINT) FROM merged) AS merged_kth,
         (SELECT CAST(count(*) AS BIGINT) FROM direct) AS direct_n,
         (SELECT CAST(max(hv) AS BIGINT) FROM direct) AS direct_kth
)
SELECT n_exact,
       CASE WHEN merged_n < {KMV_K} THEN CAST(merged_n AS DOUBLE)
            ELSE round(CAST({KMV_K} - 1 AS BIGINT) * {KMV_P} * 1.0
                       / merged_kth, 4) END AS kmv_estimate_merged,
       (merged_n = direct_n AND merged_kth = direct_kth)
         AS merge_equals_direct
FROM stats
""",
    doc="KMV sketch MERGE — the mergeability that makes the sketch a "
    "100 TB rollup primitive, pinned INSIDE the hash contract: "
    "per-event-type KMV sketches (k smallest distinct hashes each) "
    "are merged by union + re-truncate-to-k, and the merged sketch "
    "must be IDENTICAL to the sketch built directly over the whole "
    "corpus (any global top-k hash is top-k within its own group, so "
    "the union always contains it — merge_equals_direct is a "
    "mathematical invariant and the oracle pins it true). The merged "
    "estimate rides along vs the exact distinct count. This is the "
    "algebra a partitioned rollup table exploits: maintain sketches "
    "per partition, merge upward without touching raw data.",
)
def events_kmv_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    h = ev.select(
        "event_type",
        ((F.col("user_id") % KMV_P) * KMV_A + KMV_B)
        .cast("long")
        .__mod__(KMV_P)
        .alias("hv"),
    ).distinct()
    wg = Window.partitionBy("event_type").orderBy("hv")
    group_sketches = (
        h.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "hv")
    )
    def topk(df):
        # global k-smallest via orderBy+limit, NOT a constant-key
        # window: this compiles to TakeOrderedAndProject (map-side
        # partial top-k per partition, then a k*partitions merge) —
        # the plan that survives 1e9 distinct hashes, where a
        # partitionBy(lit(1)) row_number would serialize on one task
        return (
            df.select("hv")
            .distinct()
            .orderBy("hv")
            .limit(KMV_K)
            .agg(
                F.count("*").cast("long").alias("n"),
                F.max("hv").cast("long").alias("kth"),
            )
        )

    merged = topk(group_sketches).select(
        F.col("n").alias("merged_n"), F.col("kth").alias("merged_kth")
    )
    direct = topk(h).select(
        F.col("n").alias("direct_n"), F.col("kth").alias("direct_kth")
    )
    exact = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    return (
        exact.crossJoin(merged)
        .crossJoin(direct)
        .select(
            "n_exact",
            F.when(
                F.col("merged_n") < KMV_K, F.col("merged_n").cast("double")
            )
            .otherwise(
                F.round(
                    (KMV_K - 1) * KMV_P * F.lit(1.0) / F.col("merged_kth"), 4
                )
            )
            .alias("kmv_estimate_merged"),
            (
                (F.col("merged_n") == F.col("direct_n"))
                & (F.col("merged_kth") == F.col("direct_kth"))
            ).alias("merge_equals_direct"),
        )
    )


@register(
    "events_ols_trend_by_type",
    survey_ids=("A1", "F15"),
    oracle="""
WITH ev AS (
  SELECT event_type,
         epoch(ts) - 1700000000 AS x,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(cents) AS BIGINT) AS sy,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(x * cents) AS HUGEINT) AS sxy
  FROM ev GROUP BY event_type
)
SELECT event_type, n,
       CASE WHEN n * sxx - CAST(sx AS HUGEINT) * sx = 0 THEN NULL
            ELSE round(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                       / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                       / 100.0, 9)
       END AS slope_cents_per_sec,
       round(CAST(sy AS DOUBLE) / n / 100.0, 6) AS mean_value
FROM s
""",
    doc="Per-group OLS TREND (least-squares slope of value over event "
    "time) — the analytics primitive behind drift monitors and "
    "forecast baselines, computed the only way that hash-checks "
    "across engines: all five sufficient statistics (n, Sx, Sy, Sxx, "
    "Sxy) accumulate in EXACT integer arithmetic (epoch seconds "
    "re-based to keep x*x inside int64-safe range on the Spark side "
    "via DECIMAL(38,0); cents for values), so the closed-form slope "
    "is ONE IEEE division of two exactly-agreed operands — identical "
    "bits on both engines, no float accumulation order to diverge. "
    "Zero-variance time (all events of a type in the same second) "
    "yields a NULL slope via the determinant guard, not a "
    "divide-by-zero (the ANSI-mode crash class). Map-side combinable "
    "sums — one shuffle, mergeable partials, the rollup-table shape.",
)
def events_ols_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            (F.unix_timestamp("ts") - 1_700_000_000).alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("cents").cast("long").alias("sy"),
        F.sum(d38(F.col("x")) * d38(F.col("x"))).alias("sxx"),
        F.sum(d38(F.col("x")) * d38(F.col("cents"))).alias("sxy"),
    )
    n, sx, sy = F.col("n").cast("decimal(38,0)"), d38(F.col("sx")), d38(F.col("sy"))
    det = n * F.col("sxx") - sx * sx
    num = n * F.col("sxy") - sx * sy
    return s.select(
        "event_type",
        "n",
        F.when(det == 0, None)
        .otherwise(
            F.round(num.cast("double") / det.cast("double") / 100.0, 9)
        )
        .alias("slope_cents_per_sec"),
        F.round(sy.cast("double") / n.cast("double") / 100.0, 6).alias(
            "mean_value"
        ),
    )


@register(
    "events_trailing_range_frame",
    survey_ids=(),
    oracle="""
SELECT user_id, event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
       CAST(count(*) OVER w AS BIGINT) AS trail_n,
       CAST(round(sum(CAST(value AS DECIMAL(25,6))) OVER w, 2) AS DOUBLE)
         AS trail_sum
FROM events WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
""",
    doc="TIME-RANGE window frame — the semantic ROWS frames can't "
    "express: each event's trailing-10-minute count and exact-"
    "DECIMAL value sum per user, where the frame is defined by the "
    "EVENT-TIME distance (RANGE BETWEEN 600 PRECEDING), not a row "
    "count — the rate-limiter / velocity-check shape. RANGE frames "
    "include ALL peers of the current ordering value, so rows tied "
    "at the same second see identical frames in both engines — no "
    "tie-break sensitivity, unlike ROWS (which is why the moving "
    "frame query needs its (ts, event_id) total order and this one "
    "does not). Ordering key is floor-epoch seconds (Spark "
    "unix_timestamp truncates identically); same single shuffle on "
    "user_id + one in-partition sort as the ROWS variant.",
)
def events_trailing_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    epoch_s = F.unix_timestamp("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-600, 0)
    )
    v = F.col("value").cast("decimal(25,6)")
    return ev.select(
        "user_id",
        "event_id",
        epoch_s.alias("ts_epoch"),
        F.count("*").over(w).cast("long").alias("trail_n"),
        F.round(F.sum(v).over(w), 2).cast("double").alias("trail_sum"),
    )


@register(
    "events_sliding_window",
    survey_ids=("A1",),
    oracle="""
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep, user_id, value
  FROM events WHERE ts IS NOT NULL
),
x AS (
  SELECT (e.ep // 600 - k.k) * 600 AS ws, e.user_id, e.value
  FROM e CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
)
SELECT ws AS window_start_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE)
         AS total_value
FROM x GROUP BY ws
""",
    doc="SLIDING (hopping) event-time windows — 30-minute windows "
    "every 10 minutes, so each event belongs to exactly THREE "
    "overlapping windows: the semantic tumbling windows can't "
    "express (a tumbling window partitions events; a sliding window "
    "REPLICATES them, which is why Spark's window() expands each row "
    "window_duration/slide times before the aggregate — a deliberate "
    "3x map-side blowup that the partial aggregation immediately "
    "collapses). Per window: event count, exact distinct users, "
    "exact-DECIMAL value sum. The oracle replicates rows with an "
    "explicit k in {0,1,2} cross join and the same epoch-aligned "
    "window-start arithmetic (boundaries at multiples of the slide, "
    "so second-floored epochs assign identically to full-precision "
    "timestamps). At 100 TB slide/duration choose the replication "
    "factor — the cost lever — and the aggregate stays one shuffle.",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(25,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start"))
            .cast("long")
            .alias("window_start_epoch"),
            "n_events",
            "n_users",
            "total_value",
        )
    )


HIST_BINS = 20


@register(
    "events_histogram_equiwidth",
    survey_ids=("A1",),
    oracle=f"""
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
bounds AS (
  SELECT min(value) AS lo, max(value) AS hi FROM v
),
binned AS (
  SELECT CAST(least(
           floor((v.value - b.lo) * {HIST_BINS} / nullif(b.hi - b.lo, 0)),
           {HIST_BINS} - 1) AS INT) AS bin,
         v.value
  FROM v CROSS JOIN bounds b
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE)
         AS bin_sum
FROM binned GROUP BY bin
""",
    doc="EQUI-WIDTH histogram (20 bins over [min, max]) — the "
    "equal-RANGE complement of the equal-COUNT ntile binning "
    "(w_ntile_quality_bins): two passes, (1) a global min/max scalar "
    "aggregate (one row, broadcast — the q11/q22 scalar-join shape), "
    "(2) a narrow map computing floor((v-lo)*B/(hi-lo)) with the max "
    "value clamped into the last bin (the half-open-interval edge "
    "every histogram implementation gets wrong once), then one "
    "group-by. Bin assignment divides IDENTICAL operands in both "
    "engines (same single division of the same doubles, floor of the "
    "same result), so the hash checks actual bin membership. A "
    "zero-range corpus (all values equal) yields NULL bins via "
    "nullif — degenerate input, explicit answer, no divide error.",
)
def events_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        "value"
    )
    bounds = v.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = v.join(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                * HIST_BINS
                / F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0))
            ),
            F.lit(HIST_BINS - 1),
        )
        .cast("int")
        .alias("bin"),
        "value",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(25,6)")), 2)
        .cast("double")
        .alias("bin_sum"),
    )


@register(
    "w_first_last_ignore_nulls",
    survey_ids=("A5",),
    oracle="""
SELECT user_id, event_id,
       first_value(value IGNORE NULLS) OVER w AS first_nonnull_value,
       last_value(value IGNORE NULLS) OVER w AS running_last_nonnull,
       CAST(count(value) OVER w AS BIGINT) AS n_nonnull_so_far
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    doc="Window navigation with IGNORE NULLS — the gap-carrying "
    "semantic plain first/last_value cannot express: per user in "
    "event order, the first non-NULL measurement and the RUNNING "
    "last non-NULL (the carry-forward/LOCF shape that imputes gaps "
    "from the most recent real reading — last_value without IGNORE "
    "NULLS would return the current row's NULL right back). "
    "Deterministic total order (ts, event_id) inside an unbounded-"
    "preceding frame; count(value) counts only non-NULLs on both "
    "engines, pinning agreement on which rows the navigation "
    "skipped. One shuffle on user_id, one in-partition sort, all "
    "three specs share the frame.",
)
def w_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return ev.select(
        "user_id",
        "event_id",
        F.first("value", ignorenulls=True).over(w).alias("first_nonnull_value"),
        F.last("value", ignorenulls=True).over(w).alias("running_last_nonnull"),
        F.count("value").over(w).cast("long").alias("n_nonnull_so_far"),
    )
