"""Edge-case differential harness for the events tier: constructed
events exercise zero-variance groups (the z-score crash class),
singleton event types, duplicate timestamps, and single-event users —
each query's builder vs its own DuckDB oracle on the same parquet."""

from __future__ import annotations

import math

import duckdb
import pytest

from tijdloze_musicbrainz_spark.plans import REGISTRY

EDGE_EVENT_QUERIES = [
    "events_anomaly_zscore",
    "events_tumbling_window",
    "events_sessionize",
    "events_session_window_native",
    "events_json_extract",
    "events_kmv_distinct_sketch",
    # r6 sketches + watermark proof: NULL user_id / NULL event_id rows
    # must be excluded identically (no identity -> no sketch entry)
    "events_heavy_hitters_cms",
    "events_quantile_sketch_hashsample",
    "events_kmv_sketch_merge",
    "events_ols_trend_by_type",  # singleton group -> NULL slope guard
    "streaming_watermark_late_drop",
    "events_hypertable_rollup",
    "events_moving_frame",
    # r8b: RANGE frame ties at the same second share frames; sliding
    # windows replicate rows 3x — NULL ts/user/value must behave
    # identically through both
    "events_trailing_range_frame",
    "events_sliding_window",
    # r8b: LOCF navigation must skip the NULL-value rows identically
    "w_first_last_ignore_nulls",
    "events_histogram_equiwidth",
    "events_funnel_conversion",
    # streaming twins drain the same file via availableNow — the
    # zero-variance fix in the stream scorer is pinned here too
    "streaming_static_join_zscore",
    "streaming_tumbling_window",
    # the multimodal tier decodes the same props payloads as bytes
    "multimodal_fake_decode",
    "multimodal_frame_sample",
    "multimodal_feature_embed",
]


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events")
    con = duckdb.connect()
    rows = []
    # zero-variance type: 20 events, constant value, one per minute
    for i in range(20):
        rows.append((i, f"2024-01-01 00:{i:02d}:00", 1, "flat", 5.0, '{"k": 1}'))
    # singleton type (n = 1: variance term is exactly 0 too)
    rows.append((100, "2024-01-01 01:00:00", 2, "solo", 7.0, '{"k": 2}'))
    # duplicate timestamps, same user, funnel-ish types
    rows.append((200, "2024-01-02 00:00:00", 3, "view", 1.0, '{"k": 3}'))
    rows.append((201, "2024-01-02 00:00:00", 3, "click", 2.0, '{"k": 4}'))
    rows.append((202, "2024-01-02 00:00:00", 3, "purchase", 3.0, '{"k": 5}'))
    # single-event user far away in time
    rows.append((300, "2024-02-01 12:00:00", 4, "view", 9.0, '{"k": 6}'))
    # hostile props payloads: empty, malformed, NULL — from_json NULLs
    # them, so the json_extract oracle must too
    rows.append((400, "2024-02-01 13:00:00", 5, "view", 1.0, ""))
    rows.append((401, "2024-02-01 13:01:00", 5, "view", 1.0, '{"k": oops'))
    rows.append((402, "2024-02-01 13:02:00", 5, "view", 1.0, None))
    # VALID JSON, hostile k types (ADVICE r4): non-numeric k hard-errors
    # a plain CAST in DuckDB; Spark's strict LongType parse NULLs every
    # one of these (including the quoted "5", the float, the bool, and
    # the int64 overflow) — both engines must agree on NULL
    rows.append((403, "2024-02-01 13:03:00", 5, "view", 1.0, '{"k": "abc"}'))
    rows.append((404, "2024-02-01 13:04:00", 5, "view", 1.0, '{"k": "5"}'))
    rows.append((405, "2024-02-01 13:05:00", 5, "view", 1.0, '{"k": 5.7}'))
    rows.append((406, "2024-02-01 13:06:00", 5, "view", 1.0, '{"k": true}'))
    rows.append((407, "2024-02-01 13:07:00", 5, "view", 1.0, '{"k": null}'))
    rows.append((408, "2024-02-01 13:08:00", 5, "view", 1.0, "{}"))
    rows.append(
        (409, "2024-02-01 13:09:00", 5, "view", 1.0, '{"k": 99999999999999999999}')
    )
    rows.append((410, "2024-02-01 13:10:00", 5, "view", 1.0, '{"k": -3}'))
    # NULL value and NULL event_type: aggregations must agree on NULL
    # arithmetic (sum skips, count(*) doesn't) and NULL group keys
    rows.append((500, "2024-02-01 14:00:00", 6, "view", None, '{"k": 1}'))
    rows.append((501, "2024-02-01 14:01:00", 6, None, 2.5, '{"k": 2}'))
    # NULL event time: an event outside event-time cannot join windows,
    # sessions, or frames — time-based queries must EXCLUDE it on both
    # engines (Spark's window() silently drops it; DuckDB would keep a
    # NULL bucket; ORDER BY ts defaults diverge NULLS FIRST vs LAST)
    rows.append((502, None, 6, "view", 3.5, '{"k": 3}'))
    # NULL user_id: no identity — distinct/frequency sketches must
    # exclude it on BOTH engines (a NULL hash would also rank NULLS
    # FIRST in Spark vs NULLS LAST in DuckDB inside the sketch window)
    rows.append((600, "2024-02-01 15:00:00", None, "view", 1.5, '{"k": 1}'))
    # NULL event_id: no sample identity for the hash-rank quantile
    # sketch, and no deterministic tie-break — excluded there; other
    # queries must tolerate it consistently
    rows.append((None, "2024-02-01 15:01:00", 7, "view", 2.5, '{"k": 2}'))
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY ev TO '{d}/events.parquet' (FORMAT parquet)")
    return str(d)


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


@pytest.mark.parametrize("name", EDGE_EVENT_QUERIES)
def test_edge_events_matches_oracle(spark, edge_events_dir, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, edge_events_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(_canon(r[c]) for c in scols) for r in sdf.collect()], key=repr
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_events_dir}/events.parquet')"
    )
    rel = con.execute(spec.oracle)
    cols0 = [d[0] for d in rel.description]
    idx = [cols0.index(c) for c in sorted(cols0)]
    drows = sorted(
        [tuple(_canon(r[i]) for i in idx) for r in rel.fetchall()], key=repr
    )
    assert scols == sorted(cols0), (scols, sorted(cols0))
    assert srows == drows, (
        f"{name}: first diffs "
        f"{[(a, b) for a, b in zip(srows, drows) if a != b][:3]}"
    )
