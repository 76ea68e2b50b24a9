"""Estimator-quality pins for the engine-neutral sketches (r6).

The hash-checked oracles prove both engines compute the SAME sketch;
these tests pin that the sketch is also a GOOD estimator — properties
the differential alone can't express.
"""

from __future__ import annotations

from tijdloze_musicbrainz_spark.plans import REGISTRY


def test_cms_never_underestimates_and_is_tight_here(spark, sf_dir):
    rows = REGISTRY["events_heavy_hitters_cms"].builder(spark, sf_dir).collect()
    assert rows
    # the CMS guarantee: min over d counters can only overcount
    assert all(r.overestimate >= 0 for r in rows)
    # with ~15 users in 4x64 cells, collisions are rare: the heaviest
    # key's estimate must be exact (it dominates its own buckets)
    top = max(rows, key=lambda r: r.exact_count)
    assert top.cms_estimate == top.exact_count
    # and most keys should be exact at this occupancy
    exact_share = sum(1 for r in rows if r.overestimate == 0) / len(rows)
    assert exact_share >= 0.8, exact_share


def test_hashsample_quantiles_land_in_the_exact_iqr(spark, sf_dir):
    """The k-sample p50 must land within the exact p25-p75 of its
    group (a uniform sample of k=48 is far tighter than that; the
    loose band keeps the pin noise-proof), and p90 within p75-p99."""
    import duckdb

    rows = (
        REGISTRY["events_quantile_sketch_hashsample"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert rows
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    bands = {
        r[0]: r[1:]
        for r in con.execute(
            """
            SELECT event_type,
                   quantile_cont(value, 0.25), quantile_cont(value, 0.75),
                   quantile_cont(value, 0.99)
            FROM events WHERE value IS NOT NULL GROUP BY event_type
            """
        ).fetchall()
    }
    for r in rows:
        p25, p75, p99 = bands[r.event_type]
        assert p25 <= r.est_p50 <= p75, (r.event_type, r.est_p50, p25, p75)
        assert p75 <= r.est_p90 <= p99 * 1.01, (r.event_type, r.est_p90)
        # sample is capped at k and the estimates read real sample data
        assert r.sample_n <= 48


def test_hashsample_sketch_is_mergeable(spark, sf_dir):
    """The min-k-by-hash algebra: building the sketch over the UNION
    of two halves equals merging the halves' sketches (union rows,
    re-keep the k smallest hashes) — the property that lets a 100 TB
    rollup maintain it per partition and merge upward."""
    from pyspark.sql import functions as F

    from tijdloze_musicbrainz_spark.plans.events import (
        KMV_A,
        KMV_B,
        KMV_P,
        QSK_K,
    )
    from tijdloze_musicbrainz_spark.plans.util import t

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id").isNotNull() & F.col("value").isNotNull())
        .select("event_type", "event_id", F.round("value", 2).alias("value"))
        .withColumn(
            "hv", ((F.col("event_id") % KMV_P) * KMV_A + KMV_B) % KMV_P
        )
    )

    def sketch(df):
        from pyspark.sql import Window

        w = Window.partitionBy("event_type").orderBy("hv", "event_id")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= QSK_K)
            .drop("rn")
        )

    whole = {
        (r.event_type, r.event_id) for r in sketch(ev).collect()
    }
    half_a = sketch(ev.filter(F.col("event_id") % 2 == 0))
    half_b = sketch(ev.filter(F.col("event_id") % 2 == 1))
    merged = {
        (r.event_type, r.event_id)
        for r in sketch(half_a.unionByName(half_b)).collect()
    }
    assert merged == whole
