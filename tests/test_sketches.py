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


# -- Oracle-independence property tests (r7 verdict item 8) ------------------
#
# The Bloom/KMV/Morton queries share their hash/code formulas between
# the Spark plan and the DuckDB oracle, so their green rows prove
# self-agreement, not that the engineered contract holds. These tests
# back each contract from FIRST PRINCIPLES — measured false-positive
# rate vs the Bloom formula, KMV estimator error vs its standard
# deviation, Morton locality vs the lexicographic layout — with no
# Spark session and no oracle in the loop.


def test_bloom_fp_rate_matches_theory():
    """Measured FP rate on random NON-members ~ (1 - e^(-kn/m))^k.
    A biased hash family (clustered positions) would blow past the
    theoretical rate; a broken one (constant positions) would crater
    the fill ratio. Both fail this band."""
    import math
    import random

    from tijdloze_musicbrainz_spark.plans.scaleops import (
        BLOOM_A,
        BLOOM_B,
        BLOOM_M,
        BLOOM_P,
    )

    def positions(key):
        return [
            ((key % BLOOM_P) * BLOOM_A[i] + BLOOM_B[i]) % BLOOM_P % BLOOM_M
            for i in range(3)
        ]

    rng = random.Random(42)
    build = rng.sample(range(1, 50_000_000), 4096)
    bits = set()
    for key in build:
        bits.update(positions(key))

    # fill ratio sanity: ~1 - e^(-kn/m)
    fill = len(bits) / BLOOM_M
    expect_fill = 1 - math.exp(-3 * len(build) / BLOOM_M)
    assert abs(fill - expect_fill) < 0.02

    member_set = set(build)
    n_probe = 100_000
    fp = 0
    for _ in range(n_probe):
        key = rng.randrange(50_000_000, 2_000_000_000)
        if key in member_set:
            continue
        if all(p in bits for p in positions(key)):
            fp += 1
    rate = fp / n_probe
    theory = expect_fill**3
    # 3-sigma band around the theoretical rate (binomial std)
    sigma = math.sqrt(theory * (1 - theory) / n_probe)
    assert abs(rate - theory) < 3 * sigma + 0.001, (rate, theory)

    # and zero false negatives, the hard half of the contract
    assert all(all(p in bits for p in positions(k)) for k in build)


def test_kmv_estimate_within_standard_error():
    """(k-1)*P/kth_min estimates n distinct within ~1/sqrt(k-2)
    relative standard error. An order-preserving hash (the original
    minstd bug this sketch's constants were CHOSEN against) misses by
    orders of magnitude."""
    import random

    from tijdloze_musicbrainz_spark.plans.events import KMV_A, KMV_B, KMV_K, KMV_P

    rse = 1.0 / (KMV_K - 2) ** 0.5  # ~0.127 at k=64
    for seed, n in ((1, 2_000), (2, 10_000), (3, 50_000)):
        rng = random.Random(seed)
        keys = rng.sample(range(1, 1_000_000_000), n)
        hashes = sorted(((k % KMV_P) * KMV_A + KMV_B) % KMV_P for k in set(keys))
        kth = hashes[KMV_K - 1]
        est = (KMV_K - 1) * KMV_P / kth
        assert abs(est - n) / n < 4 * rse, (n, est)


def test_morton_locality_beats_linear_from_first_principles():
    """Pure-python enumeration of the committed ZBOX: with 2^10-code
    files, a Morton file is an ALIGNED 32x32 tile, so the 16x16 probe
    box (which fits inside one tile) touches exactly 1 z-file but 4
    linear files — and over random boxes z-files <= linear files
    whenever the box is square-ish (the Z-order locality claim)."""
    from tijdloze_musicbrainz_spark.plans.formats import Z_BITS, Z_FILE_SHIFT, ZBOX

    def z_code(x, y):
        z = 0
        for i in range(Z_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    side = 1 << Z_BITS

    def files(x_lo, x_hi, y_lo, y_hi):
        zf, lf = set(), set()
        for x in range(x_lo, x_hi):
            for y in range(y_lo, y_hi):
                zf.add(z_code(x, y) >> Z_FILE_SHIFT)
                lf.add((x * side + y) >> Z_FILE_SHIFT)
        return len(zf), len(lf)

    xl, xh, yl, yh = ZBOX
    n_z, n_lin = files(xl, xh, yl, yh)
    assert n_z == 1  # 16x16 box inside one aligned 32x32 Morton tile
    assert n_lin == 4  # linear layout cuts the box into 4 column files

    # random square boxes: Morton never touches more files than the
    # theoretical 4-tile bound for boxes up to a tile's side, and on
    # average beats the linear layout
    import random

    rng = random.Random(7)
    wins = ties = losses = 0
    for _ in range(25):
        w = rng.randrange(4, 33)
        x0 = rng.randrange(0, side - w)
        y0 = rng.randrange(0, side - w)
        n_z, n_lin = files(x0, x0 + w, y0, y0 + w)
        assert n_z <= 4  # a <=32-wide square spans <=2x2 aligned tiles
        wins += n_z < n_lin
        ties += n_z == n_lin
        losses += n_z > n_lin
    assert losses == 0
    assert wins > 0
