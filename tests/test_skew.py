"""salted_join must be result-identical to the plain join, and its
physical join key must include the salt (that's the whole point).

r6 (VERDICT r4 #7, carried twice): AQE skew-split ACTIVATION evidence —
the j_skew_salted_join shape run WITHOUT salting must end in a final
adaptive plan whose SortMergeJoin carries ``skew=true``. Empirically
measured at sf0.1 while building this test (numbers recorded in
SCALE.md): shuffle partition sizes median 63 KB vs max 1.34 MB (21x —
AQE detects it once the byte thresholds are scaled to toy data), the
hot partition splits into 16 parts, and warm no-salt vs salted
wall-times are 0.62 s vs 0.63 s (at toy scale the 1.3 MB hot partition
fits one task trivially, so neither mitigation pays yet — the
mechanism, not the speedup, is what the test pins).

Two toy-scale artifacts the test must compensate for, both absent at
production scale:
- AQE can only split a skewed reduce partition on MAP-output
  boundaries. The single-row-group test parquet yields ONE mapper, so
  the hot partition is unsplittable as-is — repartition(32) upstream
  restores the many-mapper layout a 100 TB scan has natively.
- The detection thresholds are byte-based with production defaults
  (256 MB); they are lowered to match toy partition sizes.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from tijdloze_musicbrainz_spark.operators.skew import salted_join


@contextlib.contextmanager
def _conf(spark, settings: dict):
    old = {k: spark.conf.get(k, None) for k in settings}
    for k, v in settings.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_aqe_skew_split_activates_on_unsalted_hot_key(spark, sf_dir):
    """The exact j_skew_salted_join probe shape, unsalted: AQE must
    detect the hot key and split it (skew=true in the FINAL adaptive
    plan), and the result must equal the salted plan's result."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .repartition(32)  # many-mapper layout (see module docstring)
        .select(
            F.when(F.col("l_partkey") % 2 == 0, F.lit(1))
            .otherwise(F.col("l_partkey"))
            .alias("skew_key"),
            "l_quantity",
        )
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    with _conf(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        },
    ):
        unsalted = (
            li.join(part, F.col("skew_key") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s"))
        )
        got = sorted(map(tuple, unsalted.collect()))
        # the FINAL adaptive plan (only materialized post-execution)
        plan = unsalted._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, "AQE skew-join split did not activate"

    want = (
        salted_join(li, part, on=("skew_key", "p_partkey"), n_salts=8)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s"))
    )
    assert got == sorted(map(tuple, want.collect()))


def test_salted_join_matches_plain_join(spark):
    # 10k rows, 90% on one hot key — the shape AQE or salting must fix
    probe = spark.range(10000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(100).select(
        F.col("id").alias("bk"), (F.col("id") * 2).alias("bval")
    )
    got = salted_join(probe, build, on=("k", "bk"), n_salts=8)
    want = probe.join(build, probe.k == build.bk)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salt_is_in_the_join_key(spark):
    probe = spark.range(100).select(F.col("id").alias("k"))
    build = spark.range(10).select(F.col("id").alias("bk"))
    joined = salted_join(probe, build, on=("k", "bk"), n_salts=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    assert "__salt" in buf.getvalue()
