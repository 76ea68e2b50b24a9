"""salted_join must be result-identical to the plain join, and its
physical join key must include the salt (that's the whole point)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from tijdloze_musicbrainz_spark.operators.skew import salted_join


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
