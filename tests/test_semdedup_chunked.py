"""Chunked SemDeDup centroid assignment (r6, VERDICT item 7).

The chunked running-min assignment must agree with the r5 window
formulation row-for-row — including the NULLS-LAST zero-norm policy
and the centroid-id tie-break — at k well beyond the chunk size, and
it must actually iterate (> 1 chunk) on that corpus.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tijdloze_musicbrainz_spark.plans.similarity import (
    SEMDEDUP_CENT_CHUNK,
    _assign_centroids_chunked,
    cosine,
)


def _windowed_assignment(vecs, cents):
    """The r5 formulation, kept here as the equivalence oracle."""
    scored = vecs.join(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "cent_id",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("__sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc_nulls_last("__sim"), F.asc("cent_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "cent_id")
    )


def test_chunked_assignment_matches_windowed_at_large_k(spark):
    # 600 vectors, k = 60 centroids = 3.75x the chunk size; vec 37 is
    # all-zero (zero-norm: NULL cosine to everything, must land on the
    # lowest centroid id on both paths); duplicated vectors force
    # cosine ties resolved by cent_id
    dim = 8
    vecs = spark.range(600).select(
        F.col("id").alias("vec_id"),
        F.when(
            F.col("id") == 37, F.array(*[F.lit(0.0)] * dim)
        )
        .otherwise(
            F.array(
                *[
                    (
                        (F.col("id") % 17 + i * (F.col("id") % 5)).cast("double")
                        - 8.0
                    )
                    for i in range(dim)
                ]
            )
        )
        .alias("v"),
    )
    cents = vecs.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    k = cents.count()
    assert k > SEMDEDUP_CENT_CHUNK * 3  # genuinely chunked regime

    got = {
        (r.vec_id, r.cent_id)
        for r in _assign_centroids_chunked(vecs, cents)
        .select("vec_id", "cent_id")
        .collect()
    }
    want = {
        (r.vec_id, r.cent_id)
        for r in _windowed_assignment(vecs, cents).collect()
    }
    assert got == want
    assert len(got) == 600  # every vector assigned exactly once
