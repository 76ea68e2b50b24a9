"""Registered golden queries for the composed MusicBrainz-shaped
pipeline: the full DAG runs over the deterministic fixture world
(fixtures.py, FIXTURES.md §B) and the oracle is the EXPECTED output
as literal VALUES — so the driver's hash compare verifies the whole
composition (area chain → artist cut → candidate pools → single-from
flagging → canonical argmin) end to end, not just isolated operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import musicbrainz_fixture_tables
from ..pipeline import run_pipeline
from .registry import register


@register(
    "mb_pipeline_canonical_e2e",
    survey_ids=("J1", "J2", "J5", "J6", "A2", "A3", "A4", "A8", "F7", "SET3", "P9"),
    oracle="""
SELECT * FROM (VALUES
  (11, 'r200', 'rg101', 1991, false, false, CAST(NULL AS INTEGER)),
  (11, 'r201', 'rg102', 1990, false, false, CAST(NULL AS INTEGER)),
  (11, 'r202', 'rg106', 1995, true,  false, CAST(NULL AS INTEGER)),
  (11, 'r203', 'rg107', 1997, false, true,  10)
) AS t(artist_id, recording_mb_id, release_group_mb_id, release_year,
       is_single_from, is_soundtrack, second_artist_id)
""",
    doc="The reference's full dataset-generation DAG composed "
    "(sql/1 -> sql/3 -> main.py pools -> canonical argmin) over the "
    "fixture world; the oracle is the hand-derived expected canonical "
    "mapping, so this entry golden-checks the composition: "
    "one-year-early single loses, two-years-early wins (bootleg year "
    "ignored), single-from beats plain compilation, VA soundtrack "
    "reachable only via the second pool, NULL-year entries dropped.",
)
def mb_pipeline_canonical_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = musicbrainz_fixture_tables(spark)
    best = run_pipeline(tables)["canonical"]
    return best.select(
        "artist_id",
        "recording_mb_id",
        "release_group_mb_id",
        "release_year",
        "is_single_from",
        "is_soundtrack",
        "second_artist_id",
    )


@register(
    "mb_pipeline_artist_aliases_e2e",
    survey_ids=("SET1", "A12", "F1", "J6"),
    oracle="""
SELECT * FROM (VALUES
  (10, 'gorki'), (10, 'gorky'), (10, 'lucdevos'), (11, 'nirvana')
) AS t(artist_id, alias)
""",
    doc="sql/4's 4-branch alias union over the fixture world, golden-"
    "checked: own name, alias table, credited name, and the "
    "legal-name edge (link_type 103 + attribute 1094) all fold "
    "through search_key and dedupe.",
)
def mb_pipeline_artist_aliases_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = musicbrainz_fixture_tables(spark)
    return run_pipeline(tables)["mb_artist_alias"].select(
        F.col("artist_id").cast("int").alias("artist_id"), "alias"
    )
