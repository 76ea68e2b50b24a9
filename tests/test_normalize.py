"""search_key / clean parity: the Spark expression and its DuckDB SQL
twin must produce IDENTICAL keys, including on non-ASCII input (the
sf testdata is pure ASCII, so this is the only place that exercises
the accent/ligature folds — ADVICE r1 flagged exactly this gap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tijdloze_musicbrainz_spark.functions.normalize import (
    clean,
    clean_sql,
    search_key,
    search_key_sql,
)

TRICKY = [
    "Motörhead",
    "Beyoncé",
    "Sigur Rós",
    "Øst for Eden",
    "Æon Flux",
    "Straße",
    "Dvořák",
    "Łódź blues",
    "İstanbul (live)",
    "Señorita",
    "naïve œuvre",
    "Þórunn & Ðelta",
    "A_B C-D (Live)",
    "  spaces\tand\npunct!!!  ",
    "",
]


def test_search_key_spark_duckdb_parity(spark, duck):
    df = spark.createDataFrame([(s,) for s in TRICKY], "s string")
    got_spark = [r[0] for r in df.select(search_key(F.col("s"))).collect()]
    got_duck = [
        duck.execute(f"SELECT {search_key_sql('?')}", [s]).fetchone()[0]
        for s in TRICKY
    ]
    assert got_spark == got_duck, list(zip(TRICKY, got_spark, got_duck))


def test_search_key_examples(spark):
    df = spark.createDataFrame(
        [("Motörhead",), ("Hotellounge (Be the Death of Me)",), ("Smells Like Teen Spirit",)],
        "s string",
    )
    got = [r[0] for r in df.select(search_key(F.col("s"))).collect()]
    assert got == ["motorhead", "hotelloungebethedeathofme", "smellsliketeenspirit"]


def test_clean_parity(spark, duck):
    samples = ["…wait“quote”‐dash’s", "plain"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got_spark = [r[0] for r in df.select(clean(F.col("s"))).collect()]
    got_duck = [
        duck.execute(f"SELECT {clean_sql('?')}", [s]).fetchone()[0] for s in samples
    ]
    assert got_spark == got_duck
    assert got_spark[0] == "...wait\"quote\"-dash's"
