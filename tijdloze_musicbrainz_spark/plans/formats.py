"""Storage-format and layout queries: ORC sink round-trip, partition-
pruned reads, and schema-evolution (drifted-schema) unions.

The reference's storage story is a single Postgres database
(src/util.py:5-11); a Spark-native engine replaces that with columnar
files whose LAYOUT is the index: format choice, directory
partitioning (the partition column never hits the data files and
prunes at the driver), and schema drift across snapshot generations —
the three things a 100 TB corpus actually exercises. Each query
writes a sink under the per-process SINK_ROOT, reads it back, and
reduces to an aggregate whose oracle is computed from the ORIGINAL
parquet, so the round-trip itself is what is being verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .etl import SINK_ROOT
from .registry import register
from .util import money_sum, money_sum_sql, t


@register(
    "s_orc_sink_roundtrip",
    survey_ids=("S4", "S5"),
    oracle=f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       {money_sum_sql('o_totalprice')} AS total
FROM orders
GROUP BY o_orderstatus
""",
    doc="ORC sink round-trip: same verified-write contract as the "
    "parquet sinks (S4/S5) through Spark's second first-class "
    "columnar format — write ORC, read ORC, aggregate; the oracle "
    "reads the original parquet, so any loss in the format hop "
    "breaks the hash.",
)
def s_orc_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{SINK_ROOT}/s_orc"
    t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).write.mode("overwrite").orc(path)
    return (
        spark.read.orc(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            money_sum(F.col("o_totalprice")).alias("total"),
        )
    )


@register(
    "s_partitioned_prune",
    survey_ids=("S4", "P2"),
    oracle=f"""
SELECT l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       {money_sum_sql('l_extendedprice')} AS total_price
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY l_linestatus
""",
    doc="Hive-style directory partitioning + partition pruning: the "
    "sink is written partitionBy(l_returnflag), the read filters on "
    "the partition column, so the scan lists ONLY the "
    "l_returnflag=R directory — at 100 TB this is the difference "
    "between scanning one third of the corpus and all of it. "
    "tests/test_plans.py pins PartitionFilters on the read plan.",
)
def s_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{SINK_ROOT}/s_partitioned"
    t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_extendedprice", "l_returnflag"
    ).write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    return (
        spark.read.parquet(path)
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n"),
            money_sum(F.col("l_extendedprice")).alias("total_price"),
        )
    )


@register(
    "s_schema_evolution_union",
    survey_ids=("S1", "SET3", "F3"),
    oracle="""
WITH v1 AS (
  SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source
  FROM documents WHERE doc_id % 2 = 0
),
v2 AS (
  SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, source
  FROM documents WHERE doc_id % 2 = 1
),
merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT coalesce(lang, '<none>') AS lang,
       coalesce(source, '<none>') AS source,
       CAST(count(*) AS BIGINT) AS n
FROM merged
GROUP BY 1, 2
""",
    doc="Schema evolution across snapshot generations: generation 1 "
    "has a `lang` column, generation 2 dropped it and added `source` "
    "— the drift every long-lived corpus accumulates. The read uses "
    "parquet mergeSchema so one scan reconciles both generations "
    "(missing columns surface as NULL), then aggregates per "
    "coalesced column. No re-write of old data — the 100 TB-safe "
    "answer to schema drift.",
)
def s_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{SINK_ROOT}/s_evolution"
    docs = t(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(f"{path}/gen=1")
    docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "source").write.mode(
        "overwrite"
    ).parquet(f"{path}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=1", f"{path}/gen=2"
    )
    return merged.groupBy(
        F.coalesce(F.col("lang"), F.lit("<none>")).alias("lang"),
        F.coalesce(F.col("source"), F.lit("<none>")).alias("source"),
    ).agg(F.count("*").alias("n"))


@register(
    "s_zstd_codec_roundtrip",
    survey_ids=("S4", "S5"),
    oracle=f"""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       {money_sum_sql('l_extendedprice')} AS total
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Compression-codec round-trip: the same verified-write "
    "contract through zstd-compressed parquet (the archival/cold-tier "
    "codec — ~30-40% smaller than snappy at ~equal scan speed on "
    "modern CPUs, the right default for a 100 TB corpus written once "
    "and scanned many times). Write zstd, read back, aggregate; the "
    "oracle reads the ORIGINAL snappy parquet, so any loss in the "
    "codec hop breaks the hash.",
)
def s_zstd_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{SINK_ROOT}/s_zstd"
    t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    ).write.mode("overwrite").option("compression", "zstd").parquet(path)
    return (
        spark.read.parquet(path)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            money_sum(F.col("l_extendedprice")).alias("total"),
        )
    )
