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


# -- Z-order layout locality (r6) --------------------------------------------

Z_BITS = 8  # quantized bits per dimension (256 x 256 grid)
Z_FILE_SHIFT = 10  # a "file" covers 2^10 consecutive z (or linear) codes
# the 2-D probe box: selective in BOTH dimensions (16/256 each)
ZBOX = (32, 48, 64, 80)  # x_lo, x_hi, y_lo, y_hi


def _interleave_terms(x: str, y: str, spark_syntax: bool) -> str:
    """The Morton/Z code: bit i of x lands at position 2i, bit i of y
    at 2i+1 — unrolled to Z_BITS pure-integer terms. Spark SQL spells
    shifts as functions, DuckDB as operators; the FORMULA is one."""
    terms = []
    for i in range(Z_BITS):
        if spark_syntax:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _zorder_sql(spark_syntax: bool) -> str:
    x = f"(l_partkey % {1 << Z_BITS})"
    y = f"(l_suppkey % {1 << Z_BITS})"
    z = _interleave_terms(x, y, spark_syntax)
    lin = f"({x} * {1 << Z_BITS} + {y})"
    xl, xh, yl, yh = ZBOX
    in_box = f"{x} >= {xl} AND {x} < {xh} AND {y} >= {yl} AND {y} < {yh}"
    if spark_syntax:
        zfile = f"shiftright({z}, {Z_FILE_SHIFT})"
        lfile = f"shiftright({lin}, {Z_FILE_SHIFT})"
    else:
        zfile = f"(({z}) >> {Z_FILE_SHIFT})"
        lfile = f"(({lin}) >> {Z_FILE_SHIFT})"
    return f"""
WITH coded AS (
  SELECT {zfile} AS zfile, {lfile} AS lfile,
         CASE WHEN {in_box} THEN 1 ELSE 0 END AS in_box
  FROM lineitem
)
SELECT CAST(sum(in_box) AS BIGINT) AS n_box_rows,
       CAST(count(DISTINCT CASE WHEN in_box = 1 THEN zfile END) AS BIGINT)
         AS zorder_files_touched,
       CAST(count(DISTINCT CASE WHEN in_box = 1 THEN lfile END) AS BIGINT)
         AS linear_files_touched,
       CAST(count(DISTINCT zfile) AS BIGINT) AS zorder_files_total,
       CAST(count(DISTINCT lfile) AS BIGINT) AS linear_files_total,
       count(DISTINCT CASE WHEN in_box = 1 THEN zfile END)
         <= count(DISTINCT CASE WHEN in_box = 1 THEN lfile END)
         AS zorder_wins
FROM coded
"""


@register(
    "s_zorder_layout_locality",
    survey_ids=("S1", "F15"),
    oracle=_zorder_sql(spark_syntax=False),
    doc="Z-ORDER layout locality (the Delta/Iceberg OPTIMIZE ZORDER "
    "feature, measured rather than asserted): rows are coded with an "
    f"interleaved {Z_BITS}+{Z_BITS}-bit Morton curve over "
    "(partkey, suppkey) and assigned to z-range 'files' (top code "
    "bits — exactly how a z-sorted write lays consecutive codes into "
    "the same file); a 2-D box predicate selective in BOTH dimensions "
    "then touches count(DISTINCT file) files. The query emits that "
    "locality metric for the z-order layout AND the naive "
    "lexicographic (x,y) layout side by side, plus the pinned "
    "zorder_wins verdict — a 16x16/256x256 box clusters under z "
    "(one curve region) but shreds across every x-slice under "
    "lexicographic sort. The Morton code itself is one unrolled "
    "integer formula shared by both engines (shiftleft/shiftright vs "
    "<</>> spelling only), so the whole demonstration hash-checks. "
    "At 100 TB: repartitionByRange(z) + sortWithinPartitions(z) "
    "before the write gives parquet min/max footers this exact "
    "skipping power; the query is the layout's measurable contract.",
)
def s_zorder_layout_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(_zorder_sql(spark_syntax=True))


def _z_code_py(x: int, y: int) -> int:
    z = 0
    for i in range(Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _zbox_candidate_files() -> list[int]:
    """Every z-file the probe box can intersect — enumerated from the
    box's quantized coordinates (bounded: |box| cells, metadata-sized;
    a production implementation walks the z-range decomposition
    instead, same output)."""
    xl, xh, yl, yh = ZBOX
    return sorted(
        {
            _z_code_py(x, y) >> Z_FILE_SHIFT
            for x in range(xl, xh)
            for y in range(yl, yh)
        }
    )


@register(
    "s_zorder_write_prune",
    survey_ids=("S4", "P2", "F15"),
    oracle=f"""
WITH coded AS (
  SELECT ({_interleave_terms(f'(l_partkey % {1 << Z_BITS})',
                             f'(l_suppkey % {1 << Z_BITS})', False)}
         ) >> {Z_FILE_SHIFT} AS zfile,
         (l_partkey % {1 << Z_BITS}) AS x,
         (l_suppkey % {1 << Z_BITS}) AS y
  FROM lineitem
),
bx AS (SELECT unnest(range({ZBOX[0]}, {ZBOX[1]})) AS x),
by_ AS (SELECT unnest(range({ZBOX[2]}, {ZBOX[3]})) AS y),
cand AS (
  SELECT DISTINCT ({_interleave_terms('bx.x', 'by_.y', False)})
           >> {Z_FILE_SHIFT} AS zfile
  FROM bx, by_
)
SELECT
  CAST((SELECT count(*) FROM coded
        WHERE x >= {ZBOX[0]} AND x < {ZBOX[1]}
          AND y >= {ZBOX[2]} AND y < {ZBOX[3]}) AS BIGINT) AS n_box_rows,
  CAST((SELECT count(DISTINCT zfile) FROM coded
        WHERE zfile IN (SELECT zfile FROM cand)) AS BIGINT) AS files_read,
  -- rows with a NULL coordinate land in the hive DEFAULT partition:
  -- one more REAL file on disk, outside every candidate set
  CAST((SELECT count(DISTINCT zfile)
               + max(CASE WHEN zfile IS NULL THEN 1 ELSE 0 END)
        FROM coded) AS BIGINT) AS files_total,
  (SELECT count(DISTINCT zfile) FROM coded
   WHERE zfile IN (SELECT zfile FROM cand))
    < (SELECT count(DISTINCT zfile)
              + max(CASE WHEN zfile IS NULL THEN 1 ELSE 0 END)
       FROM coded) AS zorder_prunes
""",
    doc="MATERIALIZED z-order write + REAL file pruning (r8 — closes "
    "the r6/r7 verdict item: s_zorder_layout_locality proves locality "
    "on computed file assignments; this query writes the layout and "
    "measures files actually read). lineitem is written to parquet "
    "partitioned by its Morton file id (repartition(zfile) first, so "
    "each z-range directory holds exactly ONE file — the OPTIMIZE "
    "ZORDER layout on disk). The 2-D probe box is answered by (1) "
    "enumerating the z-files the box can intersect (bounded driver "
    "metadata — the z-range decomposition), (2) reading with an "
    "isin(candidates) filter on the PARTITION column, so Spark's "
    "partition pruning skips every other directory, and (3) applying "
    "the residual box predicate. files_read counts DISTINCT "
    "_metadata.file_path on the pruned scan — files the executors "
    "actually opened, not a computed assignment — and the oracle "
    "recomputes it as the candidate z-files that hold >= 1 row "
    "(1 file per directory by construction). zorder_prunes pins "
    "files_read < files_total. tests/test_plans.py pins "
    "PartitionFilters on the read plan.",
)
def s_zorder_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{SINK_ROOT}/s_zorder_files"
    side = 1 << Z_BITS
    x = (F.col("l_partkey") % side).cast("long")
    y = (F.col("l_suppkey") % side).cast("long")
    z = F.expr(
        _interleave_terms(
            f"(l_partkey % {side})", f"(l_suppkey % {side})", True
        )
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            x.alias("x"),
            y.alias("y"),
            F.shiftright(z, Z_FILE_SHIFT).alias("zfile"),
        )
    )
    # one file per z-range directory: hash-repartition on the
    # partition column so each directory is written by one task
    li.repartition("zfile").write.mode("overwrite").partitionBy(
        "zfile"
    ).parquet(path)

    cand = _zbox_candidate_files()  # bounded metadata (<= 4 files here)
    pruned = spark.read.parquet(path).filter(F.col("zfile").isin(cand))
    xl, xh, yl, yh = ZBOX
    box = pruned.filter(
        (F.col("x") >= xl) & (F.col("x") < xh)
        & (F.col("y") >= yl) & (F.col("y") < yh)
    )
    full = spark.read.parquet(path)
    return (
        box.agg(F.count("*").cast("long").alias("n_box_rows"))
        .crossJoin(
            pruned.agg(
                F.countDistinct(F.col("_metadata.file_path"))
                .cast("long")
                .alias("files_read")
            )
        )
        .crossJoin(
            full.agg(
                F.countDistinct(F.col("_metadata.file_path"))
                .cast("long")
                .alias("files_total")
            )
        )
        .select(
            "n_box_rows",
            "files_read",
            "files_total",
            (F.col("files_read") < F.col("files_total")).alias("zorder_prunes"),
        )
    )


@register(
    "s_stats_skipping_prune",
    survey_ids=("S4", "P2"),
    oracle=f"""
WITH buckets AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS fkey,
         min(o_orderdate) AS mn, max(o_orderdate) AS mx
  FROM orders GROUP BY 1
),
sel AS (
  SELECT CAST(count(*) AS INT) AS files_read FROM buckets
  WHERE NOT (mn > DATE '1995-03-31' OR mx < DATE '1995-01-01')
),
tot AS (SELECT CAST(count(*) AS INT) AS files_total FROM buckets),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         {money_sum_sql('o_totalprice')} AS total_price
  FROM orders
  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
)
SELECT agg.n_rows, agg.total_price, sel.files_read, tot.files_total
FROM agg, sel, tot
""",
    doc="MANIFEST-STATS DATA SKIPPING (the Delta add-file `stats` "
    "contract, materialized): orders are committed as one immutable "
    "file entry per calendar month with per-entry MIN/MAX of "
    "o_orderdate recorded in the manifest JSON "
    "(operators/manifest.py commit_clustered); a Q1-1995 range read "
    "then prunes every non-intersecting file FROM THE MANIFEST ALONE "
    "— zero parquet footer opens before the scan launches, unlike "
    "parquet row-group stats which still require touching each file "
    "— and aggregates the survivors under the residual predicate. "
    "files_read/files_total come from the actual pruning decision "
    "(the scan really opens only the kept entries); the oracle "
    "recomputes both from the bucket min/max, so a pruning bug that "
    "reads too few files breaks n_rows/total_price and one that "
    "reads too many breaks files_read. Differs from "
    "s_partitioned_prune (directory-name pruning on the partition "
    "value itself) in that stats skip on ANY recorded column's "
    "range, the layout stays flat, and the decision is O(manifest), "
    "not O(listing). At 100 TB the manifest read is the only "
    "driver-side cost; tests/test_manifest.py proves the pruned "
    "result equals the full scan and that pruning actually drops "
    "files.",
)
def s_stats_skipping_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..operators.manifest import commit_clustered, read_table_stats_pruned

    path = f"{SINK_ROOT}/s_stats_skip"
    shutil.rmtree(path, ignore_errors=True)
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    clustered = orders.withColumn(
        "fkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("int"),
    )
    commit_clustered(clustered, path, "fkey", ["o_orderdate"])
    lo, hi = "1995-01-01", "1995-03-31"
    pruned, files_read, files_total = read_table_stats_pruned(
        spark, path, "o_orderdate", lo, hi
    )
    if pruned is None:
        pruned = orders.limit(0)
    return (
        pruned.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("date"))
            & (F.col("o_orderdate") <= F.lit(hi).cast("date"))
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .withColumn("files_read", F.lit(files_read).cast("int"))
        .withColumn("files_total", F.lit(files_total).cast("int"))
    )


@register(
    "s_dynamic_partition_overwrite",
    survey_ids=("S4", "S7"),
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_orderdate, o_totalprice,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS pkey
  FROM orders
),
-- the second write replaces ONLY partition 1995-03 (pkey 23942):
-- doubled prices, odd keys only — every other partition keeps the
-- first write's rows untouched
final AS (
  SELECT o_orderkey, o_totalprice, pkey FROM base WHERE pkey <> 23942
  UNION ALL
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, pkey
  FROM base WHERE pkey = 23942 AND o_orderkey % 2 = 1
)
SELECT CAST(pkey AS INT) AS pkey,
       CAST(count(*) AS BIGINT) AS n_rows,
       {money_sum_sql('o_totalprice')} AS total_price
FROM final GROUP BY pkey
""",
    doc="DYNAMIC PARTITION OVERWRITE (partitionOverwriteMode=dynamic) "
    "— the idempotent partition-level reload every warehouse backfill "
    "depends on: a full partitioned load, then a second "
    "mode('overwrite') write containing ONLY the 1995-03 partition "
    "(odd keys, doubled prices) must replace THAT partition alone; "
    "under the default STATIC mode the same write would silently "
    "TRUNCATE every other partition — the classic data-loss footgun "
    "this query pins shut. The oracle recomputes the expected final "
    "state per partition; a static-mode regression (79 of 80 "
    "partitions vanished) or a non-replacement (duplicate rows in "
    "1995-03) both break the hash. At 100 TB this is how daily "
    "re-loads replace a day without rewriting the table; the "
    "manifest tier's commit_clustered(mode='append') + compact is "
    "the transactional alternative when readers need snapshot "
    "isolation during the swap.",
)
def s_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil  # noqa: PLC0415

    path = f"{SINK_ROOT}/s_dyn_overwrite"
    shutil.rmtree(path, ignore_errors=True)
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("int")
        .alias("pkey"),
    )
    base.write.partitionBy("pkey").parquet(path)
    reload_199503 = base.filter(
        (F.col("pkey") == 23942) & (F.col("o_orderkey") % 2 == 1)
    ).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice"), "pkey"
    )
    # the mode that makes overwrite PARTITION-scoped instead of
    # table-scoped; set per-write via the conf the writer reads
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        reload_199503.write.mode("overwrite").partitionBy("pkey").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    out = spark.read.parquet(path)
    return out.groupBy(F.col("pkey").cast("int").alias("pkey")).agg(
        F.count("*").cast("long").alias("n_rows"),
        money_sum(F.col("o_totalprice")).alias("total_price"),
    )


@register(
    "s_orc_roundtrip",
    survey_ids=("S4", "S1"),
    oracle=f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       {money_sum_sql("o_totalprice")} AS total
FROM orders WHERE o_orderkey % 10 = 0
GROUP BY o_orderstatus
""",
    doc="ORC sink/source ROUNDTRIP — Spark's second columnar format "
    "as a first-class interchange path (warehouses that standardized "
    "on Hive/ORC are a real migration source for the reference's "
    "Postgres world): a filtered orders projection is written as ORC "
    "(zstd, Spark's default), read back through the ORC reader, and "
    "aggregated; the DuckDB oracle computes the same aggregate from "
    "the original parquet, so a value-hash match proves the "
    "round-trip is lossless INCLUDING the DECIMAL money semantics "
    "(exact-decimal accumulation on both engines, money_sum). ORC "
    "carries the same predicate-pushdown/column-pruning/stats "
    "machinery as parquet in Spark, so the scan-side contracts "
    "asserted elsewhere (PushedFilters, ReadSchema) hold unchanged.",
)
def s_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = f"{SINK_ROOT}/orc_roundtrip_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).write.orc(path)
    return (
        spark.read.orc(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total"),
        )
    )


# The committed fixture parquets double as stand-ins for a raw-media
# landing zone: the binaryFile source is how a 100 TB multimodal
# pipeline INGESTS opaque files (images/audio dumped by crawlers)
# into binary columns before any decode runs.
def _fixture_dir() -> str:
    import os  # noqa: PLC0415

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixture_data",
    )


def _binaryfile_oracle() -> str:
    import os  # noqa: PLC0415

    d = os.path.join(_fixture_dir(), "*.parquet")
    return f"""
SELECT regexp_extract(filename, '([^/]+)$', 1) AS name,
       CAST(size AS BIGINT) AS n_bytes,
       md5(hex(content)) AS digest
FROM read_blob('{d}')
"""
# (md5 over the HEX encoding: DuckDB 1.0's md5 takes VARCHAR only,
# and both engines uppercase-hex identically, so the digest still
# certifies the exact bytes)


@register(
    "s_binaryfile_source",
    survey_ids=("S1",),
    oracle=_binaryfile_oracle(),
    doc="The binaryFile SOURCE — Spark's raw-media ingest lane (one "
    "row per file: path, length, content bytes), reading the repo's "
    "committed fixture files with pathGlobFilter and emitting "
    "(basename, byte length, md5 of the exact bytes); the DuckDB "
    "oracle reads the same files via read_blob and must produce the "
    "same digests — byte-level ingest parity, the property the "
    "multimodal decode tier builds on. At 100 TB this is the landing "
    "path for crawler image/audio dumps: file-granular parallelism "
    "(one InputPartition per file below maxPartitionBytes), no "
    "decode until mapInPandas asks for it.",
)
def s_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(_fixture_dir())
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
            F.col("length").cast("long").alias("n_bytes"),
            F.md5(F.hex(F.col("content"))).alias("digest"),
        )
    )
