"""Runtime bloom-filter evidence (r6, companion to
j_bloom_prefilter_join): Spark's OWN injected runtime filter
(spark.sql.optimizer.runtime.bloomFilter) must activate on the
selective-build-side join shape and must not change the result.

The engine-neutral explicit filter (the registered query) proves the
SEMANTICS cross-engine; this test proves the BUILT-IN optimization is
available and wired: the optimized plan grows a
``bloom_filter_agg``-fed ``might_contain`` predicate on the probe
side. Thresholds are lowered for toy data (the application-side scan
threshold defaults to 10 GB).
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F


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


def _shape(spark, sf_dir):
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("s"),
        )
    )


def test_runtime_bloom_filter_activates_and_preserves_result(spark, sf_dir):
    on = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep a real shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    }
    with _conf(spark, on):
        df = _shape(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        assert "bloom_filter_agg" in plan
        with_filter = df.collect()

    with _conf(
        spark, {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}
    ):
        df2 = _shape(spark, sf_dir)
        plan2 = df2._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in plan2
        without_filter = df2.collect()

    assert [tuple(r) for r in with_filter] == [tuple(r) for r in without_filter]
