"""Commit-protocol properties of the manifest-committed table
(operators/manifest.py): snapshot isolation across a multi-bucket
merge, crash safety before the pointer swap, optimistic-concurrency
conflict detection, and time travel."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from tijdloze_musicbrainz_spark.operators.manifest import (
    CommitConflict,
    current_version,
    merge_upsert_manifest,
    read_table,
)


def _rows(spark, table, version=None):
    df = read_table(spark, table, version=version)
    return {(r.k, r.seq, r.v) for r in df.collect()} if df is not None else set()


def test_merge_and_snapshot_versions(spark, tmp_path_factory):
    table = str(tmp_path_factory.mktemp("manifest") / "t")
    full = spark.range(100).selectExpr("id as k", "1L as seq", "id as v")
    touched = merge_upsert_manifest(full, table, ["k"], "seq")
    assert len(touched) > 1  # multi-bucket commit
    assert current_version(table) == 0
    assert len(_rows(spark, table)) == 100

    inc = spark.createDataFrame([(7, 2, 999), (13, 2, 888)], "k long, seq long, v long")
    merge_upsert_manifest(inc, table, ["k"], "seq")
    assert current_version(table) == 1
    now = _rows(spark, table)
    assert (7, 2, 999) in now and (13, 2, 888) in now
    assert len(now) == 100  # keys upserted, not appended

    # time travel: version 0 still serves the pre-merge values
    v0 = _rows(spark, table, version=0)
    assert (7, 1, 7) in v0 and (13, 1, 13) in v0


def test_crash_before_pointer_swap_leaves_old_snapshot(
    spark, tmp_path_factory, monkeypatch
):
    """Simulate a crash AFTER data files and manifest are written but
    BEFORE the pointer swap: readers must still see the old snapshot,
    and a retried merge must succeed and converge."""
    table = str(tmp_path_factory.mktemp("manifest_crash") / "t")
    full = spark.range(50).selectExpr("id as k", "1L as seq", "id as v")
    merge_upsert_manifest(full, table, ["k"], "seq")
    before = _rows(spark, table)

    import tijdloze_musicbrainz_spark.operators.manifest as m

    real_replace = os.replace

    def crash(src, dst):
        raise RuntimeError("simulated crash at the commit point")

    monkeypatch.setattr(m.os, "replace", crash)
    inc = spark.createDataFrame([(7, 2, 999)], "k long, seq long, v long")
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_upsert_manifest(inc, table, ["k"], "seq")
    monkeypatch.setattr(m.os, "replace", real_replace)

    # reader is untouched: still the old snapshot, pointer still v0
    assert current_version(table) == 0
    assert _rows(spark, table) == before

    # the orphaned v1 manifest blocks a blind retry (conflict), which
    # is the protocol telling the writer to clean up / re-resolve
    with pytest.raises(CommitConflict):
        merge_upsert_manifest(inc, table, ["k"], "seq")
    # crash recovery: remove the orphan commit attempt and retry
    os.remove(os.path.join(table, "_manifests", "v1.json"))
    merge_upsert_manifest(inc, table, ["k"], "seq")
    after = _rows(spark, table)
    assert (7, 2, 999) in after and len(after) == 50


def test_concurrent_committers_conflict(spark, tmp_path_factory):
    """Two writers preparing version N+1 from the same base: the
    second commit must raise CommitConflict, never silently clobber."""
    import json

    table = str(tmp_path_factory.mktemp("manifest_cc") / "t")
    full = spark.range(20).selectExpr("id as k", "1L as seq", "id as v")
    merge_upsert_manifest(full, table, ["k"], "seq")
    # writer A sneaks in a v1 manifest (as if committed elsewhere)
    with open(os.path.join(table, "_manifests", "v1.json"), "x") as f:
        json.dump({"version": 1, "files": {}}, f)
    inc = spark.createDataFrame([(3, 2, 1)], "k long, seq long, v long")
    with pytest.raises(CommitConflict):
        merge_upsert_manifest(inc, table, ["k"], "seq")


def test_replayed_batch_is_idempotent(spark, tmp_path_factory):
    table = str(tmp_path_factory.mktemp("manifest_idem") / "t")
    full = spark.range(30).selectExpr("id as k", "1L as seq", "id as v")
    merge_upsert_manifest(full, table, ["k"], "seq")
    snap1 = _rows(spark, table)
    merge_upsert_manifest(full, table, ["k"], "seq")  # replay
    assert _rows(spark, table) == snap1  # same winners, new version
    assert current_version(table) == 1
