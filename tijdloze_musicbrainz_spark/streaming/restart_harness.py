"""Shared injected-failure + checkpoint-restart driver for the index
restart proofs (r10 verdict item 8 — the lifecycle scaffolding both
index tiers were implementing twice).

Both streaming index maintainers prove the same operability contract:
a micro-batch ingest can die on a TORN COMMIT (batch data fully
written/merged, Structured Streaming offset NOT committed) and a
restart from the same checkpoint replays that batch idempotently —
`streaming_ann_ingest_restart` (plans/similarity/pq_lifecycle.py,
idempotent per-batch partition OVERWRITE) and
`streaming_minhash_ingest_restart` (streaming/jobs.py, idempotent
batch-id-priority MERGE). The proof driver — stage files, 1 file per
trigger, crash after the target batch's write, assert the failure
fired, restart from the same checkpoint, drain — is identical; only
the per-batch ingest write differs, so it is the callback.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

CRASH_MSG = "injected post-write pre-commit failure"


def ingest_with_injected_restart(
    spark: SparkSession,
    schema,
    stage: str,
    checkpoint: str,
    ingest: Callable[[DataFrame, int], None],
    crash_after_batch: int = 1,
) -> None:
    """Run a staged file stream through ``ingest`` with a torn commit
    injected once, then restart from the same checkpoint and drain.

    ``ingest(batch_df, batch_id)`` must be an IDEMPOTENT write (replay
    of the same batch id may not change the final store) — that is the
    property under proof. The injected failure fires AFTER the crash
    batch's ingest completes but BEFORE the offset commit (the worst
    point: data landed, progress did not). Raises if the failure does
    not fire (a stale checkpoint would make the proof vacuous).
    """
    from pyspark.errors import StreamingQueryException  # noqa: PLC0415

    crash = {"armed": True}

    def guarded(batch_df: DataFrame, batch_id: int) -> None:
        ingest(batch_df, batch_id)
        if crash["armed"] and batch_id == crash_after_batch:
            crash["armed"] = False
            raise RuntimeError(CRASH_MSG)

    def run_stream() -> None:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .writeStream.foreachBatch(guarded)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        run_stream()
        raise AssertionError("injected failure did not fire")
    except StreamingQueryException as exc:
        if CRASH_MSG not in str(exc):
            raise
    # restart from the SAME checkpoint: the crash batch replays
    # (idempotent write), remaining batches drain, availableNow stops
    run_stream()
