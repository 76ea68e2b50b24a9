"""Custom PySpark DataSource (the Spark 4 Python connector API) — the
modern way to graft a bespoke source into the engine without a JVM
jar: a DataSource subclass declares schema + options, its reader
splits the scan into InputPartitions (the parallelism contract: one
task per partition, executed ON EXECUTORS via Arrow), and each
partition yields plain tuples. Registered per-session by name, then
read like any built-in format.

The synthetic source here generates a deterministic document stream
(the closed-form rule is the oracle): partition p carries rows
[p*rows_per_part, (p+1)*rows_per_part), each with a reproducible
token payload. At 100 TB the same API fronts a real external system
(a REST-paginated API, a proprietary store): partitions map to
shards/pages, and everything downstream — pushdown excepted, this API
scans — is ordinary Catalyst.

Reference analog: the psycopg2 cursor loop (src/util.py) is exactly
the kind of bespoke source this API replaces with a partitioned,
executor-side reader.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SYNTH_NAME = "synthetic_docs"
SYNTH_TOKENS = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")


class SyntheticDocsDataSource(DataSource):
    """Options: n_partitions (int), rows_per_part (int)."""

    @classmethod
    def name(cls) -> str:
        return SYNTH_NAME

    def schema(self) -> str:
        return "doc_id bigint, part int, n_tokens int, text string"

    def reader(self, schema):  # noqa: ARG002  (schema fixed)
        return _SyntheticDocsReader(
            int(self.options.get("n_partitions", 4)),
            int(self.options.get("rows_per_part", 100)),
        )


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, n_partitions: int, rows_per_part: int) -> None:
        self.n_partitions = n_partitions
        self.rows_per_part = rows_per_part

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_partitions)]

    def read(self, partition):
        # runs on an EXECUTOR; must be self-contained (no driver state)
        tokens = SYNTH_TOKENS
        rpp = self.rows_per_part
        p = partition.value
        for i in range(p * rpp, (p + 1) * rpp):
            n_tok = 1 + (i % 5)
            text = " ".join(tokens[(i + k) % len(tokens)] for k in range(n_tok))
            yield (i, p, n_tok, text)


def register_synthetic_docs(spark) -> None:
    """Idempotent per-session registration."""
    try:
        spark.dataSource.register(SyntheticDocsDataSource)
    except Exception as exc:  # noqa: BLE001
        if "already" not in str(exc).lower():
            raise
