"""Generate the committed LSH hyperplane side table
(``tijdloze_musicbrainz_spark/fixture_data/ann_planes.parquet``).

The planes are the engine-shared half of the ``sim_ann_lsh_bucketed``
oracle contract (round-3 verdict "Next round #1"): Spark regenerates
the same integer matrix from the seed at import time
(``plans/similarity._planes``), DuckDB reads this parquet — and
``tests/test_ann_recall.py::test_planes_fixture_matches_generator``
pins that the two can never drift. Re-run this script only if the
seed / quantization constants change (they shouldn't: the committed
bytes are part of the oracle).

Usage:  python tools/gen_ann_planes.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tijdloze_musicbrainz_spark.plans.similarity import (
    PLANES_FIXTURE,
    TIGHT_PLANES_FIXTURE,
    _planes,
    _planes_tight,
)


def _write(planes, path) -> None:
    table = pa.table(
        {
            "p": pa.array(range(len(planes)), type=pa.int64()),
            "w": pa.array(planes, type=pa.list_(pa.int64())),
        }
    )
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, path)
    print(f"wrote {len(planes)} planes -> {path}")


def main() -> None:
    _write(_planes(), PLANES_FIXTURE)
    _write(_planes_tight(), TIGHT_PLANES_FIXTURE)


if __name__ == "__main__":
    main()
