"""Run the driver's correctness gate locally: EVERY registered query's
Spark result vs its DuckDB oracle on the same parquet (sorted column
names, canonicalized values, sorted rows). Usage:

    python tools/full_sweep.py [sf_dir]      # default /root/testdata/sf0.01
    python tools/full_sweep.py sf_dir q1 q2  # only the named queries

Exits non-zero on any mismatch. ~10 min at sf0.01 on local[16].
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    # Recurse into nested collections so floats inside array/struct/map
    # columns are ulp-normalized too, not compared raw (ADVICE r4).
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def main() -> int:
    # repo root derived from this file, NOT cwd: the sweep must work
    # from any directory — which also proves every UDF closure is
    # self-contained (workers resolve imports via PYTHONPATH, so a
    # closure that references a repo module dies from a foreign cwd;
    # see the corpus_pack_sequences history).
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as entry
    from tijdloze_musicbrainz_spark.session import get_spark

    spark = get_spark("full_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(oracles)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            return 2
        oracles = {k: v for k, v in oracles.items() if k in only}
    bad, n_ok = [], 0
    for name in sorted(oracles):
        try:
            sdf = qs[name](spark, sf)
            scols = sorted(sdf.columns)
            srows = sorted(
                [tuple(canon(r[c]) for c in scols) for r in sdf.collect()],
                key=repr,
            )
            rel = con.execute(oracles[name])
            cols0 = [d[0] for d in rel.description]
            idx = [cols0.index(c) for c in sorted(cols0)]
            drows = sorted(
                [tuple(canon(r[i]) for i in idx) for r in rel.fetchall()],
                key=repr,
            )
            if scols == sorted(cols0) and srows == drows:
                n_ok += 1
            else:
                why = "cols" if scols != sorted(cols0) else (
                    f"rows {len(srows)}/{len(drows)}"
                    if len(srows) != len(drows)
                    else "values"
                )
                bad.append((name, why))
                print(f"FAIL {name}: {why}", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001
            bad.append((name, f"{type(ex).__name__}"))
            print(f"FAIL {name}: {type(ex).__name__}: {ex}", file=sys.stderr)
    print(f"SWEEP {sf}: OK {n_ok}/{len(oracles)}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
