"""Differential correctness: every registered query's Spark result vs
its DuckDB oracle on the same parquet — the same comparison the driver
runs (row count, column names, order-insensitive values), so a failure
here predicts a red CORRECTNESS row."""

from __future__ import annotations

import math

import pytest


def _canon(value):
    """Normalize one cell for cross-engine comparison."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # results are pre-rounded by convention; 1e-9 kills double-repr noise
        return round(value, 9)
    if isinstance(value, bool):
        return bool(value)
    import datetime
    import decimal

    if isinstance(value, decimal.Decimal):
        return round(float(value), 9)
    if isinstance(value, datetime.datetime):
        return value.isoformat()
    return value


def _normalize_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [columns[i] for i in order], out


def _all_query_names():
    import __spark_entry__ as entry

    return sorted(entry.oracle_sql().keys())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    import __spark_entry__ as entry

    sdf = entry.queries()[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    rel = duck.execute(entry.oracle_sql()[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    _, s_norm = _normalize_rows(spark_cols, spark_rows)
    _, d_norm = _normalize_rows(duck_cols, duck_rows)
    if s_norm != d_norm:
        diff = [
            (a, b) for a, b in zip(s_norm, d_norm) if a != b
        ][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diff}")
