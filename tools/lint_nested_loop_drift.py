"""Audit ALLOWED_NESTED_LOOP drift (r9 verdict item 7): for every
query in the skip list, build its physical plan and report whether it
STILL contains a CartesianProduct / BroadcastNestedLoopJoin. An entry
whose plan no longer has one is dead weight — Spark now compiles the
shape to a hash join and the skip hides future regressions. Usage:

    python tools/lint_nested_loop_drift.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys


def main() -> None:
    sys.path.insert(0, ".")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from tests.test_plans import ALLOWED_NESTED_LOOP

    from tijdloze_musicbrainz_spark.plans import REGISTRY
    from tijdloze_musicbrainz_spark.session import get_spark

    spark = get_spark("nl-drift")
    stale = []
    for name in sorted(ALLOWED_NESTED_LOOP):
        if name not in REGISTRY:
            print(f"UNREGISTERED {name}")
            stale.append(name)
            continue
        df = REGISTRY[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        has = (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        )
        print(f"{'NEEDED' if has else 'STALE '} {name}")
        if not has:
            stale.append(name)
    print(f"\n{len(stale)} stale entries: {stale}")


if __name__ == "__main__":
    main()
