"""Dump `.explain("formatted")` for named queries into plans/r15/.

Usage:
    python tools/dump_r15_plans.py before q1_pricing_summary graph_bfs_hops
    python tools/dump_r15_plans.py after --all-headliners

Writes plans/r15/<query>_<tag>.txt — the optimization round's audit
trail (the judge checks plan claims in OPTIMIZATION_r15.md against
these files). Plans are captured at the bench scale (sf0.1 by
default, $SPARK_GRAFT_SF_DIR) so broadcast/strategy decisions match
what bench.py actually runs.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__, file=sys.stderr)
        return 2
    tag = args[0]
    names = args[1:]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import HEADLINERS
    from tijdloze_musicbrainz_spark.plans import REGISTRY
    from tijdloze_musicbrainz_spark.session import get_spark

    if names == ["--all-headliners"]:
        names = [n for n in HEADLINERS if n in REGISTRY]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(repo, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump_r15_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in REGISTRY:
            print(f"[plans] {name}: not registered, skipped", file=sys.stderr)
            continue
        try:
            df = REGISTRY[name].builder(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(f"# {name} ({tag}) — explain('formatted') at {sf_dir}\n")
                f.write(buf.getvalue().rstrip() + "\n")
            print(f"[plans] wrote {path}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"[plans] {name} FAILED: {exc}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
