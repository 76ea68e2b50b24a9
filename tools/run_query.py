"""Run any registered query from the command line.

    python tools/run_query.py <name> [--sf DIR] [--show N] [--explain]
    python tools/run_query.py --list

Examples:
    python tools/run_query.py q1_pricing_summary --show 5
    python tools/run_query.py fuzzy_two_phase_search --explain
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    sys.path.insert(0, ".")
    from tijdloze_musicbrainz_spark.plans import REGISTRY
    from tijdloze_musicbrainz_spark.session import DEFAULT_SF_DIR, get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument("--sf", default=DEFAULT_SF_DIR, help="sf dir (parquet tables)")
    ap.add_argument("--show", type=int, default=20, help="rows to display")
    ap.add_argument("--explain", action="store_true", help="print the formatted plan")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args()

    if args.list or not args.name:
        for name, spec in sorted(REGISTRY.items()):
            mode = "oracle" if spec.oracle else "rows-only"
            print(f"{name:36s} [{mode}] {', '.join(spec.survey_ids)}")
        return

    if args.name not in REGISTRY:
        import difflib

        close = difflib.get_close_matches(args.name, REGISTRY, n=3)
        sys.exit(f"unknown query {args.name!r}; did you mean: {', '.join(close)}?")

    spark = get_spark("run_query")
    df = REGISTRY[args.name].builder(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    t0 = time.monotonic()
    df.show(args.show, truncate=False)
    print(f"[{args.name}] displayed in {time.monotonic() - t0:.2f}s @ {args.sf}")


if __name__ == "__main__":
    main()
