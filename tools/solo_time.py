"""Solo warm best-of-N re-timing — the bench-baseline re-seed protocol
(r10 precedent, BENCH_BASELINE.json note): run ONLY on an otherwise
idle box, warm the session first, report best-of-5 per query plus the
host probe so the measurement's contention context is on record.

Usage:
    python tools/solo_time.py q1 q2 ...            # sf0.1, best-of-5
    python tools/solo_time.py --trials 3 q1 q2

Prints one JSON line: {"queries": {name: best_sec}, "trials": N,
"host_probe_sec": p, "sf_dir": ...}. Refuses to run if the host probe
exceeds IDLE_GATE (the box is visibly contended — a re-seed taken now
would bake someone else's load into the baseline).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

IDLE_GATE = 0.25  # ~0.14-0.17s idle on this box (bench.py history)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _host_probe_sec, _probe_once  # noqa: PLC0415

    probe = _host_probe_sec()
    if probe > IDLE_GATE:
        print(
            f"host probe {probe}s > {IDLE_GATE}s — box is contended, "
            "refusing to seed timings now",
            file=sys.stderr,
        )
        return 2

    from tijdloze_musicbrainz_spark.plans import REGISTRY  # noqa: PLC0415
    from tijdloze_musicbrainz_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("solo_time")
    spark.sparkContext.setLogLevel("ERROR")

    missing = [n for n in args.names if n not in REGISTRY]
    if missing:
        print(f"not registered: {missing}", file=sys.stderr)
        return 2

    def run(name: str) -> None:
        REGISTRY[name].builder(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()

    # warm: one untimed run of each target pays codegen/file listing
    for name in args.names:
        run(name)

    out: dict[str, float] = {}
    for name in args.names:
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.monotonic()
            run(name)
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
        print(f"[solo] {name}: {out[name]}s (probe {_probe_once()}s)", file=sys.stderr)

    print(
        json.dumps(
            {
                "queries": out,
                "trials": args.trials,
                "host_probe_sec": probe,
                "sf_dir": args.sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
