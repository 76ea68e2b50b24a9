"""Profile one registered query: run it against the noop sink with the
Spark event log on, then summarize per-stage wall/executor time and
shuffle volume from the log (guide §1/§7 — empirical loop without the
UI, which the harness disables).

Usage:
    python tools/profile_query.py <query> [--sf /root/testdata/sf0.1]
        [--trials 2] [--cold]

The builder itself may launch jobs (lifecycle queries build indexes);
those jobs are profiled too, labeled `build:` vs `noop:` by phase.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--top", type=int, default=18)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    log_dir = f"/tmp/spark_events_{os.getpid()}"
    os.makedirs(log_dir, exist_ok=True)

    from tijdloze_musicbrainz_spark.plans import REGISTRY
    from tijdloze_musicbrainz_spark.session import get_spark

    spark = get_spark(
        f"profile_{args.name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    builder = REGISTRY[args.name].builder

    best = float("inf")
    for i in range(args.trials):
        spark.sparkContext.setJobDescription(f"trial{i}:{args.name}")
        t0 = time.monotonic()
        builder(spark, args.sf).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        best = min(best, dt)
        print(f"[profile] trial {i}: {dt:.3f}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # -- parse the event log -------------------------------------------
    (path,) = glob.glob(f"{log_dir}/{app_id}*")
    jobs = {}  # job_id -> description
    stage_job = {}  # stage_id -> job_id
    stages = {}  # stage_id -> dict
    tasks_acc = {}  # stage_id -> summed internal.metrics.*
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get(
                    "spark.job.description"
                ) or ev.get("Properties", {}).get("callSite.short", "")
                jobs[jid] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si["Submission Time"]
                comp = si["Completion Time"]
                mets = {"run": 0, "sr": 0, "sw": 0, "inp": 0, "cpu": 0}
                scopes = []
                for rdd in si.get("RDD Info", []):
                    sc_ = rdd.get("Scope")
                    if sc_:
                        try:
                            nm = json.loads(sc_).get("name", "")
                        except Exception:  # noqa: BLE001
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stages[sid] = {
                    "name": " > ".join(scopes[:6]) or si["Stage Name"],
                    "wall": (comp - sub) / 1000.0,
                    "tasks": si["Number of Tasks"],
                    **mets,
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                acc = {
                    a["Name"]: a.get("Update", 0)
                    for a in (ev.get("Task Info") or {}).get("Accumulables", [])
                    if str(a.get("Name", "")).startswith("internal.metrics.")
                }
                if sid in tasks_acc:
                    t_ = tasks_acc[sid]
                else:
                    t_ = tasks_acc.setdefault(sid, {})
                for k, v in acc.items():
                    t_[k] = t_.get(k, 0) + v

    for sid, t_ in tasks_acc.items():
        if sid not in stages:
            continue
        s = stages[sid]
        s["run"] = t_.get("internal.metrics.executorRunTime", 0) / 1000.0
        s["cpu"] = t_.get("internal.metrics.executorCpuTime", 0) / 1e9
        s["sr"] = t_.get(
            "internal.metrics.shuffle.read.localBytesRead", 0
        ) + t_.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
        s["sw"] = t_.get("internal.metrics.shuffle.write.bytesWritten", 0)
        s["inp"] = t_.get("internal.metrics.input.bytesRead", 0)

    # -- job timeline: where the DRIVER spends time between jobs ------
    job_times = {}  # jid -> [start, end]
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                job_times[ev["Job ID"]] = [ev["Submission Time"], None]
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in job_times:
                    job_times[ev["Job ID"]][1] = ev["Completion Time"]
    timeline = sorted(
        (v[0], v[1] or v[0], k) for k, v in job_times.items()
    )
    print("\njob timeline (gap = driver-side time since previous job end):")
    prev_end = None
    for start, end, jid in timeline:
        gap = (start - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = max(prev_end or end, end)
        mark = " <== DRIVER GAP" if gap > 0.15 else ""
        print(
            f"  job {jid:>3} gap={gap:6.2f}s dur={(end - start) / 1000.0:6.2f}s"
            f"  {jobs.get(jid, '')[:80]}{mark}"
        )

    rows = sorted(stages.items(), key=lambda kv: -kv[1]["run"])
    print(f"\nbest trial: {best:.3f}s   stages: {len(stages)}")
    print(
        f"{'stage':>6} {'wall_s':>7} {'run_s':>8} {'cpu_s':>8} {'tasks':>5} "
        f"{'in_MB':>8} {'sh_r_MB':>8} {'sh_w_MB':>8}  job-desc / stage"
    )
    for sid, s in rows[: args.top]:
        desc = jobs.get(stage_job.get(sid, -1), "")[:16]
        print(
            f"{sid:>6} {s['wall']:7.2f} {s['run']:8.2f} {s['cpu']:8.2f} "
            f"{s['tasks']:>5} {s['inp'] / 1e6:8.1f} {s['sr'] / 1e6:8.1f} "
            f"{s['sw'] / 1e6:8.1f}  {desc} | {s['name'][:110]}"
        )
    total_wall = sum(s["wall"] for s in stages.values())
    print(f"sum(stage wall) = {total_wall:.2f}s (overlapping stages double-count)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
