"""Per-job wall-time breakdown for a registered query (guide §1).

Runs one query with the Spark event log enabled, then attributes wall time
to individual Spark jobs: duration, call site, stage count, task count, and
shuffle bytes. This is the tool that answers "where do the N jobs of an
overhead-bound query spend their time" — the UI is disabled in the engine's
session config, so the event log is the public source of the same numbers.

Usage:
    python tools/job_breakdown.py [--sf-dir DIR] [--runs N] name
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2,
                    help="run N times, report the LAST run's jobs (warm)")
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="spark-ev-")

    from lapis_silo_spark.driver_queries import QUERIES, db_for
    from lapis_silo_spark.session import get_spark

    spark = get_spark(extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    sc = spark.sparkContext
    db_for(spark, args.sf_dir)
    q = QUERIES[args.name]

    first_job = 0
    for i in range(args.runs):
        # job ids are monotonically increasing; remember where the last
        # (reported) run starts
        tracker = sc.statusTracker()
        jids = tracker.getJobIdsForGroup(None) or []
        nxt = (max(jids) + 1) if jids else 0
        t0 = time.perf_counter()
        df = q(spark, args.sf_dir)
        rows = df.collect()
        wall = time.perf_counter() - t0
        print(f"run {i}: wall={wall:.3f}s rows={len(rows)}",
              file=sys.stderr)
        if i == args.runs - 1:
            first_job = nxt

    sc._jsc.sc().listenerBus().waitUntilEmpty(10000)
    spark.stop()

    logs = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    last = logs[-1]
    if os.path.isdir(last):  # Spark 4 rolling eventlog_v2_* directory
        parts = sorted(glob.glob(os.path.join(last, "events_*")))
    else:
        parts = [last]
    lines = []
    for p in parts:
        with open(p) as f:
            lines.extend(f)
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""),
                    "callsite": (ev.get("Properties") or {}).get(
                        "callSite.short", ""),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "n_tasks": sum(s["Number of Tasks"]
                                   for s in ev["Stage Infos"]),
                }
                for s in ev["Stage Infos"]:
                    stage_to_job[s["Stage ID"]] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                acc = {a["Name"]: a.get("Value") for a in si.get(
                    "Accumulables", [])}
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "tasks": si["Number of Tasks"],
                    "sh_read": acc.get("internal.metrics.shuffle.read"
                                       ".remoteBytesRead", 0) or 0,
                    "sh_write": acc.get("internal.metrics.shuffle.write"
                                        ".bytesWritten", 0) or 0,
                    "ms": (si.get("Completion Time", 0) -
                           si.get("Submission Time", 0))
                    if si.get("Submission Time") else None,
                }

    sel = {j: v for j, v in jobs.items() if j >= first_job and "end" in v}
    total = sum(v["end"] - v["start"] for v in sel.values())
    print(f"jobs={len(sel)} sum_job_wall={total/1000:.3f}s "
          f"(last run only, job ids >= {first_job})")
    for jid, v in sorted(sel.items(), key=lambda kv: -(
            kv[1]["end"] - kv[1]["start"])):
        dur = (v["end"] - v["start"]) / 1000
        sdesc = []
        for s in v["stages"]:
            st = stages.get(s)
            if st and st["ms"]:
                sdesc.append(f"{st['name'].split(' ')[0]}:{st['ms']}ms"
                             f"/{st['tasks']}t")
        print(f"  job {jid}: {dur:6.3f}s tasks={v['n_tasks']:4d} "
              f"{v['callsite'][:60]!r} stages=[{', '.join(sdesc[:6])}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
