"""Per-STAGE wall-time breakdown for a registered query (guide §1/§7).

Like job_breakdown.py but prints EVERY completed stage of the warm (last)
run with its RDD-scope name chain (which physical operators ran in it),
task count, task-time sum, and wall — the data needed to attribute a
multi-stage AQE job's cost to specific operators when the UI is disabled.
The report is filtered to stages whose owning job belongs to the LAST run
(job ids recorded via the status tracker before it starts), so cold-run
stages no longer inflate warm-run attribution (round-11 ADVICE).

Usage:
    python tools/stage_breakdown.py [--sf-dir DIR] [--runs N] name
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
    ap.add_argument("--runs", type=int, default=2)
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
        # (reported) run starts so its stages can be isolated below
        jids = sc.statusTracker().getJobIdsForGroup(None) or []
        if i == args.runs - 1:
            first_job = (max(jids) + 1) if jids else 0
        t0 = time.perf_counter()
        df = q(spark, args.sf_dir)
        rows = df.collect()
        wall = time.perf_counter() - t0
        print(f"run {i}: wall={wall:.3f}s rows={len(rows)}", file=sys.stderr)

    sc._jsc.sc().listenerBus().waitUntilEmpty(10000)
    spark.stop()

    logs = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    last = logs[-1]
    if os.path.isdir(last):
        parts = sorted(glob.glob(os.path.join(last, "events_*")))
    else:
        parts = [last]
    lines = []
    for p in parts:
        with open(p) as f:
            lines.extend(f)

    stages = []
    last_run_stages: set[int] = set()
    stage_task_ms: dict[int, float] = {}
    for line in lines:
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            if ev["Job ID"] >= first_job:
                last_run_stages.update(
                    s["Stage ID"] for s in ev["Stage Infos"]
                )
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            ti = ev.get("Task Info", {})
            dur = (ti.get("Finish Time", 0) or 0) - (ti.get("Launch Time", 0) or 0)
            stage_task_ms[sid] = stage_task_ms.get(sid, 0) + dur
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            # RDD scope names tell us which operators ran in the stage
            ops = []
            for r in si.get("RDD Info", []):
                sc_ = r.get("Scope")
                if sc_:
                    try:
                        nm = json.loads(sc_).get("name", "")
                    except Exception:
                        nm = ""
                    if nm and nm not in ops:
                        ops.append(nm)
            acc = {a["Name"]: a.get("Value") for a in si.get("Accumulables", [])}
            stages.append({
                "id": si["Stage ID"],
                "name": si["Stage Name"].split(" at ")[0],
                "site": si["Stage Name"],
                "tasks": si["Number of Tasks"],
                "ops": ops,
                "wall_ms": (si.get("Completion Time", 0) -
                            si.get("Submission Time", 0))
                if si.get("Submission Time") else 0,
            })

    stages = [s for s in stages if s["id"] in last_run_stages]
    stages.sort(key=lambda s: -(stage_task_ms.get(s["id"], s["wall_ms"] or 0)))
    total = sum(
        ms for sid, ms in stage_task_ms.items() if sid in last_run_stages
    )
    print(f"total task-ms, last run only (jobs >= {first_job}): {total:.0f}")
    for s in stages[:40]:
        tm = stage_task_ms.get(s["id"], 0)
        print(f"  stage {s['id']:>4} task_sum={tm/1000.0:7.2f}s wall={(s['wall_ms'] or 0)/1000.0:6.2f}s "
              f"tasks={s['tasks']:>3} ops={','.join(s['ops'][:8])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
