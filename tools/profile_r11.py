"""Round-11 per-query profiler: wall, Spark job/stage counts, and the
formatted physical plan for any registered query.

Usage:
    python tools/profile_r11.py [--plans-dir plans/r11] [--suffix before]
                                [--noop] [--runs N] name [name ...]

For each query name the script:
  - builds the DataFrame inside a job group named after the query (so EAGER
    work done while building — probes, checkpoint jobs — is attributed too),
  - times ``.collect()`` (bench methodology) with a forced JVM GC before
    each run (bench.py's inter-iteration hygiene), min over ``--runs``,
  - optionally times the noop sink (``--noop``; guide §1.4) which computes
    every column and discards rows executor-side,
  - counts the Spark jobs and stages the query submitted (guide §1: a
    5000-row query spending seconds is overhead-bound — job count is the
    direct measure of fixed overhead at bench scale),
  - writes ``<plans-dir>/<name>_<suffix>.txt`` with .explain("formatted").

Emits one JSON line per query on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default=None,
                    help="write <name>_<suffix>.txt formatted plans here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true",
                    help="also time the noop-sink write (compute-only wall)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from lapis_silo_spark.driver_queries import QUERIES, db_for
    from lapis_silo_spark.session import get_spark

    spark = get_spark()
    sc = spark.sparkContext
    db_for(spark, args.sf_dir)

    if any(n.startswith("genomic_") for n in args.names):
        # mirror bench.py's untimed genomic-store warmup
        from lapis_silo_spark.driver_queries import genomic_db

        gdb = genomic_db(spark, args.sf_dir)
        gdb.table("default").count()
        store = gdb.sequence_store("default")
        for side in (store.mutations, store.coverage, store.missing,
                     store.insertions):
            side.count()

    # one warm pass of the first query so JVM codegen + python worker pool
    # startup are not billed to it
    QUERIES[args.names[0]](spark, args.sf_dir).count()

    st = sc.statusTracker()
    for name in args.names:
        if name not in QUERIES:
            print(json.dumps({"query": name, "err": "unknown"}))
            continue
        walls, noop_walls = [], []
        njobs = nstages = 0
        group = f"profile:{name}"
        for r in range(args.runs):
            try:
                spark._jvm.System.gc()
            except Exception:  # noqa: BLE001
                pass
            sc.setJobGroup(group if r == 0 else f"{group}:{r}", name)
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf_dir)
            df.collect()
            walls.append(time.perf_counter() - t0)
            if r == 0:
                jobs = st.getJobIdsForGroup(group)
                njobs = len(jobs)
                nstages = sum(
                    len(st.getJobInfo(j).stageIds) for j in jobs
                    if st.getJobInfo(j) is not None
                )
                if args.plans_dir:
                    os.makedirs(args.plans_dir, exist_ok=True)
                    path = os.path.join(
                        args.plans_dir, f"{name}_{args.suffix}.txt"
                    )
                    with open(path, "w") as fh:
                        fh.write(formatted_plan(df))
            if args.noop and r == args.runs - 1:
                for _ in range(2):
                    try:
                        spark._jvm.System.gc()
                    except Exception:  # noqa: BLE001
                        pass
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    noop_walls.append(time.perf_counter() - t0)
        sc.setJobGroup("idle", "idle")
        out = {
            "query": name,
            "wall_sec": round(min(walls), 4),
            "walls": [round(w, 4) for w in walls],
            "jobs": njobs,
            "stages": nstages,
        }
        if noop_walls:
            out["noop_sec"] = round(min(noop_walls), 4)
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
