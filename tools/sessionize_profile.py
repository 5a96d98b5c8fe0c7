"""Stage-level breakdown of events_sessionize_30m (round-9 VERDICT #6).

The driver row's plan is already the minimal shape — ONE Exchange, ONE
Sort, two streaming Window operators sharing it, then a hash aggregate that
reuses the partitioning (verified via explain; see BENCH_NOTES). This tool
separates the wall into:

  scan            parquet read + ColumnarToRow (noop write of events)
  sessionize      + Exchange + Sort + Window(lag) + Window(running sum)
  full            + per-session aggregation (the driver row, noop-written)
  collect_overhead  driver-side collect of the final ~100k rows

and times an alternative formulation (Spark's native ``session_window``
aggregate + a per-user row_number over the aggregated rows) to test
whether fusing the session assignment into the aggregation buys anything.
All variants run min-of-N with inter-run GC, same protocol as bench.py.

Usage: python tools/sessionize_profile.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _timed(spark, fn, runs: int) -> list[float]:
    walls = []
    for _ in range(runs):
        try:
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
    return walls


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from lapis_silo_spark.driver_queries import QUERIES, db_for
    from lapis_silo_spark.operators.temporal import session_stats, sessionize
    from lapis_silo_spark.session import get_spark

    spark = get_spark()
    db = db_for(spark, sf_dir)
    events = db.table("events")
    n = events.count()  # warm the scan/codegen
    out: dict = {"sf_dir": sf_dir, "events_rows": n, "runs": runs,
                 "loadavg_1m": round(os.getloadavg()[0], 2)}

    q = QUERIES["events_sessionize_30m"]
    q(spark, sf_dir).collect()  # warm the full path once, untimed

    out["scan_noop"] = _timed(spark, lambda: _noop(events), runs)
    sess = lambda: sessionize(events, ["user_id"], "ts", 1800,
                              tiebreak="event_id")
    out["sessionize_noop"] = _timed(spark, lambda: _noop(sess()), runs)
    out["full_noop"] = _timed(
        spark,
        lambda: _noop(
            session_stats(events, ["user_id"], "ts", 1800,
                          aggs={"total_value": F.round(F.sum("value"), 2)},
                          tiebreak="event_id")
        ),
        runs,
    )
    out["driver_row_collect"] = _timed(
        spark, lambda: q(spark, sf_dir).collect(), runs
    )

    # alternative: native session_window aggregate + small row_number pass
    from pyspark.sql import Window

    def native_session_window():
        agg = (
            events.groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("sw")
            )
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )
        w = Window.partitionBy("user_id").orderBy("session_start")
        return agg.withColumn("session_seq", F.row_number().over(w)).drop("sw")

    _noop(native_session_window())  # warm
    out["native_session_window_noop"] = _timed(
        spark, lambda: _noop(native_session_window()), runs
    )
    # sanity: same session count (semantics differ only at an exact-gap
    # boundary — [start, end) vs strictly-greater — so counts should match
    # on real data; a mismatch is flagged, not asserted)
    a = session_stats(events, ["user_id"], "ts", 1800,
                      tiebreak="event_id").count()
    b = native_session_window().count()
    out["session_counts"] = {"window_form": a, "native_form": b,
                             "agree": a == b}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
