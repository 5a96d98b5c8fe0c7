"""Pruned-vs-unpruned scan cost at scale (SURVEY §4.2 parity evidence).

Writes the same N-row events-shaped dataset twice — range-partitioned +
sorted by ``day`` (the save_version ``table_sorts`` layout) and shuffled —
then times an identical 1%-selectivity date predicate over both and
reports the scan-level ``numOutputRows`` (rows the Parquet reader
materialized after row-group min/max pruning).

Usage: python tools/pruning_demo.py [n_rows]   (default 20_000_000)
Prints one JSON line per layout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_metrics(df) -> dict:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    scan = plan.collectLeaves().apply(0)
    m = scan.metrics()
    out = {}
    it = m.keysIterator()
    while it.hasNext():
        k = it.next()
        out[k] = m.apply(k).value()
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    from pyspark.sql import functions as F

    from lapis_silo_spark.session import get_spark

    spark = get_spark()
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 300).alias("day"),
        F.md5(F.col("id").cast("string")).alias("val"),
    )
    tmp = tempfile.mkdtemp(prefix="pruning_demo_")
    layouts = {
        "sorted": lambda d: d.repartitionByRange(32, "day")
        .sortWithinPartitions("day"),
        "shuffled": lambda d: d.repartition(32),
    }
    try:
        for name, xform in layouts.items():
            path = os.path.join(tmp, name)
            xform(df).write.parquet(path)
        pred = (F.col("day") >= 10) & (F.col("day") <= 12)
        for name in layouts:
            path = os.path.join(tmp, name)
            q = spark.read.parquet(path).filter(pred)
            q.count()  # warm file listing / codegen
            t0 = time.monotonic()
            # the agg touches `val` so an unpruned scan must decode the
            # payload column for every surviving row group
            spark.read.parquet(path).filter(pred).groupBy("day").agg(
                F.max("val")
            ).collect()
            wall = round(time.monotonic() - t0, 3)
            # metrics pass: a scan-leaf-only plan (AQE stage wrappers hide
            # the leaf metrics under an aggregate)
            m = scan_metrics(
                spark.read.parquet(path).filter(pred).select("day")
            )
            print(json.dumps({
                "layout": name,
                "n_rows": n,
                "scan_rows": m.get("numOutputRows"),
                "num_files": m.get("numFiles"),
                "wall_sec": wall,
            }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
