"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, comparing row count, column names, and an order-insensitive value
multiset (stringified, column-sorted). Exit code 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(val):
    import datetime as dt
    import math

    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return str(val).lower()
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.6g}"
    if isinstance(val, dt.datetime):
        return val.isoformat(sep=" ")
    if isinstance(val, dt.date):
        return val.isoformat()
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(normalize(v) for v in val) + "]"
    return str(val)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:] or None

    from lapis_silo_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [
                tuple(normalize(row[c]) for c in scols) for row in sdf.collect()
            ]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows={len(srows)} (rows-only, no oracle)")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols_raw = [d[0] for d in rel.description]
            orows_raw = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = [tuple(normalize(r[i]) for i in order) for r in orows_raw]
        if scols != ocols:
            failures.append((name, f"columns {scols} != {ocols}"))
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rowcount {len(srows)} != {len(orows)}"))
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            continue
        if Counter(srows) != Counter(orows):
            diff_s = list((Counter(srows) - Counter(orows)).items())[:3]
            diff_o = list((Counter(orows) - Counter(srows)).items())[:3]
            failures.append((name, "value mismatch"))
            print(f"FAIL  {name}: value mismatch")
            print(f"      spark-only: {diff_s}")
            print(f"      oracle-only: {diff_o}")
            continue
        print(f"ok    {name}: rows={len(srows)}")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
