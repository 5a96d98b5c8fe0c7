"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, comparing row count, column names, and an order-insensitive value
multiset (stringified, column-sorted). Exit code 1 on any mismatch.

``--out PATH`` additionally writes the full-registry results as JSON in the
driver's CORRECTNESS schema (rows/schema/hash_match + row counts + err), so
coverage beyond the driver's 50-row gate window is auditable from a committed
artifact (CORRECTNESS_LOCAL_r<k>.json) without a judge re-run.
"""

from __future__ import annotations

import json
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
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = argv or None
    results: dict[str, dict] = {}

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
    import time as _time

    for name, fn in queries.items():
        if only and name not in only:
            continue
        # same inter-query hygiene as bench.py: a 127-query sweep in one
        # JVM otherwise lets late queries thrash in the previous queries'
        # garbage (measured: minutes-long stalls at sf1 on queries that
        # run in seconds in isolation)
        try:
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        _t0 = _time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [
                tuple(normalize(row[c]) for c in scols) for row in sdf.collect()
            ]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL  {name}: spark error: {exc}")
            results[name] = _entry(err=f"spark error: {exc}")
            continue
        if name not in oracles:
            print(
                f"ok    {name}: rows={len(srows)} (rows-only, no oracle)",
                flush=True,
            )
            results[name] = _entry(spark_rows=len(srows), err="no_oracle")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols_raw = [d[0] for d in rel.description]
            orows_raw = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL  {name}: duckdb error: {exc}")
            results[name] = _entry(
                spark_rows=len(srows), err=f"duckdb error: {exc}"
            )
            continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = [tuple(normalize(r[i]) for i in order) for r in orows_raw]
        entry = _entry(
            rows_match=len(srows) == len(orows),
            schema_match=scols == ocols,
            hash_match=Counter(srows) == Counter(orows),
            spark_rows=len(srows),
            oracle_rows=len(orows),
        )
        results[name] = entry
        if not entry["schema_match"]:
            failures.append((name, f"columns {scols} != {ocols}"))
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            continue
        if not entry["rows_match"]:
            failures.append((name, f"rowcount {len(srows)} != {len(orows)}"))
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            continue
        if not entry["hash_match"]:
            diff_s = list((Counter(srows) - Counter(orows)).items())[:3]
            diff_o = list((Counter(orows) - Counter(srows)).items())[:3]
            failures.append((name, "value mismatch"))
            print(f"FAIL  {name}: value mismatch")
            print(f"      spark-only: {diff_s}")
            print(f"      oracle-only: {diff_o}")
            continue
        print(
            f"ok    {name}: rows={len(srows)}"
            f" ({_time.perf_counter() - _t0:.1f}s)",
            flush=True,
        )

    print(f"\n{len(queries) - len(failures)}/{len(queries)} passed")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=2)
            fh.write("\n")
        print(f"wrote {out_path} ({len(results)} entries)")
    return 1 if failures else 0


def _entry(
    rows_match=None,
    schema_match=None,
    hash_match=None,
    spark_rows=None,
    oracle_rows=None,
    err=None,
) -> dict:
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": spark_rows,
        "oracle_rows": oracle_rows,
        "err": err,
    }


if __name__ == "__main__":
    sys.exit(main())
