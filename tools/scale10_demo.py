"""1x-vs-10x scale-up protocol for the genomic core + sessionization.

Round-2 measured the LLM-pipeline operators at 1x vs 10x (BENCH_NOTES.md);
this script extends the identical protocol to the three benched queries that
had no measured scale curve: ``genomic_mutations_stats``,
``genomic_symbol_equals``, ``events_sessionize_30m``.

10x dataset: the sf dir's ``documents``/``events`` replicated 10x with
shifted ids (documents: shifted doc_id => 10x distinct synthetic genomes;
events: shifted user ids => 10x sessionization keys), written to a temp dir
that db_for/genomic_db treat as just another scale factor. Ingest/build cost
is excluded the same way round 2 excluded it: each query runs once to warm
codegen + the store's side-table caches, and the SECOND run is reported.

Usage::

    python tools/scale10_demo.py [sf_dir] [--queries a,b,c] [--factor N]

Defaults: sf_dir=/root/testdata/sf0.1, the genomic core query list, N=10.
``--factor 100`` replays the same protocol at 100x (set SPARK_DRIVER_MEMORY
— local mode holds executors in the one driver JVM, and the 8g default is
sized for the correctness gates, not a 100x sweep).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_NAMES = [
    "genomic_mutations_stats",
    "genomic_symbol_equals",
    "events_sessionize_30m",
]


def build_nx(spark, sf_dir: str, out_dir: str, factor: int = 10) -> None:
    from pyspark.sql import functions as F

    from lapis_silo_spark.driver_queries import db_for

    db = db_for(spark, sf_dir)

    docs = db.table("documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(int(k * n_docs)))
        for k in range(factor)
    ]
    big_docs = copies[0]
    for c in copies[1:]:
        big_docs = big_docs.unionByName(c)
    big_docs.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    events = db.table("events")
    n_users = events.agg(F.max("user_id")).collect()[0][0] + 1
    copies = [
        events.withColumn(
            "user_id", F.col("user_id") + F.lit(int(k * n_users))
        ).withColumn("event_id", F.col("event_id") + F.lit(int(k * 10**12)))
        for k in range(factor)
    ]
    big_events = copies[0]
    for c in copies[1:]:
        big_events = big_events.unionByName(c)
    big_events.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    emb = db.table("embeddings")
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    copies = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(int(k * n_vecs)))
        for k in range(factor)
    ]
    big_emb = copies[0]
    for c in copies[1:]:
        big_emb = big_emb.unionByName(c)
    big_emb.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def time_queries(spark, sf_dir: str, names=None) -> dict[str, float]:
    from lapis_silo_spark.driver_queries import QUERIES

    out: dict[str, float] = {}
    for name in names or QUERY_NAMES:
        try:
            QUERIES[name](spark, sf_dir).collect()  # warm: codegen + caches
        except KeyError as exc:
            # the replicated dir carries documents/events/embeddings only;
            # queries over other tables can't be scale-swept here
            print(f"skip {name}: {exc}", file=sys.stderr)
            continue
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).collect()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> int:
    argv = sys.argv[1:]
    names = None
    factor = 10
    if "--queries" in argv:
        i = argv.index("--queries")
        names = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2:]
    if "--factor" in argv:
        i = argv.index("--factor")
        factor = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    from lapis_silo_spark.session import get_spark

    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix=f"sf{factor}x_")
    try:
        build_nx(spark, sf_dir, tmp, factor)
        one = time_queries(spark, sf_dir, names)
        big = time_queries(spark, tmp, names)
        report = {
            name: {
                "x1_sec": one[name],
                f"x{factor}_sec": big[name],
                "ratio": round(big[name] / one[name], 2) if one[name] else None,
            }
            for name in (names or QUERY_NAMES)
        }
        print(json.dumps(report, indent=2))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
