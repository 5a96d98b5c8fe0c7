"""Round-12 microbench: where does dedup_substring_char_spans' CPU go?

Times, with the noop sink (guide §1.4), each successive piece of the char-span
pipeline at sf0.1: occurrence production alone, the canonical aggregate with
the decimal(38,0) packed key vs a plain long packed key, and the full
_non_canonical_occurrences back half — plus a compute-once variant that
repartitions the occurrence table by id so both consumers share one map pass.

Usage: python tools/char_span_micro.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df, label, runs=3):
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    print(f"{label:48s} min={min(walls):.3f}s walls={[round(w,3) for w in walls]}")


def main():
    from lapis_silo_spark.driver_queries import Pipeline, db_for
    from lapis_silo_spark.functions import dedup as D
    from lapis_silo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    db = db_for(spark, sf_dir)
    docs = Pipeline.scan(db, "documents").rebalance(target_bytes=16 * 1024).df
    k = 50

    occ = D._char_gram_occurrences_expr(docs, "doc_id", "text", k)
    noop(occ.select(F.sum(F.col("pos"))), "occ map + sum (warmup)", 1)
    noop(occ, "occ production alone")

    key_dec = (
        F.col("id").cast("decimal(20,0)")
        * F.lit(4294967296).cast("decimal(20,0)")
        + F.col("pos").cast("decimal(20,0)")
    ).cast("decimal(38,0)")
    key_long = (
        F.col("id") * F.lit(4294967296).cast("long") + F.col("pos")
    )
    for name, key in (("decimal", key_dec), ("long", key_long)):
        keyed = occ.withColumn("_k", key)
        canon = (
            keyed.groupBy("gh")
            .agg(F.min("_k").alias("c"), F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") >= 2)
            .select("gh", "c")
        )
        noop(canon, f"canon agg ({name} key)")
        dups = keyed.join(canon, "gh").where(F.col("_k") != F.col("c"))
        noop(dups.select("id", "pos"), f"canon agg + join ({name} key)")

    # full current back half
    noop(D._non_canonical_occurrences(occ, k, True), "full _non_canonical (current)")

    # compute-once variant: repartition occ by id; window path reuses the
    # exchange, agg path reshuffles the already-computed rows
    occ_id = occ.repartition(32, "id")
    keyed = occ_id.withColumn("_k", key_dec)
    canon = (
        keyed.groupBy("gh")
        .agg(F.min("_k").alias("c"), F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("gh", "c")
    )
    dups = keyed.join(canon, "gh").where(F.col("_k") != F.col("c"))
    noop(dups.select("id", "pos"), "repartition(id) compute-once variant")


if __name__ == "__main__":
    main()


def variant_prefix_prefilter():
    """gh8-long count agg -> hot-prefix semi-join -> full-gh canon agg over
    survivors only. Value-identical: every gram with >=2 occurrences has a
    prefix count >=2 (superset), and the full agg's count>=2 re-filter
    drops prefix-collision singletons."""
    import os, time
    from pyspark.sql import functions as F
    from lapis_silo_spark.driver_queries import Pipeline, db_for
    from lapis_silo_spark.functions import dedup as D
    from lapis_silo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    db = db_for(spark, sf_dir)
    docs = Pipeline.scan(db, "documents").rebalance(target_bytes=16 * 1024).df
    k = 50
    occ = D._char_gram_occurrences_expr(docs, "doc_id", "text", k)
    key = (
        F.col("id").cast("decimal(20,0)")
        * F.lit(4294967296).cast("decimal(20,0)")
        + F.col("pos").cast("decimal(20,0)")
    ).cast("decimal(38,0)")

    # current shape for reference
    noop(D._non_canonical_occurrences(occ, k, True), "current full agg+join")

    gh8 = F.conv(F.substring(F.hex(F.col("gh")), 1, 15), 16, 10).cast("long")
    hot8 = (
        occ.select(gh8.alias("g8"))
        .groupBy("g8")
        .agg(F.count(F.lit(1)).alias("_n8"))
        .where(F.col("_n8") >= 2)
        .select("g8")
    )
    sub = occ.withColumn("g8", gh8).join(F.broadcast(hot8), "g8").drop("g8")
    keyed = sub.withColumn("_k", key)
    canon = (
        keyed.groupBy("gh")
        .agg(F.min("_k").alias("c"), F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("gh", "c")
    )
    dups = keyed.join(F.broadcast(canon), "gh").where(F.col("_k") != F.col("c"))
    out = dups.select("id", "pos", (F.col("pos") + F.lit(k - 1)).alias("end"))
    noop(out, "prefix-prefilter variant")
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, D._non_canonical_occurrences(occ, k, True).collect()))
    print("value-identical:", a == b, len(a))


if __name__ == "__main__" and os.environ.get("VARIANT") == "prefix":
    variant_prefix_prefilter()
