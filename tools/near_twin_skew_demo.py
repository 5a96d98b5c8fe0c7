"""Adversarial near-twin skew sweep for the MinHash band join.

The twin-replication protocol (scale10_demo) structurally CANNOT expose the
band-bucket skew: replication creates *exact* twins, which the digest
short-circuit removes before LSH. This tool builds the adversarial corpus
the round-4 verdict asked for — a hot slice of near-identical-but-not-
identical documents (1–2 chars of drift, so every one survives the digest
and collides in most of its 8 band buckets) on top of a normal background
corpus — and measures ``minhash_dedup_clusters`` wall time with and
without ``max_band_freq``.

Expected shape: the uncapped curve is quadratic in the hot-slice size
(every hot bucket emits |bucket|²/2 candidates); the capped curve stays
near-linear because hot buckets are skipped while the background corpus's
small buckets are untouched.

Usage::

    python tools/near_twin_skew_demo.py [sf_dir] --hot 200,2000,20000 \
        --cap 256 [--skip-uncapped-above 5000]

Prints one JSON report; paste the table into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_LEN = 400


def hot_slice(spark, n: int, id_offset: int):
    """n distinct near-twin docs: a fixed base string with 1–2 deterministic
    single-char substitutions (id-addressed), so texts are pairwise distinct
    (distinct digests) but pairwise Jaccard ≈ 0.9+ (true near-dups)."""
    from pyspark.sql import functions as F

    import string

    base = "".join(
        string.ascii_lowercase[(i * 7 + i // 26) % 26] if i % 6 else " "
        for i in range(BASE_LEN)
    )
    df = spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"), F.col("id").alias("i")
    )
    p1 = (F.col("i") % BASE_LEN).cast("int")
    l1 = F.expr(f"char(65 + CAST(i / {BASE_LEN} AS BIGINT) % 26)")
    p2 = ((F.col("i") * 131) % BASE_LEN).cast("int")
    l2 = F.expr(f"char(65 + CAST(i / {BASE_LEN * 26} AS BIGINT) % 26)")
    two = F.col("i") >= BASE_LEN * 26
    # deterministic single-char substitutions via overlay
    text = F.overlay(F.lit(base), l1, p1 + 1, F.lit(1))
    text = F.when(two, F.overlay(text, l2, p2 + 1, F.lit(1))).otherwise(text)
    return df.select("doc_id", text.alias("text"))


def build_corpus(spark, sf_dir: str, n_hot: int, bg_factor: int):
    from pyspark.sql import functions as F

    from lapis_silo_spark.driver_queries import db_for

    docs = db_for(spark, sf_dir).table("documents").select("doc_id", "text")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    bg = docs
    for kk in range(1, bg_factor):
        bg = bg.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(int(kk * n_docs)))
        )
    hot = hot_slice(spark, n_hot, id_offset=bg_factor * n_docs + 1)
    return bg.unionByName(hot)


def measure(df, cap):
    from lapis_silo_spark.functions import dedup as fdedup

    t0 = time.monotonic()
    out = fdedup.minhash_dedup_clusters(
        df, "doc_id", "text", threshold=0.8, max_band_freq=cap
    )
    n = out.count()
    clusters = out.filter("is_canonical").count()
    return round(time.monotonic() - t0, 2), n, clusters


def main() -> int:
    argv = sys.argv[1:]
    hots = [200, 2000]
    cap = 256
    skip_above = 20001
    bg_factor = 1
    if "--hot" in argv:
        i = argv.index("--hot")
        hots = [int(x) for x in argv[i + 1].split(",")]
        argv = argv[:i] + argv[i + 2:]
    if "--cap" in argv:
        i = argv.index("--cap")
        cap = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--bg-factor" in argv:
        i = argv.index("--bg-factor")
        bg_factor = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--skip-uncapped-above" in argv:
        i = argv.index("--skip-uncapped-above")
        skip_above = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from lapis_silo_spark.session import get_spark

    spark = get_spark()
    report = {"sf_dir": sf_dir, "cap": cap, "bg_factor": bg_factor,
              "points": []}
    for n_hot in hots:
        df = build_corpus(spark, sf_dir, n_hot, bg_factor).persist()
        df.count()  # materialize once so both runs read the same input cost
        point = {"n_hot": n_hot, "corpus_rows": df.count()}
        capped_s, n, clusters = measure(df, cap)
        point.update(capped_sec=capped_s, rows=n, clusters_capped=clusters)
        if n_hot <= skip_above:
            unc_s, n2, clusters2 = measure(df, None)
            point.update(uncapped_sec=unc_s, clusters_uncapped=clusters2)
            assert n2 == n
        df.unpersist()
        report["points"].append(point)
        print(json.dumps(point), flush=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
