"""Boilerplate-gram skew sweep for substring-span dedup.

The hot case substring dedup meets at corpus scale is not adversarial — it
is BOILERPLATE: a fixed header/footer (licence text, ToS, navigation chrome)
shared by a large fraction of documents makes every one of its word-8-grams
occur once per document. Canonical selection must bring each gram's
occurrences together, so the hot grams concentrate:

- ``skew_safe=False`` (row_number window): a hot gram's WHOLE occurrence
  group must sort inside one task — un-splittable by AQE;
- ``skew_safe=True`` (min-struct aggregate + join): the min combines
  map-side and the 1:N join back is AQE-skew-splittable.

This tool builds the boilerplate corpus — ``n_hot`` documents sharing a
24-token header (17 hot 8-grams) with unique 24-token tails, on top of the
sf-dir documents as background — and times ``duplicate_spans`` in both
forms, asserting identical results.

Usage::

    python tools/substring_skew_demo.py [sf_dir] --hot 50000,200000,400000

Prints one JSON report; paste the table into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = " ".join(f"boiler{i}" for i in range(24))


def boilerplate_docs(spark, n: int, id_offset: int):
    """n distinct docs: the shared 24-token header + a unique 24-token tail
    (id-addressed, so no tail gram ever repeats across docs)."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"), F.col("id").alias("i")
    )
    tail = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"u{j}x"), (F.col("i") * 53 + j).cast("string"))
            for j in range(24)
        ],
    )
    return df.select(
        "doc_id", F.concat(F.lit(HEADER + " "), tail).alias("text")
    )


def build_corpus(spark, sf_dir: str, n_hot: int):
    from pyspark.sql import functions as F

    from lapis_silo_spark.driver_queries import db_for

    docs = db_for(spark, sf_dir).table("documents").select("doc_id", "text")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    hot = boilerplate_docs(spark, n_hot, id_offset=n_docs + 1)
    return docs.unionByName(hot)


def measure(df, skew_safe: bool, unit: str = "word"):
    from pyspark.sql import functions as F

    from lapis_silo_spark.functions.dedup import (
        duplicate_char_spans,
        duplicate_spans,
    )

    t0 = time.monotonic()
    if unit == "word":
        out = duplicate_spans(df, "doc_id", "text", k=8, skew_safe=skew_safe)
        dup_col = "dup_tokens"
    else:
        out = duplicate_char_spans(
            df, "doc_id", "text", k=50, skew_safe=skew_safe
        )
        dup_col = "dup_chars"
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(dup_col).alias("dup"),
        F.sum("n_spans").alias("spans"),
    ).collect()[0]
    return round(time.monotonic() - t0, 2), (agg[0], int(agg[1]), int(agg[2]))


def main() -> int:
    argv = sys.argv[1:]
    hots = [50000, 200000]
    if "--hot" in argv:
        i = argv.index("--hot")
        hots = [int(x) for x in argv[i + 1].split(",")]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from lapis_silo_spark.session import get_spark

    spark = get_spark()
    report = {"sf_dir": sf_dir, "header_tokens": 24, "points": []}
    for n_hot in hots:
        df = build_corpus(spark, sf_dir, n_hot).persist()
        df.count()
        point = {"n_hot": n_hot, "corpus_rows": df.count()}
        # one untimed run of EACH form first, so neither measured run
        # absorbs JVM/codegen warm-up (the first-form-measured-cold bias)
        for unit in ("word", "char"):
            measure(df, skew_safe=True, unit=unit)
            measure(df, skew_safe=False, unit=unit)
            join_s, sig_join = measure(df, skew_safe=True, unit=unit)
            win_s, sig_win = measure(df, skew_safe=False, unit=unit)
            assert sig_join == sig_win, (unit, sig_join, sig_win)
            point.update({
                f"{unit}_join_sec": join_s,
                f"{unit}_window_sec": win_s,
                f"{unit}_dup": sig_join[1],
                f"{unit}_spans": sig_join[2],
            })
        df.unpersist()
        report["points"].append(point)
        print(json.dumps(point), flush=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
