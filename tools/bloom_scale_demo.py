"""Bloom-vs-exact decontamination as the EVAL SET grows.

The exact decontam join broadcasts the eval gram table itself; the bloom
path broadcasts a bit array sized for a target false-positive rate. This
demo grows the number of DISTINCT eval grams (the axis that matters — the
corpus axis is covered by the 10x/100x sweeps) and measures wall time and
the broadcast payload for both, with the bloom sized at ~1% fp
(n_bits ~ 9.6 * n_members).

Usage: python tools/bloom_scale_demo.py [sizes_csv]   default 10000,100000,1000000
Prints one JSON line per (n_eval_grams, method).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRAIN_DOCS = 20_000
GRAMS_PER_DOC = 20


def main() -> int:
    sizes = [int(s) for s in
             (sys.argv[1] if len(sys.argv) > 1 else
              "10000,100000,1000000").split(",")]
    from pyspark.sql import functions as F

    from lapis_silo_spark.functions.sketches import (
        BLOOM_BITS_PER_WORD,
        bloom_build,
        bloom_probe,
    )
    from lapis_silo_spark.session import get_spark

    spark = get_spark()

    # training probes: unique synthetic grams, ~10% drawn from the eval
    # vocabulary so both paths do real hit-work
    def gram(prefix: str, n: int):
        return F.concat(F.lit(prefix), F.md5(F.col("id").cast("string")),
                        F.lit(":"), (F.col("id") % n).cast("string"))

    for n_eval in sizes:
        ev = spark.range(n_eval).select(
            gram("e", n_eval).alias("gram")
        ).persist()
        ev.count()
        train = spark.range(N_TRAIN_DOCS * GRAMS_PER_DOC).select(
            (F.col("id") % N_TRAIN_DOCS).alias("doc"),
            F.when(F.col("id") % 10 == 0,
                   gram("e", n_eval))  # same construction = true members
            .otherwise(gram("t", n_eval)).alias("gram"),
        ).persist()
        train.count()

        # exact: broadcast the gram table
        t0 = time.monotonic()
        exact = (
            train.join(F.broadcast(ev), "gram")
            .groupBy("doc").agg(F.count(F.lit(1)).alias("hits"))
        )
        n_exact = exact.count()
        wall_exact = round(time.monotonic() - t0, 2)
        ev_bytes = n_eval * 40  # ~40 B/gram string payload

        # bloom sized for ~1% fp: n_bits = n * ln(1/fp) / ln(2)^2, k=7
        n_bits = int(n_eval * math.log(1 / 0.01) / math.log(2) ** 2)
        n_words = max(32, n_bits // BLOOM_BITS_PER_WORD + 1)
        n_hashes = 7
        t0 = time.monotonic()
        bloom = bloom_build(ev, "gram", n_words, n_hashes).persist()
        n_bloom_rows = bloom.count()
        wall_build = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        probed = bloom_probe(train, "doc", "gram", bloom, n_words, n_hashes)
        hits = (
            probed.filter("maybe_member")
            .groupBy("id").agg(F.count(F.lit(1)).alias("hits"))
        )
        n_bloom = hits.count()
        wall_probe = round(time.monotonic() - t0, 2)

        print(json.dumps({
            "n_eval_grams": n_eval,
            "exact": {"wall_sec": wall_exact,
                      "broadcast_bytes_approx": ev_bytes,
                      "docs_flagged": n_exact},
            "bloom": {"n_words": n_words, "rows": n_bloom_rows,
                      "state_bytes": n_bloom_rows * 16,
                      "build_sec": wall_build, "probe_sec": wall_probe,
                      "docs_flagged": n_bloom},
        }))
        ev.unpersist()
        train.unpersist()
        bloom.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
