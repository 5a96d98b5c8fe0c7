"""Measure local-reference adaptation on an amplicon-style corpus.

Models the workload the reference optimization targets
(``vertical_sequence_index.h:71-82``, ``performance/
clustered_ingestion_benchmark.cpp``): a dominant circulating variant means
most reads mutate at the SAME positions, so storing diffs against the
published reference wastes a row per read per variant-defining position.
Flipping the baseline to the majority symbol moves that cost to the
minority wild-type reads.

Synthesizes N short reads over a 1000-nt reference: a fraction ``dominant``
carry the variant's 30 defining mutations (those inside their 200-nt
window) plus 2 private mutations; the rest are wild type with 2 private
mutations. Prints mutations-table row counts and wall times before/after
adaptation, plus a mutations() aggregate timing on both stores.

Run: python tools/adapt_scale_demo.py [n_reads] [dominant_fraction]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lapis_silo_spark.catalog import Database  # noqa: E402
from lapis_silo_spark.operators import Pipeline  # noqa: E402
from lapis_silo_spark.operators.mutations import mutations_aggregate  # noqa: E402
from lapis_silo_spark.session import get_spark  # noqa: E402
from lapis_silo_spark.sources.adapt import adapt_local_reference  # noqa: E402
from lapis_silo_spark.sources.ndjson import (  # noqa: E402
    TableConfig,
    ingest_records,
)


def main() -> None:
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dominant = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    ref_len, window = 1000, 200
    rng = random.Random(7)
    bases = "ACGT"
    ref = "".join(rng.choice(bases) for _ in range(ref_len))
    variant_pos = sorted(rng.sample(range(1, ref_len + 1), 30))
    variant_sub = {
        p: bases[(bases.index(ref[p - 1]) + 1) % 4] for p in variant_pos
    }

    def read_record(i: int) -> dict:
        start = rng.randint(1, ref_len - window + 1)  # 1-based
        seq = list(ref[start - 1 : start - 1 + window])
        if rng.random() < dominant:
            for p, sym in variant_sub.items():
                if start <= p < start + window:
                    seq[p - start] = sym
        for _ in range(2):  # private noise
            j = rng.randrange(window)
            seq[j] = rng.choice(bases)
        return {
            "primary_key": f"r{i}",
            "main": {
                "sequence": "".join(seq),
                "sequenceCompressed": None,
                "insertions": [],
                "offset": start - 1,
            },
        }

    spark = get_spark(app_name="adapt-scale-demo")
    config = TableConfig(
        name="default", primary_key="primary_key", metadata={},
        nuc_sequences={"main": ref},
    )
    records = spark.createDataFrame(
        [read_record(i) for i in range(n_reads)],
        schema=config.spark_schema(),
    ).repartition(32)
    t0 = time.perf_counter()
    main_df, store = ingest_records(spark, records, config)
    for side in (store.mutations, store.coverage, store.missing,
                 store.insertions):
        side.persist()
    before_rows = store.mutations.count()
    t_ingest = time.perf_counter() - t0

    t0 = time.perf_counter()
    adapted = adapt_local_reference(store)
    adapted.mutations.persist()
    after_rows = adapted.mutations.count()
    t_adapt = time.perf_counter() - t0
    flips = adapted.local_reference.join(
        store.reference, on=["seq_name", "pos"]
    ).filter(F.col("local_symbol") != F.col("ref_symbol")).count()

    def time_mutations(s) -> float:
        db = Database(spark)
        db.register_table("default", main_df, primary_key="primary_key")
        db.register_sequence_store("default", s)
        t = time.perf_counter()
        mutations_aggregate(
            Pipeline.scan(db, "default"), min_proportion=0.05
        ).collect()
        return time.perf_counter() - t

    q_before = time_mutations(store)
    q_after = time_mutations(adapted)

    print(
        f"reads={n_reads} dominant={dominant} ingest={t_ingest:.1f}s | "
        f"mutations rows: {before_rows} -> {after_rows} "
        f"({before_rows / max(after_rows, 1):.2f}x smaller), "
        f"{flips} baseline flips | adapt={t_adapt:.1f}s | "
        f"mutations() {q_before:.2f}s -> {q_after:.2f}s"
    )


if __name__ == "__main__":
    main()
