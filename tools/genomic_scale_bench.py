"""Reference-scale genomic benchmark: the reference's own headline workloads
through the real Spark engine, at the reference's own data scales.

Two workloads, both mirroring `/root/reference/performance/` configurations
(workload definitions only — all code here is original PySpark):

**A. mutation_benchmark replica** (`performance/mutation_benchmark.cpp:80-130`
+ `sequence_generator.h:432,445`): reference = "ACGT"×1000 (4,000 nt);
3.2M 4-nt "ACGT" reads at the fixed offset distribution of
`writeMutationBenchmarkNdjson` (1M@0, 1M@4, 100k@99, 1k each @100..199,
1M@2000). Queries: `mutations(minProportion:=0.05)` full-table, and
filtered `!(key = '3')` ("almost all" — the reference's second timing).

**B. full-genome scale** (`sequence_generator.h:367-384` +
`SequenceTreeGenerator:118-185`): 100k full-length genomes over a 29,903-nt
reference (the exampleDataset genome LENGTH; the sequence itself is
deterministic synthetic ACGT — no reference data is copied), evolved along
a 5-generation / 3-children / 10%-death / 0.001-rate tree, cycled i mod n.
Queries: `mutations()` full + filtered over the ~30k-position coverage
grid — this drives the adapted-store grid materialization
(`operators/mutations.py` `_MAX_GRID_ROWS` path) at real genome scale.

Both stores are SAVED through the versioned parquet lifecycle and RELOADED
before timing, so queries run against real file scans and the committed
evidence includes each query's scan-level `numOutputRows` (rows the parquet
reader materialized), not just wall time.

Usage:  python tools/genomic_scale_bench.py [--out GENOMIC_SCALE_r08.json]
Env:    SPARK_GRAFT_GENOMIC_ROOT   scratch dir (default .scratch/genomic_scale)
        SPARK_GRAFT_GENOMIC_READS  workload-A rows (default 3,200,000)
        SPARK_GRAFT_GENOMIC_GENOMES workload-B rows (default 100,000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _loadavg() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return -1.0


def _walk_scans(node, acc: list[dict]) -> None:
    """Recursively unwrap AQE / query-stage wrappers and record every scan
    node's numOutputRows (rows the reader/cache materialized)."""
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _walk_scans(node.executedPlan(), acc)
        return
    if cls.endswith("QueryStageExec"):
        _walk_scans(node.plan(), acc)
        return
    if "Scan" in cls:
        entry = {"node": node.nodeName().split("\n")[0][:80]}
        m = node.metrics()
        it = m.keysIterator()
        while it.hasNext():
            k = it.next()
            if k == "numOutputRows":
                entry["numOutputRows"] = int(m.apply(k).value())
        acc.append(entry)
    children = node.children()
    for i in range(children.size()):
        _walk_scans(children.apply(i), acc)


def scan_metrics(df: DataFrame) -> tuple[int, list[dict]]:
    """Execute ``df`` (collect) and return (row_count, per-scan metrics)."""
    rows = df.collect()
    out: list[dict] = []
    try:
        _walk_scans(df._jdf.queryExecution().executedPlan(), out)
    except Exception as exc:  # noqa: BLE001 — evidence, never fatal
        out.append({"error": str(exc)[:120]})
    return len(rows), out


# ---------------------------------------------------------------------------
# Workload generators (original implementations of the published workload
# definitions; parameters cited in the module docstring)
# ---------------------------------------------------------------------------

def mutation_reads(spark: SparkSession, n: int) -> DataFrame:
    """n 4-nt 'ACGT' reads at writeMutationBenchmarkNdjson's offset
    distribution (boundaries expressed as 32nds of n, so they are EXACTLY
    the reference's 1M/1M/100k/100k/1M batches at n=3.2M and the same
    proportions at a reduced smoke n)."""
    rid = F.col("id")
    b1, b2, b3, b4 = (n * k // 32 for k in (10, 20, 21, 22))
    sub = max(1, (b4 - b3) // 100)  # rows per 100+i offset (1000 at full n)
    offset = (
        F.when(rid < b1, F.lit(0))
        .when(rid < b2, F.lit(4))
        .when(rid < b3, F.lit(99))
        .when(rid < b4,
              (F.lit(100) + F.least((rid - b3) / sub, F.lit(99))).cast("int"))
        .otherwise(F.lit(2000))
    )
    return spark.range(n).select(
        rid.cast("string").alias("key"),
        F.struct(
            F.lit("ACGT").alias("sequence"),
            F.lit(None).cast("string").alias("sequenceCompressed"),
            F.array().cast("array<string>").alias("insertions"),
            offset.alias("offset"),
        ).alias("main"),
    )


def evolved_tree(
    reference: str,
    seed: int = 42,
    rate: float = 0.001,
    death: float = 0.1,
    generations: int = 5,
    children: int = 3,
) -> list[str]:
    """Distinct evolved sequences: each child re-mutates its parent at
    ``rate`` per position (SequenceTreeGenerator semantics — shared
    ancestral mutations, leaf-private ones)."""
    rng = np.random.default_rng(seed)
    ref = np.frombuffer(reference.encode(), dtype=np.uint8).copy()
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = [ref]
    current = [0]
    for _ in range(generations):
        nxt: list[int] = []
        for idx in current:
            for _c in range(children):
                if rng.random() >= death:
                    parent = seqs[idx]
                    child = parent.copy()
                    k = rng.binomial(len(child), rate)
                    pos = rng.integers(0, len(child), size=k)
                    child[pos] = bases[rng.integers(0, 4, size=k)]
                    seqs.append(child)
                    nxt.append(len(seqs) - 1)
        if not nxt:
            nxt = [len(seqs) - 1]
        current = nxt
    return [s.tobytes().decode() for s in seqs]


def full_genomes(
    spark: SparkSession, reference: str, n: int
) -> tuple[DataFrame, int]:
    """n full-length genome records cycling over the evolved set."""
    evolved = evolved_tree(reference)
    evo_df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(evolved)], "eid int, seq string"
    )
    rows = spark.range(n).withColumn(
        "eid", (F.col("id") % len(evolved)).cast("int")
    )
    records = rows.join(F.broadcast(evo_df), on="eid").select(
        F.col("id").cast("string").alias("key"),
        F.struct(
            F.col("seq").alias("sequence"),
            F.lit(None).cast("string").alias("sequenceCompressed"),
            F.array().cast("array<string>").alias("insertions"),
            F.lit(None).cast("int").alias("offset"),
        ).alias("main"),
    )
    return records, len(evolved)


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def run_workload(
    spark: SparkSession,
    label: str,
    records: DataFrame,
    reference: str,
    root: str,
    adapted: bool = False,
    reuse_saved: bool = False,
) -> dict:
    from lapis_silo_spark.catalog import Database
    from lapis_silo_spark.expressions import Equals, Negation
    from lapis_silo_spark.operators.mutations import mutations_aggregate
    from lapis_silo_spark.operators.relational import Pipeline
    from lapis_silo_spark.sources.ndjson import TableConfig, ingest_records
    from lapis_silo_spark.storage import load_version, save_version

    result: dict = {"label": label, "loadavg_start": _loadavg()}
    if not (reuse_saved and os.path.exists(os.path.join(root, "latest"))):
        config = TableConfig(
            name="default", primary_key="key", metadata={},
            nuc_sequences={"main": reference},
        )
        records = records.repartition(
            spark.sparkContext.defaultParallelism
        )
        # ingest through the real diffing pipeline ("Added all data" in the
        # reference's log), then persist via the versioned lifecycle
        t0 = time.perf_counter()
        main, store = ingest_records(spark, records, config)
        db = Database(spark)
        db.register_table("default", main, primary_key="key")
        db.register_sequence_store("default", store)
        # save_version range-partitions + sorts every store side table by
        # (seq_name, pos/cov_start) itself — position predicates prune row
        # groups on the reloaded store
        save_version(db, root)
        result["ingest_and_save_sec"] = round(time.perf_counter() - t0, 2)

    db2 = load_version(spark, root)
    store2 = db2.sequence_store("default")
    if adapted:
        from lapis_silo_spark.sources.adapt import adapt_local_reference

        t0 = time.perf_counter()
        store2 = adapt_local_reference(store2)
        store2.mutations.persist().count()
        result["adapt_sec"] = round(time.perf_counter() - t0, 2)
        db2.register_sequence_store("default", store2)
    result["side_rows"] = {
        "mutations": store2.mutations.count(),
        "coverage": store2.coverage.count(),
        "missing": store2.missing.count(),
    }

    def timed(name: str, df: DataFrame) -> None:
        load = _loadavg()
        t0 = time.perf_counter()
        n_rows, scans = scan_metrics(df)
        result[name] = {
            "wall_sec": round(time.perf_counter() - t0, 2),
            "rows": n_rows,
            "loadavg_1m": load,
            "scan_numOutputRows": scans,
        }
        print(f"  {label}/{name}: {result[name]['wall_sec']}s, "
              f"{n_rows} rows, load {load}", flush=True)

    pipe = Pipeline.scan(db2, "default")
    timed("mutations_all", mutations_aggregate(pipe, ["main"], 0.05))
    timed(
        "mutations_almost_all",
        mutations_aggregate(
            Pipeline.scan(db2, "default").filter(
                Negation(Equals("key", "3"))
            ),
            ["main"],
            0.05,
        ),
    )
    result["loadavg_end"] = _loadavg()
    return result


def main() -> None:
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    root = os.environ.get(
        "SPARK_GRAFT_GENOMIC_ROOT",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scratch", "genomic_scale"),
    )
    n_reads = int(os.environ.get("SPARK_GRAFT_GENOMIC_READS", "3200000"))
    n_genomes = int(os.environ.get("SPARK_GRAFT_GENOMIC_GENOMES", "100000"))

    from lapis_silo_spark.session import get_spark

    spark = get_spark()
    results: dict = {
        "config": {
            "reads": n_reads,
            "genomes": n_genomes,
            "reference_a_nt": 4000,
            "reference_b_nt": 29903,
            "cpus": spark.sparkContext.defaultParallelism,
        }
    }

    print("workload A: mutation_benchmark replica "
          f"({n_reads} reads, 4,000-nt reference)", flush=True)
    shutil.rmtree(os.path.join(root, "a"), ignore_errors=True)
    results["mutation_benchmark"] = run_workload(
        spark, "A", mutation_reads(spark, n_reads), "ACGT" * 1000,
        os.path.join(root, "a"),
    )

    print(f"workload B: full genomes ({n_genomes} x 29,903 nt)", flush=True)
    # deterministic synthetic reference, the exampleDataset genome LENGTH
    rng = np.random.default_rng(7)
    ref_b = (
        np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 29903)]
        .tobytes().decode()
    )
    shutil.rmtree(os.path.join(root, "b"), ignore_errors=True)
    records_b, n_evolved = full_genomes(spark, ref_b, n_genomes)
    results["full_genomes"] = run_workload(
        spark, "B", records_b, ref_b, os.path.join(root, "b"),
    )
    results["full_genomes"]["n_evolved_sequences"] = n_evolved

    # B-adapted: majority-vote local reference over the 29,903-position
    # grid — the _MAX_GRID_ROWS driver materialization at real genome scale
    print("workload B-adapted: 29,903-position grid path", flush=True)
    results["full_genomes_adapted"] = run_workload(
        spark, "B-adapted", records_b, ref_b,
        os.path.join(root, "b"), adapted=True, reuse_saved=True,
    )

    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
