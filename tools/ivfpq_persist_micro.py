"""A/B micro for the round-12 storage.save_version partitioned-write
rebalance hint: runs ann_ivfpq_topk 4x in one process and prints the phase
timings plus the persisted file count (guide §6 small-files check)."""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lapis_silo_spark.driver_queries import PHASE_TIMINGS, QUERIES
from lapis_silo_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    for i in range(4):
        t0 = time.perf_counter()
        df = QUERIES["ann_ivfpq_topk"](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        print(f"run {i}: wall={wall:.3f}s phases={PHASE_TIMINGS['ann_ivfpq_topk']}")
    # count files of the last persisted codes table
    roots = sorted(glob.glob("/tmp/lss_ivfpq_*/versions/*/tables/ivfpq_codes"))
    if roots:
        n = len(glob.glob(roots[-1] + "/**/*.parquet", recursive=True))
        print(f"codes parquet files: {n} under {roots[-1]}")


if __name__ == "__main__":
    main()
