"""Recall@10 + wall time for every ANN method against exact ground truth.

The four registered methods trade accuracy for scan cost differently;
this records the operating points on the bench corpus so the choice is
data-driven, not vibes: brute force (exact, full scan), IVF (cell-probed
cosine), hyperplane LSH (bucketed cosine), PQ+refine (coded scan + exact
L2 re-rank of the candidate set).

Usage: python tools/ann_recall_demo.py [sf_dir]  (default /root/testdata/sf0.1)
Prints one JSON line per method.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 20
K = 10


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import numpy as np

    from pyspark.sql import functions as F

    from lapis_silo_spark.functions import similarity as fsim
    from lapis_silo_spark.session import get_spark

    spark = get_spark()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = np.sqrt((V * V).sum(axis=1))

    def exact_top(metric: str, q: int) -> set:
        qv = V[ids == q][0]
        if metric == "cos":
            score = -(V @ qv) / (nrm * np.sqrt(qv @ qv))
        else:  # squared L2
            score = ((V - qv[None, :]) ** 2).sum(axis=1)
        score[ids == q] = np.inf
        return set(ids[np.argsort(score, kind="stable")[:K]])

    def recall(got: dict, metric: str) -> float:
        vals = []
        for q in range(N_QUERIES):
            vals.append(len(exact_top(metric, q) & got.get(q, set())) / K)
        return round(sum(vals) / len(vals), 3)

    def collect_topk(df) -> dict:
        by_q: dict = {}
        for r in df.collect():
            by_q.setdefault(r["query_id"], set()).add(r["id"])
        return by_q

    runs = [
        ("brute_force", "cos", lambda: fsim.brute_force_topk(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=K)),
        ("ivf_nprobe3", "cos", lambda: fsim.ivf_topk(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            centroid_pred=F.col("vec_id") % 50 == 0, k=K, n_probe=3)),
        ("lsh_8x12", "cos", lambda: fsim.lsh_bucket_topk(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=K)),
        ("pq_refine50", "l2", lambda: fsim.pq_topk(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=K)),
    ]
    for name, metric, build in runs:
        build().count()  # warm
        t0 = time.monotonic()
        got = collect_topk(build())
        wall = round(time.monotonic() - t0, 3)
        print(json.dumps({
            "method": name,
            "metric": metric,
            "recall_at_10": recall(got, metric),
            "wall_sec": wall,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
