"""Price the pivot exact-pair path against the blocked exact-pair path
(round-10 VERDICT #3): wall time + candidate counts at verification-grade
thresholds on the sf1 embeddings, where the pivot's metric pruning should
win. Emits one JSON line per (threshold, path) and a summary.

Candidate-count definitions (both exact, computed from cheap histogram
jobs, not by instrumenting the hot path):

- blocked: every non-degenerate pair is evaluated once across the block
  grid -> n_nz * (n_nz - 1) / 2.
- pivot: pairs that survive EVERY pivot's adjacent-bucket mask -> summed
  from the joint bucket-combo histogram over neighbors with Chebyshev
  distance <= 1 (exactly the mask `bucket_pairs` applies before the
  matmul; the matmul itself also computes masked cells, so this is the
  count of pairs whose cosine the path must actually consider).

Usage::

    python tools/pivot_pricing.py [sf_dir] [--runs 2]
"""

from __future__ import annotations

import itertools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def pivot_candidates(marked, n_pivots: int) -> int:
    """Exact count of pairs surviving the all-pivots adjacency mask, from
    the joint (b_1..b_p) histogram — O(combos * 3^p) driver work."""
    from pyspark.sql import functions as F

    hist = {
        tuple(r["bk"]): r["cnt"]
        for r in marked.groupBy("bk").agg(F.count("*").alias("cnt")).collect()
    }
    total = 0
    for combo, n in hist.items():
        total += n * (n - 1) // 2  # same-combo pairs
        for delta in itertools.product((-1, 0, 1), repeat=n_pivots):
            if delta == (0,) * n_pivots:
                continue
            other = tuple(c + d for c, d in zip(combo, delta))
            # count each cross-combo pair once
            if other in hist and combo < other:
                total += n * hist[other]
    return total


def clustered_embeddings(spark, n_rows: int, dim: int, n_clusters: int,
                         noise: float, seed: int = 11):
    """Direction-clustered synthetic embeddings (the regime real encoder
    output lives in: semantic clusters, NOT isotropic noise) — generated
    distributively, deterministic per row id."""
    from pyspark.sql import functions as F

    base = spark.range(n_rows).select(F.col("id").alias("vec_id"))

    def gen(batches):
        rng_c = np.random.default_rng(seed)
        centers = rng_c.standard_normal((n_clusters, dim))
        centers /= np.sqrt((centers * centers).sum(axis=1, keepdims=True))
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            vecs = []
            for i in ids:
                r = np.random.default_rng(seed * 1_000_003 + int(i))
                v = centers[int(i) % n_clusters] + noise * r.standard_normal(dim)
                vecs.append([float(x) for x in v])
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return base.mapInPandas(gen, "vec_id long, embedding array<double>")


def price(spark, emb, runs: int) -> list[dict]:
    from pyspark.sql import functions as F

    from lapis_silo_spark.functions import dedup as fdedup

    n = emb.count()

    # non-degenerate universe (what both paths actually pair over)
    sq = F.aggregate(
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: x * x),
        F.lit(0.0), lambda s, v: s + v)
    n_nz = emb.filter(sq > 0).count()

    points = []
    for threshold in (0.85, 0.92, 0.98):
        # candidate counts: blocked = all pairs; pivot = masked pairs
        # (recompute the marked frame exactly as the operator does)
        w = math.acos(threshold)
        rng = np.random.default_rng(7)
        dim = len(emb.select("embedding").first()["embedding"])
        piv = rng.standard_normal((4, dim))
        piv /= np.sqrt((piv * piv).sum(axis=1, keepdims=True))
        bc = spark.sparkContext.broadcast(piv)

        @F.pandas_udf("array<int>")
        def bucket_ids(vecs: pd.Series) -> pd.Series:
            p = bc.value
            mat = np.array(vecs.tolist(), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            cos = np.clip((mat @ p.T) / nrm, -1.0, 1.0)
            return pd.Series(list(np.floor(np.arccos(cos) / w)
                                  .astype(np.int32)))

        marked = (
            emb.filter(sq > 0)
            .select(F.col("vec_id").alias("id"),
                    bucket_ids(F.col("embedding").cast("array<double>"))
                    .alias("bk"))
        )
        cand_pivot = pivot_candidates(marked, 4)
        cand_blocked = n_nz * (n_nz - 1) // 2

        walls = {}
        pairs = {}
        for name, fn in (
            ("blocked", lambda: fdedup.embedding_near_dup_pairs_blocked(
                emb, "vec_id", "embedding", threshold=threshold,
                allow_quadratic=True)),
            ("pivot", lambda: fdedup.embedding_near_dup_pairs_pivot(
                emb, "vec_id", "embedding", threshold=threshold,
                block_rows=8192, max_sub_blocks=4096)),
        ):
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                cnt = fn().count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            walls[name] = round(best, 3)
            pairs[name] = cnt
        assert pairs["blocked"] == pairs["pivot"], (
            "exact paths disagree", threshold, pairs)
        point = {
            "threshold": threshold,
            "true_pairs": pairs["blocked"],
            "candidates_blocked": cand_blocked,
            "candidates_pivot": cand_pivot,
            "prune_factor": round(cand_blocked / max(1, cand_pivot), 2),
            "wall_blocked_s": walls["blocked"],
            "wall_pivot_s": walls["pivot"],
            "winner": "pivot" if walls["pivot"] < walls["blocked"]
                      else "blocked",
        }
        points.append(point)
        print(json.dumps(point), flush=True)
    return points


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/testdata_sf1"
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
    clustered_only = "--clustered-only" in sys.argv
    isotropic_only = "--isotropic-only" in sys.argv
    dim = 64
    for a in sys.argv[1:]:
        if a.startswith("--dim"):
            dim = int(a.split("=")[1])

    from lapis_silo_spark.session import get_spark

    spark = get_spark(app_name="pivot-pricing")
    out = {"sf_dir": sf_dir, "runs": runs}

    if not clustered_only:
        emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")).persist()
        n = emb.count()
        print(json.dumps({"dataset": "isotropic", "rows": n}), flush=True)
        out["isotropic"] = price(spark, emb, runs)
        emb.unpersist()

    if not isotropic_only:
        # same row count / dim as the sf table, but direction-clustered —
        # the regime encoder embeddings actually live in
        n = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")).count()
        cemb = clustered_embeddings(
            spark, n_rows=n, dim=dim, n_clusters=200, noise=0.08
        ).persist()
        cemb.count()
        print(json.dumps({"dataset": "clustered", "rows": n, "dim": dim,
                          "n_clusters": 200, "noise": 0.08}), flush=True)
        out["clustered"] = price(spark, cemb, runs)
        cemb.unpersist()

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
