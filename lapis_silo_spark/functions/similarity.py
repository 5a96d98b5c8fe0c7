"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and random-hyperplane LSH bucketing (scale path).

Scale design: brute-force is exact and fine when one side is small (a query
batch) — it broadcasts the queries and scans the corpus once, no shuffle.
The LSH path buckets the corpus by signature so candidate generation is a
hash join on the bucket key; exact cosine re-ranks within candidates. The
hyperplanes are md5-derived (deterministic, no RNG state), so results are
reproducible and SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lapis_silo_spark.functions.dedup import cosine, dot, norm


def _hyperplane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random component in [-1, 1): md5(plane:dim)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(plane), F.lit(dim))), 1, 8), 16, 10
    ).cast("long")
    return (h % 2001 - 1000).cast("double") / 1000.0


def lsh_signature(vec_col: Column, n_planes: int, dim: int) -> Column:
    """Random-hyperplane (sign) signature as a bit-string, e.g. '1011…'."""
    bits = []
    for p in range(n_planes):
        dot = F.lit(0.0)
        for d in range(dim):
            dot = dot + vec_col.getItem(d) * _hyperplane_component(p, d)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query side, scan
    the corpus once, per-query top-k via window ranking.

    Output: (query_id, id, cos, rank), self-matches excluded; ties broken by
    corpus id for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("nrm", norm(F.col("vec")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qvec"),
    ).withColumn("qnrm", norm(F.col("qvec")))
    # norms once per vector; the scan-side work per (row, query) is one dot
    scored = (
        c.join(F.broadcast(q), on=F.col("id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("vec"), F.col("qvec"))
                / (F.col("nrm") * F.col("qnrm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cos", "rank")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in >= 1 of
    ``n_tables`` hash tables (each table = its own plane set), exact cosine
    re-rank within candidates.

    Recall is tunable via (n_planes, n_tables); shuffle volume is
    n_tables × corpus, never corpus × queries.
    """
    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qvec"),
    )

    # per-table signatures with table-offset plane indices
    def sig_for_table(vec: str, t: int) -> Column:
        bits = []
        for p in range(n_planes):
            dot = F.lit(0.0)
            for d in range(dim):
                dot = dot + F.col(vec).getItem(d) * _hyperplane_component(
                    t * n_planes + p, d
                )
            bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(F.lit(f"{t}:"), *bits)

    c_buckets = c.select(
        "id", "vec",
        F.explode(F.array(*[sig_for_table("vec", t) for t in range(n_tables)])
                  ).alias("bucket"),
    )
    q_buckets = q.select(
        "query_id", "qvec",
        F.explode(F.array(*[sig_for_table("qvec", t) for t in range(n_tables)])
                  ).alias("bucket"),
    )
    candidates = (
        c_buckets.join(q_buckets, on="bucket")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "qvec", "id", "vec")
        .dropDuplicates(["query_id", "id"])
    )
    scored = candidates.withColumn(
        "cos", F.round(cosine(F.col("vec"), F.col("qvec")), 6)
    )  # candidate set is already small; per-pair cosine is fine here
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cos", "rank")
    )
