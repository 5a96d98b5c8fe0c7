"""In-process A/B of lsh_candidate_pairs component costs at sf0.1 (guide
§1.4 noop-sink, min-of-3 per variant, warm process): where does the
per-bucket blocked-matmul shape spend its extra wall vs the old
bucket-self-join shape?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lapis_silo_spark.driver_queries import db_for
from lapis_silo_spark.functions import similarity as S
from lapis_silo_spark.session import get_spark


def noop(df, label, runs=3):
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    print(f"{label}: min={min(walls):.3f} walls={[round(w,3) for w in walls]}")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    db = db_for(spark, sf_dir)
    emb = db.table("embeddings")
    n_planes, n_tables, dim = 6, 4, 64

    print("rows:", emb.count())

    vecs = (
        emb.select(F.col("vec_id").alias("id"),
                   F.col("embedding").cast("array<double>").alias("vec"))
        .withColumn("nrm", S.norm(F.col("vec")))
        .filter((F.col("nrm") > 0) & ~F.isnan("nrm"))
        .select("id", "vec")
    )

    # component: one hyperplane bucket pass
    one_pass = vecs.select(
        "id", F.explode(S.lsh_table_buckets("vec", n_planes, n_tables, dim)
                        ).alias("bucket"))
    noop(one_pass, "hyperplane pass (narrow)")

    # component: sizes agg alone
    sizes = (one_pass.select("bucket").groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("_n")).filter(F.col("_n") >= 2))
    noop(sizes, "sizes agg")

    # full new shape (current implementation)
    new = S.lsh_candidate_pairs(emb, "vec_id", "embedding", threshold=0.4,
                                n_planes=n_planes, n_tables=n_tables, dim=dim)
    noop(new, "NEW per-bucket matmul full")

    # old shape reconstructed
    vecs2 = (
        emb.select(F.col("vec_id").alias("id"),
                   F.col("embedding").cast("array<double>").alias("vec"))
        .withColumn("nrm", S.norm(F.col("vec")))
        .filter((F.col("nrm") > 0) & ~F.isnan("nrm"))
    ).persist()
    buckets = vecs2.select(
        "id", F.explode(S.lsh_table_buckets("vec", n_planes, n_tables, dim)
                        ).alias("bucket")).persist()
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (a.join(b, on=[F.col("a.bucket") == F.col("b.bucket"),
                          F.col("a.id") < F.col("b.id")])
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    va = vecs2.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                      F.col("nrm").alias("nrm_a"))
    vb = vecs2.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                      F.col("nrm").alias("nrm_b"))
    cos = S.dot(F.col("vec_a"), F.col("vec_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    old = (cand.join(va, "id_a").join(vb, "id_b").withColumn("cos", cos)
           .filter(F.col("cos") >= F.lit(0.4))
           .select("id_a", "id_b", F.round("cos", 6).alias("cos")))
    noop(old, "OLD join form full")

    # value identity on the real corpus
    sn = sorted(map(tuple, new.collect()))
    so = sorted(map(tuple, old.collect()))
    print("value-identical:", sn == so, len(sn))


if __name__ == "__main__":
    main()
