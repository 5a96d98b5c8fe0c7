

def test_kmeans_driver_fast_path_matches_distributed(spark, monkeypatch):
    """The bounded driver Lloyd loop (round 11) must produce the same
    rounded centroids/assignments as the distributed per-iteration jobs."""
    import lapis_silo_spark.functions.clustering as cl

    docs = spark.createDataFrame(
        [(i, [float((i * 7) % 13), float((i * 3) % 5), float(i % 4)])
         for i in range(60)],
        ["vid", "vec"],
    )
    fast = {
        (r["id"], r["cluster"])
        for r in cl.kmeans_assign(docs, "vid", "vec", k=4, iterations=3)
        .collect()
    }
    monkeypatch.setattr(cl, "KMEANS_DRIVER_ROW_LIMIT", 0)
    slow = {
        (r["id"], r["cluster"])
        for r in cl.kmeans_assign(docs, "vid", "vec", k=4, iterations=3)
        .collect()
    }
    assert fast == slow and len(fast) == 60
