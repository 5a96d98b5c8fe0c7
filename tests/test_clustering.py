

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

def test_kmeans_byte_limit_routes_wide_vectors_to_distributed(
    spark, monkeypatch
):
    """The driver-collect probe is dim-aware (round 12): a vector table
    whose rows fit the ROW limit but whose row BYTES exceed the byte limit
    must take the distributed loop — and produce identical output."""
    import lapis_silo_spark.functions.clustering as cl

    docs = spark.createDataFrame(
        [(i, [float((i * 7) % 13), float((i * 3) % 5), float(i % 4)])
         for i in range(60)],
        ["vid", "vec"],
    )
    fast = {
        (r["id"], r["cluster"])
        for r in cl.kmeans_assign(docs, "vid", "vec", k=4, iterations=2)
        .collect()
    }
    # 60 rows x 3 dims x 8 bytes = 1440 bytes; a 128-byte ceiling admits
    # only 5 rows -> the probe must refuse the driver path. The driver
    # path is _fit_centroids' only toPandas caller, so poisoning toPandas
    # proves the distributed loop ran.
    monkeypatch.setattr(cl, "KMEANS_DRIVER_BYTE_LIMIT", 128)
    from pyspark.sql import DataFrame

    def _poisoned(self):
        raise AssertionError(
            "driver collect ran despite the byte limit"
        )

    monkeypatch.setattr(DataFrame, "toPandas", _poisoned)
    routed = {
        (r["id"], r["cluster"])
        for r in cl.kmeans_assign(docs, "vid", "vec", k=4, iterations=2)
        .collect()
    }
    assert routed == fast and len(fast) == 60
