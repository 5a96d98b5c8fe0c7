"""Result-scoped cache hygiene: a long-lived server must hold no net-new
persisted RDDs after a query's result is consumed and dropped (VERDICT r2 #6).
"""

from __future__ import annotations

import gc

import pytest


def _persistent_rdd_ids(spark) -> set[int]:
    """Ids of currently-persisted RDDs.  Tests compare id SETS, not counts:
    a dropped DataFrame from an earlier test may be unpersisted by a GC that
    runs between our before/after probes, so "no net-new persisted RDDs"
    must tolerate OLD ids vanishing."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def test_scoped_persist_releases_on_result_drop(spark):
    from lapis_silo_spark.cache import scoped_persist

    df = spark.range(100)
    inter = spark.range(50)
    before = _persistent_rdd_ids(spark)
    result = scoped_persist(inter, df.join(inter, on="id"))
    assert result.count() == 50
    assert len(_persistent_rdd_ids(spark) - before) == 1
    del result
    gc.collect()
    assert _persistent_rdd_ids(spark) - before == set()


def test_scoped_persist_explicit_release_is_idempotent(spark):
    from lapis_silo_spark.cache import scoped_persist

    inter = spark.range(10)
    before = _persistent_rdd_ids(spark)
    result = scoped_persist(inter, inter.selectExpr("id * 2 AS x"))
    assert result.count() == 10
    result._silo_cache_guard.release()
    result._silo_cache_guard.release()
    assert _persistent_rdd_ids(spark) - before == set()


def test_minhash_lsh_pairs_leaves_no_persisted_rdds(spark):
    from lapis_silo_spark.functions.dedup import minhash_lsh_pairs

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy dog"),
        ("c", "completely different content in this one"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    before = _persistent_rdd_ids(spark)
    pairs = minhash_lsh_pairs(df, "id", "text", threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("a", "b") in got
    del pairs
    gc.collect()
    assert _persistent_rdd_ids(spark) - before == set()


def test_mutations_aggregate_adapted_leaves_no_persisted_rdds(spark):
    """The adapted-store branch materializes the genome-length coverage grid
    to the driver instead of persist()ing it — nothing new stays cached
    per-query (the store's own side-table caches are store-lifetime and
    created before the baseline count)."""
    from lapis_silo_spark.driver_queries import (
        adapted_genomic_db,
        genomic_db,
    )
    from lapis_silo_spark.operators import Pipeline
    from lapis_silo_spark.operators.mutations import mutations_aggregate

    sf_dir = "/root/testdata/sf0.001"
    genomic_db(spark, sf_dir)
    db = adapted_genomic_db(spark, sf_dir)
    # warm-up run: the store-lifetime side-table caches (marked persist() at
    # db build) only register their RDDs at first materialization — take the
    # baseline after they exist
    mutations_aggregate(Pipeline.scan(db, "default"), min_proportion=0.1).count()
    gc.collect()
    before = _persistent_rdd_ids(spark)
    out = mutations_aggregate(Pipeline.scan(db, "default"), min_proportion=0.1)
    assert out.count() > 0
    del out
    gc.collect()
    assert _persistent_rdd_ids(spark) - before == set()


def test_phylo_driver_budget_fails_fast(spark, monkeypatch):
    from lapis_silo_spark import operators
    from lapis_silo_spark.driver_queries import genomic_db
    from lapis_silo_spark.operators import Pipeline, phylo

    db = genomic_db(spark, "/root/testdata/sf0.001")
    monkeypatch.setattr(phylo, "MAX_DRIVER_TREE_NODES", 2)
    with pytest.raises(ValueError, match="driver materialization budget"):
        phylo.phylo_subtree(Pipeline.scan(db, "default"), "tree_node")
    with pytest.raises(ValueError, match="driver materialization budget"):
        phylo.most_recent_common_ancestor(
            Pipeline.scan(db, "default"), "tree_node"
        )


def test_get_filtered_keys_budget_fails_fast(spark, example_db):
    from lapis_silo_spark.api import SiloDatabase

    silo = SiloDatabase.__new__(SiloDatabase)
    silo.spark = spark
    silo.db = example_db
    silo._configs = {}
    with pytest.raises(ValueError, match="max_rows"):
        silo.get_filtered_keys("default", "isNotNull(primary_key)",
                               max_rows=1)
    keys = silo.get_filtered_keys("default", "isNotNull(primary_key)")
    assert len(keys) == 4


def test_minhash_dedup_clusters_leaves_no_persisted_rdds(spark):
    """The fused cluster operator persists the signature sketch (via
    minhash_lsh_pairs), per-round propagation label tables (released
    explicitly as rounds supersede each other), and the final labels
    (scoped to the result); after the result is consumed and dropped, no
    net-new persisted RDDs survive. The round-4 localCheckpoint
    formulation failed this test — PySpark never reclaims checkpoint RDDs
    even after the DataFrame is garbage-collected."""
    from lapis_silo_spark.functions.dedup import minhash_dedup_clusters

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different content in this one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    before = _persistent_rdd_ids(spark)
    clusters = minhash_dedup_clusters(df, "doc_id", "text", threshold=0.9)
    out = {r["id"]: r["cluster_id"] for r in clusters.collect()}
    assert out[1] == out[2] == 1 and out[3] == 3
    del clusters
    gc.collect()
    assert _persistent_rdd_ids(spark) - before == set()


def test_scoped_persist_stacks_guards(spark):
    """Two scoped_persist calls on one result keep BOTH intermediates
    persisted until the result dies (attribute overwrite used to drop the
    first guard and unpersist its frame immediately)."""
    import gc

    from lapis_silo_spark.cache import scoped_persist

    a = spark.range(5).selectExpr("id AS a")
    b = spark.range(5).selectExpr("id AS b")
    out = spark.range(5)
    out = scoped_persist(a, out)
    out = scoped_persist(b, out)
    assert a.is_cached and b.is_cached
    del out
    gc.collect()
    assert not a.is_cached and not b.is_cached
