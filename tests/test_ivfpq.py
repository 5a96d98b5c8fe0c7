"""IVF-PQ fused ANN (round 8): build → persist partitioned by cell →
reload → query. The value oracle is the driver row ``ann_ivfpq_topk``;
these tests pin the SCALE mechanics the oracle can't see:

  1. the probed-cell filter actually prunes the persisted index scan to
     the probed cells' files (static partition pruning on the literal
     ``cid IN (...)``),
  2. querying the LOADED index equals querying the in-memory one,
  3. the exact-refine path re-ranks by true L2,
  4. the driver-LUT funnel guard refuses oversized query batches.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lapis_silo_spark.catalog import Database
from lapis_silo_spark.functions.similarity import (
    build_ivfpq_index,
    ivfpq_topk,
    pq_codebooks_from_df,
    pq_codebooks_to_df,
)
from lapis_silo_spark.storage import load_version, save_version


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(120):
        vec = [((i * 31 + d * 17) % 101) / 101.0 for d in range(16)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


@pytest.fixture(scope="module")
def index(corpus):
    return build_ivfpq_index(
        corpus, "vec_id", "embedding", k_coarse=6, coarse_iterations=2,
        m=4, n_codes=8, train_rows=64, pq_iterations=3,
    )


@pytest.fixture(scope="module")
def loaded(spark, index, tmp_path_factory):
    cent, books, coded = index
    db = Database(spark)
    db.register_model("ivfpq_centroids", cent)
    db.register_model("ivfpq_codebooks", pq_codebooks_to_df(spark, books))
    db.register_table("ivfpq_codes", coded, primary_key="id")
    root = str(tmp_path_factory.mktemp("ivfpq_root"))
    save_version(db, root, table_partitions={"ivfpq_codes": ["cid"]})
    return load_version(spark, root)


def test_partitioned_index_scan_prunes_to_probed_cells(loaded):
    """The literal ``cid IN (...)`` must land as a PartitionFilter on the
    cid-partitioned index scan (static partition pruning — the plan-level
    pin of the 'query touches n_probe/K of the corpus' contract)."""
    codes = loaded.table("ivfpq_codes")
    all_cells = [r["cid"] for r in codes.select("cid").distinct().collect()]
    assert len(all_cells) > 2, "fixture must spread over >2 cells"
    probed = sorted(all_cells)[:2]
    out = codes.filter(F.col("cid").isin([int(c) for c in probed]))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and "cid" in pf_lines[0], plan
    # and the pruned scan returns exactly the probed cells' rows
    expected = codes.filter(F.col("cid").isin(probed)).count()
    per_cell = dict(
        (r["cid"], r["count"])
        for r in codes.groupBy("cid").count().collect()
    )
    assert out.count() == expected == sum(per_cell[c] for c in probed)


def test_loaded_index_equals_fresh(corpus, index, loaded):
    cent, books, coded = index
    queries = corpus.filter(F.col("vec_id") < 3)
    kw = dict(k=5, n_probe=2)
    fresh = ivfpq_topk(
        coded, cent, books, queries, "vec_id", "embedding", **kw
    )
    reloaded = ivfpq_topk(
        loaded.table("ivfpq_codes"),
        loaded.model("ivfpq_centroids"),
        pq_codebooks_from_df(loaded.model("ivfpq_codebooks")),
        queries, "vec_id", "embedding", **kw,
    )
    key = lambda t: (t[0], t[3])
    assert sorted(map(tuple, fresh.collect()), key=key) == sorted(
        map(tuple, reloaded.collect()), key=key
    )


def test_candidates_stay_inside_probed_cells(corpus, index):
    """Every returned neighbor's cell must be one of the query's probes —
    the defining IVF contract (candidates never leak across cells)."""
    import numpy as np

    from lapis_silo_spark.functions.clustering import _round_half_away

    cent, books, coded = index
    queries = corpus.filter(F.col("vec_id") < 3)
    out = ivfpq_topk(coded, cent, books, queries, "vec_id", "embedding",
                     k=8, n_probe=2).collect()
    assert out, "top-k must be non-empty"

    cells = {r["id"]: r["cid"] for r in coded.select("id", "cid").collect()}
    cent_rows = sorted((r["cid"], r["cvec"]) for r in cent.collect())
    cids = np.array([c for c, _ in cent_rows])
    cmat = np.array([v for _, v in cent_rows])
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    for q in queries.collect():
        qv = np.array(q["embedding"])
        cos = _round_half_away(cmat @ qv / (cnorm * np.sqrt(qv @ qv)), 6)
        probe = set(cids[np.lexsort((cids, -cos))[:2]].tolist())
        for r in out:
            if r["query_id"] == q["vec_id"]:
                assert cells[r["id"]] in probe


def test_refine_reranks_by_exact_l2(corpus, index):
    cent, books, coded = index
    queries = corpus.filter(F.col("vec_id") < 2)
    out = ivfpq_topk(
        coded, cent, books, queries, "vec_id", "embedding",
        k=5, n_probe=3, refine=20, corpus=corpus,
        id_col="vec_id", vec_col="embedding",
    ).collect()
    vecs = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    for r in out:
        qv, cv = vecs[r["query_id"]], vecs[r["id"]]
        exact = round(sum((a - b) ** 2 for a, b in zip(qv, cv)), 6)
        assert abs(r["dist"] - exact) < 1e-9
    # ranks are 1..k, strictly ordered by (dist, id) per query
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["dist"], r["id"]))
    for rows in by_q.values():
        rows.sort()
        assert [t[0] for t in rows] == list(range(1, len(rows) + 1))
        assert rows == sorted(rows, key=lambda t: (t[1], t[2], t[0]))


def test_index_append_encodes_at_ingest(spark, corpus, tmp_path):
    """Incremental ingest: new vectors are assigned+encoded with the LOADED
    (train-once) models and appended via append_version — the result must
    equal an index encoded in one pass with the same models (models are
    frozen; only the codes table grows)."""
    from lapis_silo_spark.functions.similarity import ivf_assign, pq_encode
    from lapis_silo_spark.storage import append_version

    first = corpus.filter(F.col("vec_id") < 80)
    rest = corpus.filter(F.col("vec_id") >= 80)
    cent, books, coded_first = build_ivfpq_index(
        first, "vec_id", "embedding", k_coarse=6, coarse_iterations=2,
        m=4, n_codes=8, train_rows=64, pq_iterations=3,
    )

    db = Database(spark)
    db.register_model("ivfpq_centroids", cent)
    db.register_model("ivfpq_codebooks", pq_codebooks_to_df(spark, books))
    db.register_table("ivfpq_codes", coded_first, primary_key="id")
    root = str(tmp_path / "append_root")
    save_version(db, root, table_partitions={"ivfpq_codes": ["cid"]})

    loaded = load_version(spark, root)
    loaded_books = pq_codebooks_from_df(loaded.model("ivfpq_codebooks"))
    batch = rest.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    new_coded = pq_encode(
        ivf_assign(batch, loaded.model("ivfpq_centroids"),
                   carry_cols=("vec",)),
        "id", "vec", loaded_books, carry_cols=("cid",),
    )
    append_version(loaded, root, "ivfpq_codes", new_coded)

    final = load_version(spark, root)
    # the append must PRESERVE the cid partitioning (round-9 ADVICE: a
    # layout-less re-save silently dropped it, losing static partition
    # pruning): probed-cell filters still land as PartitionFilters
    codes = final.table("ivfpq_codes")
    some_cell = codes.select("cid").first()["cid"]
    pruned = codes.filter(F.col("cid").isin([int(some_cell)]))
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and "cid" in pf_lines[0], plan

    queries = corpus.filter(F.col("vec_id") < 3)
    appended = ivfpq_topk(
        final.table("ivfpq_codes"), final.model("ivfpq_centroids"),
        pq_codebooks_from_df(final.model("ivfpq_codebooks")),
        queries, "vec_id", "embedding", k=5, n_probe=2,
    )
    # one-pass reference: the SAME frozen models over the full corpus
    all_coded = pq_encode(
        ivf_assign(
            corpus.select(F.col("vec_id").alias("id"),
                          F.col("embedding").cast("array<double>")
                          .alias("vec")),
            cent, carry_cols=("vec",)),
        "id", "vec", books, carry_cols=("cid",),
    )
    one_pass = ivfpq_topk(
        all_coded, cent, books, queries, "vec_id", "embedding",
        k=5, n_probe=2,
    )
    key = lambda t: (t[0], t[3])
    assert sorted(map(tuple, appended.collect()), key=key) == sorted(
        map(tuple, one_pass.collect()), key=key
    )


def test_query_funnel_guard(corpus, index):
    cent, books, coded = index
    with pytest.raises(ValueError, match="max_query_rows"):
        ivfpq_topk(
            coded, cent, books, corpus, "vec_id", "embedding",
            k=3, n_probe=1, max_query_rows=10,
        )
