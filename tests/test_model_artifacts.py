"""Model-artifact persistence in the versioned lifecycle (round 8).

Train-once artifacts — k-means centroid tables, PQ codebooks, BPE merge
tables — version with the data they were trained on, exactly like the
minhash band state and the lineage closures: ``Database.register_model``
→ ``storage.save_version`` writes ``versions/<v>/models/<name>`` +
manifest entry → ``storage.load_version`` restores it. These tests pin

  1. the save/load round-trip is value-exact (parquet round-trips doubles
     and strings bit-for-bit),
  2. the downstream consumer (IVF probe, PQ encode, BPE encode) produces
     IDENTICAL output from the loaded artifact and the fresh one,
  3. pre-round-8 manifests (no "models" key) still load.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from lapis_silo_spark.catalog import Database
from lapis_silo_spark.storage import (
    latest_version,
    load_version,
    save_version,
)


@pytest.fixture(scope="module")
def vectors(spark):
    """48 deterministic 8-dim vectors (hash-derived, no RNG)."""
    rows = []
    for i in range(48):
        vec = [((i * 37 + d * 11) % 97) / 97.0 for d in range(8)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog and a mat"),
        (4, "low lower lowest newer newest"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _save_models(spark, tmp_path, **models) -> Database:
    db = Database(spark)
    for name, (df, meta) in models.items():
        db.register_model(name, df, meta=meta)
    root = str(tmp_path / "model_root")
    save_version(db, root)
    return load_version(spark, root)


def test_kmeans_centroids_roundtrip_and_loaded_probe(spark, tmp_path, vectors):
    from lapis_silo_spark.functions.clustering import kmeans_centroids
    from lapis_silo_spark.functions.similarity import ivf_topk_with_centroids

    cent = kmeans_centroids(vectors, "vec_id", "embedding", k=4, iterations=3)
    loaded_db = _save_models(
        spark, tmp_path, ivf_centroids=(cent, {"kind": "kmeans_centroids", "k": 4})
    )
    loaded = loaded_db.model("ivf_centroids")

    assert loaded_db.model_meta["ivf_centroids"]["kind"] == "kmeans_centroids"
    fresh_rows = sorted(cent.collect(), key=lambda r: r["cluster"])
    load_rows = sorted(loaded.collect(), key=lambda r: r["cluster"])
    assert [tuple(r) for r in fresh_rows] == [tuple(r) for r in load_rows]

    queries = vectors.filter(F.col("vec_id") < 3)
    kw = dict(cid_col="cluster", cvec_col="cvec", k=5, n_probe=2)
    fresh_out = ivf_topk_with_centroids(
        vectors, queries, "vec_id", "embedding", "vec_id", "embedding",
        cent, **kw,
    )
    loaded_out = ivf_topk_with_centroids(
        vectors, queries, "vec_id", "embedding", "vec_id", "embedding",
        loaded, **kw,
    )
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, fresh_out.collect()), key=lambda t: (t[0], t[3])) \
        == sorted(map(tuple, loaded_out.collect()), key=lambda t: (t[0], t[3]))


def test_pq_codebooks_roundtrip_and_loaded_encode(spark, tmp_path, vectors):
    import numpy as np

    from lapis_silo_spark.functions.similarity import (
        pq_codebooks_from_df,
        pq_codebooks_to_df,
        pq_encode,
        pq_train_codebooks,
    )

    books = pq_train_codebooks(
        vectors, "vec_id", "embedding", m=2, n_codes=4, train_rows=32,
        iterations=3,
    )
    bdf = pq_codebooks_to_df(spark, books)
    loaded_db = _save_models(
        spark, tmp_path,
        pq_codebooks=(bdf, {"kind": "pq_codebooks", "m": 2, "n_codes": 4}),
    )
    restored = pq_codebooks_from_df(loaded_db.model("pq_codebooks"))
    assert restored.shape == books.shape
    assert np.array_equal(restored, books)

    fresh = {r["id"]: list(r["codes"])
             for r in pq_encode(vectors, "vec_id", "embedding", books).collect()}
    loaded = {r["id"]: list(r["codes"])
              for r in pq_encode(vectors, "vec_id", "embedding", restored).collect()}
    assert fresh == loaded


def test_pq_codebooks_from_df_rejects_incomplete(spark):
    from lapis_silo_spark.functions.similarity import (
        pq_codebooks_from_df,
        pq_codebooks_to_df,
    )
    import numpy as np

    books = np.arange(2 * 3 * 4, dtype=np.float64).reshape(2, 3, 4)
    bdf = pq_codebooks_to_df(spark, books).filter(
        ~((F.col("subspace") == 1) & (F.col("code") == 2))
    )
    with pytest.raises(ValueError, match="expected 6 rows, got 5"):
        pq_codebooks_from_df(bdf)
    with pytest.raises(ValueError, match="empty"):
        pq_codebooks_from_df(bdf.limit(0))


def test_bpe_merges_roundtrip_and_loaded_encode(spark, tmp_path, docs):
    from lapis_silo_spark.functions.tokenizer import (
        bpe_encode_count,
        bpe_merges_from_df,
        bpe_train,
        bpe_train_df,
    )

    merges = bpe_train(docs, "text", n_merges=8, min_pair_freq=2)
    mdf = bpe_train_df(docs, "text", n_merges=8, min_pair_freq=2)
    loaded_db = _save_models(
        spark, tmp_path, bpe_merges=(mdf, {"kind": "bpe_merges", "n_merges": 8})
    )
    restored = bpe_merges_from_df(loaded_db.model("bpe_merges"))
    assert restored == merges

    fresh = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", bpe_encode_count("text", merges).alias("n")).collect()}
    loaded = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", bpe_encode_count("text", restored).alias("n")).collect()}
    assert fresh == loaded


def test_models_survive_append_version(spark, tmp_path, vectors, docs):
    """append_version re-saves through save_version — registered models must
    carry into the NEW version directory."""
    from lapis_silo_spark.storage import append_version

    db = Database(spark)
    db.register_table("t", docs, primary_key="doc_id")
    db.register_model("m", vectors.limit(2), meta={"kind": "demo"})
    root = str(tmp_path / "append_root")
    v1 = save_version(db, root)

    more = spark.createDataFrame([(9, "appended row")], "doc_id int, text string")
    v2 = append_version(db, root, "t", more)
    assert v2 != v1

    reloaded = load_version(spark, root)  # latest == v2
    assert latest_version(root) == v2
    assert reloaded.model("m").count() == 2
    assert reloaded.model_meta["m"] == {"kind": "demo"}


def test_pre_round8_manifest_without_models_loads(spark, tmp_path, docs):
    db = Database(spark)
    db.register_table("t", docs, primary_key="doc_id")
    root = str(tmp_path / "compat_root")
    version = save_version(db, root)

    mpath = os.path.join(root, "versions", version, "manifest.json")
    with open(mpath) as fh:
        manifest = json.load(fh)
    manifest.pop("models", None)
    with open(mpath, "w") as fh:
        json.dump(manifest, fh)

    reloaded = load_version(spark, root)
    assert reloaded.models == {}
    assert reloaded.table("t").count() == docs.count()
