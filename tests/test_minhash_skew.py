"""Skew-hardening of the MinHash LSH band join (round-5 VERDICT #2):

1. The band self-join must shuffle NARROW rows (id, band, band_hash) —
   signatures re-join by id after candidate dedup, never ride through the
   band exchange (the round-2 embeddings lesson, applied to minhash).
2. ``max_band_freq`` bounds the O(bucket²) exposure: a slice of
   near-identical-but-not-identical docs (one char of drift defeats the
   exact-twin digest) collides in every band; the cap skips those buckets
   while pairs with at least one non-hot colliding band survive.
"""

import re

import pytest
from pyspark.sql import functions as F

from lapis_silo_spark.functions import dedup as fdedup


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _plan_sections(plan: str) -> list[str]:
    """Split a formatted plan into per-node detail sections."""
    return re.split(r"\n\n", plan)


BASE_A = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "jubilant zebras quietly browse the ancient library stacks reading "
    "entirely too many papers about large scale data deduplication"
)
BASE_B = (
    "completely different subject matter here involving maritime "
    "navigation charts lighthouse maintenance schedules and the annual "
    "migration patterns of arctic terns across the northern hemisphere"
)


def _near_twin_corpus(spark, n_hot: int = 24):
    """n_hot one-char variants of BASE_A (a hot LSH slice that survives the
    exact-twin digest) + 2 variants of BASE_B (the control pair)."""
    rows = []
    for i in range(n_hot):
        drift = BASE_A[:40] + chr(ord("a") + (i % 26)) + BASE_A[41:]
        rows.append((i, drift if i else BASE_A))
    rows.append((1000, BASE_B))
    rows.append((1001, BASE_B[:60] + "x" + BASE_B[61:]))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_band_join_shuffles_ids_only(spark):
    df = _near_twin_corpus(spark)
    pairs = fdedup.minhash_lsh_pairs(df, "doc_id", "text")
    plan = _formatted_plan(pairs)
    # The band join's exchange is a band-keyed shuffle OR — now that the
    # persisted signature table exposes its (tiny) size — a broadcast of
    # the narrow band projection; the contract under test is the same
    # either way: whatever moves for the band join carries ids + band
    # keys, never the wide sig arrays.
    band_exchanges = [
        s for s in _plan_sections(plan)
        if "Exchange" in s and "band_hash" in s
        and ("hashpartitioning" in s or "BroadcastExchange" in s)
    ]
    assert band_exchanges, "expected a band-keyed exchange in the plan"
    for section in band_exchanges:
        assert not re.search(r"\bsig#", section), (
            "band exchange must not carry signatures:\n" + section
        )


def test_max_band_freq_caps_hot_bucket(spark):
    df = _near_twin_corpus(spark)
    uncapped = fdedup.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.8
    ).collect()
    capped = fdedup.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.8, max_band_freq=8
    ).collect()

    hot_unc = [r for r in uncapped if r["id_a"] < 1000 and r["id_b"] < 1000]
    hot_cap = [r for r in capped if r["id_a"] < 1000 and r["id_b"] < 1000]
    # the hot slice is quadratic uncapped…
    assert len(hot_unc) > 100
    # …and collapses under the cap (every hot-slice band bucket holds ~all
    # 24 variants, far above max_band_freq=8)
    assert len(hot_cap) < len(hot_unc) / 4
    # recall contract: the control pair's buckets hold 2 rows — kept intact
    control = {(r["id_a"], r["id_b"]) for r in capped}
    assert (1000, 1001) in control
    # capped output is a subset of the exact output with identical jaccards
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in uncapped}
    for r in capped:
        assert exact[(r["id_a"], r["id_b"])] == r["jaccard"]


def test_max_band_freq_in_cluster_path(spark):
    df = _near_twin_corpus(spark)
    out = fdedup.minhash_dedup_clusters(
        df, "doc_id", "text", threshold=0.8, max_band_freq=8
    ).collect()
    # O(docs) output survives the cap, control pair still clusters together
    assert len(out) == df.count()
    by_id = {r["id"]: r["cluster_id"] for r in out}
    assert by_id[1000] == by_id[1001] == 1000


def test_incremental_minhash_reports_signatureless_rows(spark):
    """Rows with NULL text or text shorter than k shingle chars have no
    signature; they must still get a 'kept' verdict (round-5 ADVICE)."""
    base = spark.createDataFrame(
        [(1, BASE_A), (2, BASE_B)], ["doc_id", "text"]
    )
    state = fdedup.minhash_band_state(base, "doc_id", "text")
    batch = spark.createDataFrame(
        [(10, BASE_A), (11, None), (12, "abc"), (13, "fresh new content "
          "that resembles neither base document in any meaningful way at all")],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: r["status"]
        for r in fdedup.incremental_minhash_dedup(
            batch, state, "doc_id", "text"
        ).collect()
    }
    assert set(out) == {10, 11, 12, 13}
    assert out[10] == "dup_of_base"
    assert out[11] == "kept" and out[12] == "kept" and out[13] == "kept"


def test_incremental_minhash_band_cap(spark):
    """The cap also guards the append path: a batch of near-twins colliding
    with a hot base slice stays bounded, and every row still gets a verdict."""
    hot = _near_twin_corpus(spark, n_hot=24).filter(F.col("doc_id") < 1000)
    state = fdedup.minhash_band_state(hot, "doc_id", "text")
    batch = spark.createDataFrame(
        [(500, BASE_A[:40] + "Z" + BASE_A[41:]), (501, BASE_B)],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: r["status"]
        for r in fdedup.incremental_minhash_dedup(
            batch, state, "doc_id", "text", max_band_freq=8
        ).collect()
    }
    assert set(out) == {500, 501}
    # the hot-slice collision was skipped by the cap → classified kept
    assert out[500] == "kept"
    assert out[501] == "kept"


def test_default_band_cap_is_noop_on_benign_corpus(spark):
    """Round-6 default: the composed entry points cap hot buckets at
    DEFAULT_MAX_BAND_FREQ out of the box. On a benign corpus (no bucket
    anywhere near the cap) the capped default must be byte-equivalent to
    the exact (max_band_freq=None) form — the documented recall contract."""
    from lapis_silo_spark.functions import dedup as fdedup

    assert fdedup.DEFAULT_MAX_BAND_FREQ >= 1024
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    capped = sorted(map(tuple, fdedup.minhash_dedup_clusters(
        docs, "doc_id", "text", threshold=0.8, hash_fn=fdedup.hash32,
    ).collect()))
    exact = sorted(map(tuple, fdedup.minhash_dedup_clusters(
        docs, "doc_id", "text", threshold=0.8, hash_fn=fdedup.hash32,
        max_band_freq=None,
    ).collect()))
    assert capped == exact and capped


def test_lsh_low_structure_warning(spark):
    """lsh_bucket_topk warns on structureless corpora (pointing at trained
    IVF) and stays silent on clustered ones — round-5 VERDICT #6."""
    import warnings

    import numpy as np

    from lapis_silo_spark.functions import similarity as fsim

    rng = np.random.RandomState(7)
    flat = rng.standard_normal((400, 64))
    flat /= np.linalg.norm(flat, axis=1, keepdims=True)
    cents = rng.standard_normal((4, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    clustered = cents[rng.randint(0, 4, 400)] + 0.05 * rng.standard_normal(
        (400, 64)
    )
    clustered /= np.linalg.norm(clustered, axis=1, keepdims=True)

    def df_of(mat):
        return spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
            "vec_id long, embedding array<double>",
        )

    corpus = df_of(flat)
    with pytest.warns(RuntimeWarning, match="ivf_topk_with_centroids"):
        fsim.lsh_bucket_topk(
            corpus, corpus.limit(2), "vec_id", "embedding",
            "vec_id", "embedding", warn_low_structure=True,
        )

    corpus_c = df_of(clustered)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        fsim.lsh_bucket_topk(
            corpus_c, corpus_c.limit(2), "vec_id", "embedding",
            "vec_id", "embedding", warn_low_structure=True,
        )

    # the default is OFF — no eager probe job, no warning even on the
    # structureless corpus (round-5 ADVICE: lazy-plan contract preserved)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        fsim.lsh_bucket_topk(
            corpus, corpus.limit(2), "vec_id", "embedding",
            "vec_id", "embedding",
        )
