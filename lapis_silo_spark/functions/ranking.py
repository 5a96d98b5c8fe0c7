"""Lexical relevance ranking (BM25) over a document corpus.

A training-data pipeline uses this for retrieval-style curation: rank the
corpus against a probe query (dedup of boilerplate, topical sampling,
eval-set neighborhood checks). The reference engine has no free-text
ranking at all (SURVEY §2.5) — this is Spark-superset surface.

Scale shape: for a query of q terms, per-document term frequencies are q
``size(filter(tokens, ...))`` expressions — whole-stage-codegen'd, NO
explode and NO shuffle on the corpus. The only aggregation is ONE scalar
row (corpus size, average doc length, per-term document frequencies) that
broadcasts back via crossJoin, and the final top-k is a
``TakeOrderedAndProject``. Total: one pass over the corpus + one tiny agg —
the same plan at 5k docs and 5B docs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lapis_silo_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 against ``query_terms``.

    Returns ``(id, bm25)`` with the score rounded to 6 decimals; ordering is
    (rounded score desc, id) so the cut at ``k`` is deterministic across
    engines. Uses the standard Robertson idf ``ln(1 + (N - df + 0.5) /
    (df + 0.5))`` (always positive).
    """
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    terms = [t.lower() for t in query_terms]

    toks = tokens(text_col)

    def _tf(term: str):
        # NB: a single-parameter lambda — PySpark dispatches two-parameter
        # lambdas to the (element, index) HOF form, so default-arg capture
        # (lambda x, t=t: ...) would bind the term to the array index
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = {f"_tf{i}": _tf(t) for i, t in enumerate(terms)}
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("_dl"),
        *[c.alias(n) for n, c in tf_cols.items()],
    )

    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )

    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        df_t = F.col(f"_df{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / denom
    return (
        scored.select("id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("id"))
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF — the keyword signal a curation
    pipeline uses for topical sampling and near-boilerplate detection.

    Returns ``(id, term, tf, score)`` with sklearn-style smoothed idf
    ``ln((1 + N) / (1 + df)) + 1`` and the score rounded to 6 decimals.
    The cut at ``k`` orders by (unrounded score desc, term asc) so it is
    deterministic across engines.

    Scale shape: tokens explode once; term frequencies are a ``(id, term)``
    hash aggregation (map-side combined); document frequency is a
    ``groupBy(term).count()`` — partial aggregation combines a hot term
    map-side, and the join back onto ``tf`` has one build row per term so
    AQE can split a skewed probe side. (A ``count() OVER (PARTITION BY
    term)`` window would funnel every posting of a web-scale-hot term —
    a stopword — into ONE task; see docs/WINDOW_AUDIT.md.) The corpus size
    is a single scalar row broadcast back via crossJoin (same device as
    :func:`bm25_topk`); the per-document top-k is a window rank over ``id``
    (bounded by per-document distinct terms). Nothing pairwise, nothing
    driver-side.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    with_df = tf.join(dfreq, on="term", how="inner")
    n_row = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = with_df.crossJoin(F.broadcast(n_row)).withColumn(
        "score",
        F.col("tf")
        * (
            F.log(
                (F.lit(1.0) + F.col("_n"))
                / (F.lit(1.0) + F.col("_df"))
            )
            + F.lit(1.0)
        ),
    )
    w_doc = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_doc))
        .filter(F.col("rn") <= k)
        .select("id", "term", "tf", F.round("score", 6).alias("score"))
    )


def tfidf_oracle_sql(
    table: str, id_col: str, text_col: str, k: int = 3
) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` — identical tokenization,
    idf formula, rounding, and (score desc, term) tie-break."""
    norm = (
        f"regexp_split_to_array(lower(regexp_replace(trim({text_col}), "
        f"'\\s+', ' ', 'g')), ' ')"
    )
    return f"""WITH toks AS (
          SELECT {id_col} AS id, unnest({norm}) AS term FROM {table}),
        tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS dfreq
                FROM tf),
        n AS (SELECT count(*) AS n FROM {table}),
        scored AS (
          SELECT id, term, tf,
                 tf * (ln((1.0 + n.n) / (1.0 + dfreq)) + 1.0) AS score
          FROM wdf, n),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY id ORDER BY score DESC, term) AS rn
          FROM scored)
       SELECT id AS {id_col}, term, CAST(tf AS BIGINT) AS tf,
              round(score, 6) AS score
       FROM ranked WHERE rn <= {k}"""


def bm25_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """The DuckDB-runnable twin of :func:`bm25_topk` (same formula, same
    rounding, same deterministic cut) — generated so the registered query
    and its oracle can never drift."""
    terms = [t.lower() for t in query_terms]
    norm = (
        f"regexp_split_to_array(lower(regexp_replace(trim({text_col}), "
        f"'\\s+', ' ', 'g')), ' ')"
    )
    tf_exprs = ",\n              ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ", ".join(
        f"sum((tf{i} > 0)::INT) AS df{i}" for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"(ln(1 + (s.n - s.df{i} + 0.5) / (s.df{i} + 0.5)) * d.tf{i} "
        f"* {k1 + 1.0!r} / (d.tf{i} + {k1!r} * ({1.0 - b!r} "
        f"+ {b!r} * d.dl / s.avgdl)))"
        for i in range(len(terms))
    )
    return f"""WITH d AS (
          SELECT {id_col} AS id, len(t) AS dl, {tf_exprs}
          FROM (SELECT {id_col}, {norm} AS t FROM {table})),
        s AS (SELECT count(*) AS n, avg(dl) AS avgdl, {df_exprs} FROM d)
       SELECT id, round({score_terms}, 6) AS bm25
       FROM d, s
       ORDER BY bm25 DESC, id
       LIMIT {k}"""
