"""Distributed BPE tokenizer training and encoding.

Byte-pair-encoding tokenizer training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") re-expressed as a Spark
aggregation loop — the operation a training-data pipeline runs ONCE over the
whole corpus before tokenizing it, so it has to scale with corpus size:

- The corpus never leaves the cluster.  Training state is the distinct-word
  frequency table (``groupBy word``, map-side combinable: O(corpus) scan,
  O(vocab) state — vocab is ~1e8 rows at web scale, trivially partitioned).
- Each merge step is ONE distributed aggregation over that table (explode
  adjacent symbol pairs, ``sum(freq)``), plus a 1-row ``TakeOrdered`` collect
  for the argmax.  n_merges steps = n_merges small jobs over O(vocab) rows;
  the 100 TB corpus is touched exactly once, at step 0.
- The learned merge table is the model artifact — inherently tiny (one row
  per merge), so materializing it on the driver is the point, not a leak.

The symbol-sequence representation is chosen so a merge is a plain literal
``replace`` that behaves IDENTICALLY in Spark and in ANSI SQL (the DuckDB
oracle replays training bit-for-bit with an unrolled CTE chain — see
``bpe_train_oracle_sql``):

    word "low"  ->  " l  o  w  </w> "

i.e. one leading/trailing space, symbols joined by TWO spaces.  Merging the
pair (a, b) is then ``replace(seq, ' a  b ', ' ab ')``:

- the single-space sentinels make the match symbol-boundary-exact (a symbol
  "xa" followed by "b" renders as ``xa  b`` — no `` a  b `` substring), and
- left-to-right non-overlapping semantics of ``replace`` in both engines
  reproduce greedy BPE exactly: " a  a  a " -> " aa  a ", not " aa  aa ".

Cross-word merges cannot occur when encoding whole documents as one
concatenated sequence: a learned pair's left symbol never contains the
word-end marker ``</w>`` in non-final position (nothing follows ``</w>``
inside a word during training, so such a pair is never counted).

No reference counterpart: LAPIS-SILO has no tokenizer; this is part of the
LLM-training-data operator surface the survey calls for beyond reference
parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lapis_silo_spark.functions.text import normalized

EOW = "</w>"
#: two-space symbol separator — see module docstring for why.
SEP = "  "


def _initial_word_seq(word: Column) -> Column:
    """`"low"` -> `" l  o  w  </w> "` (padded, double-separated symbols).

    ``(?s)``: Java's ``.`` skips line terminators (U+2028/U+2029/U+0085 —
    which survive the ASCII-only ``\\s+`` normalization into words), while
    RE2's ``.`` matches them; DOTALL aligns the two so a word containing
    U+2028 splits into the same symbols in Spark and in the DuckDB oracle.
    """
    return F.concat(
        F.lit(" "),
        F.regexp_replace(word, r"(?s)(.)", r"$1  "),
        F.lit(EOW),
        F.lit(" "),
    )


def _symbols(seq: Column) -> Column:
    """Padded sequence -> array of symbols."""
    return F.split(F.trim(seq), SEP)


def _adjacent_pairs(seq: Column) -> Column:
    """Array of ``struct(l, r)`` adjacent-symbol pairs (empty for 1-symbol
    sequences — ``F.sequence`` counts DOWN for start > stop, so guard it)."""
    arr = _symbols(seq)
    n = F.size(arr)
    idx = F.when(n > 1, F.sequence(F.lit(1), n - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(arr, i).alias("l"),
            F.element_at(arr, i + F.lit(1)).alias("r"),
        ),
    )


def merge_replace(seq: Column, left: str, right: str) -> Column:
    """Apply one BPE merge to a padded symbol sequence (literal replace)."""
    return F.replace(
        seq,
        F.lit(f" {left}{SEP}{right} "),
        F.lit(f" {left}{right} "),
    )


def word_frequency_table(
    docs: DataFrame, text_col: str, *, lowercase: bool = True
) -> DataFrame:
    """Distinct-word frequencies with initial symbol sequences.

    The one pass over the corpus; everything after operates on O(vocab)
    rows.  ``normalized`` (lowercase + collapsed whitespace) keys the words
    exactly like every other text operator in this package.
    """
    txt = normalized(text_col) if lowercase else F.trim(F.col(text_col))
    words = docs.select(F.explode(F.split(txt, " ")).alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn("seq", _initial_word_seq(F.col("word")))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str,
    *,
    n_merges: int = 12,
    min_pair_freq: int = 2,
    lowercase: bool = True,
) -> list[dict]:
    """Learn up to ``n_merges`` BPE merges over the corpus.

    Returns the merge table as a list of dicts ``{step, left_sym, right_sym,
    merged, pair_freq}`` — the model artifact (one row per merge, inherently
    driver-sized).  Ties on pair frequency break lexicographically on
    (left, right), so training is deterministic regardless of partitioning.
    Stops early when no pair reaches ``min_pair_freq``.
    """
    words = word_frequency_table(docs, text_col, lowercase=lowercase)
    # O(vocab) state, re-aggregated once per merge step: persist the base —
    # each step's withColumn derivation reuses the cached ancestor scan.
    base = words.persist()
    words = base
    try:
        merges: list[dict] = []
        for step in range(1, n_merges + 1):
            pair_counts = (
                words.select(
                    F.explode(_adjacent_pairs(F.col("seq"))).alias("p"),
                    "freq",
                )
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("freq").cast("bigint").alias("cnt"))
                .where(F.col("cnt") >= min_pair_freq)
            )
            best = (
                pair_counts.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
            )
            if not best:
                break
            left, right, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
            merges.append(
                {
                    "step": step,
                    "left_sym": left,
                    "right_sym": right,
                    "merged": left + right,
                    "pair_freq": int(cnt),
                }
            )
            words = words.withColumn(
                "seq", merge_replace(F.col("seq"), left, right)
            )
        return merges
    finally:
        base.unpersist()


def bpe_train_df(
    docs: DataFrame,
    text_col: str,
    *,
    n_merges: int = 12,
    min_pair_freq: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """``bpe_train`` with the merge table returned as a DataFrame."""
    spark = docs.sparkSession
    merges = bpe_train(
        docs,
        text_col,
        n_merges=n_merges,
        min_pair_freq=min_pair_freq,
        lowercase=lowercase,
    )
    schema = (
        "step int, left_sym string, right_sym string, merged string,"
        " pair_freq bigint"
    )
    return spark.createDataFrame(merges, schema=schema)


def bpe_doc_seq(text_col: str | Column, *, lowercase: bool = True) -> Column:
    """Whole document as ONE padded symbol sequence (per-word sequences
    concatenated — safe, see module docstring on cross-word merges)."""
    txt = (
        normalized(text_col)
        if lowercase
        else F.trim(text_col if isinstance(text_col, Column) else F.col(text_col))
    )
    toks = F.split(txt, " ")
    return F.array_join(F.transform(toks, _initial_word_seq), "")


def bpe_encode_count(
    text_col: str | Column,
    merges: list[dict] | list[tuple[str, str]],
    *,
    lowercase: bool = True,
) -> Column:
    """Tokens-after-BPE count for a document, applying ``merges`` in order.

    A pure JVM expression (chained literal replaces + one split), so it
    pipelines with the scan — encoding 100 TB is embarrassingly parallel
    with zero shuffle.
    """
    seq = bpe_doc_seq(text_col, lowercase=lowercase)
    for m in merges:
        left, right = (m["left_sym"], m["right_sym"]) if isinstance(m, dict) else m
        seq = merge_replace(seq, left, right)
    return F.size(_symbols(seq)).cast("bigint")


# ---------------------------------------------------------------------------
# DuckDB oracle replay (unrolled CTE chain)
# ---------------------------------------------------------------------------

_NORM_SQL = "lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"

_W0_SQL = """w0 AS MATERIALIZED (
    SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
           ' ' || regexp_replace(w, '(.)', '\\1  ', 'g') || '</w> ' AS seq
    FROM (SELECT unnest(string_split({norm}, ' ')) AS w FROM {table})
    GROUP BY w)"""


def _step_sql(i: int, min_pair_freq: int) -> str:
    prev = f"w{i - 1}"
    return f"""p{i} AS MATERIALIZED (
    SELECT pr.l AS l, pr.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
    FROM (SELECT freq,
                 unnest(list_transform(
                     generate_series(1, len(syms) - 1),
                     i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS pr
          FROM (SELECT freq, string_split(trim(seq), '  ') AS syms
                FROM {prev}))
    GROUP BY 1, 2 HAVING sum(freq) >= {min_pair_freq}),
b{i} AS MATERIALIZED (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
w{i} AS MATERIALIZED (
    SELECT word, freq,
           CASE WHEN b.l IS NULL THEN seq
                ELSE replace(seq, ' ' || b.l || '  ' || b.r || ' ',
                             ' ' || b.l || b.r || ' ') END AS seq
    FROM {prev} LEFT JOIN b{i} b ON TRUE)"""


def bpe_train_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    n_merges: int = 12,
    min_pair_freq: int = 2,
) -> str:
    """ANSI-SQL replay of ``bpe_train`` for DuckDB: the same word-frequency
    table, then one (pair-count, argmax, replace) CTE triple per merge step,
    unioned into the merge table.  An exhausted corpus makes later steps
    no-ops (LEFT JOIN keeps seq; the step emits no merge row)."""
    norm = _NORM_SQL.format(col=text_col)
    ctes = [_W0_SQL.format(norm=norm, table=table)]
    ctes += [_step_sql(i, min_pair_freq) for i in range(1, n_merges + 1)]
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, l AS left_sym, r AS right_sym,"
        f" l || r AS merged, cnt AS pair_freq FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM (\n{unions}\n) ORDER BY step"
    )


def bpe_encode_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n_merges: int = 12,
    min_pair_freq: int = 2,
) -> str:
    """ANSI-SQL replay of training + whole-corpus encoding: the merge CTEs
    from ``bpe_train_oracle_sql`` followed by one document-sequence CTE per
    step applying the same literal replace, then per-group token totals."""
    norm = _NORM_SQL.format(col=text_col)
    ctes = [_W0_SQL.format(norm=norm, table=table)]
    ctes += [_step_sql(i, min_pair_freq) for i in range(1, n_merges + 1)]
    ctes.append(
        f"""d0 AS MATERIALIZED (
    SELECT {id_col} AS id, {group_col} AS grp,
           array_to_string(list_transform(
               string_split({norm}, ' '),
               w -> ' ' || regexp_replace(w, '(.)', '\\1  ', 'g')
                    || '</w> '), '') AS seq
    FROM {table})"""
    )
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
    SELECT id, grp,
           CASE WHEN b.l IS NULL THEN seq
                ELSE replace(seq, ' ' || b.l || '  ' || b.r || ' ',
                             ' ' || b.l || b.r || ' ') END AS seq
    FROM d{i - 1} LEFT JOIN b{i} b ON TRUE)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT grp AS {group_col}, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(trim(seq), '  '))) AS BIGINT)
         AS bpe_tokens
FROM d{n_merges} GROUP BY 1"""
    )
