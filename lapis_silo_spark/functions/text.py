"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All pure ``pyspark.sql.functions`` expressions — whole-stage-codegen'd JVM
execution, no UDFs, trivially scalable: each is a narrow per-row map over the
``text`` column, so it pipelines with the Parquet scan (no shuffle at all
until an aggregation is stacked on top).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Function-word marker sets for the n-gram/heuristic language ID. Tiny on
# purpose: broadcastable as literals straight into the plan.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans"],
    "es": ["el", "la", "y", "los", "es", "un", "una", "que", "en", "por"],
}

PUNCT_CLASS = "[.,;:!?]"


def normalized(col: str | Column) -> Column:
    """Lowercase + collapsed whitespace — the canonical text form every
    dedup/fingerprint operator keys on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of the normalized text."""
    return F.split(normalized(col), " ")


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish token estimate: count of word/number/punctuation chunks via the
    classic GPT-2-style pre-tokenizer regex shape (letters runs, digit runs,
    single punctuation), all JVM-side regexp_count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def mean_token_length(col: str | Column) -> Column:
    toks = tokens(col)
    return F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(col: str | Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords if stopwords is not None else LANG_MARKERS["en"]
    toks = tokens(col)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(sw))
    )
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PUNCT_CLASS)) / F.greatest(F.length(c), F.lit(1))


def quality_score(col: str | Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    punctuation sanity + mean word length band — the standard cheap pre-filter
    stack of web-scale corpus cleaning pipelines."""
    ntok = token_count(col).cast("double")
    length_component = F.least(ntok / F.lit(100.0), F.lit(1.0))
    stop_component = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(col) * 10.0, F.lit(1.0))
    mean_len = mean_token_length(col)
    len_band = F.when((mean_len >= 3.0) & (mean_len <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return (
        length_component * 0.25
        + stop_component * 0.25
        + punct_component * 0.25
        + len_band * 0.25
    )


def lang_scores(col: str | Column) -> dict[str, Column]:
    toks = tokens(col)
    denom = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers))) / denom
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: str | Column) -> Column:
    """Heuristic language ID: argmax of marker-word ratios; ``und`` when no
    marker matches. Deterministic ties resolve in LANG_MARKERS order."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    # Fold left so the FIRST language in LANG_MARKERS wins ties.
    for lang in reversed(list(scores)):
        score = scores[lang]
        best_lang = F.when(score >= F.greatest(best_score, F.lit(1e-12)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, score)
    return best_lang


def doc_fingerprint(col: str | Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(col))


def char_shingles(col: str | Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text (array<string>)."""
    t = normalized(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
            lambda i: F.substr(t, i, F.lit(k)),
        )
    )


def word_ngrams(col: str | Column, n: int = 3) -> Column:
    """Space-joined word n-grams of the normalized text (array<string>).

    Guarded against short documents: Spark's ``sequence(a, b)`` DESCENDS when
    ``b < a``, so the window count is clamped to zero explicitly — a doc with
    fewer than ``n`` tokens yields an empty array, not reversed garbage.
    """
    toks = tokens(col)
    windows = F.size(toks) - (n - 1)
    return F.when(windows < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(windows, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def word_ngram_rows(
    df,
    cols: list,
    text_col: str,
    n: int = 3,
    distinct: bool = False,
) -> "DataFrame":
    """Arrow-batched replacement for
    ``df.select(*cols, F.explode(word_ngrams(text_col, n)).alias("gram"))``
    (and, with ``distinct=True``, the ``explode(array_distinct(...))``
    form): one zero-shuffle ``mapInPandas`` pass per input partition.

    Why not the expression form (round 11, guide §4): ``word_ngrams``'s
    ``transform`` lambda re-evaluates its ``slice(split(normalized(text)))``
    subtree PER ARRAY ELEMENT in interpreted mode — O(len) text work ×
    O(len) windows = O(len²) per document. Measured on the sf0.1 corpus
    (265 704 bigrams): 3.9 s noop wall for the expression pipeline vs
    0.5-0.7 s for this pass, identical output multiset.

    ``cols`` is a list of ``(alias, Column)`` passthroughs evaluated
    JVM-side before the boundary (only those columns plus the text cross
    it). Semantics replicated exactly and test-pinned
    (``tests/test_text.py::test_word_ngram_rows_matches_expression_path``):
    tokens are ``tokens()``'s ASCII-space-trim + Java-``\\s``-collapse +
    lowercase + single-space split; documents with fewer than ``n`` tokens
    emit nothing; a NULL text emits ONE empty-string gram (the expression
    path's ``concat_ws`` over a null slice — load-bearing for value parity
    with the committed oracles, do not "fix" it here).
    """
    import pandas as pd
    from pyspark.sql import types as T

    from lapis_silo_spark.functions.dedup import _spread

    named = [(a, c) for a, c in cols]
    base = _spread(
        df, *[c.alias(a) for a, c in named],
        (F.col(text_col) if isinstance(text_col, str) else text_col)
        .alias("_txt"),
    )
    passthrough = [f for f in base.schema.fields if f.name != "_txt"]
    out_schema = T.StructType(
        passthrough + [T.StructField("gram", T.StringType())]
    )
    names = [f.name for f in passthrough]
    nn, want_distinct = n, distinct

    def gen(it):
        import re

        ws = re.compile(r"[\t\n\x0b\f\r ]+")
        for pdf in it:
            out = {name: [] for name in names}
            grams = []
            passvals = [pdf[name] for name in names]
            for row in zip(pdf["_txt"], *passvals):
                txt = row[0]
                if txt is None:
                    gs = [""]
                else:
                    tk = ws.sub(" ", txt.strip(" ")).lower().split(" ")
                    m = len(tk) - (nn - 1)
                    if m < 1:
                        continue
                    if nn == 1:
                        gs = tk
                    else:
                        gs = [
                            " ".join(tk[p: p + nn]) for p in range(m)
                        ]
                if want_distinct:
                    gs = list(dict.fromkeys(gs))
                for name, v in zip(names, row[1:]):
                    out[name].extend([v] * len(gs))
                grams.extend(gs)
            out["gram"] = grams
            yield pd.DataFrame(out, columns=names + ["gram"])

    return base.mapInPandas(gen, out_schema)


def _run_length_char_stats(grams: Column) -> Column:
    """Fold a SORTED copy of ``grams`` into ``struct(top, dup)``:

    - ``top`` = max over distinct grams of occurrences × gram length
      (characters covered by the most repeated n-gram);
    - ``dup`` = sum over grams occurring more than once of occurrences ×
      gram length (characters covered by any duplicated n-gram).

    Sorting makes equal grams adjacent, so both reduce to run-length
    accumulation inside ONE ``F.aggregate`` — per-row, JVM-side, zero
    shuffle, versus the naive explode→groupBy(doc, gram) formulation whose
    shuffle volume is the corpus' total n-gram count.
    """
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
    )

    def close(acc: Column) -> tuple[Column, Column]:
        chars = acc["run"] * F.length(acc["prev"])
        top = F.when(
            acc["prev"].isNotNull(), F.greatest(acc["top"], chars)
        ).otherwise(acc["top"])
        dup = F.when(
            acc["prev"].isNotNull() & (acc["run"] > 1), acc["dup"] + chars
        ).otherwise(acc["dup"])
        return top, dup

    def step(acc: Column, g: Column) -> Column:
        same = acc["prev"].isNotNull() & (acc["prev"] == g)
        top, dup = close(acc)
        return F.struct(
            g.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["top"]).otherwise(top).alias("top"),
            F.when(same, acc["dup"]).otherwise(dup).alias("dup"),
        )

    def finish(acc: Column) -> Column:
        top, dup = close(acc)
        return F.struct(top.alias("top"), dup.alias("dup"))

    return F.aggregate(F.array_sort(grams), init, step, finish)


def ngram_repetition_rows(
    df,
    cols: list,
    text_col: str,
    top_n: int = 2,
    dup_n: int = 3,
) -> "DataFrame":
    """Arrow-batched per-document repetition statistics — the integer
    numerators/denominator behind :func:`top_ngram_char_fraction` (word
    ``top_n``-grams) and :func:`dup_ngram_char_fraction` (word
    ``dup_n``-grams), one zero-shuffle ``mapInPandas`` pass:

    ``(passthrough.., top_chars, dup_chars, norm_len)`` where ``top_chars``
    = max over distinct ``top_n``-grams of occurrences × gram length,
    ``dup_chars`` = sum over ``dup_n``-grams occurring more than once of
    occurrences × gram length, ``norm_len`` = ``length(normalized(text))``
    (NULL for NULL text). The fraction division and ``F.round`` stay
    JVM-side at the call site, so values are bit-identical to the
    expression fold (`_run_length_char_stats`) this replaces — that fold
    re-evaluates ``word_ngrams``'s split per array element (O(len²)/doc,
    the same interpreted-HOF cost measured on the substring and gram-row
    paths this round). Equivalence test-pinned
    (``test_ngram_repetition_rows_matches_expression_path``).
    """
    import pandas as pd
    from pyspark.sql import types as T

    from lapis_silo_spark.functions.dedup import _spread

    base = _spread(
        df, *[c.alias(a) for a, c in cols],
        (F.col(text_col) if isinstance(text_col, str) else text_col)
        .alias("_txt"),
    )
    passthrough = [f for f in base.schema.fields if f.name != "_txt"]
    out_schema = T.StructType(
        passthrough
        + [
            T.StructField("top_chars", T.LongType()),
            T.StructField("dup_chars", T.LongType()),
            T.StructField("norm_len", T.LongType()),
        ]
    )
    names = [f.name for f in passthrough]
    tn, dn = top_n, dup_n

    def gen(it):
        import re
        from collections import Counter

        ws = re.compile(r"[\t\n\x0b\f\r ]+")
        for pdf in it:
            out = {name: pdf[name] for name in names}
            tops, dups, lens = [], [], []
            for txt in pdf["_txt"]:
                if txt is None:
                    tops.append(0)
                    dups.append(0)
                    lens.append(None)
                    continue
                t = ws.sub(" ", txt.strip(" ")).lower()
                tk = t.split(" ")
                top = 0
                m = len(tk) - (tn - 1)
                if m >= 1:
                    cnt = Counter(
                        " ".join(tk[p: p + tn]) for p in range(m)
                    )
                    top = max(
                        (c * len(g) for g, c in cnt.items()), default=0
                    )
                dup = 0
                m = len(tk) - (dn - 1)
                if m >= 1:
                    cnt = Counter(
                        " ".join(tk[p: p + dn]) for p in range(m)
                    )
                    dup = sum(
                        c * len(g) for g, c in cnt.items() if c > 1
                    )
                tops.append(top)
                dups.append(dup)
                lens.append(len(t))
            out["top_chars"] = pd.Series(tops, dtype="int64")
            out["dup_chars"] = pd.Series(dups, dtype="int64")
            out["norm_len"] = pd.Series(lens, dtype="object")
            yield pd.DataFrame(out, columns=names + [
                "top_chars", "dup_chars", "norm_len"
            ])

    return base.mapInPandas(gen, out_schema)


def top_ngram_char_fraction(col: str | Column, n: int = 2) -> Column:
    """Fraction of normalized-text characters covered by the single most
    frequent word n-gram (occurrences × gram length / text length) — the
    Gopher-style repetition quality signal; boilerplate-heavy documents
    score high. Empty/too-short documents score 0.0."""
    t = normalized(col)
    stats = _run_length_char_stats(word_ngrams(col, n))
    return F.when(F.length(t) > 0, stats["top"] / F.length(t)).otherwise(
        F.lit(0.0)
    )


def dup_ngram_char_fraction(col: str | Column, n: int = 3) -> Column:
    """Fraction of normalized-text characters covered by word n-grams that
    occur more than once in the document — Gopher's duplicate-n-gram
    repetition signal, complementing :func:`top_ngram_char_fraction` (which
    only sees the single worst offender)."""
    t = normalized(col)
    stats = _run_length_char_stats(word_ngrams(col, n))
    return F.when(F.length(t) > 0, stats["dup"] / F.length(t)).otherwise(
        F.lit(0.0)
    )


def winnow_fingerprint(col: str | Column, k: int = 8) -> Column:
    """Rolling-hash-style fingerprint: lexicographic min of md5 over all
    character k-shingles (one-window winnowing). Deterministic and
    SQL-reproducible."""
    t = normalized(col)
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
        lambda i: F.md5(F.substr(t, i, F.lit(k))),
    )
    return F.array_min(hashes)


def gram_novelty(
    docs, id_col: str, text_col: str, n: int = 3
):
    """Per-document n-gram NOVELTY: the fraction of the document's distinct
    word n-grams whose FIRST corpus occurrence (minimum ``id_col``) is this
    document. Near-1 for fresh content, near-0 for boilerplate recombining
    earlier text — the curation signal dedup-aware sampling pipelines rank
    on. Documents with no n-grams (< n tokens) score 0.0.

    Scale shape: one explode over distinct per-doc grams, a
    ``groupBy(gram).min(id)`` first-occurrence table (partial aggregation
    combines a web-scale-hot boilerplate gram map-side), joined back onto
    the exploded set — one build row per gram, so AQE can split a skewed
    probe side. (The earlier ``min(id) OVER (PARTITION BY gram)`` window
    saved the join's shuffle but funneled every occurrence of a hot gram
    into ONE task; see docs/WINDOW_AUDIT.md.) Shuffle volume is the
    corpus' total per-doc distinct-gram count, never pairwise. Returns
    ``(id, n_grams, novel_grams, novelty)``.
    """
    # Arrow gram production (round 11, guide §4): the expression form's
    # word_ngrams transform re-evaluates the token split per array element
    # (O(len²)/doc — see word_ngram_rows); one mapInPandas pass replaces it.
    exploded = word_ngram_rows(
        docs, [("id", F.col(id_col))], text_col, n, distinct=True
    )
    # One gram-keyed exchange feeds BOTH consumers (the first-occurrence
    # agg and the join probe): without it each branch recomputes the whole
    # gram map stage — word_ngrams' higher-order functions are interpreted
    # and dominate this query (2 × ~1.9 s at sf0.1; round 11, guide §2.1).
    # The join then needs no further shuffle on either side.
    exploded = exploded.repartition("gram")
    base = docs.select(F.col(id_col).alias("id"))
    firsts = exploded.groupBy("gram").agg(F.min("id").alias("first_id"))
    per_doc = (
        exploded.join(firsts, on="gram", how="inner")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_id") == F.col("id")).cast("long")).alias(
                "novel_grams"
            ),
        )
    )
    return (
        base.select("id")
        .join(per_doc, on="id", how="left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("novel_grams", F.lit(0)).alias("novel_grams"),
            F.round(
                F.coalesce(
                    F.col("novel_grams")
                    / F.col("n_grams").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("novelty"),
        )
    )


def build_vocab(
    docs, text_col: str, min_count: int = 1, max_size: int | None = None
):
    """Frequency-ranked token vocabulary: ``(term, term_id, count)`` with
    ids dense from 0 in (count desc, term asc) order — the deterministic
    tie-break every engine reproduces.

    Scale note: the ranking window runs UNPARTITIONED, which is correct
    here and wrong almost everywhere else — its input is the post-aggregation
    distinct-term table (vocabulary-sized, bounded like a codebook), not the
    corpus. The corpus-sized work (tokenize + count) is a map-side-combined
    hash aggregation keyed on the term.
    """
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.col("count").desc(), F.col("term"))
    out = counts.withColumn(
        "term_id", (F.row_number().over(w) - 1).cast("int")
    )
    if max_size is not None:
        out = out.filter(F.col("term_id") < max_size)
    return out.select("term", "term_id", "count")


def encode_token_ids(
    docs,
    id_col: str,
    text_col: str,
    vocab,
    oov_id: int = -1,
):
    """Encode each document as its vocabulary token-id sequence:
    ``(id, token_ids array<int>, n_tokens, n_oov)`` — the tokenize step a
    training-data pipeline runs right before packing.

    Scale shape: posexplode to (doc, pos, term), ONE equi-join against the
    vocabulary on the term (broadcast when the vocab is small; Catalyst
    decides), then a per-doc re-aggregation that restores token order by
    sorting (pos, id) structs — order survives the shuffle without a
    window. Out-of-vocabulary tokens encode as ``oov_id`` and are counted.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )
    joined = toks.join(vocab.select("term", "term_id"), on="term", how="left")
    tid = F.coalesce(F.col("term_id"), F.lit(oov_id))
    return (
        joined.groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), tid.alias("tid")))),
                lambda s: s["tid"],
            ).alias("token_ids"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("term_id").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )


def unigram_perplexity(docs, id_col: str, text_col: str):
    """Per-document perplexity under the corpus' own unigram language model
    (MLE, no smoothing — every scored token is in the model by
    construction): ``ppl = exp(-mean(ln P(w)))``. The CCNet-style quality
    proxy — boilerplate and keyword-stuffed documents score LOW (their
    tokens are corpus-frequent), rare-token noise scores HIGH; both tails
    are what a curation pipeline inspects. Returns
    ``(id, n_tokens, ppl)`` with ppl rounded to 6 decimals.

    Scale shape: one explode, a ``groupBy(term).count()`` frequency table
    (partial aggregation combines a web-scale-hot stopword map-side)
    joined back onto the token stream — one build row per term, so AQE can
    split a skewed probe side where a ``count() OVER (PARTITION BY term)``
    window would funnel every occurrence of a hot term into ONE task (see
    docs/WINDOW_AUDIT.md) — ONE scalar-row broadcast for the corpus token
    total, and a per-doc re-aggregation. The per-token arithmetic
    (``avg`` over token rows of the log-probability) is unchanged from the
    window form, so oracle equality is untouched.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )
    term_cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_cnt"))
    with_cnt = toks.join(term_cnt, on="term", how="inner")
    total_row = toks.agg(F.count(F.lit(1)).alias("_total"))
    return (
        with_cnt.crossJoin(F.broadcast(total_row))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.exp(
                    -F.avg(
                        F.log(
                            F.col("_cnt")
                            / F.col("_total").cast("double")
                        )
                    )
                ),
                6,
            ).alias("ppl"),
        )
    )


def chunk_windows(
    docs,
    id_col: str,
    text_col: str,
    size: int = 32,
    stride: int = 24,
):
    """Split each document into fixed-size token windows with overlap — the
    standard pretraining / retrieval chunking step (window ``size`` tokens,
    advancing ``stride`` tokens, so consecutive chunks share
    ``size - stride`` tokens). Returns
    ``(id, chunk_id, chunk_start, chunk_tokens, chunk_text)`` with
    ``chunk_start`` 0-based and the final partial window kept whenever it
    adds at least one uncovered token.

    Scale shape: a single narrow per-row map — sequence/transform/posexplode
    all in ONE select (whole-stage codegen keeps the array expression and its
    explode fused), no shuffle at all; output volume is
    ``ceil(tokens/stride)`` rows per doc, pipelining straight out of the
    Parquet scan.
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    toks = tokens(text_col)
    n = F.size(toks)
    # 1 + ceil(max(0, n - size) / stride) window starts at 0, stride, ...
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(size), F.lit(0)) / F.lit(stride))
    ).cast("int")
    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (n_chunks - 1) * F.lit(stride), F.lit(stride)),
                lambda s: F.struct(
                    s.cast("long").alias("chunk_start"),
                    F.least(F.lit(size), n - s).cast("long").alias("chunk_tokens"),
                    F.array_join(F.slice(toks, s + 1, size), " ").alias("chunk_text"),
                ),
            )
        ).alias("chunk_id", "c"),
    )
    return exploded.select(
        "id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.chunk_start").alias("chunk_start"),
        F.col("c.chunk_tokens").alias("chunk_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


# PII patterns shared by the Spark expressions and the DuckDB oracle: both
# dialects (java.util.regex and RE2) read these identically — no lookaround,
# no backreferences, ASCII word boundaries only.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # TPC-H style international numbers (NN-NNN-NNN-NNNN) and generic
    # long digit runs separated by -/./space.
    ("phone", r"\b[0-9]{2,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-category PII match counts over the RAW text (JVM regexp_count,
    no UDF). Counts are independent per category: text where one
    category's match contains another's (an IP inside an email local
    part) counts in both, while :func:`pii_redact` applies sequentially —
    the earlier category's placeholder swallows the contained match."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.regexp_count(c, F.lit(pat)) for name, pat, _ in PII_PATTERNS}


def pii_redact(col: str | Column) -> Column:
    """Replace every PII match with its category placeholder. Order matters
    and is fixed (email, phone, ipv4) so both engines rewrite identically;
    all three passes stay inside one codegen'd projection."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def reflow_lines(col: str | Column, words_per_line: int = 8) -> Column:
    """Deterministic re-segmentation of unstructured text into fixed-width
    "lines" of ``words_per_line`` whitespace tokens (normalized form).

    Line-level operators (:func:`...dedup.remove_duplicate_lines`) need line
    boundaries; corpora without them (OCR dumps, single-line JSON text
    fields, this repo's synthetic tables) get deterministic ones that both
    engines of an oracle pair can replay exactly. Pure JVM array ops — no
    shuffle, pipelines with the scan.

    Null text is coalesced to ``''`` (one empty line, the oracle's
    ``string_split`` semantics) BEFORE tokenizing: under non-ANSI Spark
    (a cluster-level ``spark.sql.ansi.enabled=false`` overrides the Spark 4
    default) ``size(null)`` is -1 and ``F.sequence(0, -1)`` DESCENDS,
    which would yield ``[null, null]`` lines and silently corrupt
    line-dedup counts (round-7 advisory).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.coalesce(c, F.lit("")))
    w = F.lit(words_per_line)
    k = F.floor((F.size(toks) + w - F.lit(1)) / w).cast("int")
    return F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i * w + F.lit(1), w), " "),
    )


def reflow_line_rows(
    df,
    cols: list,
    text_col: str,
    words_per_line: int = 8,
) -> "DataFrame":
    """Arrow-batched twin of ``select(*cols, reflow_lines(text_col, w))``:
    one zero-shuffle ``mapInPandas`` pass emitting ``(passthrough..,
    lines array<string>)``.

    :func:`reflow_lines`'s ``transform`` lambda re-evaluates its
    ``slice(split(normalized(text)))`` subtree per line window in
    interpreted mode — O(len²/w) per document, the same HOF disease as
    ``word_ngrams`` (round 11, guide §4). Semantics replicated exactly and
    test-pinned (``test_reflow_line_rows_matches_expression_path``): NULL
    text coalesces to ``''`` (one empty line), tokens are ``tokens()``'s
    normalization, line ``i`` is tokens ``[i*w, (i+1)*w)`` space-joined.
    """
    import pandas as pd
    from pyspark.sql import types as T

    from lapis_silo_spark.functions.dedup import _spread

    base = _spread(
        df, *[c.alias(a) for a, c in cols],
        (F.col(text_col) if isinstance(text_col, str) else text_col)
        .alias("_txt"),
    )
    passthrough = [f for f in base.schema.fields if f.name != "_txt"]
    out_schema = T.StructType(
        passthrough
        + [T.StructField("lines", T.ArrayType(T.StringType()))]
    )
    names = [f.name for f in passthrough]
    w = words_per_line

    def gen(it):
        import re

        ws = re.compile(r"[\t\n\x0b\f\r ]+")
        for pdf in it:
            out = {name: pdf[name] for name in names}
            lines = []
            for txt in pdf["_txt"]:
                t = ws.sub(" ", (txt or "").strip(" ")).lower()
                tk = t.split(" ")
                lines.append(
                    [
                        " ".join(tk[i: i + w])
                        for i in range(0, len(tk), w)
                    ]
                )
            out["lines"] = lines
            yield pd.DataFrame(out, columns=names + ["lines"])

    return base.mapInPandas(gen, out_schema)


def linear_classifier_logit(
    col: str | Column,
    weights: dict[str, float],
    bias: float = 0.0,
) -> Column:
    """Pre-sigmoid score of the fastText-style linear classifier:
    ``bias + mean token weight`` (unknown tokens weigh 0).

    The token-weight sum folds in DOCUMENT ORDER (``F.aggregate``), so for
    dyadic-rational weights the sum is EXACT (hence order-free) and the
    logit is bit-deterministic across engines — no libm involved.  Oracle
    comparisons and keep-gates should run on this value (``z > 0`` ≡
    ``sigmoid(z) > 0.5`` by monotonicity); the round-7 advisory showed the
    sigmoid form can flip a 6th-decimal rounding (or the gate itself, near
    z = 0) on a 1-ulp ``exp`` divergence between JVM and DuckDB libm.

    Null text scores like empty text (the bias alone) — the same
    normalization contract as the dedup operators.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.coalesce(c, F.lit("")))
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.coalesce(F.element_at(wmap, t), F.lit(0.0)),
    )
    mean = total / F.greatest(F.size(toks), F.lit(1))
    return F.lit(float(bias)) + mean


def linear_classifier_score(
    col: str | Column,
    weights: dict[str, float],
    bias: float = 0.0,
) -> Column:
    """fastText-style linear text classifier score: sigmoid of ``bias`` plus
    the mean token weight (unknown tokens weigh 0) — the shape of the
    quality / domain classifiers LLM curation pipelines gate documents on
    (DCLM, FineWeb-Edu). The weight table is inlined as a map literal, so
    scoring is a zero-shuffle JVM expression over the scan; use
    :func:`linear_classifier_scores_joined` when the vocabulary is too large
    to inline (it broadcasts instead), and
    :func:`linear_classifier_logit` when the value feeds a bit-exact
    comparison or a keep-gate (sigmoid is monotone, libm is not portable).
    """
    z = linear_classifier_logit(col, weights, bias)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def linear_classifier_scores_joined(
    docs,
    id_col: str,
    text_col: str,
    weights_df,
    *,
    bias: float = 0.0,
    token_col: str = "token",
    weight_col: str = "weight",
):
    """Large-vocabulary form of :func:`linear_classifier_score`: tokens
    explode, broadcast-join the weight table, and re-aggregate per document
    — one shuffle of ``(id, weight)``, the weight table never exceeds a
    broadcast. Returns ``(id, score)`` — one row per input document: null
    text normalizes to empty text (explode of a null array would otherwise
    silently DROP the document from the output).
    """
    from pyspark.sql import functions as _F

    txt = _F.coalesce(_F.col(text_col), _F.lit(""))
    toks = docs.select(
        _F.col(id_col).alias("id"),
        _F.size(tokens(txt)).alias("_n"),
        _F.explode(tokens(txt)).alias("_tok"),
    )
    joined = toks.join(
        _F.broadcast(
            weights_df.select(
                _F.col(token_col).alias("_tok"),
                _F.col(weight_col).alias("_w"),
            )
        ),
        "_tok",
        "left",
    )
    agg = joined.groupBy("id", "_n").agg(
        _F.sum(_F.coalesce("_w", _F.lit(0.0))).alias("_s")
    )
    z = _F.lit(float(bias)) + _F.col("_s") / _F.greatest(
        _F.col("_n"), _F.lit(1)
    )
    return agg.select(
        "id",
        (_F.lit(1.0) / (_F.lit(1.0) + _F.exp(-z))).alias("score"),
    )
