"""Corpus-level text statistics (SURVEY.md §2.11 extensions) — the
term-weighting / n-gram operators a training-data pipeline runs over the
whole corpus, as distributed aggregation plans.

Scale shape: every stage shuffles ids + short tokens, never documents.
TF is a (doc_id, token) hash agg; document frequency is a token-keyed
hash agg over TF's (already-distinct) output; the corpus size joins in
as a broadcast 1-row aggregate — no ``collect()`` anywhere. The final
per-doc top-k is one window on doc_id. At 100 TB the token dictionary is
the only conceptually-global state and it stays distributed (token-keyed
join); nothing materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize


def tfidf_topk(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf(d,t) · ln(N / df(t)), ties
    broken by token ascending so the result set is deterministic.

    Returns (id_col, token, tfidf, rn) with rn ∈ [1, k].
    """
    tf = (
        docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "__tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("dfc"))
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            id_col,
            "token",
            F.round("__tfidf", 6).alias("tfidf"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


def bigram_topn(docs: DataFrame, text_col: str, n: int = 20) -> DataFrame:
    """Top-n word bigrams by corpus frequency (tie-break: bigram asc).

    Bigrams are built INSIDE the row with zip_with over two aligned
    slices — the explode ships (bigram) strings only, and the count is a
    plain partial+final hash agg. No joins, no per-row Python.
    """
    toks = tokenize(text_col)
    sz = F.size(toks)
    bigrams = F.when(
        sz >= 2,
        F.zip_with(
            F.slice(toks, 1, sz - 1),
            F.slice(toks, 2, sz - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(n)
    )


def dup_ngram_fraction(
    docs: DataFrame, id_col: str, text_col: str, n: int = 2,
) -> DataFrame:
    """Gopher-style within-document repetition signal: the fraction of a
    document's word n-grams that are duplicates (1 − distinct/total).
    High values flag template/boilerplate spam a quality gate drops.
    Complements ``repetition_ratio`` (token-level) with phrase-level
    evidence. Returns (id, n_ngrams, dup_ngram_frac).

    Plan: built ENTIRELY in-row — n-grams via transform over a position
    sequence with array slices, the fraction via array_distinct — one
    codegen'd projection, no explode, no shuffle at all.
    """
    toks = F.split(F.col(text_col), " ")
    sz = F.size(toks)
    ngs = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cnt = F.size(ngs)
    frac = F.when(
        cnt > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(ngs)) / cnt, 6
        ),
    ).otherwise(F.lit(0.0))
    return docs.select(
        id_col,
        cnt.cast("long").alias("n_ngrams"),
        frac.alias("dup_ngram_frac"),
    )


def vocab_prune(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    df_frac: float = 0.8,
) -> DataFrame:
    """C4-style boilerplate-token pruning: drop every token whose
    DOCUMENT frequency exceeds ``df_frac`` of the corpus (ubiquitous
    tokens carry no training signal), preserving the order of the
    surviving tokens. Returns (id, pruned_text, n_removed).

    Plan: one distinct-token explode + hash agg finds the hot set; by
    construction it is tiny (tokens present in > df_frac of ALL
    documents — bounded by 1/df_frac times the per-doc vocabulary, not
    by corpus size), so it collects to the driver and inlines into a
    per-row array filter: the second pass is a pure in-row expression
    with NO shuffle and no join. At a df_frac low enough to make the
    hot set large, switch to the posexplode + broadcast-anti-join +
    re-assemble form instead of lifting the list into the plan.
    """
    toks = F.split(F.col(text_col), " ")
    n_docs = docs.count()
    hot_rows = (
        docs.select(F.explode(F.array_distinct(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("dc"))
        .filter(F.col("dc") > df_frac * n_docs)
        .collect()
    )
    hot = sorted(r["tok"] for r in hot_rows)
    if not hot:
        return docs.select(
            id_col,
            F.col(text_col).alias("pruned_text"),
            F.lit(0).cast("long").alias("n_removed"),
        )
    hot_arr = F.array(*[F.lit(t) for t in hot])
    kept = F.filter(toks, lambda t: ~F.array_contains(hot_arr, t))
    return docs.select(
        id_col,
        F.array_join(kept, " ").alias("pruned_text"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
    )
