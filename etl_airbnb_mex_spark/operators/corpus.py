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
