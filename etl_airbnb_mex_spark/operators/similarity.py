"""Vector similarity search over embedding columns (SURVEY.md §2.11).

Brute-force cosine top-k is the exactness baseline (single scan +
TakeOrderedAndProject — no global sort); the LSH-bucketed variant is the
100 TB path: random-hyperplane signatures shrink each probe to one
bucket equi-join instead of a full-corpus scan.

Dot products use zip_with + aggregate — native higher-order expressions,
Arrow never crosses the JVM/Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_cosine(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dp: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k of ``df`` rows against a single-row
    ``query_df``. The query vector broadcasts (1-row crossJoin); ranking
    is orderBy+limit → TakeOrderedAndProject. Deterministic tie-break on
    id (SURVEY.md §7.4.8)."""
    q = query_df.select(
        F.col(vec_col).cast("array<double>").alias("__qvec"),
        F.col(id_col).alias("__qid"),
    )
    v = F.col(vec_col).cast("array<double>")
    return (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            id_col,
            F.round(cosine(v, F.col("__qvec")), dp).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit of the dot product with
    each (pre-generated, deterministic) plane, packed into a long."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(vec, p) >= 0, F.lit(2 ** i).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return sum(bits[1:], bits[0])


def knn_cosine_lsh(
    df: DataFrame,
    query_df: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dp: int = 6,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, then exact
    cosine within it. At scale the corpus is pre-bucketed and written
    partitioned by bucket → partition pruning makes each probe touch one
    partition. Recall trades off with number of planes."""
    v = F.col(vec_col).cast("array<double>")
    bucketed = df.withColumn("__bucket", lsh_bucket_signature(v, planes))
    q = query_df.select(
        F.col(vec_col).cast("array<double>").alias("__qvec"),
        F.col(id_col).alias("__qid"),
        lsh_bucket_signature(
            F.col(vec_col).cast("array<double>"), planes
        ).alias("__qbucket"),
    )
    return (
        bucketed.join(
            F.broadcast(q),
            (F.col("__bucket") == F.col("__qbucket"))
            & (F.col(id_col) != F.col("__qid")),
        )
        .select(
            id_col,
            F.round(cosine(v, F.col("__qvec")), dp).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_ids: int | None = None,
    dp: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥
    threshold). O(n²) exact form — gate with max_ids in tests; at scale
    run within LSH buckets (join on bucket id first)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if max_ids is not None:
        base = base.filter(F.col("id") < max_ids)
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), dp).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )
