"""Deduplication operators (SURVEY.md §2.3 D1–D3, §2.11 near-dup family).

Scale notes: exact dedup is one hash shuffle on the dedup key; keep-first
dedup uses a window (single shuffle, no global sort); MinHash-LSH near-dup
turns the O(n²) pair problem into band-bucket equi-joins — the only
strategy that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize


def dedup_keep_first(
    df: DataFrame, keys: list[str], order: list[str]
) -> DataFrame:
    """D1 — drop_duplicates(subset=keys) with *deterministic* keep-first:
    pandas keeps first-in-file-order, Spark's dropDuplicates keeps an
    arbitrary row, so parity requires an explicit tie-break ordering
    (SURVEY.md §7.4.4). One shuffle on ``keys``.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dup_fullrow_count(df: DataFrame) -> DataFrame:
    """D2 — count of fully-duplicated rows: count(*) - count(distinct *)
    (nb:cell6:26-27)."""
    total = df.count()
    distinct = df.distinct().count()
    return df.sparkSession.createDataFrame(
        [(total - distinct,)], "dup_rows long"
    )


def dup_key_count(df: DataFrame, key: str) -> DataFrame:
    """D3 — duplicate-key count: count(key) - count(distinct key)
    (nb:cell6:29-31). At 100 TB scale swap countDistinct for
    approx_count_distinct (single pass, no distinct shuffle)."""
    return df.agg(
        (F.count(key) - F.countDistinct(key)).alias("dup_keys")
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact text dedup: lowercase, collapse
    whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def dedup_text_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """§2.11 — exact near-dup removal: md5 of normalized text, keep the
    lowest id per hash. One shuffle on the 32-byte hash (never on the
    document text itself — at 100 TB the shuffle payload must be the
    fingerprint, not the payload column)."""
    h = F.md5(normalize_text(text_col)).alias("text_hash")
    w = Window.partitionBy("text_hash").orderBy(F.asc(id_col))
    return (
        df.select(id_col, h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles as array<string> (distinct), the unit set for
    Jaccard/MinHash near-dup."""
    toks = tokenize(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as array<bigint>: for hash function i, min over
    shingles of xxhash64(shingle, seed=i). xxhash64 is a native JVM
    expression — the whole signature computes inside codegen, no UDF.

    NB: the per-i lambda is built by a closure factory — a ``lambda s,
    i=i:`` default arg would make PySpark treat it as a binary (element,
    index) lambda and silently bind the array index instead of the seed.
    """

    def hash_with_seed(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(
        *[
            F.array_min(F.transform(shingle_col, hash_with_seed(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """§2.11 — MinHash + LSH banding near-dup candidate pairs.

    Pipeline: shingle → 32-way minhash signature → split into ``bands``
    bands of rows → hash each band → *equi-join on (band_id, band_hash)*.
    The band join is the LSH trick: only documents agreeing on an entire
    band meet, so the shuffle is O(n·bands), not O(n²). Returns distinct
    candidate pairs (id_a < id_b) with their estimated Jaccard
    (signature agreement rate).
    """
    rows_per_band = num_hashes // bands
    sig = (
        df.select(
            F.col(id_col).alias("id"),
            minhash_signature(shingles(text_col, shingle_n), num_hashes).alias("sig"),
        )
        .filter(F.size("sig") > 0)
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "sig", "band.band_id", "band.band_hash")

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(agree / F.lit(num_hashes), 4).alias("est_jaccard"),
    ).orderBy("id_a", "id_b")


def simhash(col: Column | str, bits: int = 64) -> Column:
    """§2.11 — 64-bit SimHash over tokens, built from xxhash64 bit votes.

    For each bit position, sum +1/-1 votes across token hashes and take
    the sign. Native expressions only (bit ops + aggregate over the token
    array)."""
    toks = tokenize(col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote_for_bit(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_exprs = []
    for b in range(bits):
        votes = F.aggregate(hashes, F.lit(0), vote_for_bit(b))
        bit_exprs.append(
            F.shiftleft(
                F.when(votes > 0, F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
                b,
            )
        )
    return sum(bit_exprs[1:], bit_exprs[0])


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_ids: int | None = None,
) -> DataFrame:
    """§2.11 — exact n-gram Jaccard over candidate pairs. O(n²) — gate
    with ``max_ids`` for tests; at scale, feed *candidate pairs from
    minhash_near_dup_pairs* instead of the full cross product."""
    base = df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
    if max_ids is not None:
        base = base.filter(F.col("id") < max_ids)
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size(F.array_union("a.sh", "b.sh"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )
