"""Set operations (SURVEY.md §2.8 — engine extensions; none in the
reference). Thin, but declared as first-class operators so coverage is
explicit: unionByName (schema-aligned append — the Spark idiom for the
reference's per-collection extract loop S2), intersect, except."""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_by_name(a: DataFrame, b: DataFrame, allow_missing: bool = False) -> DataFrame:
    return a.unionByName(b, allowMissingColumns=allow_missing)


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)


def hash_bucket(key: str, m: int, salt: int = 2654435761):
    """Bucket in [0, m): (k·salt) mod 2³² mod m, computed without
    int64 overflow — reduce the key to 32 bits first, then split
    k = hi·2¹⁶ + lo so every intermediate stays < 2⁴⁹
    ((a·c) mod m == ((a mod m)·c) mod m keeps it exact).
    The naive key*salt wraps silently above key ≈ 3.5e9 in Spark
    (ANSI off) but *raises* in engines with checked BIGINT arithmetic,
    breaking the same-bucket-everywhere guarantee. Negative keys are
    normalized by pmod, so every engine that lacks pmod can mirror
    this with ((k % 2³²) + 2³²) % 2³²."""
    from pyspark.sql import functions as F

    k = F.pmod(F.col(key).cast("long"), F.lit(2 ** 32))
    hi = F.floor(k / F.lit(2 ** 16)).cast("long")
    lo = F.pmod(k, F.lit(2 ** 16))
    h = F.pmod(
        F.pmod(hi * F.lit(salt), F.lit(2 ** 32)) * F.lit(2 ** 16)
        + lo * F.lit(salt),
        F.lit(2 ** 32),
    )
    return F.pmod(h, F.lit(m))


def hash_bucket_100(key: str, salt: int = 2654435761):
    """Percent-granularity bucket — see :func:`hash_bucket`."""
    return hash_bucket(key, 100, salt)


def weighted_sample_hash(
    df: DataFrame,
    key: str,
    weight_col: str,
    rate_scale: float = 1.0,
    salt: int = 2654435761,
    granularity: int = 1_000_000,
) -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sampling: row i is kept with
    probability ``rate_scale · w_i / max(w)`` (clamped to 1), decided by
    pure integer arithmetic — keep iff
    ``hash_bucket(key, granularity) < floor(p_i · granularity)``.

    Training-data use: importance-sample a corpus by a quality score —
    the inclusion decision is stable across runs, engines, and
    partitioning (unlike ``sample()``'s partition-seeded RNG), and a
    kept row stays kept when the corpus grows (as long as max(w) is
    pinned), so experiment cohorts stay comparable.

    Plan: ONE aggregate for max(w) joined back as a broadcast scalar
    (1-row BroadcastNestedLoopJoin — the scalar pattern, not a data
    cross join), then a pure per-row filter: no shuffle of data rows at
    all. The probability product ``w/maxw·granularity`` uses only IEEE
    double ×,÷ and floor — all exactly specified, so every engine
    computes the identical threshold.
    """
    from pyspark.sql import functions as F

    mx = df.agg(F.max(weight_col).alias("__maxw"))
    thresh = F.floor(
        F.least(
            F.col(weight_col) * F.lit(rate_scale) / F.col("__maxw"),
            F.lit(1.0),
        )
        * F.lit(granularity)
    )
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(hash_bucket(key, granularity, salt) < thresh)
        .drop("__maxw")
    )


def stratified_sample_hash(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: int = 2654435761,
) -> DataFrame:
    """Deterministic stratified sampling (§2.11 — corpus rebalancing in
    training-data pipelines, e.g. downsample the dominant language):
    keep a row iff its key's hash bucket < 100·fraction[stratum]. Unlike
    ``DataFrame.sampleBy`` (seeded RNG over partition order) the sample
    is stable across runs, engines, and repartitioning, and a row once
    sampled stays sampled as the corpus grows — the property that keeps
    training/holdout membership consistent between pipeline runs.

    Pure filter — no shuffle; composes with downstream aggs that then
    shuffle only the surviving fraction.

    Granularity is 1% (fractions quantize to ``round(frac · 100)``
    buckets). A positive fraction that quantizes to zero would silently
    drop the whole stratum, so it raises instead; fractions between
    percent points round to the nearest percent.
    """
    from pyspark.sql import functions as F

    for name, frac in {**fractions, "<default>": default}.items():
        if frac > 0 and int(round(frac * 100)) == 0:
            raise ValueError(
                f"stratum {name!r}: fraction {frac} quantizes to 0% "
                "(granularity is 1/100) — the stratum would be dropped "
                "entirely; use a fraction ≥ 0.005 or 0.0 explicitly"
            )
    bucket = hash_bucket_100(key, salt)
    thresh = None
    for name, frac in fractions.items():
        lit = F.lit(int(round(frac * 100)))
        thresh = (
            F.when(F.col(strata_col) == name, lit) if thresh is None
            else thresh.when(F.col(strata_col) == name, lit)
        )
    thresh = (
        thresh.otherwise(int(round(default * 100)))
        if thresh is not None else F.lit(int(round(default * 100)))
    )
    return df.filter(bucket < thresh)


def split_by_hash(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    salt: int = 2654435761,
) -> DataFrame:
    """Deterministic dataset split (train/val/test) for training-data
    pipelines: bucket = (key · Knuth-multiplier) mod 2³² mod 100, ranges
    assigned by cumulative fraction. Pure integer arithmetic — the same
    row lands in the same split on every run, every engine, every
    partitioning (unlike randomSplit), and rows never move between
    splits when the corpus grows. Adds a ``split`` column.
    """
    from pyspark.sql import functions as F

    bucket = hash_bucket_100(key, salt)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        cond = bucket < F.lit(int(round(cum * 100)))
        expr = (
            F.when(cond, name) if expr is None
            else expr.when(cond, name)
        )
    return df.withColumn("split", expr.otherwise("rest"))


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    updates_order_col: str | None = None,
) -> DataFrame:
    """CDC-style MERGE (upsert) without a table format: the next snapshot
    is ``updates`` overlaid on ``base`` by key — update rows win on key
    collision, unmatched update rows insert, unmatched base rows carry
    over. Schemas must match (enforced), so the overlay is a column-wise
    coalesce over a full-outer join.

    Scale: ONE shuffle of each side on the key (the same cost Delta/
    Iceberg MERGE pays before file rewrite); no broadcast assumption, so
    it holds when updates are large. Deletes are out of scope — model
    them as a tombstone column filtered downstream.

    Matched rows take the update row WHOLE (decided by a constant marker
    on the update side, so it also holds for NULL keys) — a per-column
    coalesce would silently leak base values through legitimate NULLs in
    update rows. A NULL-key update row never equi-matches and therefore
    INSERTS (Delta/Iceberg's NOT MATCHED semantics), it is not dropped.

    Precondition: ``key`` is unique within each input — duplicate keys
    in ``updates`` fan out against the base row (Delta MERGE raises on
    multiple matches; enforcing that here would cost an extra shuffle,
    so it is the caller's contract). For last-write-wins over a CDC
    batch with several versions per key, pass ``updates_order_col`` and
    the highest value per key is kept before merging; NULL-key rows are
    exempt from that dedup (each one still inserts), and ties on the
    order column within a key keep an arbitrary row — for a
    deterministic snapshot the order column must be unique per key
    (e.g. a CDC log sequence number, which is unique by construction).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if set(base.columns) != set(updates.columns):
        raise ValueError(
            "merge_upsert requires identical schemas; got "
            f"base-only {sorted(set(base.columns) - set(updates.columns))}, "
            f"updates-only {sorted(set(updates.columns) - set(base.columns))}"
        )
    if updates_order_col is not None:
        # NULL-key rows all land in the window's NULL partition, so an
        # unconditional rn==1 filter would collapse them to one row —
        # but each is an independent INSERT; exempt them from the dedup.
        w = Window.partitionBy(key).orderBy(F.desc(updates_order_col))
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col(key).isNull() | (F.col("__rn") == 1))
            .drop("__rn")
        )
    b = base.alias("__b")
    u = updates.withColumn("__from_u", F.lit(1)).alias("__u")
    joined = b.join(u, F.col(f"__b.{key}") == F.col(f"__u.{key}"), "full_outer")
    take_update = F.col("__u.__from_u").isNotNull()
    return joined.select(
        *[
            F.when(take_update, F.col(f"__u.{c}"))
            .otherwise(F.col(f"__b.{c}"))
            .alias(c)
            for c in base.columns
        ]
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC snapshot diff: classify every key as ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, any compare column
    differs null-safely) or ``unchanged`` — the reconciliation primitive
    behind incremental loads and data-drift audits.

    ONE full-outer equi-join on the key (both sides hash-shuffle on the
    same key, AQE-sized), classification is a pure projection over the
    joined row — no second pass, no collect. Emits (key columns,
    change) rows; aggregate downstream as needed. At 100 TB both
    snapshots are key-partitioned parquet, so the join co-locates.
    """
    from pyspark.sql import functions as F

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"__ov_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__nv_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = c if cond is None else cond & c
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"__ov_{c}").eqNullSafe(
            F.col(f"__nv_{c}")
        )
    joined = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(differs, "changed")
        .otherwise("unchanged")
    )
    keys = [
        F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
        for k in key_cols
    ]
    return joined.select(*keys, change.alias("change"))
