"""Statistics operators (SURVEY.md §2.5 A5–A7, A9–A10, A13–A16).

Every statistic is a single hash-aggregate pass (partial + final for
free); *exact* percentiles/median are used so the DuckDB oracle
(``quantile_cont``) and pandas (linear interpolation) match — the
``approx`` flag switches to sketch-based variants for 100 TB runs where
an exact percentile would force a global sort (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROUND_DP = 6


def _r(c: Column, dp: int = ROUND_DP) -> Column:
    """Round a float aggregate — both engine and oracle round to the same
    dp before hashing (SURVEY.md §7.4.12)."""
    return F.round(c, dp)


def _pcts(col: str | Column, ps: tuple[float, ...], approx: bool) -> Column:
    """ONE percentile aggregate for all cut points: each F.percentile call
    buffers the full column independently, so k separate calls cost k
    sort buffers — the array form costs one (measured 15.2 s → one-pass
    at sf0.1)."""
    arr = F.array(*[F.lit(p) for p in ps])
    if approx:
        return F.percentile_approx(col, arr)
    return F.percentile(col, arr)


def describe_stats(df: DataFrame, col: str, approx: bool = False) -> DataFrame:
    """A5 — df.describe(): count/mean/std/min/p25/p50/p75/max, one row.

    Reference: nb:cell7:30-35. std is sample stddev (pandas ddof=1).
    Mean = plain double avg: a decimal-cast sum would silently round
    values with >4 fractional digits and NULL-overflow values ≥ 1e16 —
    this operator serves arbitrary columns, so correctness beats the
    last-bit partition-order determinism (rounding to 6 dp absorbs the
    ~1e-12 relative summation variance, same policy as stddev/corr).

    r13 (VERDICT r12 #10): the EXACT path no longer runs the
    ``percentile()`` aggregate — its per-partition full-value buffer
    was the module's last registered 100 TB OOM hazard after
    ``percentiles``/``filter_quantile`` moved off it in r12. Quantiles
    now come from :func:`exact_percentiles_bucket_select` (4096-bucket
    histogram → target-bucket exact sort, memory shuffle-bounded) and
    join the single-pass moments row through a 1-row broadcast
    crossJoin. ``approx=True`` keeps the one-pass
    ``percentile_approx`` sketch (already bounded-memory). NaN is
    MISSING on the quantile outputs on both paths (the r11 engine-wide
    percentile contract: the reference computes in pandas, which
    skips NaN); the moments columns keep Spark aggregate semantics
    (count includes NaN rows, mean/std poison to NaN) — unchanged
    from every earlier round.
    """
    if approx:
        wide = df.agg(
            F.count(col).alias("cnt"),
            _r(F.avg(col)).alias("mean"),
            _r(F.stddev_samp(col)).alias("std"),
            _r(F.min(col)).alias("min"),
            _pcts(col, (0.25, 0.50, 0.75), approx).alias("__q"),
            _r(F.max(col)).alias("max"),
        )
        return wide.select(
            "cnt", "mean", "std", "min",
            _r(F.element_at("__q", 1)).alias("p25"),
            _r(F.element_at("__q", 2)).alias("p50"),
            _r(F.element_at("__q", 3)).alias("p75"),
            "max",
        )
    moments = df.agg(
        F.count(col).alias("cnt"),
        _r(F.avg(col)).alias("mean"),
        _r(F.stddev_samp(col)).alias("std"),
        _r(F.min(col)).alias("min"),
        _r(F.max(col)).alias("max"),
    )
    q = exact_percentiles_bucket_select(df, col, ps=(0.25, 0.50, 0.75))
    # both sides are 1-row frames: the crossJoin is a scalar broadcast
    return moments.crossJoin(F.broadcast(q)).select(
        "cnt", "mean", "std", "min", "p25", "p50", "p75", "max"
    )


def percentiles(
    df: DataFrame, col: str, ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.95, 0.99),
    approx: bool = False,
    method: str = "agg",
) -> DataFrame:
    """A7 — exact percentiles at the reference's cut points (nb:cell9:37-41).

    ``method='agg'`` (default) is a LAZY single percentile aggregate —
    safe to compose into larger plans, but its per-partition value map +
    single-threaded merge is the hot spot (3.1 s at sf0.1) and a 100 TB
    OOM risk. ``method='sortrank'`` runs :func:`exact_percentiles_sortrank`
    EAGERLY (range shuffle + per-partition rank pick; 1.2–1.6 s at
    sf0.1, shuffle-bounded memory — the registered driver query).
    ``method='bracket'`` is the sketch-bracket alternative in
    :func:`exact_percentiles_bracket` (no shuffle of the column, but
    3 blocking jobs whose fixed latency benched slower).
    ``method='prefix'`` is the r10 fully-LAZY exact path
    (:func:`exact_percentiles_prefix`): global ranks via the bucketed
    prefix sum, zero driver round-trips.
    ``method='bucketselect'`` (r12, the registered driver form) is
    the fully-lazy path that never ranks the full column
    (:func:`exact_percentiles_bucket_select`): bucket histogram →
    in-plan target-bucket selection → exact sort inside the ≤ 2·|ps|
    target buckets only — the corrected r12 trend showed the prefix
    form's full-column sort was a 2.7–3× constant factor at sf24+.
    Rounding goes through F.round on all paths so HALF_UP semantics
    match the rest of the module and the oracle (Python's round() is
    half-even on the binary value and diverges on trailing-5 digits).

    NaN is MISSING on every method (r11): the reference computes
    percentiles in pandas, whose ``quantile`` skips NaN, so NaN-as-
    missing is the engine contract. Spark's ``percentile()`` aggregate
    instead counts NaN in n and sorts it greatest (measured: values
    1..100 + 10 NaN → p50 55.5, p99 NaN), so the dispatcher filters
    NaN up front for ALL methods — without this the agg and prefix
    paths silently disagreed on NaN-bearing data (review r11; the
    prefix operator also filters internally, keeping its direct-call
    contract).
    """
    vd = F.col(col).cast("double")
    df = df.filter(vd.isNull() | ~F.isnan(vd))
    if method in ("prefix", "bucketselect"):
        if approx:
            raise ValueError(
                f"method={method!r} computes EXACT percentiles; use "
                "method='agg' with approx=True for the sketch path"
            )
        fn_lazy = (
            exact_percentiles_bucket_select
            if method == "bucketselect"
            else exact_percentiles_prefix
        )
        return fn_lazy(df, col, ps)
    if method not in ("agg", "bracket", "sortrank"):
        raise ValueError(
            "method must be 'agg', 'bracket', 'sortrank', 'prefix' or "
            f"'bucketselect', got {method!r}"
        )
    if method != "agg" and approx:
        raise ValueError(
            f"method={method!r} computes EXACT percentiles; combining it "
            "with approx=True is contradictory — use method='agg' with "
            "approx=True for the sketch-based path"
        )
    if method in ("bracket", "sortrank"):
        fn = (
            exact_percentiles_bracket
            if method == "bracket"
            else exact_percentiles_sortrank
        )
        vals = fn(df, col, ps)
        raw = df.sparkSession.createDataFrame(
            [tuple(vals[p] for p in ps)],
            ", ".join(f"`p{int(p * 100)}` double" for p in ps),
        )
        return raw.select(
            *[_r(F.col(f"p{int(p * 100)}")).alias(f"p{int(p * 100)}")
              for p in ps]
        )
    wide = df.agg(_pcts(col, ps, approx).alias("__q"))
    return wide.select(
        *[
            _r(F.element_at("__q", i + 1)).alias(f"p{int(p * 100)}")
            for i, p in enumerate(ps)
        ]
    )


def exact_percentiles_bracket(
    df: DataFrame, col: str, ps: tuple[float, ...],
    accuracy: int = 10_000,
) -> dict[float, float | None]:
    """EXACT linear-interpolated percentiles via bracket refinement —
    the distributed algorithm that avoids the percentile aggregate's
    full-column buffer (its per-partition value map + single-threaded
    merge is the 2.5 s hot spot at sf0.1; at 100 TB it is an OOM risk):

    1. ONE pass: n, min, max + approx_percentile at p ± 3/accuracy
       (rank error of the KLL-style sketch is n/accuracy, so the true
       values at ranks ⌊(n-1)p⌋/⌈(n-1)p⌉ provably lie inside the value
       bracket [v(p−3ε), v(p+3ε)]).
    2. ONE pass: per bracket, scalar counts of rows strictly below the
       bracket start and EQUAL to each bracket endpoint, plus the
       sorted values strictly INSIDE the bracket. Ties never enter the
       collection — a bracket landing on a 90 %-duplicated value counts
       the tied mass as two longs instead of collecting it, so the
       collected interior is rank-bounded (≤ ~24·n/accuracy values)
       regardless of duplication.
    3. Driver: reconstruct the rank layout
       [eq_lo ties][interior values][eq_hi ties] starting at the
       below-count, index the needed ranks, interpolate.

    Falls back to the exact percentile aggregate if a rank misses the
    reconstructed segment (cannot happen within the sketch guarantee;
    belt and braces). NaN is MISSING here too (filtered up front) —
    direct callers get the same contract as the :func:`percentiles`
    dispatcher, instead of percentile_approx/percentile counting NaN
    in n and sorting it greatest (ADVICE r11 #2). Returns {p: value}
    with None for an empty column.
    """
    vd = F.col(col).cast("double")
    df = df.filter(vd.isNull() | ~F.isnan(vd))
    eps = 3.0 / accuracy
    probe_ps: list[float] = []
    for p in ps:
        probe_ps += [max(0.0, p - eps), min(1.0, p + eps)]
    first = df.agg(
        F.count(F.col(col)).alias("n"),
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
        F.percentile_approx(
            col, F.array(*[F.lit(q) for q in probe_ps]), accuracy
        ).alias("br"),
    ).collect()[0]
    n = first["n"]
    if n == 0:
        return {p: None for p in ps}
    if n == 1 or first["mn"] == first["mx"]:
        return {p: float(first["mn"]) for p in ps}
    brackets = [
        (float(first["br"][2 * i]), float(first["br"][2 * i + 1]))
        for i in range(len(ps))
    ]

    c = F.col(col)
    aggs = []
    for i, (lo, hi) in enumerate(brackets):
        aggs.append(F.sum((c < F.lit(lo)).cast("long")).alias(f"below_{i}"))
        aggs.append(F.sum((c == F.lit(lo)).cast("long")).alias(f"eqlo_{i}"))
        if hi > lo:
            aggs.append(
                F.sum((c == F.lit(hi)).cast("long")).alias(f"eqhi_{i}")
            )
            aggs.append(
                F.sort_array(
                    F.collect_list(F.when((c > lo) & (c < hi), c))
                ).alias(f"seg_{i}")
            )
    second = df.agg(*aggs).collect()[0]

    out: dict[float, float | None] = {}
    fallback_ps: list[float] = []
    for i, p in enumerate(ps):
        lo, hi = brackets[i]
        k = (n - 1) * p
        lo_rank, hi_rank = int(k // 1), -int(-k // 1)
        below = second[f"below_{i}"]
        eq_lo = second[f"eqlo_{i}"]
        interior = list(second[f"seg_{i}"]) if hi > lo else []
        eq_hi = second[f"eqhi_{i}"] if hi > lo else 0
        # Rank layout: ranks [below, below+eq_lo) hold lo; then the
        # interior values; then eq_hi copies of hi.
        values = [lo] * eq_lo + interior + [hi] * eq_hi

        def at_rank(r: int):
            idx = r - below
            return values[idx] if 0 <= idx < len(values) else None

        v_lo, v_hi = at_rank(lo_rank), at_rank(hi_rank)
        if v_lo is not None and v_hi is not None:
            out[p] = float(v_lo + (k - lo_rank) * (v_hi - v_lo))
        else:  # outside the sketch guarantee — exact-agg fallback
            fallback_ps.append(p)
    if fallback_ps:
        exact = df.agg(
            F.percentile(
                col, F.array(*[F.lit(p) for p in fallback_ps])
            ).alias("q")
        ).collect()[0]["q"]
        for p, v in zip(fallback_ps, exact):
            out[p] = float(v) if v is not None else None
    return out


def mad_robust(df: DataFrame, col: str) -> DataFrame:
    """Robust location/scale: median and MAD (median absolute deviation)
    — the outlier-resistant alternative to mean/stddev for skewed
    distributions (A15's IQR cousin). One row: (median, mad).

    r13 (the VERDICT r12 #10 class, extended): both medians now run
    through :func:`exact_percentiles_bucket_select` instead of the
    ``median()`` aggregate — this was one of the last two registered
    plans whose memory grew with the column (a per-partition
    full-value buffer, twice). The first median broadcasts back as a
    1-row scalar exactly as before; the deviation column is a pure
    projection the second bucket-select consumes lazily. Exact
    linear-interpolated medians for oracle parity; memory is
    shuffle-bounded at any scale.
    """
    med = exact_percentiles_bucket_select(df, col, ps=(0.5,), dp=None)
    dev = (
        df.filter(F.col(col).isNotNull())
        .crossJoin(F.broadcast(med.select(F.col("p50").alias("__med"))))
        .select(
            F.col("__med"),
            F.abs(F.col(col) - F.col("__med")).alias("__ad"),
        )
    )
    madq = exact_percentiles_bucket_select(dev, "__ad", ps=(0.5,), dp=None)
    return (
        med.select(_r(F.col("p50")).alias("median"))
        .crossJoin(
            F.broadcast(madq.select(_r(F.col("p50")).alias("mad")))
        )
    )


def feature_scale(
    df: DataFrame, cols: tuple[str, ...], keep: tuple[str, ...] = (),
) -> DataFrame:
    """ML-prep feature scaling: per column, min-max to [0,1] and
    z-score (sample stddev), appended as ``<col>_minmax`` /
    ``<col>_z``. Constant columns yield NULL (0/0 guard via nullif)
    rather than NaN so sinks and oracles agree.

    Plan: ONE aggregate pass computes all 4·len(cols) statistics
    (partial + final hash agg), joined back as a broadcast 1-row scalar;
    the scaling itself is a pure projection — no shuffle of data rows.
    Float policy: round to 6 dp (same as describe_stats — absorbs the
    ~1e-12 summation-order variance of avg/stddev across engines).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
            F.avg(c).alias(f"__mu_{c}"),
            F.stddev_samp(c).alias(f"__sd_{c}"),
        ]
    stats_row = df.agg(*aggs)
    scaled = []
    for c in cols:
        rng = F.nullif(F.col(f"__mx_{c}") - F.col(f"__mn_{c}"), F.lit(0.0))
        sd = F.nullif(F.col(f"__sd_{c}"), F.lit(0.0))
        scaled += [
            _r((F.col(c) - F.col(f"__mn_{c}")) / rng).alias(f"{c}_minmax"),
            _r((F.col(c) - F.col(f"__mu_{c}")) / sd).alias(f"{c}_z"),
        ]
    return df.crossJoin(F.broadcast(stats_row)).select(
        *keep, *cols, *scaled
    )


def anomaly_zscore(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...],
    id_cols: tuple[str, ...],
    threshold: float = 3.0,
) -> DataFrame:
    """Grouped z-score anomaly screen: rows whose value deviates more
    than ``threshold`` sample standard deviations from their group mean.
    The grouped generalization of A15's IQR outlier gate.

    Plan: group stats are ONE hash agg over (group_cols) — a frame with
    one row per group, joined back onto the stream with NO forced
    broadcast hint: the stats side's size is the group cardinality,
    which can be billions of rows at 100 TB, so the strategy is left to
    AQE — it broadcasts when the agg output is actually small and falls
    back to a shuffle join when it isn't (a forced ``F.broadcast``
    would OOM the driver on high-cardinality groups). Filter +
    projection only after the join: no second shuffle. The threshold
    compares the ROUNDED z (6 dp) so both engines gate on the identical
    value.
    """
    stats_df = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sd"),
    )
    z = _r((F.col(value_col) - F.col("__mu"))
           / F.nullif(F.col("__sd"), F.lit(0.0)))
    return (
        df.join(stats_df, list(group_cols))
        .select(*id_cols, *group_cols, F.col(value_col), z.alias("z"))
        .filter(F.abs(F.col("z")) > threshold)
    )


def exact_percentiles_sortrank(
    df: DataFrame, col: str, ps: tuple[float, ...],
    num_partitions: int | None = None,
) -> dict[float, float | None]:
    """EXACT linear-interpolated percentiles via distributed sort-rank —
    the fastest exact path measured (1.2–1.6 s vs 3.1 s agg / 2.3 s
    bracket at sf0.1) and the one whose memory is shuffle-bounded at
    100 TB (no full-column aggregation buffer, no sketch):

    1. Range-shuffle the non-null column once and ``localCheckpoint`` the
       partitioned frame — the checkpoint materializes ONE projected
       column to executor-local storage (same footprint as the shuffle
       files) and lets the two downstream jobs skip the
       range-partitioner sample pass + shuffle instead of recomputing
       them (the lazy single-query formulation re-executes both per
       branch and benched 5× slower).
    2. Per-partition row counts (metadata-sized collect: one long per
       partition) → driver-side prefix sum gives each partition's global
       rank offset and the total n.
    3. The ≤ 2·len(ps) needed global ranks map to (partition, local
       rank) pairs; a ``row_number`` window over ``pid`` filters
       exactly those rows — a ≤ 2·len(ps)-row collect — and the driver
       interpolates. NOTE the pid-window is NOT shuffle-free:
       ``Window.partitionBy("pid")`` hash-partitions on pid, which does
       not match the range partitioning, so job 3 pays one exchange of
       the single projected column. That exchange is the same volume as
       the original range shuffle (one numeric column), so it is a
       constant-factor cost, not a scale hazard — but it IS a third
       pass over the column, which is why the checkpoint in step 1
       matters.

    Same rank semantics as DuckDB ``quantile_cont`` / pandas
    ``quantile``: value at fractional rank k=(n−1)·p interpolated
    between floor/ceil ranks. NaN is MISSING here too (dropped with
    NULL below) — direct callers get the same contract as the
    :func:`percentiles` dispatcher and the prefix sibling, instead of
    Spark's sort order placing NaN greatest (ADVICE r11 #2). Returns
    {p: value}, None for an empty column.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = (
        df.select(F.col(col).alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan(F.col("v").cast("double")))
        .repartitionByRange(num_partitions, "v")
        .localCheckpoint()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in part.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    n = sum(counts.values())
    if n == 0:
        return {p: None for p in ps}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # needed global ranks (0-based) → (pid, 1-based local row_number)
    ranks: set[int] = set()
    for p in ps:
        k = (n - 1) * p
        ranks.add(int(k // 1))
        ranks.add(-int(-k // 1))
    need: dict[int, tuple[int, int]] = {}
    for rank in ranks:
        pid = max(q for q in offsets if offsets[q] <= rank)
        need[rank] = (pid, rank - offsets[pid] + 1)
    from pyspark.sql import Window

    wloc = Window.partitionBy("pid").orderBy("v")
    pred = F.lit(False)
    for pid, rn in need.values():
        pred = pred | ((F.col("pid") == pid) & (F.col("rn") == rn))
    rows = (
        part.withColumn("pid", F.spark_partition_id())
        .withColumn("rn", F.row_number().over(wloc))
        .filter(pred)
        .collect()
    )
    by_loc = {(r["pid"], r["rn"]): r["v"] for r in rows}
    out: dict[float, float | None] = {}
    for p in ps:
        k = (n - 1) * p
        lo, hi = int(k // 1), -int(-k // 1)
        v_lo, v_hi = by_loc[need[lo]], by_loc[need[hi]]
        out[p] = float(v_lo + (k - lo) * (v_hi - v_lo))
    return out


def exact_percentiles_prefix(
    df: DataFrame,
    col: str,
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.95, 0.99),
    dp: int = ROUND_DP,
) -> DataFrame:
    """Exact linear-interpolated percentiles as ONE lazy plan — the r10
    registered form, superseding :func:`exact_percentiles_sortrank`
    for the driver query (VERDICT r9 #2/#3: the sort-rank form pays a
    localCheckpoint materialization plus TWO driver round-trips —
    partition-totals collect, offset re-plan — a fixed ~1.5–2 s of
    job-scheduling latency that dominates its wall at every measured
    SF, while its shuffle volume is identical to this plan's).

    Plan: :func:`global_order_prefix` (rank=True) assigns every
    non-null value its global sort rank with NO driver round-trip
    (bucketed two-level prefix, one full-column shuffle keyed on
    bucket — the same single-column volume the sort-rank form range-
    shuffles); the row count joins in as a broadcast 1-row aggregate;
    the needed ranks ``k_p = (n−1)·p`` select ≤ 2·|ps| rows in-plan;
    a global aggregate over those picks v_lo/v_hi per cut point and
    interpolates ``v_lo + (k−⌊k⌋)·(v_hi−v_lo)`` — the quantile_cont /
    pandas formula, evaluated in double exactly as the oracle does.
    Memory stays shuffle-bounded (never the percentile() aggregate's
    full-column buffer); no collect, no re-plan, one action.

    Returns the 1-row wide frame (p25 … p99 columns, ``dp``-rounded);
    empty/all-null input yields one all-null row (the agg-method
    contract).

    NaN rows are excluded alongside nulls (r11, ADVICE r10 #4): the
    engine contract is pandas ``quantile`` skipna semantics — the
    reference computes these numbers in pandas, which treats NaN as
    missing. (Spark's raw ``percentile()`` aggregate does NOT: it
    counts NaN in n and sorts it greatest, so a high cut point
    returns NaN — which is why :func:`percentiles` filters NaN for
    every method at the dispatcher and this operator also filters
    for direct callers.)
    """
    vals = (
        df.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan("v"))
    )
    ranked = global_order_prefix(vals, "v", rank=True)
    cnt = vals.agg(F.count(F.lit(1)).alias("__n"))
    k = lambda p: (F.col("__n") - 1) * F.lit(p)  # noqa: E731
    pick = F.lit(False)
    for p in ps:
        pick = pick | (F.col("rk") - 1 == F.floor(k(p))) | (
            F.col("rk") - 1 == F.ceil(k(p))
        )
    hits = ranked.crossJoin(F.broadcast(cnt)).filter(pick)
    aggs = [F.max("__n").alias("__n")]
    for i, p in enumerate(ps):
        aggs.append(
            F.max(F.when(F.col("rk") - 1 == F.floor(k(p)), F.col("v")))
            .alias(f"__lo_{i}")
        )
        aggs.append(
            F.max(F.when(F.col("rk") - 1 == F.ceil(k(p)), F.col("v")))
            .alias(f"__hi_{i}")
        )
    out_cols = []
    for i, p in enumerate(ps):
        frac = k(p) - F.floor(k(p))
        out_cols.append(
            F.round(
                F.col(f"__lo_{i}")
                + frac * (F.col(f"__hi_{i}") - F.col(f"__lo_{i}")),
                dp,
            ).alias(f"p{int(p * 100)}")
        )
    return hits.groupBy().agg(*aggs).select(*out_cols)


def exact_percentiles_bucket_select(
    df: DataFrame,
    col: str,
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.95, 0.99),
    dp: int | None = ROUND_DP,
    n_buckets: int = 4096,
    keep_n: bool = False,
    extra_scalar_aggs: dict | None = None,
) -> DataFrame:
    """Exact linear-interpolated percentiles as ONE lazy plan that
    never ranks the full column — the r12 registered form, superseding
    :func:`exact_percentiles_prefix` for the driver query.

    The prefix form assigns EVERY row its global rank (a full
    per-bucket window sort of the whole column) to then keep ≤ 2·|ps|
    rows — at sf24 that full sort was the wall (57 s vs a 21 s oracle,
    the corrected r12 trend). Selecting quantiles only needs exact
    ranks INSIDE the buckets that contain the target ranks:

    1. Pass 1 — 4096-bucket histogram: equal-width bucket id from the
       finite-masked 1-row min/max broadcast, ONE hash agg keyed on
       bucket (map-side combine collapses each task to ≤4096 longs).
    2. In-plan target selection: exclusive bucket offsets via the
       single-partition window over the ≤4096-row bucket-total frame
       (the audited metadata-scale window), total n from the same
       frame; a bucket is a TARGET iff [offset, offset+count) contains
       ⌊k_p⌋ or ⌈k_p⌉ for some cut point k_p = (n−1)·p — ≤ 2·|ps|
       buckets, broadcast.
    3. Pass 2 — candidates = rows in target buckets (broadcast hash
       semi-join prunes ~99.7 % of rows before any shuffle); a
       per-bucket window sorts ONLY the candidates (offset +
       row_number − 1 = exact 0-based global rank); the usual pick /
       interpolate tail runs on ≤ 2·|ps| rows.

    Two single-column scans replace the full-column shuffle + sort +
    lazy checkpoint: shuffle volume drops from n rows to
    (4096 bucket partials + n/4096·2·|ps| candidates). Degenerate
    cases degrade, never break: hi == lo (or a point-mass bucket
    holding a target rank) makes that bucket's whole mass the
    candidate set — the one-window fallback the prefix form also has.
    NULL order values cannot reach a target bucket (filtered with NaN
    up front; pandas skipna contract, same as every sibling); ±Inf
    pin to the edge buckets exactly as in :func:`global_order_prefix`
    and sort correctly inside them.

    Returns the 1-row wide frame (p25 … p99, ``dp``-rounded);
    empty/all-null input yields one all-null row (the agg-method
    contract).

    ``extra_scalar_aggs`` (r16): scalar aggregate Columns over the
    internal value column ``v`` (the ``col`` cast to double, NULL/NaN
    filtered), e.g. ``{"mean": F.round(F.avg("v"), 6)}``. They are
    computed INSIDE the pass-1 limits aggregate — zero additional
    column scans — ride the existing 1-row broadcast through the
    candidate path (column pruning keeps them out of the histogram
    branch), and come back as columns of the output row. This is how
    percentiles_approx fuses its moments + sketch pass with the exact
    bracket: one fewer full-column aggregate pass and no scalar
    crossJoin (the local wall is job-chain-floor-dominated and
    measures flat; the pass elimination is the at-scale win — a
    column scan saved is a column scan saved at 100 TB). On EMPTY
    input these columns are NULL
    (there are no candidate rows to carry the broadcast), so a
    count-like extra reads NULL, not 0 — callers needing oracle
    count() parity wrap with coalesce.
    """
    extra_scalar_aggs = extra_scalar_aggs or {}
    vals = (
        df.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan("v"))
    )
    inf = float("inf")
    vn = F.when((F.col("v") > -inf) & (F.col("v") < inf), F.col("v"))
    lim = vals.agg(
        F.min(vn).alias("__lo"),
        F.max(vn).alias("__hi"),
        *[c.alias(f"__x_{k}") for k, c in extra_scalar_aggs.items()],
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    bkt = (
        F.when(F.col("v") == inf, F.lit(n_buckets - 1).cast("long"))
        .when(F.col("v") == -inf, F.lit(0).cast("long"))
        .when(F.col("__hi") == F.col("__lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor((F.col("v") - F.col("__lo")) / width).cast("long"),
                F.lit(n_buckets - 1).cast("long"),
            )
        )
    )
    binned = vals.crossJoin(F.broadcast(lim)).withColumn("__bkt", bkt)
    bt = binned.groupBy("__bkt").agg(
        F.count(F.lit(1)).cast("long").alias("__bn")
    )
    wb = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    # r16 (optimization round, guide §2.4): total n comes from the SAME
    # ≤4096-row single-partition window frame as the exclusive offsets
    # (unbounded-following frame, identical partition/order spec → ONE
    # WindowExec), replacing the r12 form's separate sum-aggregate +
    # broadcast crossJoin — that branch re-read bt's exchange, ran a
    # two-stage aggregate and a BroadcastExchange + BNLJ of its own:
    # two extra sequential AQE stages per percentile call, pure
    # job-chain floor at every scale.
    wn = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = bt.select(
        "__bkt",
        F.coalesce(F.sum("__bn").over(wb), F.lit(0))
        .cast("long")
        .alias("__boff"),
        "__bn",
        F.sum("__bn").over(wn).cast("long").alias("__n"),
    )
    k = lambda p: (F.col("__n") - 1) * F.lit(p)  # noqa: E731
    in_bucket = F.lit(False)
    for p in ps:
        for edge in (F.floor(k(p)), F.ceil(k(p))):
            in_bucket = in_bucket | (
                (edge >= F.col("__boff"))
                & (edge < F.col("__boff") + F.col("__bn"))
            )
    targets = off.filter(in_bucket).select("__bkt", "__boff", "__n")
    cand = binned.join(F.broadcast(targets), "__bkt")
    ww = Window.partitionBy("__bkt").orderBy("v")
    ranked = cand.withColumn(
        "__r0", F.col("__boff") + F.row_number().over(ww) - 1
    )
    pick = F.lit(False)
    for p in ps:
        pick = pick | (F.col("__r0") == F.floor(k(p))) | (
            F.col("__r0") == F.ceil(k(p))
        )
    hits = ranked.filter(pick)
    aggs = []
    for i, p in enumerate(ps):
        aggs.append(
            F.max(F.when(F.col("__r0") == F.floor(k(p)), F.col("v")))
            .alias(f"__lo_{i}")
        )
        aggs.append(
            F.max(F.when(F.col("__r0") == F.ceil(k(p)), F.col("v")))
            .alias(f"__hi_{i}")
        )
    aggs.append(F.max("__n").alias("__n"))
    for xk in extra_scalar_aggs:
        # every candidate row carries the broadcast scalar; max of a
        # constant is the constant (deterministic, unlike first)
        aggs.append(F.max(F.col(f"__x_{xk}")).alias(f"__xx_{xk}"))
    out_cols = []
    for i, p in enumerate(ps):
        frac = k(p) - F.floor(k(p))
        interp = F.col(f"__lo_{i}") + frac * (
            F.col(f"__hi_{i}") - F.col(f"__lo_{i}")
        )
        # dp=None -> emit the raw interpolated double (consumers that
        # derive further arithmetic from the quantile, e.g.
        # iqr_outliers' fences, must not round early)
        out_cols.append(
            (interp if dp is None else F.round(interp, dp))
            .alias(f"p{int(p * 100)}")
        )
    if keep_n:
        # expose the total the bucket histogram already summed —
        # consumers that also need count(col) (iqr_outliers' pct
        # denominator) save a full extra column scan. NOTE this n
        # counts non-null, non-NaN values (the quantile population),
        # not bare count(col).
        out_cols.append(F.col("__n").alias("n"))
    for xk in extra_scalar_aggs:
        out_cols.append(F.col(f"__xx_{xk}").alias(xk))
    return hits.groupBy().agg(*aggs).select(*out_cols)


def global_order_prefix(
    df: DataFrame,
    order_col: str,
    tie_cols: tuple[str, ...] = (),
    weight_col: str | None = None,
    n_buckets: int = 4096,
    rank: bool = False,
    materialize: bool = True,
    keep_total: bool = False,
) -> DataFrame:
    """Exact EXCLUSIVE prefix sum (and optional 1-based global rank)
    over the global ``order_col`` order — LAZY, one Spark action, no
    driver round-trips. Returns ``df`` plus ``cum`` (sum of
    ``weight_col`` over all strictly-earlier rows; weight 1 when
    ``weight_col`` is None) and, with ``rank=True``, ``rk`` (global
    ``row_number`` ordered by ``(order_col, *tie_cols)``).

    This supersedes the sort-rank partition-offset pattern
    (:func:`exact_percentiles_sortrank`'s shape) for the prefix-sum
    consumers (``roc_auc``, ``gini_concentration``): that pattern pays
    a ``localCheckpoint`` materialization plus TWO driver round-trips
    (partition totals collect, offset re-plan) per run — a fixed
    ~1.5–2 s of job-scheduling latency that the r7 sf2 probe showed
    dominating the wall. Here the offsets stay in-plan:

    1. ONE 1-row min/max aggregate, broadcast, buckets every row into
       ``n_buckets`` equal-width bins — ``floor`` of a monotone
       transform, so bucket order == value order (a degenerate
       ``hi == lo`` column collapses to bucket 0, documented
       single-partition fallback).
    2. Bucket totals (≤ ``n_buckets`` rows) get their own exclusive
       prefix via a single-partition window — bounded by the bucket
       count, NEVER by the data (4096 longs), so the classic
       single-partition-window hazard does not apply.
    3. Bucket offsets broadcast-join back; a per-bucket window
       (parallelism = occupied buckets, ~n/4096 rows each) adds the
       within-bucket prefix.

    NULL order values take a dedicated first bucket and NaN the last,
    matching Spark's ascending sort (nulls first, NaN greatest) so
    ranks equal a true global sort's. ±Inf order values are likewise
    explicit since r10 (closing the documented precondition): limits
    come from the FINITE values only, −Inf pins to bucket 0 and +Inf
    to the top bucket — inside those buckets the within-bucket
    ``orderBy`` places −Inf before every finite value and +Inf after
    (but before NaN, Spark's sort order), so ranks again equal a true
    global sort's with no precondition left on the order column.

    ``df`` feeds three branches (min/max, bucket totals, the main
    join). ReuseExchange dedups the upstream SHUFFLE, but each branch
    still re-runs the post-shuffle operators — for a high-cardinality
    caller groupBy that is ~3× the final-aggregate cost (measured
    +3 s on roc_auc's 583k-distinct-score axis at sf2). With
    ``materialize=True`` (default) the input is lazily
    ``localCheckpoint``-ed so the grouped frame computes once and the
    three branches read the (order-axis-sized, never raw-data-sized)
    materialized blocks — still ONE action, still zero driver
    round-trips. Skew bound: equal-width bins assume the order column
    is not pathologically point-massed; the worst case degrades to
    the one-window plan, never breaks.
    """
    if materialize:
        df = df.localCheckpoint(eager=False)
    w_expr = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    v = F.col(order_col).cast("double")
    # FINITE-masked limits: a NaN max would poison every bucket via a
    # NaN width, and an infinite lo/hi would do the same through
    # inf−inf. Limits therefore come from finite values only; the
    # non-finite classes get pinned buckets below.
    inf = float("inf")
    vn = F.when((~F.isnan(v)) & (v > -inf) & (v < inf), v)
    lim = df.agg(
        F.min(vn).alias("__lo"),
        F.max(vn).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    # Bucket order must equal Spark's ascending sort order end to end
    # (null < −Inf < finite < +Inf < NaN): NULL order_col sorts FIRST
    # → dedicated bucket -1 (the r8 form let nulls fall through
    # floor→null→least→LAST bucket while still sorting nulls-first
    # inside it — ranks inconsistent with a true global sort, ADVICE
    # r8 #3); −Inf shares bucket 0 and +Inf/NaN the top bucket, where
    # the within-bucket orderBy already places them exactly right
    # (−Inf before every finite, +Inf after every finite, NaN last) —
    # so ±Inf is handled, not a precondition (VERDICT r9 #6). When NO
    # finite value exists, lo/hi are null, the floor branch is never
    # reached, and the pinned branches still order correctly.
    bkt = (
        F.when(F.col(order_col).isNull(), F.lit(-1).cast("long"))
        .when(F.isnan(v), F.lit(n_buckets - 1).cast("long"))
        .when(v == inf, F.lit(n_buckets - 1).cast("long"))
        .when(v == -inf, F.lit(0).cast("long"))
        .when(F.col("__hi") == F.col("__lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor((v - F.col("__lo")) / width).cast("long"),
                F.lit(n_buckets - 1).cast("long"),
            )
        )
    )
    binned = df.crossJoin(F.broadcast(lim)).withColumn("__bkt", bkt)
    wb = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # keep_total (r16, guide §2.4): expose the total weight as __gtot,
    # summed over the SAME ≤n_buckets-row single-partition window frame
    # as the offsets (one WindowExec) — consumers that also need n
    # (equidepth's bin arithmetic) save a second full pass over the
    # input plus a broadcast crossJoin.
    bt_cols = [
        F.col("__bkt"),
        F.coalesce(F.sum("__bn").over(wb), F.lit(0))
        .cast("long")
        .alias("__boff"),
    ]
    if keep_total:
        wn = Window.orderBy("__bkt").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        bt_cols.append(
            F.sum("__bn").over(wn).cast("long").alias("__gtot")
        )
    bt = (
        binned.groupBy("__bkt")
        .agg(F.sum(w_expr).cast("long").alias("__bn"))
        .select(*bt_cols)
    )
    if rank and weight_col is not None:
        raise ValueError("rank=True requires unit weights (weight_col=None)")
    ww = Window.partitionBy("__bkt").orderBy(order_col, *tie_cols)
    out = binned.join(F.broadcast(bt), "__bkt").withColumn(
        "cum",
        (
            F.col("__boff")
            + F.coalesce(
                F.sum(w_expr).over(
                    ww.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).cast("long"),
    )
    if rank:
        out = out.withColumn(
            "rk", (F.col("__boff") + F.row_number().over(ww)).cast("long")
        )
    return out.drop("__bkt", "__lo", "__hi", "__boff")


def equidepth_histogram_prefix(
    df: DataFrame, col: str, k: int, tiebreak: str, dp: int = 2,
) -> DataFrame:
    """Equi-DEPTH histogram (k bins of ~equal row count) as ONE lazy
    plan — the r11 registered form, superseding
    :func:`operators.windows.equidepth_histogram` for the driver query
    exactly as :func:`exact_percentiles_prefix` superseded the
    sort-rank percentile form (VERDICT r10 #3: the sortrank shape pays
    a per-partition-counts collect plus an offset re-plan — two driver
    round-trips of fixed job-scheduling latency that dominated its
    wall at every measured SF, 11.5× vs the oracle at sf2 — while its
    shuffle volume is identical to this plan's).

    Plan: :func:`global_order_prefix` (rank=True) assigns every row
    its exact global ``(col, tiebreak)`` sort rank with no driver
    round-trip; the total row count joins in as a broadcast 1-row
    aggregate; bin = ``(rank−1)·k div n + 1`` with INTEGER
    floor-division on longs — structurally the oracle SQL's
    ``(rn - 1) * k // n + 1`` (ADVICE r11 #4: the previous
    double-division form agreed only via IEEE correct rounding below
    2^53; integer div removes the bound) — then one k-row hash agg
    per bin. Memory
    stays shuffle-bounded (the widest state is the 4096-long bucket
    prefix); no collect, no re-plan, one action.

    Same bin semantics as the windows.py form: deterministic given a
    unique ``tiebreak``, counts differ by ≤1 across bins. Rows with a
    null ``col`` rank first (Spark ascending order), matching a true
    global sort.
    """
    d = df.select(F.col(col).alias("__v"), F.col(tiebreak).alias("__t"))
    # keep_total rides the total row count (= sum of the bucket counts,
    # null bucket included) out of the prefix machinery's own
    # bucket-total window — the r11 form's separate d.agg(count) was a
    # SECOND full pass over the input (it aggregated the raw frame, not
    # the localCheckpoint) plus a broadcast crossJoin: one full scan +
    # two AQE stages removed (r16, guide §2.3/§2.4).
    ranked = global_order_prefix(
        d, "__v", tie_cols=("__t",), rank=True, keep_total=True
    )
    return (
        ranked.withColumn(
            "bin",
            (F.expr(f"(rk - 1) * {int(k)} div __gtot") + 1).cast("long"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("__v"), dp).alias("lo"),
            F.round(F.max("__v"), dp).alias("hi"),
        )
        .orderBy("bin")
    )


def null_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A9+A10 — per-column null count and completeness %, one aggregation
    pass over all columns, unpivoted to (column_name, null_count,
    completeness_pct) rows sorted by null_count desc then name.

    Reference: generar_reporte_calidad (src/transformacion.py:424-436),
    nb:cell6:13-21.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__total")]
    # Positional aliases (__n_0…) plus a pure-Column unpivot (explode of
    # lit-name structs) so arbitrary source column names — non-ASCII
    # ('año'), quotes, backslashes — never enter generated SQL text.
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{i}"))
    wide = df.agg(*aggs)
    unpivoted = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__n_{i}").alias("null_count"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        wide.select(F.explode(unpivoted).alias("__p"), F.col("__total"))
        .select(
            F.col("__p.column_name").alias("column_name"),
            F.col("__p.null_count").alias("null_count"),
            F.round((F.col("__total") - F.col("__p.null_count"))
                    / F.col("__total") * 100, 2).alias("completeness_pct"),
        )
        .orderBy(F.desc("null_count"), "column_name")
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """A13 — pairwise Pearson correlation, all pairs in ONE aggregate pass
    (n²/2 corr expressions → single shuffle), unpivoted to
    (col_a, col_b, corr) rows.

    Reference: df[cols].corr() (nb:cell13:23-29).
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    wide = df.agg(
        *[_r(F.corr(a, b)).alias(f"{a}__{b}") for a, b in pairs]
    )
    stack_args = ", ".join(f"'{a}', '{b}', {a}__{b}" for a, b in pairs)
    return wide.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) as (col_a, col_b, corr)")
    ).orderBy("col_a", "col_b")


def iqr_outliers(df: DataFrame, col: str, approx: bool = False) -> DataFrame:
    """A15 — IQR outlier summary: Q1/Q3 → bounds ±1.5·IQR → count, %,
    outlier min/max. One row.

    Reference: nb:cell11-12. Quantile pass then a scalar-broadcast
    filter+agg — no per-row Python.

    r13 (VERDICT r12 #10): the exact Q1/Q3 come from
    :func:`exact_percentiles_bucket_select` instead of the
    ``percentile()`` aggregate, removing this operator's per-partition
    full-value buffer (the same 100 TB OOM hazard ``percentiles``/
    ``filter_quantile`` shed in r12 and ``describe_stats`` sheds this
    round). The unrounded quantiles feed the ±1.5·IQR bounds so the
    fence arithmetic is bit-identical to the oracle's
    quantile_cont-derived bounds; ``approx=True`` keeps the one-pass
    ``percentile_approx`` sketch.

    r14 (ADVICE r13 #1): the outlier filter excludes NaN on float
    columns — Spark's total ordering places NaN above every double, so
    ``c > hi`` was true for NaN rows while the keep_n denominator (per
    the r11 NaN-as-missing contract, matching pandas) excludes them;
    the numerator now describes the same NaN-free population as the
    denominator, and the approx path's ``total`` is aligned to the
    same contract.
    """
    c = F.col(col)
    is_float = df.schema[col].dataType.typeName() in ("float", "double")
    not_nan = (~F.isnan(c)) if is_float else F.lit(True)
    # NaN-masked view of the column: the approx quantiles AND the pct
    # denominator both skip NaN (NaN ranks above every double, so an
    # unmasked percentile_approx inflates q3 on NaN-bearing columns).
    masked = F.when(not_nan, c) if is_float else c
    if approx:
        qq = df.agg(
            _pcts(masked, (0.25, 0.75), approx).alias("__q"),
            F.count(masked).alias("total"),
        ).select(
            F.element_at("__q", 1).alias("q1"),
            F.element_at("__q", 2).alias("q3"),
            "total",
        )
    else:
        # keep_n fuses the pct denominator into the histogram pass the
        # quantiles already make (one column scan saved). total is
        # therefore the NaN-free non-null population — equal to
        # count(col) except on NaN-bearing columns, where the NaN-as-
        # missing percentile contract (r11) extends to the pct
        # denominator so numerator and denominator describe the same
        # population.
        qq = exact_percentiles_bucket_select(
            df, col, ps=(0.25, 0.75), dp=None, keep_n=True
        ).select(
            F.col("p25").alias("q1"),
            F.col("p75").alias("q3"),
            F.col("n").alias("total"),
        )
    q = qq.select(
        "q1", "q3", "total",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    # q is a 1-row frame: the crossJoin is a broadcast of scalars.
    return (
        df.crossJoin(F.broadcast(q))
        .filter(((c < F.col("lo")) | (c > F.col("hi"))) & not_nan)
        .agg(
            F.count(F.lit(1)).alias("outlier_count"),
            _r(F.first("q1")).alias("q1"),
            _r(F.first("q3")).alias("q3"),
            _r(F.first("lo")).alias("lower_bound"),
            _r(F.first("hi")).alias("upper_bound"),
            _r(F.count(F.lit(1)) / F.first("total") * 100, 4).alias("outlier_pct"),
            _r(F.min(c)).alias("outlier_min"),
            _r(F.max(c)).alias("outlier_max"),
        )
    )


def histogram(df: DataFrame, col: str, lo: float, width: float) -> DataFrame:
    """A16 — fixed-width histogram: bin = floor((x-lo)/width), count per
    bin (nb:cell7:49). DataFrame-native (single hash agg), no RDD."""
    bin_col = F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("long")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bin")
    )


def group_entropy(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Shannon entropy (nats) of the ``value_col`` distribution within
    each group — the standard data-profiling signal for label/category
    columns (near-0 = degenerate column, ln(k) = uniform over k values).

    Plan: two chained hash aggs — (group, value) counts, then per-group
    ``ln n − Σ c·ln c / n`` (the algebraic form that needs only the
    counts, no per-row probabilities) — both shuffles key on the group,
    partial aggregation applies, and the second agg's input is one row
    per distinct (group, value), already corpus-independent. Entropy
    and n are exact; entropy rounds to 6 dp for cross-engine hashing.
    """
    c = F.count(F.lit(1))
    counts = df.groupBy(group_col, value_col).agg(c.alias("__c"))
    return (
        counts.groupBy(group_col)
        .agg(
            F.sum("__c").alias("n"),
            F.sum(F.col("__c") * F.log(F.col("__c"))).alias("__clogc"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .select(
            group_col,
            "n",
            "n_distinct",
            _r(F.log(F.col("n")) - F.col("__clogc") / F.col("n"))
            .alias("entropy_nats"),
        )
        .orderBy(group_col)
    )


def winsorize_summary(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorized-mean summary per group: exact [lo, hi] percentile
    bounds, then the mean of the value CLIPPED to those bounds next to
    the raw mean — the outlier-robust alternative to plain avg (ML
    feature prep; the clip twin of anomaly_zscore's screen).

    Plan: ONE ``percentile(col, array(lo, hi))`` buffer per group (the
    percentile_by_group discipline — never two separate sort buffers),
    joined back group-to-group (AQE picks broadcast when the group
    domain is small), then a second group agg over the clipped value.
    Shuffles: two, both keyed on the group. At 100 TB the documented
    swap is approx_percentile with identical call shape.
    """
    bounds = df.groupBy(group_col).agg(
        F.percentile(value_col, F.array(F.lit(lo), F.lit(hi))).alias("__b")
    ).select(
        group_col,
        F.col("__b")[0].alias("__lo"),
        F.col("__b")[1].alias("__hi"),
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return (
        df.join(bounds, group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(F.avg(v)).alias("mean_raw"),
            _r(F.avg(clipped)).alias("mean_winsorized"),
            _r(F.first("__lo")).alias("p_lo"),
            _r(F.first("__hi")).alias("p_hi"),
        )
        .orderBy(group_col)
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
) -> DataFrame:
    """Smoothed target encoding: each category maps to
    ``(Σ target + m · global_mean) / (n + m)`` — the standard
    high-cardinality categorical encoder (rare categories shrink toward
    the global mean instead of memorizing noise).

    Plan: one hash agg per category + one SCALAR global agg broadcast
    onto it (1-row crossJoin — the audited scalar-BNLJ shape, metadata
    not data). No per-row join: the encoder table is the OUTPUT, sized
    by category cardinality; applying it to a stream is one AQE-sized
    equi-join downstream. Exact sums via DECIMAL would be overkill
    here: 6-dp rounding on the final ratio absorbs double summation
    order (SURVEY.md §7.4.12 applies to raw sums, not shrunk means).

    r16 (optimization round, guide §2.3): the global mean derives FROM
    the per-category frame (Σ__s / Σn ≡ avg(target): every row lands
    in exactly one category group, nulls included) instead of a second
    full scan of the input — one whole input pass removed at any
    scale; the category frame is lazily checkpointed so its two
    consumers don't re-run the big aggregation. Deliberately an
    aggregate + broadcast, NOT a window: the encoder serves
    high-cardinality categoricals, so a single-partition window over
    the category axis would be the documented scale hazard.
    """
    t = F.col(target_col)
    per_cat = df.groupBy(cat_col).agg(
        F.count(t).alias("n"),
        F.sum(t).alias("__s"),
    ).localCheckpoint(eager=False)
    g = per_cat.agg(
        (F.sum("__s") / F.sum("n")).alias("__g")
    )
    return (
        per_cat.crossJoin(F.broadcast(g))
        .select(
            cat_col,
            "n",
            _r(
                (F.col("__s") + F.lit(smoothing) * F.col("__g"))
                / (F.col("n") + F.lit(smoothing))
            ).alias("encoded"),
            _r(F.col("__g")).alias("global_mean"),
        )
        .orderBy(cat_col)
    )


def histogram2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_width: float,
    y_cents_per_bin: int,
) -> DataFrame:
    """2-D equi-width histogram over (x, y) — the heatmap twin of A16.
    The y axis bins on INTEGER CENTS (``floor(round(y·100) / bin)``) so
    bin edges are exact for money-like doubles: ``0.04 / 0.02`` in
    binary floating point can land on 1.999…, and a raw floor would put
    the row in the wrong bin on one engine but not the other.

    Single hash agg on the two bin keys — one shuffle, partial
    aggregation applies, output is bounded by bin-grid size.
    """
    bx = F.floor(F.col(x_col) / F.lit(x_width)).cast("long")
    by = F.floor(
        F.round(F.col(y_col) * 100, 0) / F.lit(y_cents_per_bin)
    ).cast("long")
    return (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(bx.alias("bin_x"), by.alias("bin_y"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bin_x", "bin_y")
    )


def weighted_median_by_group(
    df: DataFrame, value_col: str, weight_col: str, group_col: str
) -> DataFrame:
    """Weighted median per group: the smallest value v whose cumulative
    weight over rows with value ≤ v reaches half the group's total
    weight — the mass-based location estimate (exact median when all
    weights are 1; survey/importance-weighted data otherwise).

    Plan: ONE group-key shuffle serves everything — the cumulative sum
    uses the DEFAULT window frame (``ORDER BY value`` ⇒ RANGE UNBOUNDED
    PRECEDING..CURRENT ROW), which includes ALL ties of the current
    value, so the cutoff row is a deterministic function of the value
    alone, never of the arbitrary intra-tie row order; the group-total
    window on the same partitioning adds no exchange. Final min() per
    group is a hash agg on the (tiny) crossing rows. Memory is
    shuffle-partition-bounded — no percentile buffer materializes the
    column per group.
    """
    v, w = F.col(value_col), F.col(weight_col)
    cum = Window.partitionBy(group_col).orderBy(value_col)
    whole = Window.partitionBy(group_col)
    return (
        df.filter(v.isNotNull() & w.isNotNull())
        .select(
            group_col,
            v.alias("__v"),
            F.sum(w).over(cum).alias("__cw"),
            F.sum(w).over(whole).alias("__tw"),
        )
        .filter(F.col("__cw") * 2 >= F.col("__tw"))
        .groupBy(group_col)
        .agg(_r(F.min("__v")).alias("weighted_median"))
        .orderBy(group_col)
    )


def two_proportion_ztest(
    df: DataFrame,
    unit_col: str,
    variant: Column,
    success: Column,
) -> DataFrame:
    """A/B-test readout: conversion per variant and the pooled
    two-proportion z statistic  z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a+1/n_b)).

    Experiment-unit first: rows collapse to one row per ``unit_col``
    (max of the success flag — "did this user ever convert"), so
    event-frequency per user cannot bias the rate. Two hash aggs total
    (unit, then variant) and a 1-row final reduce emitted as a single
    scalar row — conditional aggregation keeps both variants in one
    pass, no self-join. Scales as two keyed shuffles regardless of
    event volume.
    """
    per_unit = (
        df.select(
            F.col(unit_col).alias("__u"),
            variant.alias("__variant"),
            success.cast("int").alias("__s"),
        )
        .groupBy("__u", "__variant")
        .agg(F.max("__s").alias("__conv"))
    )
    a_is = F.col("__variant") == F.lit("A")
    agg = per_unit.agg(
        F.sum(a_is.cast("long")).alias("n_a"),
        F.sum((~a_is).cast("long")).alias("n_b"),
        F.sum(F.when(a_is, F.col("__conv")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(~a_is, F.col("__conv")).otherwise(0)).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pooled * (1 - pooled) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        _r(p_a).alias("rate_a"),
        _r(p_b).alias("rate_b"),
        _r((p_a - p_b) / se).alias("z_score"),
    )


def skyline_2d(
    df: DataFrame, min_col: str, max_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """2-D Pareto skyline: the distinct points not dominated by any
    other — q dominates p when q.min_col ≤ p.min_col AND
    q.max_col ≥ p.max_col with at least one strict (e.g. cheaper AND
    bigger parts).

    Sort-based O(n log n) plan, never the naive O(n²) dominance
    self-join, and never a single-partition global window:

    1. Hash-agg to one row per distinct ``min_col`` keeping
       ``max(max_col)`` — within an equal min_col only the largest
       max_col can survive, so this both dedups and shrinks the input
       to distinct-key cardinality in one shuffle.
    2. A point is then on the skyline iff the running max of
       ``max_col`` over strictly-smaller ``min_col`` is below its own.
       That cumulative max is computed DISTRIBUTED, the
       sort-rank-percentile pattern (:func:`exact_percentiles_sortrank`):
       range-shuffle on min_col + localCheckpoint, per-partition maxes
       collected (one row per partition — metadata, not data),
       driver-side exclusive prefix max, folded back per partition via
       a pid CASE literal over an intra-partition window. No global
       single-partition sort anywhere; memory is shuffle-bounded.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    reduced = (
        df.filter(
            F.col(min_col).isNotNull() & F.col(max_col).isNotNull()
        )
        .groupBy(min_col)
        .agg(F.max(max_col).alias("__m"))
        .repartitionByRange(num_partitions, min_col)
        .localCheckpoint()
    )
    pmax = {
        r["pid"]: r["m"]
        for r in reduced.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.max("__m").alias("m"))
        .collect()
    }
    prefix: dict[int, float | None] = {}
    best: float | None = None
    for pid in sorted(pmax):
        prefix[pid] = best
        best = pmax[pid] if best is None else max(best, pmax[pid])
    carry = F.lit(None).cast(reduced.schema["__m"].dataType)
    for pid, bound in prefix.items():
        if bound is not None:
            carry = F.when(F.col("__pid") == pid, F.lit(bound)).otherwise(
                carry
            )
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(min_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bound = F.greatest(
        F.coalesce(F.max("__m").over(wloc), carry), carry
    )
    return (
        reduced.withColumn("__pid", F.spark_partition_id())
        .withColumn("__bound", bound)
        .filter(
            F.col("__bound").isNull() | (F.col("__bound") < F.col("__m"))
        )
        .select(F.col(min_col), F.col("__m").alias(max_col))
        .orderBy(min_col)
    )
