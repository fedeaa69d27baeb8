#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The final line's "queries" dict holds the 25 slowest queries only — the
driver's tail capture is 2000 chars and the full ~100-query map
overflows it ("parsed": null, rounds 6-8); the complete per-query map
is written to BENCH_SIDECAR.json under "spark" at the same commit.

Each query is executed to completion (collect) so the number is the full
scan→shuffle→result wall clock, not plan construction.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _git_head() -> str:
    """Short commit the measurement ran at (sidecar staleness stamp)."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except (OSError, subprocess.SubprocessError):
        # TimeoutExpired is not an OSError; a hung git must not crash
        # the run after all measurements completed.
        return "unknown"

#: Clean-phase bounds (VERDICT r13 #1): a recorded bench is defensible
#: only when the machine phase around it is known-clean. Floor/duck are
#: instantaneous probes taken around the measured passes; loadavg is
#: only meaningful AMBIENT (before any 32-thread bench work — r13's
#: recorded stamp read loadavg 2.96 right after the pipeline phase,
#: where self-load and neighbor steal are indistinguishable).
_CLEAN_FLOOR32 = float(os.environ.get("SPARK_GRAFT_CLEAN_FLOOR", "0.17"))
_CLEAN_DUCK = float(os.environ.get("SPARK_GRAFT_CLEAN_DUCK", "0.15"))
_CLEAN_LOAD1 = float(os.environ.get("SPARK_GRAFT_CLEAN_LOAD1", "2.0"))
#: Sustained 32-core capacity band (VERDICT r14 #7, calibrated from
#: the r14+r15 stamp accumulation — see BENCH_SIDECAR.json:
#: sustained_band): recorded-clean bench days sampled 0.124-0.19 s on
#: the fixed 400M-row probe, contended-or-slow days 0.21-0.28 s, and
#: the r14_machine_day_ab replay proved a same-code 1.5x day swing the
#: floor/duck probes cannot see. A probe above this threshold now
#: marks the phase dirty (triggering the bounded wait / extra-pass
#: machinery), so a slow machine day can no longer stamp itself clean.
_CLEAN_SUSTAINED = float(
    os.environ.get("SPARK_GRAFT_CLEAN_SUSTAINED", "0.22"))
#: Max seconds to wait pre-run for ambient contention to pass, and max
#: extra recorded passes to take when a pass bracket reads dirty.
_PHASE_WAIT_SEC = float(os.environ.get("SPARK_GRAFT_PHASE_WAIT_SEC", "120"))
_MAX_EXTRA_PASSES = int(os.environ.get("SPARK_GRAFT_MAX_EXTRA_PASSES", "2"))
#: Global wall budget for the whole bench: waits and extra passes are
#: skipped once elapsed exceeds it, so the clean-phase gate can never
#: push the run past an external driver timeout. The base run
#: (pipeline + 3 headline passes + 3 oracle passes) fits well inside.
_BENCH_BUDGET_SEC = float(
    os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "480"))


def _phase_probe(spark, with_loadavg: bool = True) -> dict:
    """Machine-phase stamp (r13): the ambient band swings same-code
    walls 2-5x within a day, so a recorded bench is only comparable to
    another at a known phase. Same two fixed probes as
    scale_bench._phase_probe: the 32-task scheduler floor (clean
    <= ~0.15s in a warm JVM) and a fixed single-process DuckDB
    aggregate (CPU-steal signal the scheduler floor can miss)."""
    import duckdb as _duckdb

    # loadavg FIRST (ADVICE r14 #1, mirroring scale_bench): the probe's
    # own floor/duck/sustained jobs are ~5-15s of 32-core work — read
    # after them, a clean machine's own probe load can exceed the 2.0
    # ambient gate and stamp a clean run as contended.
    load1 = load5 = None
    if with_loadavg:
        try:
            with open("/proc/loadavg") as f:
                load1, load5 = f.read().split()[:2]
        except OSError:
            pass

    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 32 * 1000, 1, 32).selectExpr("sum(id)").collect()
        floor = min(floor, time.perf_counter() - t0)
    con = _duckdb.connect()
    duck = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute("SELECT sum(i * 3 % 7) FROM range(10000000) t(i)").fetchall()
        duck = min(duck, time.perf_counter() - t0)
    con.close()
    # Sustained 32-core capacity probe (r14): the floor (tiny tasks)
    # and duck (single core) probes both read clean on days when
    # sustained multi-core throughput is 1.5x down (measured via an
    # interleaved same-code A/B vs the r12 recorded day,
    # BENCH_SIDECAR.json:r14_machine_day_ab). A fixed CPU-bound
    # 32-task job (~1s nominal) sees exactly that axis. Gated since
    # r15 via _CLEAN_SUSTAINED (band calibrated from the r14+r15
    # stamps, BENCH_SIDECAR.json:sustained_band).
    sustained = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(0, 400_000_000, 1, 32).selectExpr(
            "sum(id * 3 % 7)").collect()
        sustained = min(sustained, time.perf_counter() - t0)
    probe = {
        "spark_floor32_sec": round(floor, 3),
        "duckdb_10m_agg_sec": round(duck, 3),
        "spark_sustained32_sec": round(sustained, 3),
    }
    if with_loadavg:
        probe["loadavg_1m"] = load1
        probe["loadavg_5m"] = load5
    return probe


def _probe_is_clean(p: dict, gate_loadavg: bool = False) -> bool:
    """Instant-probe cleanliness; loadavg gates only when the probe is
    known-ambient (post-start loadavg is polluted by our own 32-thread
    passes and would read dirty forever)."""
    ok = (
        p["spark_floor32_sec"] <= _CLEAN_FLOOR32
        and p["duckdb_10m_agg_sec"] <= _CLEAN_DUCK
        # r15: the sustained-capacity probe gates too (VERDICT r14 #7)
        and p.get("spark_sustained32_sec", 0.0) <= _CLEAN_SUSTAINED
    )
    if gate_loadavg and p.get("loadavg_1m") is not None:
        try:
            ok = ok and float(p["loadavg_1m"]) < _CLEAN_LOAD1
        except ValueError:
            pass
    return ok


#: Headline set: one per operator family (SURVEY.md §2) — scan+agg+window,
#: joins incl. as-of, event windows, dedup (exact + minhash), text, vector.
HEADLINE = [
    "flagship_topn_pct",
    "groupby_multi_agg",
    "percentiles",
    "percentiles_approx",
    "outliers_iqr",
    "corr_matrix",
    "topn_by_count",
    "monthly_counts",
    "join_inner_fk",
    "join_broadcast_dim",
    "join_salted_skew",
    "join_asof",
    "window_rank_topn",
    "window_moving_avg",
    "window_tumbling_agg",
    "window_session_agg",
    "dedup_by_key",
    "dedup_text_exact",
    "dedup_minhash",
    "near_dedup_corpus",
    "decontaminate",
    "token_topn",
    "token_count_bpe",
    "tfidf_topk",
    "bigram_topn",
    "pii_scrub",
    "quality_filter",
    "sentiment_dist",
    "knn_cosine",
    "knn_cosine_lsh",
    "merge_upsert_snapshot",
    "linreg_by_group",
    "percentile_by_group",
    "sequence_pack",
    "join_range_binned",
    "interval_occupancy",
    "funnel_conversion",
    "sessionize_ids",
    "vocab_prune",
    "sample_weighted",
    "corpus_pipeline",
    "cosine_near_dup",
    "triangle_count",
    "gopher_quality_signals",
    "zipf_slope",
    # round-4 batch 3-5 scale-pattern queries
    "join_spatial_grid",
    "subquery_correlated_qty",
    "time_rollup_multigrain",
    "corpus_divergence",
    "intervals_merge",
    "segment_overlap",
    "embedding_quantize",
    "attribution_last_touch",
    "rolling_zscore",
    "session_path_topn",
    "doc_length_band_filter",
    "interarrival_stats",
    "source_mix_report",
    "promo_revenue_share",
    "supplier_revenue_concentration",
    "pareto_revenue_share",
    "repeat_purchase_rate",
    # round 6: TPC-H decision-support suite + LLM-prep batch
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q13_customer_distribution",
    "q19_disjunctive_revenue",
    "lang_id_confusion",
    "doc_chunk_overlap",
    "semantic_dedup_clusters",
    "basket_lift",
    "gini_concentration",
    "q4_order_priority",
    "q9_product_margin",
    "q21_waiting_suppliers",
    "bigram_surprisal",
    "split_leakage_audit",
    "hard_negative_mining",
    "heavy_hitters_sketch",
    "activity_streaks",
    "golden_record_merge",
    "lang_id_ngram",
    # round 7: ML-eval / feature-prep batch
    "roc_auc",
    "psi_drift",
    "woe_iv",
    "calibration_bins",
    "feature_hashing",
    "mutual_info",
    # round 11: re-registered on the lazy prefix path (VERDICT r10 #3)
    "histogram_equidepth",
    # round 14: bucketed-layout twins (VERDICT r13 #8) — the layout
    # write happens once in the un-recorded warm pass (stamped cache);
    # recorded passes measure the read-side, i.e. the deployment story
    "join_inner_fk_bucketed",
    "q21_bucketed",
    "q5_bucketed",
    # round 15: q9's orderkey-co-bucket twin (VERDICT r14 #1)
    "q9_bucketed",
]


def _pipeline_throughput(spark, n_listings: int = 100_000,
                         n_reviews: int = 200_000) -> dict:
    """Measure the Airbnb cleaning-pipeline throughput (BASELINE.md: the
    reference does the equivalent work at ~561 rows/s in row-wise
    pandas). Input synthesized once per run with the fixture value
    domains (messy prices/dates/amenities/bools) so the transforms do
    real work; timing covers transform + write to a temp parquet sink.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.plans.transforms import (
        transform_listings,
        transform_reviews,
    )

    i = F.col("id")
    s = lambda c: c.cast("string")  # noqa: E731
    listings = spark.range(n_listings).select(
        F.lit("x").alias("_id"),
        i.alias("id"),
        F.concat(F.lit("  Casa "), s(i)).alias("name"),
        F.when(i % 17 == 0, None).otherwise(F.lit("desc")).alias("description"),
        F.when(i % 2 == 0, "Cuauhtémoc").otherwise(
            F.concat(F.lit("Colonia "), s(i % 40))
        ).alias("neighbourhood_cleansed"),
        (F.lit(19.0) + (i % 100) / 100.0).alias("latitude"),
        F.lit(-99.1).alias("longitude"),
        F.when(i % 5 == 0, "Apartment").otherwise("Entire rental unit").alias(
            "property_type"
        ),
        F.when(i % 3 == 0, "Entire home/apt").when(i % 3 == 1, "Private room")
        .otherwise(F.lit(None).cast("string")).alias("room_type"),
        *[
            F.when(i % 13 == 0, "abc").otherwise(s(i % 9)).alias(c)
            for c in (
                "accommodates", "bedrooms", "beds", "minimum_nights",
                "maximum_nights", "availability_30", "availability_60",
                "availability_90", "availability_365",
            )
        ],
        F.when(i % 7 == 0, '["Fast wifi – 400 Mbps", "Air conditioning"]')
        .when(i % 7 == 1, "WiFi").when(i % 7 == 2, "")
        .otherwise(F.lit('["Kitchen", "TV", "Pool"]')).alias("amenities"),
        F.when(i % 11 == 0, F.lit(None).cast("string"))
        .when(i % 11 == 1, "N/A")
        .otherwise(F.concat(F.lit("$"), s(i % 6000), F.lit(".00")))
        .alias("price"),
        F.lit("2019-05-04").alias("host_since"),
        F.lit('{"$date": "2025-10-01T00:00:00Z"}').alias("calendar_last_scraped"),
        F.when(i % 23 == 0, "junk").otherwise(F.lit("2025-10-02")).alias(
            "last_scraped"
        ),
        F.when(i % 4 == 0, "t").when(i % 4 == 1, " True ").otherwise("f").alias(
            "host_is_superhost"
        ),
        F.lit("si").alias("host_identity_verified"),
        F.when(i % 9 == 0, F.lit(None).cast("string")).otherwise(F.lit("1")).alias(
            "has_availability"
        ),
        (4.0 + (i % 10) / 10.0).alias("review_scores_rating"),
        F.lit(1.2).alias("reviews_per_month"),
    )
    reviews = spark.range(n_reviews).select(
        F.lit("r").alias("_id"),
        i.alias("id"),
        (i % n_listings).alias("listing_id"),
        F.concat(
            F.lit("20"), F.lpad(s(11 + i % 14), 2, "0"), F.lit("-"),
            F.lpad(s(1 + i % 12), 2, "0"), F.lit("-"),
            F.lpad(s(1 + i % 28), 2, "0"),
        ).alias("date"),
        (i % 9999).alias("reviewer_id"),
        F.when(i % 31 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("ana "), s(i % 50))).alias("reviewer_name"),
        F.when(i % 6 == 0, "a good and excellent stay")
        .when(i % 6 == 1, "terrible, horrible place")
        .when(i % 6 == 2, F.lit(None).cast("string"))
        .otherwise(F.lit("plain comment text here")).alias("comments"),
    )

    out = tempfile.mkdtemp(prefix="bench_pipeline_")
    try:
        # Same methodology as the headline queries — pass 0 warms
        # codegen/JIT for the transform plans (cold whole-stage compile of
        # the 33-column transform is ~10 s of JVM work, not data work and
        # a one-time cost in any long-lived job) — PLUS an idle
        # convergence check (VERDICT r10 #6): min-of-2 alone left the
        # headline swinging 97k-152k rows/s with ambient sandbox load
        # (1.45x vs the fresh-JVM isolated twin). Recorded = min over
        # measured passes, and passes keep running (up to 5) until the
        # second-best is within 10% of the best — two agreeing passes
        # mean the measurement was taken at a quiet moment, the same
        # steady-state the isolated twin reports; a contended pass is
        # automatically retried instead of polluting the min's
        # denominator of 2.
        measured: list[float] = []
        for i in range(6):
            start = time.perf_counter()
            transform_listings(listings).write.mode("overwrite").parquet(
                os.path.join(out, "listings")
            )
            transform_reviews(reviews).write.mode("overwrite").parquet(
                os.path.join(out, "reviews")
            )
            if i > 0:
                measured.append(time.perf_counter() - start)
                if (
                    len(measured) >= 2
                    and sorted(measured)[1] <= min(measured) * 1.10
                ):
                    break
        elapsed = min(measured)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    rows = n_listings + n_reviews
    return {
        "rows": rows,
        "sec": round(elapsed, 3),
        "rows_per_sec": round(rows / elapsed, 1),
        # >2 ⇒ early passes disagreed >10% and were retried (ambient
        # contention was detected and waited out)
        "passes_measured": len(measured),
    }


def main() -> None:
    t_bench_start = time.perf_counter()

    def _budget_left() -> float:
        return _BENCH_BUDGET_SEC - (time.perf_counter() - t_bench_start)

    from etl_airbnb_mex_spark.queries import REGISTRY, _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    spark = get_spark(app_name="etl-airbnb-mex-spark-bench")
    # Warm the JVM, codegen, and parquet footers with a trivial action per
    # table so the first measured query doesn't pay session startup or
    # footer reads (metadata-only: count() never scans row data).
    from etl_airbnb_mex_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).count()

    # Clean-phase gate, part 1 (VERDICT r13 #1): probe AMBIENT phase
    # before any heavy bench work — the only moment loadavg separates
    # neighbor contention from our own 32 threads — and wait it out
    # (bounded) rather than record a number the stamp itself calls
    # contended. Every sample is kept for the sidecar band.
    phase_samples: list[dict] = []
    waited = 0.0
    ambient = _phase_probe(spark)
    ambient["at"] = "ambient"
    phase_samples.append(ambient)
    while (
        not _probe_is_clean(ambient, gate_loadavg=True)
        and waited < _PHASE_WAIT_SEC
        and _budget_left() > 300
    ):
        print(f"# phase dirty, waiting 20s (waited {waited:.0f}s): "
              f"{ambient}", file=sys.stderr)
        time.sleep(20)
        waited += 20
        ambient = _phase_probe(spark)
        ambient["at"] = "ambient"
        phase_samples.append(ambient)
    ambient_clean = _probe_is_clean(ambient, gate_loadavg=True)

    # Pipeline throughput runs FIRST, before the ~100-query headline
    # loop: measured after the loop it tracked the grown JVM heap /
    # code-cache state of whatever the registry did that round (r6→r8
    # "slide" root-caused in BENCH_SIDECAR.json:pipeline_isolated as
    # measurement context, transform plan unchanged since r6). First
    # position reproduces the isolated-twin conditions in-bench, so
    # the headline number stops moving with registry size
    # (VERDICT r9 #7).
    pipeline = _pipeline_throughput(spark)
    print(
        f"# pipeline: {pipeline['rows']} rows in {pipeline['sec']}s "
        f"({pipeline['rows_per_sec']} rows/s; reference 561 rows/s)",
        file=sys.stderr,
    )

    timings: dict[str, float] = {}
    query_errors: dict[str, str] = {}

    def _headline_pass(recorded: bool) -> None:
        for name in HEADLINE:
            if name in query_errors:
                continue  # already failed in an earlier pass
            spec = REGISTRY[name]
            try:
                start = time.perf_counter()
                df = spec.spark(spark, SF_DIR)
                # Full materialization to the driver (not count():
                # Catalyst would drop sorts/projections and
                # under-measure). toPandas uses the Arrow path — the
                # realistic consumption cost, not per-Row Python
                # object construction.
                n = len(df.toPandas())
                elapsed = time.perf_counter() - start
            except Exception as exc:  # noqa: BLE001
                # One broken query must NOT kill the whole artifact
                # (the round-3 "parsed": null disaster class): record
                # the failure and keep the headline line parseable.
                query_errors[name] = repr(exc)[:300]
                print(f"# {name}: FAILED {exc!r}"[:400], file=sys.stderr)
                continue
            if recorded:
                prev = timings.get(name)
                timings[name] = round(
                    elapsed if prev is None else min(prev, elapsed), 3
                )
                print(f"# {name}: {elapsed:.3f}s ({n} rows)",
                      file=sys.stderr)

    # Three passes: pass 0 warms JIT/codegen/page cache (standard
    # steady-state benchmarking; the DuckDB oracle likewise benefits from
    # a warm OS cache); the recorded number is the MIN of passes 1-2 —
    # ambient sandbox contention was measured to swing identical code
    # 2-3x between clean runs (VERDICT.md r2 "Performance"), and min-of-2
    # reports steady-state capability instead of scheduler luck.
    #
    # Clean-phase gate, part 2 (VERDICT r13 #1): the recorded passes
    # are BRACKETED by instant probes (floor + duck only — loadavg is
    # self-polluted from here on). A dirty bracket triggers up to
    # _MAX_EXTRA_PASSES more recorded passes, each bracketed, until a
    # clean bracket lands; min-of-passes then naturally prefers the
    # clean sample. All probes are recorded in the sidecar.
    _headline_pass(False)
    pre = _phase_probe(spark, with_loadavg=False)
    pre["at"] = "pre_pass"
    phase_samples.append(pre)
    _headline_pass(True)
    _headline_pass(True)
    post = _phase_probe(spark, with_loadavg=False)
    post["at"] = "post_pass"
    phase_samples.append(post)
    bracket_clean = _probe_is_clean(pre) and _probe_is_clean(post)
    extra_passes = 0
    # one recorded pass costs roughly total (the per-query mins); skip
    # extras when they would overrun the global budget
    while (
        not (ambient_clean and bracket_clean)
        and extra_passes < _MAX_EXTRA_PASSES
        and _budget_left() > max(60.0, 1.3 * sum(timings.values()))
    ):
        extra_passes += 1
        print(f"# bracket dirty (ambient_clean={ambient_clean}), extra "
              f"recorded pass {extra_passes}", file=sys.stderr)
        pre = _phase_probe(spark)
        pre["at"] = f"pre_extra_{extra_passes}"
        phase_samples.append(pre)
        _headline_pass(True)
        post = _phase_probe(spark, with_loadavg=False)
        post["at"] = f"post_extra_{extra_passes}"
        phase_samples.append(post)
        bracket_clean = _probe_is_clean(pre) and _probe_is_clean(post)
        if bracket_clean:
            # an extra bracket proves the instant phase; ambient
            # loadavg (pre-run) stays recorded but a clean bracketed
            # re-pass supersedes a dirty pre-run ambient wait-out
            ambient_clean = True
    run_clean = ambient_clean and bracket_clean
    phase = {
        # canonical stamp fields (consumers: VERDICT, scale notes) —
        # the WORST of the bracket actually covering the recorded
        # passes, plus the ambient loadavg (the only honest one)
        "spark_floor32_sec": max(
            pre["spark_floor32_sec"], post["spark_floor32_sec"]
        ),
        "duckdb_10m_agg_sec": max(
            pre["duckdb_10m_agg_sec"], post["duckdb_10m_agg_sec"]
        ),
        "spark_sustained32_sec": max(
            pre["spark_sustained32_sec"], post["spark_sustained32_sec"]
        ),
        "sustained_gate_sec": _CLEAN_SUSTAINED,
        "loadavg_1m": ambient.get("loadavg_1m"),
        "loadavg_5m": ambient.get("loadavg_5m"),
        "loadavg_is_ambient": True,
        "clean": run_clean,
        "extra_passes": extra_passes,
        "samples": phase_samples,
    }
    if not run_clean:
        phase["all_samples_contended"] = True
        if _budget_left() <= max(60.0, 1.3 * sum(timings.values())):
            phase["budget_exhausted"] = True
    print(f"# phase: {phase}", file=sys.stderr)
    total = sum(timings.values())

    # DuckDB oracle wall clocks for the same headline set (two passes,
    # second recorded — same steady-state methodology), so "within 2× of
    # the oracle" is measured per query in the artifact, not inferred.
    from etl_airbnb_mex_spark.oracle import duckdb_connection

    con = duckdb_connection(SF_DIR)
    oracle_timings: dict[str, float] = {}
    # a dirty run gets the oracle the same extra-pass courtesy — a
    # contended oracle denominator flatters the spark/oracle ratio.
    # The extras are budget-gated like the Spark extra passes (ADVICE
    # r14 #3): each is skipped once _budget_left() can no longer cover
    # another pass (estimated from the recorded oracle total so far),
    # so a dirty run cannot push the wall past _BENCH_BUDGET_SEC.
    oracle_passes = (False, True, True) + (True,) * extra_passes
    for i, recorded in enumerate(oracle_passes):
        if i >= 3 and _budget_left() < max(
            30.0, 1.3 * sum(oracle_timings.values())
        ):
            print(f"# oracle extra pass {i - 2} skipped: budget",
                  file=sys.stderr)
            break
        for name in HEADLINE:
            spec = REGISTRY[name]
            if spec.oracle is None or f"oracle:{name}" in query_errors:
                continue
            try:
                start = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                elapsed = time.perf_counter() - start
            except Exception as exc:  # noqa: BLE001
                query_errors[f"oracle:{name}"] = repr(exc)[:300]
                print(f"# oracle:{name}: FAILED {exc!r}"[:400],
                      file=sys.stderr)
                continue
            if recorded:
                prev = oracle_timings.get(name)
                oracle_timings[name] = round(
                    elapsed if prev is None else min(prev, elapsed), 3
                )
    con.close()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # The oracle-timing dict goes to a sidecar file + stderr, NOT the
    # headline JSON line: in round 3 it grew the line past the driver's
    # tail-capture buffer and truncated the artifact to "parsed": null
    # (VERDICT.md r3 "What's wrong" #2). The headline line must be the
    # LAST stdout line, compact, and small.
    # Merge-update by OWNERSHIP: bench.py regenerates only the keys it
    # owns (spark/oracle/pipeline/bench_commit/sf/errors) and preserves
    # every other top-level section untouched — those belong to the
    # scripts that wrote them (scale_bench, isolated_retime,
    # streaming_bench, qsuite_floor, bucketed_qsuite) and carry their
    # own commit stamps as the staleness signal (ADVICE.md r5 #3's
    # stray-key concern). The r10 form whitelisted the sections to
    # KEEP, which silently deleted any section added after the list
    # was written — the r11 bench run ate bucketed_layout that way
    # (caught by review); ownership inversion makes that class
    # impossible.
    head = _git_head()
    owned = {
        "spark": timings,
        "oracle": oracle_timings,
        "pipeline": pipeline,
        "bench_commit": head,
        "bench_phase": phase,
        "sf": sf,
    }
    if query_errors:
        owned["errors"] = query_errors
    sidecar = {}
    try:
        with open("BENCH_SIDECAR.json") as f:
            sidecar = json.load(f)
    except (OSError, ValueError):
        pass
    sidecar.pop("errors", None)  # stale errors must not outlive a clean run
    sidecar.update(owned)
    print("# sidecar: " + json.dumps(sidecar, separators=(",", ":")),
          file=sys.stderr)
    try:
        with open("BENCH_SIDECAR.json", "w") as f:
            json.dump(sidecar, f, separators=(",", ":"))
    except OSError:
        pass
    # The driver captures only the LAST 2000 chars of output and parses
    # the final line as JSON — the full ~100-query dict is ~2.5k chars,
    # which truncated the line and left "parsed": null in rounds 6-8
    # (VERDICT.md r8 "What's wrong" #6). The final line therefore
    # carries only the 25 SLOWEST queries (the ones a perf reader needs
    # first); the complete per-query map is in BENCH_SIDECAR.json under
    # "spark" (same commit stamp).
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:25]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "queries_full": "BENCH_SIDECAR.json:spark",
                "phase_clean": run_clean,
                "pipeline_rows_per_sec": pipeline["rows_per_sec"],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
