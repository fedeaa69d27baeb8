#!/usr/bin/env python
"""Scale-trend benchmark: the heavyweight queries at sf0.1 / sf0.5 /
sf1 (and an opt-in sf2 crossover-trajectory tier), Spark vs the DuckDB
oracle on the SAME parquet inputs (VERDICT r6 "Next round" #2).

Every per-query gap recorded at sf0.1 has carried the argument "the
distributed machinery's fixed overhead amortizes with volume while the
single-process oracle grows linearly" — this script replaces the
argument with a measurement. Inputs above sf0.1 come from
scripts/make_scaledata.py (tiled, replica-shifted, cross-replica
near-dup structure removed — see its docstring for the data model).

Methodology (bench.py conventions): one Spark session per SF tier,
warm pass 0, record min of passes 1-2, full toPandas materialization;
DuckDB side runs the registered oracle SQL through the same
duckdb_connection() view registration, warm + min of 2. Queries with
no oracle SQL (minhash/xxhash64-based) record the Spark-only growth
slope — for those the claim is "wall grows sublinearly vs data", not a
ratio.

Results merge into BENCH_SIDECAR.json under "scale_trend".

Usage:
    python scripts/scale_bench.py              # all tiers, all queries
    python scripts/scale_bench.py 1.0          # one tier
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: sf label -> parquet dir
TIERS = {
    "0.1": "/root/testdata/sf0.1",
    "0.5": os.path.join(REPO, ".scaledata", "sf0.5"),
    "1.0": os.path.join(REPO, ".scaledata", "sf1"),
    # crossover-trajectory tier (measured on demand, not by default)
    "2.0": os.path.join(REPO, ".scaledata", "sf2"),
}
#: tiers run when none are named on the CLI (sf2 is opt-in)
DEFAULT_TIERS = ["0.1", "0.5", "1.0"]

#: The ten heavyweights named by VERDICT r6 (the compute-real tail
#: whose sf0.1 Spark/DuckDB ratios the round-6 judge flagged).
HEAVY = [
    "lang_id_ngram",
    "cosine_near_dup",
    "corpus_pipeline",
    "near_dedup_corpus",
    "dedup_minhash",
    "triangle_count",
    "semantic_dedup_clusters",
    "basket_lift",
    "split_leakage_audit",
    "gini_concentration",
    # r7 ML-eval heavyweight: distributed rank AUC
    "roc_auc",
]


def _extra_queries():
    """Non-registry variants that exist only for the scale trend.

    cosine_near_dup_b6: the registered cosine_near_dup fixes
    bits_per_table=4 → 16 buckets/table, so above ~16k vectors the
    hot-bucket guard (max_bucket=1000) starts DROPPING buckets and the
    measured work collapses — the documented LSH scale axis is "raise
    bits with n", so the trend is measured here with 6 bits / 64
    buckets per table (uniform occupancy ~312 at sf1), identical
    params at every tier for an apples-to-apples slope. Same operator,
    same oracle generator, exact hash parity.
    """
    from etl_airbnb_mex_spark.operators.similarity import (
        cosine_near_dup_bucketed,
    )
    from etl_airbnb_mex_spark.queries.extensions import (
        _bucketed_near_dup_sql,
        _fixed_planes,
    )
    from etl_airbnb_mex_spark.tables import load_table

    def spark_fn(spark, sf_dir):
        return cosine_near_dup_bucketed(
            load_table(spark, sf_dir, "embeddings"),
            planes=_fixed_planes(n=12), bits_per_table=6,
            threshold=0.3, max_bucket=1000,
        )

    def auc_quant_fn(spark, sf_dir):
        """roc_auc with the documented scale axis applied: scores
        quantized to the nearest 10 before ranking (replica-shifted
        prices otherwise make distinct-score cardinality ~ n, and the
        rank frame stops reducing — the sf2 probe's finding). Exact
        tie-group average ranks survive quantization unchanged; same
        sort-rank pipeline as the registered query."""
        from pyspark.sql import Window, functions as F

        from etl_airbnb_mex_spark.tables import load_table

        spark_parts = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        g = (
            load_table(spark, sf_dir, "lineitem")
            .select(
                F.round(F.col("l_extendedprice"), -1).alias("score"),
                F.when(F.col("l_returnflag") == "R", 1)
                .otherwise(0).alias("y"),
            )
            .groupBy("score")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("y").cast("long").alias("np"),
            )
            .repartitionByRange(spark_parts, "score")
            .localCheckpoint()
        )
        totals = {
            r["pid"]: r["tn"]
            for r in g.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.sum("n").alias("tn"))
            .collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(totals):
            offsets[pid] = acc
            acc += totals[pid]
        part = g.withColumn("pid", F.spark_partition_id())
        off_expr = F.lit(0).cast("long")
        for pid, off in offsets.items():
            off_expr = F.when(
                F.col("pid") == pid, F.lit(off).cast("long")
            ).otherwise(off_expr)
        w = (
            Window.partitionBy("pid")
            .orderBy("score")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum = part.select(
            "n", "np",
            (off_expr + F.coalesce(F.sum("n").over(w), F.lit(0)))
            .alias("cum"),
        )
        t = cum.agg(
            F.sum(
                F.col("np")
                * (F.lit(2) * F.col("cum") + F.col("n") + F.lit(1))
            ).alias("pr2"),
            F.sum("np").alias("npos"),
            (F.sum("n") - F.sum("np")).alias("nneg"),
        )
        return t.select(
            F.col("npos").cast("bigint").alias("n_pos"),
            F.col("nneg").cast("bigint").alias("n_neg"),
            F.round(
                (F.col("pr2") - F.col("npos") * (F.col("npos") + 1))
                .cast("double")
                / (F.lit(2.0) * F.col("npos") * F.col("nneg")),
                6,
            ).alias("auc"),
        )

    auc_quant_sql = """
    WITH s AS (
      SELECT round(l_extendedprice, -1) AS score,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem),
    g AS (
      SELECT score, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS np
      FROM s GROUP BY score),
    c AS (
      SELECT n, np,
             CAST(coalesce(sum(n) OVER (ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cum
      FROM g),
    t AS (
      SELECT CAST(sum(np * (2 * cum + n + 1)) AS BIGINT) AS pr2,
             CAST(sum(np) AS BIGINT) AS npos,
             CAST(sum(n) - sum(np) AS BIGINT) AS nneg
      FROM c)
    SELECT npos AS n_pos, nneg AS n_neg,
           round(CAST(pr2 - npos * (npos + 1) AS DOUBLE)
                 / (2.0 * npos * nneg), 6) AS auc
    FROM t
    """

    return {
        "cosine_near_dup_b6": (
            spark_fn,
            _bucketed_near_dup_sql(
                _fixed_planes(n=12), bits_per_table=6,
                threshold=0.3, max_bucket=1000,
            ),
        ),
        "roc_auc_quantized": (auc_quant_fn, auc_quant_sql),
    }


def _time_spark(spec, spark, sf_dir: str) -> float:
    best = float("inf")
    for recorded in (False, True, True):
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).toPandas()
        dt = time.perf_counter() - t0
        if recorded:
            best = min(best, dt)
    return round(best, 3)


_DUCKDB_RUNNER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from etl_airbnb_mex_spark.oracle import duckdb_connection
con = duckdb_connection({sf_dir!r})
# long queries print a progress bar to stdout, corrupting the
# single-float protocol
con.execute("SET enable_progress_bar = false")
sql = sys.stdin.read()
best = float("inf")
for recorded in (False, True, True):
    t0 = time.perf_counter()
    con.execute(sql).fetch_df()
    dt = time.perf_counter() - t0
    if recorded:
        best = min(best, dt)
print(round(best, 3))
"""


def _time_duckdb(sql: str, sf_dir: str) -> float:
    """Time the oracle in a FRESH subprocess. In-process DuckDB shares
    RSS with the co-resident Spark JVM; once the heap has grown, large
    oracle joins spill and a 1-2 s query reads as 10-20 s (observed:
    triangle_count sf1 oracle 1.4 s fresh vs 22 s co-resident). A
    subprocess gives DuckDB the memory headroom a standalone baseline
    would actually have — the comparison the trend claims to make."""
    out = subprocess.run(
        [sys.executable, "-c",
         _DUCKDB_RUNNER.format(repo=REPO, sf_dir=sf_dir)],
        input=sql, capture_output=True, text=True, timeout=600,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr.strip()[-200:])
    return float(out.stdout.strip().splitlines()[-1])


def run_tier(label: str) -> dict:
    from etl_airbnb_mex_spark.queries import REGISTRY, _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    sf_dir = TIERS[label]
    only = {
        n for n in os.environ.get("SCALE_BENCH_ONLY", "").split(",") if n
    }
    spark = get_spark(app_name=f"scale-bench-sf{label}")
    out: dict[str, dict] = {}
    for name in HEAVY:
        if only and name not in only:
            continue
        spec = REGISTRY[name]
        row: dict[str, float | None] = {}
        try:
            row["spark_sec"] = _time_spark(spec, spark, sf_dir)
        except Exception as e:  # noqa: BLE001 — record, keep going
            row["spark_sec"] = None
            row["spark_err"] = f"{type(e).__name__}: {e}"[:200]
        if spec.oracle is not None:
            try:
                row["duckdb_sec"] = _time_duckdb(spec.oracle, sf_dir)
            except Exception as e:  # noqa: BLE001
                row["duckdb_sec"] = None
                row["duckdb_err"] = f"{type(e).__name__}: {e}"[:200]
        else:
            row["duckdb_sec"] = None
        if row.get("spark_sec") and row.get("duckdb_sec"):
            row["ratio"] = round(row["spark_sec"] / row["duckdb_sec"], 2)
        print(f"# sf{label} {name}: {row}", file=sys.stderr, flush=True)
        out[name] = row
        gc.collect()
    for name, (spark_fn, sql) in _extra_queries().items():
        if only and name not in only:
            continue
        row = {}
        try:
            class _Spec:  # duck-typed QuerySpec for _time_spark
                spark = staticmethod(spark_fn)
            row["spark_sec"] = _time_spark(_Spec, spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            row["spark_sec"] = None
            row["spark_err"] = f"{type(e).__name__}: {e}"[:200]
        try:
            row["duckdb_sec"] = _time_duckdb(sql, sf_dir)
        except Exception as e:  # noqa: BLE001
            row["duckdb_sec"] = None
            row["duckdb_err"] = f"{type(e).__name__}: {e}"[:200]
        if row.get("spark_sec") and row.get("duckdb_sec"):
            row["ratio"] = round(row["spark_sec"] / row["duckdb_sec"], 2)
        print(f"# sf{label} {name}: {row}", file=sys.stderr, flush=True)
        out[name] = row
        gc.collect()
    spark.stop()
    return out


def merge_sidecar(trend: dict) -> None:
    path = os.path.join(REPO, "BENCH_SIDECAR.json")
    try:
        with open(path) as f:
            sidecar = json.load(f)
    except (OSError, ValueError):
        sidecar = {}
    st = sidecar.setdefault("scale_trend", {})
    for label, rows in trend.items():
        st.setdefault(label, {}).update(rows)
    st["method"] = (
        "scripts/scale_bench.py: per-SF Spark session (local[32], "
        "get_spark parity conf), warm pass 0 + min of passes 1-2, full "
        "toPandas; DuckDB = registered oracle SQL on the SAME parquet, "
        "warm + min of 2 in a FRESH subprocess (co-resident timing "
        "understates DuckDB once the JVM heap grows — r7 fix). "
        "sf>0.1 inputs: scripts/make_scaledata.py (replica-shifted "
        "keys, cross-replica near-dup structure removed)."
    )
    try:
        st["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10, cwd=REPO,
        ).stdout.strip()
    except (OSError, subprocess.SubprocessError):
        pass
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))


def main() -> None:
    labels = sys.argv[1:] or DEFAULT_TIERS
    trend = {}
    for label in labels:
        if not os.path.isdir(TIERS[label]):
            print(f"# missing dir for sf{label}; run make_scaledata.py",
                  file=sys.stderr)
            continue
        trend[label] = run_tier(label)
    merge_sidecar(trend)
    print(json.dumps(trend, separators=(",", ":")))


if __name__ == "__main__":
    main()
