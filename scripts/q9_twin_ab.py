#!/usr/bin/env python
"""q9_bucketed residual-constant A/B (VERDICT r15 #3).

q9's orderkey co-bucket twin is the one registered bucketed twin still
above 2x vs the single-process oracle at its largest clean tier (2.18x
at sf32) with its residual named only generically ("compute-dominated,
AQE-unmoved", r15_aqe_ab). This script A/Bs the remaining candidate
levers ON THE TWIN'S FRAMES (li_ok + o_ok co-bucket held fixed) so the
constant gets q1-class precision:

  twin     the registered q9_bucketed: full-width lineitem bucketed on
           l_orderkey (li_ok) + o_ok; margin computed from the double
           columns per row (round -> cents longs -> int arithmetic)
  narrow   lineitem copy bucketed on l_orderkey carrying ONLY the six
           q9 columns. Parquet scans are columnar, so if column
           pruning is doing its job this arm isolates pure row-group /
           page-layout effects — an honest control for "the fix is a
           narrow copy" claims: expected ~0.
  cents    lineitem copy bucketed on l_orderkey storing the margin
           inputs PRE-ENCODED as integer cents (l_eprice_e2,
           l_disc_e2, l_qty longs, computed at write time with the
           IDENTICAL round()+cast expressions the registered plan
           applies per scan). Isolates the scan-decode +
           per-row-arithmetic lever: longs delta-encode tighter than
           doubles and the hot loop drops three round()+cast chains.
  preagg   li_ok unchanged, but margin partial-aggregated by
           (l_orderkey, l_suppkey) immediately after the broadcast
           part join, BEFORE the orders join — legal because order
           year is functionally dependent on l_orderkey and nation on
           l_suppkey; tests the "shuffle-free partial agg on the
           bucketed side" hypothesis (the agg inherits the bucket
           partitioning, so it adds no exchange — it can only pay if
           (orderkey, suppkey) collapses enough lineitem rows).
  plain    the registered plain q9 (same session, same phase) so the
           arms carry a same-day anchor against the recorded 3.95x.

Every arm is asserted result-identical to the registered plain plan
(the cents encoding reuses the exact round()+cast chain, so the
integer arithmetic is bit-identical). Per arm: warm pass, one REST-
decomposed pass under a job group (jobs, shuffle write, input bytes,
executor run/cpu), one more timed pass; wall = min of the 2 timed
passes. The DuckDB oracle runs the registered q9 SQL on the same tier
(min of 2) for a same-day ratio stamp. Results merge into
BENCH_SIDECAR.json under "q9_twin_ab".

The experimental lineitem copies are written once per tier into
.scaledata/bkt/ alongside the standard layouts (same stamp discipline,
same one-file-per-bucket invariant); writing at sf24/sf32 needs the
big driver heap (SPARK_DRIVER_MEM=24g, scripts/prewarm_bkt.py note).

Usage: SPARK_DRIVER_MEM=24g python scripts/q9_twin_ab.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from qsuite_floor import _parse_ts, _rest, _union_intervals  # noqa: E402

N_BUCKETS = 32
Q9_COLS = (
    "l_orderkey", "l_suppkey", "l_partkey",
    "l_quantity", "l_extendedprice", "l_discount",
)


def _phase_floor(spark) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 32 * 1000, 1, 32).selectExpr("sum(id)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _expo_table(spark, sf_dir: str, name: str, build_df) -> DataFrame:
    """Write-once experimental bucketed lineitem copy (same cache/stamp
    discipline as queries/bucketed.py, local to this A/B)."""
    from etl_airbnb_mex_spark.queries.bucketed import (
        _cache_root,
        _label,
        _src_sig,
        assert_one_file_per_bucket,
    )
    from etl_airbnb_mex_spark.sources.writers import write_bucketed_table

    tname = f"q9ab_{_label(sf_dir)}_{name}"
    path = os.path.join(_cache_root(), _label(sf_dir), f"q9ab_{name}")
    stamp_path = path + "_STAMP.json"
    sig = _src_sig(sf_dir, "lineitem")

    def _stamp_ok() -> bool:
        try:
            with open(stamp_path) as f:
                return json.load(f).get("src_sig") == sig
        except (OSError, ValueError):
            return False

    if spark.catalog.tableExists(tname) and _stamp_ok():
        assert_one_file_per_bucket(path, tname)
        return spark.table(tname)
    if _stamp_ok() and os.path.isdir(path):
        assert_one_file_per_bucket(path, f"{tname} (re-attach)")
        df = build_df()
        cols_sql = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
        )
        spark.sql(
            f"CREATE TABLE `{tname}` ({cols_sql}) USING parquet "
            f"CLUSTERED BY (`l_orderkey`) SORTED BY (`l_orderkey`) "
            f"INTO {N_BUCKETS} BUCKETS LOCATION '{path}'"
        )
        return spark.table(tname)
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    try:
        os.remove(stamp_path)
    except OSError:
        pass
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_bucketed_table(
        build_df(), tname, ("l_orderkey",),
        n_buckets=N_BUCKETS, sort_cols=("l_orderkey",), path=path,
    )
    assert_one_file_per_bucket(path, f"{tname} (fresh write)")
    with open(stamp_path, "w") as f:
        json.dump({"src_sig": sig, "n_buckets": N_BUCKETS}, f)
    return spark.table(tname)


def _q9_cents(li_cents, o, s, n, p) -> DataFrame:
    """The registered q9 plan with the margin inputs pre-encoded as
    cents longs at write time — the per-row expression drops the three
    round()+cast chains; everything else mirrors _q9_from_frames."""
    o = o.select("o_orderkey", "o_orderdate")
    s = s.select("s_suppkey", "s_nationkey")
    margin_e4 = (
        F.col("l_eprice_e2")
        * (F.lit(100) - F.col("l_disc_e2"))
        - F.col("l_qty")
        * F.round(F.col("p_retailprice") * 100).cast("long")
        * F.lit(100)
    )
    fact = li_cents.join(
        p, F.col("l_partkey") == F.col("p_partkey")
    ).select("l_orderkey", "l_suppkey", margin_e4.alias("__margin_e4"))
    o_year = o.select("o_orderkey", F.year("o_orderdate").alias("__yr"))
    return (
        fact.join(o_year, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name", F.col("__yr").cast("string").alias("order_year")
        )
        .agg(
            (F.sum("__margin_e4").cast("double") / F.lit(10000.0))
            .alias("margin")
        )
        .orderBy("n_name", "order_year")
    )


def _q9_cents_preagg(li_cents, o, s, n, p) -> DataFrame:
    """cents + preagg combined: the sf4 smoke showed both levers are
    real (cents -19% wall, preagg -24% executor time) and they compose
    — cents cuts per-row decode+arithmetic, preagg cuts rows entering
    the orders join."""
    o = o.select("o_orderkey", "o_orderdate")
    s = s.select("s_suppkey", "s_nationkey")
    margin_e4 = (
        F.col("l_eprice_e2")
        * (F.lit(100) - F.col("l_disc_e2"))
        - F.col("l_qty")
        * F.round(F.col("p_retailprice") * 100).cast("long")
        * F.lit(100)
    )
    fact = (
        li_cents.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "l_suppkey", margin_e4.alias("__m"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("__m").alias("__margin_e4"))
    )
    o_year = o.select("o_orderkey", F.year("o_orderdate").alias("__yr"))
    return (
        fact.join(o_year, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name", F.col("__yr").cast("string").alias("order_year")
        )
        .agg(
            (F.sum("__margin_e4").cast("double") / F.lit(10000.0))
            .alias("margin")
        )
        .orderBy("n_name", "order_year")
    )


def _q9_preagg(li, o, s, n, p) -> DataFrame:
    """The registered plan with margin partial-aggregated by
    (l_orderkey, l_suppkey) before the orders join — inherits the
    bucket partitioning on l_orderkey, so the extra aggregate adds NO
    exchange; valid because year is functional in orderkey and nation
    in suppkey."""
    li = li.select(*Q9_COLS)
    o = o.select("o_orderkey", "o_orderdate")
    s = s.select("s_suppkey", "s_nationkey")
    margin_e4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        - F.round(F.col("l_quantity")).cast("long")
        * F.round(F.col("p_retailprice") * 100).cast("long")
        * F.lit(100)
    )
    fact = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "l_suppkey", margin_e4.alias("__m"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("__m").alias("__margin_e4"))
    )
    o_year = o.select("o_orderkey", F.year("o_orderdate").alias("__yr"))
    return (
        fact.join(o_year, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name", F.col("__yr").cast("string").alias("order_year")
        )
        .agg(
            (F.sum("__margin_e4").cast("double") / F.lit(10000.0))
            .alias("margin")
        )
        .orderBy("n_name", "order_year")
    )


def _variants(spark, sf_dir):
    from etl_airbnb_mex_spark.queries.bucketed import bucketed_table
    from etl_airbnb_mex_spark.queries.decision import _q9_from_frames
    from etl_airbnb_mex_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    li_ok = bucketed_table(spark, sf_dir, "li_ok")
    o_ok = bucketed_table(spark, sf_dir, "o_ok")
    li_narrow = _expo_table(
        spark, sf_dir, "narrow",
        lambda: load_table(spark, sf_dir, "lineitem").select(*Q9_COLS),
    )
    li_cents = _expo_table(
        spark, sf_dir, "cents",
        lambda: load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_partkey",
            F.round(F.col("l_extendedprice") * 100).cast("long")
            .alias("l_eprice_e2"),
            F.round(F.col("l_discount") * 100).cast("long")
            .alias("l_disc_e2"),
            F.round(F.col("l_quantity")).cast("long").alias("l_qty"),
        ),
    )
    return {
        "plain": lambda: _q9_from_frames(li=li, o=o, s=s, n=n, p=p),
        "twin": lambda: _q9_from_frames(li=li_ok, o=o_ok, s=s, n=n, p=p),
        "narrow": lambda: _q9_from_frames(
            li=li_narrow, o=o_ok, s=s, n=n, p=p
        ),
        "cents": lambda: _q9_cents(li_cents, o_ok, s, n, p),
        "preagg": lambda: _q9_preagg(li_ok, o_ok, s, n, p),
        "cents_preagg": lambda: _q9_cents_preagg(li_cents, o_ok, s, n, p),
    }


def _n_exchanges(df) -> int:
    df.toPandas()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    )


def _oracle_q9_sec(sf_dir: str) -> float:
    import duckdb

    from etl_airbnb_mex_spark.oracle import duckdb_connection
    from etl_airbnb_mex_spark.queries import REGISTRY, _load

    _load()
    sql = REGISTRY["q9_product_margin"].oracle
    best = float("inf")
    for _ in range(2):
        con = duckdb_connection(sf_dir)
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
        con.close()
    return round(best, 3)


def run_tier(spark, sf_dir: str) -> dict:
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    app_id = _rest(base, "/applications")[0]["id"]

    out: dict[str, dict] = {"floor32_ambient_sec": _phase_floor(spark)}
    results: dict[str, list] = {}
    for vname, fn in _variants(spark, sf_dir).items():
        df = fn()
        exch = _n_exchanges(df)  # executes once = warm (JIT + footers)
        sc.setJobGroup(vname, vname)
        t0 = time.perf_counter()
        pdf = fn().toPandas()
        wall1 = time.perf_counter() - t0
        sc.setJobGroup("", "")
        results[vname] = pdf.values.tolist()
        jobs = [
            j for j in _rest(base, f"/applications/{app_id}/jobs")
            if j.get("jobGroup") == vname
        ]
        stage_ids = sorted({x for j in jobs for x in j["stageIds"]})
        stages = [
            s for s in _rest(base, f"/applications/{app_id}/stages")
            if s["stageId"] in stage_ids and s["status"] == "COMPLETE"
        ]
        job_wall = _union_intervals(
            [
                (
                    _parse_ts(j["submissionTime"]),
                    _parse_ts(j["completionTime"]),
                )
                for j in jobs
                if "submissionTime" in j and "completionTime" in j
            ]
        )
        t0 = time.perf_counter()
        fn().toPandas()
        wall2 = time.perf_counter() - t0
        out[vname] = {
            "wall_sec": round(min(wall1, wall2), 3),
            "n_jobs": len(jobs),
            "job_wall_sec": round(job_wall, 3),
            "executor_run_sec": round(
                sum(s["executorRunTime"] for s in stages) / 1e3, 3
            ),
            "executor_cpu_sec": round(
                sum(s["executorCpuTime"] for s in stages) / 1e9, 3
            ),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in stages) / 1e6, 2
            ),
            "input_mb": round(
                sum(s["inputBytes"] for s in stages) / 1e6, 2
            ),
            "exchanges": exch,
        }
        print(f"# {sf_dir} {vname}: {out[vname]}", file=sys.stderr,
              flush=True)
    baseline = results["plain"]
    for vname, rows in results.items():
        assert rows == baseline, f"arm changed q9's result: {vname}"
    out["oracle_q9_sec"] = _oracle_q9_sec(sf_dir)
    out["floor32_post_sec"] = _phase_floor(spark)
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or [os.path.join(REPO, ".scaledata", "sf24")]
    from etl_airbnb_mex_spark.queries import _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    tiers: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        spark = get_spark(
            app_name=f"q9-twin-ab-{label}",
            extra_conf={"spark.ui.enabled": "true"},
        )
        tiers[label] = run_tier(spark, sf_dir)
        spark.stop()

    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10, cwd=REPO,
        ).stdout.strip()
    except (OSError, subprocess.SubprocessError):
        head = "unknown"
    path = os.path.join(REPO, "BENCH_SIDECAR.json")
    try:
        with open(path) as f:
            sidecar = json.load(f)
    except (OSError, ValueError):
        sidecar = {}
    ab = sidecar.setdefault("q9_twin_ab", {})
    ab["commit"] = head
    ab["method"] = (
        "scripts/q9_twin_ab.py: the q9_bucketed twin's frames with the "
        "three residual levers A/B'd — narrow 6-column lineitem copy "
        "(scan-layout control), cents-encoded margin inputs "
        "(scan-decode + per-row arithmetic), (orderkey,suppkey) "
        "partial agg before the orders join (exchange-free by bucket "
        "inheritance) — plus plain and twin anchors and a same-day "
        "DuckDB oracle sample. Fresh session per tier, warm pass + min "
        "of 2 timed passes, REST decomposition under a job group, all "
        "arms asserted result-identical."
    )
    ab.setdefault("tiers", {}).update(tiers)
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))
    print(json.dumps(tiers))


if __name__ == "__main__":
    main()
