#!/usr/bin/env python
"""Cents-encoding A/B for the remaining non-parity join twins (r16,
r17 queue evidence).

q9's residual constant — per-row parquet-double decode + the
round()+cast chains — was retired by the cents-encoded layout
(sidecar q9_twin_ab; ratio 2.08→1.58 at sf24). The same constant is
plausibly a share of the other two twins still above parity at sf32
(join_inner_fk_bucketed 3.65×, q5_bucketed 3.12×): both hot loops are
`round(price·100)::long` chains over parquet doubles. This script
measures the transfer WITHOUT touching the registered plans (the r16
verification window is full; registration is an r17 decision):

  join_inner_fk arms (all over the c_ck co-bucket):
    twin    the registered builder over o_ck (full-width orders)
    cents   o_ck_cents — orders bucketed on o_custkey storing ONLY
            (o_custkey, o_totprice_e2 long), the cents conversion done
            at write time with the identical round()+cast
    aggmat  o_ck_agg — the per-custkey partial aggregate ITSELF
            materialized at write time (custkey, cnt, cents_sum),
            bucketed on custkey: the classic aggregation-table
            deployment move. Labeled clearly: unlike every other
            layout this is NOT row-preserving — it is a derived
            aggregate kept fresh by the same write-once pipeline; the
            query's remaining work is one co-bucketed join + a 5-row
            final agg.

  q5 arms (over li-side layouts; o_ok + c_ck held fixed):
    twin    the registered builder over li_ok (full-width lineitem)
    cents   li_ok_q9c reused verbatim — q5's revenue expression
            round(eprice·100)·(100−round(disc·100)) is EXACTLY
            l_eprice_e2·(100−l_disc_e2), so q9's layout already
            carries everything q5 needs (orderkey, suppkey, cents)

Every arm is asserted result-identical to its registered twin entry.
Methodology: bench conventions (warm pass + min of 2 timed passes),
REST decomposition under a job group, same-day DuckDB oracle sample,
phase floors bracketed. Results → BENCH_SIDECAR.json:join_cents_ab.

Usage: SPARK_DRIVER_MEM=24g python scripts/join_cents_ab.py [sf_dir ...]
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

from pyspark.sql import functions as F  # noqa: E402

from qsuite_floor import _parse_ts, _rest, _union_intervals  # noqa: E402

N_BUCKETS = 32


def _phase_floor(spark) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 32 * 1000, 1, 32).selectExpr("sum(id)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _expo_table(spark, sf_dir, name, src_table, keys, build_df):
    """Write-once experimental bucketed copy (same stamp discipline as
    queries/bucketed.py, local to this A/B)."""
    from etl_airbnb_mex_spark.queries.bucketed import (
        _cache_root,
        _label,
        _src_sig,
        assert_one_file_per_bucket,
    )
    from etl_airbnb_mex_spark.sources.writers import write_bucketed_table

    tname = f"jcab_{_label(sf_dir)}_{name}"
    path = os.path.join(_cache_root(), _label(sf_dir), f"jcab_{name}")
    stamp_path = path + "_STAMP.json"
    sig = _src_sig(sf_dir, src_table)

    def _stamp_ok():
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
        keys_sql = ", ".join(f"`{k}`" for k in keys)
        spark.sql(
            f"CREATE TABLE `{tname}` ({cols_sql}) USING parquet "
            f"CLUSTERED BY ({keys_sql}) SORTED BY ({keys_sql}) "
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
        build_df(), tname, keys,
        n_buckets=N_BUCKETS, sort_cols=keys, path=path,
    )
    assert_one_file_per_bucket(path, f"{tname} (fresh write)")
    with open(stamp_path, "w") as f:
        json.dump({"src_sig": sig, "n_buckets": N_BUCKETS}, f)
    return spark.table(tname)


def _jif_cents(o_cents, c):
    """join_inner_fk with the totalprice pre-encoded as cents longs —
    mirrors _join_inner_fk_from_frames minus the round()+cast."""
    c = c.hint("SHUFFLE_HASH")
    per_cust = o_cents.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("o_totprice_e2").alias("__cents"),
    )
    return (
        per_cust.join(c, F.col("o_custkey") == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.sum("__cnt").alias("cnt"),
            (F.sum("__cents").cast("double") / F.lit(100.0)).alias(
                "revenue"
            ),
        )
        .orderBy("c_mktsegment")
    )


def _jif_aggmat(o_agg, c):
    """join_inner_fk over the MATERIALIZED per-custkey aggregate —
    the join and final rollup are all that remains at read time."""
    c = c.hint("SHUFFLE_HASH")
    return (
        o_agg.join(c, F.col("o_custkey") == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.sum("__cnt").alias("cnt"),
            (F.sum("__cents").cast("double") / F.lit(100.0)).alias(
                "revenue"
            ),
        )
        .orderBy("c_mktsegment")
    )


def _q5_cents(spark, sf_dir, li_cents, o, c, s):
    """q5's registered fact-rooted plan with the revenue inputs read
    as cents longs from li_ok_q9c (identical integer arithmetic:
    rev_e4 = eprice_e2·(100−disc_e2)); dims resolved driver-side
    exactly as decision._q5_from_frames does."""
    from etl_airbnb_mex_spark.tables import read_dim_driver_side

    nations = read_dim_driver_side(
        spark, sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]
    )
    asia_rk = {
        row["r_regionkey"]
        for row in read_dim_driver_side(
            spark, sf_dir, "region", ["r_regionkey", "r_name"]
        )
        if row["r_name"] == "ASIA"
    }
    dim_rows = [r for r in nations if r["n_regionkey"] in asia_rk]
    asia_keys = sorted(r["n_nationkey"] for r in dim_rows)
    name_expr = F.create_map(
        *[
            F.lit(x)
            for row in sorted(dim_rows, key=lambda t: t["n_nationkey"])
            for x in (row["n_nationkey"], row["n_name"])
        ]
    )[F.col("s_nationkey")]
    c = c.select("c_custkey", "c_nationkey").filter(
        F.col("c_nationkey").isin(asia_keys)
    )
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = li_cents.select(
        "l_orderkey", "l_suppkey", "l_eprice_e2", "l_disc_e2"
    )
    s = s.select("s_suppkey", "s_nationkey").filter(
        F.col("s_nationkey").isin(asia_keys)
    )
    rev_e4 = F.col("l_eprice_e2") * (F.lit(100) - F.col("l_disc_e2"))
    joined = (
        li.join(s, F.col("l_suppkey") == s["s_suppkey"])
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c,
            (F.col("o_custkey") == c["c_custkey"])
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(
            (F.sum(rev_e4).cast("double") / F.lit(10000.0)).alias("revenue")
        )
        .select(name_expr.alias("n_name"), "revenue")
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def _n_exchanges(df) -> int:
    df.toPandas()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    )


def _oracle_sec(sf_dir, name) -> float:
    from etl_airbnb_mex_spark.oracle import duckdb_connection
    from etl_airbnb_mex_spark.queries import REGISTRY, _load

    _load()
    sql = REGISTRY[name].oracle
    best = float("inf")
    for _ in range(2):
        con = duckdb_connection(sf_dir)
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
        con.close()
    return round(best, 3)


def run_tier(spark, sf_dir: str) -> dict:
    from etl_airbnb_mex_spark.queries import REGISTRY, _load
    from etl_airbnb_mex_spark.queries.bucketed import bucketed_table
    from etl_airbnb_mex_spark.queries.extensions import (
        _join_inner_fk_from_frames,
    )
    from etl_airbnb_mex_spark.queries import decision as _decision
    from etl_airbnb_mex_spark.tables import load_table

    _load()
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    app_id = _rest(base, "/applications")[0]["id"]

    o_ck = bucketed_table(spark, sf_dir, "o_ck")
    c_ck = bucketed_table(spark, sf_dir, "c_ck")
    li_ok = bucketed_table(spark, sf_dir, "li_ok")
    o_ok = bucketed_table(spark, sf_dir, "o_ok")
    li_q9c = bucketed_table(spark, sf_dir, "li_ok_q9c")
    o_cents = _expo_table(
        spark, sf_dir, "o_ck_cents", "orders", ("o_custkey",),
        lambda: load_table(spark, sf_dir, "orders").select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long")
            .alias("o_totprice_e2"),
        ),
    )
    o_agg = _expo_table(
        spark, sf_dir, "o_ck_agg", "orders", ("o_custkey",),
        lambda: load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("__cents"),
        ),
    )
    s = load_table(spark, sf_dir, "supplier")

    cases = {
        "jif_twin": (
            "join_inner_fk",
            lambda: _join_inner_fk_from_frames(o=o_ck, c=c_ck),
        ),
        "jif_cents": (
            "join_inner_fk",
            lambda: _jif_cents(o_cents, c_ck),
        ),
        "jif_aggmat": (
            "join_inner_fk",
            lambda: _jif_aggmat(o_agg, c_ck),
        ),
        "q5_twin": (
            "q5_local_supplier_volume",
            lambda: _decision._q5_from_frames(
                spark, sf_dir, li=li_ok, o=o_ok, c=c_ck, s=s
            ),
        ),
        "q5_cents": (
            "q5_local_supplier_volume",
            lambda: _q5_cents(spark, sf_dir, li_q9c, o_ok, c_ck, s),
        ),
    }

    out: dict[str, dict] = {"floor32_ambient_sec": _phase_floor(spark)}
    reg_results: dict[str, list] = {}
    for vname, (reg_name, fn) in cases.items():
        df = fn()
        exch = _n_exchanges(df)  # executes once = warm
        sc.setJobGroup(vname, vname)
        t0 = time.perf_counter()
        pdf = fn().toPandas()
        wall1 = time.perf_counter() - t0
        sc.setJobGroup("", "")
        if reg_name not in reg_results:
            reg_results[reg_name] = (
                REGISTRY[reg_name].spark(spark, sf_dir).toPandas()
                .values.tolist()
            )
        assert pdf.values.tolist() == reg_results[reg_name], (
            f"{vname} diverged from registered {reg_name}"
        )
        jobs = [
            j for j in _rest(base, f"/applications/{app_id}/jobs")
            if j.get("jobGroup") == vname
        ]
        stage_ids = sorted({x for j in jobs for x in j["stageIds"]})
        stages = [
            st for st in _rest(base, f"/applications/{app_id}/stages")
            if st["stageId"] in stage_ids and st["status"] == "COMPLETE"
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
                sum(st["executorRunTime"] for st in stages) / 1e3, 3
            ),
            "executor_cpu_sec": round(
                sum(st["executorCpuTime"] for st in stages) / 1e9, 3
            ),
            "shuffle_write_mb": round(
                sum(st["shuffleWriteBytes"] for st in stages) / 1e6, 2
            ),
            "input_mb": round(
                sum(st["inputBytes"] for st in stages) / 1e6, 2
            ),
            "exchanges": exch,
        }
        print(f"# {sf_dir} {vname}: {out[vname]}", file=sys.stderr,
              flush=True)
    out["oracle_join_inner_fk_sec"] = _oracle_sec(sf_dir, "join_inner_fk")
    out["oracle_q5_sec"] = _oracle_sec(sf_dir, "q5_local_supplier_volume")
    out["floor32_post_sec"] = _phase_floor(spark)
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or [os.path.join(REPO, ".scaledata", "sf24")]
    from etl_airbnb_mex_spark.session import get_spark

    tiers: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        spark = get_spark(
            app_name=f"join-cents-ab-{label}",
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
    ab = sidecar.setdefault("join_cents_ab", {})
    ab["commit"] = head
    ab["method"] = (
        "scripts/join_cents_ab.py: cents-encoding transfer test on the "
        "two non-parity join twins — join_inner_fk over o_ck_cents "
        "(write-time cents) and o_ck_agg (materialized per-custkey "
        "aggregate, labeled non-row-preserving), q5 over li_ok_q9c "
        "(q9's cents layout reused — the revenue expression is the "
        "same integer arithmetic). All arms asserted result-identical "
        "to the registered entries; warm + min of 2, REST "
        "decomposition, same-day oracle samples. Measure-only in r16 "
        "(window full); registration is the r17 decision."
    )
    ab.setdefault("tiers", {}).update(tiers)
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))
    print(json.dumps(tiers))


if __name__ == "__main__":
    main()
