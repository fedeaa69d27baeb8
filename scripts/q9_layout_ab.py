#!/usr/bin/env python
"""q9 partsupp-side layout A/B (VERDICT r14 #1).

q9 is the one weak family with neither a falling-to-parity trend nor a
working deployment answer: the orderkey-bucketed layout buys it only
1.04x at sf24 even though its sf24 decomposition names a 989 MB
shuffle (qsuite_floor). The judge's hypothesis: the dominant shuffle
is the lineitem x part join ("partsupp's stand-in" — this schema has
no partsupp; q9's cost side is part.p_retailprice), so try lineitem
bucketed on l_partkey co-bucketed with part.

This script settles it with a measured four-way A/B of the IDENTICAL
registered logical plan (queries/decision.py:_q9_from_frames) over
four layouts:

  plain     plain parquet everywhere (the registered entry)
  ok        lineitem + orders co-bucketed on the orderkey (the r14
            registered-layout candidate)
  pk_bcast  lineitem bucketed on l_partkey, part broadcast as
            registered — what the partkey layout does to the
            registered plan (prediction: strictly worse — a broadcast
            join has NO shuffle to eliminate, and the layout forfeits
            the orderkey co-bucket, re-adding the 989 MB exchange)
  pk_smj    lineitem bucketed on l_partkey co-bucketed with part on
            p_partkey, part joined with a merge hint instead of
            broadcast — the honest "co-located partsupp join" reading
            (prediction: the partkey join was already shuffle-free via
            broadcast, so this only converts a broadcast probe into an
            SMJ and still re-adds the orderkey exchange)

Composite (l_partkey, l_suppkey) bucketing is strictly dominated and
not measured: Spark requires the join keys to CONTAIN every bucket
column for a bucketed join to avoid the exchange, and q9's part join
is on partkey alone — the composite satisfies neither the part join
nor the orderkey join.

Per variant: warm pass, one decomposed pass (REST status API under a
job group — jobs, shuffle write, executor time), one more timed pass;
wall = min of the two timed passes. All four results are asserted
identical (layout is an optimization, never a semantics change).
Results merge into BENCH_SIDECAR.json under "q9_layout_ab".

Usage: python scripts/q9_layout_ab.py [sf_dir ...]
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


def _phase_floor(spark) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 32 * 1000, 1, 32).selectExpr("sum(id)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


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
    p_bcast = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    li_ok = bucketed_table(spark, sf_dir, "li_ok")
    o_ok = bucketed_table(spark, sf_dir, "o_ok")
    li_pk = bucketed_table(spark, sf_dir, "li_pk")
    p_pk_smj = (
        bucketed_table(spark, sf_dir, "p_pk")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
        .hint("merge")
    )
    return {
        "plain": lambda: _q9_from_frames(li=li, o=o, s=s, n=n, p=p_bcast),
        "ok": lambda: _q9_from_frames(li=li_ok, o=o_ok, s=s, n=n, p=p_bcast),
        "pk_bcast": lambda: _q9_from_frames(
            li=li_pk, o=o, s=s, n=n, p=p_bcast
        ),
        "pk_smj": lambda: _q9_from_frames(
            li=li_pk, o=o, s=s, n=n, p=p_pk_smj
        ),
    }


def _n_exchanges(df) -> int:
    df.toPandas()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    )


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
            "exchanges": exch,
        }
        print(f"# {sf_dir} {vname}: {out[vname]}", file=sys.stderr,
              flush=True)
    baseline = results["plain"]
    for vname, rows in results.items():
        assert rows == baseline, f"layout changed q9's result: {vname}"
    out["floor32_post_sec"] = _phase_floor(spark)
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or [os.path.join(REPO, ".scaledata", "sf4")]
    from etl_airbnb_mex_spark.queries import _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    tiers: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        spark = get_spark(
            app_name=f"q9-layout-ab-{label}",
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
    ab = sidecar.setdefault("q9_layout_ab", {})
    ab["commit"] = head
    ab["method"] = (
        "scripts/q9_layout_ab.py: the registered q9 plan "
        "(_q9_from_frames) over four layouts — plain, orderkey "
        "co-bucket (li_ok+o_ok), partkey bucket with the registered "
        "broadcast part join (pk_bcast), partkey co-bucket with a "
        "merge-hinted part join (pk_smj). Fresh session per tier, warm "
        "pass + min of 2 timed passes, REST decomposition under a job "
        "group, results asserted identical across layouts."
    )
    ab.setdefault("tiers", {}).update(tiers)
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))
    print(json.dumps(tiers))


if __name__ == "__main__":
    main()
