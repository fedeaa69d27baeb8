#!/usr/bin/env python
"""q5_bucketed join-order A/B (VERDICT r14 #10).

q5_bucketed's one remaining data-scale exchange is the joined
lineitem-stream re-key to the custkey (named "unavoidable: the stream
leaves the orderkey domain"). The judge's counter-proposal: trade the
orderkey co-bucket for the custkey one — join orders ⋈ customer FIRST
on the o_ck/c_ck layouts (exchange-free), and pay the one exchange on
the much smaller oc stream re-keying to the orderkey instead.

Either ordering pays exactly ONE data-scale exchange (the stream that
leaves its key domain); they differ in which stream:

  fact_rooted   (registered r14 twin: li_ok + o_ok + c_ck)
                exchange carries li ⋈ ASIA-supplier ⋈ year-orders —
                ≈ |lineitem| x 20% x 1/7 rows
  custkey_first (li_ok + o_ck + c_ck)
                exchange carries year-orders ⋈ ASIA-customer —
                ≈ |orders| x 1/7 x 20% rows, ~4x fewer and narrower

Both run the SAME parameterized builder
(queries/decision.py:_q5_from_frames, custkey_first flag) and are
asserted result-identical. Results merge into BENCH_SIDECAR.json
under "q5_order_ab"; if custkey_first pays, the registered twin flips.

Usage: python scripts/q5_order_ab.py [sf_dir ...]
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

from qsuite_floor import _parse_ts, _rest, _union_intervals  # noqa: E402
from q9_layout_ab import _n_exchanges, _phase_floor  # noqa: E402


def _variants(spark, sf_dir):
    from etl_airbnb_mex_spark.queries.bucketed import bucketed_table
    from etl_airbnb_mex_spark.queries.decision import _q5_from_frames
    from etl_airbnb_mex_spark.tables import load_table

    li_ok = bucketed_table(spark, sf_dir, "li_ok")
    o_ok = bucketed_table(spark, sf_dir, "o_ok")
    o_ck = bucketed_table(spark, sf_dir, "o_ck")
    c_ck = bucketed_table(spark, sf_dir, "c_ck")
    s = load_table(spark, sf_dir, "supplier")
    return {
        "fact_rooted": lambda: _q5_from_frames(
            spark, sf_dir, li=li_ok, o=o_ok, c=c_ck, s=s
        ),
        "custkey_first": lambda: _q5_from_frames(
            spark, sf_dir, li=li_ok, o=o_ck, c=c_ck, s=s,
            custkey_first=True,
        ),
    }


def run_tier(spark, sf_dir: str) -> dict:
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    app_id = _rest(base, "/applications")[0]["id"]

    out: dict[str, dict] = {"floor32_ambient_sec": _phase_floor(spark)}
    results: dict[str, list] = {}
    for vname, fn in _variants(spark, sf_dir).items():
        df = fn()
        exch = _n_exchanges(df)  # executes once = warm
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
    assert results["custkey_first"] == results["fact_rooted"], (
        "join order changed q5's result"
    )
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
            app_name=f"q5-order-ab-{label}",
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
    ab = sidecar.setdefault("q5_order_ab", {})
    ab["commit"] = head
    ab["method"] = (
        "scripts/q5_order_ab.py: the parameterized q5 builder "
        "(_q5_from_frames) in both join orders over the bucketed "
        "layouts — fact_rooted (li_ok+o_ok+c_ck, the r14 twin) vs "
        "custkey_first (li_ok+o_ck+c_ck). Fresh session per tier, "
        "warm pass + min of 2, REST decomposition under a job group, "
        "results asserted identical."
    )
    ab.setdefault("tiers", {}).update(tiers)
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))
    print(json.dumps(tiers))


if __name__ == "__main__":
    main()
