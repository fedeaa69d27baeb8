#!/usr/bin/env python
"""Decompose the q-suite's flat-wall floor with numbers (VERDICT r10 #5).

q1/q5/q9/q21 sit at a ~5x sf4 geomean against a sub-second DuckDB
oracle on walls that barely move from sf0.1 to sf4 — the standing
claim is "the floor is multi-job scheduling, not plan cost". This
script replaces the claim with a per-query decomposition from Spark's
own event data (REST status API, spark.ui.enabled for this session
only):

per query (one warm pass, then one measured pass under a job group):
  - wall_sec          end-to-end toPandas wall
  - n_jobs            Spark jobs the plan scheduled (AQE stage
                      materializations + broadcast builds + result)
  - job_wall_sec      union of [submission, completion] job intervals
  - gap_sec           wall - job_wall: driver-side planning / AQE
                      re-optimization / Py4J round-trips BETWEEN jobs
  - executor_run_sec  sum of task executorRunTime across stages —
                      the actual compute the cluster would scale
  - executor_cpu_sec  sum of executorCpuTime (on-CPU fraction)
  - shuffle_mb        total shuffle write across stages
  - n_tasks /         true per-task scheduler delay (stage wall x
    stage_wall_sum_sec  slots - task time) is NOT separable from idle
                      slots at this API level; instead we report the
                      task count and the SUM of per-stage walls
                      (completionTime - submissionTime), so "many tiny
                      stages" reads directly as stage_wall_sum >>
                      executor_run / slots (ADVICE r11 #1 — the field
                      is now actually emitted).

The verdict's decision rule: if the floor is >= 3 sequential jobs of
scheduling (job_wall + gap >> executor_run), state it and stop chasing
sub-oracle walls at toy SF — a 1000-executor deployment amortizes the
same fixed job count over 10^6x the rows. Results merge into
BENCH_SIDECAR.json under "qsuite_floor".

Usage: python scripts/qsuite_floor.py [sf_dir ...]
(each dir is one tier; results nest under its basename, e.g. "sf4")
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q9_product_margin",
    "q21_waiting_suppliers",
    # the other two flat-wall weak-set entries the r10 verdict named:
    # both are floor-suspects (join_inner_fk 8.3x at sf4 on a 1.6 s
    # wall; roc_auc 15.5x on a 0.11 s oracle with a flat 1.5-2.2 s
    # wall across 20x data)
    "join_inner_fk",
    "roc_auc",
    # r13: copurchase_pairs' sf24 ratio ROSE (3.78x sf8 -> 5.59x sf24,
    # spark wall 14.4 -> 90.9 s on 3x data) — decompose whether the
    # superlinear growth is shuffle/spill or compute
    "copurchase_pairs",
    # r15: the bucketed twins — their residual walls at sf24+ need the
    # same job/gap/compute split as the plain entries they mitigate
    "join_inner_fk_bucketed",
    "q21_bucketed",
    "q5_bucketed",
    "q9_bucketed",
]


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _union_intervals(iv: list[tuple[float, float]]) -> float:
    """Total covered time of possibly-overlapping [a, b] intervals."""
    total = 0.0
    for a, b in sorted(iv):
        if not total or a > end:
            total += b - a
            end = b
        elif b > end:
            total += b - end
            end = b
    return total


def _parse_ts(s: str) -> float:
    # REST timestamps: "2026-08-15T19:00:00.123GMT"
    from datetime import datetime, timezone

    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def run_tier(spark, sf_dir: str) -> dict:
    from etl_airbnb_mex_spark.queries import REGISTRY

    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    app_id = _rest(base, "/applications")[0]["id"]

    out: dict[str, dict] = {}
    # QSUITE_ONLY=a,b restricts the run — at sf24+ the queries must
    # NOT share one 8g session (the r12 contamination finding), so
    # big-tier decompositions run one query per invocation
    only = {
        n for n in os.environ.get("QSUITE_ONLY", "").split(",") if n
    }
    for name in QUERIES:
        if only and name not in only:
            continue
        spec = REGISTRY[name]
        spec.spark(spark, sf_dir).toPandas()  # warm JIT/codegen/footers
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).toPandas()
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")

        jobs = [
            j for j in _rest(base, f"/applications/{app_id}/jobs")
            if j.get("jobGroup") == name
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = {
            s["stageId"]: s
            for s in _rest(base, f"/applications/{app_id}/stages")
            if s["stageId"] in stage_ids and s["status"] == "COMPLETE"
        }
        intervals = [
            (_parse_ts(j["submissionTime"]), _parse_ts(j["completionTime"]))
            for j in jobs
            if "submissionTime" in j and "completionTime" in j
        ]
        job_wall = _union_intervals(intervals)
        run_ms = sum(s["executorRunTime"] for s in stages.values())
        cpu_ns = sum(s["executorCpuTime"] for s in stages.values())
        shuf_w = sum(s["shuffleWriteBytes"] for s in stages.values())
        n_tasks = sum(s["numTasks"] for s in stages.values())
        stage_wall = sum(
            _parse_ts(s["completionTime"]) - _parse_ts(s["submissionTime"])
            for s in stages.values()
            if s.get("submissionTime") and s.get("completionTime")
        )
        out[name] = {
            "wall_sec": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "n_tasks": n_tasks,
            "stage_wall_sum_sec": round(stage_wall, 3),
            "job_wall_sec": round(job_wall, 3),
            "gap_sec": round(wall - job_wall, 3),
            "executor_run_sec": round(run_ms / 1e3, 3),
            "executor_cpu_sec": round(cpu_ns / 1e9, 3),
            "shuffle_write_mb": round(shuf_w / 1e6, 2),
        }
        print(f"# {sf_dir} {name}: {out[name]}", file=sys.stderr, flush=True)
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ]
    from etl_airbnb_mex_spark.queries import _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    tiers: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        # fresh session per tier: the REST job list is per-application,
        # and per-tier isolation keeps heap/code-cache state comparable
        spark = get_spark(
            app_name=f"qsuite-floor-{os.path.basename(sf_dir.rstrip('/'))}",
            extra_conf={"spark.ui.enabled": "true"},
        )
        tiers[os.path.basename(sf_dir.rstrip("/"))] = run_tier(spark, sf_dir)
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
    qf = sidecar.setdefault("qsuite_floor", {})
    qf["commit"] = head
    qf["method"] = (
        "scripts/qsuite_floor.py: warm pass + one measured pass per "
        "query under a job group, fresh session per tier; REST status "
        "API per-job intervals and per-stage executor metrics. "
        "gap_sec = wall minus the union of job "
        "[submission, completion] intervals = driver planning / AQE "
        "re-optimization / Py4J time between jobs."
    )
    # per-query merge inside each tier: a QSUITE_ONLY run must not
    # clobber the tier's previously-measured rows
    qt = qf.setdefault("tiers", {})
    for tier, rows in tiers.items():
        qt.setdefault(tier, {}).update(rows)
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))
    print(json.dumps({"qsuite_floor": tiers}, indent=1))


if __name__ == "__main__":
    main()
