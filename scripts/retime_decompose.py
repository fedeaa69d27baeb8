#!/usr/bin/env python
"""Per-query wall + job/stage decomposition for ad-hoc optimization
A/Bs (r16): same REST-status methodology as qsuite_floor.py (warm pass
+ N measured passes under a job group; wall = min of measured passes;
the decomposition row comes from the LAST measured pass), but takes
query names on the command line so any headline query can be measured
without editing a list.

Usage:
  python scripts/retime_decompose.py [--sf DIR] [--passes N] name [name ...]

Prints one JSON object {name: {wall_sec, n_jobs, ...}}. Does NOT write
BENCH_SIDECAR.json — copy rows into round notes explicitly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _parse_ts(s: str) -> float:
    from datetime import datetime, timezone

    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def _union_intervals(iv: list[tuple[float, float]]) -> float:
    total = 0.0
    end = float("-inf")
    for a, b in sorted(iv):
        if a > end:
            total += b - a
            end = b
        elif b > end:
            total += b - end
            end = b
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from etl_airbnb_mex_spark.queries import REGISTRY, _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    spark = get_spark(
        app_name="retime-decompose",
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    app_id = _rest(base, "/applications")[0]["id"]

    out: dict[str, dict] = {}
    for name in args.names:
        spec = REGISTRY[name]
        spec.spark(spark, args.sf).toPandas()  # warm JIT/codegen/footers
        walls = []
        group = None
        for i in range(args.passes):
            group = f"{name}#{i}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            spec.spark(spark, args.sf).toPandas()
            walls.append(time.perf_counter() - t0)
            sc.setJobGroup("", "")
        jobs = [
            j for j in _rest(base, f"/applications/{app_id}/jobs")
            if j.get("jobGroup") == group
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
        out[name] = {
            "wall_sec": round(min(walls), 3),
            "walls": [round(w, 3) for w in walls],
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "n_tasks": sum(s["numTasks"] for s in stages.values()),
            "job_wall_sec": round(_union_intervals(intervals), 3),
            "gap_sec": round(walls[-1] - _union_intervals(intervals), 3),
            "executor_run_sec": round(
                sum(s["executorRunTime"] for s in stages.values()) / 1e3, 3),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in stages.values()) / 1e6, 2),
            "input_mb": round(
                sum(s["inputBytes"] for s in stages.values()) / 1e6, 2),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
