#!/usr/bin/env python
"""Isolated per-query re-timing — fresh JVM session per query.

In-bench timings at sf0.1 swing 5-40 % with ambient sandbox contention
even with min-of-2 (VERDICT.md r4 "Performance"); a query that looks
1.3x slower in a 62-query session is usually paying for its neighbors,
not for a plan regression. This script times ONE query (or a list) in a
fresh process per query — same methodology as bench.py (warm pass 0,
record min of passes 1-2, full toPandas materialization) — and merges
the numbers into BENCH_SIDECAR.json under "isolated", next to the
in-bench numbers, so the artifact distinguishes regressions from
contention.

Usage:
    python scripts/isolated_retime.py <query> [...]   # child: one name
    python scripts/isolated_retime.py --all-movers    # parent: spawns a
        fresh process per mover query and merges results
    python scripts/isolated_retime.py --pipeline      # fresh-JVM twin of
        bench.py's pipeline-throughput number (VERDICT r8 #6)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The six biggest round-4 bench movers (VERDICT.md r4 "Next round" #4).
MOVERS = [
    "corpus_pipeline",
    "percentiles",
    "vocab_prune",
    "sample_weighted",
    "sequence_pack",
    "knn_cosine_lsh",
]


def time_one(name: str) -> float:
    sys.path.insert(0, REPO)
    from etl_airbnb_mex_spark.queries import REGISTRY, _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    spark = get_spark(app_name=f"isolated-{name}")
    spec = REGISTRY[name]
    best = float("inf")
    for recorded in (False, True, True):
        start = time.perf_counter()
        spec.spark(spark, SF_DIR).toPandas()
        elapsed = time.perf_counter() - start
        if recorded:
            best = min(best, elapsed)
    spark.stop()
    return round(best, 3)


def time_pipeline() -> dict:
    """Fresh-JVM twin of bench.py's pipeline-throughput measurement
    (VERDICT r8 #6: the in-bench number slid 141k→99k→82k rows/s across
    three rounds on an UNCHANGED transform plan — bench.py measures the
    pipeline LAST, after ~90 queries × 3 passes have grown the shared
    JVM heap, so the slide tracks the registry's growth, not the plan)."""
    sys.path.insert(0, REPO)
    from bench import _pipeline_throughput
    from etl_airbnb_mex_spark.session import get_spark

    spark = get_spark(app_name="isolated-pipeline")
    res = _pipeline_throughput(spark)
    spark.stop()
    return res


def merge_pipeline_sidecar(res: dict) -> None:
    path = os.path.join(REPO, "BENCH_SIDECAR.json")
    try:
        with open(path) as f:
            sidecar = json.load(f)
    except (OSError, ValueError):
        sidecar = {}
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10, cwd=REPO,
        ).stdout.strip()
    except (OSError, subprocess.SubprocessError):
        head = "unknown"
    sidecar["pipeline_isolated"] = {
        **res,
        "commit": head,
        "note": (
            "fresh-JVM twin of the in-bench pipeline number. The "
            "141k->99k->82k rows/s slide (r6-r8) happened on an "
            "unchanged transform plan (plans/transforms.py untouched "
            "since before r6, git log) — bench.py measures the "
            "pipeline LAST in a JVM that has just executed the whole "
            "registry x3 passes, so the in-bench number degrades as "
            "the registry grows (heap/GC pressure), not as the plan "
            "regresses. This entry is the contention-free capability "
            "number."
        ),
    }
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))


def merge_sidecar(results: dict[str, float]) -> None:
    path = os.path.join(REPO, "BENCH_SIDECAR.json")
    try:
        with open(path) as f:
            sidecar = json.load(f)
    except (OSError, ValueError):
        sidecar = {}
    sidecar.setdefault("isolated", {}).update(results)
    # Staleness stamp: the commit these isolated numbers were measured
    # at, so a later plan rewrite is visibly newer than the re-time
    # (ADVICE.md r5 #3).
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10, cwd=REPO,
        ).stdout.strip()
    except (OSError, subprocess.SubprocessError):
        head = ""
    if head:
        sidecar["isolated_commit"] = head
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))


def main() -> None:
    args = sys.argv[1:]
    if args == ["--pipeline"]:
        res = time_pipeline()
        merge_pipeline_sidecar(res)
        print(json.dumps(res, separators=(",", ":")))
        return
    if args == ["--all-movers"]:
        results: dict[str, float] = {}
        for name in MOVERS:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, cwd=REPO,
            )
            lines = out.stdout.strip().splitlines()
            line = lines[-1] if lines else ""
            try:
                results[name] = json.loads(line)[name]
            except (ValueError, KeyError):
                print(f"# {name}: FAILED\n{out.stderr[-2000:]}",
                      file=sys.stderr)
            else:
                print(f"# {name}: {results[name]}s isolated",
                      file=sys.stderr)
        merge_sidecar(results)
        print(json.dumps(results, separators=(",", ":")))
        return
    results = {name: time_one(name) for name in args}
    # Single-process mode (one or more names in THIS process) records
    # its numbers too — previously only --all-movers merged, so ad-hoc
    # re-times silently vanished from the artifact.
    if results:
        merge_sidecar(results)
    print(json.dumps(results, separators=(",", ":")))


if __name__ == "__main__":
    main()
