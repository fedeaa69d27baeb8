#!/usr/bin/env python
"""Pipeline throughput at real tiers (VERDICT r12 #7).

The 191k rows/s headline is measured at the sf0.1-equivalent input
(100k listings + 200k reviews = 300k rows in a 1.6 s wall — half of it
fixed cost), which flatters neither direction: fixed costs inflate the
denominator while the tiny input never exercises the shuffle/write
path at depth. This script re-runs bench._pipeline_throughput at
sf4/sf8-equivalent row counts (x40 / x80 the sf0.1 synthetic input,
matching the scale factors' lineitem row multiples) so the
10x-over-baseline claim has an anchor where fixed costs are amortized.

Methodology: ONE python+JVM subprocess per tier (the r12 isolation
discipline — nothing else shares the heap), a 32-task scheduler floor
probe INSIDE the measuring JVM immediately before the run (the phase
stamp reflects the process that produced the number, ADVICE r12 #2),
and bench.py's own convergence rule (min of passes until the
second-best is within 10%). Since r15 (VERDICT r14 #8) each tier is
ALSO bracketed by scale_bench's sibling-subprocess phase probe
(fresh short-lived JVM + DuckDB + ambient loadavg) — the in-JVM
post-work floor reads its own GC residue after tens of millions of
rows (the r14 sf24 row stamped 0.619 that way), while a sibling
process sees the machine, not the JVM. Results merge per-row into
BENCH_SIDECAR.json under "pipeline_scale".

Usage: python scripts/pipeline_scale.py [tier ...]   # default: 4 8
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_bench import _phase_probe  # noqa: E402  (sibling-JVM probe)

#: tier -> (n_listings, n_reviews): x40/x80 the sf0.1-equivalent
#: 100k/200k input, tracking the data generator's linear row scaling
TIERS = {
    "sf4": (4_000_000, 8_000_000),
    "sf8": (8_000_000, 16_000_000),
    # r14 (VERDICT r13 #9): two more doublings-ish past sf8 — anchors
    # the throughput linearity claim across 24x the sf0.1 input
    "sf24": (24_000_000, 48_000_000),
}

_RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import bench
from etl_airbnb_mex_spark.session import get_spark
spark = get_spark(app_name="pipeline-scale-" + {tier!r})
# in-JVM scheduler-floor probe: stamps THIS process's machine phase
floor = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    spark.range(0, 32 * 1000, 1, 32).selectExpr("sum(id)").collect()
    floor = min(floor, time.perf_counter() - t0)
res = bench._pipeline_throughput(
    spark, n_listings={nl}, n_reviews={nr}
)
res["spark_floor32_sec"] = round(floor, 3)
print("PIPELINE_JSON " + json.dumps(res))
"""


def main() -> None:
    tiers = sys.argv[1:] or ["4", "8"]
    out: dict[str, dict] = {}
    for t in tiers:
        tier = f"sf{t}" if not t.startswith("sf") else t
        nl, nr = TIERS[tier]
        print(f"# measuring {tier}: {nl + nr} input rows",
              file=sys.stderr, flush=True)
        # sibling-subprocess bracket (VERDICT r14 #8): the parent owns
        # no JVM, so _phase_probe(None) launches a fresh short-lived
        # JVM that exits before the tier subprocess starts — ambient
        # machine phase, not our own heap's residue
        phase_ambient = _phase_probe(None)
        r = subprocess.run(
            [sys.executable, "-c",
             _RUNNER.format(repo=REPO, tier=tier, nl=nl, nr=nr)],
            capture_output=True, text=True, timeout=3600,
        )
        if r.returncode != 0:
            print(r.stderr[-500:], file=sys.stderr)
            continue
        lines = [ln for ln in r.stdout.splitlines()
                 if ln.startswith("PIPELINE_JSON ")]
        if not lines:
            # Exit 0 but no marker (truncated/polluted stdout): skip the
            # tier like the nonzero-returncode branch instead of dying
            # on [-1] and aborting the remaining tiers (ADVICE r13 #4).
            print(f"# {tier}: no PIPELINE_JSON marker in stdout; "
                  f"stderr tail: {r.stderr[-500:]}", file=sys.stderr)
            continue
        row = json.loads(lines[-1][len("PIPELINE_JSON "):])
        row["phase_ambient"] = phase_ambient
        # post-tier sibling probe: loadavg here still decays from our
        # own run (interpret vs the floor), but the floor/duck/sustained
        # numbers come from a process that never did the tier's work
        row["phase_post"] = _phase_probe(None)
        out[tier] = row
        print(f"# {tier}: {row}", file=sys.stderr, flush=True)
        # merge immediately (crash-proof, scale_bench convention)
        path = os.path.join(REPO, "BENCH_SIDECAR.json")
        with open(path) as f:
            sidecar = json.load(f)
        ps = sidecar.setdefault("pipeline_scale", {})
        ps["method"] = (
            "scripts/pipeline_scale.py: bench._pipeline_throughput at "
            "x40/x80 the sf0.1 synthetic input, one fresh python+JVM "
            "subprocess per tier, in-JVM 32-task floor probe as the "
            "in-process stamp PLUS sibling-subprocess phase brackets "
            "before/after each tier (fresh JVM + DuckDB + ambient "
            "loadavg — r15, VERDICT r14 #8), bench.py convergence "
            "rule (min of passes until 2nd-best within 10%)."
        )
        try:
            head = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10, cwd=REPO,
            ).stdout.strip()
        except (OSError, subprocess.SubprocessError):
            head = "unknown"
        ps["commit"] = head
        ps[tier] = row
        with open(path, "w") as f:
            json.dump(sidecar, f, separators=(",", ":"))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
