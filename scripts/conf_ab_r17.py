#!/usr/bin/env python
"""r17 runtime-conf A/B over headline queries (VERDICT r16 next-round
#4: the AQE stage-latency floor arm — e.g.
spark.sql.adaptive.coalescePartitions.parallelismFirst=false +
advisory-size tuning).

Arms interleave inside each pass (baseline ↔ conf) in ONE session so
machine-phase drift hits both equally; the confs must be
runtime-settable (AQE coalesce confs are). Baseline = the session
factory's values, captured before the first override and restored
after every conf arm.

Usage:
  python scripts/conf_ab_r17.py --conf k=v[;k=v...] [--passes N] q [q..]

Prints one JSON object {query: {"base": {...}, "conf": {...}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True,
                    help="semicolon-separated k=v overrides for the arm")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    overrides = dict(kv.split("=", 1) for kv in args.conf.split(";"))

    from etl_airbnb_mex_spark.queries import REGISTRY, _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    spark = get_spark(app_name="conf-ab-r17")

    base_vals = {}
    for k in overrides:
        try:
            base_vals[k] = spark.conf.get(k)
        except Exception:
            base_vals[k] = None

    def set_arm(on: bool) -> None:
        for k, v in overrides.items():
            if on:
                spark.conf.set(k, v)
            elif base_vals[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, base_vals[k])

    out: dict[str, dict] = {}
    for name in args.names:
        spec = REGISTRY[name]
        walls: dict[str, list[float]] = {"base": [], "conf": []}
        for arm in ("base", "conf"):  # warm both arms
            set_arm(arm == "conf")
            spec.spark(spark, SF_DIR).toPandas()
        for _ in range(args.passes):
            for arm in ("base", "conf"):
                set_arm(arm == "conf")
                t0 = time.perf_counter()
                spec.spark(spark, SF_DIR).toPandas()
                walls[arm].append(time.perf_counter() - t0)
        set_arm(False)
        out[name] = {
            arm: {
                "walls": [round(w, 3) for w in ws],
                "min": round(min(ws), 3),
            }
            for arm, ws in walls.items()
        }
        print(f"# {name}: " + json.dumps(out[name]), file=sys.stderr,
              flush=True)
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
