#!/usr/bin/env python
"""r17 width-cap sweep over the residual single-task text tail
(VERDICT r16 next-round #3, guide §2.6).

For each named query, measures INTERLEAVED same-phase walls across
scan-width variants: cap=0 means "as registered today" (direct for the
tail queries), cap=N forces the documents scan to repartition(N) right
after the load. Variants alternate inside each pass so machine-phase
drift hits all arms equally (the r16 measurement discipline — never
decide on bench snapshots on this box).

The forcing is a load_table patch in the query modules: the tail
queries read documents directly (no parallelize_scan call site), so
widening must be injected at the load. Queries that DO call
parallelize_scan are not sweep targets here (their widening would
stack); keep the target list to direct-scan queries.

Usage:
  python scripts/cap_sweep_r17.py [--passes N] [--caps 0,4,8,16] q [q..]

Prints one JSON object {query: {cap: {"walls": [...], "min": s}}}.
Does NOT write BENCH_SIDECAR.json — copy rows into round notes.
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
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--caps", default="0,4,8,16")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",")]

    from etl_airbnb_mex_spark import tables
    from etl_airbnb_mex_spark.queries import (
        REGISTRY,
        _load,
        advanced,
        extensions,
        llmprep,
    )
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    spark = get_spark(app_name="cap-sweep-r17")

    orig_load = tables.load_table
    state = {"cap": 0}

    def patched_load(sp, sf_dir, name):
        df = orig_load(sp, sf_dir, name)
        if name == "documents" and state["cap"]:
            df = df.repartition(state["cap"])
        return df

    for mod in (extensions, llmprep, advanced):
        mod.load_table = patched_load

    out: dict[str, dict] = {}
    try:
        for name in args.names:
            spec = REGISTRY[name]
            rows: dict[int, list[float]] = {c: [] for c in caps}
            # warm every variant once (JIT/codegen/footers)
            for c in caps:
                state["cap"] = c
                spec.spark(spark, SF_DIR).toPandas()
            for _ in range(args.passes):
                for c in caps:  # interleaved: every pass visits all arms
                    state["cap"] = c
                    t0 = time.perf_counter()
                    spec.spark(spark, SF_DIR).toPandas()
                    rows[c].append(time.perf_counter() - t0)
            out[name] = {
                str(c): {
                    "walls": [round(w, 3) for w in ws],
                    "min": round(min(ws), 3),
                }
                for c, ws in rows.items()
            }
            print(f"# {name}: " + json.dumps(out[name]), file=sys.stderr,
                  flush=True)
    finally:
        for mod in (extensions, llmprep, advanced):
            mod.load_table = orig_load
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
