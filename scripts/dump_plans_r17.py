#!/usr/bin/env python
"""Dump .explain("formatted") output of headline queries to
plans/r17/<query>_<tag>.txt — the r17 optimization round's plan
evidence (same contract as dump_plans_r16.py).

New in r17: ``--executed`` additionally EXECUTES each query (noop-style
full materialization via toPandas, the bench's own action) before
dumping, so the dump is the AQE FINAL plan — ReusedExchange /
AQEShuffleRead nodes visible — not the initial `isFinalPlan=false`
skeleton. VERDICT r16 item 8: the static plans of the multi-consumer
rewrites (funnel_conversion, bigram_surprisal) cannot show the runtime
exchange reuse; only the executed plan can.

Usage: python scripts/dump_plans_r17.py <tag> [--executed] [query ...]
  tag    = "before" | "after" | any suffix
  query  = optional subset; default = every HEADLINE query
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE

    from etl_airbnb_mex_spark.queries import REGISTRY, _load

    from etl_airbnb_mex_spark.session import get_spark

    args = sys.argv[1:]
    tag = args.pop(0) if args else "before"
    executed = "--executed" in args
    if executed:
        args.remove("--executed")
    names = args or list(HEADLINE)
    _load()
    spark = get_spark(app_name=f"dump-plans-r17-{tag}")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r17",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].spark(spark, SF_DIR)
        if executed:
            df.toPandas()  # run to completion so AQE finalizes the plan
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        suffix = f"{tag}_executed" if executed else tag
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
    print(
        f"wrote {len(names)} plans to plans/r17/ "
        f"(tag={tag}, executed={executed})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
