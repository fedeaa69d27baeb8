#!/usr/bin/env python
"""Dump the FULL .explain("formatted") output of headline queries to
plans/r16/<query>_<tag>.txt — the optimization round's before/after
plan evidence (unfiltered, unlike dump_plans.py's PLANS.md digest).

Usage: python scripts/dump_plans_r16.py <tag> [query ...]
  tag    = "before" | "after"
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

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    _load()
    spark = get_spark(app_name=f"dump-plans-r16-{tag}")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].spark(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
    print(f"wrote {len(names)} plans to plans/r16/ (tag={tag})")
    spark.stop()


if __name__ == "__main__":
    main()
