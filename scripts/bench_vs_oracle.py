#!/usr/bin/env python
"""Dev tool: per-query wall clock, Spark vs DuckDB oracle, at a given SF
(default sf0.1). The driver's bench criterion is 'within 2x of the
DuckDB oracle at sf0.1' (BASELINE.md) — this is the local feedback loop
for it. Not part of the driver contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from etl_airbnb_mex_spark.oracle import duckdb_connection
    from etl_airbnb_mex_spark.queries import REGISTRY, _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    names = sys.argv[1:] or sorted(REGISTRY)
    spark = get_spark(app_name="bench-vs-oracle")
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    con = duckdb_connection(SF_DIR)

    print(f"{'query':28s} {'spark_s':>8s} {'duck_s':>8s} {'ratio':>6s}")
    worst: list[tuple[float, str]] = []
    for name in names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        n = len(spec.spark(spark, SF_DIR).collect())
        s_spark = time.perf_counter() - t0
        if spec.oracle is not None:
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            s_duck = time.perf_counter() - t0
            ratio = s_spark / s_duck if s_duck > 0 else float("inf")
            worst.append((ratio, name))
            print(f"{name:28s} {s_spark:8.3f} {s_duck:8.3f} {ratio:6.1f}  ({n} rows)")
        else:
            print(f"{name:28s} {s_spark:8.3f} {'—':>8s} {'—':>6s}  ({n} rows)")
    worst.sort(reverse=True)
    print("\nworst ratios:", [(n, round(r, 1)) for r, n in worst[:8]])


if __name__ == "__main__":
    main()
