#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (collect) so the number is the full
scan→shuffle→result wall clock, not plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: one per operator family (SURVEY.md §2) — scan+agg+window,
#: joins incl. as-of, event windows, dedup (exact + minhash), text, vector.
HEADLINE = [
    "flagship_topn_pct",
    "groupby_multi_agg",
    "percentiles",
    "outliers_iqr",
    "corr_matrix",
    "topn_by_count",
    "monthly_counts",
    "join_inner_fk",
    "join_broadcast_dim",
    "join_asof",
    "window_rank_topn",
    "window_moving_avg",
    "window_tumbling_agg",
    "window_session_agg",
    "dedup_by_key",
    "dedup_text_exact",
    "dedup_minhash",
    "token_topn",
    "sentiment_dist",
    "knn_cosine",
]


def main() -> None:
    from etl_airbnb_mex_spark.queries import REGISTRY, _load
    from etl_airbnb_mex_spark.session import get_spark

    _load()
    spark = get_spark(app_name="etl-airbnb-mex-spark-bench")
    # Warm the JVM + parquet footers with a trivial action so the first
    # measured query doesn't pay session startup.
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        spec = REGISTRY[name]
        start = time.perf_counter()
        df = spec.spark(spark, SF_DIR)
        # collect(), not count(): Catalyst would drop sorts/projections
        # under a bare count and under-measure the real query.
        n = len(df.collect())
        elapsed = time.perf_counter() - start
        timings[name] = round(elapsed, 3)
        total += elapsed
        print(f"# {name}: {elapsed:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
