#!/usr/bin/env python
"""r17 helper: oracle-verify named queries at all four SF tiers
(sf0.001 / sf0.01 / sf0.1 / .scaledata/sf1) in ONE process — the
touched-query verification loop the round rules require, without four
pytest spin-ups.

Usage: python scripts/oracle_check_r17.py name [name ...]
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TIERS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    os.path.join(REPO, ".scaledata", "sf1"),
]


def main() -> None:
    from etl_airbnb_mex_spark.oracle import compare_query, duckdb_connection
    from etl_airbnb_mex_spark.queries import _load
    from etl_airbnb_mex_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        sys.exit("usage: oracle_check_r17.py name [name ...]")
    _load()
    spark = get_spark(app_name="oracle-check-r17")
    failed = False
    for tier in TIERS:
        if not os.path.isdir(tier):
            print(f"SKIP missing tier {tier}")
            continue
        con = duckdb_connection(tier)
        for name in names:
            res = compare_query(spark, tier, name, con)
            print(f"{os.path.basename(tier):8s} {res}")
            if not res.ok:
                failed = True
        con.close()
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
