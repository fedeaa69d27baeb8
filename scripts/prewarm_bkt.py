#!/usr/bin/env python
"""Pre-warm the bucketed-layout cache (.scaledata/bkt) for given tiers.

The twins' layout cache is wiped with .scaledata between rounds and is
rebuilt lazily by ``bucketed_table`` on first call — which is the wrong
place for the BIG tiers: writing the sf32 lineitem layout (192M rows,
32 concurrent sort+parquet-write tasks) OOMs the default 8 GiB JVM
(measured r15: ``java.lang.OutOfMemoryError: Java heap space`` in the
bucketBy write stage; 24 GiB completes it in ~170 s). A scale_bench
measurement subprocess runs at the default heap on purpose — the heap
is part of the measured configuration — so the write must happen
BEFORE timing, in a process sized for writing.

This script runs one fresh subprocess per tier with
``SPARK_DRIVER_MEM`` (default 24g) and touches every layout in
``queries.bucketed._LAYOUTS`` whose source table exists; the stamped
cache makes it a fast no-op for layouts already current.

Usage: python scripts/prewarm_bkt.py [sf_dir ...]   # default: sf4 sf24 sf32
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from etl_airbnb_mex_spark.session import get_spark
from etl_airbnb_mex_spark.queries.bucketed import _LAYOUTS, bucketed_table
from etl_airbnb_mex_spark.tables import table_path
spark = get_spark(app_name="prewarm-bkt")
for layout, (table, _keys) in _LAYOUTS.items():
    if not os.path.exists(table_path({sf_dir!r}, table)):
        continue
    t0 = time.time()
    n = bucketed_table(spark, {sf_dir!r}, layout).count()
    print(f"PREWARM {{layout}}: {{n}} rows, {{time.time()-t0:.1f}}s",
          flush=True)
spark.stop()
"""


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        os.path.join(REPO, ".scaledata", t) for t in ("sf4", "sf24", "sf32")
    ]
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "24g")
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"# missing {sf_dir}; run make_scaledata.py first",
                  file=sys.stderr)
            continue
        print(f"# prewarming {sf_dir} (heap {env['SPARK_DRIVER_MEM']})",
              file=sys.stderr, flush=True)
        r = subprocess.run(
            [sys.executable, "-c",
             _RUNNER.format(repo=REPO, sf_dir=os.path.abspath(sf_dir))],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        for line in r.stdout.splitlines():
            if line.startswith("PREWARM"):
                print(f"# {os.path.basename(sf_dir)} {line}",
                      file=sys.stderr, flush=True)
        if r.returncode != 0:
            print(r.stderr[-500:], file=sys.stderr)
            raise SystemExit(1)
    print("done")


if __name__ == "__main__":
    main()
