#!/usr/bin/env python
"""Regenerate queries/_ivf_centroids.py: train the IVF coarse
quantizer once on the sf0.01 embeddings sample and pin the 6dp-rounded
centers as literals (the production train-on-a-sample / ship-with-the-
job pattern — see _ivf_centroids.py's docstring).

Usage: python scripts/train_ivf_centroids.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(
    REPO, "etl_airbnb_mex_spark", "queries", "_ivf_centroids.py"
)

HEADER = '''"""Pinned IVF coarse quantizer: 16 KMeans centroids (dim 64).

Trained ONCE offline with operators/similarity.py:ivf_build
(seed=42, k=16, maxIter=10, unit-normalized inputs) on the
sf0.01 embeddings sample, rounded to 6 dp, and pinned here as
literals — the production IVF pattern: the coarse quantizer is
trained on a sample and SHIPPED with the job, so the probe path
(assign + pruned-list scan) is deterministic, retraining-free,
and exactly replayable by the SQL oracle. Regenerate with
scripts/train_ivf_centroids.py if the sample data changes.
"""

IVF_PINNED_CENTROIDS: list[list[float]] = [
'''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from etl_airbnb_mex_spark.operators.similarity import ivf_build
    from etl_airbnb_mex_spark.session import get_spark

    spark = get_spark(app_name="train-ivf-centroids")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    _, centers = ivf_build(emb, n_centroids=16, seed=42)
    parts = [HEADER]
    for c in centers:
        parts.append("    [\n")
        vals = [round(float(x), 6) for x in c]
        for i in range(0, len(vals), 8):
            parts.append(
                "        " + ", ".join(repr(x) for x in vals[i:i + 8]) + ",\n"
            )
        parts.append("    ],\n")
    parts.append("]\n")
    with open(OUT, "w") as f:
        f.write("".join(parts))
    print(f"wrote {len(centers)} centroids to {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
