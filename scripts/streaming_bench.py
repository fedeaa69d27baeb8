#!/usr/bin/env python
"""Streaming rate/latency micro-benchmark for the stateful sessionizer
on the RocksDB state store (VERDICT r6 "Next round" #5).

The sessionizer's CORRECTNESS is proven by batch-equivalence +
RocksDB-provider tests (tests/test_streaming.py); this script gives it
a PERFORMANCE number: sf0.1 events (100k rows) are split into 20
time-ordered files and streamed through ``stream_session_state`` as ~10
micro-batches (maxFilesPerTrigger=2) with the RocksDB provider, the
way a file-fed production stream drains a backlog. Records end-to-end
events/s, per-batch latency (min/median/max of batchDuration), state
rows, and the RocksDB commit-latency metric, merged into
BENCH_SIDECAR.json under "streaming_bench".

Event-time order note: files are written time-sorted so the watermark
advances monotonically across batches — the same discipline a
replayed Kafka topic has.

Usage: python scripts/streaming_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

N_FILES = 20
FILES_PER_TRIGGER = 2


def main() -> None:
    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.session import get_spark
    from etl_airbnb_mex_spark.streaming.ops import (
        configure_state_store,
        stream_session_state,
    )

    spark = get_spark(app_name="streaming-bench")
    work = tempfile.mkdtemp(prefix="stream_bench_", dir=REPO)
    try:
        feed_dir = os.path.join(work, "feed")
        ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        n_events = ev.count()
        # Time-ordered files: file i covers an ntile of the ts axis, so
        # batch k's events are all later than batch k-1's and the
        # watermark advances across the drain.
        (
            ev.repartitionByRange(N_FILES, F.col("ts"))
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(feed_dir)
        )
        # The file source orders same-mtime files arbitrarily, which
        # shuffles the watermark advance (and thus which sessions
        # close) across runs — stamp strictly increasing mtimes in
        # part-file order (== ts-range order under repartitionByRange)
        # so the drain is deterministic.
        parts = sorted(
            p for p in os.listdir(feed_dir) if p.endswith(".parquet")
        )
        base_t = time.time() - len(parts) * 2
        for i, p in enumerate(parts):
            os.utime(
                os.path.join(feed_dir, p), (base_t + i * 2, base_t + i * 2)
            )

        # r17 (VERDICT r16 #6): the RocksDB provider + changelog-
        # checkpointing posture now ships IN THE ENGINE
        # (streaming.ops.STATEFUL_STATE_STORE_CONF, rationale + the r16
        # off/on A/B evidence on its docstring) — this bench merely
        # inherits it, like any other caller of the stateful operators.
        configure_state_store(spark)
        sdf = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            .parquet(feed_dir)
        )
        t0 = time.perf_counter()
        q = (
            stream_session_state(sdf, gap_minutes=30)
            .writeStream.format("memory")
            .queryName("stream_bench_sessions")
            .outputMode("append")
            .option(
                "checkpointLocation", os.path.join(work, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0
        n_sessions = spark.table("stream_bench_sessions").count()

        progress = [json.loads(str(p)) for p in q.recentProgress]
        batches = [
            p for p in progress if p.get("numInputRows", 0) > 0
        ]
        durations = [
            p["batchDuration"] for p in batches if "batchDuration" in p
        ]
        state_ops = [
            p["stateOperators"][0]
            for p in batches
            if p.get("stateOperators")
        ]
        # RocksDB custom metrics (names vary by Spark version — match
        # by substring); the last batch's commit/memory numbers prove
        # the provider engaged and bound its cost.
        rocks_metrics = {}
        if state_ops and "customMetrics" in state_ops[-1]:
            rocks_metrics = {
                k: v
                for k, v in state_ops[-1]["customMetrics"].items()
                if "rocksdb" in k.lower()
                and ("commit" in k.lower() or "usage" in k.lower())
            }
        result = {
            "provider": "RocksDBStateStoreProvider",
            "sf": SF_DIR.rsplit("sf", 1)[-1].rstrip("/"),
            "n_events": n_events,
            "n_batches": len(batches),
            "n_sessions_closed": n_sessions,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n_events / wall, 1),
            "batch_duration_ms": {
                "min": min(durations) if durations else None,
                "median": (
                    statistics.median(durations) if durations else None
                ),
                "max": max(durations) if durations else None,
            },
            "state_rows_final": (
                state_ops[-1].get("numRowsTotal") if state_ops else None
            ),
            "rocksdb_metrics_last_batch": rocks_metrics,
        }

        # Second query through the same drained feed: the windowed PSI
        # drift monitor (stream_drift_monitor) — the light-state
        # contrast to the sessionizer (B+1 longs per open window vs a
        # row per active user). Reference histogram = the batch
        # distribution of the same data (self-drift, psi≈0 — the
        # numerically-busiest case: every bin term participates).
        from etl_airbnb_mex_spark.streaming.ops import stream_drift_monitor

        lim = ev.agg(
            F.min("value").alias("lo"), F.max("value").alias("hi")
        ).collect()[0]
        bins = 20
        width = (lim["hi"] - lim["lo"]) / bins
        ref_rows = (
            ev.filter(F.col("value").isNotNull())
            .select(
                F.least(
                    F.greatest(
                        F.floor(
                            (F.col("value") - F.lit(lim["lo"]))
                            / F.lit(width)
                        ).cast("long"),
                        F.lit(0),
                    ),
                    F.lit(bins - 1),
                ).alias("bin")
            )
            .groupBy("bin").count().collect()
        )
        by_bin = {r["bin"]: r["count"] for r in ref_rows}
        ref_counts = [by_bin.get(i, 0) for i in range(bins)]
        sdf2 = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            .parquet(feed_dir)
        )
        t0 = time.perf_counter()
        q2 = (
            stream_drift_monitor(
                sdf2, lim["lo"], lim["hi"], ref_counts,
                window="1 hour", watermark_delay="0 seconds",
            )
            .writeStream.format("memory")
            .queryName("stream_bench_drift")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(600)
        wall2 = time.perf_counter() - t0
        drift_batches = [
            json.loads(str(p))
            for p in q2.recentProgress
            if json.loads(str(p)).get("numInputRows", 0) > 0
        ]
        d_durations = [
            p["batchDuration"] for p in drift_batches
            if "batchDuration" in p
        ]
        result["drift_monitor"] = {
            "n_windows_emitted": spark.table("stream_bench_drift").count(),
            "wall_sec": round(wall2, 3),
            "events_per_sec": round(n_events / wall2, 1),
            "batch_duration_ms_median": (
                statistics.median(d_durations) if d_durations else None
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    path = os.path.join(REPO, "BENCH_SIDECAR.json")
    try:
        with open(path) as f:
            sidecar = json.load(f)
    except (OSError, ValueError):
        sidecar = {}
    sidecar["streaming_bench"] = result
    try:
        sidecar["streaming_bench"]["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10, cwd=REPO,
        ).stdout.strip()
    except (OSError, subprocess.SubprocessError):
        pass
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
