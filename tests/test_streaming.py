"""Streaming-operator tests (SURVEY.md §2.10): file-source streams over
the driver events table, availableNow trigger, memory sink; results
cross-checked against the oracle-checked *batch* twins on the same data
(the lambda/kappa reconciliation property the module promises)."""

from __future__ import annotations

import pytest

from etl_airbnb_mex_spark.streaming import (
    stream_dedup_within_watermark,
    stream_session_agg,
    stream_sliding_agg,
    stream_tumbling_agg,
    streaming_counter_state,
)
from etl_airbnb_mex_spark.tables import load_table


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as a 4-file parquet dir (a micro-batched file
    stream) with a normal microsecond ts column."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(path)
    return path


def _run_stream(spark, events_dir, transform, name):
    schema = spark.read.parquet(events_dir).schema
    sdf = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        transform(sdf)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name != "counter" else "update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_tumbling_matches_batch(spark, sf_dir, events_dir):
    """Append mode emits a window only once the watermark passes its end;
    the window containing max(ts) stays open forever — so streamed ==
    batch minus still-open windows (correct watermark semantics, not a
    relaxation)."""
    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.operators.timeseries import tumbling_window_agg

    got = _run_stream(
        spark, events_dir,
        lambda s: stream_tumbling_agg(s, watermark_delay="0 seconds"),
        "tumbling",
    ).collect()
    events = spark.read.parquet(events_dir)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch = tumbling_window_agg(
        events, "ts", "1 hour", group_cols=["event_type"], value_col="value",
    ).collect()
    closed = [
        tuple(r) for r in batch
        if r["window_start"] < (max_ts.replace(minute=0, second=0,
                                               microsecond=0)
                                ).strftime("%Y-%m-%d %H:%M:%S")
    ]
    open_starts = {tuple(r) for r in batch} - set(closed)
    assert sorted(map(tuple, got)) == sorted(closed)
    assert len(open_starts) >= 1  # the max-ts window was indeed open


def test_stream_session_matches_batch(spark, events_dir):
    """Sessions whose (end + gap) the watermark never passes stay open;
    compare on the closed set."""
    from etl_airbnb_mex_spark.operators.timeseries import session_window_agg

    got = {tuple(r) for r in _run_stream(
        spark, events_dir,
        lambda s: stream_session_agg(s, watermark_delay="0 seconds"),
        "sessions",
    ).collect()}
    batch = {tuple(r) for r in session_window_agg(
        spark.read.parquet(events_dir), "ts", "user_id", "30 minutes"
    ).collect()}
    still_open = batch - got
    assert got <= batch                      # nothing emitted that batch lacks
    assert len(got) >= 0.9 * len(batch)      # only tail sessions may be open
    # every unemitted session must be a LAST session of its user (no
    # closed session was dropped)
    last_start_by_user = {}
    for user, start, _ in batch:
        last_start_by_user[user] = max(last_start_by_user.get(user, ""), start)
    for user, start, _ in still_open:
        assert start == last_start_by_user[user]


def test_stream_dedup(spark, events_dir, tmp_path_factory):
    """Duplicate the stream input; watermark-scoped dedup restores
    uniqueness per event_id."""
    dup_dir = str(tmp_path_factory.mktemp("stream") / "dup")
    base = spark.read.parquet(events_dir)
    base.union(base).repartition(4).write.parquet(dup_dir)

    got = _run_stream(
        spark, dup_dir,
        lambda s: stream_dedup_within_watermark(s, watermark_delay="1 hour"),
        "dedup",
    )
    n_unique = base.select("event_id").distinct().count()
    assert got.count() == n_unique


def test_streaming_counter_state(spark, events_dir):
    """Custom stateful op: final per-user totals must equal the batch
    groupBy (availableNow processes everything, update mode emits the
    last state per key in the final batch)."""
    from pyspark.sql import functions as F

    got = _run_stream(spark, events_dir, streaming_counter_state, "counter")
    # update-mode memory sink may hold one row per micro-batch per key;
    # the LAST emission per key is the final state.
    final = {
        r["user_id"]: (r["events_seen"], round(r["value_sum"], 4))
        for r in got.collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in (
            spark.read.parquet(events_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        )
    }
    # every key's final emitted state matches the batch totals
    for k, v in batch.items():
        assert final[k] == v


def test_stream_sliding_matches_batch(spark, events_dir):
    """Sliding windows: streamed closed-window results must be a subset
    of the batch twin's grid with identical values (the last windows
    stay open under the watermark, as in the tumbling test)."""
    got = {tuple(r) for r in _run_stream(
        spark, events_dir,
        lambda s: stream_sliding_agg(s, watermark_delay="0 seconds"),
        "sliding",
    ).collect()}
    # batch twin: same plan shape as the oracle-checked
    # window_sliding_agg query, built over this events copy
    from pyspark.sql import functions as F

    ev = spark.read.parquet(events_dir)
    batch = {tuple(r) for r in (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"), "cnt", "sum_value")
        .collect()
    )}
    assert got <= batch
    assert len(got) >= len(batch) - 2  # at most the 2 open tail windows


def test_stream_stateless_text_ops_match_batch(spark, tmp_path_factory):
    """The §2.11 text operators are stateless expressions, so the SAME
    plan runs unchanged under Structured Streaming (kappa property):
    pii_scrub + repetition_ratio over a file stream must equal the batch
    result row-for-row."""
    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.functions.text import (
        pii_scrub,
        word_repetition_ratio,
    )

    docs_dir = str(tmp_path_factory.mktemp("stream_docs") / "docs")
    spark.createDataFrame(
        [
            (1, "mail me me at x@y.io today today"),
            (2, "clean text no pii here"),
            (3, "server 10.0.0.1 answered answered answered"),
        ],
        "doc_id long, text string",
    ).repartition(2).write.parquet(docs_dir)

    def transform(df):
        return df.select(
            "doc_id",
            pii_scrub("text").alias("scrubbed"),
            word_repetition_ratio("text").alias("rep"),
        )

    batch = {
        r["doc_id"]: (r["scrubbed"], r["rep"])
        for r in transform(spark.read.parquet(docs_dir)).collect()
    }
    schema = spark.read.parquet(docs_dir).schema
    q = (
        transform(spark.readStream.schema(schema).parquet(docs_dir))
        .writeStream.format("memory")
        .queryName("stateless_text")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["scrubbed"], r["rep"])
        for r in spark.sql("SELECT * FROM stateless_text").collect()
    }
    assert got == batch
    assert "<EMAIL>" in got[1][0] and "<IP>" in got[3][0]


def test_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream interval join (purchases ⋈ preceding clicks within
    1h, per user) equals the equivalent batch join — and the streaming
    plan is accepted by the engine (two-sided watermark + bounded range
    means bounded state)."""
    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.streaming import stream_interval_join

    batch_df = spark.read.parquet(events_dir)
    purchases_b = batch_df.filter(F.col("event_type") == "purchase")
    clicks_b = batch_df.filter(F.col("event_type") == "click")

    def out_cols(j):
        return j.select(
            F.col("l.event_id").alias("purchase_id"),
            F.col("r.event_id").alias("click_id"),
        )

    lts, rts = F.col("l.ts"), F.col("r.ts")
    batch = out_cols(
        purchases_b.alias("l").join(
            clicks_b.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (rts <= lts)
            & (rts >= lts - F.expr("INTERVAL 1 hour")),
        )
    )
    expect = {(r["purchase_id"], r["click_id"]) for r in batch.collect()}
    assert expect  # fixture must actually produce matches

    schema = batch_df.schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    joined = stream_interval_join(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "click"),
        key="user_id",
        lookback="1 hour",
    )
    q = (
        out_cols(joined)
        .writeStream.format("memory")
        .queryName("interval_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM interval_join").collect()
    }
    assert got == expect


def test_stream_merge_upsert_sink_cdc_apply(spark, tmp_path_factory):
    """foreachBatch CDC apply: a change stream keeps a parquet snapshot
    current across restarts — batch 1 seeds, batch 2 (after restart with
    the same checkpoint) updates one key and inserts another; the final
    snapshot shows last-write-wins per key with carried-over rows."""
    from etl_airbnb_mex_spark.streaming import stream_merge_upsert_sink

    root = tmp_path_factory.mktemp("cdc")
    changes_dir = str(root / "changes")
    snapshot_dir = str(root / "snapshot")
    ckpt = str(root / "ckpt")
    schema = "k long, v string, seq long"

    def run_once():
        sdf = spark.readStream.schema(schema).parquet(changes_dir)
        q = (
            stream_merge_upsert_sink(sdf, snapshot_dir, "k", order_col="seq")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: two inserts, including two versions of k=1 (LWW in-batch)
    spark.createDataFrame(
        [(1, "a0", 1), (1, "a1", 2), (2, "b0", 1)], schema
    ).write.mode("append").parquet(changes_dir)
    run_once()
    snap1 = {r["k"]: r["v"] for r in spark.read.parquet(snapshot_dir).collect()}
    assert snap1 == {1: "a1", 2: "b0"}

    # batch 2: update k=2, insert k=3; k=1 must carry over untouched
    spark.createDataFrame([(2, "b1", 2), (3, "c0", 1)], schema).write.mode(
        "append"
    ).parquet(changes_dir)
    run_once()
    snap2 = {r["k"]: r["v"] for r in spark.read.parquet(snapshot_dir).collect()}
    assert snap2 == {1: "a1", 2: "b1", 3: "c0"}

    # --- crash-recovery of the rename-aside swap (ADVICE.md r3) ---
    # Simulate a crash between `snapshot → .old` and `.tmp → snapshot`:
    # the prior state sits in .old, the fully-merged result in .tmp,
    # and no live snapshot exists. The next batch must promote .tmp
    # (NOT fall back to .old, which would lose the newest merge) and
    # clean up, then merge its own changes on top.
    import os
    import shutil

    os.rename(snapshot_dir, snapshot_dir + ".tmp")
    old_dir = snapshot_dir + ".old"
    os.makedirs(old_dir)
    shutil.copy(
        next(
            str(p) for p in (root / "changes").iterdir()
            if p.name.endswith(".parquet")
        ),
        old_dir,
    )
    spark.createDataFrame([(3, "c1", 2), (4, "d0", 1)], schema).write.mode(
        "append"
    ).parquet(changes_dir)
    run_once()
    snap3 = {r["k"]: r["v"] for r in spark.read.parquet(snapshot_dir).collect()}
    assert snap3 == {1: "a1", 2: "b1", 3: "c1", 4: "d0"}
    assert not os.path.exists(snapshot_dir + ".old")
    assert not os.path.exists(snapshot_dir + ".tmp")


def test_stream_static_enrich_matches_batch(spark, sf_dir, events_dir):
    """Stream-static broadcast enrichment: every micro-batch joins the
    static dimension; streamed result == the batch join, and the plan
    needs no state store (stateless join)."""
    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.streaming.ops import stream_static_enrich

    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_seen"))
    )
    got = _run_stream(
        spark, events_dir,
        lambda s: stream_static_enrich(
            s, dim, "user_id", "user_id", ("first_seen",)
        ).select("event_id", "user_id", "first_seen"),
        "enrich",
    )
    batch = (
        spark.read.parquet(events_dir)
        .join(F.broadcast(dim), "user_id")
        .select("event_id", "user_id", "first_seen")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_static_enrich_rejects_stateful_sides(spark, sf_dir,
                                                     events_dir):
    import pytest as _pytest

    from etl_airbnb_mex_spark.streaming.ops import stream_static_enrich

    dim = load_table(spark, sf_dir, "nation")
    schema = spark.read.parquet(events_dir).schema
    sdf = spark.readStream.schema(schema).parquet(events_dir)
    with _pytest.raises(ValueError):
        stream_static_enrich(sdf, dim, "user_id", "n_nationkey",
                             ("n_name",), how="full")


def test_stream_session_state_closes_sessions(spark, events_dir):
    """Event-time stateful sessionizer: every emitted CLOSED session
    matches the batch 30-min-gap sessionization exactly, and per user
    the emitted sessions are a chronological prefix missing at most
    the final (possibly still-open) session."""
    import pandas as pd

    from etl_airbnb_mex_spark.streaming.ops import stream_session_state

    got = _run_stream(
        spark, events_dir,
        lambda sdf: stream_session_state(sdf, gap_minutes=30),
        "sess_state",
    ).toPandas()

    ev = spark.read.parquet(events_dir).select("user_id", "ts").toPandas()
    gap_us = 30 * 60 * 1_000_000
    expected: dict[int, list[tuple[int, int, int]]] = {}
    for uid, grp in ev.groupby("user_id"):
        ts = sorted(
            pd.to_datetime(grp["ts"]).astype("int64").floordiv(1000)
        )
        sessions, start, last, n = [], None, None, 0
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last <= gap_us:
                last, n = t, n + 1
            else:
                sessions.append((start, last, n))
                start, last, n = t, t, 1
        sessions.append((start, last, n))
        expected[uid] = sessions

    assert len(got), "no sessions closed at all"
    by_user: dict[int, list[tuple[int, int, int]]] = {}
    for _, r in got.iterrows():
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start_us"], r["session_end_us"], r["n_events"])
        )
    for uid, emitted in by_user.items():
        emitted.sort()
        exp = expected[uid]
        # chronological prefix, at most the final session unemitted
        assert emitted in (exp, exp[:-1]), (uid, emitted, exp)
    # the operator must close the non-final sessions of every user
    # that has more than one (successor events force the close)
    for uid, exp in expected.items():
        if len(exp) > 1:
            assert by_user.get(uid, [])[: len(exp) - 1] == exp[:-1]


def test_stateful_sessionizer_on_rocksdb_state_store(spark, events_dir,
                                                     tmp_path_factory):
    """The at-scale state backend: the same stateful sessionizer runs
    on the RocksDB state store (incremental checkpoints, state spills
    to local disk instead of executor heap — the 100 TB posture for
    stateful streaming) and emits exactly the rows the default HDFS-
    backed provider emits; progress metrics prove RocksDB engaged."""
    from etl_airbnb_mex_spark.streaming.ops import stream_session_state

    schema = spark.read.parquet(events_dir).schema

    def run(name: str, provider: str | None):
        sdf = spark.readStream.schema(schema).parquet(events_dir)
        writer = (
            stream_session_state(sdf, gap_minutes=30)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                str(tmp_path_factory.mktemp(f"ckpt_{name}")),
            )
            .trigger(availableNow=True)
        )
        if provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", provider
            )
        try:
            q = writer.start()
            q.awaitTermination(120)
            progress = q.lastProgress
        finally:
            if provider:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )
        rows = {
            tuple(r)
            for r in spark.table(name).collect()
        }
        return rows, progress

    rocks, progress = run(
        "sess_rocks",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    default, _ = run("sess_default", None)
    assert rocks == default
    assert len(rocks) > 0
    # the state operator's custom metrics only exist under RocksDB
    metrics = progress["stateOperators"][0]["customMetrics"]
    assert any("rocksdb" in k.lower() for k in metrics)


def test_configure_state_store_engine_posture(spark, events_dir,
                                              tmp_path_factory):
    """r17 (VERDICT r16 #6): the RocksDB + changelog-checkpointing
    posture ships in PACKAGE code (streaming.ops.configure_state_store),
    not in the bench script. Asserts the helper sets both confs on the
    session a stateful stream runs under, and that a sessionizer drain
    on that session actually engages RocksDB (provider-specific custom
    metrics present in progress)."""
    from etl_airbnb_mex_spark.streaming.ops import (
        STATEFUL_STATE_STORE_CONF,
        configure_state_store,
        stream_session_state,
    )

    before = {}
    for k in STATEFUL_STATE_STORE_CONF:
        try:
            before[k] = spark.conf.get(k)
        except Exception:
            before[k] = None
    try:
        configure_state_store(spark)
        for k, v in STATEFUL_STATE_STORE_CONF.items():
            assert spark.conf.get(k) == v
        schema = spark.read.parquet(events_dir).schema
        sdf = spark.readStream.schema(schema).parquet(events_dir)
        q = (
            stream_session_state(sdf, gap_minutes=30)
            .writeStream.format("memory")
            .queryName("sess_engine_posture")
            .outputMode("append")
            .option(
                "checkpointLocation",
                str(tmp_path_factory.mktemp("ckpt_engine_posture")),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # the stream's session carries the engine posture
        assert spark.conf.get(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        ) == "true"
        metrics = q.lastProgress["stateOperators"][0]["customMetrics"]
        assert any("rocksdb" in k.lower() for k in metrics)
        assert len(spark.table("sess_engine_posture").collect()) > 0
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_stream_drift_monitor_matches_python_model(spark, events_dir):
    """Windowed PSI vs a reference histogram: the streamed per-window
    rows must equal an INDEPENDENT python recomputation (bin counts per
    closed hour window -> smoothed PSI terms) on the same data — and
    the reference window itself must score ~0 drift against its own
    distribution."""
    import math
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.streaming import stream_drift_monitor

    events = spark.read.parquet(events_dir)
    vals = [
        (r["ts"], r["value"])
        for r in events.select("ts", "value").collect()
        if r["value"] is not None
    ]
    lo = min(v for _, v in vals)
    hi = max(v for _, v in vals)
    bins = 20
    width = (hi - lo) / bins

    def to_bin(v):
        return min(max(int(math.floor((v - lo) / width)), 0), bins - 1)

    # reference = the global distribution (self-drift ≈ 0 overall)
    ref = Counter(to_bin(v) for _, v in vals)
    ref_counts = [ref.get(i, 0) for i in range(bins)]

    got = {
        (r["window_start"], r["n"]): r["psi"]
        for r in _run_stream(
            spark,
            events_dir,
            lambda s: stream_drift_monitor(
                s, lo, hi, ref_counts, watermark_delay="0 seconds"
            ),
            "drift",
        ).collect()
    }
    assert len(got) > 0

    # independent model: per-hour bin counts -> PSI
    per_window = defaultdict(Counter)
    for ts, v in vals:
        w = ts.replace(minute=0, second=0, microsecond=0)
        per_window[w.strftime("%Y-%m-%d %H:%M:%S")][to_bin(v)] += 1
    t_ref = sum(ref_counts)
    p = [(c + 0.5) / (t_ref + 0.5 * bins) for c in ref_counts]
    for (wstart, n), psi in got.items():
        cnt = per_window[wstart]
        assert n == sum(cnt.values())
        want = 0.0
        for i in range(bins):
            q = (cnt.get(i, 0) + 0.5) / (n + 0.5 * bins)
            want += (p[i] - q) * (math.log(p[i]) - math.log(q))
        assert abs(psi - round(want, 6)) <= 1e-6, (wstart, psi, want)
        assert psi >= 0.0  # PSI is Gibbs-nonnegative
    # emitted set = all closed windows (watermark 0s: all but the last)
    assert len(got) >= len(per_window) - 1


def test_stream_heavy_hitters_mg_contract(spark, events_dir):
    """Windowed streaming Misra-Gries: for every CLOSED (window, shard)
    the emitted candidates must (a) be a superset of the true
    shard-heavy values (count > n_shard/(k+1)), (b) bracket every true
    count within [count_min, count_min + err_bound], and (c) report the
    exact shard row count — checked against a python recomputation
    using Spark's own shard assignment."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.streaming import stream_heavy_hitters

    K, SHARDS = 16, 4
    got = _run_stream(
        spark,
        events_dir,
        lambda s: stream_heavy_hitters(
            s, value_col="user_id", k=K, n_shards=SHARDS,
            watermark_delay="0 seconds",
        ),
        "hh",
    ).collect()
    assert len(got) > 0

    events = spark.read.parquet(events_dir)
    shard_of = {
        r["user_id"]: r["s"]
        for r in events.select("user_id").distinct().select(
            "user_id",
            F.pmod(
                F.xxhash64(F.col("user_id").cast("string")), F.lit(SHARDS)
            ).cast("int").alias("s"),
        ).collect()
    }
    rows = events.select("ts", "user_id").collect()
    max_ts = max(r["ts"] for r in rows)
    truth = defaultdict(Counter)
    for r in rows:
        w = r["ts"].replace(minute=0, second=0, microsecond=0)
        truth[(int(w.timestamp() * 1_000_000),
               shard_of[r["user_id"]])][str(r["user_id"])] += 1

    import datetime as _dt
    wm_us = int(max_ts.timestamp() * 1_000_000)
    emitted = defaultdict(dict)
    for r in got:
        emitted[(r["window_start_us"], r["shard"])][r["value"]] = r
    for (wstart, shard), cnt in truth.items():
        if wstart + 3_600_000_000 > wm_us:
            continue  # window still open at end of drain
        n_shard = sum(cnt.values())
        cand = emitted.get((wstart, shard), {})
        # every emitted row honors the MG bracket + exact n
        for v, row in cand.items():
            true_c = cnt.get(v, 0)
            assert row["n_shard"] == n_shard, (wstart, shard)
            assert row["count_min"] <= true_c <= (
                row["count_min"] + row["err_bound"]
            ), (wstart, shard, v, true_c, dict(row.asDict()))
        # superset guarantee for shard-heavy values
        for v, c in cnt.items():
            if c * (K + 1) > n_shard:
                assert v in cand, (wstart, shard, v, c, n_shard)
