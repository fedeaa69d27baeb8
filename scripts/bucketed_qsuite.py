#!/usr/bin/env python
"""Co-bucketed q-suite layout demo (VERDICT r10 #7, generalized to the
whole join suite in r12 per VERDICT r11 #9): write lineitem / orders /
customer bucketed on their join keys at sf4, retime q21 / q5 / q9 /
join_inner_fk on the bucketed layout vs the plain-parquet layout, and
count hash exchanges in the EXECUTED plans.

This is the write-once/join-many story a 100 TB deployment actually
uses: the suite's big exchanges are fact-fact join shuffles
(lineitem⋈orders on orderkey, orders⋈customer on custkey) and
aggregation exchanges clustered on the same keys. A layout bucketed by
the join key (write_bucketed_table, sources/writers.py) establishes
HashPartitioning ONCE at write time; the join then needs NO Exchange
on the bucketed side(s), and downstream groupBys on a subset of the
keys are satisfied by the same partitioning.

Orders appears in TWO candidate layouts (o_bkt by o_orderkey for the
lineitem joins; o_bkt_ck by o_custkey for the customer joins) because
one table can only be bucketed one way per copy — the script measures
both so the trade is explicit. A real deployment picks by workload
share, or keeps both copies: at 100 TB a second sorted copy of orders
costs storage, while every query in the custkey family saves its
widest shuffle.

Each query runs the registered logical plan parameterized by input
frames, so bucketed and plain runs execute the IDENTICAL plan — only
the table layout differs — and results are asserted identical (layout
is an optimization, never a semantics change). pytest already proves
exchange-free bucketed joins in the small
(tests/test_writers.py::test_bucketed_join_has_no_exchange); this
script measures the payoff at sf4 and records it in
BENCH_SIDECAR.json under "bucketed_layout".

Methodology: bench.py conventions — warm pass 0, record min of passes
1-2, full toPandas. The one-time bucketed write cost is recorded (the
amortized side of the trade).

Usage: python scripts/bucketed_qsuite.py [sf_dir] [--aqe-off-bucketed]

--aqe-off-bucketed (VERDICT r15 #6): re-time each BUCKETED arm with
spark.sql.adaptive.enabled=false (a runtime SQL conf, toggled around
the timed passes only) and stamp the on/off pair in the sidecar. For a
FULLY-bucketed plan AQE has nothing to re-plan — no runtime exchange
to size, no skew to split — and only adds stage-materialization round
trips, so AQE-off is the deployment recipe for a recurring bucketed
job: static layouts + static plans (r15_aqe_ab measured 20-32% off
q5/join_inner_fk twins). Registered plans keep AQE ON — it is
session-global and the other 200+ entries want skew/coalesce handling
— which is exactly why the recipe lives here as one reproducible
command instead of a plan change.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

N_BUCKETS = 32


def build_q21(li: DataFrame, o: DataFrame, s: DataFrame) -> DataFrame:
    """The registered q21 single-pass plan — since r14 this IS the
    registered builder (queries/decision.py:_q21_from_frames), so the
    script cannot drift from what the engine ships."""
    from etl_airbnb_mex_spark.queries.decision import _q21_from_frames

    return _q21_from_frames(li=li, o=o, s=s)


def build_q5(
    c: DataFrame, o: DataFrame, li: DataFrame, s: DataFrame,
    n: DataFrame, r: DataFrame,
) -> DataFrame:
    """The r12-registered q5 plan: customer ⋈ orders on custkey,
    ⋈ lineitem on orderkey, supplier + nation/region dims. With
    o_bkt_ck + c_bkt the custkey join is exchange-free; the lineitem
    side reads pre-partitioned from li_bkt. NOTE (r13): the registered
    q5 moved to a fact-rooted join order with driver-side dim
    resolution and isin scan pushdown (queries/decision.py) — this
    builder intentionally keeps the r12 shape so the recorded
    bucketed_layout rows (6->4 exchanges, 2.23x at sf24) stay
    interpretable against the plan they measured; the r13 plan's
    shuffle volume is ~5x smaller per row to begin with (458 MB at
    sf4 -> 543 MB at sf24)."""
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    dim = F.broadcast(
        n.join(
            r.filter(F.col("r_name") == "ASIA"),
            n["n_regionkey"] == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == s["s_suppkey"])
            & (F.col("c_nationkey") == s["s_nationkey"]),
        )
        .join(dim, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (F.sum(rev_e4).cast("double") / F.lit(10000.0)).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def build_q9(
    li: DataFrame, o: DataFrame, s: DataFrame, n: DataFrame, p: DataFrame,
) -> DataFrame:
    """The registered q9 plan — since r15 this IS the registered
    builder (queries/decision.py:_q9_from_frames, extracted for the
    layout A/B), so the script cannot drift from what the engine
    ships. With li_bkt + o_bkt the orderkey join is exchange-free on
    both sides (q9's ONLY data-scale shuffle — see sidecar
    q9_layout_ab). NOTE (r16): this script's bucketed arm measures the
    full-width co-bucket in isolation; the REGISTERED q9_bucketed twin
    additionally stores the margin inputs cents-encoded (li_ok_q9c,
    cents_encoded=True — another −24/−32 % executor CPU at sf24/sf32,
    sidecar q9_twin_ab), so its wall is below this arm's."""
    from etl_airbnb_mex_spark.queries.decision import _q9_from_frames

    return _q9_from_frames(
        li=li, o=o, s=s,
        n=F.broadcast(n.select("n_nationkey", "n_name")),
        p=F.broadcast(
            p.filter(F.col("p_type") == "ECONOMY")
            .select("p_partkey", "p_retailprice")
        ),
    )


def build_join_inner_fk(o: DataFrame, c: DataFrame) -> DataFrame:
    """The registered join_inner_fk plan (r13 form: aggregate-through-
    join pushdown + SHUFFLE_HASH) — since r14 this IS the registered
    builder (queries/extensions.py:_join_inner_fk_from_frames), so the
    script cannot drift from what the engine ships. Layout story:
    with orders bucketed on o_custkey the partial agg needs no
    exchange, and with customer co-bucketed on c_custkey neither does
    the join — the bucketed run drops BOTH data-scale exchanges,
    leaving only the 5-row segment rollup pair (pre-r13 history: the
    old direct-join form ran an identical BroadcastHashJoin on both
    layouts, so its recorded 1.8-2.2x speedups were scan-side only)."""
    from etl_airbnb_mex_spark.queries.extensions import (
        _join_inner_fk_from_frames,
    )

    return _join_inner_fk_from_frames(o=o, c=c)


def _time(df_fn) -> float:
    best = float("inf")
    for recorded in (False, True, True):
        t0 = time.perf_counter()
        df_fn().toPandas()
        dt = time.perf_counter() - t0
        if recorded:
            best = min(best, dt)
    return round(best, 3)


def _n_exchanges(df: DataFrame) -> int:
    """Count hash exchanges in the FINAL adaptive plan: with AQE on,
    stringifying an un-executed plan shows the initial
    AdaptiveSparkPlan (isFinalPlan=false) — exchange reuse/coalescing
    decided at runtime would be invisible, so the frame is executed
    first and the post-execution plan is what gets counted
    (review r11)."""
    df.toPandas()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--aqe-off-bucketed"]
    aqe_ab = "--aqe-off-bucketed" in sys.argv[1:]
    sf_dir = args[0] if args else os.path.join(
        REPO, ".scaledata", "sf4"
    )
    label = os.path.basename(sf_dir.rstrip("/"))
    warehouse = os.path.join(REPO, ".scaledata", f"warehouse_{label}")
    shutil.rmtree(warehouse, ignore_errors=True)

    from etl_airbnb_mex_spark.session import get_spark
    from etl_airbnb_mex_spark.sources.writers import write_bucketed_table
    from etl_airbnb_mex_spark.tables import load_table

    spark = get_spark(
        app_name=f"bucketed-qsuite-{label}",
        extra_conf={
            "spark.sql.warehouse.dir": warehouse,
            # trust sortBy metadata on single-file buckets (see
            # write_bucketed_table docstring)
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
        },
    )

    li_cols = (
        "l_orderkey", "l_suppkey", "l_partkey", "l_shipdate",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o_cols = ("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c_cols = ("c_custkey", "c_nationkey", "c_mktsegment")
    plain_li = load_table(spark, sf_dir, "lineitem").select(*li_cols)
    plain_o = load_table(spark, sf_dir, "orders").select(*o_cols)
    plain_c = load_table(spark, sf_dir, "customer").select(*c_cols)
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")

    # one-time layout writes (the amortized cost of the story); orders
    # is written in BOTH candidate layouts — see module docstring
    t0 = time.perf_counter()
    write_bucketed_table(
        plain_li, "li_bkt", ("l_orderkey",), n_buckets=N_BUCKETS,
        sort_cols=("l_orderkey",),
    )
    write_bucketed_table(
        plain_o, "o_bkt", ("o_orderkey",), n_buckets=N_BUCKETS,
        sort_cols=("o_orderkey",),
    )
    write_bucketed_table(
        plain_o, "o_bkt_ck", ("o_custkey",), n_buckets=N_BUCKETS,
        sort_cols=("o_custkey",),
    )
    write_bucketed_table(
        plain_c, "c_bkt", ("c_custkey",), n_buckets=N_BUCKETS,
        sort_cols=("c_custkey",),
    )
    write_sec = round(time.perf_counter() - t0, 3)

    bkt_li = spark.table("li_bkt")
    bkt_o = spark.table("o_bkt")
    bkt_o_ck = spark.table("o_bkt_ck")
    bkt_c = spark.table("c_bkt")

    cases = {
        "q21": (
            lambda: build_q21(plain_li, plain_o, s),
            lambda: build_q21(bkt_li, bkt_o, s),
        ),
        "q5": (
            lambda: build_q5(plain_c, plain_o, plain_li, s, n, r),
            lambda: build_q5(bkt_c, bkt_o_ck, bkt_li, s, n, r),
        ),
        "q9": (
            lambda: build_q9(plain_li, plain_o, s, n, p),
            lambda: build_q9(bkt_li, bkt_o, s, n, p),
        ),
        "join_inner_fk": (
            lambda: build_join_inner_fk(plain_o, plain_c),
            lambda: build_join_inner_fk(bkt_o_ck, bkt_c),
        ),
    }

    #: replica -> registered registry key, so the hand-parameterized
    #: plans above cannot silently drift from what the engine actually
    #: ships (review r12: the builders duplicate the registered plan
    #: bodies; this asserts the duplication stays faithful every run)
    registered = {
        "q21": "q21_waiting_suppliers",
        "q5": "q5_local_supplier_volume",
        "q9": "q9_product_margin",
        "join_inner_fk": "join_inner_fk",
    }
    from etl_airbnb_mex_spark.queries import REGISTRY, _load

    _load()

    rows: dict[str, dict] = {}
    for qname, (plain_fn, bkt_fn) in cases.items():
        plain_df, bkt_df = plain_fn(), bkt_fn()
        exch_plain = _n_exchanges(plain_df)  # executes once (warm-up)
        exch_bkt = _n_exchanges(bkt_df)
        plain_sec = _time(plain_fn)
        bkt_sec = _time(bkt_fn)
        a = plain_df.toPandas().values.tolist()
        b = bkt_df.toPandas().values.tolist()
        assert a == b, f"bucketed layout changed {qname}'s result"
        reg = (
            REGISTRY[registered[qname]]
            .spark(spark, sf_dir)
            .toPandas()
            .values.tolist()
        )
        assert a == reg, (
            f"{qname}: the script's plain-layout replica diverged from "
            f"the registered {registered[qname]} plan — update the "
            "builder to match queries/*.py"
        )
        rows[qname] = {
            "plain_sec": plain_sec,
            "bucketed_sec": bkt_sec,
            "speedup": round(plain_sec / bkt_sec, 2),
            "exchanges_plain": exch_plain,
            "exchanges_bucketed": exch_bkt,
        }
        if aqe_ab:
            # AQE is a RUNTIME SQL conf: flip it around the bucketed
            # passes only, restore before the next case (the plain arm
            # and result asserts above all ran with AQE on, like the
            # registered plans)
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                off_df = bkt_fn()
                assert off_df.toPandas().values.tolist() == a, (
                    f"{qname}: AQE-off bucketed arm changed the result"
                )
                off_sec = _time(bkt_fn)
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            rows[qname]["bucketed_aqe_off_sec"] = off_sec
            rows[qname]["aqe_off_speedup_vs_plain"] = round(
                plain_sec / off_sec, 2
            )
        print(f"# {label} {qname}: {rows[qname]}", file=sys.stderr,
              flush=True)
    spark.stop()

    out = {
        "sf_dir": sf_dir,
        "n_buckets": N_BUCKETS,
        "bucketed_write_sec": write_sec,
        "queries": rows,
    }
    if aqe_ab:
        out["aqe_off_bucketed"] = (
            "bucketed arms re-timed with spark.sql.adaptive.enabled="
            "false (the static-layouts+static-plans deployment recipe "
            "for recurring bucketed jobs; VERDICT r15 #6) — results "
            "asserted identical both ways"
        )

    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10, cwd=REPO,
        ).stdout.strip()
    except (OSError, subprocess.SubprocessError):
        head = "unknown"
    path = os.path.join(REPO, "BENCH_SIDECAR.json")
    try:
        with open(path) as f:
            sidecar = json.load(f)
    except (OSError, ValueError):
        sidecar = {}
    bl = sidecar.setdefault("bucketed_layout", {})
    bl["commit"] = head
    bl["method"] = (
        "scripts/bucketed_qsuite.py: registered q21/q5/q9/join_inner_fk "
        "plans run on plain parquet vs bucketBy(32) sortBy layouts "
        "(li_bkt/o_bkt on orderkey, o_bkt_ck/c_bkt on custkey; orders "
        "measured in both candidate layouts — a deployment picks per "
        "workload); identical logical plans and verified-identical "
        "results; warm + min of 2; exchanges counted on executed plans."
    )
    bl[label] = out
    with open(path, "w") as f:
        json.dump(sidecar, f, separators=(",", ":"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
