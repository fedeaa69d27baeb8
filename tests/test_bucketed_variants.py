"""Bucketed-layout twins (queries/bucketed.py, VERDICT r13 #8): the
registered q5/q21/join_inner_fk bucketed variants must (a) produce
results identical to their plain twins (layout is an optimization,
never a semantics change), (b) carry the plain twin's oracle SQL
verbatim, (c) actually drop the exchanges the layout exists to drop,
and (d) survive the cache lifecycle (cross-session DDL re-register,
stale-stamp rewrite).
"""

from __future__ import annotations

import json
import os

import pytest

from etl_airbnb_mex_spark.queries import REGISTRY, _load

_load()

TWINS = [
    ("join_inner_fk", "join_inner_fk_bucketed"),
    ("q21_waiting_suppliers", "q21_bucketed"),
    ("q5_local_supplier_volume", "q5_bucketed"),
    ("q9_product_margin", "q9_bucketed"),
]


@pytest.mark.parametrize("plain,bkt", TWINS)
def test_bucketed_twin_equals_plain(spark, sf_dir, plain, bkt):
    a = REGISTRY[plain].spark(spark, sf_dir).toPandas()
    b = REGISTRY[bkt].spark(spark, sf_dir).toPandas()
    assert list(a.columns) == list(b.columns)
    assert a.values.tolist() == b.values.tolist(), (plain, bkt)


@pytest.mark.parametrize("plain,bkt", TWINS)
def test_bucketed_twin_oracle_is_plain_oracle(plain, bkt):
    """The twins' correctness claim IS layout invariance: same SQL,
    same driver hash — any drift between the shared builder's two
    call sites would fail the twin's own oracle row."""
    assert REGISTRY[bkt].oracle == REGISTRY[plain].oracle
    assert REGISTRY[bkt].oracle is not None


def _n_hash_exchanges(df) -> int:
    """Hash exchanges in the FINAL adaptive plan (the frame is executed
    first: an un-executed AQE plan hides runtime exchange decisions)."""
    df.toPandas()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    )


@pytest.mark.parametrize(
    "plain,bkt",
    [t for t in TWINS if t[1] not in ("q5_bucketed", "q9_bucketed")],
)
def test_bucketed_twin_drops_exchanges(spark, sf_dir, plain, bkt):
    """join_inner_fk: the o_custkey partial-agg exchange AND both
    SHUFFLE_HASH join exchanges vanish; q21: the orderkey join runs
    exchange-free on both sides and HashPartitioning(l_orderkey)
    satisfies both downstream aggs. What remains in each is the
    metadata-scale final-agg pair (5 segments / 25 names). q5 and q9
    are excluded here: at test SF their joins all broadcast, so plain
    and bucketed tie (their wins are measured at sf4+,
    BENCH_SIDECAR.json:bucketed_layout / q9_layout_ab — q9's orderkey
    join drops 6->2 exchanges and 638->0.21 MB shuffle at sf24)."""
    ep = _n_hash_exchanges(REGISTRY[plain].spark(spark, sf_dir))
    eb = _n_hash_exchanges(REGISTRY[bkt].spark(spark, sf_dir))
    assert eb < ep, (plain, ep, bkt, eb)
    assert eb <= 2, (bkt, eb)


def test_bucketed_cache_reuses_and_rewrites_on_stale(spark, tmp_path):
    """Lifecycle: first call writes the layout + stamp; a second call
    reuses it (the stamp matches); regenerating the SOURCE parquet
    in place invalidates the stamp and the next call rewrites."""
    import etl_airbnb_mex_spark.queries.bucketed as B

    sf = str(tmp_path)
    spark.range(100).selectExpr(
        "id AS o_orderkey", "id % 10 AS o_custkey",
        "CAST(id AS DOUBLE) AS o_totalprice",
    ).toPandas().to_parquet(os.path.join(sf, "orders.parquet"))
    df1 = B.bucketed_table(spark, sf, "o_ck")
    assert df1.count() == 100
    path = os.path.join(B._cache_root(), B._label(sf), "o_ck")
    stamp = json.load(open(path + "_STAMP.json"))
    # reuse: stamp file untouched by the second call
    before = os.stat(path + "_STAMP.json").st_mtime_ns
    assert B.bucketed_table(spark, sf, "o_ck").count() == 100
    assert os.stat(path + "_STAMP.json").st_mtime_ns == before
    assert stamp["n_buckets"] == B.N_BUCKETS
    # regen source with different contents -> rewrite
    spark.range(50).selectExpr(
        "id AS o_orderkey", "id % 5 AS o_custkey",
        "CAST(id AS DOUBLE) AS o_totalprice",
    ).toPandas().to_parquet(os.path.join(sf, "orders.parquet"))
    st = os.stat(os.path.join(sf, "orders.parquet"))
    os.utime(os.path.join(sf, "orders.parquet"),
             ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert B.bucketed_table(spark, sf, "o_ck").count() == 50


def test_bucketed_ddl_reregister_matches_write(spark, tmp_path):
    """Cross-session path: with the files + stamp on disk but the
    table absent from the (in-memory) catalog, bucketed_table must
    re-attach via CREATE TABLE ... CLUSTERED BY ... LOCATION and the
    re-attached table must still be bucket-scannable with identical
    contents."""
    import etl_airbnb_mex_spark.queries.bucketed as B

    sf = str(tmp_path)
    spark.range(200).selectExpr(
        "id AS o_orderkey", "id % 7 AS o_custkey",
        "CAST(id AS DOUBLE) AS o_totalprice",
    ).toPandas().to_parquet(os.path.join(sf, "orders.parquet"))
    first = B.bucketed_table(spark, sf, "o_ck")
    rows = sorted(r["o_orderkey"] for r in first.collect())
    tname = f"bkt_{B._label(sf)}_o_ck"
    # simulate a new session: drop ONLY the catalog entry, keep files
    spark.sql(f"DROP TABLE `{tname}`")
    again = B.bucketed_table(spark, sf, "o_ck")
    assert sorted(r["o_orderkey"] for r in again.collect()) == rows
    meta = spark.sql(f"DESCRIBE TABLE EXTENDED `{tname}`").toPandas()
    blob = " ".join(str(v) for v in meta.values.tolist())
    assert "32" in blob and "o_custkey" in blob  # bucket spec survived


def test_multifile_bucket_refuses_attach(spark, tmp_path):
    """VERDICT r14 #2 / ADVICE r14 #2: the session-global sort-trust
    flag is legal only for one-file-per-bucket layouts, so an attach
    over a directory with two files in one bucket must REFUSE rather
    than silently claim per-bucket ordering (a concatenated pair of
    sorted files is not sorted; an SMJ would return wrong results).
    Simulated by duplicating one bucket file under a second task id in
    the cached layout, then forcing the DDL re-attach path."""
    import shutil

    import etl_airbnb_mex_spark.queries.bucketed as B

    sf = str(tmp_path)
    spark.range(100).selectExpr(
        "id AS o_orderkey", "id % 10 AS o_custkey",
        "CAST(id AS DOUBLE) AS o_totalprice",
    ).toPandas().to_parquet(os.path.join(sf, "orders.parquet"))
    B.bucketed_table(spark, sf, "o_ck")
    tname = f"bkt_{B._label(sf)}_o_ck"
    path = os.path.join(B._cache_root(), B._label(sf), "o_ck")
    # duplicate one bucket's file under a different task prefix
    victim = next(
        fn for fn in os.listdir(path)
        if not fn.startswith(".") and B._BUCKET_ID_RE.search(fn)
    )
    shutil.copy(
        os.path.join(path, victim),
        os.path.join(path, "part-99999-deadbeef" + victim[10:]),
    )
    # catalog-hit path must refuse
    with pytest.raises(ValueError, match="multiple"):
        B.bucketed_table(spark, sf, "o_ck")
    # DDL re-attach path (fresh session simulation) must refuse too
    spark.sql(f"DROP TABLE `{tname}`")
    with pytest.raises(ValueError, match="multiple"):
        B.bucketed_table(spark, sf, "o_ck")


def test_twin_correct_with_sort_trust_flag_off(spark, sf_dir):
    """The module docstring claims deployments that must keep
    spark.sql.legacy.bucketedTableScan.outputOrdering OFF (external
    multi-file-bucket tables in the session) still get correct twins —
    the scan just stops claiming per-bucket order and any SMJ re-sorts.
    Prove it: run a twin with the flag forced off and compare to the
    plain entry. bucketed_table re-enables the flag on the next attach,
    so restore-by-rerun is the teardown."""
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    plain = REGISTRY["q21_waiting_suppliers"].spark(spark, sf_dir).toPandas()
    # attach first (sets the flag), then force it off for execution
    df = REGISTRY["q21_bucketed"].spark(spark, sf_dir)
    spark.conf.set(key, "false")
    try:
        got = df.toPandas()
    finally:
        spark.conf.set(key, "true")
    assert got.values.tolist() == plain.values.tolist()


def test_projected_layout_roundtrip_and_reattach(spark, tmp_path):
    """li_ok_q9c (r16, VERDICT r15 #3): a layout with a write-time
    projection must (a) store the cents-encoded schema, (b) encode
    with the IDENTICAL round()+cast chain the plain builder applies
    at read time (bit-identical margin arithmetic is the twin's
    correctness claim), and (c) survive the cross-session DDL
    re-attach, whose column list now derives from the projection
    rather than the source table."""
    from pyspark.sql import functions as F

    import etl_airbnb_mex_spark.queries.bucketed as B

    sf = str(tmp_path)
    spark.range(300).selectExpr(
        "id AS l_orderkey", "id % 9 AS l_suppkey",
        "id % 17 AS l_partkey",
        "CAST(id % 50 AS DOUBLE) + 0.4 AS l_quantity",
        "CAST(id AS DOUBLE) * 1.005 AS l_extendedprice",
        "CAST(id % 10 AS DOUBLE) / 100 AS l_discount",
    ).toPandas().to_parquet(os.path.join(sf, "lineitem.parquet"))
    t = B.bucketed_table(spark, sf, "li_ok_q9c")
    assert set(t.columns) == {
        "l_orderkey", "l_suppkey", "l_partkey",
        "l_eprice_e2", "l_disc_e2", "l_qty",
    }
    assert dict(t.dtypes)["l_eprice_e2"] == "bigint"
    src = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    expect = {
        r["l_orderkey"]: (r["e"], r["d"], r["q"])
        for r in src.select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100).cast("long")
            .alias("e"),
            F.round(F.col("l_discount") * 100).cast("long").alias("d"),
            F.round(F.col("l_quantity")).cast("long").alias("q"),
        ).collect()
    }
    def _snap(df):
        return {
            r["l_orderkey"]: (r["l_eprice_e2"], r["l_disc_e2"], r["l_qty"])
            for r in df.collect()
        }
    assert _snap(t) == expect
    tname = f"bkt_{B._label(sf)}_li_ok_q9c"
    spark.sql(f"DROP TABLE `{tname}`")
    again = B.bucketed_table(spark, sf, "li_ok_q9c")
    assert set(again.columns) == set(t.columns)
    assert _snap(again) == expect
