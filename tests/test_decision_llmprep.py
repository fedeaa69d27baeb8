"""Semantic property tests for the round-6 decision-support suite
(queries/decision.py) and LLM-prep batch (queries/llmprep.py).

Cross-engine value equality is covered by tests/test_oracle.py (the
local driver replica iterates every registry entry); these tests pin
the SEMANTICS — invariants that would still hold if both engines were
wrong the same way.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_airbnb_mex_spark.queries import REGISTRY, _load
from etl_airbnb_mex_spark.tables import load_table

_load()


def _run(spark, sf_dir, name):
    return REGISTRY[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# Decision-support suite
# ---------------------------------------------------------------------------


def test_q1_counts_reconcile(spark, sf_dir):
    pdf = _run(spark, sf_dir, "q1_pricing_summary")
    li = load_table(spark, sf_dir, "lineitem")
    expected = li.filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    ).count()
    assert int(pdf["count_order"].sum()) == expected
    # avg_qty must lie inside the quantity domain
    assert ((pdf["avg_qty"] >= 1) & (pdf["avg_qty"] <= 50)).all()


def test_q3_is_topk_ordered(spark, sf_dir):
    pdf = _run(spark, sf_dir, "q3_shipping_priority")
    assert len(pdf) <= 10
    revs = pdf["revenue"].tolist()
    assert revs == sorted(revs, reverse=True)


def test_q5_locality_predicate_binds(spark, sf_dir):
    """Every contributing (customer, supplier) pair shares a nation —
    re-derive one output row's revenue with an explicit filter."""
    pdf = _run(spark, sf_dir, "q5_local_supplier_volume")
    assert len(pdf) >= 1
    # nations in the result must all be in the ASIA region (keys 2,7,...)
    nat = load_table(spark, sf_dir, "nation").toPandas()
    reg = load_table(spark, sf_dir, "region").toPandas()
    asia = set(
        nat.merge(
            reg[reg.r_name == "ASIA"],
            left_on="n_regionkey",
            right_on="r_regionkey",
        )["n_name"]
    )
    assert set(pdf["n_name"]) <= asia


def test_q13_includes_zero_order_customers(spark, sf_dir):
    pdf = _run(spark, sf_dir, "q13_customer_distribution")
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert int(pdf["custdist"].sum()) == n_cust
    # the excluded priority guarantees a zero bucket is possible, and
    # every customer appears exactly once across buckets (checked above)


def test_q16_blocklist_excluded(spark, sf_dir):
    pdf = _run(spark, sf_dir, "q16_parts_supplier_cnt")
    # supplier_cnt can never exceed the supplier table cardinality
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert (pdf["supplier_cnt"] <= n_supp).all()
    assert (pdf["supplier_cnt"] >= 1).all()


def test_q19_revenue_subset_of_total(spark, sf_dir):
    pdf = _run(spark, sf_dir, "q19_disjunctive_revenue")
    li = load_table(spark, sf_dir, "lineitem")
    total = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    ).collect()[0][0]
    assert 0 <= pdf["revenue"][0] <= float(total)


# ---------------------------------------------------------------------------
# LLM-prep batch
# ---------------------------------------------------------------------------


def test_lang_id_partitions_corpus(spark, sf_dir):
    pdf = _run(spark, sf_dir, "lang_id_confusion")
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert int(pdf["n"].sum()) == n_docs
    assert set(pdf["predicted"]) <= {"de", "en", "es", "fr", "und"}


def test_chunker_covers_every_token(spark, sf_dir):
    """Chunk invariants: full chunks are exactly W tokens, the last
    chunk reaches the end of the document, consecutive starts differ
    by the stride."""
    pdf = _run(spark, sf_dir, "doc_chunk_overlap")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.size(F.split("text", r"\s+")).alias("n")
        )
        .toPandas()
        .set_index("doc_id")["n"]
    )
    for doc_id, grp in pdf.groupby("doc_id"):
        n = int(docs[doc_id])
        grp = grp.sort_values("chunk_idx")
        k = len(grp)
        assert k == 1 + math.ceil(max(n - 64, 0) / 48)
        # all but the last chunk are full
        assert (grp["n_tokens"].iloc[:-1] == 64).all()
        # last chunk ends exactly at the document end
        last_start = (k - 1) * 48
        assert last_start + int(grp["n_tokens"].iloc[-1]) == n


def test_semantic_dedup_bounds(spark, sf_dir):
    pdf = _run(spark, sf_dir, "semantic_dedup_clusters")
    assert (pdf["n_removed"] <= pdf["n_dup_pairs"]).all()
    # keep-lowest-id can never remove every member of a cluster
    assert (pdf["n_removed"] < pdf["n_members"]).all()
    mx = pdf["n_members"]
    assert (pdf["n_dup_pairs"] <= mx * (mx - 1) // 2).all()


def test_basket_lift_bounds(spark, sf_dir):
    pdf = _run(spark, sf_dir, "basket_lift")
    assert (pdf["n_pair"] >= 1).all()
    assert (pdf["lift_ppm"] > 0).all()


def test_gini_matches_pandas(spark, sf_dir):
    pdf = _run(spark, sf_dir, "gini_concentration")
    orders = load_table(spark, sf_dir, "orders").toPandas()
    rev = (
        orders.assign(
            rev=orders.o_totalprice.round(2)
        )
        .groupby("o_custkey")["rev"]
        .sum()
        .sort_values()
        .to_numpy()
    )
    n = len(rev)
    ranks = range(1, n + 1)
    gini = sum((2 * r - n - 1) * x for r, x in zip(ranks, rev)) / (
        n * rev.sum()
    )
    assert pdf["n_customers"][0] == n
    assert abs(pdf["gini"][0] - gini) < 1e-4
    assert 0.0 <= pdf["gini"][0] <= 1.0


def test_rfm_cells_partition_buyers(spark, sf_dir):
    pdf = _run(spark, sf_dir, "rfm_segments")
    n_buyers = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert int(pdf["n_customers"].sum()) == n_buyers
    assert len(pdf) <= 8


def test_ks_statistic_in_range(spark, sf_dir):
    pdf = _run(spark, sf_dir, "ks_drift_binned")
    ks = pdf["ks_ppm"][0]
    assert 0 <= ks <= 1_000_000
    # same-vs-same distribution must be 0 — sanity of the formula: the
    # click/error split of a common synthetic generator should be small
    # but nonzero at sf scale; just pin the bound here.
    assert pdf["n_click"][0] > 0 and pdf["n_error"][0] > 0


def test_ks_identical_distribution_is_zero(spark, sf_dir):
    """Formula sanity on constructed data: comparing a distribution
    with itself yields KS = 0 through the same integer cross-product
    max."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "v": [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0] * 5,
            "side": ["a", "b"] * 20,
        }
    )
    sdf = spark.createDataFrame(df)
    counts = (
        sdf.groupBy("v")
        .pivot("side", ["a", "b"])
        .count()
        .fillna(0)
        .toPandas()
        .sort_values("v")
    )
    c1 = counts["a"].cumsum()
    c2 = counts["b"].cumsum()
    t1, t2 = counts["a"].sum(), counts["b"].sum()
    assert max(abs(c1 * t2 - c2 * t1)) == 0


# ---------------------------------------------------------------------------
# Decision-support batch 2 (Q2/Q4/Q6/Q9/Q15/Q20/Q21 shapes)
# ---------------------------------------------------------------------------


def test_q2_cost_is_minimum(spark, sf_dir):
    pdf = _run(spark, sf_dir, "q2_min_cost_supplier")
    if len(pdf):
        # acctbal ordering is the spec's ranking
        bals = pdf["acctbal"].tolist()
        assert bals == sorted(bals, reverse=True)
        assert (pdf["unit_cost"] > 0).all()


def test_q4_counts_bounded_by_quarter(spark, sf_dir):
    pdf = _run(spark, sf_dir, "q4_order_priority")
    o = load_table(spark, sf_dir, "orders")
    quarter = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).count()
    assert 0 < int(pdf["order_count"].sum()) <= quarter


def test_q6_subset_of_unfiltered(spark, sf_dir):
    pdf = _run(spark, sf_dir, "q6_forecast_revenue")
    assert pdf["n_items"][0] > 0
    assert pdf["revenue"][0] > 0


def test_q15_returns_global_max(spark, sf_dir):
    pdf = _run(spark, sf_dir, "q15_top_supplier")
    assert len(pdf) >= 1
    # all returned suppliers tie at the same (maximal) revenue
    assert pdf["total_rev"].nunique() == 1


def test_q21_sole_late_supplier(spark, sf_dir):
    """Re-derive numwait for the top supplier with plain pandas."""
    pdf = _run(spark, sf_dir, "q21_waiting_suppliers")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).toPandas()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    ).toPandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["late"] = (
        m.l_shipdate > m.o_orderdate + __import__("pandas").Timedelta(days=90)
    ).astype(int)
    g = m.groupby(["l_orderkey", "l_suppkey"])["late"].max().reset_index()
    per_order = g.groupby("l_orderkey")["late"].agg(["count", "sum"])
    solo = per_order[(per_order["count"] > 1) & (per_order["sum"] == 1)].index
    waits = (
        g[(g.l_orderkey.isin(solo)) & (g.late == 1)]
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .groupby("s_name")
        .size()
    )
    if len(pdf):
        top = pdf.iloc[0]
        assert waits[top["s_name"]] == top["numwait"]
        assert top["numwait"] == waits.max()


# ---------------------------------------------------------------------------
# LLM-prep batch C
# ---------------------------------------------------------------------------


def test_hard_negatives_exclude_own_label(spark, sf_dir):
    pdf = _run(spark, sf_dir, "hard_negative_mining")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .toPandas()
        .set_index("vec_id")["label"]
    )
    for _, row in pdf.iterrows():
        assert emb[row["qid"]] != emb[row["vec_id"]]
    # each anchor contributes at most 3, ranked 1..k
    for qid, grp in pdf.groupby("qid"):
        assert list(grp["neg_rank"]) == list(range(1, len(grp) + 1))
        sims = grp.sort_values("neg_rank")["sim"].tolist()
        assert sims == sorted(sims, reverse=True)


def test_bigram_surprisal_nonpositive(spark, sf_dir):
    pdf = _run(spark, sf_dir, "bigram_surprisal")
    # add-1 smoothing keeps (c2+1)/(c1+V) <= 1, so log-probs are <= 0
    assert (pdf["logprob"] <= 0).all()
    assert (pdf["n_bigrams"] >= 1).all()


def test_split_leakage_counts_reconcile(spark, sf_dir):
    """Sum over split-pair cells equals the total number of
    within-label near-dup pairs (the semantic_dedup pair count)."""
    leak = _run(spark, sf_dir, "split_leakage_audit")
    sem = _run(spark, sf_dir, "semantic_dedup_clusters")
    assert int(leak["n_pairs"].sum()) == int(sem["n_dup_pairs"].sum())


def test_chunker_property_matches_python_model(spark):
    """Property check on the reusable chunker: for documents of every
    boundary-relevant token count (and a few odd ones), chunk count,
    per-chunk sizes, and content hashes all match a pure-Python
    reference model."""
    import hashlib

    from etl_airbnb_mex_spark.operators.corpus import chunk_documents

    W, S = 8, 5
    counts = [1, 2, 7, 8, 9, 12, 13, 14, 20, 21, 33]
    docs = [
        (i, " ".join(f"t{i}w{j}" for j in range(n)))
        for i, n in enumerate(counts)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = (
        chunk_documents(sdf, "doc_id", "text", window=W, stride=S)
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    for i, n in enumerate(counts):
        toks = [f"t{i}w{j}" for j in range(n)]
        starts = []
        s0 = 0
        while True:
            starts.append(s0)
            if s0 + W >= n:
                break
            s0 += S
        # model must agree with the closed form the operator uses
        assert len(starts) == 1 + -(-max(n - W, 0) // S)
        grp = got[got.doc_id == i]
        assert len(grp) == len(starts)
        for idx, st in enumerate(starts):
            chunk = toks[st:st + W]
            row = grp[grp.chunk_idx == idx].iloc[0]
            assert row["n_tokens"] == len(chunk)
            assert row["chunk_md5"] == hashlib.md5(
                " ".join(chunk).encode()
            ).hexdigest()


def test_q5_no_asia_region_yields_empty_not_crash(spark, tmp_path):
    """r13 regression: the driver-side dim resolution must degrade to
    an EMPTY result (typed n_name string) when no region named ASIA
    exists — the no-match branch builds a plain NULL literal, because
    indexing an empty create_map (or a non-map literal) fails
    analysis."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": ["EUROPE"],
    }), f"{sf}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1], pa.int32()),
        "n_name": ["FRANCE"],
        "n_regionkey": pa.array([0], pa.int32()),
    }), f"{sf}/nation.parquet")
    spark.createDataFrame(
        [(1, 1)], "c_custkey long, c_nationkey int"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(1, 1, "1997-06-01")], "o_orderkey long, o_custkey long, d string"
    ).selectExpr(
        "o_orderkey", "o_custkey", "cast(d as timestamp) as o_orderdate"
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(1, 1, 100.0, 0.1)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 1)], "s_suppkey long, s_nationkey int"
    ).write.parquet(f"{sf}/supplier.parquet")

    pdf = _run(spark, sf, "q5_local_supplier_volume")
    assert len(pdf) == 0
    assert list(pdf.columns) == ["n_name", "revenue"]
