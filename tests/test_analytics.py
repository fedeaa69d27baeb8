"""Analytics-suite tests (SURVEY.md §3.2 parity): run the nine notebook
analyses over transformed fixture tables; assert shapes and the
hand-computable statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from etl_airbnb_mex_spark.plans import analytics as an
from etl_airbnb_mex_spark.plans.transforms import (
    transform_listings,
    transform_reviews,
)
from tests.test_pipeline import make_listing, make_review


@pytest.fixture(scope="module")
def listings(spark):
    rows = [
        make_listing(id=i, price=f"${p}.00",
                     room_type="Entire home/apt" if i % 2 else "Private room",
                     neighbourhood_cleansed="Roma" if i % 4 else "Condesa")
        for i, p in enumerate([100, 200, 300, 400, 1000, 2000, 100, 100], 1)
    ]
    df = transform_listings(spark.createDataFrame(rows))
    df.persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def reviews(spark):
    rows = [
        make_review(id=i, date=f"2024-0{1 + i % 3}-15",
                    comments=c)
        for i, c in enumerate(
            ["good", "terrible", "plain", "excellent stay", "bad bad", "ok"], 1
        )
    ]
    return transform_reviews(spark.createDataFrame(rows))


def test_informacion_general(listings):
    row = an.informacion_general(listings).collect()[0]
    assert row["n_rows"] == 8
    assert row["n_cols"] == len(listings.columns)
    assert row["n_double_cols"] >= 9


def test_calidad_y_duplicados(listings):
    quality = an.calidad_datos(listings, top=5).collect()
    assert len(quality) == 5 and set(quality[0].asDict()) == {
        "column_name", "null_count", "completeness_pct"
    }
    dup = an.duplicados(listings).collect()[0]
    assert (dup["dup_rows"], dup["dup_keys"]) == (0, 0)


def test_distribuciones_y_trim(listings):
    d = an.distribuciones_numericas(listings, "price_clean").collect()[0]
    assert d["cnt"] == 8 and d["min"] == 100.0 and d["max"] == 2000.0
    assert d["p50"] == 250.0  # exact interpolated median of the 8 prices
    trimmed = an.trim_quantile(listings, "price_clean", 0.5)
    assert trimmed.count() == 4  # <= exact p50


def test_categorico(listings):
    top = an.analisis_categorico(listings, "neighbourhood_cleansed").collect()
    assert top[0]["neighbourhood_cleansed"] == "Roma"
    assert top[0]["cnt"] == 6 and top[0]["pct"] == 75.0


def test_precios(listings):
    suite = an.analisis_precios(listings)
    s = suite["stats"].collect()[0]
    assert s["mean_price"] == 525.0 and s["median_price"] == 250.0
    p = suite["percentiles"].collect()[0]
    assert p["p50"] == 250.0
    by_room = {r["room_type_normalizado"]: r for r in suite["por_room_type"].collect()}
    assert by_room["Casa/Departamento completo"]["count"] == 4


def test_reviews_suite(reviews):
    suite = an.analisis_reviews(reviews)
    rng = suite["rango_fechas"].collect()[0]
    assert rng["min_ts"].startswith("2024-01-15")
    assert rng["max_ts"].startswith("2024-03-15")
    months = {r["month"]: r["cnt"] for r in suite["por_mes"].collect()}
    assert months == {"2024-01-01": 2, "2024-02-01": 2, "2024-03-01": 2}
    sent = suite["sentimiento"].collect()[0]
    # good(+1), terrible(−2 dup), plain(0), excellent(+1), bad(−1), ok(0)
    assert (sent["n_pos"], sent["n_neg"], sent["n_neutral"]) == (2, 2, 2)


def test_outliers(listings):
    out = an.analisis_outliers(listings, ["price_clean"])["price_clean"].collect()[0]
    # Q1=100, Q3=850 → IQR=750 → hi=1975 → only the 2000 row is flagged
    assert out["outlier_count"] == 1
    assert out["outlier_min"] == 2000.0


def test_correlaciones(spark):
    df = spark.createDataFrame(
        [Row(a=float(i), b=float(2 * i), c=float(-i), d=None if i else 1.0)
         for i in range(100)]
    )
    corr = an.analisis_correlaciones(df, ["a", "b", "c", "d"], min_non_null=50)
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in corr.collect()}
    # d screened out (1 non-null); perfect correlations on a/b/c
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert got[("a", "b")] == 1.0 and got[("a", "c")] == -1.0
    ranked = an.correlacion_vs_target(corr, "a").collect()
    assert [r["column"] for r in ranked] == ["b", "c"]


def test_resumen_final(listings, reviews):
    rows = {r["tabla"]: r["registros"]
            for r in an.resumen_final({"listings": listings, "reviews": reviews}).collect()}
    assert rows["TOTAL"] == rows["listings"] + rows["reviews"]


def test_generar_graficos_artifacts(listings, reviews, tmp_path):
    """§3.2 — the 8 reference chart artifacts are produced from
    transformed tables (CSV fallback here: no matplotlib in this
    container; the aggregation is identical either way)."""
    import os

    from etl_airbnb_mex_spark.plans.plots import generar_graficos

    paths = generar_graficos(listings, reviews, str(tmp_path / "charts"))
    assert len(paths) == 8
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0
    # spot-check one artifact's content is the real aggregate
    top = [p for p in paths if "top_neighbourhoods" in p][0]
    text = open(top).read()
    assert "Roma" in text or "Condesa" in text
