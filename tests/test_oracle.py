"""Oracle differential tests — the local replica of the driver's
correctness gate. Every registered query must match its DuckDB oracle
(row count + schema + order-insensitive values) at the test scale
factor; rows-only queries must at least execute and return a stable
schema."""

from __future__ import annotations

import pytest

from etl_airbnb_mex_spark.oracle import compare_query, duckdb_connection
from etl_airbnb_mex_spark.queries import REGISTRY, _load

_load()
ALL_NAMES = sorted(REGISTRY)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    result = compare_query(spark, sf_dir, name, con)
    assert result.ok, str(result)


def test_entry_smoke(spark):
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"

    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 10
