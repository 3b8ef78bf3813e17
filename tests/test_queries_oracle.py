"""Driver-contract gate: every queries() entry runs; every oracle-backed
one matches DuckDB exactly at sf0.01 — a faithful local replica of the
driver's CORRECTNESS check, including its pandas round-trip: both sides
go THROUGH pandas frames and compare with dtype-sensitive
canonicalization (int64 vs float64 of equal value differ), the exact
semantics under which DuckDB HUGEINT promotion broke 10 queries in
round 1."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

from .conftest import SF_SMALL

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(_REPO, "tools", "check_oracle.py")
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)
frame_rowset = check_oracle.frame_rowset


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    spdf = QUERIES[name](spark, SF_SMALL).toPandas()
    opdf = duck.sql(ORACLES[name]).df()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf)
    assert frame_rowset(spdf) == frame_rowset(opdf)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    spdf = QUERIES[name](spark, SF_SMALL).toPandas()
    assert list(spdf.columns)  # stable schema
    assert len(spdf) > 0, f"{name} returned no rows at sf0.01"
    # the driver canonicalizes rows-only frames too: unhashable cells
    # (list columns) crashed its harness in round 1 — must not recur
    frame_rowset(spdf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {
        "url", "extracted_text", "n_spans", "lang", "payload_type", "ok",
        "doc_json",
    } == set(df.columns)


def test_registry_consistency():
    """Driver-contract invariants: exactly 50 registered queries (the
    driver report cap), every oracle key names a registered query, and
    every oracle string at least PARSES in DuckDB against empty-shaped
    views — a typo'd oracle should fail here, not as a driver-gate
    error row."""
    import duckdb

    assert len(QUERIES) == 50
    assert set(ORACLES) <= set(QUERIES)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
            " LIMIT 0"
        )
    for name, sql in ORACLES.items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover - diagnostic path
            raise AssertionError(f"oracle {name} failed to plan: {exc}")
