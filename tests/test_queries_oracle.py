"""Driver-contract gate: every queries() entry runs; every oracle-backed
one matches DuckDB exactly (row count + columns + order-insensitive
canonical values) at sf0.01 — a faithful local replica of the driver's
CORRECTNESS check."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

from .conftest import SF_SMALL

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    # tuples, not joined strings: a '|' inside a value must not let two
    # different rows canonicalize identically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


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
    df = QUERIES[name](spark, SF_SMALL)
    scols = df.columns
    srows = [[r[c] for c in scols] for r in df.collect()]
    res = duck.sql(ORACLES[name])
    ocols = list(res.columns)
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert rowset(scols, srows) == rowset(ocols, orows)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    rows = df.collect()
    assert df.columns  # stable schema
    assert len(rows) > 0, f"{name} returned no rows at sf0.01"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "extracted_text", "n_spans", "lang", "payload_type", "ok"} == set(
        df.columns
    )
