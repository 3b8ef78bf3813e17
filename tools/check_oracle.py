"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
against ``oracle_sql()`` via DuckDB — *through pandas on both sides*,
mirroring the driver's semantics: the driver pulls the DuckDB result
with ``.df()`` and the Spark result with ``toPandas()``, sorts columns
by name, sorts rows, and hashes the frame.  Round 1 lesson (VERDICT
"What's wrong" #1): DuckDB promotes SUM(BIGINT) to HUGEINT, which
``.df()`` converts to float64 while Spark returns int64 — equal values,
different dtypes, different hashes.  The old fetchall()+str() compare
here could never see that class of bug; the pandas-dtype-sensitive
canonicalization below can.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def canon(v):
    """Dtype-sensitive canonical form: int64 and float64 of equal value
    canonicalize DIFFERENTLY (``i:5`` vs ``f:5.0``), exactly as the
    driver's pandas-frame hash treats them.

    Non-scalar cells RAISE TypeError, mirroring the driver's pandas
    sort/hash canonicalizer — round 1 shipped two queries with
    array<int> columns that only crashed in the driver; this gate must
    crash on them locally."""
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return "b:" + str(bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:nan"
        return "f:" + repr(f)
    if isinstance(v, (int, np.integer)):
        return "i:" + str(int(v))
    if isinstance(v, pd.Timestamp):
        return "t:" + v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return "t:" + v.isoformat()
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise TypeError(
            f"unhashable cell type: {type(v).__name__} — the driver's "
            "canonicalizer dies on non-scalar cells; serialize the "
            "column (to_json / concat_ws) before registering the query"
        )
    return "s:" + str(v)


def frame_rowset(pdf: pd.DataFrame):
    """Sorted-column, sorted-row tuple multiset of a pandas frame —
    the same shape the driver hashes."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(canon(None if (isinstance(v, float) and pd.isna(v)) or v is pd.NaT or v is None else v)
              for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    wanted = sys.argv[1:] or list(qs)
    failures = []
    for name in wanted:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        spdf = df.toPandas()
        scols = list(spdf.columns)
        dt = time.time() - t0
        if name not in oracles:
            # mirror the driver's rows-only path: it still canonicalizes
            # (sort+hash) the frame, so unhashable cells (list columns)
            # must error HERE, not in the driver (round-1 regression)
            try:
                frame_rowset(spdf)
                note = ""
            except TypeError as exc:
                note = f"  CANON-ERROR: {exc}"
            print(f"  {name}: rows-only, {len(spdf)} rows  [{dt:.1f}s]{note}")
            if len(spdf) == 0:
                print("    WARNING: empty result")
            if note:
                failures.append(name)
            continue
        opdf = con.sql(oracles[name]).df()
        ocols = list(opdf.columns)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(spdf) == len(opdf)
        try:
            sset = frame_rowset(spdf)
            oset = frame_rowset(opdf) if ok_cols else []
        except TypeError as exc:
            # an unhashable cell on the ORACLE path must record a
            # failure for this query and keep the gate running — not
            # abort with a traceback leaving the rest unchecked
            print(f"  {name}: FAIL CANON-ERROR: {exc}")
            failures.append(name)
            continue
        ok_vals = sset == oset
        status = "OK " if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"  {name}: {status} spark={len(spdf)} duck={len(opdf)} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} "
            f"vals={'=' if ok_vals else 'DIFF'}  [{dt:.1f}s]"
        )
        if not (ok_cols and ok_count and ok_vals):
            failures.append(name)
            for a, b in list(zip(sset, oset))[:200]:
                if a != b:
                    print(f"    spark: {'|'.join(a)}\n    duck : {'|'.join(b)}")
                    break
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
