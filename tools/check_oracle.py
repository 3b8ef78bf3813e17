"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
against ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive multiset compare of canonicalized values.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
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
        srows = df.collect()
        scols = df.columns
        dt = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only, {len(srows)} rows  [{dt:.1f}s]")
            if len(srows) == 0:
                print("    WARNING: empty result")
            continue
        res = con.sql(oracles[name])
        ocols = [c for c in res.columns]
        orows = res.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sset = rowset(scols, [[r[c] for c in scols] for r in srows])
        oset = rowset(ocols, orows)
        ok_vals = sset == oset
        status = "OK " if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"  {name}: {status} spark={len(srows)} duck={len(orows)} "
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
