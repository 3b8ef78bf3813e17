"""sf1-scale probe of the recursive-CTE oracles (VERDICT r05 #4).

The `extraction_flagship` and `multimodal_payload_features` oracles
rebuild the extraction pipeline's text in DuckDB SQL via a recursive
CTE (one greedy 400-char paragraph break per iteration) plus, for the
payload oracle, a codepoint->UTF-8-byte UNNEST expansion.  They are
hash-verified at sf0.01 (driver gate) and sf0.1 (65 s / 19 s,
ROUND5_NOTES) — this probe runs them ONCE at sf1 scale (50k docs,
synthesized by replicating the sf0.1 documents table with distinct
doc_ids, since no sf1 testdata dir exists) to establish whether the
oracle METHODOLOGY itself hits DuckDB recursion-depth or memory limits
before anyone trusts it at larger SF.

This is an offline probe, not CI: run `python tools/sf1_oracle_check.py`
and record the outcome in COVERAGE.md.  Env:
  SF1_REPLICATE   replication factor over sf0.1 (default 10 -> 50k docs)
  SF1_QUERIES     comma list (default the two recursive-CTE oracles)
  SF1_SPARK_ONLY  "1" -> skip the DuckDB side and record Spark walls +
                  row counts only (for queries whose oracle is an
                  all-pairs computation that cannot run at 50k docs —
                  the dedup set; their CORRECTNESS evidence lives at
                  sf0.01/sf0.1 + the fuzz corpora, this probe is the
                  SCALE evidence for the Spark plan)
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("SF1_REPLICATE", "10"))
QUERIES = os.environ.get(
    "SF1_QUERIES", "extraction_flagship,multimodal_payload_features"
).split(",")


def main() -> None:
    sys.path.insert(0, REPO)
    import duckdb

    import __spark_entry__ as entry

    _spec = importlib.util.spec_from_file_location(
        "check_oracle_sf1", os.path.join(REPO, "tools", "check_oracle.py")
    )
    _co = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_co)

    staging = tempfile.mkdtemp(prefix="sf1_probe_")
    results = {}
    try:
        # synthesize the sf1 documents table: sf0.1 docs x REPLICATE,
        # doc_ids offset per replica so they stay unique (both engines
        # read the same table, so any residue-class shift is identical
        # on both sides)
        con = duckdb.connect()
        docs_out = os.path.join(staging, "documents.parquet")
        t0 = time.time()
        con.sql(
            f"""
            COPY (
              SELECT doc_id + 100000 * r AS doc_id, text, lang
              FROM '{SRC}/documents.parquet',
                   (SELECT UNNEST(generate_series(0, {REPLICATE - 1})) AS r)
            ) TO '{docs_out}' (FORMAT PARQUET)
            """
        )
        # embeddings too (same replication, vec_id offset per replica;
        # r=0 keeps the originals so QUERY_VEC_ID=0 still exists and
        # all ids stay far below the PLANT_COPY_OFFSET guard) so the
        # similarity queries can run against the staged dir
        emb_out = os.path.join(staging, "embeddings.parquet")
        con_stage = duckdb.connect()
        con_stage.sql(
            f"""
            COPY (
              SELECT vec_id + 100000 * r AS vec_id, embedding, label
              FROM '{SRC}/embeddings.parquet',
                   (SELECT UNNEST(generate_series(0, {REPLICATE - 1})) AS r)
            ) TO '{emb_out}' (FORMAT PARQUET)
            """
        )
        con_stage.close()
        results["stage_sec"] = round(time.time() - t0, 1)
        n = con.sql(f"SELECT count(*) FROM '{docs_out}'").fetchone()[0]
        results["docs"] = int(n)

        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_out}'")
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_out}'")

        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.driver.memory", "24g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")

        spark_only = os.environ.get("SF1_SPARK_ONLY") == "1"
        for name in QUERIES:
            entryres = {}
            t0 = time.time()
            spdf = entry.queries()[name](spark, staging).toPandas()
            entryres["spark_sec"] = round(time.time() - t0, 1)
            if spark_only:
                entryres["rows"] = [len(spdf)]
                results[name] = entryres
                continue
            t0 = time.time()
            try:
                opdf = con.sql(entry.oracle_sql()[name]).df()
                entryres["duckdb_sec"] = round(time.time() - t0, 1)
                entryres["rows"] = [len(spdf), len(opdf)]
                entryres["hash_match"] = bool(
                    sorted(spdf.columns) == sorted(opdf.columns)
                    and len(spdf) == len(opdf)
                    and _co.frame_rowset(spdf) == _co.frame_rowset(opdf)
                )
            except Exception as exc:  # the documented-limit outcome
                entryres["duckdb_error"] = f"{type(exc).__name__}: {exc}"[:400]
                entryres["duckdb_sec"] = round(time.time() - t0, 1)
            results[name] = entryres
        spark.stop()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
