"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
driver measurement — this file carries the builder's own isolated
timings; cite its numbers in OPTIMIZATION_r*.md).

Modes:
  python bench_extra.py queries [name ...]   per-query collect() walls,
      same methodology as bench.py's query loop (plan+execute+collect),
      repeated REPS times with every wall on the record.
  python bench_extra.py noop [name ...]      same queries through the
      noop sink (guide §1.4) — forces every column, no driver collect.
  python bench_extra.py extraction           the replicated-corpus
      extraction wall with and without the salted repartition exchange
      (A/B for the payload-shuffle share of the headline).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_REPS (default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

BENCH_SET = [
    "q1_pricing_summary",
    "q5_regional_revenue",
    "window_topk_orders",
    "grouped_concat_lines",
    "fingerprint_exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_dedup",
    "cosine_topk",
]


def build_session():
    from bench import build_session as bs

    return bs(CPUS)


def time_queries(spark, names, sink: str) -> dict:
    import __spark_entry__ as entry

    qs = entry.queries()
    out = {}
    for name in names:
        walls = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if sink == "collect":
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        out[name] = {"min": min(walls), "walls": walls}
        spark.sparkContext.setJobDescription(None)
    return out


def time_extraction_ab(spark) -> dict:
    """Replicated-corpus extraction wall, repartition on vs off."""
    import tempfile

    from pyspark.sql import functions as F

    from bench import detect_hot_hosts, stage_replicated_corpus
    from deepseek_ocr_2_spark.operators.extract import (
        ExtractConfig,
        extract_pages,
    )
    from deepseek_ocr_2_spark.sources.corpus import build_corpus

    staging = tempfile.mkdtemp(prefix="bench_extra_")
    corpus_path = os.path.join(staging, "pages.parquet")
    build_corpus(spark, SF_DIR).write.mode("overwrite").parquet(corpus_path)
    big_path, _ = stage_replicated_corpus(spark, corpus_path, staging)
    hot = detect_hot_hosts(spark, big_path)
    out = {}
    for label, repart in (("repartition_on", True), ("repartition_off", False)):
        cfg = ExtractConfig(num_buckets=1024, static_hot_hosts=hot)
        walls = []
        for _ in range(REPS + 2):  # 2 warmups
            spark.sparkContext.setJobDescription(f"bench_extra:extract:{label}")
            pages = spark.read.parquet(big_path)
            t0 = time.time()
            res = extract_pages(pages, cfg, repartition=repart)
            res.select(
                F.count(F.lit(1)), F.sum(F.length("extracted_text")),
                F.sum(F.size("spans")),
            ).collect()
            walls.append(round(time.time() - t0, 3))
        out[label] = {"min": min(walls[2:]), "walls": walls[2:]}
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    names = sys.argv[2:] or BENCH_SET
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if mode == "extraction":
            out = time_extraction_ab(spark)
        elif mode == "noop":
            out = time_queries(spark, names, sink="noop")
        else:
            out = time_queries(spark, names, sink="collect")
        print(json.dumps(out, indent=1))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
