"""spark-submit entry point for the extraction job.

Usage (the north-rule launch shape)::

    python tools/make_pyfiles_zip.py   # -> dist/deepseek_ocr_2_spark.zip
    spark-submit --master local[32] \\
        --py-files dist/deepseek_ocr_2_spark.zip \\
        tools/run_extraction_job.py \\
        --sf-dir /root/testdata/sf0.01 --output /tmp/extract_out \\
        --input-snapshot-id in-1

On a real cluster the only change is ``--master`` (+ executor sizing);
the job builds/reads the pages table, runs the salted-bucket extraction
stage, writes a committed snapshot + per-partition lineage metrics, and
prints a one-line JSON summary.  ``--input`` reads an existing pages
parquet instead of synthesizing one from the sf dir.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--input", default=None,
                    help="existing pages parquet (overrides --sf-dir synth)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--input-snapshot-id", default="input-0")
    ap.add_argument("--num-buckets", type=int, default=256)
    ap.add_argument("--hot-host-threshold", type=int, default=20)
    ap.add_argument(
        "--static-hot-hosts",
        default=None,
        help="comma-separated known-hot hosts; skips the per-job "
        "host-count pass (reuse per-snapshot skew stats in production "
        "— with a synthesized corpus the dynamic count re-runs the "
        "generator a second time)",
    )
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--partition-by",
        default=None,
        help="comma-separated low-cardinality output partition columns "
        "(e.g. 'lang') — hive-style dirs inside the snapshot so "
        "filtered consumers get partition pruning",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit owns master/conf; builder only fills local-run gaps.
    spark = SparkSession.builder.appName("extract-pages").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from deepseek_ocr_2_spark.operators.extract import ExtractConfig
    from deepseek_ocr_2_spark.plans.pipeline import run_extraction
    from deepseek_ocr_2_spark.sources.corpus import build_corpus

    pages = (
        spark.read.parquet(args.input)
        if args.input
        else build_corpus(spark, args.sf_dir)
    )
    cfg = ExtractConfig(
        num_buckets=args.num_buckets,
        hot_host_threshold=args.hot_host_threshold,
        static_hot_hosts=(
            tuple(h.strip() for h in args.static_hot_hosts.split(","))
            if args.static_hot_hosts
            else None
        ),
    )
    t0 = time.time()
    snap = run_extraction(
        spark,
        pages,
        args.output,
        cfg,
        input_snapshot_id=args.input_snapshot_id,
        resume=not args.no_resume,
        partition_by=(
            tuple(
                c.strip()
                for c in args.partition_by.split(",")
                if c.strip()  # tolerate trailing commas: '' would fail
                # deep inside the write AFTER the extraction stage ran
            )
            or None
            if args.partition_by
            else None
        ),
    )
    print(
        json.dumps(
            {
                "snapshot_id": snap.snapshot_id,
                "docs": snap.doc_count,
                "failures": snap.failure_count,
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
