"""Benchmark harness: headline extraction throughput + operator timings.

Prints ONE JSON line:
  {"metric": "extracted_docs_per_sec", "value": N, "unit": "docs/sec",
   "queries": {"<name>": sec, ...}, "sf": 0.1, ...extras}

Env:
  SPARK_GRAFT_SF_DIR  input scale dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)

The headline number times the full extraction stage (read staged corpus
parquet -> salted repartition -> mapInPandas kernel -> force every
column) — corpus *generation* is staged to parquet outside the timed
window, since at 100 TB the input table already exists.  Round 3+: the
headline is best-of-5 timed runs (all walls recorded in
``extraction_walls_all``).

METHODOLOGY CHANGE (round 6, VERDICT r05 #1 — steal-proofing): the
sf0.1 extraction wall was 0.6-0.7 s, so a single hypervisor-steal burst
moved the recorded headline by double-digit percent (the r05 headline
"regression" was exactly this).  The timed corpus is now REPLICATED
(``SPARK_GRAFT_BENCH_TARGET_DOCS``, default 640k docs -> ~5-7 s walls
at local[32]) so noise bursts amortize, and the job-fixed overhead
share matches the 100 TB regime where stages run for hours.  Because
overhead no longer dominates, the r06+ headline is NOT numerically
comparable to the r03-r05 headline; for continuity the old
unreplicated-sf0.1 number is still measured and reported as
``smallcorpus_docs_per_sec``.  Window quality is made visible by a
Spark-free SINGLE-CORE kernel sentinel measured inside the same bench
session (``kernel_sentinel_docs_per_sec``, historically ~6.3k docs/s
on this box) and the normalized ratio
``normalized_effective_cores = headline / sentinel`` — steal moves the
raw numbers together but leaves the ratio stable, so a slow window can
no longer masquerade as a plan regression (or vice versa).

CAPTURE ADOPTION RULE (round 6): when several bench sessions are
captured in one round, commit the one with the LOWEST
``wall_spread_frac`` among sessions whose sentinel is healthy
(>= ~7k docs/s on this box).  Do NOT pick the highest headline: the
r06 sweep showed capability captures (90-100k docs/s) ride windows
whose own spread (>12%) or steal-depressed sentinel disqualifies them
as evidence, while the tight-spread capture is reproducible.  Record
every sweep capture's numbers in the round notes either way.

METHODOLOGY CHANGE (round 2): hot-host detection moved out of the timed
window too (``detect_hot_hosts`` runs once per snapshot, the production
statistics pattern), so round-2+ headline numbers are NOT directly
comparable to the round-1 number, which included that aggregation pass
per run.  The scaling harness (``tools/scaling_bench.py``) has used
static hot hosts in every round, so its efficiency numbers ARE
round-comparable.

Scaling-efficiency evidence (N vs 4N core-pinned pairs) is produced by
``tools/scaling_bench.py`` which writes ``BENCH/BASELINE.md``; this file
stays fast enough for a per-round driver run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# headline corpus size: replicate the sf corpus up to ~this many docs
# so the timed wall is >=5 s at local[32] (VERDICT r05 #1); capped at
# x192 replication so tiny SF dirs (sf0.001 smoke runs) stay cheap
TARGET_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_TARGET_DOCS", "640000"))
MAX_REPLICATE = 192

# per-run tmpfs shuffle dir (ADVICE r05: a fixed shared path leaked
# RAM-backed shuffle files across crashed/concurrent runs); created
# once per process, removed in main()'s cleanup path
_SHUFFLE_DIR: str | None = None


def _local_dir() -> str:
    global _SHUFFLE_DIR
    if _SHUFFLE_DIR is None:
        base = "/dev/shm"
        if not (os.path.isdir(base) and os.access(base, os.W_OK)):
            base = None  # tempfile default
        _SHUFFLE_DIR = tempfile.mkdtemp(prefix="spark-bench-shuffle-", dir=base)
    return _SHUFFLE_DIR


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("deepseek-ocr-2-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        # tmpfs shuffle dir when available: the local-mode analog of the
        # fast local SSDs a real cluster's shuffle service assumes —
        # A/B-verified knob from the scaling bench (BENCH/BASELINE.md
        # measurement-config section); falls back to default tmp dirs
        .config("spark.local.dir", _local_dir())
        .getOrCreate()
    )


def detect_hot_hosts(spark, corpus_path: str, threshold: int = 200) -> tuple:
    """Hot-host list from the input snapshot — computed ONCE per
    snapshot and reused by every run over it (the production pattern:
    at 100 TB the per-host counts live with the snapshot statistics,
    not inside every job), so it stays outside the timed window."""
    from pyspark.sql import functions as F

    from deepseek_ocr_2_spark.operators.extract import HOST_REGEX
    from deepseek_ocr_2_spark.operators.scalejoin import hot_keys

    hosts = spark.read.parquet(corpus_path).select(
        F.lower(F.regexp_extract("url", HOST_REGEX, 1)).alias("host")
    )
    return tuple(hot_keys(hosts, "host", threshold))


def time_extraction(
    spark, corpus_path: str, hot_hosts: tuple, num_buckets: int | None = None
) -> tuple[float, int]:
    """Timed window: read staged corpus -> extract -> force all columns."""
    from pyspark.sql import functions as F

    from deepseek_ocr_2_spark.operators.extract import (
        ExtractConfig,
        extract_pages,
    )

    pages = spark.read.parquet(corpus_path)
    cfg = ExtractConfig(
        num_buckets=num_buckets or max(CPUS * 4, 64),
        static_hot_hosts=hot_hosts,
    )
    t0 = time.time()
    res = extract_pages(pages, cfg)
    agg = res.select(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length("extracted_text")).alias("chars"),
        F.sum(F.size("spans")).alias("spans"),
    ).collect()[0]
    dt = time.time() - t0
    return dt, int(agg["docs"])


def stage_replicated_corpus(
    spark, base_path: str, staging: str
) -> tuple[str, int]:
    """Stage the headline timed corpus: the sf corpus replicated (via a
    single ``explode`` of a replica-index array — one plan node, unlike
    a K-way union) up to ``TARGET_DOCS`` docs, each replica's urls made
    distinct.  Staged OUTSIDE the timed window: at 100 TB the input
    table already exists; replication only sizes the timed wall into
    the >=5 s regime where the job-fixed-overhead share matches
    production and host-noise bursts amortize (VERDICT r05 #1)."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(base_path)
    n = base.count()
    rep = min(MAX_REPLICATE, max(1, -(-TARGET_DOCS // max(n, 1))))
    if rep == 1:
        return base_path, n
    big_path = os.path.join(staging, "pages_replicated.parquet")
    big = (
        base.select(
            "*",
            F.explode(
                F.array(*[F.lit(i) for i in range(rep)])
            ).alias("_rep"),
        )
        .withColumn(
            "url", F.concat(F.col("url"), F.lit("?rep="), F.col("_rep"))
        )
        .drop("_rep")
    )
    big.repartition(max(64, CPUS * 2)).write.mode("overwrite").parquet(big_path)
    return big_path, n * rep


def kernel_sentinel(runs: int = 3) -> dict:
    """Spark-free single-core kernel throughput over the sf corpus —
    the window-quality reference (VERDICT r05 #1).  The identical
    extraction kernels run in a plain Python loop on ONE core: no
    Spark, no shuffle, no Arrow, so its only inputs are the CPU and
    the hypervisor window.  Historically ~6.3k docs/s on this box
    (stable r02-r05); ``headline / sentinel`` is the
    steal-invariant statistic — a noisy window deflates both together
    while a plan/kernel regression moves only the numerator.

    Each timed run is sized to >=MIN_WALL seconds (the corpus pass is
    repeated ``reps`` times, ``reps`` derived from the warm-up wall):
    a ~0.7 s single pass at sf0.1 was itself short enough for one
    steal burst to straddle all three runs, which made the NORMALIZED
    ratio noisy in exactly the window the >=5 s headline survived
    (observed r06: sentinel 6.9k vs 3.7k across two sessions while
    the headline moved <4%)."""
    import json as _json

    import duckdb

    from deepseek_ocr_2_spark.functions.assemble import process_page
    from deepseek_ocr_2_spark.functions.htmlmain import extract_main_content
    from deepseek_ocr_2_spark.sources import corpus as C

    docs = duckdb.sql(
        f"select doc_id, text, lang from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    payloads = [
        C.render_pdf_payload(d, t or "")
        if C.is_pdf_doc(d)
        else C.render_html(d, t or "", l)
        for d, t, l in docs
    ]
    def one_pass() -> int:
        n = 0
        for p in payloads:
            if p.startswith(C.PDF_MAGIC):
                doc = _json.loads(p[len(C.PDF_MAGIC):])
                for i, pg in enumerate(doc["pages"]):
                    process_page(pg["raw_output"], pg["width"], pg["height"], i)
            else:
                extract_main_content(p)
            n += 1
        return n

    MIN_WALL = 3.0
    t0 = time.time()  # warm-up pass (page cache + lru_caches warm)
    n = one_pass()
    warm_wall = time.time() - t0
    reps = max(1, -int(-MIN_WALL // max(warm_wall, 1e-6)))  # ceil div
    walls = []
    for _ in range(runs):
        t0 = time.time()
        for _ in range(reps):
            one_pass()
        walls.append(time.time() - t0)
    return {
        "docs_per_sec": round(n * reps / min(walls), 1),
        "docs": n,
        "reps": reps,
        "walls": [round(w, 3) for w in walls],
    }


def bench_partitioned_snapshot(
    spark, corpus_path: str, hot_hosts: tuple, staging: str
) -> dict:
    """VERDICT r02 #5: exercise the partition_by snapshot layout at
    bench scale and show partition PRUNING pays: a per-language reader
    over a lang-partitioned committed snapshot plans PartitionFilters
    (reads only its directories) and beats the full-snapshot scan."""
    from pyspark.sql import functions as F

    from deepseek_ocr_2_spark.operators.extract import ExtractConfig
    from deepseek_ocr_2_spark.plans import pipeline as P

    out = os.path.join(staging, "snap_lang")
    pages = spark.read.parquet(corpus_path)
    cfg = ExtractConfig(
        num_buckets=max(CPUS * 4, 64), static_hot_hosts=hot_hosts
    )
    t0 = time.time()
    P.run_extraction(spark, pages, out, cfg, partition_by=("lang",))
    write_sec = time.time() - t0

    res = P.committed_results(spark, out)

    def scan(df) -> float:
        t0 = time.time()
        df.agg(
            F.count(F.lit(1)), F.sum(F.length("extracted_text"))
        ).collect()
        return time.time() - t0

    full_sec = scan(res)
    pruned = res.filter(F.col("lang") == "en")
    pruned_sec = scan(pruned)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the lang predicate must be INSIDE the PartitionFilters bracket —
    # any partitioned scan prints 'PartitionFilters: [...]' (empty when
    # nothing prunes), so a bare substring check can never fail
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    files = res.inputFiles()
    return {
        "write_sec": round(write_sec, 3),
        "full_scan_sec": round(full_sec, 3),
        "pruned_scan_sec_lang_en": round(pruned_sec, 3),
        "plan_has_partition_filters": bool(pf and "lang" in pf.group(1)),
        "data_files_total": len(files),
        "data_files_lang_en": sum(1 for f in files if "lang=en" in f),
    }


def bench_stream_state(spark, staging: str) -> dict:
    """VERDICT r02 #6: the watermarked stream-stream interval join over
    the sf events table, micro-batched in event-time order — evidence
    that join-state expiry keeps the state store BOUNDED (max state rows
    << total click rows) at bench scale."""
    from pyspark.sql import functions as F

    from deepseek_ocr_2_spark.streaming.ingest import (
        stream_stream_click_purchase_join,
    )

    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    drop = os.path.join(staging, "events_drop")
    # range-partition by ts so each part file holds one event-time slice
    src.repartitionByRange(16, "ts").write.mode("overwrite").parquet(drop)
    # FileStreamSource picks files oldest-MTIME-first, and the parallel
    # write stamps mtimes in arbitrary task-completion order — restamp
    # in min(ts) order so micro-batches advance event time and the
    # watermark monotonically, like a live feed.  Without this, a
    # newest-slice file in an early batch advances the watermark past
    # the older files and their rows are silently dropped as late —
    # "bounded state" would then reflect loss, not expiry.  The
    # lossless flag below (streamed rows == batch-join rows) proves
    # no such drop happened.
    from deepseek_ocr_2_spark.streaming.ingest import order_files_by_event_time

    order_files_by_event_time(drop, "ts")

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(drop)
    )
    joined = stream_stream_click_purchase_join(stream)
    t0 = time.time()
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", os.path.join(staging, "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drained = bool(q.awaitTermination(600))
    if not drained:
        q.stop()
    wall = time.time() - t0
    # recentProgress is a RING BUFFER capped at
    # spark.sql.streaming.numRecentProgressUpdates (default 100); if
    # micro-batch count ever reached the cap, early batches would have
    # fallen out and the output-row sum below would silently undercount
    # — the "lossless" flag must FAIL in that case, not lie (ADVICE
    # r03).  Safe at the current 16-files/2-per-trigger sizing; this
    # guard makes REPLICATE/partitioning changes fail loudly instead.
    progress_cap = int(
        spark.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100")
    )
    progress_complete = len(q.recentProgress) < progress_cap
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    out_rows = sum(
        p["sink"]["numOutputRows"]
        for p in q.recentProgress
        if p["sink"]["numOutputRows"] > 0
    )
    counts = src.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
    ).collect()[0]
    n_clicks, n_purch = int(counts["c"]), int(counts["p"])
    # batch twin of the interval join: the stream must emit EXACTLY
    # these pairs (watermark expiry may drop state, never results)
    c = src.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    p = src.filter(F.col("event_type") == "purchase")
    batch_rows = p.join(
        c,
        (p.user_id == c.cu)
        & (c.cts < p.ts)
        & (c.cts >= p.ts - F.expr("INTERVAL 2 HOURS")),
    ).count()
    return {
        "wall_sec": round(wall, 3),
        "drained": drained,
        "micro_batches": len(q.recentProgress),
        "joined_rows": int(out_rows),
        "batch_joined_rows": int(batch_rows),
        "progress_complete": progress_complete,
        "lossless": bool(
            drained and progress_complete and int(out_rows) == int(batch_rows)
        ),
        "clicks_total": n_clicks,
        "purchases_total": n_purch,
        "max_state_rows": max(state_rows) if state_rows else 0,
        "final_state_rows": state_rows[-1] if state_rows else 0,
        "state_bounded": bool(
            state_rows and max(state_rows) < (n_clicks + n_purch) // 2
        ),
    }


def main() -> None:
    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    from deepseek_ocr_2_spark.sources.corpus import build_corpus

    import __spark_entry__ as entry

    staging = tempfile.mkdtemp(prefix="bench_corpus_")
    corpus_path = os.path.join(staging, "pages.parquet")
    try:
        build_corpus(spark, SF_DIR).write.mode("overwrite").parquet(corpus_path)
        hot_hosts = detect_hot_hosts(spark, corpus_path)

        # headline corpus: replicated so the timed wall sits in the
        # >=5 s regime (VERDICT r05 #1 — a 0.6 s wall let one steal
        # burst move the headline >10%); at >=100k docs the r04
        # bucket-granularity lever (1024 buckets = 2-4 task waves)
        # applies, while the small continuity corpus keeps 1 task/core
        # (finer tasks HURT at 5k docs — r03 negative result)
        big_path, big_docs_expected = stage_replicated_corpus(
            spark, corpus_path, staging
        )
        big_buckets = (
            int(os.environ.get("SPARK_GRAFT_BUCKETS", "1024"))
            if big_docs_expected >= 100_000
            else None
        )
        hot_big = (
            detect_hot_hosts(spark, big_path)
            if big_path != corpus_path
            else hot_hosts
        )
        # warm-ups (JVM/codegen/Arrow/python-worker pool), then
        # best-of-5 timed runs with every wall on the record
        for _ in range(2):
            time_extraction(spark, big_path, hot_big, big_buckets)
        timed = [
            time_extraction(spark, big_path, hot_big, big_buckets)
            for _ in range(5)
        ]
        wall, docs = min(timed)

        # single-core Spark-free sentinel, measured INSIDE the same
        # window as the timed runs (the JVM is idle between jobs)
        sentinel = kernel_sentinel()

        # continuity number: the r03-r05 headline methodology
        # (unreplicated sf corpus, 1 task/core) for round-over-round
        # comparability
        time_extraction(spark, corpus_path, hot_hosts)
        timed_small = [
            time_extraction(spark, corpus_path, hot_hosts) for _ in range(3)
        ]
        wall_small, docs_small = min(timed_small)

        queries = {}
        qs = entry.queries()
        for name in [
            "q1_pricing_summary",
            "q5_regional_revenue",
            "window_topk_orders",
            "grouped_concat_lines",
            "fingerprint_exact_dedup",
            "ngram_jaccard_pairs",
            "minhash_lsh_dedup",
            "cosine_topk",
        ]:
            t0 = time.time()
            qs[name](spark, SF_DIR).collect()
            queries[name] = round(time.time() - t0, 3)
        # continuity: "extraction_sf" has meant the UNREPLICATED sf
        # corpus wall since r03 and keeps that meaning
        queries["extraction_sf"] = round(wall_small, 3)
        queries["extraction_replicated"] = round(wall, 3)

        extras = {}
        for key, fn, args in (
            (
                "partitioned_snapshot",
                bench_partitioned_snapshot,
                (spark, corpus_path, hot_hosts, staging),
            ),
            ("stream_stream_state", bench_stream_state, (spark, staging)),
        ):
            try:
                extras[key] = fn(*args)
            except Exception as exc:  # never lose the headline over extras
                extras[key] = {"error": f"{type(exc).__name__}: {exc}"[:300]}

        try:
            sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
        except ValueError:
            sf = -1.0  # non-sf-named dir; never lose the results over it
        walls_all = [w for w, _ in timed]
        out = {
            "metric": "extracted_docs_per_sec",
            "value": round(docs / wall, 2),
            "unit": "docs/sec",
            # r06 methodology change — see module docstring: the
            # headline corpus is replicated so the wall is >=5 s;
            # NOT numerically comparable to the r03-r05 headline,
            # whose methodology lives on as smallcorpus_docs_per_sec
            "methodology": "r06_replicated_corpus",
            "queries": queries,
            "sf": sf,
            "docs": docs,
            "extraction_wall_sec": round(wall, 3),
            "extraction_walls_all": [round(w, 3) for w in walls_all],
            "wall_spread_frac": round(
                (max(walls_all) - min(walls_all)) / min(walls_all), 3
            ),
            "smallcorpus_docs_per_sec": round(docs_small / wall_small, 2),
            "smallcorpus_walls_all": [round(w, 3) for w, _ in timed_small],
            "kernel_sentinel_docs_per_sec": sentinel["docs_per_sec"],
            "kernel_sentinel_walls": sentinel["walls"],
            # steal-invariant statistic: effective parallel speedup of
            # the full pipeline over the single-core kernel, both
            # measured in the same window
            "normalized_effective_cores": round(
                (docs / wall) / sentinel["docs_per_sec"], 2
            ),
            "cpus": CPUS,
            **extras,
        }
        # merge the latest two-parallelism scaling evidence if present
        bench_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH"
        )
        scaling_path = os.path.join(bench_dir, "scaling.json")
        if os.path.exists(scaling_path):
            with open(scaling_path) as f:
                out["scaling"] = json.load(f)

        # The driver captures only the TAIL of stdout (VERDICT r03
        # "What's wrong" #3: round 3's scaling block pushed the line
        # past the cap and the parsed headline was lost).  Full results
        # go to a GITIGNORED live file (bench runs must not dirty the
        # tree — VERDICT r04 "What's wrong" #2); the round ritual
        # commits a BENCH/bench_result_r{N}.json snapshot.  stdout
        # carries a compact line with the headline + per-query seconds
        # and top-line scaling numbers.
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "bench_result.json"), "w") as f:
            json.dump(out, f, indent=1)
        compact = {
            k: out[k]
            for k in (
                "metric", "value", "unit", "methodology", "queries", "sf",
                "docs", "extraction_wall_sec", "extraction_walls_all",
                "wall_spread_frac", "smallcorpus_docs_per_sec",
                "kernel_sentinel_docs_per_sec",
                "normalized_effective_cores", "cpus",
            )
        }
        for key in ("partitioned_snapshot", "stream_stream_state"):
            blk = out.get(key)
            if isinstance(blk, dict) and "error" in blk:
                compact[key] = "error"
        ss = out.get("stream_stream_state")
        if isinstance(ss, dict) and "lossless" in ss:
            compact["stream_lossless"] = ss["lossless"]
        sc = out.get("scaling")
        if isinstance(sc, dict):
            compact["scaling"] = {
                k: sc[k]
                for k in (
                    "levels", "docs_per_sec", "raw_efficiency",
                    "machine_ceiling_efficiency",
                    "pipeline_efficiency_vs_ceiling", "measured_round",
                )
                if k in sc
            }
            if isinstance(sc.get("median"), dict):
                compact["scaling"]["median_raw_efficiency"] = sc["median"].get(
                    "raw_efficiency"
                )
        compact["full_results"] = "BENCH/bench_result.json"
        line = json.dumps(compact)
        if len(line) > 1800:  # never regress into the tail-capture trap
            for key in ("scaling", "extraction_walls_all"):
                compact.pop(key, None)
            line = json.dumps(compact)
        print(line)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        spark.stop()
        # per-run tmpfs shuffle dir (ADVICE r05): reclaim the
        # RAM-backed space after the JVM has released its files
        if _SHUFFLE_DIR:
            shutil.rmtree(_SHUFFLE_DIR, ignore_errors=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
