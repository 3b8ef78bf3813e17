"""cProfile the single-core extraction kernel path (the sentinel loop).

Round-7 optimization tooling: replicates bench.kernel_sentinel's
one_pass() exactly, under cProfile, to find per-task hot spots
(guide §1.2 step 2).  Usage:
    python tools/profile_kernel.py [passes] [sort]
"""

from __future__ import annotations

import cProfile
import json
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sort = sys.argv[2] if len(sys.argv) > 2 else "tottime"

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
                doc = json.loads(p[len(C.PDF_MAGIC):])
                for i, pg in enumerate(doc["pages"]):
                    process_page(
                        pg["raw_output"], pg["width"], pg["height"], i
                    )
            else:
                extract_main_content(p)
            n += 1
        return n

    one_pass()  # warm caches
    t0 = time.time()
    one_pass()
    print(f"unprofiled pass: {time.time() - t0:.3f}s for {len(payloads)} docs")

    prof = cProfile.Profile()
    prof.enable()
    for _ in range(passes):
        one_pass()
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats(sort).print_stats(35)


if __name__ == "__main__":
    main()
