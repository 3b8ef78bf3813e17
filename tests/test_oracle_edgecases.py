"""Kernel-vs-oracle agreement on a CRAFTED boundary corpus.

The driver gate and ``tools/check_oracle.py`` compare Spark against
DuckDB on the fixed sf0.01 testdata — which happens to contain no
empty documents, no exactly-threshold trailing paragraphs, and no
PDF with more pages than the frame-sample budget.  This suite builds a
tiny documents.parquet that hits every branch boundary the oracles
model, and requires the two engines to agree there too:

* empty text (paragraph fold returns [''] — the ``nw = 0`` oracle arm)
  on BOTH payload paths;
* single-word documents;
* trailing paragraph of exactly 23 chars (dropped, < MIN_CONTENT_CHARS)
  and exactly 25 chars (kept) on the HTML path;
* the doc_id % 3 == 0 inline anchor BOTH firing (> 2 paragraphs) and
  suppressed (2 paragraphs);
* PDF docs at every (image, EOS-fail) combination, including the
  single-page total-failure (ok = false, NULL text) and the multi-page
  partial failure (last page dropped, earlier pages kept);
* a 6-page PDF so ``frame_sample``'s uniform stride actually skips
  pages (idx = j*6//4 -> 0,1,3,4) instead of taking all of them;
* the text/dedup oracles over the same corpus: empty and single-word
  documents through token/quality/fingerprint/winnow/lang-id, and the
  crafted corpus's repeated texts as exact-duplicate pairs through the
  n-gram/MinHash/SimHash pipelines.

Disagreement here means one side models a boundary wrong — exactly the
class of bug a hash-green run on benign data cannot see.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "check_oracle_edge", os.path.join(_REPO, "tools", "check_oracle.py")
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)
frame_rowset = _co.frame_rowset


def _words(n: int, wl: int = 7) -> str:
    return " ".join(f"{'w' * (wl - len(str(i)))}{i}"[:wl] for i in range(n))


# 50 words of len 7 -> cumulative (len+1) hits 400 exactly -> one
# flushed 399-char paragraph with no trailing partial.
_ONE_PARA = _words(50)
_TAIL_23 = _words(50) + " " + _words(3)            # 23-char tail: dropped
_TAIL_25 = _words(50) + " " + "x" * 12 + " " + "y" * 12  # 25: kept
_TEN_PARAS = _words(50 * 9 + 40)                   # pdf: 4 pages (3+3+3+1)
_SIXTEEN_PARAS = _words(50 * 15 + 40)              # pdf: 6 pages


# (doc_id, text) — residues chosen to hit each branch combination:
#   id % 4 == 0 -> pdf;  id % 3 == 0 -> html anchor;  id % 5 == 0 ->
#   pdf image refs;  id % 10 == 0 -> pdf last-page EOS failure.
_DOCS = [
    (1, _ONE_PARA),        # html, single full paragraph
    (2, _TAIL_23),         # html, trailing 23-char paragraph dropped
    (3, _TEN_PARAS),       # html, %3: anchor fires (10 paragraphs)
    (5, ""),               # html, EMPTY text (nw=0 arm)
    (6, "solo"),           # html, single short word (dropped tail = whole doc)
    (7, _TAIL_25),         # html, trailing 25-char paragraph kept
    (9, _TAIL_25),         # html, %3 but only 2 paragraphs: anchor suppressed
    (4, _ONE_PARA),        # pdf, single complete page
    (8, _SIXTEEN_PARAS),   # pdf, 6 pages -> frame stride skips pages
    (12, ""),              # pdf, EMPTY text (single page, empty slot)
    (16, "solo"),          # pdf, single word page
    (20, _TEN_PARAS),      # pdf, %5: image ref on every page
    (40, _ONE_PARA),       # pdf, %10: single page, EOS fail -> ok=false
    (60, _TEN_PARAS),      # pdf, %10: 4 pages, last dropped, rest kept
    (100, _TEN_PARAS),     # pdf, %5 AND %10: images + last-page failure
]

_EDGE_QUERIES = [
    "extraction_flagship",
    "extraction_metrics",
    "extraction_raw_output",
    "multimodal_page_metadata",
    "multimodal_payload_features",
    "multimodal_frame_sample",
    # the text/dedup oracles read only `documents` too — empty and
    # single-word docs through fingerprinting/minhash/simhash/lang-id,
    # plus the crafted corpus's repeated texts as exact-dup pairs
    "token_count",
    "quality_score",
    "fingerprint_exact_dedup",
    "lang_distribution",
    "lang_id_heuristic",
    "corpus_curation",
    "winnow_window_counts",
    "ngram_jaccard_pairs",
    "minhash_lsh_dedup",
    "simhash_near_dups",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in _DOCS], type=pa.int64()),
            "text": pa.array([t for _, t in _DOCS], type=pa.string()),
            "lang": pa.array(["en"] * len(_DOCS), type=pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_dir}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("name", _EDGE_QUERIES)
def test_oracle_agrees_on_boundary_corpus(spark, edge_dir, edge_duck, name):
    spdf = entrymod.queries()[name](spark, edge_dir).toPandas()
    opdf = edge_duck.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (name, len(spdf), len(opdf))
    assert frame_rowset(spdf) == frame_rowset(opdf), name


def test_boundary_corpus_really_hits_the_branches(spark, edge_dir):
    """Guard the fixture itself: the crafted rows must actually land in
    the branches the docstring claims (if the generator's thresholds
    move, this fails loudly instead of the suite silently testing
    nothing)."""
    flag = {
        r.url: r
        for r in entrymod.queries()["extraction_flagship"](
            spark, edge_dir
        ).collect()
    }
    by_id = {int(u.rsplit("/", 1)[1].split(".")[0]): r for u, r in flag.items()}
    assert by_id[2].n_spans == 2 and by_id[7].n_spans == 3  # 23 drop / 25 keep
    assert " source 3 " in by_id[3].extracted_text          # anchor fired
    assert " source 9 " not in by_id[9].extracted_text      # anchor suppressed
    assert by_id[5].extracted_text == "Article 5"           # empty html doc
    assert by_id[40].ok is False and by_id[40].extracted_text is None
    assert by_id[60].ok is True and by_id[60].n_spans > 0   # partial failure
    assert "![images/" in by_id[20].extracted_text          # image refs
    fs = entrymod.queries()["multimodal_frame_sample"](spark, edge_dir)
    rows = [r for r in fs.collect() if "/8." in r.url]
    assert [r.frame_index for r in rows] == [0, 1, 3, 4]    # real stride
    assert rows[0].n_frames == 6
