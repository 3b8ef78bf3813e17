"""Corpus builder: schema, determinism, payload mix, skew realism."""

from __future__ import annotations

import json

from deepseek_ocr_2_spark.sources import corpus as C

from .conftest import SF_TINY


def test_render_html_is_deterministic_and_boilerplate_rich():
    a = C.render_html(42, "hello world " * 40, "en")
    b = C.render_html(42, "hello world " * 40, "en")
    assert a == b
    s = a.decode("utf-8")
    assert "top-nav" in s and "footer" in s and "ads banner" in s
    assert "<p>hello world" in s


def test_render_pdf_payload_roundtrips():
    blob = C.render_pdf_payload(100, "word " * 600)
    assert blob.startswith(C.PDF_MAGIC)
    doc = json.loads(blob[len(C.PDF_MAGIC):])
    assert doc["doc_id"] == 100
    assert len(doc["pages"]) >= 2  # 600 words -> multiple pages
    for p in doc["pages"]:
        assert p["width"] > 0 and p["height"] > 0
        assert "<|ref|>" in p["raw_output"]
    # doc_id 100 % 10 == 0 -> last page lacks EOS (failure-path fixture)
    from deepseek_ocr_2_spark.functions.refparse import has_eos

    assert has_eos(doc["pages"][0]["raw_output"])
    assert not has_eos(doc["pages"][-1]["raw_output"])


def test_hot_host_assignment():
    hot = sum(1 for d in range(1000) if C.host_for(d) == C.HOT_HOST)
    assert hot == 300  # 3/10 of urls land on the giant host


def test_build_corpus_schema_and_mix(spark):
    df = C.build_corpus(spark, SF_TINY)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang", "doc_id",
    ]
    rows = df.collect()
    assert len(rows) > 0
    n_pdf = sum(1 for r in rows if bytes(r.html).startswith(C.PDF_MAGIC))
    assert 0 < n_pdf < len(rows)
    urls = {r.url for r in rows}
    assert len(urls) == len(rows)  # url is the primary key


def test_build_corpus_deterministic_across_runs(spark):
    a = {r.url: bytes(r.html) for r in C.build_corpus(spark, SF_TINY).collect()}
    b = {
        r.url: bytes(r.html)
        for r in C.build_corpus(spark, SF_TINY).repartition(7).collect()
    }
    assert a == b


def test_word_splitter_matches_duckdb_re2_exactly():
    """The generator's word split is pinned to RE2's \\s class
    ([\\t\\n\\f\\r ]) so the DuckDB oracles' regexp_split_to_array
    replay of the paragraph fold can never diverge — \\v (not in RE2
    \\s) and U+00A0 (Unicode space, split by str.split()) must stay
    INSIDE words in both engines."""
    import duckdb

    from deepseek_ocr_2_spark.sources.corpus import _split_words

    cases = [
        "a\xa0b c\td\x0be\nf\rg\fh",
        "", "   ", "\v", "one",
        "tab\tsep  double", " line seps",
    ]
    con = duckdb.connect()
    for text in cases:
        duck = con.execute(
            "SELECT list_filter(regexp_split_to_array(?, '\\s+'),"
            " x -> x <> '')", [text]
        ).fetchone()[0]
        assert duck == _split_words(text), repr(text)
