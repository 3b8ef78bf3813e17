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


# Hand-derived from the reference formula (image_process.py:447-458 at
# /root/reference: 16**2 global + 1 separator + 144*wt*ht local when
# tiled; no-crop when both dims <= 768) and the argmin grid selection
# over 2..6-tile candidates (image_process.py:11-42).  HARD-CODED on
# purpose: the oracle generators import the repo's own tiling functions
# (sources/corpus.py), so without this pin a tiling regression would
# corrupt kernel and oracle identically and every hash row would stay
# green (VERDICT r04 "What's wrong" #1).
#   (640, 760)   both <= 768 -> no crop, (1,1), 256+1        = 257
#   (1275, 1650) aspect .773 -> grid (2,3), 256+1+144*6      = 1121
#   (1240, 1754) aspect .707 -> grid (2,3), 256+1+144*6      = 1121
#   (2480, 1748) aspect 1.419 -> grid (3,2), 256+1+144*6     = 1121
#   (900, 2400)  aspect .375 -> grid (1,3), 256+1+144*3      = 689
# All dims are under the 4096 resize cap -> resize is identity.
_EXPECTED_PAGE_TABLE = [
    # (w, h, wtiles, htiles, tokens, resized_w, resized_h, capped)
    (640, 760, 1, 1, 257, 640, 760, "no"),
    (1275, 1650, 2, 3, 1121, 1275, 1650, "no"),
    (1240, 1754, 2, 3, 1121, 1240, 1754, "no"),
    (2480, 1748, 3, 2, 1121, 2480, 1748, "no"),
    (900, 2400, 1, 3, 689, 900, 2400, "no"),
]


def test_oracle_tiling_constants_pinned_by_hand():
    """The generated oracle SQL must embed EXACTLY the hand-computed
    per-PAGE_DIMS constants — closing the self-reference loop where
    oracle generation inherits a silent tiling regression."""
    assert [(w, h) for w, h, *_ in _EXPECTED_PAGE_TABLE] == C.PAGE_DIMS

    metrics_sql = C.extraction_metrics_oracle()
    meta_sql = C.page_metadata_oracle()
    for k, (w, h, wt, ht, tok, rw, rh, capped) in enumerate(
        _EXPECTED_PAGE_TABLE
    ):
        assert f"WHEN {k} THEN {tok}" in metrics_sql, (k, tok)
        assert (
            f"WHEN {k} THEN "
            f"{{'w': {w}, 'h': {h}, 'wt': {wt}, 'ht': {ht}, "
            f"'tok': {tok}, 'rw': {rw}, 'rh': {rh}, "
            f"'capped': '{capped}'}}"
        ) in meta_sql, (k, w, h)

    # the payload-rebuild oracles embed the page dims too
    payload_sql = C.payload_features_oracle()
    frame_sql = C.frame_sample_oracle()
    for k, (w, h, *_rest) in enumerate(_EXPECTED_PAGE_TABLE):
        frag = f"WHEN {k} THEN {{'w': {w}, 'h': {h}}}"
        assert frag in payload_sql, (k, w, h)
        assert frag in frame_sql, (k, w, h)


def test_tiling_functions_match_hand_table():
    """And the live tiling functions agree with the same hand table
    (so the pin catches a regression on either side of the loop)."""
    from deepseek_ocr_2_spark.functions.tiling import (
        crop_ratio_for,
        num_image_tokens,
        resize_dims,
    )

    for w, h, wt, ht, tok, rw, rh, _capped in _EXPECTED_PAGE_TABLE:
        assert crop_ratio_for(w, h) == (wt, ht), (w, h)
        assert num_image_tokens(w, h) == tok, (w, h)
        assert resize_dims(w, h) == (rw, rh), (w, h)


def test_oracle_text_assumptions_pinned():
    """The payload-rebuild oracles assume (in prose) that document
    text contributes NO characters needing json escaping ('\"', '\\\\',
    control chars), no HTML-active characters ('<', '>', '&' — the
    template embeds paragraphs raw, and the extractor model treats
    them as text), and no non-ASCII beyond the template's own three
    codepoints.  Pin the assumption on the corpus itself (code review
    r05: stated only in prose ≠ enforced) — a future testdata change
    that violates it fails HERE with a named character instead of as a
    confusing oracle hash mismatch."""
    import duckdb

    from .conftest import SF_SMALL

    rows = duckdb.sql(
        f"SELECT text, lang FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    assert rows
    for text, lang in rows:
        for c in text or "":
            if c in "\t\n\f\r ":
                continue  # whitespace never reaches a payload verbatim
            assert 33 <= ord(c) <= 126 and c not in '"\\<>&', (
                f"text contains {c!r} (U+{ord(c):04X}): json/HTML "
                "escape assumptions of the payload oracles violated"
            )
        assert (lang or "").isascii() and (lang or "").isalpha(), lang


def test_utf8_bytes_expr_matches_python_encode():
    """The payload oracles' codepoint-to-UTF-8-byte SQL expansion
    claims independence from WHICH non-ASCII characters the generator
    emits — pin that generically: for adversarial unicode (2/3/4-byte
    forms, boundary codepoints U+007F/0080/07FF/0800/FFFF/10000,
    emoji, CJK), the DuckDB expression must reproduce
    ``str.encode('utf-8')`` byte-for-byte, and the 16-bin histogram
    must match numpy's."""
    import duckdb
    import numpy as np

    from deepseek_ocr_2_spark.sources.corpus import (
        _hist_filters,
        _utf8_bytes_expr,
    )

    cases = [
        "",
        "plain ascii only",
        "\x7f߿ࠀ￿\U00010000\U0010ffff",
        "mixed · ｜ ▁ © emoji \U0001f600\U0001f680"
        " CJK 漢字仮名",
        "\n\t\x01 control + ascii",
        "á" * 50 + "b" * 50,
    ]
    con = duckdb.connect()
    for s in cases:
        got = con.execute(
            f"SELECT {_utf8_bytes_expr('s')} FROM (SELECT ? AS s)", [s]
        ).fetchone()[0]
        assert bytes(got or []) == s.encode("utf-8"), repr(s)
        hist = con.execute(
            f"SELECT [{_hist_filters(16)}] FROM (SELECT UNNEST("
            f"{_utf8_bytes_expr('s')}) AS b FROM (SELECT ? AS s))", [s]
        ).fetchone()[0]
        arr = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        expect, _ = np.histogram(arr, bins=16, range=(0, 256))
        # an all-empty UNNEST yields no input rows; accept the
        # aggregate's zero row either way
        if len(s) == 0:
            assert hist is None or list(hist) == [0] * 16
        else:
            assert list(hist) == list(expect), repr(s)
