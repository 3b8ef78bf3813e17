"""Property/fuzz tests: the kernels are total and deterministic on
arbitrary inputs (the 100 TB guarantee — no payload can kill a task)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_2_spark.functions.assemble import process_page
from deepseek_ocr_2_spark.functions.htmlmain import extract_main_content, parse_blocks
from deepseek_ocr_2_spark.functions.refparse import parse_coords
from deepseek_ocr_2_spark.functions.tiling import num_image_tokens, resize_dims


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_main_content_total_on_bytes(blob):
    t1, s1 = extract_main_content(blob)
    t2, s2 = extract_main_content(blob)
    assert (t1, s1) == (t2, s2)
    assert isinstance(t1, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_parse_blocks_total_on_text(text):
    b1 = [(b.tag, b.text, b.link_density) for b in parse_blocks(text)]
    b2 = [(b.tag, b.text, b.link_density) for b in parse_blocks(text)]
    assert b1 == b2
    assert all(t for _, t, _ in b1)  # no empty blocks emitted


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=512))
def test_parse_coords_never_raises(payload):
    out = parse_coords(payload)
    assert isinstance(out, list)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=1024), st.integers(0, 10000), st.integers(0, 10000))
def test_process_page_total(raw, w, h):
    md, elements = process_page(raw, w, h)
    assert isinstance(md, str)
    for e in elements:
        assert len(e["bbox_pixels"]) == 4


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 20000), st.integers(1, 20000))
def test_token_count_in_published_range(w, h):
    t = num_image_tokens(w, h)
    assert t == 257 or t in {256 + 1 + 144 * k for k in range(2, 7)}


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 100000), st.integers(1, 100000))
def test_resize_dims_caps_and_preserves_aspect(w, h):
    rw, rh = resize_dims(w, h)
    assert max(rw, rh) <= 4096
    assert rw <= w and rh <= h and rw >= 1 and rh >= 1
    if max(w, h) <= 4096:
        assert (rw, rh) == (w, h)
    elif min(rw, rh) >= 100:
        # aspect preserved within integer truncation (degenerate
        # 1..99-pixel outputs can't hold a ratio)
        assert abs(rw / rh - w / h) < 0.05 * (w / h)
