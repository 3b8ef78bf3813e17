"""T6 unescape_string / T7 clean_formula kernel tests."""

from __future__ import annotations

from deepseek_ocr_2_spark.functions.textutil import clean_formula, unescape_string


class TestUnescape:
    def test_known_escapes(self):
        assert unescape_string(r"a\nb\tc\rd\\e") == "a\nb\tc\rd\\e"

    def test_unknown_escape_passes_through(self):
        assert unescape_string(r"a\qb") == r"a\qb"
        assert unescape_string(r"\x41") == r"\x41"

    def test_trailing_lone_backslash(self):
        assert unescape_string("abc\\") == "abc\\"

    def test_double_backslash_then_letter(self):
        # \\n -> literal backslash + n (escape consumed first)
        assert unescape_string(r"\\n") == "\\n"

    def test_page_separator_roundtrip(self):
        assert (
            unescape_string(r"\n<--- Page Split --->\n")
            == "\n<--- Page Split --->\n"
        )

    def test_empty(self):
        assert unescape_string("") == ""


class TestCleanFormula:
    def test_drops_quad_equation_number(self):
        s = r"pre \[E = mc^2 \quad (1)\] post"
        assert clean_formula(s) == r"pre \[E = mc^2\] post"

    def test_keeps_quad_mid_formula(self):
        s = r"\[a \quad b\]"
        assert clean_formula(s) == r"\[a \quad b\]"

    def test_no_blocks_untouched(self):
        assert clean_formula("plain text (1)") == "plain text (1)"

    def test_multiple_blocks(self):
        s = r"\[x \quad (1)\] mid \[y \quad (2)\]"
        assert clean_formula(s) == r"\[x\] mid \[y\]"


def test_html_escape_matches_reference_semantics():
    from deepseek_ocr_2_spark.functions.textutil import html_escape
    import html

    s = """<a href="x?a=1&b='2'">R&D <tag></a>"""
    out = html_escape(s)
    assert out == html.escape(s, quote=True).replace("&#x27;", "&#39;")
    # ampersand-first ordering: no double escaping
    assert html_escape("&lt;") == "&amp;lt;"
    assert "&amp;amp;" not in html_escape("&")
