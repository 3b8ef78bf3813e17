"""Config-string and formula text utilities (reference T6/T7).

* ``unescape_string`` — manual escape handling for user-supplied prompt
  and page-separator strings, matching the reference's parser
  (``deepseek_ocr2_api/utils/text.py:4-50``): only ``\\n \\t \\r \\\\``
  are escapes; any other backslash sequence passes through verbatim
  (including a trailing lone backslash).
* ``clean_formula`` — the eval-script-only formula cleanup
  (``run_dpsk_ocr2_eval_batch.py:81-96``): inside ``\\[...\\]`` display
  blocks, drop ``\\quad`` + trailing parenthesized equation numbers and
  trim.  Off by default in the /ocr-parity path (the API server never
  applies it); exposed for eval-compatible output.
"""

from __future__ import annotations

import re

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\"}


def unescape_string(s: str) -> str:
    """Unescape ``\\n \\t \\r \\\\`` exactly; leave everything else."""
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n and s[i + 1] in _ESCAPES:
            out.append(_ESCAPES[s[i + 1]])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


_FORMULA_BLOCK = re.compile(r"\\\[(.*?)\\\]", re.DOTALL)
_QUAD_TAIL = re.compile(r"\\quad\s*\([^)]*\)\s*$")


def clean_formula(text: str) -> str:
    """Drop ``\\quad (...)`` equation-number tails inside display blocks."""

    def fix(match: "re.Match[str]") -> str:
        inner = _QUAD_TAIL.sub("", match.group(1)).strip()
        return f"\\[{inner}\\]"

    return _FORMULA_BLOCK.sub(fix, text)


def html_escape(text: str) -> str:
    """Five-entity HTML escaping (reference T8,
    ``deepseek_ocr2_api/routers/tasks.py:607-616``): the exact
    replacement ORDER matters — ``&`` first, or already-escaped
    entities would double-escape.  Note the reference escapes ``'`` as
    ``&#39;`` (not ``&apos;``), matching stdlib ``html.escape``.
    """
    return (
        text
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )
