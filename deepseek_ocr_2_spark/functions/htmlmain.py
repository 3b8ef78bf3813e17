"""Main-content extraction from HTML: block tree + density heuristics.

New code (nothing comparable exists in the reference repo, which only
handles image/PDF payloads).  The algorithm is a deterministic
re-implementation of the *published* boilerplate-removal family
(Readability / Boilerpipe / trafilatura-style):

1. parse HTML with stdlib ``html.parser`` (error-tolerant, no deps),
2. segment character data into *blocks* at block-level tag boundaries,
   skipping non-content subtrees (``script``/``style``/
   ``nav``/``footer``/... and class/id boilerplate markers),
3. score each block by text length and link density
   (chars inside ``<a>`` / total chars),
4. keep dense low-link blocks; keep headings and short blocks only when
   adjacent to kept content (quote/caption rescue),
5. join kept blocks with blank lines -> the extracted main text.

All thresholds are charset-agnostic (character counts, not word counts)
so CJK pages score the same way.  The function is pure and total: any
byte string in, deterministic text out; malformed HTML degrades to
whatever blocks the tolerant parser can recover.
"""

from __future__ import annotations

import re
from functools import lru_cache
from html import unescape
from typing import Any, Dict, List, Tuple

# Subtrees whose character data is never content.
SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe", "object",
     "head", "button", "select", "option", "form", "nav", "footer",
     "aside", "figcaption"}
)

# Tags that terminate the current block.
BLOCK_TAGS = frozenset(
    {"p", "div", "article", "section", "main", "body", "header", "footer",
     "nav", "aside", "ul", "ol", "li", "table", "tr", "td", "th", "pre",
     "blockquote", "br", "h1", "h2", "h3", "h4", "h5", "h6", "figure",
     "figcaption", "dl", "dt", "dd", "hr"}
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
PRE_TAGS = frozenset({"pre", "td", "th", "li", "blockquote", "dt", "dd"})

# class/id substrings that mark boilerplate containers.
_BOILER_ATTR = re.compile(
    r"(?:^|[\s_-])(?:nav|menu|footer|sidebar|side-bar|comment|share|social"
    r"|advert|ads|banner|breadcrumb|cookie|promo|related|widget)(?:$|[\s_-])"
)

_WS = re.compile(r"\s+")

MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.35
SHORT_RESCUE_CHARS = 8


class Block:
    """One text block with the counters the classifier needs.

    ``text``/``link_density`` are computed once on first access and
    cached — the classifier and extractor read them several times per
    block, and the whitespace-normalization regex was a measurable
    slice of kernel CPU when recomputed each read.
    """

    __slots__ = ("tag", "chars", "link_chars", "in_boiler", "_text", "_density")

    def __init__(self, tag: str = "p", in_boiler: bool = False) -> None:
        self.tag = tag
        self.chars: List[str] = []
        self.link_chars = 0
        self.in_boiler = in_boiler
        self._text: str | None = None
        self._density: float | None = None

    @property
    def text(self) -> str:
        if self._text is None:
            self._text = _WS.sub(" ", "".join(self.chars)).strip()
        return self._text

    @property
    def link_density(self) -> float:
        if self._density is None:
            total = len("".join(self.chars).strip())
            self._density = (
                0.0 if total == 0 else min(1.0, self.link_chars / total)
            )
        return self._density


# One-pass tokenizer: comments / CDATA / declarations / PIs skipped,
# tags captured with (closing-slash, name, attrs, self-closing-slash).
# Quoted attribute values may contain '>'.
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>?"
    r"|<\?[^>]*>?"
    r"|<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>",
    re.DOTALL,
)

# class/id/role attribute extraction.  The attribute NAME must be
# exactly class/id/role (preceded by whitespace/start) — a bare
# substring match would also hit data-track-id / data-testid etc. and
# falsely boilerplate real content.
_MARK_ATTR_RE = re.compile(
    r"(?:^|\s)(?:class|id|role)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+)",
    re.IGNORECASE,
)

# Elements whose raw content HTMLParser treats as CDATA: everything up
# to the matching close tag is data, even if it contains '<'.
_RAWTEXT = ("script", "style", "textarea", "title")
_RAWTEXT_CLOSE = {t: re.compile(f"</{t}", re.IGNORECASE) for t in _RAWTEXT}


@lru_cache(maxsize=4096)
def _is_boiler(attr_text: str) -> bool:
    """Whether a tag's attribute text marks it as boilerplate.

    Pure function of the attr string, called once per start tag; web
    templates repeat the same class/id combinations across millions of
    pages, so a bounded LRU cache replaces the two regex passes with a
    dict hit on the hot path (the bound caps memory on adversarial
    all-unique-attrs input).
    """
    if not attr_text:
        return False
    for m in _MARK_ATTR_RE.finditer(attr_text):
        value = m.group(1).strip("\"'").lower()
        if _BOILER_ATTR.search(value):
            return True
    return False


class _BlockBuilder:
    """Tag-event consumer -> flat block list with link/boiler accounting.

    Same event semantics as the previous stdlib-HTMLParser version (the
    regex tokenizer replaced it: stdlib per-tag dispatch was the hot
    ~95% of extraction CPU at bench scale), so block output is
    unchanged for well-formed input.
    """

    __slots__ = ("blocks", "_cur", "_skip_depth", "_boiler_depth",
                 "_link_depth", "_tag_stack")

    def __init__(self) -> None:
        self.blocks: List[Block] = []
        self._cur = Block()
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._tag_stack: List[Tuple[str, bool, bool]] = []

    def _flush(self, next_tag: str = "p") -> None:
        cur = self._cur
        if not cur.chars:
            # nothing buffered: reuse the block in place — flushes per
            # tag event vastly outnumber text-bearing blocks, and the
            # allocation + whitespace-normalize regex per empty flush
            # was a measurable kernel slice
            cur.tag = next_tag
            cur.in_boiler = self._boiler_depth > 0
            return
        if cur.text:
            self.blocks.append(cur)
        self._cur = Block(tag=next_tag, in_boiler=self._boiler_depth > 0)

    _is_boiler = staticmethod(_is_boiler)

    def start(self, tag: str, attr_text: str) -> None:
        skip = tag in SKIP_TAGS
        # short-circuit the (lru-cached) attr classifier for attr-less
        # tags — the common case — before paying the call + cache probe
        boiler = bool(attr_text) and self._is_boiler(attr_text)
        self._tag_stack.append((tag, skip, boiler))
        if skip:
            self._skip_depth += 1
        if boiler:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush(next_tag=tag)

    def end(self, tag: str) -> None:
        # Pop the nearest matching open tag (tolerates unclosed tags).
        stack = self._tag_stack
        if stack:
            t, s, b = stack[-1]
            if t == tag:
                # well-formed fast path (the overwhelming majority of
                # end tags): single pop, no scan, no range loop — same
                # bookkeeping as the generic path below
                stack.pop()
                if s:
                    self._skip_depth -= 1
                if b:
                    self._boiler_depth -= 1
                if t == "a":
                    self._link_depth -= 1
                if tag in BLOCK_TAGS:
                    self._flush()
                return
        match = -1
        for i in range(len(stack) - 2, -1, -1):
            if stack[i][0] == tag:
                match = i
                break
        if match >= 0:
            # everything above the match is implicitly closed — ONE
            # copy of the depth bookkeeping for both paths
            for _ in range(len(stack) - match):
                t, s, b = stack.pop()
                if s:
                    self._skip_depth -= 1
                if b:
                    self._boiler_depth -= 1
                if t == "a":
                    self._link_depth -= 1
        if tag in BLOCK_TAGS:
            self._flush()

    def startend(self, tag: str) -> None:
        if tag in BLOCK_TAGS:
            self._flush(next_tag=tag)

    def data(self, raw: str) -> None:
        if self._skip_depth > 0 or not raw:
            return
        if "&" in raw:
            raw = unescape(raw)
        if self._boiler_depth > 0:
            self._cur.in_boiler = True
        self._cur.chars.append(raw)
        if self._link_depth > 0:
            self._cur.link_chars += len(raw.strip())


def parse_blocks(html_text: str) -> List[Block]:
    """HTML string -> flat list of non-empty text blocks (one regex pass)."""
    b = _BlockBuilder()
    try:
        pos = 0
        n = len(html_text)
        search = _TOKEN_RE.search  # bound-method locals: the loop runs
        bdata = b.data             # once per token, lookups add up
        bend = b.end
        bstart = b.start
        bstartend = b.startend
        while pos < n:
            m = search(html_text, pos)
            if m is None:
                bdata(html_text[pos:])
                break
            ms, me = m.span()  # one call for both bounds
            if ms > pos:
                bdata(html_text[pos:ms])
            pos = me
            # one group() call for all four captures (4 separate calls
            # per token were ~5% of kernel time)
            closing, tag, attr_text, selfclose = m.group(1, 2, 3, 4)
            if tag is None:
                continue  # comment / declaration / PI
            if not tag.islower():  # real-world tags are already lower
                tag = tag.lower()
            if closing:  # </tag>
                bend(tag)
            else:
                attr_text = attr_text or ""
                if selfclose:  # <tag/>
                    bstartend(tag)
                elif tag in _RAWTEXT:
                    # consume raw content up to the matching close tag
                    bstart(tag, attr_text)
                    c = _RAWTEXT_CLOSE[tag].search(html_text, pos)
                    if c is None:
                        bdata(html_text[pos:])
                        pos = n
                    else:
                        bdata(html_text[pos:c.start()])
                        pos = html_text.find(">", c.start())
                        pos = n if pos == -1 else pos + 1
                        bend(tag)
                else:
                    bstart(tag, attr_text)
        b._flush()
    except Exception:
        # total determinism beats perfection: return whatever flushed
        pass
    return b.blocks


def classify_blocks(blocks: List[Block]) -> List[bool]:
    """Density classification + neighbor rescue, in two deterministic passes."""
    keep = []
    for b in blocks:
        text = b.text
        if b.in_boiler:
            keep.append(False)
        elif b.tag in HEADING_TAGS:
            keep.append(bool(text) and b.link_density < 0.66)
        elif b.tag in PRE_TAGS:
            keep.append(len(text) >= 10 and b.link_density <= 0.25)
        else:
            keep.append(
                len(text) >= MIN_CONTENT_CHARS
                and b.link_density <= MAX_LINK_DENSITY
            )
    # Rescue pass: short low-link blocks flanked by kept content.
    rescued = list(keep)
    for i, b in enumerate(blocks):
        if keep[i] or b.in_boiler:
            continue
        if len(b.text) < SHORT_RESCUE_CHARS or b.link_density > MAX_LINK_DENSITY:
            continue
        prev_kept = any(keep[j] for j in range(max(0, i - 1), i))
        next_kept = any(keep[j] for j in range(i + 1, min(len(blocks), i + 2)))
        if prev_kept and next_kept:
            rescued[i] = True
    return rescued


def extract_main_content(html_bytes: bytes | str) -> Tuple[str, List[Dict[str, Any]]]:
    """Full pipeline: bytes -> (main text, span dicts).

    Spans reuse the reference element schema (id/type/bboxes/text) with
    empty bboxes — HTML has no pixel geometry; ``type`` is the source
    block tag.
    """
    if isinstance(html_bytes, bytes):
        html_text = html_bytes.decode("utf-8", errors="replace")
    else:
        html_text = html_bytes
    blocks = parse_blocks(html_text)
    keep = classify_blocks(blocks)

    texts: List[str] = []
    spans: List[Dict[str, Any]] = []
    idx = 0
    for b, k in zip(blocks, keep):
        if not k:
            continue
        texts.append(b.text)
        spans.append(
            {
                "id": idx,
                "type": b.tag,
                "bbox_normalized": [],
                "bbox_pixels": [],
                "text": b.text,
            }
        )
        idx += 1
    return "\n\n".join(texts), spans
