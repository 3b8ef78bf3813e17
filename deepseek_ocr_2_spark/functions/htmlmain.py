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
from dataclasses import dataclass, field
from html.parser import HTMLParser
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


@dataclass
class Block:
    """One text block with the counters the classifier needs."""

    tag: str = "p"
    chars: List[str] = field(default_factory=list)
    link_chars: int = 0
    in_boiler: bool = False

    @property
    def text(self) -> str:
        return _WS.sub(" ", "".join(self.chars)).strip()

    @property
    def link_density(self) -> float:
        total = len("".join(self.chars).strip())
        if total == 0:
            return 0.0
        return min(1.0, self.link_chars / total)


class _BlockParser(HTMLParser):
    """Tolerant HTML -> flat block list with link/boiler accounting."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Block] = []
        self._cur = Block()
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._tag_stack: List[Tuple[str, bool, bool]] = []

    def _flush(self, next_tag: str = "p") -> None:
        if self._cur.text:
            self.blocks.append(self._cur)
        self._cur = Block(tag=next_tag, in_boiler=self._boiler_depth > 0)

    @staticmethod
    def _is_boiler(attrs: List[Tuple[str, Any]]) -> bool:
        for name, value in attrs:
            if name in ("class", "id", "role") and value:
                if _BOILER_ATTR.search(str(value).lower()):
                    return True
        return False

    def handle_starttag(self, tag: str, attrs: List[Tuple[str, Any]]) -> None:
        skip = tag in SKIP_TAGS
        boiler = self._is_boiler(attrs)
        self._tag_stack.append((tag, skip, boiler))
        if skip:
            self._skip_depth += 1
        if boiler:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush(next_tag=tag)

    def handle_endtag(self, tag: str) -> None:
        # Pop the nearest matching open tag (tolerates unclosed tags).
        for i in range(len(self._tag_stack) - 1, -1, -1):
            open_tag, skip, boiler = self._tag_stack[i]
            if open_tag == tag:
                # Everything above i is implicitly closed.
                for j in range(len(self._tag_stack) - 1, i - 1, -1):
                    t, s, b = self._tag_stack.pop()
                    if s:
                        self._skip_depth -= 1
                    if b:
                        self._boiler_depth -= 1
                    if t == "a":
                        self._link_depth -= 1
                break
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs: List[Tuple[str, Any]]) -> None:
        if tag in BLOCK_TAGS:
            self._flush(next_tag=tag)

    def handle_data(self, data: str) -> None:
        if self._skip_depth > 0 or not data:
            return
        if self._boiler_depth > 0:
            self._cur.in_boiler = True
        self._cur.chars.append(data)
        if self._link_depth > 0:
            self._cur.link_chars += len(data.strip())

    def close(self) -> None:  # noqa: D102 - flush trailing block
        super().close()
        self._flush()


def parse_blocks(html_text: str) -> List[Block]:
    """HTML string -> flat list of non-empty text blocks."""
    parser = _BlockParser()
    try:
        parser.feed(html_text)
        parser.close()
    except Exception:
        # html.parser is robust, but total determinism beats perfection:
        # return whatever was flushed before the failure.
        pass
    return parser.blocks


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
