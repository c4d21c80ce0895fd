"""HTML main-content extraction: block segmentation + boilerplate scoring.

This is the engine's "OCR" for web pages (BASELINE.json north_star): a
DOM-heuristic, Boilerpipe/Readability-style extractor that strips
boilerplate via tag class + link density + block length, then emits the
same flat word-record table as the PDF path so the assembly contract
(``functions.assembly``, transcribing ``ocr_processor.py:116-168``)
applies uniformly to both payload kinds.

No lxml/bs4 in this environment — the segmenter is regex-based over the
non-nested block grammar the deterministic corpus generator emits, and
degrades gracefully (keeps any block-tag match) on arbitrary HTML.

Rules (deterministic, part of the engine contract):
- ``<script>``/``<style>``/comments are always removed.
- structural-boilerplate tags ``nav|header|footer|aside`` are dropped.
- link_density = (#tokens inside <a>) / (#tokens) > ``max_link_density``
  (default 0.33) -> dropped.
- non-heading blocks with < ``min_block_words`` (default 3) tokens ->
  dropped; headings (h1-h6) kept from 1 token.
- kept blocks become block_num = 1-based document order; one paragraph
  (par_num=1); words flow-wrapped ``line_wrap_words`` (default 12) per
  line; conf fixed at ``html_word_conf`` (no real OCR -> exact by
  construction).
"""

from __future__ import annotations

import re
from typing import Any

from ..config import ExtractConfig

_SCRIPT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_RE = re.compile(
    r"<(nav|header|footer|aside|h1|h2|h3|h4|h5|h6|p|li|div|td|blockquote)"
    r"\b[^>]*>(.*?)</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside"})
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST so "&amp;lt;" -> "&lt;" (single-pass order)
]


def unescape(text: str) -> str:
    for ent, ch in _ENTITIES:
        if ent in text:
            text = text.replace(ent, ch)
    return text


def escape(text: str) -> str:
    """Inverse of :func:`unescape` for the minimal entity set (used when
    wrapping raw text into HTML so extraction round-trips byte-exact)."""
    return (
        text.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _visible_tokens(inner_html: str) -> list[str]:
    return unescape(_TAG_RE.sub(" ", inner_html)).split()


def segment_blocks(html: str) -> list[tuple[str, str]]:
    """-> [(tag_lower, inner_html)] in document order, noise stripped."""
    cleaned = _SCRIPT_RE.sub(" ", html)
    return [
        (m.group(1).lower(), m.group(2)) for m in _BLOCK_RE.finditer(cleaned)
    ]


def classify_block(
    tag: str, inner_html: str, cfg: ExtractConfig
) -> tuple[bool, list[str]]:
    """-> (keep?, visible tokens). Implements the scoring rules above."""
    tokens = _visible_tokens(inner_html)
    if not tokens:
        return False, tokens
    if tag in _BOILER_TAGS:
        return False, tokens
    anchor_tokens = sum(
        len(_visible_tokens(m.group(1))) for m in _ANCHOR_RE.finditer(inner_html)
    )
    if anchor_tokens / len(tokens) > cfg.max_link_density:
        return False, tokens
    if tag not in _HEADING_TAGS and len(tokens) < cfg.min_block_words:
        return False, tokens
    return True, tokens


#: flow-layout geometry for the HTML path (arbitrary but fixed: part of
#: the engine contract, shared with nothing — tests re-derive it
#: independently).
COL_W = 80  # x advance per word slot
CHAR_W = 8  # glyph width
LINE_H = 24  # y advance per line
WORD_H = 18  # word bbox height
PAGE_W = 12 * COL_W  # = line_wrap_words(default) * COL_W


def extract_word_records(
    html: str, cfg: ExtractConfig
) -> tuple[list[tuple[Any, ...]], int, int, int]:
    """HTML -> (word records, n_blocks_kept, n_blocks_dropped, page_height).

    Records use the WORD_FIELDS tuple layout of ``pdfstream``; a single
    page (page_number handled by the caller). Lines wrap every
    ``cfg.line_wrap_words`` words; line_num runs document-global (top of
    page downward) like a single-column render.
    """
    records: list[tuple[Any, ...]] = []
    kept = dropped = 0
    global_line = 0
    for tag, inner in segment_blocks(html):
        keep, tokens = classify_block(tag, inner, cfg)
        if not tokens:
            continue  # empty block: counted as neither kept nor dropped
        if not keep:
            dropped += 1
            continue
        kept += 1
        block_num = kept
        for i, tok in enumerate(tokens):
            line_in_block = i // cfg.line_wrap_words
            pos = i % cfg.line_wrap_words
            if pos == 0:
                global_line += 1
            records.append(
                (
                    block_num,
                    1,  # par_num
                    line_in_block + 1,
                    pos + 1,  # word_num
                    tok,
                    pos * COL_W,
                    (global_line - 1) * LINE_H,
                    len(tok) * CHAR_W,
                    WORD_H,
                    cfg.html_word_conf,
                )
            )
    page_height = max(global_line * LINE_H, LINE_H)
    return records, kept, dropped, page_height
