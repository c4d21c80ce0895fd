"""The canonical-text / coordinates / confidence contract, vectorized.

This is THE byte-identity contract of the engine, a from-scratch
reimplementation of the reference's single-page routines over a *batch*
word table (many documents, many pages at once):

- text assembly   — reference ``ocr/services/ocr_processor.py:116-168``:
  group word records by (block_num, par_num, line_num); within a line,
  words join with " " in ARRIVAL order; lines within a block (across
  paragraphs!) join with "\\n"; blocks join with "\\n\\n"; groups are
  traversed in sorted numeric key order; records whose stripped text is
  empty are skipped entirely.
- confidence      — ``ocr_processor.py:87-93``: mean of int(conf) over
  ALL records with conf >= 0 (including empty-text records — the
  reference iterates data["conf"] directly, unfiltered), else 0.0.
- hierarchy/bbox  — ``ocr_processor.py:171-322``: words -> lines ->
  paragraphs -> blocks with envelope bboxes at each level, children in
  sorted id order; word conf clamped to 0 when negative (:215).

Execution shape: grouping order comes from ONE stable columnar sort;
bbox envelopes are columnar min/max groupbys; then a single fused
O(#words) pass emits page texts AND the nested hierarchy by detecting
group boundaries positionally (equivalent to — and an order of
magnitude faster than — a 3-level pandas groupby-join cascade, since
the separator between consecutive words is a pure function of which
key level changed: new block -> "\\n\\n", new (par,line) -> "\\n",
else " ").
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: grouping key of the hierarchy, in traversal order.
_KEY = ["doc", "page_number", "block_num", "par_num", "line_num"]


def _prepared(words: pd.DataFrame) -> pd.DataFrame:
    """Drop empty-text records and sort into contract traversal order.

    Sorting by the numeric hierarchy keys reproduces the reference's
    ``sorted(keys)`` traversal (ocr_processor.py:157-160,231-237);
    ``kind='stable'`` preserves arrival order within a line, matching
    the reference's append-in-input-order (:152,:226).
    """
    stripped = words["text"].str.strip()
    keep = stripped.ne("")
    w = words.loc[keep].copy()
    w["text"] = stripped[keep]
    return w.sort_values(_KEY, kind="stable", ignore_index=True)


def _bbox_level(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    """Envelope bbox per group: min(left), min(top), max(right),
    max(bottom) (ocr_processor.py:283-322)."""
    return (
        df.groupby(keys, sort=False)
        .agg(
            left=("left", "min"),
            top=("top", "min"),
            right=("right", "max"),
            bottom=("bottom", "max"),
        )
        .reset_index()
    )


def _index_bboxes(df: pd.DataFrame, keys: list[str]) -> dict:
    cols = [df[k].tolist() for k in keys]
    l, t = df["left"].tolist(), df["top"].tolist()
    r, b = df["right"].tolist(), df["bottom"].tolist()
    return {
        tuple(c[i] for c in cols): {
            "left": l[i],
            "top": t[i],
            "right": r[i],
            "bottom": b[i],
        }
        for i in range(len(df))
    }


def assemble_pages(
    words: pd.DataFrame, emit_spans: bool = True
) -> tuple[dict[tuple[int, int], str], dict[tuple[int, int], list[dict]]]:
    """Fused single pass: per-(doc, page) canonical text + (optionally)
    the nested blocks hierarchy.

    `words` columns: doc, page_number, block_num, par_num, line_num,
    text, left, top, width, height, conf — rows in arrival order.
    Returns (text_map, spans_map); pages with no non-empty words are
    absent from both (callers fill ""/[]).
    """
    w = _prepared(words)
    if w.empty:
        return {}, {}

    if emit_spans:
        w["right"] = w["left"] + w["width"]
        w["bottom"] = w["top"] + w["height"]
        w["conf"] = w["conf"].clip(lower=0)
        line_bbox = _index_bboxes(_bbox_level(w, _KEY), _KEY)
        par_bb = _bbox_level(_bbox_level(w, _KEY), _KEY[:4])
        par_bbox = _index_bboxes(par_bb, _KEY[:4])
        blk_bbox = _index_bboxes(_bbox_level(par_bb, _KEY[:3]), _KEY[:3])

    # boundary detection, vectorized: which key level changed vs prev row
    n = len(w)
    doc_np = w["doc"].to_numpy()
    page_np = w["page_number"].to_numpy()
    blk_np = w["block_num"].to_numpy()
    par_np = w["par_num"].to_numpy()
    line_np = w["line_num"].to_numpy()
    new_page_np = np.ones(n, dtype=bool)
    new_page_np[1:] = (doc_np[1:] != doc_np[:-1]) | (
        page_np[1:] != page_np[:-1]
    )
    new_block_np = new_page_np.copy()
    new_block_np[1:] |= blk_np[1:] != blk_np[:-1]
    new_line_np = new_block_np.copy()
    new_line_np[1:] |= (par_np[1:] != par_np[:-1]) | (
        line_np[1:] != line_np[:-1]
    )

    # one .tolist() per column: C-speed numpy->python conversion so the
    # assembly loop touches plain ints/strs (no per-access scalar boxing)
    doc_a = doc_np.tolist()
    page_a = page_np.tolist()
    blk_a = blk_np.tolist()
    par_a = par_np.tolist()
    line_a = line_np.tolist()
    text_a = w["text"].tolist()
    new_page = new_page_np.tolist()
    new_block = new_block_np.tolist()
    new_line = new_line_np.tolist()
    if emit_spans:
        left_a = w["left"].tolist()
        top_a = w["top"].tolist()
        wid_a = w["width"].tolist()
        hgt_a = w["height"].tolist()
        conf_a = w["conf"].tolist()

    text_map: dict[tuple[int, int], str] = {}
    spans_map: dict[tuple[int, int], list[dict]] = {}

    pieces: list[str] = []
    page_key = None
    blocks = pars = lines = line_words = line_piece_start = None

    def _close_page() -> None:
        if page_key is not None:
            text_map[page_key] = "".join(pieces)

    def _close_line() -> None:
        # line text = " ".join(word texts) (ocr_processor.py:242) — the
        # page pieces since line start are exactly those words + " " seps
        if emit_spans and lines:
            lines[-1]["text"] = "".join(pieces[line_piece_start:])

    for i in range(n):
        if new_line[i]:
            _close_line()
        if new_page[i]:
            _close_page()
            page_key = (doc_a[i], page_a[i])
            pieces = []
            if emit_spans:
                blocks = spans_map.setdefault(page_key, [])
        elif new_block[i]:
            pieces.append("\n\n")
        elif new_line[i]:
            pieces.append("\n")
        else:
            pieces.append(" ")

        if emit_spans:
            if new_block[i]:
                pars = []
                blocks.append(
                    {
                        "block_id": blk_a[i],
                        "bbox": blk_bbox[page_key + (blk_a[i],)],
                        "paragraphs": pars,
                    }
                )
                new_par = True
            else:
                new_par = par_a[i] != par_a[i - 1]
            if new_par:
                key4 = page_key + (blk_a[i], par_a[i])
                lines = []
                pars.append(
                    {"par_id": par_a[i], "bbox": par_bbox[key4], "lines": lines}
                )
            if new_line[i]:
                key5 = page_key + (
                    blk_a[i],
                    par_a[i],
                    line_a[i],
                )
                line_words = []
                line_piece_start = len(pieces)
                lines.append(
                    {
                        "line_id": line_a[i],
                        "text": None,
                        "bbox": line_bbox[key5],
                        "words": line_words,
                    }
                )
            line_words.append(
                {
                    "text": text_a[i],
                    "left": left_a[i],
                    "top": top_a[i],
                    "width": wid_a[i],
                    "height": hgt_a[i],
                    "conf": conf_a[i],
                }
            )

        pieces.append(text_a[i])

    _close_line()
    _close_page()
    return text_map, spans_map


def assemble_text(words: pd.DataFrame) -> pd.DataFrame:
    """Per-(doc, page) canonical text -> DataFrame[doc, page_number,
    text] (unit-test surface over :func:`assemble_pages`)."""
    text_map, _ = assemble_pages(words, emit_spans=False)
    if not text_map:
        return pd.DataFrame({"doc": [], "page_number": [], "text": []})
    rows = [(d, p, t) for (d, p), t in text_map.items()]
    return pd.DataFrame(rows, columns=["doc", "page_number", "text"])


def build_hierarchy(words: pd.DataFrame) -> dict[tuple[int, int], list[dict]]:
    """Nested blocks->paragraphs->lines->words per (doc, page_number)
    (unit-test surface over :func:`assemble_pages`)."""
    _, spans_map = assemble_pages(words, emit_spans=True)
    return spans_map


def page_confidence(records: pd.DataFrame) -> pd.DataFrame:
    """Per-(doc, page) mean confidence (ocr_processor.py:87-93).

    ``records`` must be the RAW record table (before the empty-text
    filter): the reference averages over every record with conf >= 0,
    including empty-text ones; structural rows carry conf == -1 and are
    excluded. Missing (doc, page) pairs mean "no conf>=0 records" -> the
    caller fills 0.0.

    The int cast happens BEFORE the >= 0 filter: the reference includes
    any record where int(conf) >= 0 (ocr_processor.py:87-93), so a
    fractional conf in (-1, 0) truncates to 0 and IS counted (numpy
    astype truncates toward zero, same as Python int()).
    """
    r = records[["doc", "page_number", "conf"]].astype({"conf": "int64"})
    r = r.loc[r["conf"] >= 0]
    if r.empty:
        return pd.DataFrame({"doc": [], "page_number": [], "confidence": []})
    return (
        r.groupby(["doc", "page_number"], sort=True)["conf"]
        .mean()
        .reset_index()
        .rename(columns={"conf": "confidence"})
    )


def word_counts(words: pd.DataFrame) -> pd.DataFrame:
    """Per-doc word count over non-empty records (lineage counter,
    mirrors the reference's total_words log, ocr_processor.py:465-469)."""
    w = words.loc[words["text"].str.strip().ne("")]
    if w.empty:
        return pd.DataFrame({"doc": [], "n_words": []})
    return (
        w.groupby("doc", sort=True)
        .size()
        .reset_index(name="n_words")
        .astype({"n_words": "int64"})
    )
