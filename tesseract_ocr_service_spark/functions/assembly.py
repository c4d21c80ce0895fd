"""The canonical-text / coordinates / confidence contract, vectorized.

This is THE byte-identity contract of the engine, a from-scratch
vectorized reimplementation of the reference's single-page routines over
a *batch* word table (many documents, many pages at once):

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

The reference runs these per page inside a ProcessPoolExecutor worker;
here one pandas pass handles every page of every document in the Arrow
batch — grouping/sorting/bbox math is columnar, only the final string
joins and the nested-struct build touch Python objects (O(#groups),
O(#words) respectively).
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
    ``kind='stable'`` preserves arrival order within a line, matching the
    reference's append-in-input-order (:152,:226).
    """
    w = words
    stripped = w["text"].str.strip()
    w = w.loc[stripped.ne("")].copy()
    w["text"] = stripped[stripped.ne("")]
    return w.sort_values(_KEY, kind="stable", ignore_index=True)


def assemble_text(words: pd.DataFrame) -> pd.DataFrame:
    """Per-(doc, page) canonical text from a batch word table.

    Parameters: columns ``doc`` (batch-local doc index), ``page_number``,
    ``block_num``, ``par_num``, ``line_num``, ``text`` — rows in arrival
    order (the caller must preserve source record order).

    Returns DataFrame[doc, page_number, text]. Pages with no non-empty
    words are absent (caller fills "" — reference returns "" for an empty
    assembly since "\\n\\n".join([]) == "").
    """
    w = _prepared(words)
    if w.empty:
        return pd.DataFrame({"doc": [], "page_number": [], "text": []})

    # line level: words joined by " " (ocr_processor.py:162)
    lines = (
        w.groupby(_KEY, sort=False)["text"].agg(" ".join).reset_index()
    )
    # block level: lines joined "\n" — paragraphs add NO extra separator
    # (block_lines accumulates across pars, ocr_processor.py:159-165)
    blocks = (
        lines.groupby(["doc", "page_number", "block_num"], sort=False)["text"]
        .agg("\n".join)
        .reset_index()
    )
    # page level: blocks joined "\n\n" (ocr_processor.py:168)
    pages = (
        blocks.groupby(["doc", "page_number"], sort=False)["text"]
        .agg("\n\n".join)
        .reset_index()
    )
    return pages


def page_confidence(records: pd.DataFrame) -> pd.DataFrame:
    """Per-(doc, page) mean confidence (ocr_processor.py:87-93).

    ``records`` must be the RAW record table (before the empty-text
    filter): the reference averages over every record with conf >= 0,
    including empty-text ones; structural rows carry conf == -1 and are
    excluded. Missing (doc, page) pairs mean "no conf>=0 records" -> the
    caller fills 0.0.
    """
    r = records.loc[records["conf"] >= 0, ["doc", "page_number", "conf"]]
    if r.empty:
        return pd.DataFrame({"doc": [], "page_number": [], "confidence": []})
    out = (
        r.astype({"conf": "int64"})
        .groupby(["doc", "page_number"], sort=True)["conf"]
        .mean()
        .reset_index()
        .rename(columns={"conf": "confidence"})
    )
    return out


def _bbox_level(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    """Envelope bbox per group: min(left), min(top), max(right), max(bottom)
    (ocr_processor.py:283-322)."""
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


def build_hierarchy(words: pd.DataFrame) -> dict[tuple[int, int], list[dict]]:
    """Nested blocks->paragraphs->lines->words per (doc, page_number).

    Returns {(doc, page_number): [block structs...]} where the structs
    follow ``schema.BLOCK``. Word conf is clamped to 0 when negative
    (ocr_processor.py:215). Pages absent from the result have no blocks
    (reference emits blocks=[] on empty/error pages, :100-105).

    bbox math is columnar (min/max groupbys); the final nesting is one
    ordered O(#words) pass.
    """
    w = _prepared(words)
    if w.empty:
        return {}

    w["right"] = w["left"] + w["width"]
    w["bottom"] = w["top"] + w["height"]
    w["conf"] = w["conf"].clip(lower=0)

    # envelope bboxes at each level, computed columnar then dict-indexed
    line_bb = _bbox_level(w, _KEY)
    par_bb = _bbox_level(line_bb, _KEY[:4])
    blk_bb = _bbox_level(par_bb, _KEY[:3])

    def _index(df: pd.DataFrame, keys: list[str]) -> dict:
        cols = [df[k].to_numpy() for k in keys]
        l, t = df["left"].to_numpy(), df["top"].to_numpy()
        r, b = df["right"].to_numpy(), df["bottom"].to_numpy()
        return {
            tuple(int(c[i]) for c in cols): {
                "left": int(l[i]),
                "top": int(t[i]),
                "right": int(r[i]),
                "bottom": int(b[i]),
            }
            for i in range(len(df))
        }

    line_bbox = _index(line_bb, _KEY)
    par_bbox = _index(par_bb, _KEY[:4])
    blk_bbox = _index(blk_bb, _KEY[:3])

    out: dict[tuple[int, int], list[dict]] = {}
    # single ordered pass — w is already in traversal order
    doc_a = w["doc"].to_numpy()
    page_a = w["page_number"].to_numpy()
    blk_a = w["block_num"].to_numpy()
    par_a = w["par_num"].to_numpy()
    line_a = w["line_num"].to_numpy()
    text_a = w["text"].to_numpy()
    left_a = w["left"].to_numpy()
    top_a = w["top"].to_numpy()
    wid_a = w["width"].to_numpy()
    hgt_a = w["height"].to_numpy()
    conf_a = w["conf"].to_numpy()

    cur = None  # (doc, page, block, par, line)
    blocks = pars = lines = line_words = None
    for i in range(len(w)):
        key = (
            int(doc_a[i]),
            int(page_a[i]),
            int(blk_a[i]),
            int(par_a[i]),
            int(line_a[i]),
        )
        if cur is None or key[:2] != cur[:2]:
            blocks = out.setdefault(key[:2], [])
            pars = lines = None
        if cur is None or key[:3] != cur[:3]:
            pars = []
            blocks.append(
                {
                    "block_id": key[2],
                    "bbox": blk_bbox[key[:3]],
                    "paragraphs": pars,
                }
            )
            lines = None
        if cur is None or key[:4] != cur[:4]:
            lines = []
            pars.append(
                {"par_id": key[3], "bbox": par_bbox[key[:4]], "lines": lines}
            )
        if cur is None or key != cur:
            line_words = []
            lines.append(
                {
                    "line_id": key[4],
                    "text": None,  # filled below from the joined words
                    "bbox": line_bbox[key],
                    "words": line_words,
                }
            )
        line_words.append(
            {
                "text": str(text_a[i]),
                "left": int(left_a[i]),
                "top": int(top_a[i]),
                "width": int(wid_a[i]),
                "height": int(hgt_a[i]),
                "conf": int(conf_a[i]),
            }
        )
        cur = key

    # line text = " ".join(word texts) (ocr_processor.py:242)
    for blocks in out.values():
        for blk in blocks:
            for par in blk["paragraphs"]:
                for line in par["lines"]:
                    line["text"] = " ".join(
                        wd["text"] for wd in line["words"]
                    )
    return out


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
