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
then everything is boundary-index arithmetic. Which key level changed
vs the previous row is a vectorized numpy comparison; group start
indices come from ``np.flatnonzero``; envelope bboxes are
``np.minimum/maximum.reduceat`` over the contiguous group slices; page
text is one ``"".join`` over a pre-interleaved (separator, word) list
per page, where the separator between consecutive words is a pure
function of which key level changed (new block -> "\\n\\n", new
(par,line) -> "\\n", else " "); the nested hierarchy is built by
slicing each level's child list with ``np.searchsorted`` of the
parents' start indices — no per-word Python branching anywhere
(measured ~1.6x on the spans path vs the row-at-a-time loop this
replaces).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: grouping key of the hierarchy, in traversal order.
_KEY = ["doc", "page_number", "block_num", "par_num", "line_num"]


def assemble_pages(
    words: pd.DataFrame, emit_spans: bool = True
) -> tuple[dict[tuple[int, int], str], dict[tuple[int, int], list[dict]]]:
    """pandas-facing wrapper over :func:`assemble_pages_arrays` (the
    unit-test surface; the kernel calls the array form directly to skip
    pandas block consolidation — a dict-of-lists DataFrame vstacks all
    int columns into one 2D block, which alone cost ~40% of the kernel
    on profile).

    `words` columns: doc, page_number, block_num, par_num, line_num,
    text, left, top, width, height, conf — rows in arrival order.
    Returns (text_map, spans_map); pages with no non-empty words are
    absent from both (callers fill ""/[]).
    """
    return assemble_pages_arrays(
        words["doc"].to_numpy(),
        words["page_number"].to_numpy(),
        words["block_num"].to_numpy(),
        words["par_num"].to_numpy(),
        words["line_num"].to_numpy(),
        words["text"].tolist(),
        words["left"].to_numpy(),
        words["top"].to_numpy(),
        words["width"].to_numpy(),
        words["height"].to_numpy(),
        words["conf"].to_numpy(),
        emit_spans=emit_spans,
    )


def assemble_pages_arrays(
    doc_r,
    page_r,
    blk_r,
    par_r,
    line_r,
    text_r: list,
    left_r,
    top_r,
    width_r,
    height_r,
    conf_r,
    emit_spans: bool = True,
    as_tuples: bool = False,
) -> tuple[dict[tuple[int, int], str], dict[tuple[int, int], list]]:
    """Array-native fused boundary-index pass (raw arrival order in).

    Preparation replicates the contract: strip texts, DROP empty-text
    records, stable-sort by the hierarchy keys (np.lexsort is stable —
    reproduces the reference's ``sorted(keys)`` traversal,
    ocr_processor.py:157-160,231-237, while preserving arrival order
    within a line, :152,:226).

    ``as_tuples=True`` emits every hierarchy node as a TUPLE in the
    schema's field order (schema.BLOCK/PARAGRAPH/LINE/WORD/BBOX)
    instead of a dict — identical data, but pyarrow's struct conversion
    skips per-key lookups; the kernel uses this for the Arrow boundary
    while tests read the dict form.
    """
    stripped = [t.strip() for t in text_r]
    keep = np.fromiter(
        (t != "" for t in stripped), dtype=bool, count=len(stripped)
    )
    if not keep.any():
        return {}, {}
    doc_k = np.asarray(doc_r)[keep]
    page_k = np.asarray(page_r)[keep]
    blk_k = np.asarray(blk_r)[keep]
    par_k = np.asarray(par_r)[keep]
    line_k = np.asarray(line_r)[keep]
    texts_k = [t for t, k in zip(stripped, keep.tolist()) if k]

    # stable sort into traversal order (last key = primary for lexsort)
    order = np.lexsort((line_k, par_k, blk_k, page_k, doc_k))
    doc_np = doc_k[order]
    page_np = page_k[order]
    blk_np = blk_k[order]
    par_np = par_k[order]
    line_np = line_k[order]
    order_l = order.tolist()
    text_a = [texts_k[i] for i in order_l]
    n = len(text_a)

    # which key level changed vs the previous row (row 0 starts a page)
    new_page = np.ones(n, dtype=bool)
    new_page[1:] = (doc_np[1:] != doc_np[:-1]) | (page_np[1:] != page_np[:-1])
    new_block = new_page.copy()
    new_block[1:] |= blk_np[1:] != blk_np[:-1]
    new_par = new_block.copy()
    new_par[1:] |= par_np[1:] != par_np[:-1]
    new_line = new_par.copy()
    new_line[1:] |= line_np[1:] != line_np[:-1]

    # ---- canonical text: interleave separators with word texts, then
    # one join per page slice. Separator precedence matches the
    # reference: page start -> "" (nothing), new block -> "\n\n",
    # new line (incl. paragraph change) -> "\n", else " ".
    sep_code = np.where(
        new_page, 0, np.where(new_block, 1, np.where(new_line, 2, 3))
    ).tolist()
    _SEPS = ("", "\n\n", "\n", " ")
    interleaved: list = [None] * (2 * n)
    interleaved[0::2] = [_SEPS[c] for c in sep_code]
    interleaved[1::2] = text_a

    page_starts = np.flatnonzero(new_page)
    page_bounds = np.append(page_starts, n).tolist()
    doc_l = doc_np.tolist()
    page_l = page_np.tolist()

    text_map: dict[tuple[int, int], str] = {}
    page_keys = []
    for idx in range(len(page_starts)):
        s, e = page_bounds[idx], page_bounds[idx + 1]
        key = (doc_l[s], page_l[s])
        page_keys.append(key)
        text_map[key] = "".join(interleaved[2 * s : 2 * e])

    if not emit_spans:
        return text_map, {}

    # ---- spans hierarchy ------------------------------------------
    left_np = np.asarray(left_r)[keep][order]
    top_np = np.asarray(top_r)[keep][order]
    width_np = np.asarray(width_r)[keep][order]
    height_np = np.asarray(height_r)[keep][order]
    right_np = left_np + width_np
    bottom_np = top_np + height_np
    conf_np = np.maximum(np.asarray(conf_r)[keep][order], 0)  # clamp (:215)

    line_starts = np.flatnonzero(new_line)
    par_starts = np.flatnonzero(new_par)
    blk_starts = np.flatnonzero(new_block)

    def _bboxes(starts: np.ndarray) -> list:
        quads = zip(
            np.minimum.reduceat(left_np, starts).tolist(),
            np.minimum.reduceat(top_np, starts).tolist(),
            np.maximum.reduceat(right_np, starts).tolist(),
            np.maximum.reduceat(bottom_np, starts).tolist(),
        )
        if as_tuples:
            return list(quads)
        return [
            {"left": l, "top": t, "right": r, "bottom": b}
            for l, t, r, b in quads
        ]

    wl = left_np.tolist()
    wt = top_np.tolist()
    ww = width_np.tolist()
    wh = height_np.tolist()
    wc = conf_np.tolist()

    # lines: words are the contiguous word slice; text = " ".join
    line_bounds = np.append(line_starts, n).tolist()
    line_ids = line_np[line_starts].tolist()
    line_bbs = _bboxes(line_starts)
    lines_all = []
    if as_tuples:
        # struct-as-tuple form (field order == schema.WORD/LINE/...):
        # pyarrow converts tuples into structs without per-key hashing —
        # measurably cheaper than dicts on the 10^5-words-per-batch path
        word_tuples = list(zip(text_a, wl, wt, ww, wh, wc))
        for idx in range(len(line_starts)):
            s, e = line_bounds[idx], line_bounds[idx + 1]
            lines_all.append(
                (
                    line_ids[idx],
                    " ".join(text_a[s:e]),
                    line_bbs[idx],
                    word_tuples[s:e],
                )
            )
    else:
        for idx in range(len(line_starts)):
            s, e = line_bounds[idx], line_bounds[idx + 1]
            lines_all.append(
                {
                    "line_id": line_ids[idx],
                    "text": " ".join(text_a[s:e]),
                    "bbox": line_bbs[idx],
                    "words": [
                        {
                            "text": text_a[i],
                            "left": wl[i],
                            "top": wt[i],
                            "width": ww[i],
                            "height": wh[i],
                            "conf": wc[i],
                        }
                        for i in range(s, e)
                    ],
                }
            )

    # paragraphs group contiguous lines; blocks group contiguous
    # paragraphs; pages group contiguous blocks — each via searchsorted
    # of the parent's word-start indices into the child's.
    par_line_idx = np.searchsorted(line_starts, par_starts).tolist()
    par_line_idx.append(len(lines_all))
    par_ids = par_np[par_starts].tolist()
    par_bbs = _bboxes(par_starts)
    if as_tuples:
        pars_all = [
            (
                par_ids[idx],
                par_bbs[idx],
                lines_all[par_line_idx[idx] : par_line_idx[idx + 1]],
            )
            for idx in range(len(par_starts))
        ]
    else:
        pars_all = [
            {
                "par_id": par_ids[idx],
                "bbox": par_bbs[idx],
                "lines": lines_all[par_line_idx[idx] : par_line_idx[idx + 1]],
            }
            for idx in range(len(par_starts))
        ]

    blk_par_idx = np.searchsorted(par_starts, blk_starts).tolist()
    blk_par_idx.append(len(pars_all))
    blk_ids = blk_np[blk_starts].tolist()
    blk_bbs = _bboxes(blk_starts)
    if as_tuples:
        blocks_all = [
            (
                blk_ids[idx],
                blk_bbs[idx],
                pars_all[blk_par_idx[idx] : blk_par_idx[idx + 1]],
            )
            for idx in range(len(blk_starts))
        ]
    else:
        blocks_all = [
            {
                "block_id": blk_ids[idx],
                "bbox": blk_bbs[idx],
                "paragraphs": pars_all[blk_par_idx[idx] : blk_par_idx[idx + 1]],
            }
            for idx in range(len(blk_starts))
        ]

    page_blk_idx = np.searchsorted(blk_starts, page_starts).tolist()
    page_blk_idx.append(len(blocks_all))
    spans_map = {
        page_keys[idx]: blocks_all[page_blk_idx[idx] : page_blk_idx[idx + 1]]
        for idx in range(len(page_starts))
    }
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


def page_confidence_arrays(
    doc_r, page_r, conf_r
) -> list[tuple[int, int, float]]:
    """Per-(doc, page) mean confidence (ocr_processor.py:87-93), array
    form -> [(doc, page, mean)] sorted by (doc, page).

    Inputs are the RAW records (before the empty-text filter): the
    reference averages over every record with conf >= 0, including
    empty-text ones; structural rows carry conf == -1 and are excluded.
    Missing (doc, page) pairs mean "no conf>=0 records" -> the caller
    fills 0.0.

    The int cast happens BEFORE the >= 0 filter: the reference includes
    any record where int(conf) >= 0, so a fractional conf in (-1, 0)
    truncates to 0 and IS counted (numpy astype truncates toward zero,
    same as Python int()).
    """
    conf = np.asarray(conf_r).astype(np.int64)
    m = conf >= 0
    if not m.any():
        return []
    d = np.asarray(doc_r)[m]
    p = np.asarray(page_r)[m]
    c = conf[m]
    order = np.lexsort((p, d))
    d, p, c = d[order], p[order], c[order]
    newg = np.ones(len(d), dtype=bool)
    newg[1:] = (d[1:] != d[:-1]) | (p[1:] != p[:-1])
    starts = np.flatnonzero(newg)
    sums = np.add.reduceat(c, starts)
    counts = np.diff(np.append(starts, len(d)))
    return list(
        zip(
            d[starts].tolist(),
            p[starts].tolist(),
            (sums / counts).tolist(),
        )
    )


def page_confidence(records: pd.DataFrame) -> pd.DataFrame:
    """pandas wrapper over :func:`page_confidence_arrays` (test
    surface; the kernel calls the array form)."""
    rows = page_confidence_arrays(
        records["doc"].to_numpy(),
        records["page_number"].to_numpy(),
        records["conf"].to_numpy(),
    )
    if not rows:
        return pd.DataFrame({"doc": [], "page_number": [], "confidence": []})
    return pd.DataFrame(rows, columns=["doc", "page_number", "confidence"])


def word_counts_arrays(doc_r, text_r: list) -> dict[int, int]:
    """Per-doc count of non-empty records (lineage counter, mirrors the
    reference's total_words log, ocr_processor.py:465-469) -> {doc: n}."""
    keep = np.fromiter(
        (t.strip() != "" for t in text_r), dtype=bool, count=len(text_r)
    )
    if not keep.any():
        return {}
    uniq, counts = np.unique(np.asarray(doc_r)[keep], return_counts=True)
    return dict(zip(uniq.tolist(), counts.tolist()))


def word_counts(words: pd.DataFrame) -> pd.DataFrame:
    """pandas wrapper over :func:`word_counts_arrays` (test surface)."""
    d = word_counts_arrays(words["doc"].to_numpy(), words["text"].tolist())
    if not d:
        return pd.DataFrame({"doc": [], "n_words": []})
    return pd.DataFrame(
        sorted(d.items()), columns=["doc", "n_words"]
    ).astype({"n_words": "int64"})


def blocks_to_dicts(blocks: list) -> list[dict]:
    """Normalize the tuple-form hierarchy (as_tuples=True, schema field
    order) back to the dict form — test/debug surface; the Arrow
    boundary consumes tuples directly."""
    out = []
    for b in blocks:
        if isinstance(b, dict):
            out.append(b)
            continue
        blk_id, bbox, pars = b
        out.append(
            {
                "block_id": blk_id,
                "bbox": _bbox_dict(bbox),
                "paragraphs": [
                    {
                        "par_id": par_id,
                        "bbox": _bbox_dict(pbb),
                        "lines": [
                            {
                                "line_id": line_id,
                                "text": ltext,
                                "bbox": _bbox_dict(lbb),
                                "words": [
                                    {
                                        "text": t,
                                        "left": l,
                                        "top": tp,
                                        "width": wd,
                                        "height": hg,
                                        "conf": c,
                                    }
                                    for (t, l, tp, wd, hg, c) in words
                                ],
                            }
                            for (line_id, ltext, lbb, words) in lines
                        ],
                    }
                    for (par_id, pbb, lines) in pars
                ],
            }
        )
    return out


def _bbox_dict(bb) -> dict:
    if isinstance(bb, dict):
        return bb
    left, top, right, bottom = bb
    return {"left": left, "top": top, "right": right, "bottom": bottom}
