"""The fused extraction kernel: one Arrow batch in, one batch out.

Replaces the reference's whole per-document pipeline — split -> OSD ->
rotate -> deskew -> OCR -> assemble -> coordinates
(``ocr/services/ocr_processor.py:325-533``) — with a single pandas pass
over a batch of documents. Where the reference crosses a process
boundary five times per document (pickling full-resolution images into
ProcessPoolExecutor workers at :400-401,:425-426,:456-457), this kernel
crosses the JVM<->Python Arrow boundary once per *batch*; the three
stage barriers fuse away entirely.

Granularity note ("zero per-row Python", BASELINE.json input_hint): the
Spark plan contains no row-at-a-time Python UDF — only ``mapInPandas``
over Arrow batches. Inside the kernel, payload routing/parsing is O(1)
per *document* (the document is the row; parsing a payload is inherently
per-document), while all word-level work — sorting, grouping, text
assembly, bbox envelopes, confidence means — is columnar pandas/numpy
over the concatenated word table of the whole batch.

Failure semantics (never fail the Spark task):
- bad magic / oversize / null  -> status='rejected' (ocr/main.py:335-390)
- doc-level parse error/poison -> status='error', pages=[]
  (ocr_processor.py:535-542)
- zero pages after selection   -> status='empty' (ocr_processor.py:386-392)
- page-level poison            -> page kept with text='', confidence=0.0,
  blocks=[] (ocr_processor.py:95-105)
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from ..config import (
    STATUS_EMPTY,
    STATUS_ERROR,
    STATUS_OK,
    STATUS_REJECTED,
    ExtractConfig,
)
from . import assembly, htmlx, pdfstream

_REC_COLS = [
    "doc",
    "page_number",
    "block_num",
    "par_num",
    "line_num",
    "word_num",
    "text",
    "left",
    "top",
    "width",
    "height",
    "conf",
]

OUTPUT_COLUMNS = [
    "url",
    "warc_ts",
    "lang",
    "status",
    "error",
    "total_pages",
    "avg_confidence",
    "canonical_text",
    "pages",
    "spans",
    "n_blocks_kept",
    "n_blocks_dropped",
    "n_words",
    "n_chars",
]


def _route(
    payload: Any, max_bytes: int, ct_reject: bool = False
) -> tuple[str, str | None]:
    """-> (kind, reject_reason). kind in {'pdf','html','rejected'}.

    Mirrors the reference's validation order (ocr/main.py:335-390):
    declared Content-Type first (:354-363), then size, then magic. HTML
    (leading '<') is a new accepted payload kind per the north_star;
    anything else is rejected, as a status row rather than an HTTP
    400/413.

    ``ct_reject`` is the Content-Type gate's PRE-COMPUTED verdict: the
    normalization + allow-list decision is one JVM expression
    (operators.extract.content_type_ok) evaluated before the kernel and
    riding in as a boolean column, so exactly ONE implementation of the
    gate semantics exists and the kernel stays string-logic-free. Rows
    without a content_type column never set it (gate off — the
    reference likewise tolerates an absent declared type)."""
    if ct_reject:
        # reference: HTTP 400 invalid_file_type (ocr/main.py:357-363),
        # checked BEFORE the file is even read.
        return "rejected", "invalid_file_type"
    if payload is None or len(payload) == 0:
        return "rejected", "empty_payload"
    if len(payload) > max_bytes:
        return "rejected", "file_too_large"
    if payload.startswith(pdfstream.MAGIC):
        return "pdf", None
    # HTML detection contract: a UTF-8 BOM is stripped, then the first
    # non-whitespace byte within the first 256 bytes must be '<'. The
    # 256-byte cap is deliberate (documented contract): lstrip() on the
    # full payload would copy up to max_file_size bytes per document in
    # the kernel hot path, and real HTML with >256 bytes of leading
    # whitespace does not occur in crawl data.
    head = payload[:259]
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    if head.lstrip()[:1] == b"<":
        return "html", None
    return "rejected", "invalid_payload"


def _row_selections(
    batch: pd.DataFrame, cfg: ExtractConfig, n: int
) -> list[tuple]:
    """Per-document page selection: optional per-row columns ``pages``
    (array<int>), ``page_start``, ``page_end`` override the job-level
    config field-by-field (NULL falls back to the ExtractConfig value).

    This completes the reference's per-request OCRConfig contract
    (ocr/main.py:104-131; field semantics ocr/schemas.py:26-29) — the
    priority rule (explicit list > range > all) is applied downstream by
    pdfstream.select_pages on the resolved values.
    """
    sel = [(cfg.pages, cfg.page_start, cfg.page_end)] * n
    if not ({"pages", "page_start", "page_end"} & set(batch.columns)):
        return sel
    pl_col = batch["pages"].tolist() if "pages" in batch.columns else None
    ps_col = (
        batch["page_start"].tolist() if "page_start" in batch.columns else None
    )
    pe_col = (
        batch["page_end"].tolist() if "page_end" in batch.columns else None
    )

    def _i(v):  # Arrow nullable ints arrive as float NaN
        return None if v is None or v != v else int(v)

    out = []
    for d in range(n):
        pl = cfg.pages
        if pl_col is not None and pl_col[d] is not None:
            pl = tuple(int(x) for x in pl_col[d])
        ps = _i(ps_col[d]) if ps_col is not None else None
        if ps is None:
            ps = cfg.page_start
        pe = _i(pe_col[d]) if pe_col is not None else None
        if pe is None:
            pe = cfg.page_end
        out.append((pl, ps, pe))
    return out


def extract_batch(batch: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    """Extract one Arrow batch of pages rows -> one wide row per document.

    Input columns: url, warc_ts, html, lang (the noise column ``text`` is
    pruned before the kernel — column-pruning is part of the contract),
    plus the optional per-row config columns ``pages``/``page_start``/
    ``page_end`` (see :func:`_row_selections`).
    Output columns: :data:`OUTPUT_COLUMNS` (schema.EXTRACTED_SCHEMA).
    """
    n = len(batch)
    urls = batch["url"].tolist()
    payloads = batch["html"].tolist()
    selections = _row_selections(batch, cfg, n)
    # pre-computed Content-Type verdicts (see _route): absent column =
    # gate off for the whole batch. isinstance-guarded truthiness, not
    # bool(x) — a NULL boolean crosses Arrow as None/NaN/pd.NA and
    # must mean OFF (bool(nan) is True; pd.NA truthiness raises) —
    # and not `x is True`, which misses np.bool_ values riding an
    # object-dtype column from pandas-facing callers.
    ct_rej = (
        [
            isinstance(x, (bool, np.bool_)) and bool(x)
            for x in batch["_ct_reject"].tolist()
        ]
        if "_ct_reject" in batch.columns
        else None
    )

    # per-doc state -------------------------------------------------
    status = [STATUS_OK] * n
    error: list[str | None] = [None] * n
    # page meta: doc -> list of dicts (page_number, rotation_applied,
    # deskew_angle, width, height, failed)
    page_meta: list[list[dict]] = [[] for _ in range(n)]
    blocks_kept = [0] * n
    blocks_dropped = [0] * n

    # word-record accumulator — COLUMNAR (per-column python lists feed
    # pandas one typed array per column; object-row tuples cost a full
    # per-cell convert pass). Order of appends = arrival order.
    cols: dict[str, list] = {c: [] for c in _REC_COLS}
    _c_doc = cols["doc"]
    _c_page = cols["page_number"]
    _WORD_COLS = _REC_COLS[2:]  # block..conf, matching WORD_FIELDS order

    for d in range(n):
        kind, reason = _route(
            payloads[d],
            cfg.max_file_size_bytes,
            ct_rej is not None and ct_rej[d],
        )
        if kind == "rejected":
            status[d] = STATUS_REJECTED
            error[d] = reason
            continue

        sel_pages, sel_start, sel_end = selections[d]
        if kind == "html":
            # one synthetic page (page_number=1) per HTML document; page
            # selection applies uniformly to both payload kinds, so a
            # selection that excludes page 1 empties the document.
            if pdfstream.select_pages(
                [{"page_number": 1}], sel_pages, sel_start, sel_end
            ) == []:
                status[d] = STATUS_EMPTY
                error[d] = "no pages to process"
                continue
            try:
                html = payloads[d].decode("utf-8", errors="replace")
                wcols, kept, dropped, page_h = htmlx.extract_words_columnar(
                    html, cfg
                )
            except Exception as e:  # defensive: never fail the task
                status[d] = STATUS_ERROR
                error[d] = f"html_parse_error: {e}"
                continue
            blocks_kept[d] = kept
            blocks_dropped[d] = dropped
            page_meta[d].append(
                {
                    "page_number": 1,
                    "rotation_applied": 0,
                    "deskew_angle": 0.0,
                    "width": htmlx.PAGE_W,
                    "height": page_h,
                    "failed": False,
                }
            )
            nw = len(wcols[0])
            _c_doc.extend([d] * nw)
            _c_page.extend([1] * nw)
            for name, col in zip(_WORD_COLS, wcols):
                cols[name].extend(col)
            continue

        # pdf path ---------------------------------------------------
        try:
            pages = pdfstream.decode(payloads[d])
            pages = pdfstream.select_pages(
                pages, sel_pages, sel_start, sel_end
            )
        except pdfstream.DocumentParseError as e:
            status[d] = STATUS_ERROR
            error[d] = str(e)
            continue
        if not pages:
            # reference: success=False, "PDF не содержит страниц..."
            # (ocr_processor.py:386-392) — here a typed status instead.
            status[d] = STATUS_EMPTY
            error[d] = "no pages to process"
            continue

        doc_block_ids: set[tuple[int, int]] = set()
        for p in pages:
            rotate = int(p.get("rotate", 0))
            angle = float(p.get("skew_angle", 0.0))
            applied = abs(angle) > cfg.skew_threshold  # strict > (:443)
            w, h = pdfstream.corrected_size(
                p["width"], p["height"], rotate, angle, applied
            )
            meta = {
                "page_number": int(p["page_number"]),
                # rotation applied whenever rotate != 0, ignoring the dead
                # osd_confidence_threshold (SURVEY.md §4).
                "rotation_applied": rotate,
                # detected angle reported even when below threshold
                # (ocr_processor.py:500 reports skew_angles[] raw).
                "deskew_angle": angle,
                "width": w,
                "height": h,
                "failed": False,
            }
            try:
                words = pdfstream.page_word_records(p)
            except Exception:
                meta["failed"] = True  # empty text/conf/blocks, page kept
                page_meta[d].append(meta)
                continue
            page_meta[d].append(meta)
            pn = meta["page_number"]
            if words:
                wcols = list(zip(*words))  # row tuples -> columns, C-fast
                nw = len(words)
                _c_doc.extend([d] * nw)
                _c_page.extend([pn] * nw)
                for name, col in zip(_WORD_COLS, wcols):
                    cols[name].extend(col)
                for b, t in zip(wcols[0], wcols[4]):
                    if str(t).strip():
                        doc_block_ids.add((pn, int(b)))
        blocks_kept[d] = len(doc_block_ids)

    # ---- batch-wide columnar passes over the word table -------------
    # Arrays, not a pandas DataFrame: constructing a dict-of-lists
    # frame consolidates all int columns into one 2D block (vstack) —
    # profiled at ~40% of the whole kernel. The assembly contract
    # functions take the columns directly.
    text_map: dict[tuple[int, int], str] = {}
    spans_map: dict[tuple[int, int], list[dict]] = {}
    conf_map: dict[tuple[int, int], float] = {}
    nwords_map: dict[int, int] = {}
    if _c_doc:
        text_list = [str(t) for t in cols["text"]]
        text_map, spans_map = assembly.assemble_pages_arrays(
            _c_doc,
            _c_page,
            cols["block_num"],
            cols["par_num"],
            cols["line_num"],
            text_list,
            cols["left"],
            cols["top"],
            cols["width"],
            cols["height"],
            cols["conf"],
            emit_spans=cfg.emit_spans,
            as_tuples=True,  # structs in schema field order (Arrow-fast)
        )
        for doc, pn, c in assembly.page_confidence_arrays(
            _c_doc, _c_page, cols["conf"]
        ):
            conf_map[(int(doc), int(pn))] = float(c)
        nwords_map = {
            int(d): int(nw)
            for d, nw in assembly.word_counts_arrays(
                _c_doc, text_list
            ).items()
        }

    # ---- compose per-doc outputs ------------------------------------
    out_pages: list[list[dict]] = []
    out_spans: list[list[dict]] = []
    canonical: list[str] = []
    avg_conf: list[float] = []
    total_pages: list[int] = []
    n_chars: list[int] = []

    for d in range(n):
        metas = sorted(page_meta[d], key=lambda m: m["page_number"])  # :507
        pages_out = []
        spans_out = []
        page_texts = []
        for m in metas:
            key = (d, m["page_number"])
            failed = m["failed"]
            txt = "" if failed else text_map.get(key, "")
            conf = 0.0 if failed else conf_map.get(key, 0.0)
            pages_out.append(
                {
                    "page_number": m["page_number"],
                    "text": txt,
                    "confidence": conf,
                    "rotation_applied": m["rotation_applied"],
                    "deskew_angle": m["deskew_angle"],
                    "width": m["width"],
                    "height": m["height"],
                }
            )
            if cfg.emit_spans:
                spans_out.append(
                    {
                        "page_number": m["page_number"],
                        "width": m["width"],
                        "height": m["height"],
                        "blocks": [] if failed else spans_map.get(key, []),
                    }
                )
            page_texts.append(txt)
        out_pages.append(pages_out)
        out_spans.append(spans_out)
        # document text: pages joined "\n\n" (engine contract — the
        # reference returns per-page texts only; a single separator rule
        # makes the document-level column deterministic).
        canonical.append("\n\n".join(page_texts))
        avg_conf.append(
            sum(p["confidence"] for p in pages_out) / len(pages_out)
            if pages_out
            else 0.0  # ocr_processor.py:510
        )
        total_pages.append(len(pages_out))
        n_chars.append(sum(len(t) for t in page_texts))

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": batch["warc_ts"].values,
            "lang": batch["lang"].values,
            "status": status,
            "error": error,
            "total_pages": total_pages,
            "avg_confidence": avg_conf,
            "canonical_text": canonical,
            "pages": out_pages,
            "spans": out_spans,
            "n_blocks_kept": blocks_kept,
            "n_blocks_dropped": blocks_dropped,
            "n_words": [nwords_map.get(d, 0) for d in range(n)],
            "n_chars": n_chars,
        }
    )


def kernel_iter(
    batches: Iterable[pd.DataFrame],
    cfg: ExtractConfig,
    day_acc=None,
) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` entrypoint: lazily extract each Arrow batch.

    ``day_acc`` (optional Spark accumulator of dict[str, float], see
    ``plans.commit._DayMsParam``) collects kernel wall milliseconds
    attributed per warc_day: each batch's wall is split proportionally
    to its per-day row counts. Semantics are Spark's for accumulators
    in transformations — at-least-once under task retry — so the
    numbers are metrics, not an audit log."""
    import time as _time

    for batch in batches:
        if not len(batch):
            continue
        if day_acc is None:
            yield extract_batch(batch, cfg)
            continue
        t0 = _time.perf_counter()
        out = extract_batch(batch, cfg)
        ms = (_time.perf_counter() - t0) * 1000.0
        # count on the normalized datetime64 (vectorized), format only
        # the handful of UNIQUE day keys — per-row strftime is object-
        # dtype string work on the kernel hot path
        counts = batch["warc_ts"].dt.normalize().value_counts()
        total = int(counts.sum()) or 1
        day_acc.add(
            {str(d.date()): ms * int(c) / total for d, c in counts.items()}
        )
        yield out
