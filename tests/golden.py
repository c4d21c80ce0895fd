"""Golden-fixture builder: expected outputs from generator truth.

Derives the expected extraction result for each synthetic document by an
INDEPENDENT path: generator truth (which blocks are content / the raw
word records) -> the test-side oracle transcription of the reference
algorithms (tests/oracle.py) -> expected text/confidence/spans. Shares no
code with the engine's kernel; rules duplicated here on purpose (e.g. the
12-word line wrap, the corrected-size formula) so a bug in the engine
can't cancel out in the goldens.
"""

from __future__ import annotations

import math

from tesseract_ocr_service_spark.sources import gen

from . import oracle

WRAP = 12  # engine contract: max words per rendered HTML line
SKEW_THRESHOLD = 0.3


def _html_expected(truth: dict) -> dict:
    block_texts = []
    records = []  # oracle records for spans
    global_line = 0
    for bi, tokens in enumerate(truth["content"], start=1):
        lines = [tokens[i : i + WRAP] for i in range(0, len(tokens), WRAP)]
        block_texts.append("\n".join(" ".join(ln) for ln in lines))
        for li, ln in enumerate(lines, start=1):
            global_line += 1
            for pos, tok in enumerate(ln):
                records.append(
                    dict(
                        block_num=bi,
                        par_num=1,
                        line_num=li,
                        text=tok,
                        left=pos * 80,
                        top=(global_line - 1) * 24,
                        width=len(tok) * 8,
                        height=18,
                        conf=95,
                    )
                )
    text = "\n\n".join(block_texts)
    n_words = sum(len(t) for t in truth["content"])
    return {
        "status": "ok",
        "canonical_text": text,
        "avg_confidence": 95.0 if n_words else 0.0,
        "total_pages": 1,
        "n_blocks_kept": len(truth["content"]),
        "n_blocks_dropped": truth["n_boiler"],
        "n_words": n_words,
        "pages": [
            {
                "page_number": 1,
                "text": text,
                "confidence": 95.0 if n_words else 0.0,
                "rotation_applied": 0,
                "deskew_angle": 0.0,
                "width": 960,
                "height": max(global_line * 24, 24),
            }
        ],
        "spans_blocks": {1: oracle.hierarchy(records)},
    }


def _corrected_size(w, h, rotate, angle):
    if rotate in (90, 270):
        w, h = h, w
    if abs(angle) > SKEW_THRESHOLD:
        a = math.radians(abs(angle))
        w, h = (
            int(round(w * math.cos(a) + h * math.sin(a))),
            int(round(w * math.sin(a) + h * math.cos(a))),
        )
    return w, h


def _pdf_expected(truth: dict) -> dict:
    pages_out = []
    spans_blocks = {}
    page_texts = []
    total_words = 0
    for p in sorted(truth["pages"], key=lambda p: p["page_number"]):
        recs = [
            dict(
                block_num=b, par_num=par, line_num=ln, text=t,
                left=l, top=tp, width=wd, height=hg, conf=c,
            )
            for (b, par, ln, wn, t, l, tp, wd, hg, c) in p["words"]
        ]
        w, h = _corrected_size(
            p["width"], p["height"], p["rotate"], p["skew_angle"]
        )
        if p["poison"]:
            text, conf, blocks = "", 0.0, []
        else:
            text = oracle.assemble_text(recs)
            conf = oracle.page_confidence(recs)
            blocks = oracle.hierarchy(recs)
            total_words += sum(1 for r in recs if r["text"].strip())
        pages_out.append(
            {
                "page_number": p["page_number"],
                "text": text,
                "confidence": conf,
                "rotation_applied": p["rotate"],
                "deskew_angle": p["skew_angle"],
                "width": w,
                "height": h,
            }
        )
        spans_blocks[p["page_number"]] = blocks
        page_texts.append(text)
    return {
        "status": "ok",
        "canonical_text": "\n\n".join(page_texts),
        "avg_confidence": (
            sum(p["confidence"] for p in pages_out) / len(pages_out)
            if pages_out
            else 0.0
        ),
        "total_pages": len(pages_out),
        "n_words": total_words,
        "pages": pages_out,
        "spans_blocks": spans_blocks,
    }


def expected(doc_id: int, seed: int = 42) -> dict:
    """Expected extraction output for one synthetic document."""
    t = gen.truth(doc_id, seed)
    kind = t["kind"]
    if kind == "garbage":
        return {"status": "rejected", "canonical_text": "", "total_pages": 0}
    if kind == "pdf_empty":
        return {"status": "empty", "canonical_text": "", "total_pages": 0}
    if kind == "pdf_poison_doc":
        return {"status": "error", "canonical_text": "", "total_pages": 0}
    if kind == "html":
        return _html_expected(t)
    return _pdf_expected(t)
