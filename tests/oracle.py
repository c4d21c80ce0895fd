"""Independent pure-Python oracle of the reference extraction contract.

This module intentionally mirrors the reference's *algorithms*
(`/root/reference/ocr/services/ocr_processor.py`) on plain dicts/lists —
dict-of-dicts grouping, sorted-key traversal, per-element loops — and
shares NO code with the engine's vectorized implementation
(`tesseract_ocr_service_spark.functions.assembly`). Tests assert the two
agree byte-for-byte. SURVEY.md §5 "oracle module".

A record is a dict with keys: block_num, par_num, line_num, text, left,
top, width, height, conf (the image_to_data columnar dict keys used at
ocr_processor.py:72-77, one dict per index here).
"""

from __future__ import annotations


def assemble_text(records: list[dict]) -> str:
    """Transcription of _assemble_text_from_data (ocr_processor.py:116-168)."""
    blocks: dict = {}
    for rec in records:
        word = rec["text"].strip()
        if not word:
            continue
        b, p, ln = rec["block_num"], rec["par_num"], rec["line_num"]
        blocks.setdefault(b, {}).setdefault(p, {}).setdefault(ln, []).append(word)

    result_blocks = []
    for b in sorted(blocks):
        block_lines = []
        for p in sorted(blocks[b]):
            for ln in sorted(blocks[b][p]):
                block_lines.append(" ".join(blocks[b][p][ln]))
        result_blocks.append("\n".join(block_lines))
    return "\n\n".join(result_blocks)


def page_confidence(records: list[dict]) -> float:
    """Transcription of the confidence mean (ocr_processor.py:87-93):
    ALL records (even empty-text) with conf >= 0."""
    confs = [
        int(r["conf"])
        for r in records
        if isinstance(r["conf"], (int, float)) and int(r["conf"]) >= 0
    ]
    return sum(confs) / len(confs) if confs else 0.0


def _bbox(words: list[dict]) -> dict:
    """ocr_processor.py:283-301."""
    if not words:
        return {"left": 0, "top": 0, "right": 0, "bottom": 0}
    return {
        "left": min(w["left"] for w in words),
        "top": min(w["top"] for w in words),
        "right": max(w["left"] + w["width"] for w in words),
        "bottom": max(w["top"] + w["height"] for w in words),
    }


def _bbox_of(bboxes: list[dict]) -> dict:
    """ocr_processor.py:304-322."""
    if not bboxes:
        return {"left": 0, "top": 0, "right": 0, "bottom": 0}
    return {
        "left": min(b["left"] for b in bboxes),
        "top": min(b["top"] for b in bboxes),
        "right": max(b["right"] for b in bboxes),
        "bottom": max(b["bottom"] for b in bboxes),
    }


def hierarchy(records: list[dict]) -> list[dict]:
    """Transcription of _extract_coordinates_from_data
    (ocr_processor.py:171-280) -> list of block structs
    (schema.BLOCK-shaped dicts)."""
    data: dict = {}
    for rec in records:
        word_text = rec["text"].strip()
        if not word_text:
            continue
        word = {
            "text": word_text,
            "left": rec["left"],
            "top": rec["top"],
            "width": rec["width"],
            "height": rec["height"],
            "conf": int(rec["conf"]) if rec["conf"] >= 0 else 0,
        }
        b, p, ln = rec["block_num"], rec["par_num"], rec["line_num"]
        data.setdefault(b, {}).setdefault(p, {}).setdefault(ln, []).append(word)

    blocks = []
    for b in sorted(data):
        paragraphs = []
        for p in sorted(data[b]):
            lines = []
            for ln in sorted(data[b][p]):
                words = data[b][p][ln]
                lines.append(
                    {
                        "line_id": ln,
                        "text": " ".join(w["text"] for w in words),
                        "bbox": _bbox(words),
                        "words": words,
                    }
                )
            paragraphs.append(
                {
                    "par_id": p,
                    "bbox": _bbox_of([l["bbox"] for l in lines]),
                    "lines": lines,
                }
            )
        blocks.append(
            {
                "block_id": b,
                "bbox": _bbox_of([p["bbox"] for p in paragraphs]),
                "paragraphs": paragraphs,
            }
        )
    return blocks
