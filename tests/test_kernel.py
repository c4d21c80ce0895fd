"""Kernel tests: routing, HTML boilerplate rules, PDF path semantics."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tesseract_ocr_service_spark.config import ExtractConfig
from tesseract_ocr_service_spark.functions import assembly, htmlx, kernel, pdfstream

from . import oracle

CFG = ExtractConfig()


def run(payloads: list[bytes | None], cfg: ExtractConfig = CFG) -> pd.DataFrame:
    batch = pd.DataFrame(
        {
            "url": [f"https://t.example/{i}" for i in range(len(payloads))],
            "warc_ts": pd.Timestamp("2026-01-05"),
            "html": payloads,
            "lang": "eng",
        }
    )
    return kernel.extract_batch(batch, cfg)


def one(payload: bytes, cfg: ExtractConfig = CFG) -> pd.Series:
    return run([payload], cfg).iloc[0]


# ------------------------------------------------------------- routing


def test_routing_and_rejection():
    out = run(
        [
            None,
            b"",
            b"\x89PNG garbage",
            b"  <html><body><p>three word block</p></body></html>",
            pdfstream.encode([]),
        ]
    )
    assert list(out["status"]) == [
        "rejected",
        "rejected",
        "rejected",
        "ok",
        "empty",
    ]
    assert out.loc[2, "error"] == "invalid_payload"
    assert out.loc[4, "error"] == "no pages to process"
    # rejected rows keep the document-shaped empty outputs
    assert out.loc[0, "total_pages"] == 0
    assert out.loc[0, "canonical_text"] == ""
    assert out.loc[0, "avg_confidence"] == 0.0


def test_oversize_rejected():
    cfg = ExtractConfig(max_file_size_mb=1)
    big = b"<html>" + b"x" * (1024 * 1024 + 1)
    assert one(big, cfg)["error"] == "file_too_large"
    # exactly at the limit passes the gate (reference: > max_size, main.py:374)
    at_limit = (b"<p>at the limit ok</p>" + b" " * (1024 * 1024))[: 1024 * 1024]
    assert one(at_limit, cfg)["status"] == "ok"


# ------------------------------------------------------------ html path


def H(body: str) -> bytes:
    return f"<html><body>{body}</body></html>".encode("utf-8")


def test_html_boilerplate_rules():
    row = one(
        H(
            "<nav>home <a href='/'>about</a> contact</nav>"
            "<h1>Title Here</h1>"
            "<p>main content body with several meaningful words</p>"
            '<div><a href="a">one</a> <a href="b">two</a> word</div>'  # link dens 2/3
            "<p>no</p>"  # < 3 words -> dropped
            "<footer>copyright 2026</footer>"
            "<script>var x = 'dropped always';</script>"
        )
    )
    assert row["status"] == "ok"
    assert (
        row["canonical_text"]
        == "Title Here\n\nmain content body with several meaningful words"
    )
    assert row["n_blocks_kept"] == 2
    assert row["n_blocks_dropped"] == 4
    assert row["avg_confidence"] == pytest.approx(95.0)


def test_html_line_wrap_every_12_words():
    words = [f"w{i:02d}" for i in range(30)]
    row = one(H("<p>" + " ".join(words) + "</p>"))
    expected = "\n".join(
        " ".join(words[i : i + 12]) for i in range(0, 30, 12)
    )
    assert row["canonical_text"] == expected
    page = row["pages"][0]
    assert page["width"] == htmlx.PAGE_W
    assert page["height"] == 3 * htmlx.LINE_H  # 3 lines


def test_html_entities_roundtrip():
    raw = 'x < y & "z" > w\'s &clause'
    row = one(H("<p>" + htmlx.escape(raw) + "</p>"))
    assert row["canonical_text"] == raw


def test_html_unicode_content():
    row = one(H("<p>Привет мир 中文 désolé test</p>"))
    assert row["canonical_text"].encode("utf-8") == (
        "Привет мир 中文 désolé test".encode("utf-8")
    )


def test_html_spans_geometry():
    row = one(H("<p>alpha beta gamma</p>"))
    blocks = assembly.blocks_to_dicts(row["spans"][0]["blocks"])
    assert len(blocks) == 1
    words = blocks[0]["paragraphs"][0]["lines"][0]["words"]
    assert [w["text"] for w in words] == ["alpha", "beta", "gamma"]
    assert words[1]["left"] == htmlx.COL_W
    assert words[0]["width"] == 5 * htmlx.CHAR_W
    assert all(w["conf"] == CFG.html_word_conf for w in words)


# ------------------------------------------------------------- pdf path


def P(words, page=1, w=1000, h=1400, rotate=0, skew=0.0, poison=False):
    return {
        "page_number": page,
        "width": w,
        "height": h,
        "rotate": rotate,
        "skew_angle": skew,
        "poison": poison,
        "words": words,
    }


W = lambda b, p, ln, wn, t, conf=77: (b, p, ln, wn, t, 10 * wn, 20 * ln, 8 * len(t), 18, conf)


def test_pdf_assembly_matches_oracle():
    words = [
        W(1, 1, 1, 1, "Hello"),
        W(1, 1, 1, 2, "world"),
        W(1, 1, 2, 1, "line2"),
        W(2, 1, 1, 1, "block2", conf=-1),
        W(1, 2, 1, 1, "par2"),
        W(1, 1, 1, 3, "  "),  # empty -> skipped in text, absent from conf<0? conf=77 counts
    ]
    row = one(pdfstream.encode([P(words)]))
    recs = [
        dict(
            block_num=b, par_num=p, line_num=ln, text=t,
            left=l, top=tp, width=wd, height=hg, conf=c,
        )
        for (b, p, ln, wn, t, l, tp, wd, hg, c) in words
    ]
    assert row["canonical_text"] == oracle.assemble_text(recs)
    assert row["avg_confidence"] == pytest.approx(oracle.page_confidence(recs))
    assert assembly.blocks_to_dicts(row["spans"][0]["blocks"]) == oracle.hierarchy(recs)
    assert row["status"] == "ok"


def test_pdf_multipage_sort_and_doc_text():
    doc = pdfstream.encode(
        [
            P([W(1, 1, 1, 1, "pageTWO")], page=2),
            P([W(1, 1, 1, 1, "pageONE")], page=1),
        ]
    )
    row = one(doc)
    assert [p["page_number"] for p in row["pages"]] == [1, 2]  # sort :507
    assert row["canonical_text"] == "pageONE\n\npageTWO"
    assert row["total_pages"] == 2


def test_page_selection_priority():
    doc = pdfstream.encode([P([W(1, 1, 1, 1, f"p{i}")], page=i) for i in (1, 2, 3, 4, 5)])
    # explicit list wins over range (ocr/schemas.py:26-29)
    cfg = ExtractConfig(pages=(1, 4), page_start=2, page_end=3)
    row = one(doc, cfg)
    assert [p["page_number"] for p in row["pages"]] == [1, 4]
    # range when no list
    cfg = ExtractConfig(page_start=2, page_end=3)
    assert [p["page_number"] for p in one(doc, cfg)["pages"]] == [2, 3]
    # open-ended range
    cfg = ExtractConfig(page_start=4)
    assert [p["page_number"] for p in one(doc, cfg)["pages"]] == [4, 5]
    cfg = ExtractConfig(page_end=2)
    assert [p["page_number"] for p in one(doc, cfg)["pages"]] == [1, 2]
    # selection that excludes everything -> empty status
    cfg = ExtractConfig(pages=(99,))
    assert one(doc, cfg)["status"] == "empty"


def test_rotation_bookkeeping_and_size_swap():
    doc = pdfstream.encode(
        [P([W(1, 1, 1, 1, "x")], rotate=90, w=1000, h=1400)]
    )
    page = one(doc)["pages"][0]
    assert page["rotation_applied"] == 90
    assert (page["width"], page["height"]) == (1400, 1000)


def test_deskew_threshold_strictly_greater():
    mk = lambda a: pdfstream.encode([P([W(1, 1, 1, 1, "x")], skew=a, w=1000, h=1000)])
    # at exactly 0.3 NOT applied (ocr_processor.py:443 strict >)
    page = one(mk(0.3))["pages"][0]
    assert page["deskew_angle"] == pytest.approx(0.3)  # reported raw (:500)
    assert (page["width"], page["height"]) == (1000, 1000)
    # above threshold: canvas expands
    page = one(mk(-2.0))["pages"][0]
    a = math.radians(2.0)
    exp = int(round(1000 * math.cos(a) + 1000 * math.sin(a)))
    assert (page["width"], page["height"]) == (exp, exp)
    assert page["deskew_angle"] == pytest.approx(-2.0)


def test_page_failure_isolation():
    doc = pdfstream.encode(
        [
            P([W(1, 1, 1, 1, "good")], page=1),
            P([W(1, 1, 1, 1, "never")], page=2, poison=True),
        ]
    )
    row = one(doc)
    assert row["status"] == "ok"
    p1, p2 = row["pages"]
    assert p1["text"] == "good"
    assert p2["text"] == "" and p2["confidence"] == 0.0
    assert row["spans"][1]["blocks"] == []
    # avg over pages INCLUDES the failed page's 0.0 (ocr_processor.py:510)
    assert row["avg_confidence"] == pytest.approx(77.0 / 2)


def test_doc_level_poison_is_error_row():
    doc = pdfstream.encode([P([W(1, 1, 1, 1, "x")])], poison_doc=True)
    row = one(doc)
    assert row["status"] == "error"
    assert row["total_pages"] == 0 and row["pages"] == []
    assert pdfstream.POISON_DOC in row["error"]


def test_block_counters_pdf():
    words = [W(1, 1, 1, 1, "a"), W(3, 1, 1, 1, "b"), W(5, 1, 1, 1, "  ")]
    row = one(pdfstream.encode([P(words)]))
    assert row["n_blocks_kept"] == 2  # block 5 has only empty text
    assert row["n_words"] == 2
    assert row["n_chars"] == len("a\n\nb")


def test_batch_mixed_kinds_alignment():
    """Outputs stay row-aligned when kinds interleave in one batch."""
    out = run(
        [
            H("<p>first html doc</p>"),
            pdfstream.encode([P([W(1, 1, 1, 1, "pdfdoc")])]),
            b"junk",
            H("<p>second html doc</p>"),
        ]
    )
    assert list(out["canonical_text"]) == [
        "first html doc",
        "pdfdoc",
        "",
        "second html doc",
    ]
    assert list(out["status"]) == ["ok", "ok", "rejected", "ok"]


# ------------------------------------------------- per-row config columns


def _three_page_doc() -> bytes:
    return pdfstream.encode(
        [
            {
                "page_number": p,
                "width": 100,
                "height": 200,
                "words": [(1, 1, 1, 1, f"p{p}", 0, 0, 10, 10, 90)],
            }
            for p in (1, 2, 3)
        ]
    )


def test_per_row_page_selection_overrides_config():
    """Optional pages/page_start/page_end columns override ExtractConfig
    per document; NULL falls back (ocr/main.py:104-131 per-request
    OCRConfig)."""
    doc = _three_page_doc()
    html = b"<html><body><p>one two three four</p></body></html>"
    batch = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(5)],
            "warc_ts": pd.Timestamp("2026-01-05"),
            "html": [doc, doc, doc, doc, html],
            "lang": "eng",
            # explicit list wins over the row's own range (priority rule)
            "pages": [[2], None, None, [1, 3], None],
            "page_start": [1.0, 2.0, None, 1.0, 2.0],
            "page_end": [1.0, None, 2.0, None, float("nan")],
        }
    )
    out = kernel.extract_batch(batch, ExtractConfig())
    assert [p["page_number"] for p in out.loc[0, "pages"]] == [2]
    assert [p["page_number"] for p in out.loc[1, "pages"]] == [2, 3]
    assert [p["page_number"] for p in out.loc[2, "pages"]] == [1, 2]
    assert [p["page_number"] for p in out.loc[3, "pages"]] == [1, 3]
    # html doc: page_start=2 excludes the synthetic page 1 -> empty
    assert out.loc[4, "status"] == "empty"


def test_per_row_null_falls_back_to_job_config():
    doc = _three_page_doc()
    batch = pd.DataFrame(
        {
            "url": ["u0"],
            "warc_ts": pd.Timestamp("2026-01-05"),
            "html": [doc],
            "lang": "eng",
            "pages": [None],
            "page_start": [None],
            "page_end": [None],
        }
    )
    out = kernel.extract_batch(batch, ExtractConfig(page_end=2))
    assert [p["page_number"] for p in out.loc[0, "pages"]] == [1, 2]


def test_flow_template_fallback_matches_cached_path():
    """Blocks over the 4096-token cache threshold take the uncached
    branch; geometry must be identical to the cached formula."""
    from tesseract_ocr_service_spark.config import ExtractConfig
    from tesseract_ocr_service_spark.functions import htmlx

    n = 5000
    html = "<html><body><p>" + " ".join(
        f"w{i}" for i in range(n)
    ) + "</p></body></html>"
    cfg = ExtractConfig()
    cols, kept, dropped, page_h = htmlx.extract_words_columnar(html, cfg)
    blk, par, line, word, text, left, top, wid, hgt, conf = cols
    assert kept == 1 and dropped == 0 and len(text) == n
    wrap = cfg.line_wrap_words
    n_lines = (n + wrap - 1) // wrap
    assert line[-1] == n_lines
    assert word[:wrap] == list(range(1, wrap + 1))
    assert left[wrap] == 0 and top[wrap] == htmlx.LINE_H
    assert top[-1] == (n_lines - 1) * htmlx.LINE_H
    assert page_h == n_lines * htmlx.LINE_H
    # same values as the cached small-block path, block by block
    small = "<html><body>" + "".join(
        "<p>" + " ".join(f"w{i}" for i in range(13)) + "</p>"
        for _ in range(2)
    ) + "</body></html>"
    cols2, k2, _, _ = htmlx.extract_words_columnar(small, cfg)
    assert k2 == 2
    assert cols2[2][:13] == [1] * 12 + [2]  # line wraps at 12


# -------------------------------------------------- content-type gate


def test_content_type_gate_batch_level():
    """The reference's declared-type gate (ocr/main.py:354-363) rides
    into the kernel as a PRE-COMPUTED boolean (_ct_reject): True
    rejects with invalid_file_type BEFORE size/magic (a gated row's
    payload is never sniffed); False/NULL/absent column = gate off."""
    html = b"<html><body><p>three word block</p></body></html>"
    batch = pd.DataFrame(
        {
            "url": ["a", "b", "c"],
            "warc_ts": pd.Timestamp("2026-01-05"),
            "html": [html, html, b"\x89PNG garbage"],
            "lang": "eng",
            "_ct_reject": [True, False, None],
        }
    )
    out = kernel.extract_batch(batch, CFG)
    assert list(out["status"]) == ["rejected", "ok", "rejected"]
    assert out.loc[0, "error"] == "invalid_file_type"
    assert out.loc[2, "error"] == "invalid_payload"  # NULL verdict: off
    # without the column, nothing changes (existing suite pins that)
    out2 = run([html])
    assert out2.loc[0, "status"] == "ok"


def test_content_type_gate_e2e(spark):
    """extract() computes the verdict JVM-side from a `content_type`
    column (content_type_ok: parameter-strip + case-fold + allow-list,
    NULL/empty tolerated) — one implementation of the gate semantics,
    checked end to end through the fused kernel."""
    from pyspark.sql import functions as F

    from tesseract_ocr_service_spark.operators import extract as X

    html = b"<html><body><p>three word block here</p></body></html>"
    rows = [
        ("u_html", html, "Text/HTML; charset=UTF-8"),
        ("u_png", html, "image/png"),
        ("u_none", html, None),
        ("u_empty", html, ""),
        ("u_octet", html, "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        rows, "url string, html binary, content_type string"
    ).select(
        "url",
        F.lit("2026-01-05 00:00:00").cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("eng").alias("lang"),
        "content_type",
    )
    got = {
        r["url"]: (r["status"], r["error"])
        for r in X.extract(df).select("url", "status", "error").collect()
    }
    assert got["u_png"] == ("rejected", "invalid_file_type")
    for u in ("u_html", "u_none", "u_empty", "u_octet"):
        assert got[u][0] == "ok", (u, got[u])
    # allowed_content_types=None disables the gate entirely
    off = X.extract(df, ExtractConfig(allowed_content_types=None))
    assert all(r["status"] == "ok" for r in off.select("status").collect())
