"""Property-based contract tests (hypothesis): the vectorized assembly
must agree with the independent oracle on arbitrary word tables."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tesseract_ocr_service_spark.functions import assembly

from . import oracle

TEXTS = st.one_of(
    st.just(""),
    st.just("   "),
    st.text(
        alphabet=st.characters(
            whitelist_categories=["Lu", "Ll", "Nd"],
            whitelist_characters="шщ中désolé&<>-",
        ),
        min_size=0,
        max_size=12,
    ),
)

RECORDS = st.lists(
    st.fixed_dictionaries(
        {
            "block_num": st.integers(0, 4),
            "par_num": st.integers(0, 3),
            "line_num": st.integers(0, 4),
            "text": TEXTS,
            "left": st.integers(0, 2000),
            "top": st.integers(0, 2000),
            "width": st.integers(0, 300),
            "height": st.integers(0, 80),
            "conf": st.integers(-1, 100),
        }
    ),
    min_size=0,
    max_size=120,
)


def _df(records: list[dict]) -> pd.DataFrame:
    return pd.DataFrame(
        [
            (
                0,
                1,
                r["block_num"],
                r["par_num"],
                r["line_num"],
                i,
                r["text"],
                r["left"],
                r["top"],
                r["width"],
                r["height"],
                r["conf"],
            )
            for i, r in enumerate(records)
        ],
        columns=[
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
        ],
    )


@given(RECORDS)
@settings(max_examples=150, deadline=None)
def test_assembly_matches_oracle(records):
    texts, spans = assembly.assemble_pages(_df(records), emit_spans=True)
    expected_text = oracle.assemble_text(records)
    got_text = texts.get((0, 1), "")
    assert got_text == expected_text
    assert got_text.encode("utf-8") == expected_text.encode("utf-8")
    assert spans.get((0, 1), []) == oracle.hierarchy(records)


@given(RECORDS)
@settings(max_examples=60, deadline=None)
def test_confidence_matches_oracle(records):
    out = assembly.page_confidence(_df(records))
    got = float(out["confidence"].iloc[0]) if len(out) else 0.0
    assert abs(got - oracle.page_confidence(records)) < 1e-9
