"""Web-page synthesis + extract invariant (BASELINE.json input_hint:
byte-identical extracted text per url)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from libfilter_ray.sources.webpages import WEBPAGE_SCHEMA, synthesize_webpages
from libfilter_ray.stages.extract import extract_text, verify_extract_stage

from conftest import SF_DIR


def _docs_batch(n=200):
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    return t.slice(0, n)


def test_schema_matches_input_hint():
    pages = synthesize_webpages(_docs_batch())
    assert pages.schema == WEBPAGE_SCHEMA


def test_extract_byte_identical_on_testdata():
    pages = synthesize_webpages(_docs_batch(500))
    extracted = extract_text(pages["html"])
    assert extracted.to_pylist() == pages["text"].to_pylist()


def test_extract_handles_tricky_text():
    tricky = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array([
            "a & b < c > d",                      # entities
            "line1\nline2\n\npara2",              # newlines + paragraph
            "", "&amp; already-escaped <p>x</p>",  # empty + markup-looking
            "\n\n\n",                              # bare newlines
        ]),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["src0"] * 5),
    })
    pages = synthesize_webpages(tricky)
    assert extract_text(pages["html"]).to_pylist() == tricky["text"].to_pylist()


def test_verify_stage_raises_on_corruption():
    pages = synthesize_webpages(_docs_batch(10))
    bad = pages.set_column(
        pages.schema.get_field_index("text"),
        "text", pa.array(["CORRUPTED"] * 10))
    with pytest.raises(AssertionError, match="extract invariant"):
        verify_extract_stage(bad)


def test_determinism():
    a = synthesize_webpages(_docs_batch(100))
    b = synthesize_webpages(_docs_batch(100))
    assert a.equals(b)


def test_links_stage_edge_cases(ray_session):
    """href extraction: multiple anchors, zero anchors, binary html,
    adjacent attributes after the URL, empty URL."""
    import numpy as np
    import pyarrow as pa

    from libfilter_ray.stages.extract import links_stage

    html = [
        '<a href="https://a/1">x</a> mid <a href="https://a/2">y</a>',
        "no links at all",
        '<a href="" class="z">empty</a>',
        '<a class="pre" href="https://b/3" target="_blank">w</a>',
        None,
    ]
    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(html))]),
        "html": pa.array([h.encode() if h is not None else None
                          for h in html], type=pa.large_binary()),
    })
    out = links_stage()(t)
    assert out["src"].to_pylist() == ["u0", "u0", "u2", "u3"]
    assert out["dst"].to_pylist() == ["https://a/1", "https://a/2", "",
                                      "https://b/3"]
