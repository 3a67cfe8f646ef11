"""html -> text extraction stage.

The reference has no extraction (it consumes pre-hashed keys); the engine's
north star adds the per-row invariant "byte-identical extracted text per url"
(BASELINE.json input_hint). The extractor inverts the fixed markup produced by
sources/webpages.py: strip head/nav/footer chrome, restore paragraph and line
breaks, unescape entities. Pure pyarrow.compute — vectorized, stateless,
parallelism-safe at any width.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_BODY_OPEN = "<article><p>"
_BODY_CLOSE = "</p></article>"


def extract_text(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Extract the article text from a binary html column, byte-identical to
    the original text for pages produced by synthesize_webpages."""
    s = pc.cast(html, pa.string())
    # slice out the article body: vectorized RE2 with DOTALL; rows without
    # the markers fall back to the raw string
    groups = pc.extract_regex(s, r"(?s)<article><p>(?P<body>.*)</p></article>")
    body = pc.if_else(pc.is_valid(groups), pc.struct_field(groups, "body"), s)
    # restore line structure, then unescape (reverse order of synthesis)
    body = pc.replace_substring(body, "</p><p>", "\n\n")
    body = pc.replace_substring(body, "<br/>", "\n")
    body = pc.replace_substring(body, "&lt;", "<")
    body = pc.replace_substring(body, "&gt;", ">")
    body = pc.replace_substring(body, "&amp;", "&")
    return body


def extract_stage(batch: pa.Table) -> pa.Table:
    """Web-page batch -> adds `text_extracted`; drops the wide html column.

    Dropping html immediately keeps downstream blocks narrow (SURVEY.md §7.4:
    ~100 KB html rows must not travel past this stage).
    """
    out = batch.append_column("text_extracted", extract_text(batch["html"]))
    return out.drop_columns(["html"])


def verify_extract_stage(batch: pa.Table) -> pa.Table:
    """extract + per-row invariant check: extracted == text, byte-for-byte."""
    extracted = extract_text(batch["html"])
    ok = pc.equal(extracted, batch["text"])
    bad = batch.filter(pc.invert(pc.fill_null(ok, False)))
    if bad.num_rows:
        raise AssertionError(
            f"extract invariant violated for {bad.num_rows} rows, "
            f"first url={bad['url'][0].as_py()!r}")
    out = batch.append_column("text_extracted", extracted)
    return out.drop_columns(["html"])
