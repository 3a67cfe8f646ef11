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


def links_stage(html_col: str = "html", src_col: str = "url"):
    """map_batches fn: html -> (src, dst) edge rows from every
    href="..." attribute, in document order — the crawl-to-link-graph
    bridge (feed the edge table to stages/graph.py pagerank /
    components). Fully vectorized: one split on the literal 'href="'
    (every fragment after a row's first opens with a URL), one split on
    '"' for the URL prefix — no per-row Python, no regex engine."""
    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        html = t[html_col].combine_chunks() \
            if isinstance(t[html_col], pa.ChunkedArray) else t[html_col]
        s = pc.cast(html, pa.string()) \
            if pa.types.is_binary(html.type) \
            or pa.types.is_large_binary(html.type) else html
        parts = pc.split_pattern(s, 'href="')
        lens = np.asarray(pc.fill_null(pc.list_value_length(parts), 0),
                          dtype=np.int64)
        flat = pc.list_flatten(parts)
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        splits = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=splits[1:])
        keep = np.ones(len(rows), dtype=bool)
        keep[splits[:-1][lens > 0]] = False  # fragment 0 = pre-href text
        frag = flat.filter(pa.array(keep))
        dst = pc.list_element(pc.split_pattern(frag, '"'), 0)
        src = t[src_col].take(pa.array(rows[keep]))
        return pa.table({"src": src, "dst": dst})

    return fn
