"""Deterministic Common-Crawl-style web-page table.

`BASELINE.json` `input_hint` pins the engine's input shape:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

No external data is allowed, so the table is *synthesized deterministically*
from the driver-generated `documents` table (doc_id, text, lang, source,
n_chars): url/warc_ts derive from doc_id, and `html` wraps `text` in a fixed
markup template whose extraction (stages/extract.py) is byte-identical to
`text` — the per-row invariant the north star demands.

Everything here is vectorized pyarrow.compute — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WEBPAGE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

# WARC capture epoch for synthetic timestamps (arbitrary fixed constant).
WARC_EPOCH_US = np.int64(1_709_251_200_000_000)  # 2024-03-01T00:00:00Z in µs


def _escape_html(col: pa.Array) -> pa.Array:
    """Escape &, <, > (order matters: & first)."""
    col = pc.replace_substring(col, "&", "&amp;")
    col = pc.replace_substring(col, "<", "&lt;")
    col = pc.replace_substring(col, ">", "&gt;")
    return col


def _markup_newlines(col: pa.Array) -> pa.Array:
    """Blank lines become paragraph breaks, single newlines become <br/>."""
    # markers must not contain "\n" themselves or the second replace mangles them
    col = pc.replace_substring(col, "\n\n", "</p><p>")
    col = pc.replace_substring(col, "\n", "<br/>")
    return col


def url_of(doc_id, lang, source) -> pa.Array:
    """The deterministic url of a document — shared by the synthesis
    stage and every query that needs urls without the full page payload.
    ANSI-SQL equivalent (the oracle form):
    'https://' || source || '.example.org/' || lang || '/page-' ||
    lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.html'"""
    idstr = pc.utf8_lpad(pc.cast(doc_id, pa.string()), 8, "0")
    # NB: binary_join_element_wise uses its LAST argument as the separator.
    return pc.binary_join_element_wise(
        "https://", source, ".example.org/", lang, "/page-", idstr,
        ".html", "")


def warc_ts_of(doc_id) -> pa.Array:
    """The deterministic capture timestamp of a document (µs precision).
    ANSI-SQL equivalent of the raw int64: 1709251200000000 + doc_id *
    1337000000."""
    return pa.array(
        WARC_EPOCH_US + np.asarray(doc_id, dtype=np.int64) * 1_337_000_000,
        type=pa.timestamp("us"))


def synthesize_webpages(batch: pa.Table) -> pa.Table:
    """documents batch -> web-page batch (url, warc_ts, html, text, lang)."""
    doc_id = batch["doc_id"]
    text = batch["text"]
    lang = batch["lang"]
    source = batch["source"]

    url = url_of(doc_id, lang, source)
    ts = warc_ts_of(doc_id)

    body = _markup_newlines(_escape_html(text))
    html = pc.binary_join_element_wise(
        "<html><head><meta charset=\"utf-8\"/><title>", url,
        "</title></head>\n<body>\n<nav>example.org index</nav>\n<article><p>",
        body,
        "</p></article>\n<footer>&copy; example.org</footer>\n</body></html>",
        "")
    html = pc.cast(html, pa.binary())

    return pa.table({
        "url": url, "warc_ts": ts, "html": html,
        "text": text, "lang": lang,
    })


def _replicate_docs(batch: pa.Table, factor: int) -> pa.Table:
    """Deterministically expand a documents batch `factor`x: replica r gets
    doc_id' = doc_id*factor + r (so urls/timestamps stay unique). Used by the
    bench to scale work beyond the tiny driver-generated documents table."""
    n = batch.num_rows
    reps = [batch.set_column(
        batch.schema.get_field_index("doc_id"), "doc_id",
        pa.array(np.asarray(batch["doc_id"], dtype=np.int64) * factor + r,
                 type=pa.int64()))
        for r in range(factor)]
    return pa.concat_tables(reps)


def read_webpages(sf_dir: str, *, include_html: bool = True,
                  replicate: int = 1, parallelism: int | None = None):
    """Ray Dataset of the web-page table for a testdata scale-factor dir.

    Column-pruned read of documents.parquet -> vectorized synthesis stage.
    `replicate` > 1 deterministically expands the corpus for benchmarking.
    """
    import ray.data

    cols = ["doc_id", "text", "lang", "source"]
    kwargs = {"columns": cols}
    if parallelism:
        kwargs["override_num_blocks"] = parallelism
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", **kwargs)
    if replicate > 1:
        # batch_size=None = one batch per block: a fixed batch_size here
        # coalesces many small read blocks into few huge tasks and collapses
        # the parallelism of everything fused downstream
        ds = ds.map_batches(lambda b: _replicate_docs(b, replicate),
                            batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(synthesize_webpages, batch_format="pyarrow")
    if not include_html:
        ds = ds.select_columns(["url", "warc_ts", "text", "lang"])
    return ds
