"""Flagship pipeline: the engine equivalent of the reference's HIBP run
(cpp/extras/benchmarks/hibp.cpp:66-129 — read corpus -> build filters ->
evaluate membership/fpp -> report), re-expressed Ray-Data-first over the
Common-Crawl-style web-page table:

read documents -> synthesize web pages -> extract text (byte-identical
invariant enforced per row) -> hash urls -> per-lang mergeable BlockBloom
build (salted two-stage groupby merge) -> broadcast probe: every member
found (no false negatives), non-member fpp within the reference's 2x test
bound (java FilterTest.java:69-78).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketch import sizing
from ..sketch.block_bloom import BlockBloom
from ..sketch.hashing import hash_arrow_array
from ..sources.webpages import read_webpages
from ..stages.extract import verify_extract_stage
from ..stages.sketch_build import build_grouped_sketches


def flagship(sf_dir: str, fpp: float = 0.01) -> pd.DataFrame:
    """Returns one row per lang: rows, filter bytes, members found, fpp."""
    pages = read_webpages(sf_dir).map_batches(
        verify_extract_stage, batch_format="pyarrow")

    # size the per-lang filter from exact per-lang counts (a tiny aggregate)
    counts = pages.groupby("lang").count().to_pandas()
    counts = counts.set_index("lang")["count()"].to_dict()
    max_n = max(counts.values())
    size = sizing.block_bytes_needed(max_n, fpp)

    grouped = build_grouped_sketches(
        read_webpages(sf_dir), "lang", "url", "block", {"bytes_": size})

    # probe: members per lang + fpp on synthetic non-members
    rng_probe = pa.array([f"https://no-such.example.net/{i}" for i in range(65536)])
    probe_hashes = hash_arrow_array(rng_probe)
    out = []
    pages_df = read_webpages(sf_dir, include_html=False) \
        .select_columns(["url", "lang"]).to_pandas()
    for _, row in grouped.iterrows():
        f = BlockBloom.from_bytes(row["payload"])
        urls = pa.array(pages_df.loc[pages_df["lang"] == row["lang"], "url"].tolist())
        members_found = int(f.find_hashes(hash_arrow_array(urls)).sum())
        measured_fpp = float(f.find_hashes(probe_hashes).mean())
        out.append({
            "lang": row["lang"], "rows": int(row["rows"]),
            "filter_bytes": f.size_in_bytes(),
            "members_found": members_found,
            "fpp_measured": round(measured_fpp, 5),
            "fpp_configured": fpp,
        })
    return pd.DataFrame(out).sort_values("lang").reset_index(drop=True)
