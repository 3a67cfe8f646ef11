"""The queries()/oracle_sql() registry consumed by __ray_entry__.py.

Each entry is a named pipeline over the testdata tables. SQL-expressible
pipelines carry a DuckDB oracle with IDENTICAL column names; sketch-based
pipelines (approximate results) have no oracle — their accuracy is asserted
against published error bounds in tests/ instead.

All callables: Ray must already be initialised by the caller; none of these
call ray.init().
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Exact relational pipelines (DuckDB-oracled)
# ---------------------------------------------------------------------------

def q_doc_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-language document stats — groupby aggregate with pre-pruned read."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Mean("n_chars", alias_name="avg_chars"),
    ).to_pandas()
    out["avg_chars"] = out["avg_chars"].round(4)
    out["sum_chars"] = out["sum_chars"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_DOC_STATS = """
SELECT lang,
       count(*)::BIGINT            AS n_docs,
       sum(n_chars)::BIGINT        AS sum_chars,
       round(avg(n_chars), 4)      AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (multi-key groupby)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def add_revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    ds = ds.map_batches(add_revenue, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("revenue", alias_name="sum_revenue"),
        Count(alias_name="n_rows"),
    ).to_pandas()
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_revenue"] = out["sum_revenue"].round(2)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_revenue,
       count(*)::BIGINT                                   AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_bloom_semijoin(sf_dir: str) -> pd.DataFrame:
    """Broadcast Bloom semi-join (the reference's probe pattern, SURVEY §2.5):

    build side = BlockBloom of BUILDING-segment custkeys (small, ray.put once);
    probe side = orders, filtered per batch by bloom membership then confirmed
    exactly against the broadcast key set (bloom prunes, exact set confirms —
    result is exact; at 100 TB the exact check would run only on the ~1% of
    rows the bloom lets through).
    """
    import pyarrow.compute as pc

    from ..sketch import sizing
    from ..sketch.block_bloom import BlockBloom
    from ..sketch.hashing import hash_arrow_array

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(expr="c_mktsegment == 'BUILDING'") \
        .select_columns(["c_custkey"]).to_pandas()["c_custkey"].to_numpy()
    f = BlockBloom(sizing.block_bytes_needed(max(len(keys), 1), 0.001))
    f.add_hashes(hash_arrow_array(pa.array(keys, type=pa.int64())))
    bloom_ref = ray.put(f.to_bytes())
    exact_ref = ray.put(np.sort(keys.astype(np.int64)))

    class SemiJoin:
        def __init__(self):
            self.bloom = BlockBloom.from_bytes(ray.get(bloom_ref))
            self.exact = ray.get(exact_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            h = hash_arrow_array(t["o_custkey"])
            maybe = self.bloom.find_hashes(h)
            t = t.filter(pa.array(maybe))
            if t.num_rows:
                ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
                t = t.filter(pa.array(np.isin(ck, self.exact)))
            return t

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderstatus", "o_totalprice"])
    joined = orders.map_batches(SemiJoin, batch_format="pyarrow",
                                concurrency=2)
    out = joined.groupby("o_orderstatus").aggregate(
        Count(alias_name="n_orders"),
        Sum("o_totalprice", alias_name="sum_totalprice"),
    ).to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_totalprice"] = out["sum_totalprice"].round(2)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


SQL_BLOOM_SEMIJOIN = """
SELECT o_orderstatus,
       count(*)::BIGINT               AS n_orders,
       round(sum(o_totalprice), 2)    AS sum_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_extract_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Synthesize web pages, extract text from html, assert byte-identity
    per row (raises on any mismatch), return per-lang page counts.
    Oracle: the same counts straight from documents."""
    from ..sources.webpages import read_webpages
    from ..stages.extract import verify_extract_stage

    pages = read_webpages(sf_dir).map_batches(
        verify_extract_stage, batch_format="pyarrow")
    out = pages.groupby("lang").aggregate(Count(alias_name="n_pages")).to_pandas()
    out["n_pages"] = out["n_pages"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_EXTRACT_ROUNDTRIP = """
SELECT lang, count(*)::BIGINT AS n_pages
FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Sketch pipelines (approximate / no SQL oracle; bounds asserted in tests)
# ---------------------------------------------------------------------------

def q_block_bloom_per_lang(sf_dir: str) -> pd.DataFrame:
    """Per-lang BlockBloom membership report (flagship, deterministic)."""
    from .flagship import flagship

    return flagship(sf_dir)


def q_growable_filters_per_lang(sf_dir: str) -> pd.DataFrame:
    """Distributed build of the reference's growable filters (taffy-block +
    taffy-cuckoo) per lang over urls; both merged via their union/OR ops
    (c/lib/taffy-cuckoo.c:260-348; SURVEY.md §2.6). Reports membership
    (must be complete — no false negatives) and fpp on non-members."""
    from ..sketch.hashing import hash_arrow_array
    from ..sketch.taffy_block import TaffyBlock
    from ..sketch.taffy_cuckoo import TaffyCuckoo
    from ..sources.webpages import read_webpages
    from ..stages.sketch_build import build_grouped_sketches

    tbf = build_grouped_sketches(read_webpages(sf_dir), "lang", "url",
                                 "taffy_block", {"ndv": 256, "fpp": 0.01})
    tcf = build_grouped_sketches(read_webpages(sf_dir), "lang", "url",
                                 "taffy_cuckoo", {"bytes_": 1024})
    pages = read_webpages(sf_dir, include_html=False) \
        .select_columns(["url", "lang"]).to_pandas()
    probes = hash_arrow_array(pa.array(
        [f"https://absent.example.net/{i}" for i in range(32768)]))
    rows = []
    for (_, a), (_, b) in zip(tbf.iterrows(), tcf.iterrows()):
        assert a["lang"] == b["lang"]
        urls = pa.array(pages.loc[pages["lang"] == a["lang"], "url"].tolist())
        h = hash_arrow_array(urls)
        f1 = TaffyBlock.from_bytes(a["payload"])
        f2 = TaffyCuckoo.from_bytes(b["payload"])
        fz = f2.freeze()
        rows.append({
            "lang": a["lang"], "n_urls": len(urls),
            "tbf_found": int(f1.find_hashes(h).sum()),
            "tcf_found": int(f2.find_hashes(h).sum()),
            "frozen_found": int(fz.find_hashes(h).sum()),
            "tbf_fpp": round(float(f1.find_hashes(probes).mean()), 5),
            "tcf_fpp": round(float(f2.find_hashes(probes).mean()), 5),
            "tbf_bytes": f1.size_in_bytes(), "tcf_bytes": f2.size_in_bytes(),
        })
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


QUERIES: dict[str, Callable[[str], Any]] = {
    "doc_stats_by_lang": q_doc_stats_by_lang,
    "pricing_summary": q_pricing_summary,
    "bloom_semijoin": q_bloom_semijoin,
    "extract_roundtrip": q_extract_roundtrip,
    "block_bloom_per_lang": q_block_bloom_per_lang,
    "growable_filters_per_lang": q_growable_filters_per_lang,
}

ORACLES: dict[str, str] = {
    "doc_stats_by_lang": SQL_DOC_STATS,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "bloom_semijoin": SQL_BLOOM_SEMIJOIN,
    "extract_roundtrip": SQL_EXTRACT_ROUNDTRIP,
}
