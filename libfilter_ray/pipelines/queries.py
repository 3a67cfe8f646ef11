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
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns=None, filter=None):
    """Pruned parquet read: `columns` limits what leaves storage;
    `filter` (a pyarrow.dataset expression, e.g. pc.field("x") > 5)
    pushes row selection into the Arrow scan — row groups whose
    statistics exclude the predicate are skipped entirely and the rest
    filter in C++ before a single batch reaches Python."""
    kwargs = {}
    if filter is not None:
        kwargs["filter"] = filter  # lands in **arrow_parquet_args
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns, **kwargs)


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

    cust = _read(sf_dir, "customer", columns=["c_custkey"],
                 filter=pc.field("c_mktsegment") == "BUILDING")
    keys = cust.to_pandas()["c_custkey"].to_numpy()
    f = BlockBloom(sizing.block_bytes_needed(max(len(keys), 1), 0.001))
    f.add_hashes(hash_arrow_array(pa.array(keys, type=pa.int64())))
    bloom_ref = ray.put(f.to_bytes())
    exact_ref = ray.put(np.sort(keys.astype(np.int64)))

    from ..stages.dedup import _cached_filter

    def semi_join(t: pa.Table) -> pa.Table:
        bloom = _cached_filter(bloom_ref, BlockBloom.from_bytes)
        exact = ray.get(exact_ref)
        h = hash_arrow_array(t["o_custkey"])
        maybe = bloom.find_hashes(h)
        t = t.filter(pa.array(maybe))
        if t.num_rows:
            ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.filter(pa.array(np.isin(ck, exact)))
        return t

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderstatus", "o_totalprice"])
    joined = orders.map_batches(semi_join, batch_format="pyarrow")
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


def q_bloom_antijoin(sf_dir: str) -> pd.DataFrame:
    """Broadcast Bloom ANTI-join (complement of §2.5): keep orders whose
    custkey is NOT in the BUILDING segment. Bloom misses are definite
    non-members (kept with zero further work — the common case at scale);
    bloom hits get the exact broadcast-set confirm, so false positives
    don't drop rows. Result is exact."""
    from ..sketch import sizing
    from ..sketch.block_bloom import BlockBloom
    from ..sketch.hashing import hash_arrow_array
    from ..stages.dedup import _cached_filter

    cust = _read(sf_dir, "customer", columns=["c_custkey"],
                 filter=pc.field("c_mktsegment") == "BUILDING")
    keys = cust.to_pandas()["c_custkey"].to_numpy()
    f = BlockBloom(sizing.block_bytes_needed(max(len(keys), 1), 0.001))
    f.add_hashes(hash_arrow_array(pa.array(keys, type=pa.int64())))
    bloom_ref = ray.put(f.to_bytes())
    exact_ref = ray.put(np.sort(keys.astype(np.int64)))

    def anti_join(t: pa.Table) -> pa.Table:
        bloom = _cached_filter(bloom_ref, BlockBloom.from_bytes)
        h = hash_arrow_array(t["o_custkey"])
        maybe = bloom.find_hashes(h)
        keep = ~maybe
        if maybe.any():  # exact confirm only on the bloom-hit minority
            exact = ray.get(exact_ref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)[maybe]
            keep[np.flatnonzero(maybe)] = ~np.isin(ck, exact)
        return t.filter(pa.array(keep))

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderstatus", "o_totalprice"])
    out = orders.map_batches(anti_join, batch_format="pyarrow") \
        .groupby("o_orderstatus").aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="sum_totalprice")).to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_totalprice"] = out["sum_totalprice"].round(2)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


SQL_BLOOM_ANTIJOIN = """
SELECT o_orderstatus,
       count(*)::BIGINT               AS n_orders,
       round(sum(o_totalprice), 2)    AS sum_totalprice
FROM orders
WHERE o_custkey NOT IN
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
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


def q_distinct_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact distinct count via two-stage groupby (the exact oracle the HLL
    pipeline approximates; at 100 TB you'd use the HLL path instead)."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).count()
    out = pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users")).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_value_quantiles_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact per-group quantiles via map_groups (linear interpolation ==
    DuckDB quantile_cont)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def qtl(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy()
        return pd.DataFrame({
            "event_type": [df["event_type"].iloc[0]],
            "p50": [round(float(np.quantile(v, 0.5)), 6)],
            "p90": [round(float(np.quantile(v, 0.9)), 6)],
            "p99": [round(float(np.quantile(v, 0.99)), 6)],
        })

    out = ds.groupby("event_type").map_groups(qtl, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


SQL_VALUE_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.9), 6)  AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_part_lineitem_full_join(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER face of the hash-partitioned equi-join (stages/joins.py,
    how='full outer'): large parts x per-part high-quantity lineitem
    counts, where both directions have unmatched rows (parts nobody ships
    in bulk; bulk-shipped parts that aren't large). Correct under
    co-partitioning: an unmatched key null-extends exactly once, on its
    own shard. Nulls are coalesced to sentinels IN BOTH the engine and the
    SQL so the compared output is all-integer."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ..stages.joins import hash_equi_join

    part = _read(sf_dir, "part", columns=["p_partkey", "p_size"]) \
        .filter(expr="p_size >= 49")
    big = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"]) \
        .filter(expr="l_quantity >= 49") \
        .groupby("l_partkey").aggregate(Count(alias_name="n_big"))
    joined = hash_equi_join(
        part, big, left_on="p_partkey", right_on="l_partkey",
        left_cols=["p_size"], right_cols=["n_big"], how="full outer")

    def finish(t: pa.Table) -> pa.Table:
        size = t["p_size"].combine_chunks() \
            if isinstance(t["p_size"], pa.ChunkedArray) else t["p_size"]
        nbig = t["n_big"].combine_chunks() \
            if isinstance(t["n_big"], pa.ChunkedArray) else t["n_big"]
        lv = pc.is_valid(size).to_numpy(zero_copy_only=False)
        rv = pc.is_valid(nbig).to_numpy(zero_copy_only=False)
        status = np.where(lv & rv, "both",
                          np.where(lv, "left_only", "right_only"))
        return pa.table({
            "partkey": pc.cast(t["p_partkey"], pa.int64()),
            "p_size": pc.cast(pc.fill_null(size, -1), pa.int64()),
            "n_big": pc.cast(pc.fill_null(nbig, 0), pa.int64()),
            "status": pa.array(status.tolist(), type=pa.string()),
        })

    out = joined.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("partkey").reset_index(drop=True)


SQL_PART_LINEITEM_FULL_JOIN = """
WITH l AS (SELECT p_partkey AS partkey, p_size FROM part
           WHERE p_size >= 49),
     r AS (SELECT l_partkey AS partkey, count(*)::BIGINT AS n_big
           FROM lineitem WHERE l_quantity >= 49 GROUP BY 1)
SELECT COALESCE(l.partkey, r.partkey) AS partkey,
       COALESCE(l.p_size, -1)::BIGINT AS p_size,
       COALESCE(r.n_big, 0)::BIGINT AS n_big,
       CASE WHEN l.partkey IS NOT NULL AND r.partkey IS NOT NULL
            THEN 'both'
            WHEN l.partkey IS NOT NULL THEN 'left_only'
            ELSE 'right_only' END AS status
FROM l FULL JOIN r ON l.partkey = r.partkey
ORDER BY partkey
"""


def q_exact_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-group order statistics WITHOUT materializing any group
    (stages/order_stats.py:exact_group_quantiles): iterative histogram
    range refinement — rounds+2 streaming passes, probes x buckets driver
    state, final bounded gather. The 100 TB-safe exact path: the
    map_groups variant (`value_quantiles_by_type`) gathers each whole
    group into one task, this one never does. Returns the value at rank
    floor(q*(n-1)) per group — the exact stored double, so the oracle
    (ORDER BY rank selection) matches bit-for-bit with no rounding."""
    from ..stages.order_stats import exact_group_quantiles

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return exact_group_quantiles(ds, "event_type", "value",
                                 qs=(0.5, 0.9, 0.99), rounds=2, buckets=64)


SQL_EXACT_VALUE_QUANTILES = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) - 1
           AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       max(CASE WHEN rk = CAST(floor(0.50 * (n - 1)) AS BIGINT)
                THEN value END) AS q50,
       max(CASE WHEN rk = CAST(floor(0.90 * (n - 1)) AS BIGINT)
                THEN value END) AS q90,
       max(CASE WHEN rk = CAST(floor(0.99 * (n - 1)) AS BIGINT)
                THEN value END) AS q99
FROM r GROUP BY event_type ORDER BY event_type
"""


def q_top_users_by_events(sf_dir: str) -> pd.DataFrame:
    """Exact top-10 heavy hitters (the CMS verification oracle):
    groupby count -> total-order sort (count desc, user_id asc) -> limit."""
    ds = _read(sf_dir, "events", columns=["user_id"])
    counts = ds.groupby("user_id").aggregate(Count(alias_name="n_events"))
    top = counts.sort(["n_events", "user_id"], descending=[True, False]) \
        .limit(10).to_pandas()
    top["n_events"] = top["n_events"].astype("int64")
    top["user_id"] = top["user_id"].astype("int64")
    return top.reset_index(drop=True)


SQL_TOP_USERS = """
SELECT user_id::BIGINT AS user_id, count(*)::BIGINT AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Sketch pipelines (approximate / no SQL oracle; bounds asserted in tests)
# ---------------------------------------------------------------------------


def q_sketch_summary_events(sf_dir: str) -> pd.DataFrame:
    """One-pass distributed build of FOUR mergeable sketches per event_type
    (HLL over user_id, CMS over user_id, t-digest + KLL over value) via
    build_grouped_multi — single read, single shuffle of tiny partials."""
    from ..sketch.cms import CountMin
    from ..sketch.hll import HyperLogLog
    from ..sketch.kll import KLL
    from ..sketch.tdigest import TDigest
    from ..stages.sketch_build import build_grouped_multi

    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])
    specs = [
        ("hll", "hll", {"p": 12}, "user_id"),
        ("cms", "cms", {"width": 4096, "depth": 5}, "user_id"),
        ("td", "tdigest", {"delta": 100.0}, "value"),
        ("kll", "kll", {"k": 200}, "value"),
    ]
    grouped = build_grouped_multi(ds, "event_type", specs)
    rows = []
    for _, r in grouped.iterrows():
        hll = HyperLogLog.from_bytes(r["payload_hll"])
        td = TDigest.from_bytes(r["payload_td"])
        kll = KLL.from_bytes(r["payload_kll"])
        cms = CountMin.from_bytes(r["payload_cms"])
        rows.append({
            "event_type": r["event_type"], "n_rows": int(r["rows"]),
            "distinct_users_est": round(hll.estimate(), 1),
            "cms_total": int(cms.total),
            "value_p50_td": round(td.quantile(0.5), 4),
            "value_p99_td": round(td.quantile(0.99), 4),
            "value_p50_kll": round(kll.quantile(0.5), 4),
            "value_p99_kll": round(kll.quantile(0.99), 4),
        })
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)

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
    from ..stages.sketch_build import build_grouped_multi

    # ONE read + ONE shuffle builds both growable filters (multi-spec pass).
    # Coarse blocks (repartition 8): TCF union cost scales with partial
    # count, and partials here are per-block per-lang python-merge objects.
    pages_ds = read_webpages(sf_dir, include_html=False) \
        .select_columns(["url", "lang"]).repartition(8)
    grouped = build_grouped_multi(pages_ds, "lang", [
        ("tbf", "taffy_block", {"ndv": 256, "fpp": 0.01}, "url"),
        ("tcf", "taffy_cuckoo", {"bytes_": 1024}, "url"),
    ])
    # probe = a SECOND STREAMING pass with the (KB-sized) filters shipped in
    # the task closure — same shape as the flagship probe (flagship.py) —
    # never a driver-side corpus collect
    def _mk(r):
        f2 = TaffyCuckoo.from_bytes(r["payload_tcf"])
        return (TaffyBlock.from_bytes(r["payload_tbf"]), f2, f2.freeze())

    filters = {r["lang"]: _mk(r) for _, r in grouped.iterrows()}

    # fpp measurement fans out as one Ray task per lang (the serial driver
    # loop was 2 x 32k TCF probes per lang — the pipeline's longest pole);
    # submitted BEFORE the membership pass so both run concurrently
    probes = hash_arrow_array(pa.array(
        [f"https://absent.example.net/{i}" for i in range(32768)]))
    probes_ref = ray.put(probes)

    @ray.remote
    def fpp_task(tbf_bytes: bytes, tcf_bytes: bytes, pr) -> tuple:
        f1 = TaffyBlock.from_bytes(tbf_bytes)
        f2 = TaffyCuckoo.from_bytes(tcf_bytes)
        return (float(f1.find_hashes(pr).mean()),
                float(f2.find_hashes(pr).mean()))

    fpp_refs = {r["lang"]: fpp_task.remote(r["payload_tbf"],
                                           r["payload_tcf"], probes_ref)
                for _, r in grouped.iterrows()}

    def probe_count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        langs, n, f1c, f2c, fzc = [], [], [], [], []
        dict_arr = pc.dictionary_encode(t["lang"].combine_chunks()
                                        if isinstance(t["lang"], pa.ChunkedArray)
                                        else t["lang"])
        codes = np.asarray(dict_arr.indices)
        urls = t["url"].combine_chunks() \
            if isinstance(t["url"], pa.ChunkedArray) else t["url"]
        for code in range(len(dict_arr.dictionary)):
            lang = dict_arr.dictionary[code].as_py()
            mask = codes == code
            h = hash_arrow_array(urls.filter(pa.array(mask)))
            f1, f2, fz = filters[lang]
            langs.append(lang)
            n.append(int(mask.sum()))
            f1c.append(int(f1.find_hashes(h).sum()))
            f2c.append(int(f2.find_hashes(h).sum()))
            fzc.append(int(fz.find_hashes(h).sum()))
        return pa.table({"lang": pa.array(langs, type=pa.string()),
                         "n": pa.array(n, type=pa.int64()),
                         "tbf": pa.array(f1c, type=pa.int64()),
                         "tcf": pa.array(f2c, type=pa.int64()),
                         "fz": pa.array(fzc, type=pa.int64())})

    from ray.data.aggregate import Sum as _Sum

    # explicit batch_size here: probing pays a fixed multi-level cost per
    # (batch, lang, filter) — coalescing the many tiny synth blocks beats
    # per-block batches for this light, probe-only stage
    found = read_webpages(sf_dir, include_html=False) \
        .select_columns(["url", "lang"]) \
        .map_batches(probe_count, batch_format="pyarrow",
                     batch_size=16384) \
        .groupby("lang").aggregate(
            _Sum("n", alias_name="n_urls"),
            _Sum("tbf", alias_name="tbf_found"),
            _Sum("tcf", alias_name="tcf_found"),
            _Sum("fz", alias_name="frozen_found")).to_pandas() \
        .set_index("lang")

    rows = []
    for _, r in grouped.iterrows():
        lang = r["lang"]
        f1, f2, _fz = filters[lang]
        tbf_fpp, tcf_fpp = ray.get(fpp_refs[lang])
        rows.append({
            "lang": lang, "n_urls": int(found.loc[lang, "n_urls"]),
            "tbf_found": int(found.loc[lang, "tbf_found"]),
            "tcf_found": int(found.loc[lang, "tcf_found"]),
            "frozen_found": int(found.loc[lang, "frozen_found"]),
            "tbf_fpp": round(tbf_fpp, 5),
            "tcf_fpp": round(tcf_fpp, 5),
            "tbf_bytes": f1.size_in_bytes(), "tcf_bytes": f2.size_in_bytes(),
        })
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


def q_static_xor_per_lang(sf_dir: str) -> pd.DataFrame:
    """Per-lang static (xor) filter bulk build — the reference's immutable
    filter (c/lib/static.c:12-82) via groupby(lang).map_groups (the filter
    is NOT mergeable, so each group's full hash list feeds one build task;
    SURVEY.md §2.6). Reports membership completeness, fpp, and the
    (0.75 + 1/ln ln n) bytes/key space ratio."""
    from ..sketch.hashing import hash_arrow_array
    from ..sketch.xor_static import StaticXor
    from ..sources.webpages import read_webpages

    pages = read_webpages(sf_dir, include_html=False) \
        .select_columns(["url", "lang"])
    probes_ref = ray.put(hash_arrow_array(pa.array(
        [f"https://absent.example.net/{i}" for i in range(1 << 17)])))

    def build_group(df: pd.DataFrame) -> pd.DataFrame:
        probes = ray.get(probes_ref)  # zero-copy plasma, not a closure copy
        h = hash_arrow_array(pa.array(df["url"]))
        f = StaticXor.build(h)
        return pd.DataFrame({
            "lang": [df["lang"].iloc[0]],
            "n_urls": [len(df)],
            "members_found": [int(f.find_hashes(h).sum())],
            "filter_bytes": [f.size_in_bytes()],
            "fpp_measured": [round(float(f.find_hashes(probes).mean()), 5)],
        })

    out = pages.groupby("lang").map_groups(
        build_group, batch_format="pandas").to_pandas()
    assert (out["members_found"] == out["n_urls"]).all()
    return out.sort_values("lang").reset_index(drop=True)


def q_checkpointed_build_resume(sf_dir: str) -> pd.DataFrame:
    """Checkpoint/resume demonstration pipeline (north rule: "resumable from
    checkpoint with per-partition lineage + metrics"): start a per-event_type
    HLL build, stop it after 2 partitions ("kill"), resume from the
    checkpoint dir in a fresh job object, and report per-key estimates plus
    partition lineage counts. Deterministic output — resumed results are
    byte-identical to a clean run (tests/test_checkpoint.py)."""
    import shutil
    import tempfile

    from ..state.checkpoint import CheckpointedBuild

    run_dir = tempfile.mkdtemp(prefix="lfr-ckpt-", dir="/tmp")
    try:
        kw = dict(kind="hll", params={"p": 14}, column="user_id",
                  key="event_type", target_rows=2048)
        paths = [f"{sf_dir}/events.parquet"]
        job = CheckpointedBuild(f"{run_dir}/run", paths, **kw)
        job.run(max_partitions=2)          # interrupted mid-build
        job2 = CheckpointedBuild(f"{run_dir}/run", paths, **kw)  # resume
        assert job2.status()["done"] == min(2, len(job2.partitions))
        out = job2.run()
        m = job2.metrics()
        rows = [{"event_type": k,
                 "distinct_users_est": int(round(sk.estimate())),
                 "n_partitions": int(m["partition_id"].nunique())}
                for k, sk in out.items()]
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


def q_checkpointed_lineage_counts(sf_dir: str) -> pd.DataFrame:
    """The deterministic, SQL-oracleable slice of checkpoint/resume:
    partition lineage. Partitions are exact 2048-row ranges in file order
    (state/checkpoint.py:plan_partitions), so after a kill-at-2 + resume
    run the per-partition rows_processed recorded in the checkpoint
    metrics must equal LEAST(2048, total - pid*2048) for every pid — the
    SQL oracle states that from COUNT(*) alone. Any lost, duplicated, or
    re-planned partition breaks the match."""
    import shutil
    import tempfile

    from ..state.checkpoint import CheckpointedBuild

    run_dir = tempfile.mkdtemp(prefix="lfr-ckptlin-", dir="/tmp")
    try:
        kw = dict(kind="hll", params={"p": 14}, column="user_id",
                  key="event_type", target_rows=2048)
        paths = [f"{sf_dir}/events.parquet"]
        job = CheckpointedBuild(f"{run_dir}/run", paths, **kw)
        job.run(max_partitions=2)          # interrupted mid-build
        job2 = CheckpointedBuild(f"{run_dir}/run", paths, **kw)  # resume
        job2.run()
        m = job2.metrics()
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)
    out = m.groupby("partition_id", as_index=False)["rows_processed"] \
        .sum()
    out["partition_id"] = out["partition_id"].astype("int64")
    out["rows_processed"] = out["rows_processed"].astype("int64")
    return out.sort_values("partition_id").reset_index(drop=True)


SQL_CKPT_LINEAGE = """
WITH n AS (SELECT COUNT(*) AS c FROM events)
SELECT CAST(g AS BIGINT) AS partition_id,
       CAST(LEAST(2048, c - g * 2048) AS BIGINT) AS rows_processed
FROM n, unnest(generate_series(0, CAST(ceil(c / 2048.0) AS BIGINT) - 1))
     AS t(g)
ORDER BY partition_id
"""


def q_checkpointed_bloom_members(sf_dir: str) -> pd.DataFrame:
    """Checkpoint/resume under the HASH gate (the membership face;
    lineage is `checkpointed_lineage_counts`): a per-event_type
    BlockBloom build is killed after 2 partitions, resumed in a fresh
    job object, and the RESUMED filters are probed with every distinct
    (event_type, user_id) pair. No-false-negative is a hard invariant
    (cpp/extras/test/block.cpp:108-157), so members_found ==
    COUNT(DISTINCT user_id) exactly — a resume that lost a partition
    leaves members unfound and hash-mismatches."""
    import shutil
    import tempfile

    from ..sketch.block_bloom import BlockBloom
    from ..sketch.hashing import DEFAULT_SEED, hash_arrow_array
    from ..stages.dedup import _cached_filter
    from ..state.checkpoint import CheckpointedBuild

    run_dir = tempfile.mkdtemp(prefix="lfr-ckptbloom-", dir="/tmp")
    try:
        kw = dict(kind="block", params={"bytes_": 1 << 15},
                  column="user_id", key="event_type", target_rows=2048)
        paths = [f"{sf_dir}/events.parquet"]
        job = CheckpointedBuild(f"{run_dir}/run", paths, **kw)
        job.run(max_partitions=2)          # interrupted mid-build
        out = CheckpointedBuild(f"{run_dir}/run", paths, **kw).run()
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)
    fref = ray.put({k: sk.to_bytes() for k, sk in out.items()})

    def probe(t: pa.Table) -> pa.Table:
        filters = _cached_filter(fref, lambda d: {
            k: BlockBloom.from_bytes(v) for k, v in d.items()})
        h = hash_arrow_array(t["user_id"], seed=DEFAULT_SEED)
        et = t["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        found = np.zeros(t.num_rows, dtype=np.int64)
        for k, f in filters.items():
            m = np.asarray(pc.equal(et, k), dtype=bool)
            if m.any():
                found[m] = f.find_hashes(h[m]).astype(np.int64)
        return pa.table({
            "event_type": et,
            "n_distinct": pa.array(np.ones(t.num_rows, np.int64)),
            "members_found": pa.array(found)})

    res = _read(sf_dir, "events", columns=["event_type", "user_id"]) \
        .groupby(["event_type", "user_id"]) \
        .aggregate(Count(alias_name="_n")) \
        .map_batches(probe, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n_distinct", alias_name="n_distinct"),
            Sum("members_found", alias_name="members_found")).to_pandas()
    for c in ("n_distinct", "members_found"):
        res[c] = res[c].astype("int64")
    return res.sort_values("event_type").reset_index(drop=True)


SQL_CKPT_BLOOM_MEMBERS = """
SELECT event_type,
       count(DISTINCT user_id)::BIGINT AS n_distinct,
       count(DISTINCT user_id)::BIGINT AS members_found
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """Broadcast dimension-join chain: region->nation->customer joined to
    streaming orders inside map_batches (no shuffle join). Honest scale
    note: nation/region stay KBs forever, but CUSTOMER grows with the fact
    table — the broadcast is O(customers x ~20 B) (sorted key + two name
    arrays), fine to ~10^8 customers / node-heap; beyond that switch the
    customer leg to stages/joins.py:hash_equi_join with
    bloom_prune_right=True (the bloom-guarded co-partitioned shuffle join;
    see q_order_priority_revenue for the fact-x-fact shape)."""
    import pyarrow.compute as pc

    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name",
                            "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region",
                   columns=["r_regionkey", "r_name"]).to_pandas()
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey") \
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup_ref = ray.put((
        np.sort(dim["c_custkey"].to_numpy().astype(np.int64)),
        dim.sort_values("c_custkey")["n_name"].to_numpy(),
        dim.sort_values("c_custkey")["r_name"].to_numpy()))

    from ..stages.dedup import _cached_filter

    def attach_nation(t: pa.Table) -> pa.Table:
        # the name arrays are object-dtype (not zero-copy): memoize the
        # deserialization per worker process instead of per batch
        keys, n_name, r_name = _cached_filter(lookup_ref, lambda x: x)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, ck)
        ok = (idx < len(keys)) & (keys[np.minimum(
            idx, len(keys) - 1)] == ck)
        t = t.filter(pa.array(ok))
        idx = idx[ok]
        return t.append_column("n_name", pa.array(n_name[idx])) \
            .append_column("r_name", pa.array(r_name[idx]))

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    out = orders.map_batches(attach_nation, batch_format="pyarrow") \
        .groupby(["r_name", "n_name"]).aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="revenue")).to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


SQL_REVENUE_BY_NATION = """
SELECT r_name, n_name,
       count(*)::BIGINT            AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""


def q_orders_by_month(sf_dir: str) -> pd.DataFrame:
    """Calendar grouping over a timestamp column (vectorized strftime)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def month_of(t: pa.Table) -> pa.Table:
        m = pc.strftime(t["o_orderdate"], format="%Y-%m")
        return pa.table({"month": m, "o_totalprice": t["o_totalprice"]})

    out = ds.map_batches(month_of, batch_format="pyarrow") \
        .groupby("month").aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="revenue")).to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values("month").reset_index(drop=True)


SQL_ORDERS_BY_MONTH = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*)::BIGINT               AS n_orders,
       round(sum(o_totalprice), 2)    AS revenue
FROM orders GROUP BY month ORDER BY month
"""


def q_events_hourly_windows(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate (1h windows over event time): the windowed
    aggregation the reference lacks, expressed Ray-Data-first as truncate ->
    groupby — no per-row state, shuffle only of (window, type) partials."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"window_start": w, "event_type": t["event_type"],
                         "value": t["value"]})

    out = ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]).aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value")).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["window_start", "event_type"]) \
        .reset_index(drop=True)


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts)     AS window_start,
       event_type,
       count(*)::BIGINT           AS n_events,
       round(sum(value), 2)       AS sum_value
FROM events GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


def q_events_sliding_windows(sf_dir: str) -> pd.DataFrame:
    """Sliding (hopping) window aggregate: 1h windows hopping every 30min —
    each event lands in exactly TWO windows. Ray-Data-first: the window
    replication is a vectorized per-batch concat (no per-row state, no
    join); shuffle moves only (window, type) partials. Complements the
    tumbling `events_hourly_windows`."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def explode(t: pa.Table) -> pa.Table:
        b = pc.floor_temporal(t["ts"], multiple=30, unit="minute")
        half = pa.scalar(1_800_000_000, type=pa.duration("us"))
        parts = []
        for start in (b, pc.subtract(b, half)):
            parts.append(pa.table({
                "window_start": start,
                "event_type": t["event_type"],
                "value": t["value"]}))
        return pa.concat_tables(parts)

    out = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]).aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value")).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["window_start", "event_type"]) \
        .reset_index(drop=True)


SQL_EVENTS_SLIDING = """
SELECT time_bucket(INTERVAL 30 MINUTE, ts) - o.off AS window_start,
       event_type,
       count(*)::BIGINT     AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
CROSS JOIN (SELECT unnest([INTERVAL 0 MINUTE, INTERVAL 30 MINUTE]) AS off) o
GROUP BY window_start, event_type ORDER BY window_start, event_type
"""


def q_user_sessions(sf_dir: str) -> pd.DataFrame:
    """Gap-based sessionization (30-min inactivity), fully vectorized: shard
    by user-hash (a user never splits across shards), sort each shard once by
    (user, ts), then a np.diff run scan marks session starts — ONE Python
    call per shard, not per user (at 10^8 users the per-group map_groups
    variant pays Python overhead per tiny group; shuffle key stays user_id,
    the natural partition)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    GAP = np.timedelta64(30, "m")
    NSHARDS = 32

    def add_shard(t: pa.Table) -> pa.Table:
        # the shared shard tagger (hashes first): a raw uid % N would shard
        # structured id spaces unevenly (e.g. ids sharing a stride)
        from ..sketch.hashing import shard_of_values

        return t.append_column("shard", pa.array(
            shard_of_values(t["user_id"], NSHARDS, seed=0x5E55),
            type=pa.int64()))

    def sessions_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="stable")
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        new_session = new_user | np.r_[True, (ts[1:] - ts[:-1]) > GAP]
        starts = np.flatnonzero(new_user)
        ends = np.r_[starts[1:], len(uid)]
        return pd.DataFrame({
            "user_id": uid[starts],
            "n_events": (ends - starts).astype(np.int64),
            "n_sessions": np.add.reduceat(
                new_session.astype(np.int64), starts),
        })

    out = ds.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("shard").map_groups(sessions_shard, batch_format="pandas") \
        .to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


SQL_USER_SESSIONS = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id::BIGINT        AS user_id,
       count(*)::BIGINT       AS n_events,
       sum(new_session)::BIGINT AS n_sessions
FROM d GROUP BY user_id ORDER BY user_id
"""


def q_top_parts_per_brand(sf_dir: str) -> pd.DataFrame:
    """Per-group top-k (top 3 parts by retail price per brand), vectorized:
    per-block partial top-k (pre-aggregation — at most 3 rows per brand
    leave each block), then brand-hash shards each do a single pandas
    sort + groupby-cumcount pass — one Python call per SHARD, not per brand
    (the grouped-window pattern at high key cardinality)."""
    ds = _read(sf_dir, "part",
               columns=["p_brand", "p_partkey", "p_retailprice"])

    NSHARDS = 16

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        from ..sketch.hashing import shard_of_values

        # combiner: per-block top-3 per brand, so the shuffle moves at most
        # 3 rows x brands per block no matter how big the block is
        d = df.sort_values(["p_retailprice", "p_partkey"],
                           ascending=[False, True], kind="stable")
        d = d[d.groupby("p_brand").cumcount() < 3]
        return d.assign(shard=shard_of_values(d["p_brand"], NSHARDS))

    def topk_shard(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["p_retailprice", "p_partkey"],
                           ascending=[False, True], kind="stable")
        d = d.assign(rank=d.groupby("p_brand").cumcount() + 1)
        return d[d["rank"] <= 3].drop(columns=["shard"])

    out = ds.map_batches(partial_topk, batch_format="pandas") \
        .groupby("shard").map_groups(topk_shard, batch_format="pandas") \
        .to_pandas()
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    out["p_retailprice"] = out["p_retailprice"].round(2)
    return out.sort_values(["p_brand", "rank"]).reset_index(drop=True)


SQL_TOP_PARTS = """
SELECT p_brand, p_partkey::BIGINT AS p_partkey,
       round(p_retailprice, 2)    AS p_retailprice,
       rank::BIGINT               AS rank
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC)
             AS rank
  FROM part)
WHERE rank <= 3 ORDER BY p_brand, rank
"""


def q_minimal_taffy_per_lang(sf_dir: str) -> pd.DataFrame:
    """Per-lang minimal taffy cuckoo (fine-grained growth) — single-writer
    build per group via groupby(lang).map_groups (the filter has no union,
    SURVEY.md §2.1 op 22). Reports membership completeness + measured fpp
    (head=9 => a few percent by design, paths.h:31-41)."""
    from ..sketch.hashing import hash_arrow_array
    from ..sketch.minimal_taffy_cuckoo import MinimalTaffyCuckoo
    from ..sources.webpages import read_webpages

    pages = read_webpages(sf_dir, include_html=False) \
        .select_columns(["url", "lang"])
    probes = hash_arrow_array(pa.array(
        [f"https://absent.example.net/{i}" for i in range(1 << 14)]))

    def build_group(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_arrow_array(pa.array(df["url"]))
        f = MinimalTaffyCuckoo()
        f.update(h)
        return pd.DataFrame({
            "lang": [df["lang"].iloc[0]],
            "n_urls": [len(df)],
            "members_found": [int(f.find_hashes(h).sum())],
            "filter_bytes": [f.size_in_bytes()],
            "fpp_measured": [round(float(f.find_hashes(probes).mean()), 5)],
        })

    out = pages.groupby("lang").map_groups(
        build_group, batch_format="pandas").to_pandas()
    assert (out["members_found"] == out["n_urls"]).all()
    return out.sort_values("lang").reset_index(drop=True)


def q_vector_quotient_per_lang(sf_dir: str) -> pd.DataFrame:
    """Per-lang taffy vector-quotient filter (SURVEY §2.1 op 26) —
    single-writer build per group via groupby(lang).map_groups (the filter
    has no union, like the minimal taffy cuckoo). Reports membership
    completeness (asserted — no false negatives across growth) + measured
    fpp + size."""
    from ..sketch.hashing import hash_arrow_array
    from ..sketch.vector_quotient import TaffyVectorQuotient
    from ..sources.webpages import read_webpages

    pages = read_webpages(sf_dir, include_html=False) \
        .select_columns(["url", "lang"])
    probes = hash_arrow_array(pa.array(
        [f"https://absent.example.net/{i}" for i in range(1 << 13)]))

    def build_group(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_arrow_array(pa.array(df["url"]))
        f = TaffyVectorQuotient()
        f.update(h)
        return pd.DataFrame({
            "lang": [df["lang"].iloc[0]],
            "n_urls": [len(df)],
            "members_found": [int(f.find_hashes(h).sum())],
            "filter_bytes": [f.size_in_bytes()],
            "fpp_measured": [round(float(f.find_hashes(probes).mean()), 5)],
        })

    out = pages.groupby("lang").map_groups(
        build_group, batch_format="pandas").to_pandas()
    assert (out["members_found"] == out["n_urls"]).all()
    return out.sort_values("lang").reset_index(drop=True)


def q_vector_quotient_membership(sf_dir: str) -> pd.DataFrame:
    """Oracled deterministic columns of the vector-quotient build."""
    out = q_vector_quotient_per_lang(sf_dir)
    res = out[["lang", "n_urls", "members_found"]].copy()
    res["n_urls"] = res["n_urls"].astype("int64")
    res["members_found"] = res["members_found"].astype("int64")
    return res.sort_values("lang").reset_index(drop=True)


def q_json_props_stats(sf_dir: str) -> pd.DataFrame:
    """Vectorized JSON extraction from the events `props` column (polars
    str.json_path_match inside map_batches — no per-row Python), aggregated
    per event_type. The scalar-function pattern for semi-structured cols."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        out = df.with_columns(
            pl.col("props").str.json_path_match("$.k")
            .cast(pl.Int64).alias("k")).drop("props")
        return out.to_arrow()

    out = ds.map_batches(extract, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"),
            Max("k", alias_name="max_k")).to_pandas()
    for c in ("n_events", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_JSON_PROPS = """
SELECT event_type,
       count(*)::BIGINT                              AS n_events,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_sketch_build_throughput(sf_dir: str) -> pd.DataFrame:
    """The north-metric job at correctness scale (replicate=1): one pass
    building BlockBloom + HLL + CMS + KLL per lang through the salted
    grouped merge. `bench.py --scaling` times this same job at 8 vs 32 CPUs.
    Approximate outputs — accuracy bounds asserted in tests; rows-only."""
    from .flagship import sketch_build_throughput_job

    return sketch_build_throughput_job(sf_dir, replicate=1)


def q_hibp_filter_report(sf_dir: str) -> pd.DataFrame:
    """The reference's HIBP end-to-end run (hibp.cpp:66-129) Ray-Data-first:
    synthesize an HIBP-format text corpus (keys = content hashes of the
    documents table), stream-parse it (bit-exact reversed-nibble decode),
    build TaffyBlock + TaffyCuckoo + frozen TCF over the keys, and compare
    each against the exact sorted-array ground truth on members (must all be
    found) and 64k non-member probes (fpp). Rows-only check (the parse is
    covered by its own bit-exactness pytest)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from ..sketch.hashing import hash_arrow_array
    from ..sketch.taffy_block import TaffyBlock
    from ..sketch.taffy_cuckoo import TaffyCuckoo
    from ..sources.hibp import read_hibp, write_hibp_file
    from ..stages.sketch_build import build_sketch

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    keys = np.unique(hash_arrow_array(docs["text"].combine_chunks()))
    tmpdir = tempfile.mkdtemp(prefix="lfr-hibp-", dir="/tmp")
    path = os.path.join(tmpdir, "corpus.txt")
    write_hibp_file(path, keys)
    try:
        parsed = read_hibp(path)
        # TBF sized for the known corpus ndv (as the reference's own bench
        # does with --ndv): the level-OR merge is exact while accumulators
        # stay within the level plan; growth under merge is exercised by the
        # grouped pipelines + unit tests instead
        tbf = build_sketch(parsed.select_columns(["key"]), "key",
                           "taffy_block", {"ndv": max(len(keys), 256),
                                           "fpp": 0.01},
                           pre_hashed=True)
        tcf = build_sketch(parsed.select_columns(["key"]), "key",
                           "taffy_cuckoo", {"bytes_": 1024},
                           pre_hashed=True)
    finally:
        import shutil

        shutil.rmtree(tmpdir, ignore_errors=True)
    fz = tcf.freeze()
    sorted_keys = np.sort(keys)
    rng = np.random.default_rng(99)
    probes = rng.integers(0, 2**64, 1 << 16, dtype=np.uint64)
    probes = probes[np.isin(probes, sorted_keys, invert=True)]
    rows = []
    for name, f in (("taffy_block", tbf), ("taffy_cuckoo", tcf),
                    ("frozen_tcf", fz)):
        rows.append({
            "filter": name,
            "n_keys": len(keys),
            "members_found": int(f.find_hashes(keys).sum()),
            "fpp_measured": round(float(f.find_hashes(probes).mean()), 5),
            "bytes": int(f.size_in_bytes()),
        })
    out = pd.DataFrame(rows)
    assert (out["members_found"] == out["n_keys"]).all()
    return out.reset_index(drop=True)


def q_hibp_members_complete(sf_dir: str) -> pd.DataFrame:
    """The deterministic, SQL-oracleable slice of the HIBP run: corpus
    keys (distinct document content hashes) round-trip the HIBP text
    format bit-exactly and every member is FOUND by all three filters —
    no-false-negative is a hard invariant, so members_found == n_keys ==
    COUNT(DISTINCT text) exactly (the fpp side stays in
    hibp_filter_report, bounded not exact). 64-bit content hashes are
    collision-free at any test scale, so distinct hashes == distinct
    texts."""
    full = q_hibp_filter_report(sf_dir)
    out = full[["filter", "n_keys", "members_found"]].copy()
    out["n_keys"] = out["n_keys"].astype("int64")
    out["members_found"] = out["members_found"].astype("int64")
    return out.sort_values("filter").reset_index(drop=True)


SQL_HIBP_MEMBERS = """
WITH k AS (SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n FROM documents)
SELECT f.filter, k.n AS n_keys, k.n AS members_found
FROM (VALUES ('frozen_tcf'), ('taffy_block'), ('taffy_cuckoo'))
  AS f(filter), k
ORDER BY f.filter
"""


# ---------------------------------------------------------------------------
# Training-data operators (dedup / ANN / text analysis / multimodal)
# ---------------------------------------------------------------------------

def q_text_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-lang text analysis (token counting incl. BPE-ish regex) —
    RE2 patterns evaluated identically by pyarrow and the DuckDB oracle.

    Uses the LEAN projection stage (2 regex passes; the full
    `text_stats_stage` runs ~13 column passes this aggregate never reads —
    prune compute like you prune columns)."""
    from ray.data.aggregate import Count, Sum

    from ..functions.textstats import token_count_stage

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    stats = ds.map_batches(token_count_stage, batch_format="pyarrow")
    out = stats.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="sum_tokens"),
        Sum("n_bpe_tokens", alias_name="sum_bpe_tokens"),
    ).to_pandas()
    for c in ("n_docs", "sum_tokens", "sum_bpe_tokens"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_TEXT_STATS = r"""
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_extract_all(text, '\S+')) END)::BIGINT
           AS sum_tokens,
       sum(len(regexp_extract_all(text,
           '''(?:[sdmt]|ll|ve|re)| ?[A-Za-zÀ-ÖØ-öø-ÿ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ÖØ-öø-ÿ0-9]+')))::BIGINT
           AS sum_bpe_tokens
FROM documents GROUP BY lang ORDER BY lang
"""


def q_exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Exact dedup over a corpus with planted duplicates (documents UNION
    its copy at doc_id+100000): hash-partitioned min-id survivor per distinct
    text, wide columns filtered by broadcast survivor set (never shuffled)."""
    from ..stages.dedup import exact_dedup

    base = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def clone_shift(t: pa.Table) -> pa.Table:
        shifted = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pa.array(np.asarray(t["doc_id"], dtype=np.int64) + 100000,
                     type=pa.int64()))
        return pa.concat_tables([t, shifted])

    dup = base.map_batches(clone_shift, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    out = exact_dedup(dup, "text", "doc_id").groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("doc_id", alias_name="sum_ids"),
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_ids"] = out["sum_ids"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_EXACT_DEDUP = """
WITH u AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang FROM documents
), keep AS (SELECT min(doc_id) AS keep_id FROM u GROUP BY text)
SELECT lang, count(*)::BIGINT AS n_docs, sum(doc_id)::BIGINT AS sum_ids
FROM u WHERE doc_id IN (SELECT keep_id FROM keep)
GROUP BY lang ORDER BY lang
"""


def q_checkpointed_dedup_resume(sf_dir: str) -> pd.DataFrame:
    """Resumable exact dedup (north rule "resumable from checkpoint"
    applied to the corpus's most expensive scan): the per-partition
    content-hash histogram is checkpointed (state/checkpoint.py:
    CheckpointedDedup), the job is "killed" after one partition, resumed in
    a fresh job object, and the deduped corpus aggregates identically to
    the single-shot exact dedup — same SQL oracle as exact_dedup_docs.
    Duplicates are planted by the clone-shift transform running inside each
    partition worker (union of per-partition clones == global clone)."""
    import shutil
    import tempfile

    from ..stages.dedup import exact_dedup_keys  # noqa: F401 (doc xref)
    from ..state.checkpoint import CheckpointedDedup

    def clone_shift(t: pa.Table) -> pa.Table:
        shifted = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pa.array(np.asarray(t["doc_id"], dtype=np.int64) + 100000,
                     type=pa.int64()))
        return pa.concat_tables([t, shifted])

    run_dir = tempfile.mkdtemp(prefix="lfr-dedup-", dir="/tmp")
    try:
        paths = [f"{sf_dir}/documents.parquet"]
        kw = dict(column="text", id_column="doc_id", target_rows=128,
                  transform=clone_shift, read_columns=["doc_id", "text"])
        job = CheckpointedDedup(f"{run_dir}/run", paths, **kw)
        job.run(max_partitions=1)              # interrupted mid-scan
        job2 = CheckpointedDedup(f"{run_dir}/run", paths, **kw)  # resume
        assert job2.status()["done"] >= 1      # picked up the checkpoint
        assert job2.run() is not None          # finish the remaining scan
        corpus = _read(sf_dir, "documents",
                       columns=["doc_id", "text", "lang"]) \
            .map_batches(clone_shift, batch_format="pyarrow")
        out = job2.dedup(corpus).groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("doc_id", alias_name="sum_ids")).to_pandas()
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_ids"] = out["sum_ids"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def q_line_dedup_stats(sf_dir: str) -> pd.DataFrame:
    """Corpus-level LINE dedup (C4/Gopher boilerplate removal): every
    duplicated line keeps only its global first occurrence (min (doc_id,
    ordinal)). Boilerplate is planted deterministically — each doc gains a
    shared footer line and a per-lang header line (the real-world shape:
    nav/footer lines repeated across a crawl). The engine explodes lines
    (16 B/line shuffle), runs the collision-proof exact dedup over the line
    table (stages/dedup.py:line_dedup_drop_ids), then computes per-lang
    kept/dropped/char stats in a second streaming pass."""
    import pyarrow.compute as pc

    from ..stages.dedup import LINE_ORD_BASE, exact_dedup_drop_ids, \
        explode_lines

    FOOTER = "COMMON FOOTER - ALL RIGHTS RESERVED"

    def add_boilerplate(t: pa.Table) -> pa.Table:
        hdr = pc.binary_join_element_wise("LANG HEADER", t["lang"], " ")
        full = pc.binary_join_element_wise(t["text"], FOOTER, hdr, "\n")
        return t.set_column(t.schema.get_field_index("text"), "text", full)

    corpus = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]) \
        .map_batches(add_boilerplate, batch_format="pyarrow")
    lines = corpus.map_batches(
        explode_lines("text", "doc_id", keep=("lang",)),
        batch_format="pyarrow")
    drop = exact_dedup_drop_ids(lines, "line", "line_id")
    assert len(drop) > 0  # the planted boilerplate must collapse
    ref = ray.put(drop)

    def stats_partial(t: pa.Table) -> pa.Table:
        drop = ray.get(ref)  # zero-copy plasma read per task
        ids = t["line_id"].to_numpy()
        pos = np.searchsorted(drop, ids)
        dropped = (pos < len(drop)) & (
            drop[np.minimum(pos, len(drop) - 1)] == ids)
        chars = np.asarray(pc.utf8_length(t["line"]), dtype=np.int64)
        lang = t["lang"]
        dict_arr = pc.dictionary_encode(
            lang.combine_chunks() if isinstance(lang, pa.ChunkedArray)
            else lang)
        codes = np.asarray(dict_arr.indices)
        n = len(dict_arr.dictionary)
        return pa.table({
            "lang": dict_arr.dictionary,
            "lines_kept": pa.array(
                np.bincount(codes[~dropped], minlength=n), type=pa.int64()),
            "lines_dropped": pa.array(
                np.bincount(codes[dropped], minlength=n), type=pa.int64()),
            "chars_kept": pa.array(
                np.bincount(codes[~dropped], weights=chars[~dropped],
                            minlength=n).astype(np.int64),
                type=pa.int64()),
        })

    out = lines.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("lang") \
        .aggregate(Sum("lines_kept", alias_name="lines_kept"),
                   Sum("lines_dropped", alias_name="lines_dropped"),
                   Sum("chars_kept", alias_name="chars_kept")) \
        .to_pandas()
    for c in ("lines_kept", "lines_dropped", "chars_kept"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_LINE_DEDUP_STATS = """
WITH aug AS (
  SELECT lang, doc_id,
         text || chr(10) || 'COMMON FOOTER - ALL RIGHTS RESERVED'
              || chr(10) || 'LANG HEADER ' || lang AS text
  FROM documents
), l AS (
  SELECT lang,
         doc_id * 1048576
           + UNNEST(range(1, len(string_split(text, chr(10))) + 1))
           AS line_id,
         UNNEST(string_split(text, chr(10))) AS line
  FROM aug
), k AS (
  SELECT lang, line, line_id,
         MIN(line_id) OVER (PARTITION BY line) AS first_id
  FROM l
)
SELECT lang,
       (COUNT(*) FILTER (WHERE line_id = first_id))::BIGINT AS lines_kept,
       (COUNT(*) FILTER (WHERE line_id <> first_id))::BIGINT
         AS lines_dropped,
       COALESCE(SUM(length(line)) FILTER (WHERE line_id = first_id),
                0)::BIGINT AS chars_kept
FROM k GROUP BY lang ORDER BY lang
"""


def q_doc_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-style WITHIN-document repetition quality signal: per doc, the
    lines that are exact repeats of an earlier line in the same doc
    (occurrences beyond the first), plus the >30% duplicate-line-fraction
    flag the Gopher filter uses. Purely streaming — repetition is a per-doc
    property, so there is NO shuffle at all: one map_batches computes per-doc
    counts and a tiny per-lang partial, then a 5-row groupby sums partials.
    Repetition is planted deterministically (even doc_ids duplicate their
    content line; every doc gains a unique tail line)."""
    import pyarrow.compute as pc

    def add_rep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        text = t["text"].combine_chunks() \
            if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        doubled = pc.binary_join_element_wise(text, text, "\n")
        body = pc.if_else(pa.array(ids % 2 == 0), doubled, text)
        tail = pc.binary_join_element_wise(
            "UNIQ", pc.cast(t["doc_id"], pa.string()), " ")
        full = pc.binary_join_element_wise(body, tail, "\n")
        return t.set_column(t.schema.get_field_index("text"), "text", full)

    def rep_partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"], "\n")
        lens = np.asarray(pc.fill_null(pc.list_value_length(lists), 0),
                          dtype=np.int64)
        flat = pc.list_flatten(lists)
        row_of = np.repeat(np.arange(len(lens)), lens)
        chars = np.asarray(pc.utf8_length(flat), dtype=np.int64)
        # exact within-doc repeat mask (beyond-first occurrences): pandas
        # duplicated on (row, line string) — vectorized, collision-free
        dup = pd.DataFrame({"r": row_of,
                            "s": flat.to_pandas()}).duplicated().to_numpy()
        n = len(lens)
        dup_lines = np.bincount(row_of[dup], minlength=n)
        dup_chars = np.bincount(row_of[dup], weights=chars[dup],
                                minlength=n).astype(np.int64)
        total_chars = np.bincount(row_of, weights=chars,
                                  minlength=n).astype(np.int64)
        flagged = dup_lines * 10 > 3 * lens  # dup fraction > 0.3, exact
        lang = t["lang"]
        dict_arr = pc.dictionary_encode(
            lang.combine_chunks() if isinstance(lang, pa.ChunkedArray)
            else lang)
        codes = np.asarray(dict_arr.indices)
        k = len(dict_arr.dictionary)
        agg = lambda v: pa.array(  # noqa: E731
            np.bincount(codes, weights=v, minlength=k).astype(np.int64),
            type=pa.int64())
        return pa.table({
            "lang": dict_arr.dictionary,
            "total_lines": agg(lens), "dup_lines": agg(dup_lines),
            "total_chars": agg(total_chars), "dup_chars": agg(dup_chars),
            "n_docs": agg(np.ones(n, dtype=np.int64)),
            "n_docs_flagged": agg(flagged.astype(np.int64)),
        })

    cols = ["total_lines", "dup_lines", "total_chars", "dup_chars",
            "n_docs", "n_docs_flagged"]
    out = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]) \
        .map_batches(add_rep, batch_format="pyarrow") \
        .map_batches(rep_partial, batch_format="pyarrow") \
        .groupby("lang") \
        .aggregate(*[Sum(c, alias_name=c) for c in cols]).to_pandas()
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_DOC_REPETITION_STATS = """
WITH aug AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 2 = 0 THEN text || chr(10) || text
              ELSE text END || chr(10) || 'UNIQ ' || doc_id AS text
  FROM documents
), l AS (
  SELECT doc_id, lang, UNNEST(string_split(text, chr(10))) AS line
  FROM aug
), g AS (
  SELECT doc_id, lang, line, COUNT(*) AS n, length(line) AS len
  FROM l GROUP BY doc_id, lang, line
), d AS (
  SELECT doc_id, lang,
         SUM(n) AS total_lines, SUM(n - 1) AS dup_lines,
         SUM(n * len) AS total_chars, SUM((n - 1) * len) AS dup_chars
  FROM g GROUP BY doc_id, lang
)
SELECT lang,
       SUM(total_lines)::BIGINT AS total_lines,
       SUM(dup_lines)::BIGINT AS dup_lines,
       SUM(total_chars)::BIGINT AS total_chars,
       SUM(dup_chars)::BIGINT AS dup_chars,
       COUNT(*)::BIGINT AS n_docs,
       (COUNT(*) FILTER (WHERE dup_lines * 10 > 3 * total_lines))::BIGINT
         AS n_docs_flagged
FROM d GROUP BY lang ORDER BY lang
"""


def q_top_words(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide top-25 words by occurrence — the canonical combiner
    shape: per-batch np.unique partial counts collapse each batch to its
    DISTINCT words before the shuffle (the all-to-all moves vocab-sized
    partials, not one row per word occurrence), then a groupby-Sum and a
    driver-side sort of the small vocab result. Ties broken (count DESC,
    word ASC) for determinism. Empty tokens from repeated spaces are
    dropped on both sides."""
    import pyarrow.compute as pc

    def word_partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"], " ")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        words, counts = np.unique(np.asarray(flat), return_counts=True)
        return pa.table({"word": pa.array(words.astype(str)),
                         "n": pa.array(counts, type=pa.int64())})

    agg = _read(sf_dir, "documents", columns=["text"]) \
        .map_batches(word_partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n")).to_pandas()
    agg["n"] = agg["n"].astype("int64")
    out = agg.sort_values(["n", "word"], ascending=[False, True]) \
        .head(25).reset_index(drop=True)
    return out[["word", "n"]]


SQL_TOP_WORDS = """
WITH w AS (
  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
)
SELECT word, COUNT(*)::BIGINT AS n
FROM w WHERE word <> ''
GROUP BY word ORDER BY n DESC, word ASC LIMIT 25
"""


def q_pii_scrub_stats(sf_dir: str) -> pd.DataFrame:
    """PII scrubbing (corpus cleaning): mask emails -> URLs -> IPv4 with the
    shared SCRUB_RULES RE2 patterns (functions/textstats.py) — the SAME
    pattern strings are injected into the DuckDB oracle, so replacement and
    counting are bit-identical across engines. PII is planted
    deterministically on 2/3 of docs (contact line with a per-doc email,
    URL and IP); zero-shuffle streaming: one map_batches emits per-lang
    partials, a 5-row groupby sums them."""
    import pyarrow.compute as pc

    from ..functions.textstats import scrub_match_counts, scrub_text

    def add_pii(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ids_s = pc.cast(t["doc_id"], pa.string())
        text = t["text"].combine_chunks() \
            if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        contact = pc.binary_join_element_wise(
            " Contact user", ids_s, "@example.com or https://site",
            pc.cast(pa.array(ids % 7), pa.string()),
            ".example.org/page via 10.0.",
            pc.cast(pa.array(ids % 256), pa.string()), ".",
            pc.cast(pa.array(ids % 100), pa.string()), "")
        full = pc.if_else(pa.array(ids % 3 != 2),
                          pc.binary_join_element_wise(text, contact, ""),
                          text)
        return t.set_column(t.schema.get_field_index("text"), "text", full)

    def scrub_partial(t: pa.Table) -> pa.Table:
        text = t["text"]
        clean = scrub_text(text)
        counts = scrub_match_counts(text)
        removed = np.asarray(pc.utf8_length(text), dtype=np.int64) \
            - np.asarray(pc.utf8_length(clean), dtype=np.int64)
        scrubbed = ~np.asarray(pc.equal(clean, text), dtype=bool)
        lang = t["lang"]
        dict_arr = pc.dictionary_encode(
            lang.combine_chunks() if isinstance(lang, pa.ChunkedArray)
            else lang)
        codes = np.asarray(dict_arr.indices)
        k = len(dict_arr.dictionary)
        agg = lambda v: pa.array(  # noqa: E731
            np.bincount(codes, weights=v, minlength=k).astype(np.int64),
            type=pa.int64())
        return pa.table({
            "lang": dict_arr.dictionary,
            "n_docs": agg(np.ones(len(codes), dtype=np.int64)),
            "n_scrubbed": agg(scrubbed.astype(np.int64)),
            "emails": agg(counts["emails"]), "urls": agg(counts["urls"]),
            "ips": agg(counts["ips"]), "chars_removed": agg(removed),
        })

    cols = ["n_docs", "n_scrubbed", "emails", "urls", "ips",
            "chars_removed"]
    out = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]) \
        .map_batches(add_pii, batch_format="pyarrow") \
        .map_batches(scrub_partial, batch_format="pyarrow") \
        .groupby("lang") \
        .aggregate(*[Sum(c, alias_name=c) for c in cols]).to_pandas()
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def _sql_pii_scrub() -> str:
    from ..functions.textstats import SCRUB_RULES

    (em, em_re, em_sub), (u, u_re, u_sub), (ip, ip_re, ip_sub) = SCRUB_RULES
    sql = """
WITH aug AS (
  SELECT lang, doc_id,
         CASE WHEN doc_id % 3 <> 2 THEN
           text || ' Contact user' || doc_id || '@example.com or https://site'
                || (doc_id % 7) || '.example.org/page via 10.0.'
                || (doc_id % 256) || '.' || (doc_id % 100)
         ELSE text END AS text
  FROM documents
), s AS (
  SELECT lang, text,
         regexp_replace(regexp_replace(regexp_replace(text,
             '<<EM>>', '[EMAIL]', 'g'),
             '<<URL>>', '[URL]', 'g'),
             '<<IP>>', '[IP]', 'g') AS clean,
         len(regexp_extract_all(text, '<<EM>>')) AS emails,
         len(regexp_extract_all(text, '<<URL>>')) AS urls,
         len(regexp_extract_all(text, '<<IP>>')) AS ips
  FROM aug
)
SELECT lang, COUNT(*)::BIGINT AS n_docs,
       (COUNT(*) FILTER (WHERE clean <> text))::BIGINT AS n_scrubbed,
       SUM(emails)::BIGINT AS emails, SUM(urls)::BIGINT AS urls,
       SUM(ips)::BIGINT AS ips,
       SUM(length(text) - length(clean))::BIGINT AS chars_removed
FROM s GROUP BY lang ORDER BY lang
"""
    return sql.replace("<<EM>>", em_re).replace("<<URL>>", u_re) \
        .replace("<<IP>>", ip_re)


SQL_PII_SCRUB_STATS = _sql_pii_scrub()


def q_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding centroid (class prototypes / IVF seeding): the
    vector-aggregation pattern — each batch collapses to one partial
    (label, dim) sum matrix, so the shuffle moves labels x dim rows per
    batch, never per vector. Exactness across engines: floats are
    quantized floor(v * 1e6) -> int64 BEFORE summing (identical IEEE
    double multiply + floor on both sides; integer sums are
    order-invariant), so the oracle hash-matches bit-for-bit — the
    centroid is sum_q / (1e6 * n)."""
    import pyarrow.compute as pc

    def centroid_partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) \
            else emb
        lens = np.asarray(pc.list_value_length(emb), dtype=np.int64)
        dim = int(lens[0]) if len(lens) else 0
        assert dim and (lens == dim).all()  # fixed-width corpus
        flat = np.asarray(pc.list_flatten(emb), dtype=np.float64)
        q = np.floor(flat * 1e6).astype(np.int64).reshape(-1, dim)
        labels = t["label"].to_numpy().astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim), type=pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                    len(uniq)), type=pa.int64()),
            "sum_q": pa.array(sums.ravel(), type=pa.int64()),
            "n": pa.array(np.repeat(counts, dim), type=pa.int64()),
        })

    out = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["label", "embedding"]) \
        .map_batches(centroid_partial, batch_format="pyarrow") \
        .groupby(["label", "dim"]) \
        .aggregate(Sum("sum_q", alias_name="sum_q"),
                   Sum("n", alias_name="n")).to_pandas()
    out["sum_q"] = out["sum_q"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


SQL_LABEL_CENTROIDS = """
WITH e AS (
  SELECT label,
         UNNEST(range(0, len(embedding))) AS dim,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS q
  FROM embeddings
)
SELECT label::BIGINT AS label, dim::BIGINT AS dim,
       SUM(q)::BIGINT AS sum_q, COUNT(*)::BIGINT AS n
FROM e GROUP BY label, dim ORDER BY label, dim
"""


def q_sequence_packing(sf_dir: str) -> pd.DataFrame:
    """Training sequence packing: next-fit docs into 256-token sequences per
    lang (deterministic doc_id order) — docs/seqs/tokens/waste per lang.
    Stage 1 streams the narrow (lang, doc_id, n_tokens) projection (wide
    text dies at the batch); stage 2 groups by lang and runs the
    searchsorted boundary-jump packer (functions/packing.py) on the sorted
    group — the shuffle moves 24 B/doc. At 10^12 scale pack per
    (lang, shard) instead (see packing.py docstring)."""
    return _pack_query(sf_dir, rows_per_shard=None)


def _pack_query(sf_dir: str, rows_per_shard: int | None) -> pd.DataFrame:
    from ..functions.packing import pack_stats_grouped_ds
    from ..functions.textstats import token_counts

    BUDGET = 256

    def tok_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"], "doc_id": t["doc_id"],
            "n_tokens": pa.array(token_counts(t["text"]), type=pa.int64()),
        })

    toks = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]) \
        .map_batches(tok_partial, batch_format="pyarrow")
    out = pack_stats_grouped_ds(
        toks, group_col="lang", id_column="doc_id", tokens_col="n_tokens",
        budget=BUDGET, rows_per_shard=rows_per_shard).to_pandas()
    for c in ("n_docs", "n_seqs", "total_tokens", "wasted_tokens"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def q_sequence_packing_sharded(sf_dir: str) -> pd.DataFrame:
    """The 10^12-scale form of sequence packing: docs pack per
    (lang, doc_id // 64) — contiguous id-range shards, order preserved
    within shards, <= 64 docs per task — and the per-shard partials sum
    per lang (functions/packing.py:pack_stats_grouped_ds). Shard
    boundaries are a deterministic function of doc_id, so the whole
    sharded computation oracles exactly: the SQL recursive CTE packs per
    (lang, doc_id // 64) too."""
    return _pack_query(sf_dir, rows_per_shard=64)


SQL_SEQUENCE_PACKING = r"""
WITH RECURSIVE toks AS (
  SELECT lang, doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_extract_all(text, '\S+')) END AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
), p AS (
  SELECT lang, rn, n_tokens, 1 AS seq, n_tokens AS fill
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.lang, t.rn, t.n_tokens,
         CASE WHEN p.fill + t.n_tokens <= 256 THEN p.seq ELSE p.seq + 1 END,
         CASE WHEN p.fill + t.n_tokens <= 256 THEN p.fill + t.n_tokens
              ELSE t.n_tokens END
  FROM p JOIN toks t ON t.lang = p.lang AND t.rn = p.rn + 1
), bins AS (
  SELECT lang, seq, SUM(n_tokens) AS fill FROM p GROUP BY lang, seq
)
SELECT lang,
       (SELECT COUNT(*) FROM toks t WHERE t.lang = bins.lang)::BIGINT
         AS n_docs,
       COUNT(*)::BIGINT AS n_seqs,
       SUM(fill)::BIGINT AS total_tokens,
       SUM(GREATEST(0, 256 - fill))::BIGINT AS wasted_tokens
FROM bins GROUP BY lang ORDER BY lang
"""


SQL_SEQUENCE_PACKING_SHARDED = r"""
WITH RECURSIVE toks AS (
  SELECT lang, doc_id // 64 AS shard, doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_extract_all(text, '\S+')) END AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY lang, doc_id // 64
                            ORDER BY doc_id) AS rn
  FROM documents
), p AS (
  SELECT lang, shard, rn, n_tokens, 1 AS seq, n_tokens AS fill
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.lang, t.shard, t.rn, t.n_tokens,
         CASE WHEN p.fill + t.n_tokens <= 256 THEN p.seq ELSE p.seq + 1 END,
         CASE WHEN p.fill + t.n_tokens <= 256 THEN p.fill + t.n_tokens
              ELSE t.n_tokens END
  FROM p JOIN toks t
    ON t.lang = p.lang AND t.shard = p.shard AND t.rn = p.rn + 1
), bins AS (
  SELECT lang, shard, seq, SUM(n_tokens) AS fill
  FROM p GROUP BY lang, shard, seq
)
SELECT lang,
       (SELECT COUNT(*) FROM toks t WHERE t.lang = bins.lang)::BIGINT
         AS n_docs,
       COUNT(*)::BIGINT AS n_seqs,
       SUM(fill)::BIGINT AS total_tokens,
       SUM(GREATEST(0, 256 - fill))::BIGINT AS wasted_tokens
FROM bins GROUP BY lang ORDER BY lang
"""


def q_ann_topk_brute(sf_dir: str) -> pd.DataFrame:
    """Exact distributed cosine top-5: queries = the 3 lowest-vec_id
    embeddings, broadcast once; per-block partial top-k then exact merge.
    float64 kernel for bit-parity with the double-precision SQL oracle."""
    import pyarrow.parquet as pq

    from ..stages.ann import brute_topk

    emb = _read(sf_dir, "embeddings")
    # queries = 3 LOWEST vec_ids (sorted explicitly — the oracle's ORDER BY
    # must not depend on the file's physical row order)
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet") \
        .sort_by("vec_id").slice(0, 3)
    Q = np.stack([np.asarray(v) for v in qtab["embedding"].to_pylist()])
    qids = np.asarray(qtab["vec_id"]).astype(np.int64)
    out = brute_topk(emb, Q, k=5, dtype=np.float64)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    out = out.drop(columns=["cosine"])  # float tie-breaks live in `rank`
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           ORDER BY vec_id LIMIT 3)
SELECT qid AS query_id, vec_id AS neighbor_id, rnk::BIGINT AS rank
FROM (
  SELECT q.qid, e.vec_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                    e.vec_id ASC) AS rnk
  FROM embeddings e CROSS JOIN q)
WHERE rnk <= 5 ORDER BY query_id, rank
"""


def q_ann_topk_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF approximate top-k (the ANN scale path) with DISTRIBUTED
    centroid training: full-corpus streaming Lloyd iterations
    (stages/ann.py:train_centroids_distributed — shuffle is
    k x (dim + 2) partials per block), then broadcast centroids +
    per-batch masked scoring. No SQL oracle (approximate by design); the
    query itself asserts mean recall >= 0.7 against the exact
    brute-force top-k on the same probes, so a training or probe-mask
    regression fails the run rather than drifting silently."""
    import pyarrow.parquet as pq

    from ..stages.ann import brute_topk, ivf_topk

    emb = _read(sf_dir, "embeddings")
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet") \
        .sort_by("vec_id").slice(0, 3)
    Q = np.stack([np.asarray(v) for v in qtab["embedding"].to_pylist()])
    out = ivf_topk(emb, Q, k=5, num_centroids=16, nprobe=8,
                   train="distributed")
    exact = brute_topk(_read(sf_dir, "embeddings"), Q, k=5)
    recalls = [
        len(set(exact[exact["query_id"] == qi]["neighbor_id"])
            & set(out[out["query_id"] == qi]["neighbor_id"])) / 5
        for qi in sorted(out["query_id"].unique())]
    assert np.mean(recalls) >= 0.7, recalls
    out["cosine"] = out["cosine"].round(4)
    return out.reset_index(drop=True)


def q_ann_topk_pq(sf_dir: str) -> pd.DataFrame:
    """Product-quantization approximate top-k with exact rerank (the ANN
    MEMORY-scale path: the corpus-resident state is m=8 uint8 codes per
    vector — 32x smaller than the dim-64 float32 embeddings). ADC
    scoring is per-batch lookup-table gathers, candidates rerank with
    true cosine on only the gathered vectors. No SQL oracle
    (approximate); the query asserts mean recall >= 0.8 vs brute force
    so codebook/ADC regressions fail the run."""
    import pyarrow.parquet as pq

    from ..stages.ann import brute_topk, pq_topk

    emb = _read(sf_dir, "embeddings")
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet") \
        .sort_by("vec_id").slice(0, 3)
    Q = np.stack([np.asarray(v) for v in qtab["embedding"].to_pylist()])
    out = pq_topk(emb, Q, k=5, m=8, ncodes=64, rerank=8)
    exact = brute_topk(_read(sf_dir, "embeddings"), Q, k=5)
    recalls = [
        len(set(exact[exact["query_id"] == qi]["neighbor_id"])
            & set(out[out["query_id"] == qi]["neighbor_id"])) / 5
        for qi in sorted(out["query_id"].unique())]
    assert np.mean(recalls) >= 0.8, recalls
    out["cosine"] = out["cosine"].round(4)
    return out.reset_index(drop=True)


def q_ann_topk_ivf_exhaustive(sf_dir: str) -> pd.DataFrame:
    """The IVF path under the driver's SQL gate: with nprobe =
    num_centroids every inverted list is probed, the centroid mask is
    all-True, and ivf_topk is EXACTLY brute force (same scores, same
    deterministic tie-break) — so the approximate operator's machinery
    (train -> broadcast -> per-batch masked scoring -> partial top-k ->
    exact merge) is validated end-to-end against SQL_ANN_TOPK. float64
    kernel for bit-parity with the double-precision oracle."""
    import pyarrow.parquet as pq

    from ..stages.ann import ivf_topk

    emb = _read(sf_dir, "embeddings")
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet") \
        .sort_by("vec_id").slice(0, 3)
    Q = np.stack([np.asarray(v) for v in qtab["embedding"].to_pylist()])
    qids = np.asarray(qtab["vec_id"]).astype(np.int64)
    out = ivf_topk(emb, Q, k=5, num_centroids=8, nprobe=8,
                   dtype=np.float64)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    out = out.drop(columns=["cosine"])  # float tie-breaks live in `rank`
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_ann_topk_pq_exhaustive(sf_dir: str) -> pd.DataFrame:
    """The PQ path under the driver's SQL gate: rerank*k >= batch_size
    makes every row of every block a rerank candidate, so the exact-cosine
    rerank IS brute force regardless of codebook quality — validating the
    encode/ADC/gather/rerank machinery end-to-end against SQL_ANN_TOPK
    (float64 rerank for oracle bit-parity)."""
    import pyarrow.parquet as pq

    from ..stages.ann import pq_topk

    emb = _read(sf_dir, "embeddings")
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet") \
        .sort_by("vec_id").slice(0, 3)
    Q = np.stack([np.asarray(v) for v in qtab["embedding"].to_pylist()])
    qids = np.asarray(qtab["vec_id"]).astype(np.int64)
    out = pq_topk(emb, Q, k=5, m=8, ncodes=64, rerank=820,
                  batch_size=4096, rerank_dtype=np.float64)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    out = out.drop(columns=["cosine"])
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _list_f64(A: np.ndarray) -> pa.ListArray:
    n, d = A.shape
    return pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
        pa.array(np.ascontiguousarray(A, dtype=np.float64).ravel(),
                 type=pa.float64()))


def q_embedding_exact_pairs(sf_dir: str) -> pd.DataFrame:
    """Distributed EXACT cosine similarity self-join (stages/ann.py:
    exact_cosine_pairs) — the deterministic, SQL-gated complement of the
    hyperplane-LSH `embedding_near_dup` row, exactly as
    ngram_jaccard_near_dup anchors MinHash+LSH. Planting is
    SQL-expressible: each vector is cloned at vec_id+100000 with +0.2 on
    its first component (planted-pair cosine 0.980-0.985 on this corpus vs
    max non-planted 0.567, so threshold 0.8 has a ~0.2 margin on both
    sides — float-summation-order noise between numpy and DuckDB is
    irrelevant). Two chunked passes exercise the bounded-broadcast shape;
    output is integer pairs only."""
    from ..stages.ann import exact_cosine_pairs

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "embedding": pa.array([], type=pa.list_(
                              pa.float64()))})
        if not len(ids):
            return empty
        col = t["embedding"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # float64 from the start: SQL casts each float32 element to DOUBLE
        # before adding 0.2, so the engine must too (exact same values)
        X = np.asarray(col.values, dtype=np.float64).reshape(len(ids), -1)
        P = X.copy()
        P[:, 0] += 0.2
        return pa.table({
            "vec_id": pa.array(np.concatenate([ids, ids + 100000])),
            "embedding": _list_f64(np.vstack([X, P])),
        })

    dup = emb.map_batches(plant, batch_format="pyarrow")
    pairs = exact_cosine_pairs(dup, threshold=0.8, num_chunks=2)
    out = pairs[["id_a", "id_b"]].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_EMBEDDING_EXACT_PAIRS = """
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         [CAST(embedding[1] AS DOUBLE) + 0.2]
           || list_transform(embedding[2:], x -> CAST(x AS DOUBLE))
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.8
ORDER BY id_a, id_b
"""


def q_minhash_near_dup(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dup detection over documents with planted near
    duplicates (each doc cloned at +100000 with a token appended). Returns
    confirmed pairs (exact Jaccard >= 0.6). Approximate recall — bounds
    asserted in tests, no SQL oracle."""
    from ..stages.dedup import minhash_near_dup_pairs

    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        near = pa.table({
            "doc_id": pa.array(ids + 100000, type=pa.int64()),
            "text": pc.binary_join_element_wise(
                t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
                else t["text"],
                pa.array([" appended tail token"] * len(ids)), ""),
        })
        return pa.concat_tables([t, near])

    dup = base.map_batches(plant, batch_format="pyarrow")
    pairs = minhash_near_dup_pairs(dup, "text", "doc_id", threshold=0.6)
    pairs["jaccard"] = pairs["jaccard"].round(3)
    pairs["id_a"] = pairs["id_a"].astype("int64")
    pairs["id_b"] = pairs["id_b"].astype("int64")
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_simhash_near_dup(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup pairs (Hamming <= 3 via 4x16-bit pigeonhole bands)
    over documents + planted exact copies. No SQL oracle (bit-level op)."""
    from ..stages.dedup import simhash_near_dup_pairs

    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        clone = pa.table({"doc_id": pa.array(ids + 100000, type=pa.int64()),
                          "text": t["text"]})
        return pa.concat_tables([t, clone])

    dup = base.map_batches(plant, batch_format="pyarrow")
    pairs = simhash_near_dup_pairs(dup, "text", "doc_id", max_hamming=3)
    pairs["id_a"] = pairs["id_a"].astype("int64")
    pairs["id_b"] = pairs["id_b"].astype("int64")
    pairs["hamming"] = pairs["hamming"].astype("int64")
    return pairs.reset_index(drop=True)


def q_embedding_near_dup(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH buckets +
    in-bucket exact verification. The raw synthetic embeddings have no true
    near-dups, so each vector is re-planted at vec_id+100000 with
    deterministic tiny noise — every planted pair must be recovered (modulo
    LSH's probabilistic recall). Noise is a pure per-ROW function of vec_id
    (splitmix64 counter stream), so the planted corpus is identical under
    ANY block partitioning / parallelism. No SQL oracle."""
    from ..sketch.hashing import splitmix64
    from ..stages.dedup import embedding_near_dup_pairs

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        if not len(ids):  # reshape(0, -1) cannot infer the second dim
            return t.select(["vec_id", "embedding"])
        col = t["embedding"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        X = np.asarray(col.values, dtype=np.float32).reshape(len(ids), -1)
        # deterministic uniform noise in [-0.004, 0.004): counter-based on
        # (vec_id, dim) so it does not depend on batch boundaries
        ctr = (ids[:, None].astype(np.uint64) * np.uint64(X.shape[1])
               + np.arange(X.shape[1], dtype=np.uint64)[None, :])
        u = splitmix64(ctr.ravel(), seed=0x4015E)
        noise = ((u.astype(np.float64) / 2.0**64 - 0.5) * 0.008) \
            .astype(np.float32).reshape(X.shape)
        near = pa.table({
            "vec_id": pa.array(ids + 100000, type=pa.int64()),
            "embedding": pa.array([[float(x) for x in row]
                                   for row in X + noise],
                                  type=pa.list_(pa.float32())),
        })
        return pa.concat_tables([t.select(["vec_id", "embedding"])
                                 .cast(near.schema), near])

    dup = emb.map_batches(plant, batch_format="pyarrow")
    pairs = embedding_near_dup_pairs(dup, "embedding", "vec_id", dim=64,
                                     threshold=0.98, num_planes=10)
    pairs["cosine"] = pairs["cosine"].round(3)
    pairs["id_a"] = pairs["id_a"].astype("int64")
    pairs["id_b"] = pairs["id_b"].astype("int64")
    return pairs.reset_index(drop=True)


def q_multimodal_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing demo: attach deterministic binary image payloads,
    extract features in an actor-pool stage (decode stubbed — no codecs in
    this environment), aggregate per lang. SQL-oracled since round 4: the
    payload sizes are splitmix64(doc_id, 0x1A6E) % 3840 + 256, and
    splitmix64 is exactly expressible in DuckDB (HUGEINT modular
    arithmetic with 32-bit-split multiplies — SQL_MULTIMODAL_FEATURES),
    so sum_bytes hash-gates the attach stage's actual payload lengths.
    The aggregate is an exact int64 SUM, not a rounded average — pandas
    rounds half-even, DuckDB half-away, and a per-lang mean can land on
    a representable .xx5 tie on regenerated data."""
    from ray.data.aggregate import Count, Sum

    from ..stages.multimodal import ImageFeatureStage, attach_fake_images

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    feats = ds.map_batches(attach_fake_images, batch_format="pyarrow",
                           batch_size=256) \
        .map_batches(ImageFeatureStage, batch_format="pyarrow",
                     batch_size=256, concurrency=(2, 16))
    out = feats.groupby("lang").aggregate(
        Count(alias_name="n_images"),
        Sum("image_bytes", alias_name="sum_bytes"),
    ).to_pandas()
    out["n_images"] = out["n_images"].astype("int64")
    out["sum_bytes"] = out["sum_bytes"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


# splitmix64 in ANSI SQL (DuckDB): z = x + (seed*GAMMA + 1) mod 2^64;
# two xorshift-multiply rounds; final xorshift. Multiplies split the
# variable operand into 32-bit halves so HUGEINT (int128) never
# overflows: (z*C) mod 2^64 = (lo32(z)*C + ((hi32(z)*C) mod 2^32)<<32)
# mod 2^64. Validated bit-exact against sketch/hashing.py:splitmix64.
_SM_ADD_IMG = (0x1A6E * 0x9E3779B97F4A7C15 + 1) % (1 << 64)
_M64 = 1 << 64


def _sql_mulmod64(z: str, c: int) -> str:
    return (f"CAST(((({z}) % 4294967296) * {c} + "
            f"(((({z}) // 4294967296) * {c}) % 4294967296) * 4294967296)"
            f" % {_M64} AS UBIGINT)")


SQL_MULTIMODAL_FEATURES = f"""
WITH s0 AS (
  SELECT lang,
         CAST((CAST(doc_id AS HUGEINT) + {_SM_ADD_IMG}) % {_M64}
              AS UBIGINT) AS z
  FROM documents
),
s1 AS (SELECT lang,
              {_sql_mulmod64("CAST(xor(z, z >> 30) AS HUGEINT)",
                             0xBF58476D1CE4E5B9)} AS z FROM s0),
s2 AS (SELECT lang,
              {_sql_mulmod64("CAST(xor(z, z >> 27) AS HUGEINT)",
                             0x94D049BB133111EB)} AS z FROM s1),
sizes AS (
  SELECT lang, CAST(xor(z, z >> 31) % 3840 + 256 AS BIGINT) AS nbytes
  FROM s2
)
SELECT lang, count(*)::BIGINT AS n_images,
       sum(nbytes)::BIGINT AS sum_bytes
FROM sizes GROUP BY lang ORDER BY lang
"""


def q_multimodal_meta_counts(sf_dir: str) -> pd.DataFrame:
    """SQL-gated slice of the multimodal plumbing: the image pipeline runs
    for REAL (deterministic payload attach -> actor-pool feature stage, the
    wide binary column dying in-stage), and the aggregate groups on typed
    metadata the oracle can recompute — format is doc_id-parity by
    construction (stages/multimodal.py:attach_fake_images). The exact-count
    companion to the rows-only `multimodal_features` row, same pattern as
    the membership companions of the sketch-payload rows."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ..stages.multimodal import ImageFeatureStage, attach_fake_images

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    feats = ds.map_batches(attach_fake_images, batch_format="pyarrow",
                           batch_size=256) \
        .map_batches(ImageFeatureStage, batch_format="pyarrow",
                     batch_size=256, concurrency=(2, 16))

    def meta_only(t: pa.Table) -> pa.Table:
        meta = t["image_meta"]
        meta = meta.combine_chunks() if isinstance(meta, pa.ChunkedArray) \
            else meta
        return pa.table({"lang": t["lang"],
                         "format": pc.struct_field(meta, "format")})

    out = feats.map_batches(meta_only, batch_format="pyarrow") \
        .groupby(["lang", "format"]) \
        .aggregate(Count(alias_name="n_images")).to_pandas()
    out["n_images"] = out["n_images"].astype("int64")
    return out.sort_values(["lang", "format"]).reset_index(drop=True)


SQL_MULTIMODAL_META_COUNTS = """
SELECT lang,
       CASE WHEN doc_id % 2 = 0 THEN 'jpeg' ELSE 'png' END AS format,
       count(*)::BIGINT AS n_images
FROM documents GROUP BY lang, format ORDER BY lang, format
"""


def q_domain_doc_counts(sf_dir: str) -> pd.DataFrame:
    """High-cardinality grouped build — the north star's per-DOMAIN case
    (thousands of keys, not 5 langs): a synthetic domain key (source x
    doc_id%97, ~2000 values) derived deterministically per row, then
    per-domain HLL through the salted two-stage merge with sort-split
    partials (one argsort per block, zero-copy per-key slices). The exact
    per-domain row counts ride the same shuffle and are DuckDB-oracled;
    the HLL estimates are bound-asserted in-query."""
    import pyarrow.compute as pc

    from ..sketch.hll import HyperLogLog
    from ..stages.sketch_build import build_grouped_sketches

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def with_domain(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        src = t["source"].combine_chunks() \
            if isinstance(t["source"], pa.ChunkedArray) else t["source"]
        dom = pc.binary_join_element_wise(
            src, "-d", pc.cast(pa.array(ids % 97), pa.string()), "")
        return pa.table({"domain": dom, "text": t["text"]})

    grouped = build_grouped_sketches(
        ds.map_batches(with_domain, batch_format="pyarrow"),
        "domain", "text", "hll", {"p": 12})
    rows = grouped["rows"].to_numpy().astype(np.int64)
    est = np.array([HyperLogLog.from_bytes(p).estimate()
                    for p in grouped["payload"]])
    # per-domain counts are tiny (1-10 docs): HLL with small-range
    # correction is near-exact there — a loose 15% mean bound catches
    # a broken merge path without flaking on estimator bias
    assert float(np.mean(np.abs(est - rows) / np.maximum(rows, 1))) < 0.15
    out = pd.DataFrame({"domain": grouped["domain"], "n_docs": rows})
    return out.sort_values("domain").reset_index(drop=True)


SQL_DOMAIN_COUNTS = """
SELECT source || '-d' || CAST(doc_id % 97 AS VARCHAR) AS domain,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY domain ORDER BY domain
"""


def q_tcf_per_domain(sf_dir: str) -> pd.DataFrame:
    """Per-domain GROWABLE taffy-cuckoo filters at high key cardinality —
    the north star's "growable filters for hot domains" case: the same
    synthetic ~2000-value domain key as `domain_doc_counts`, but the
    grouped build produces one mergeable TCF per domain (union =
    c/lib/taffy-cuckoo.c:260-348) through the salted two-stage merge,
    where the raw-hash shuffle guard matters most (tiny domains ship 8-byte
    hash lists, not 512-byte filters). Probe is a second streaming pass
    against the broadcast payload dict. Zero false negatives make
    members_found deterministic (= n_docs), so counts oracle; filter bytes
    depend on the merge path and stay in-query-asserted only."""
    import pyarrow.compute as pc

    from ..sketch.taffy_cuckoo import TaffyCuckoo
    from ..stages.sketch_build import (build_grouped_sketches,
                                       grouped_probe_counts)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def with_domain(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        src = t["source"].combine_chunks() \
            if isinstance(t["source"], pa.ChunkedArray) else t["source"]
        dom = pc.binary_join_element_wise(
            src, "-d", pc.cast(pa.array(ids % 97), pa.string()), "")
        return pa.table({"domain": dom, "text": t["text"]})

    keyed = ds.map_batches(with_domain, batch_format="pyarrow")
    built = build_grouped_sketches(keyed, "domain", "text", "taffy_cuckoo",
                                   {"bytes_": 512})
    # growable contract: every per-domain filter holds at least its keys
    # (capacity >= rows proves upsizing engaged where needed)
    caps = np.array([TaffyCuckoo.from_bytes(p).capacity()
                     for p in built["payload"]])
    assert (caps >= built["rows"].to_numpy()).all()

    payloads = {row["domain"]: bytes(row["payload"])
                for _, row in built.iterrows()}
    fref = ray.put(payloads)
    probe = grouped_probe_counts(fref, TaffyCuckoo.from_bytes,
                                 "domain", "text")
    out = keyed.map_batches(probe, batch_format="pyarrow") \
        .groupby("domain").aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("found", alias_name="members_found")).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["members_found"] = out["members_found"].astype("int64")
    assert (out["members_found"] == out["n_docs"]).all()
    return out.sort_values("domain").reset_index(drop=True)


SQL_TCF_PER_DOMAIN = """
SELECT source || '-d' || CAST(doc_id % 97 AS VARCHAR) AS domain,
       count(*)::BIGINT AS n_docs, count(*)::BIGINT AS members_found
FROM documents GROUP BY domain ORDER BY domain
"""


def q_tbf_exact_membership(sf_dir: str) -> pd.DataFrame:
    """Partition-invariant exact TaffyBlock build (raw-hash canonicalized
    single-writer finalize, stages/sketch_build.py:build_sketch_exact) over
    document texts, verified by a broadcast streaming probe: every document
    must be found (no false negatives regardless of partitioning)."""
    from ray.data.aggregate import Sum

    from ..sketch.hashing import hash_arrow_array as _hash
    from ..sketch.taffy_block import TaffyBlock
    from ..stages.sketch_build import build_sketch_exact

    ds = _read(sf_dir, "documents", columns=["text"])
    tbf = build_sketch_exact(ds, "text", "taffy_block",
                             {"ndv": 256, "fpp": 0.01})
    payload = tbf.to_bytes()
    ref = ray.put(payload)

    from ..stages.dedup import _cached_filter

    def probe(t: pa.Table) -> pa.Table:
        f = _cached_filter(ref, TaffyBlock.from_bytes)
        h = _hash(t["text"])
        return pa.table({
            "n": pa.array([t.num_rows], type=pa.int64()),
            "found": pa.array([int(f.find_hashes(h).sum())],
                              type=pa.int64())})

    agg = ds.map_batches(probe, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n_docs"),
                   Sum("found", alias_name="members_found"))
    return pd.DataFrame([{
        "n_docs": int(agg["n_docs"]),
        "members_found": int(agg["members_found"]),
    }])


SQL_TBF_EXACT = """
SELECT count(*)::BIGINT AS n_docs, count(*)::BIGINT AS members_found
FROM documents
"""


def q_block_bloom_membership(sf_dir: str) -> pd.DataFrame:
    """Deterministic (oracled) face of the flagship BlockBloom pipeline:
    per-lang page counts + membership completeness — no false negatives
    means members_found == n_pages exactly, which DuckDB can state as
    count(*). The fpp columns stay in `block_bloom_per_lang`."""
    from .flagship import flagship

    out = flagship(sf_dir)
    return pd.DataFrame({
        "lang": out["lang"],
        "n_pages": out["rows"].astype("int64"),
        "members_found": out["members_found"].astype("int64"),
    }).sort_values("lang").reset_index(drop=True)


SQL_BLOCK_BLOOM_MEMBERSHIP = """
SELECT lang, count(*)::BIGINT AS n_pages, count(*)::BIGINT AS members_found
FROM documents GROUP BY lang ORDER BY lang
"""


def q_bloom_intersect_members(sf_dir: str) -> pd.DataFrame:
    """Filter INTERSECTION under the hash gate — the set op the
    reference leaves TODO (c/lib/block.c:68): two equal-sized BlockBlooms
    are built distributed over two document subsets (long docs;
    English docs), AND-intersected, and the intersected filter is probed
    with the EXACT intersection set (both predicates pushed into one
    Arrow scan). Superset semantics make this oracled: a key in both
    builds has all 8 bits set in both bucket rows, so members_found ==
    COUNT(*) of the conjunction exactly."""
    from ..sketch import sizing
    from ..sketch.block_bloom import BlockBloom
    from ..sketch.hashing import hash_arrow_array
    from ..stages.dedup import _cached_filter
    from ..stages.sketch_build import build_sketch

    docs_a = _read(sf_dir, "documents", columns=["doc_id"],
                   filter=pc.field("n_chars") >= 150)
    docs_b = _read(sf_dir, "documents", columns=["doc_id"],
                   filter=pc.field("lang") == "en")
    n_a, n_b = docs_a.count(), docs_b.count()
    bytes_ = sizing.block_bytes_needed(max(n_a, n_b, 1), 0.001)
    fa = build_sketch(docs_a, "doc_id", "block", {"bytes_": bytes_})
    fb = build_sketch(docs_b, "doc_id", "block", {"bytes_": bytes_})
    fref = ray.put(fa.intersect(fb).to_bytes())

    def probe(t: pa.Table) -> pa.Table:
        f = _cached_filter(fref, BlockBloom.from_bytes)
        found = f.find_hashes(hash_arrow_array(t["doc_id"]))
        return pa.table({
            "n_both": pa.array(np.ones(t.num_rows, np.int64)),
            "members_found": pa.array(found.astype(np.int64))})

    both = _read(sf_dir, "documents", columns=["doc_id"],
                 filter=(pc.field("n_chars") >= 150)
                 & (pc.field("lang") == "en"))
    agg = both.map_batches(probe, batch_format="pyarrow") \
        .sum(["n_both", "members_found"])
    return pd.DataFrame([{
        "n_a": np.int64(n_a), "n_b": np.int64(n_b),
        "n_both": np.int64(agg["sum(n_both)"]),
        "members_found": np.int64(agg["sum(members_found)"])}])


SQL_BLOOM_INTERSECT = """
SELECT
  (SELECT count(*) FROM documents WHERE n_chars >= 150)::BIGINT AS n_a,
  (SELECT count(*) FROM documents WHERE lang = 'en')::BIGINT AS n_b,
  (SELECT count(*) FROM documents
   WHERE n_chars >= 150 AND lang = 'en')::BIGINT AS n_both,
  (SELECT count(*) FROM documents
   WHERE n_chars >= 150 AND lang = 'en')::BIGINT AS members_found
"""


def q_growable_membership(sf_dir: str) -> pd.DataFrame:
    """Oracled deterministic columns of the growable-filter pipeline
    (taffy-block + taffy-cuckoo + frozen TCF membership completeness)."""
    out = q_growable_filters_per_lang(sf_dir)
    cols = ["n_urls", "tbf_found", "tcf_found", "frozen_found"]
    res = out[["lang"] + cols].copy()
    for c in cols:
        res[c] = res[c].astype("int64")
    return res.sort_values("lang").reset_index(drop=True)


SQL_GROWABLE_MEMBERSHIP = """
SELECT lang,
       count(*)::BIGINT AS n_urls,
       count(*)::BIGINT AS tbf_found,
       count(*)::BIGINT AS tcf_found,
       count(*)::BIGINT AS frozen_found
FROM documents GROUP BY lang ORDER BY lang
"""


def q_static_xor_membership(sf_dir: str) -> pd.DataFrame:
    """Oracled deterministic columns of the static-xor per-lang build."""
    out = q_static_xor_per_lang(sf_dir)
    res = out[["lang", "n_urls", "members_found"]].copy()
    res["n_urls"] = res["n_urls"].astype("int64")
    res["members_found"] = res["members_found"].astype("int64")
    return res.sort_values("lang").reset_index(drop=True)


SQL_STATIC_XOR_MEMBERSHIP = """
SELECT lang, count(*)::BIGINT AS n_urls, count(*)::BIGINT AS members_found
FROM documents GROUP BY lang ORDER BY lang
"""


def q_minimal_taffy_membership(sf_dir: str) -> pd.DataFrame:
    """Oracled deterministic columns of the minimal-taffy-cuckoo build."""
    out = q_minimal_taffy_per_lang(sf_dir)
    res = out[["lang", "n_urls", "members_found"]].copy()
    res["n_urls"] = res["n_urls"].astype("int64")
    res["members_found"] = res["members_found"].astype("int64")
    return res.sort_values("lang").reset_index(drop=True)


SQL_MINIMAL_TAFFY_MEMBERSHIP = SQL_STATIC_XOR_MEMBERSHIP


def q_cuckoo_membership(sf_dir: str) -> pd.DataFrame:
    """Per-lang standard cuckoo filter (Fan et al. 2014 — the reference's
    bench-baseline sketch, cpp/extras/benchmarks/bench.cpp:79-118) built
    with groupby(lang).map_groups (not union-mergeable, so each group's
    hashes feed one build task, like the static-xor build) and probed for
    every member plus 2^17 planted misses. Cuckoo filters have no false
    negatives — update()'s set semantics skip only keys the filter
    already answers present — so members_found == n_urls
    deterministically; fpp_ok pins the measured planted-miss rate under
    2x the fingerprint bound 2b/(2^f - 1) (hashing is seeded, so the
    measurement is deterministic, just not SQL-computable)."""
    from ..sketch.cuckoo import SLOTS_PER_BUCKET, CuckooFilter
    from ..sketch.hashing import hash_arrow_array
    from ..sources.webpages import read_webpages

    pages = read_webpages(sf_dir, include_html=False) \
        .select_columns(["url", "lang"])
    probes_ref = ray.put(hash_arrow_array(pa.array(
        [f"https://absent.example.net/{i}" for i in range(1 << 17)])))

    def build_group(df: pd.DataFrame) -> pd.DataFrame:
        probes = ray.get(probes_ref)
        h = hash_arrow_array(pa.array(df["url"]))
        # 2x ndv headroom: the paper's 95% load bound is asymptotic —
        # tiny per-lang groups (tens of keys -> 64-slot tables) hit
        # kick-chain overflow variance at high load
        f = CuckooFilter(ndv=max(2 * len(df), 256), fp_bits=12)
        f.update(h)
        fpp = float(f.find_hashes(probes).mean())
        bound = 2 * SLOTS_PER_BUCKET / ((1 << 12) - 1)
        return pd.DataFrame({
            "lang": [df["lang"].iloc[0]],
            "n_urls": [np.int64(len(df))],
            "members_found": [np.int64(f.find_hashes(h).sum())],
            "fpp_ok": [bool(fpp <= 2 * bound)],
        })

    out = pages.groupby("lang").map_groups(
        build_group, batch_format="pandas").to_pandas()
    assert (out["members_found"] == out["n_urls"]).all()
    assert out["fpp_ok"].all()
    out["n_urls"] = out["n_urls"].astype("int64")
    out["members_found"] = out["members_found"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_CUCKOO_MEMBERSHIP = """
SELECT lang, count(*)::BIGINT AS n_urls, count(*)::BIGINT AS members_found,
       TRUE AS fpp_ok
FROM documents GROUP BY lang ORDER BY lang
"""


def q_incremental_growable(sf_dir: str) -> pd.DataFrame:
    """The growable filters' raison d'être — taffy GROWTH across batches
    (doc/taffy/taffy.tex; InsertPersists across upsizes in the reference's
    test suites): build per-lang taffy-cuckoo filters on HALF the corpus
    (even doc_ids) via the salted grouped merge, then GROW those same
    filter objects with the other half in a second distributed pass
    (per-lang map_groups inserting into the deserialized phase-1 filter),
    and probe ALL docs streaming. Zero false negatives across growth make
    members_found deterministic (= n_docs per lang), so the output
    oracles."""
    from ..sketch.hashing import hash_arrow_array
    from ..sketch.taffy_cuckoo import TaffyCuckoo
    from ..stages.broadcast import cached_broadcast
    from ..stages.sketch_build import build_grouped_sketches

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def _half(parity: int):
        def f(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            return t.filter(pa.array(ids % 2 == parity))
        return f

    half1 = ds.map_batches(_half(0), batch_format="pyarrow")
    half2 = ds.map_batches(_half(1), batch_format="pyarrow")

    built = build_grouped_sketches(half1, "lang", "text", "taffy_cuckoo",
                                   {"bytes_": 512})
    phase1 = {r["lang"]: bytes(r["payload"]) for _, r in built.iterrows()}
    p1_ref = ray.put(phase1)

    def grow(df: pd.DataFrame) -> pd.DataFrame:
        lang = df["lang"].iloc[0]
        payloads = ray.get(p1_ref)
        # a lang whose docs all have odd ids has no phase-1 filter: grow
        # from a fresh one (same spec) instead of KeyError'ing
        f = (TaffyCuckoo.from_bytes(payloads[lang])
             if lang in payloads else TaffyCuckoo(bytes_=512))
        f.add_hashes(hash_arrow_array(pa.array(df["text"],
                                               type=pa.large_string())))
        return pd.DataFrame({"lang": [lang], "payload": [f.to_bytes()]})

    grown = half2.groupby("lang").map_groups(grow, batch_format="pandas") \
        .to_pandas()
    # all-even langs never pass through grow(): fall back to their
    # phase-1 filter so the probe covers every lang
    final_payloads = dict(phase1)
    final_payloads.update({r["lang"]: bytes(r["payload"])
                           for _, r in grown.iterrows()})
    g_ref = ray.put(final_payloads)

    from ..stages.sketch_build import grouped_probe_counts
    probe = grouped_probe_counts(g_ref, TaffyCuckoo.from_bytes,
                                 "lang", "text")

    out = ds.map_batches(probe, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("found", alias_name="members_found")).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["members_found"] = out["members_found"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_INCREMENTAL_GROWABLE = """
SELECT lang, count(*)::BIGINT AS n_docs, count(*)::BIGINT AS members_found
FROM documents GROUP BY lang ORDER BY lang
"""


def q_bloom_per_lang_source(sf_dir: str) -> pd.DataFrame:
    """Composite-key grouped build: one BlockBloom per (lang, source) —
    the key is a derived `lang|source` column fed through the same salted
    two-stage grouped merge — then a streaming broadcast probe. Zero false
    negatives make members_found deterministic (= n_docs per group), so
    the whole output oracles."""
    import pyarrow.compute as pc

    from ..sketch.block_bloom import BlockBloom
    from ..sketch.hashing import hash_arrow_array
    from ..stages.dedup import _str
    from ..stages.sketch_build import build_grouped_sketches

    ds = _read(sf_dir, "documents", columns=["lang", "source", "text"])

    def composite(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            _str(t["lang"]), _str(t["source"]), "|")
        return pa.table({"grp": key, "text": t["text"]})

    keyed = ds.map_batches(composite, batch_format="pyarrow")
    built = build_grouped_sketches(keyed, "grp", "text", "block",
                                   {"bytes_": 1 << 14})
    from ..stages.sketch_build import grouped_probe_counts
    payloads = {row["grp"]: bytes(row["payload"])
                for _, row in built.iterrows()}
    fref = ray.put(payloads)
    probe = grouped_probe_counts(fref, BlockBloom.from_bytes, "grp", "text")

    agg = keyed.map_batches(probe, batch_format="pyarrow") \
        .groupby("grp").aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("found", alias_name="members_found")).to_pandas()
    parts = agg["grp"].str.split("|", n=1, expand=True)
    out = pd.DataFrame({
        "lang": parts[0], "source": parts[1],
        "n_docs": agg["n_docs"].astype("int64"),
        "members_found": agg["members_found"].astype("int64"),
    })
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


SQL_BLOOM_PER_LANG_SOURCE = """
SELECT lang, source, count(*)::BIGINT AS n_docs,
       count(*)::BIGINT AS members_found
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


def q_events_asof_orders(sf_dir: str) -> pd.DataFrame:
    """Distributed AS-OF join (stages/joins.py — the ordered join Ray Data
    lacks): each event picks its user's most recent order at-or-before the
    event timestamp via key-hash co-partitioned shards + one
    pandas.merge_asof scan per shard. The right side is pre-deduplicated to
    one row per (custkey, orderdate) so the as-of pick is deterministic;
    oracled against DuckDB ASOF LEFT JOIN."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Sum

    from ..stages.joins import asof_join

    events = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_totalprice"])
    dedup = orders.groupby(["o_custkey", "o_orderdate"]).aggregate(
        Max("o_totalprice", alias_name="best_price"))

    def rename_key(t: pa.Table) -> pa.Table:
        return t.rename_columns(["user_id", "o_orderdate", "best_price"])

    joined = asof_join(events, dedup.map_batches(rename_key,
                                                 batch_format="pyarrow"),
                       on="user_id", left_ts="ts", right_ts="o_orderdate",
                       left_cols=["event_type"], right_cols=["best_price"])

    def add_matched(t: pa.Table) -> pa.Table:
        return t.append_column(
            "matched", pc.cast(pc.is_valid(t["best_price"]), pa.int64()))

    out = joined.map_batches(add_matched, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Count(alias_name="n_events"),
            Sum("matched", alias_name="n_matched"),
            Sum("best_price", alias_name="sum_price")).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["n_matched"] = out["n_matched"].astype("int64")
    out["sum_price"] = out["sum_price"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_EVENTS_ASOF = """
WITH r AS (SELECT o_custkey AS user_id, o_orderdate,
                  max(o_totalprice) AS best_price
           FROM orders GROUP BY 1, 2)
SELECT event_type,
       count(*)::BIGINT            AS n_events,
       count(best_price)::BIGINT   AS n_matched,
       round(sum(best_price), 2)   AS sum_price
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
GROUP BY event_type ORDER BY event_type
"""


def q_value_band_range_join(sf_dir: str) -> pd.DataFrame:
    """Range join (overlapping intervals) of events.value against a small
    broadcast band table — the non-equi join Ray Data lacks, expressed as
    K vectorized masks per batch (stages/joins.py:broadcast_range_join);
    a row can land in several bands. Oracled against a DuckDB non-equi
    JOIN over the same inline interval table."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import broadcast_range_join

    # 12 overlapping [lo, lo+40) bands over the events value range
    bands = [(i, i * 25.0, i * 25.0 + 40.0) for i in range(12)]
    ds = _read(sf_dir, "events", columns=["value"])
    joined = broadcast_range_join(ds, "value", bands)
    out = joined.groupby("band_id").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value")).to_pandas()
    out["band_id"] = out["band_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("band_id").reset_index(drop=True)


SQL_VALUE_BAND_RANGE_JOIN = """
WITH bands(band_id, lo, hi) AS (
  SELECT i, i * 25.0, i * 25.0 + 40.0 FROM range(12) t(i))
SELECT band_id::BIGINT        AS band_id,
       count(*)::BIGINT       AS n_events,
       round(sum(value), 2)   AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band_id ORDER BY band_id
"""


def q_punct_stopword_stats(sf_dir: str) -> pd.DataFrame:
    """Quality-signal counting kernels under the oracle gate: per-lang sums
    of punctuation marks and English stopword hits — the same RE2 patterns
    `quality_stats` uses for its composite score, evaluated identically by
    pyarrow's re2 and DuckDB's re2."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..functions.textstats import LANG_MARKERS, PUNCT, _str

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def counts(t: pa.Table) -> pa.Table:
        arr = _str(t["text"])
        return pa.table({
            "lang": t["lang"],
            "n_punct": pa.array(
                np.asarray(pc.count_substring_regex(arr, PUNCT),
                           dtype=np.int64)),
            "n_stop_en": pa.array(
                np.asarray(pc.count_substring_regex(arr, LANG_MARKERS["en"]),
                           dtype=np.int64)),
        })

    out = ds.map_batches(counts, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_punct", alias_name="sum_punct"),
            Sum("n_stop_en", alias_name="sum_stop_en")).to_pandas()
    for c in ("n_docs", "sum_punct", "sum_stop_en"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_PUNCT_STOPWORD = r"""
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(len(regexp_extract_all(text, '[.,!?;:]')))::BIGINT AS sum_punct,
       sum(len(regexp_extract_all(text,
           '(?i)\b(the|and|of|to|is|in|that|for|with|was)\b')))::BIGINT
           AS sum_stop_en
FROM documents GROUP BY lang ORDER BY lang
"""


def q_quality_filter_counts(sf_dir: str) -> pd.DataFrame:
    """C4/Gopher-style quality filtering end-to-end: compute the composite
    quality_score per document (functions/textstats.py:quality_stats) in a
    streaming stage, keep docs with score >= 0.5, report per-lang kept
    counts. The WHOLE scoring formula (length/stopword/punct/word-length
    terms) is mirrored in the DuckDB oracle — identical IEEE arithmetic per
    row, so the keep decision matches exactly. Counts only (no float
    accumulation) keep the comparison order-independent."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..functions.textstats import quality_stats

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def score(t: pa.Table) -> pa.Table:
        s = quality_stats(t["text"])
        return pa.table({
            "lang": t["lang"],
            "kept": pa.array((s["quality_score"] >= 0.5).astype(np.int64)),
        })

    out = ds.map_batches(score, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("kept", alias_name="n_kept")).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_kept"] = out["n_kept"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_QUALITY_FILTER = r"""
WITH c AS (
  SELECT lang,
         len(text)::DOUBLE                                    AS n_chars,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_extract_all(text, '\S+')) END)::DOUBLE
             AS n_tokens,
         len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE    AS n_punct,
         (len(regexp_extract_all(text,
              '(?i)\b(the|and|of|to|is|in|that|for|with|was)\b'))
        + len(regexp_extract_all(text,
              '(?i)\b(der|die|das|und|ist|nicht|ein|eine|mit|von|zu)\b'))
        + len(regexp_extract_all(text,
              '(?i)\b(el|la|los|las|es|y|en|que|de|un|una|por)\b'))
        + len(regexp_extract_all(text,
              '(?i)\b(le|la|les|est|et|en|que|de|un|une|pour|dans)\b')))::DOUBLE
             AS n_stop,
         (len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0)
             AS has_cjk
  FROM documents),
s AS (
  SELECT lang,
         least(greatest(n_tokens / 50.0, 0.0), 1.0) AS length_term,
         least(greatest(CASE WHEN has_cjk THEN 1.0
                             ELSE (n_stop / greatest(n_tokens, 1.0)) / 0.2
                        END, 0.0), 1.0)             AS stop_term,
         least(greatest(1.0 - (CASE WHEN n_chars > 0
                                    THEN n_punct / greatest(n_chars, 1.0)
                                    ELSE 0.0 END) / 0.3, 0.0), 1.0)
                                                    AS punct_term,
         least(greatest(1.0 - abs((CASE WHEN n_tokens > 0
                                        THEN n_chars / greatest(n_tokens, 1.0)
                                        ELSE 0.0 END) - 5.5) / 10.0,
                        0.0), 1.0)                  AS wordlen_term
  FROM c)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN 0.35 * length_term + 0.30 * stop_term
                   + 0.20 * punct_term + 0.15 * wordlen_term >= 0.5
                THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM s GROUP BY lang ORDER BY lang
"""


# domain blocklist (UT1 shape) — literals shared with the SQL oracle;
# "example.org" exercises the dot-suffix (subdomain) match: every
# synthesized host <source>.example.org of a blocked source matches
# exactly, and the suffix rule is what a real blocklist relies on.
BLOCKED_DOMAINS = ("src3.example.org", "src7.example.org",
                   "src11.example.org", "tracker.example.net")


def q_blocklist_filter_stats(sf_dir: str) -> pd.DataFrame:
    """UT1-style URL blocklist filtering: drop documents whose url host
    equals a blocked domain or is a subdomain of one (dot-suffix match).
    The blocklist broadcasts once as a sorted hash set (8 B/domain — a
    10^7-entry UT1 list is one 80 MB plasma object); each batch peels
    host labels with O(label depth) vectorized passes
    (stages/crawl.py:blocked_url_mask). Output per lang: doc count,
    blocked count, kept-id sum."""
    from ..sources.webpages import url_of
    from ..stages.crawl import blocked_domains_ref, blocked_url_mask

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "source"])
    blocked_ref = blocked_domains_ref(BLOCKED_DOMAINS)

    def stats(t: pa.Table) -> pa.Table:
        urls = url_of(t["doc_id"], t["lang"], t["source"])
        blocked = blocked_url_mask(urls, blocked_ref)
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        return pa.table({
            "lang": t["lang"],
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "n_blocked": pa.array(blocked.astype(np.int64)),
            "sum_kept_ids": pa.array(np.where(blocked, 0, ids)),
        })

    out = docs.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_blocked", alias_name="n_blocked"),
            Sum("sum_kept_ids", alias_name="sum_kept_ids")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_docs", "n_blocked", "sum_kept_ids"):
        out[c] = out[c].astype("int64")
    return out


SQL_BLOCKLIST_FILTER = f"""
WITH blocked(d) AS (VALUES {", ".join(f"('{d}')" for d in BLOCKED_DOMAINS)}),
u AS (
  SELECT doc_id, lang, source || '.example.org' AS host
  FROM documents
),
flagged AS (
  SELECT doc_id, lang,
         EXISTS (SELECT 1 FROM blocked b
                 WHERE u.host = b.d OR u.host LIKE '%.' || b.d)
             AS is_blocked
  FROM u
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN is_blocked THEN 1 ELSE 0 END) AS BIGINT)
           AS n_blocked,
       CAST(sum(CASE WHEN is_blocked THEN 0 ELSE doc_id END) AS BIGINT)
           AS sum_kept_ids
FROM flagged GROUP BY lang ORDER BY lang
"""


def q_quality_percentile_cut(sf_dir: str) -> pd.DataFrame:
    """Gopher-style top-30% quality selection with an EXACT per-language
    percentile threshold: score every doc with the composite quality
    formula (one streaming regex pass, projected to a narrow 24 B/doc
    (id, lang, score) table), find each language's exact 70th-percentile
    score with the iterative histogram-refinement order-statistics
    engine (stages/order_stats.py — no per-group sort or
    materialization), then keep docs with score >= threshold. The
    selected threshold is an actual data value, so the float comparison
    is bit-identical in numpy and SQL (the score formula's cross-engine
    parity is proven by `quality_filter_counts`). Output per lang: doc
    count, kept count, kept-id sum, threshold."""
    from ..functions.textstats import quality_stats
    from ..stages.order_stats import exact_group_quantiles

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def score_stage(t: pa.Table) -> pa.Table:
        s = quality_stats(t["text"])
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "score": pa.array(s["quality_score"]),
        })

    # narrow projection materialized ONCE so the multi-pass quantile
    # refinement and the final cut never re-run the regex scoring
    scored = docs.map_batches(score_stage,
                              batch_format="pyarrow").materialize()
    qdf = exact_group_quantiles(scored, "lang", "score", qs=(0.7,))
    thr = dict(zip(qdf["lang"].astype(str), qdf["q70"].astype(float)))

    def cut_stats(t: pa.Table) -> pa.Table:
        # factorize langs once per batch; thresholds gather vectorized
        codes, uniq = pd.factorize(np.asarray(t["lang"], dtype=object))
        tv = np.array([thr[lg] for lg in uniq],
                      dtype=np.float64)[codes] if len(uniq) else \
            np.empty(0, dtype=np.float64)
        score = np.asarray(t["score"], dtype=np.float64)
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        kept = score >= tv
        return pa.table({
            "lang": t["lang"],
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "n_kept": pa.array(kept.astype(np.int64)),
            "sum_kept_ids": pa.array(np.where(kept, ids, 0)),
        })

    out = scored.map_batches(cut_stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("sum_kept_ids", alias_name="sum_kept_ids")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_docs", "n_kept", "sum_kept_ids"):
        out[c] = out[c].astype("int64")
    out["threshold"] = out["lang"].map(thr).round(6)
    return out


SQL_QUALITY_PERCENTILE_CUT = r"""
WITH c AS (
  SELECT doc_id, lang,
         len(text)::DOUBLE                                    AS n_chars,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_extract_all(text, '\S+')) END)::DOUBLE
             AS n_tokens,
         len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE    AS n_punct,
         (len(regexp_extract_all(text,
              '(?i)\b(the|and|of|to|is|in|that|for|with|was)\b'))
        + len(regexp_extract_all(text,
              '(?i)\b(der|die|das|und|ist|nicht|ein|eine|mit|von|zu)\b'))
        + len(regexp_extract_all(text,
              '(?i)\b(el|la|los|las|es|y|en|que|de|un|una|por)\b'))
        + len(regexp_extract_all(text,
              '(?i)\b(le|la|les|est|et|en|que|de|un|une|pour|dans)\b')))::DOUBLE
             AS n_stop,
         (len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0)
             AS has_cjk
  FROM documents),
s AS (
  SELECT doc_id, lang,
         0.35 * least(greatest(n_tokens / 50.0, 0.0), 1.0)
       + 0.30 * least(greatest(CASE WHEN has_cjk THEN 1.0
                                    ELSE (n_stop / greatest(n_tokens, 1.0))
                                         / 0.2
                               END, 0.0), 1.0)
       + 0.20 * least(greatest(1.0 - (CASE WHEN n_chars > 0
                                           THEN n_punct
                                                / greatest(n_chars, 1.0)
                                           ELSE 0.0 END) / 0.3, 0.0), 1.0)
       + 0.15 * least(greatest(1.0 - abs((CASE WHEN n_tokens > 0
                                               THEN n_chars
                                                    / greatest(n_tokens,
                                                               1.0)
                                               ELSE 0.0 END) - 5.5)
                               / 10.0, 0.0), 1.0) AS score
  FROM c),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score) - 1
              AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM s),
thr AS (
  SELECT lang, max(CASE WHEN rk = CAST(floor(0.70 * (n - 1)) AS BIGINT)
                        THEN score END) AS t
  FROM ranked GROUP BY lang)
SELECT s.lang,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN s.score >= th.t THEN 1 ELSE 0 END)::BIGINT
           AS n_kept,
       sum(CASE WHEN s.score >= th.t THEN s.doc_id ELSE 0 END)::BIGINT
           AS sum_kept_ids,
       round(max(th.t), 6) AS threshold
FROM s JOIN thr th ON th.lang = s.lang
GROUP BY s.lang ORDER BY s.lang
"""


def q_training_prep_pipeline(sf_dir: str) -> pd.DataFrame:
    """End-to-end training-data prep, fully composed AND fully oracled:
    quality filter (C4-style composite score >= 0.5) -> exact dedup
    (min-id survivor per distinct text, collision-proof,
    stages/dedup.py:exact_dedup over the quality-kept Dataset) -> per-lang
    doc / token / char totals of the surviving corpus. Every stage
    streams; the only driver state is exact_dedup's O(dup-groups) filter.

    The raw table has no exact duplicates, so every doc is re-planted as
    an exact clone at doc_id+100000 (mirrored in the SQL oracle) — the
    dedup stage must drop exactly the clones (min-id survivors)."""
    from ..functions.textstats import quality_stats
    from ..stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def plant_and_filter(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        clone = pa.table({"doc_id": pa.array(ids + 100000, type=pa.int64()),
                          "lang": t["lang"], "text": t["text"]})
        t = pa.concat_tables([t.select(["doc_id", "lang", "text"]), clone])
        s = quality_stats(t["text"])
        # carry the stats columns through dedup — the surviving rows'
        # totals need no second quality_stats pass
        t = t.append_column("n_tokens",
                            pa.array(s["n_tokens"], type=pa.int64()))
        t = t.append_column("n_chars",
                            pa.array(s["n_chars"].astype(np.int64)))
        return t.filter(pa.array(s["quality_score"] >= 0.5))

    kept = ds.map_batches(plant_and_filter, batch_format="pyarrow")
    surv = exact_dedup(kept, "text", "doc_id")

    out = surv.select_columns(["lang", "n_tokens", "n_chars"]) \
        .groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="sum_tokens"),
            Sum("n_chars", alias_name="sum_chars")).to_pandas()
    for c in ("n_docs", "sum_tokens", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_TRAINING_PREP = r"""
WITH planted AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, lang, text FROM documents),
c AS (
  SELECT doc_id, lang, text,
         len(text)::DOUBLE                                    AS n_chars,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_extract_all(text, '\S+')) END)::DOUBLE
             AS n_tokens,
         len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE    AS n_punct,
         (len(regexp_extract_all(text,
              '(?i)\b(the|and|of|to|is|in|that|for|with|was)\b'))
        + len(regexp_extract_all(text,
              '(?i)\b(der|die|das|und|ist|nicht|ein|eine|mit|von|zu)\b'))
        + len(regexp_extract_all(text,
              '(?i)\b(el|la|los|las|es|y|en|que|de|un|una|por)\b'))
        + len(regexp_extract_all(text,
              '(?i)\b(le|la|les|est|et|en|que|de|un|une|pour|dans)\b')))::DOUBLE
             AS n_stop,
         (len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0)
             AS has_cjk
  FROM planted),
s AS (
  SELECT doc_id, lang, text, n_chars, n_tokens,
         0.35 * least(greatest(n_tokens / 50.0, 0.0), 1.0)
       + 0.30 * least(greatest(CASE WHEN has_cjk THEN 1.0
                                    ELSE (n_stop / greatest(n_tokens, 1.0))
                                         / 0.2 END, 0.0), 1.0)
       + 0.20 * least(greatest(1.0 - (CASE WHEN n_chars > 0
                                           THEN n_punct
                                                / greatest(n_chars, 1.0)
                                           ELSE 0.0 END) / 0.3, 0.0), 1.0)
       + 0.15 * least(greatest(1.0 - abs((CASE WHEN n_tokens > 0
                                               THEN n_chars
                                                    / greatest(n_tokens, 1.0)
                                               ELSE 0.0 END) - 5.5) / 10.0,
                               0.0), 1.0) AS score
  FROM c),
kept AS (SELECT doc_id, lang, text, n_chars, n_tokens FROM s
         WHERE score >= 0.5),
surv AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text)
SELECT lang,
       count(*)::BIGINT        AS n_docs,
       sum(n_tokens)::BIGINT   AS sum_tokens,
       sum(n_chars)::BIGINT    AS sum_chars
FROM kept JOIN surv USING (doc_id)
GROUP BY lang ORDER BY lang
"""


def q_event_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered-funnel analytics (view -> click -> purchase, 1-day
    conversion deadline per step): per user the earliest view, the
    earliest click in (view, view+1d], the earliest purchase in
    (click, click+1d]; returns users reaching each step.

    Distributed shape (the sessionization pattern): users shard by hash —
    a user never splits — and each shard resolves its funnel with
    vectorized pandas group-mins (one Python call per SHARD, not per
    user); the per-shard step counts then sum in a tiny final groupby."""
    from ..sketch.hashing import shard_of_values

    num_shards = 32
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("shard", pa.array(
            shard_of_values(t["user_id"], num_shards, seed=0xF0),
            type=pa.int64()))

    def funnel_shard(df: pd.DataFrame) -> pd.DataFrame:
        v = df[df["event_type"] == "view"].groupby("user_id")["ts"].min()
        day = np.timedelta64(1, "D")
        cl = df[df["event_type"] == "click"][["user_id", "ts"]]
        cl = cl[cl["user_id"].isin(v.index)]
        if len(cl):
            base = v.loc[cl["user_id"]].to_numpy()
            ts = cl["ts"].to_numpy()
            cl = cl[(ts > base) & (ts <= base + day)]
        c = cl.groupby("user_id")["ts"].min()
        pu = df[df["event_type"] == "purchase"][["user_id", "ts"]]
        pu = pu[pu["user_id"].isin(c.index)]
        if len(pu):
            base = c.loc[pu["user_id"]].to_numpy()
            ts = pu["ts"].to_numpy()
            pu = pu[(ts > base) & (ts <= base + day)]
        p = pu.groupby("user_id")["ts"].min()
        return pd.DataFrame({
            "step": ["1_view", "2_click", "3_purchase"],
            "n_users": np.array([len(v), len(c), len(p)], dtype=np.int64),
        })

    out = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("shard").map_groups(funnel_shard, batch_format="pandas") \
        .groupby("step").aggregate(Sum("n_users", alias_name="n_users")) \
        .to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("step").reset_index(drop=True)


SQL_EVENT_FUNNEL = """
WITH v AS (SELECT user_id, min(ts) t FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) t FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t
        AND e.ts <= v.t + INTERVAL 1 DAY GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) t FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t
        AND e.ts <= c.t + INTERVAL 1 DAY GROUP BY e.user_id)
SELECT * FROM (
  SELECT '1_view' AS step, count(*)::BIGINT AS n_users FROM v
  UNION ALL SELECT '2_click', count(*)::BIGINT FROM c
  UNION ALL SELECT '3_purchase', count(*)::BIGINT FROM p
) ORDER BY step
"""


def q_doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003;
    functions/shingles.py:winnow_fingerprints) as a dedup-grouping signal:
    clone every even-id doc (+100000, exact copy), fingerprint all docs in
    map_batches, then per lang via an exact two-stage groupby:
    n_docs, n_distinct_fp, n_dup_docs (docs sharing their fingerprint).

    In-query invariant (fingerprinting is deterministic): every clone must
    collide with its source, so sum(n_dup_docs) >= 2 x #clones. No SQL
    oracle (engine-internal rolling hash); rows-only driver check."""
    from ..functions.shingles import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def plant_fp(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        even = ids % 2 == 0
        clone = t.filter(pa.array(even))
        cids = np.asarray(clone["doc_id"], dtype=np.int64) + 100000
        clone = clone.set_column(clone.schema.get_field_index("doc_id"),
                                 "doc_id", pa.array(cids, type=pa.int64()))
        full = pa.concat_tables([t.select(["doc_id", "lang", "text"]),
                                 clone.select(["doc_id", "lang", "text"])])
        fp = winnow_fingerprints(full["text"])
        return pa.table({
            "lang": full["lang"],
            "fp": pa.array(fp.view(np.int64), type=pa.int64()),
            "cloned": pa.array((np.asarray(full["doc_id"], dtype=np.int64)
                                >= 100000).astype(np.int64)),
        })

    per_fp = ds.map_batches(plant_fp, batch_format="pyarrow") \
        .groupby(["lang", "fp"]).aggregate(
            Count(alias_name="n"),
            Sum("cloned", alias_name="n_cloned"))

    def dupstats(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"], dtype=np.int64)
        return pa.table({
            "lang": t["lang"],
            "n_docs": pa.array(n),
            "one": pa.array(np.ones(len(n), dtype=np.int64)),
            "dup": pa.array(np.where(n > 1, n, 0)),
            "n_cloned": t["n_cloned"],
        })

    out = per_fp.map_batches(dupstats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("one", alias_name="n_distinct_fp"),
            Sum("dup", alias_name="n_dup_docs"),
            Sum("n_cloned", alias_name="n_clones")).to_pandas()
    for c in ("n_docs", "n_distinct_fp", "n_dup_docs", "n_clones"):
        out[c] = out[c].astype("int64")
    # determinism invariant: each clone collides with its source
    assert int(out["n_dup_docs"].sum()) >= 2 * int(out["n_clones"].sum()), \
        (int(out["n_dup_docs"].sum()), int(out["n_clones"].sum()))
    out = out.drop(columns=["n_clones"])
    return out.sort_values("lang").reset_index(drop=True)


def q_stratified_sample_counts(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sampling (stages/sample.py): 20 docs per
    lang by hash-rank — identical output under any partitioning (asserted
    in tests). Per-lang sampled counts are oracled (min(n, 20)); the
    sampled id sum is a determinism witness computable in SQL only via the
    count, so counts are the gate and determinism is pytest-verified."""
    from ray.data.aggregate import Count

    from ..stages.sample import stratified_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    sampled = stratified_sample(ds, "lang", "doc_id", 20)
    out = sampled.groupby("lang").aggregate(
        Count(alias_name="n_sampled")).to_pandas()
    out["n_sampled"] = out["n_sampled"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_STRATIFIED_SAMPLE = """
SELECT lang, least(count(*), 20)::BIGINT AS n_sampled
FROM documents GROUP BY lang ORDER BY lang
"""


def q_multimodal_audio(sf_dir: str) -> pd.DataFrame:
    """Audio leg of the multimodal plumbing: attach deterministic PCM16
    payloads, extract rms / zero-crossing / duration features in an
    actor-pool stage (vectorized reduceat over Arrow offsets; payload
    dropped in-stage), aggregate per lang. Rows-only check (payloads are
    engine-synthesized)."""
    from ray.data.aggregate import Count, Mean

    from ..stages.multimodal import AudioFeatureStage, attach_fake_audio

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    feats = ds.map_batches(attach_fake_audio, batch_format="pyarrow",
                           batch_size=256) \
        .map_batches(AudioFeatureStage, batch_format="pyarrow",
                     batch_size=256, concurrency=(2, 16))
    out = feats.groupby("lang").aggregate(
        Count(alias_name="n_clips"),
        Mean("duration_ms", alias_name="avg_ms"),
        Mean("audio_zcr", alias_name="avg_zcr"),
    ).to_pandas()
    out["n_clips"] = out["n_clips"].astype("int64")
    out["avg_ms"] = out["avg_ms"].round(2)
    out["avg_zcr"] = out["avg_zcr"].round(5)
    return out.sort_values("lang").reset_index(drop=True)


def q_partitioned_sink_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Resumable-output path under the oracle gate: filter documents
    (n_chars >= 150, matching the SQL oracle), write hive-partitioned
    parquet (one dir per lang, _SUCCESS marker), then RE-READ the
    partitioned output and aggregate — the write->resume->read cycle a
    100 TB run depends on. A second write call must no-op (resume)."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..stages.sink import read_partitioned, write_partitioned

    out_dir = tempfile.mkdtemp(prefix="lfr-sink-", dir="/tmp") + "/out"
    try:
        ds = _read(sf_dir, "documents",
                   columns=["doc_id", "lang", "n_chars"])
        kept = ds.filter(expr="n_chars >= 150")
        wrote = write_partitioned(kept, out_dir, partition_cols=["lang"])
        # resume: completed output is reused, not rewritten
        reused = write_partitioned(kept, out_dir, partition_cols=["lang"])
        if not wrote or reused:
            raise RuntimeError("sink resume protocol violated "
                               f"(wrote={wrote}, reused_as_write={reused})")
        back = read_partitioned(out_dir)
        res = back.groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars")).to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(out_dir), ignore_errors=True)
    res["lang"] = res["lang"].astype(str)
    res["n_docs"] = res["n_docs"].astype("int64")
    res["sum_chars"] = res["sum_chars"].astype("int64")
    return res.sort_values("lang").reset_index(drop=True)


SQL_SINK_ROUNDTRIP = """
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents WHERE n_chars >= 150
GROUP BY lang ORDER BY lang
"""


def q_warc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Common Crawl's native format end-to-end: synthesize the web-page
    table, each task writes its own gzip'd WARC shard (member-per-record,
    sources/warc.py — the resumable partitioned-sink shape), then the
    shards are READ BACK with the streaming WARC source (one file per
    task, generator batches), text re-extracted from the html payloads
    and (doc_id, lang) re-derived from the WARC-Target-URI alone.
    Per-lang page counts, id sums and extracted-char sums must match the
    documents table exactly — any record lost, duplicated or corrupted
    through the gzip/WARC/HTTP framing breaks the hash. The capture
    timestamp's WARC-Date round-trip (second precision) is asserted
    in-stage. Reference analogue: the HIBP corpus reader shape
    (cpp/extras/benchmarks/hibp.cpp:27-31,79-90)."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from ..sources.warc import read_warc, write_warc_shards_stage
    from ..sources.webpages import WARC_EPOCH_US, read_webpages
    from ..stages.extract import extract_text

    out_dir = tempfile.mkdtemp(prefix="lfr-warc-", dir="/tmp")
    try:
        pages = read_webpages(sf_dir).select_columns(
            ["url", "warc_ts", "html"])
        manifest = pages.map_batches(write_warc_shards_stage(out_dir),
                                     batch_format="pyarrow").to_pandas()
        paths = sorted(manifest["shard_path"])

        def per_page(t: pa.Table) -> pa.Table:
            text = extract_text(t["html"])
            g = pc.extract_regex(
                t["url"],
                r"\.example\.org/(?P<lang>[^/]+)/page-(?P<id>\d+)\.html$")
            lang = pc.struct_field(g, "lang")
            doc_id = pc.cast(pc.struct_field(g, "id"), pa.int64())
            ids = doc_id.to_numpy(zero_copy_only=False)
            ts = pc.cast(t["warc_ts"], pa.int64()).to_numpy(
                zero_copy_only=False)
            want = WARC_EPOCH_US + ids * 1_337_000_000
            if not (ts == want // 1_000_000 * 1_000_000).all():
                raise AssertionError("WARC-Date round-trip broke the "
                                     "capture timestamp")
            return pa.table({
                "lang": lang,
                "n_pages": pa.array(np.ones(t.num_rows, np.int64)),
                "sum_ids": doc_id,
                "sum_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            })

        out = read_warc(paths).map_batches(per_page,
                                           batch_format="pyarrow") \
            .groupby("lang").aggregate(
                Sum("n_pages", alias_name="n_pages"),
                Sum("sum_ids", alias_name="sum_ids"),
                Sum("sum_chars", alias_name="sum_chars")).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    for c in ("n_pages", "sum_ids", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_WARC_ROUNDTRIP = """
SELECT lang, count(*)::BIGINT AS n_pages,
       sum(doc_id)::BIGINT AS sum_ids,
       sum(length(text))::BIGINT AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_order_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """Fact-x-fact distributed hash equi-join: orders x lineitem on
    orderkey (15:1 row ratio, NEITHER side broadcast — the shape where the
    §2.5 broadcast semi-join stops applying), then revenue per order
    priority. Both sides shuffle only their 2-3 projected columns; the join
    itself is per-shard Acero (stages/joins.py:hash_equi_join)."""
    import pyarrow.compute as pc

    from ..stages.joins import hash_equi_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])
    joined = hash_equi_join(
        orders, li, left_on="o_orderkey", right_on="l_orderkey",
        left_cols=["o_orderpriority"],
        right_cols=["l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "revenue": rev})

    out = joined.map_batches(revenue, batch_format="pyarrow") \
        .groupby("o_orderpriority").aggregate(
            Sum("revenue", alias_name="revenue"),
            Count(alias_name="n_items")).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_ORDER_PRIORITY_REVENUE = """
SELECT o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*)::BIGINT                                      AS n_items
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""


def q_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape — a THREE-table composition of the engine's two
    join regimes: the customer BUILDING segment builds its Bloom with
    the DISTRIBUTED tree merge (build_sketch — the driver holds only
    filter bytes, never a key array that grows with scale), the Bloom
    broadcast-prunes orders (~5x fewer rows shuffle), the survivors
    exact-confirm with a co-partitioned semi-join against the dim keys
    (c_custkey is unique, so inner == semi), the confirmed orders
    hash-equi-join the shipdate-filtered lineitems (fact x fact,
    stages/joins.py), revenue aggregates per (orderkey, orderdate), and
    the top-10 resolves with per-block partial top-10 + a bounded
    driver merge (blocks x 10 rows, the ann.py candidate idiom) instead
    of a distributed sort of the tiny aggregate."""
    import pyarrow.compute as pc

    from ..sketch import sizing
    from ..sketch.block_bloom import BlockBloom
    from ..sketch.hashing import hash_arrow_array
    from ..stages.dedup import _cached_filter
    from ..stages.joins import hash_equi_join
    from ..stages.sketch_build import build_sketch

    CUT = pd.Timestamp("1998-06-01")
    cust = _read(sf_dir, "customer", columns=["c_custkey"],
                 filter=pc.field("c_mktsegment") == "BUILDING")
    n_cust = cust.count()
    f = build_sketch(
        cust, "c_custkey", "block",
        {"bytes_": sizing.block_bytes_needed(max(n_cust, 1), 0.001)})
    bloom_ref = ray.put(f.to_bytes())

    def prune_orders(t: pa.Table) -> pa.Table:
        bloom = _cached_filter(bloom_ref, BlockBloom.from_bytes)
        maybe = bloom.find_hashes(hash_arrow_array(t["o_custkey"]))
        return t.filter(pa.array(maybe)) \
            .select(["o_orderkey", "o_custkey", "o_orderdate"])

    def prune_lineitem(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": rev})

    # date predicates push into the Arrow scan (row-group stats prune +
    # in-scan filtering) — non-qualifying rows never reach Python
    cut = pa.scalar(CUT.to_pydatetime())
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=pc.field("o_orderdate") < cut) \
        .map_batches(prune_orders, batch_format="pyarrow")
    # exact confirm: co-partitioned semi-join of the Bloom survivors
    # against the dim keys (shuffle volume = survivors only, ~matches +
    # 0.1% fpp strays) — no driver-side key array at any scale
    orders = hash_equi_join(orders, cust, left_on="o_custkey",
                            right_on="c_custkey",
                            left_cols=["o_orderkey", "o_orderdate"],
                            right_cols=[], num_shards=16) \
        .select_columns(["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"],
               filter=pc.field("l_shipdate") > cut) \
        .map_batches(prune_lineitem, batch_format="pyarrow")
    joined = hash_equi_join(orders, li, left_on="o_orderkey",
                            right_on="l_orderkey",
                            left_cols=["o_orderdate"],
                            right_cols=["rev"])
    agg = joined.groupby(["o_orderkey", "o_orderdate"]).aggregate(
        Sum("rev", alias_name="revenue"))

    def block_top(t: pa.Table) -> pa.Table:
        if t.num_rows <= 10:
            return t
        od = np.asarray(t["o_orderdate"])
        ok = np.asarray(t["o_orderkey"])
        rev = np.asarray(t["revenue"], dtype=np.float64)
        rows = np.lexsort((ok, od, -rev))[:10]
        return t.take(pa.array(rows))

    cand = agg.map_batches(block_top, batch_format="pyarrow").to_pandas()
    top = cand.sort_values(["revenue", "o_orderdate", "o_orderkey"],
                           ascending=[False, True, True]) \
        .head(10).reset_index(drop=True)
    top["revenue"] = top["revenue"].round(2)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "o_orderkey", "o_orderdate", "revenue"]]


SQL_SHIPPING_PRIORITY = """
WITH rev AS (
  SELECT o.o_orderkey, o.o_orderdate,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-06-01'
    AND l.l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY o.o_orderkey, o.o_orderdate
)
SELECT CAST(row_number() OVER (ORDER BY revenue DESC, o_orderdate,
                               o_orderkey) AS BIGINT) AS rank,
       o_orderkey, o_orderdate, round(revenue, 2) AS revenue
FROM rev ORDER BY rank LIMIT 10
"""


def q_supplier_revenue(sf_dir: str) -> pd.DataFrame:
    """Bloom-pruned fact join in anger: suppliers with s_acctbal > 5000
    (a selective build side) hash-equi-join lineitem with
    `bloom_prune_right=True` — non-matching lineitems are dropped by the
    broadcast BlockBloom BEFORE the shuffle — then revenue per supplier
    nation (nation dim broadcast, 25 rows)."""
    import pyarrow.compute as pc

    from ..stages.joins import hash_equi_join

    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey", "s_acctbal"]) \
        .filter(expr="s_acctbal > 5000") \
        .select_columns(["s_suppkey", "s_nationkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])
    joined = hash_equi_join(
        supp, li, left_on="s_suppkey", right_on="l_suppkey",
        left_cols=["s_nationkey"],
        right_cols=["l_extendedprice", "l_discount"],
        bloom_prune_right=True)

    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    nk = nation.sort_values("n_nationkey")
    keys = nk["n_nationkey"].to_numpy().astype(np.int64)
    names = nk["n_name"].to_numpy()
    name_ref = ray.put((keys, names))

    def attach(t: pa.Table) -> pa.Table:
        ks, ns = ray.get(name_ref)
        sk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ks, sk)
        ok = (idx < len(ks)) & (ks[np.minimum(idx, len(ks) - 1)] == sk)
        t = t.filter(pa.array(ok))  # FK holes drop instead of misattaching
        idx = idx[ok]
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"n_name": pa.array(ns[idx]), "revenue": rev})

    out = joined.map_batches(attach, batch_format="pyarrow") \
        .groupby("n_name").aggregate(
            Sum("revenue", alias_name="revenue"),
            Count(alias_name="n_items")).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


SQL_SUPPLIER_REVENUE = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*)::BIGINT                                      AS n_items
FROM supplier s
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE s.s_acctbal > 5000
GROUP BY n.n_name ORDER BY n.n_name
"""


def q_ngram_jaccard_near_dup(sf_dir: str) -> pd.DataFrame:
    """Blocked exact n-gram Jaccard near-dup over documents — the
    deterministic dedup entry whose candidate generation AND similarity
    values oracle against ANSI SQL (the LSH entries are recall-probabilistic
    so they can't). Blocks = identical first-32-char prefix; similarity =
    exact distinct-5-gram Jaccard (stages/dedup.py:ngram_jaccard_pairs)."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, "text", "doc_id", k=5, prefix=32,
                                threshold=0.5, min_len=32)
    out = pd.DataFrame({
        "id_a": pairs["id_a"].astype("int64"),
        "id_b": pairs["id_b"].astype("int64"),
        "jaccard": pairs["jaccard"].astype("float64").round(6),
    })
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_NGRAM_JACCARD = """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= 32
),
sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - 4)) AS i
    FROM docs
  )
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
blk AS (SELECT doc_id, substr(text, 1, 32) AS p FROM docs),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blk a JOIN blk b ON a.p = b.p AND a.doc_id < b.doc_id
),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS ninter
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.g = sa.g
  GROUP BY p.id_a, p.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.ninter AS DOUBLE) / (ca.n + cb.n - i.ninter), 6)
         AS jaccard
FROM inter i
JOIN cnt ca ON ca.doc_id = i.id_a
JOIN cnt cb ON cb.doc_id = i.id_b
WHERE CAST(i.ninter AS DOUBLE) / (ca.n + cb.n - i.ninter) >= 0.5
ORDER BY id_a, id_b
"""


def q_ngram_jaccard_dedup(sf_dir: str) -> pd.DataFrame:
    """Deterministic near-dup DEDUP end-to-end, fully distributed: the
    exact n-gram Jaccard pair DATASET (never collected) feeds distributed
    connected components (stages/cluster.py — sharded local union-find
    contraction + min-label propagation) and the bounded drop carrier;
    survivors (each cluster's min doc_id) aggregate per lang. The SQL
    oracle clusters the same confirmed pairs with a recursive-CTE
    transitive closure — this row is the driver-gated correctness proof
    for the distributed clustering tail."""
    from ..stages.dedup import near_dup_dedup, ngram_jaccard_pairs_ds

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    pairs_ds = ngram_jaccard_pairs_ds(ds, "text", "doc_id", k=5, prefix=32,
                                      threshold=0.5, min_len=32)
    kept = near_dup_dedup(ds, pairs_ds, "doc_id")

    def stats(t: pa.Table) -> pa.Table:
        did = np.asarray(t["doc_id"], dtype=np.int64)
        return pa.table({"lang": t["lang"],
                         "n_kept": pa.array(np.ones(len(did), np.int64)),
                         "sum_kept_ids": pa.array(did)})

    from ray.data.aggregate import Sum

    out = kept.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_kept", alias_name="n_kept"),
            Sum("sum_kept_ids", alias_name="sum_kept_ids")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    out["n_kept"] = out["n_kept"].astype("int64")
    out["sum_kept_ids"] = out["sum_kept_ids"].astype("int64")
    return out


SQL_NGRAM_JACCARD_DEDUP = """
WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= 32
),
sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - 4)) AS i
    FROM docs
  )
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
blk AS (SELECT doc_id, substr(text, 1, 32) AS p FROM docs),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blk a JOIN blk b ON a.p = b.p AND a.doc_id < b.doc_id
),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS ninter
  FROM cand p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.g = sa.g
  GROUP BY p.id_a, p.id_b
),
confirmed AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN cnt ca ON ca.doc_id = i.id_a
  JOIN cnt cb ON cb.doc_id = i.id_b
  WHERE CAST(i.ninter AS DOUBLE) / (ca.n + cb.n - i.ninter) >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM confirmed
  UNION ALL SELECT id_b, id_a FROM confirmed
),
closure(a, b) AS (
  SELECT u, v FROM edges
  UNION
  SELECT c.a, e.v FROM closure c JOIN edges e ON e.u = c.b
),
dropped AS (SELECT DISTINCT a AS doc_id FROM closure WHERE b < a)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(d.doc_id) AS BIGINT) AS sum_kept_ids
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
GROUP BY d.lang ORDER BY d.lang
"""


def q_url_dedup_latest(sf_dir: str) -> pd.DataFrame:
    """Crawl-snapshot merge: keep only the NEWEST capture of every url.
    Recrawls are planted deterministically (every doc_id % 3 == 0 page
    gains a second capture one day later with amended text), then
    `stages/crawl.py:url_dedup_latest` drops the stale captures — the
    same bounded distributed shape as exact dedup (narrow shuffle of
    multi-capture rows only, drop set through the broadcast/DropIdStore
    carrier). Output: per-lang kept-page count and char sum, which
    differ from the pre-dedup table iff the newest capture won."""
    import pyarrow.compute as pc

    from ..sources.webpages import url_of, warc_ts_of
    from ..stages.crawl import url_dedup_latest

    base = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])

    def plant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        url = url_of(t["doc_id"], t["lang"], t["source"])
        ts = warc_ts_of(t["doc_id"])
        first = pa.table({
            "url": url, "warc_ts": ts, "text": t["text"],
            "lang": t["lang"],
            "row_id": pa.array(ids * 2, type=pa.int64()),
        })
        re_mask = (ids % 3) == 0
        sel = pa.array(re_mask)
        t2 = first.filter(sel)
        recrawl = pa.table({
            "url": t2["url"],
            "warc_ts": pc.add(
                t2["warc_ts"],
                pa.scalar(86_400_000_000, type=pa.duration("us"))),
            "text": pc.binary_join_element_wise(
                t2["text"].combine_chunks()
                if isinstance(t2["text"], pa.ChunkedArray)
                else t2["text"], " [recrawl]", ""),
            "lang": t2["lang"],
            "row_id": pa.array(ids[re_mask] * 2 + 1, type=pa.int64()),
        })
        return pa.concat_tables([first, recrawl])

    pages = base.map_batches(plant, batch_format="pyarrow")
    latest = url_dedup_latest(pages, id_col="row_id")

    def stats(t: pa.Table) -> pa.Table:
        chars = np.asarray(pc.utf8_length(t["text"]), dtype=np.int64)
        return pa.table({
            "lang": t["lang"],
            "n_pages": pa.array(np.ones(t.num_rows, np.int64)),
            "sum_chars": pa.array(chars),
        })

    out = latest.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("sum_chars", alias_name="sum_chars")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    out["n_pages"] = out["n_pages"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out


SQL_URL_DEDUP_LATEST = """
WITH base AS (
  SELECT doc_id, text, lang,
         'https://' || source || '.example.org/' || lang || '/page-' ||
         lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.html' AS url,
         1709251200000000 + doc_id * 1337000000 AS ts_us
  FROM documents
),
caps AS (
  SELECT url, ts_us, text, lang, doc_id * 2 AS row_id FROM base
  UNION ALL
  SELECT url, ts_us + 86400000000, text || ' [recrawl]', lang,
         doc_id * 2 + 1
  FROM base WHERE doc_id % 3 = 0
),
latest AS (
  SELECT * FROM caps
  QUALIFY row_number() OVER (PARTITION BY url
                             ORDER BY ts_us DESC, row_id) = 1
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars
FROM latest GROUP BY lang ORDER BY lang
"""


def q_domain_cap(sf_dir: str) -> pd.DataFrame:
    """Per-domain document cap (anti-spam / diversity curation): at most
    40 pages per domain, chosen by the deterministic 32-bit Knuth rank
    (id * 2654435761) % 2^32 — SQL-expressible, so WHICH rows survive
    oracles exactly, not just how many. The keep set is O(domains x cap)
    and broadcasts; a hot domain ships at most cap rows per block thanks
    to the per-batch combiner (stages/crawl.py:per_key_cap_keep_ds)."""
    from ..sources.webpages import url_of
    from ..stages.crawl import domain_cap, domain_of

    base = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "source"])

    def to_pages(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": url_of(t["doc_id"], t["lang"], t["source"]),
            "doc_id": t["doc_id"],
        })

    pages = base.map_batches(to_pages, batch_format="pyarrow")
    kept = domain_cap(pages, id_col="doc_id", cap=40)

    def stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "domain": domain_of(t["url"]),
            "n_kept": pa.array(np.ones(t.num_rows, np.int64)),
            "sum_doc_id": pa.array(
                np.asarray(t["doc_id"], dtype=np.int64)),
        })

    out = kept.map_batches(stats, batch_format="pyarrow") \
        .groupby("domain").aggregate(
            Sum("n_kept", alias_name="n_kept"),
            Sum("sum_doc_id", alias_name="sum_doc_id")) \
        .to_pandas().sort_values("domain").reset_index(drop=True)
    out["n_kept"] = out["n_kept"].astype("int64")
    out["sum_doc_id"] = out["sum_doc_id"].astype("int64")
    return out


SQL_DOMAIN_CAP = """
WITH pages AS (
  SELECT doc_id, source || '.example.org' AS domain FROM documents
),
ranked AS (
  SELECT doc_id, domain,
         (doc_id * 2654435761) % 4294967296 AS r
  FROM pages
),
kept AS (
  SELECT * FROM ranked
  QUALIFY row_number() OVER (PARTITION BY domain
                             ORDER BY r, doc_id) <= 40
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM kept GROUP BY domain ORDER BY domain
"""


def q_decontamination_stats(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (eval-leakage guard): every doc_id %
    97 == 0 document is the held-out benchmark; corpus documents sharing
    >= half of their distinct 8-shingles with the benchmark set are
    flagged. The benchmark shingle set broadcasts once (exact sorted
    array at this scale; BlockBloom beyond the bound); the corpus side
    is one streaming pass, no shuffle (stages/crawl.py). At threshold
    0.5 the float ratio compare and the oracle's integer 2*hits >= n
    agree exactly (the rational gap 1/(2n) dwarfs float64 division
    error for any real shingle count)."""
    from ..stages.crawl import benchmark_shingle_ref, contamination_flags

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def side(keep_bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            mask = (ids % 97 == 0) == keep_bench
            return t.filter(pa.array(mask))
        return fn

    bench = docs.map_batches(side(True), batch_format="pyarrow")
    corpus = docs.map_batches(side(False), batch_format="pyarrow")
    sh_ref, exact = benchmark_shingle_ref(bench, "text", k=8)
    flag = contamination_flags("text", "doc_id", sh_ref, exact,
                               k=8, threshold=0.5)

    def stats(t: pa.Table) -> pa.Table:
        f = flag(t)
        return pa.table({
            "lang": t["lang"],
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "n_contaminated": pa.array(
                np.asarray(f["contaminated"]).astype(np.int64)),
            "sum_hits": pa.array(np.asarray(f["n_hits"],
                                            dtype=np.int64)),
        })

    out = corpus.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_contaminated", alias_name="n_contaminated"),
            Sum("sum_hits", alias_name="sum_hits")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_docs", "n_contaminated", "sum_hits"):
        out[c] = out[c].astype("int64")
    return out


SQL_DECONTAMINATION = """
WITH bench AS (
  SELECT text FROM documents WHERE doc_id % 97 = 0 AND length(text) >= 8
),
bsh AS (
  SELECT DISTINCT substring(text, CAST(i AS INT), 8) AS g
  FROM (SELECT text, unnest(generate_series(1, length(text) - 7)) AS i
        FROM bench)
),
corpus AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id % 97 <> 0
),
csh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 8) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 7)) AS i
        FROM corpus WHERE length(text) >= 8)
),
per_doc AS (
  SELECT c.doc_id, count(*) AS n_sh,
         count(b.g) AS n_hits
  FROM csh c LEFT JOIN bsh b ON b.g = c.g
  GROUP BY c.doc_id
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN coalesce(p.n_hits, 0) * 2
                          >= coalesce(p.n_sh, 1) AND p.doc_id IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(sum(coalesce(p.n_hits, 0)) AS BIGINT) AS sum_hits
FROM corpus d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
GROUP BY d.lang ORDER BY d.lang
"""


def q_freq_quality_stats(sf_dir: str) -> pd.DataFrame:
    """Self-trained token-frequency quality filter (the CCNet shape with
    the LM replaced by the corpus's own counts): docs whose tokens are
    globally rare — average global token count < 50 — are flagged. Two
    passes: distributed word count with a per-batch distinct-word
    combiner + one vocab-sized sort/limit for the top-2^16 vocabulary,
    then a broadcast and a streaming scoring pass. All-integer, so the
    flags oracle exactly (stages/corpus.py)."""
    from ..stages.corpus import build_vocab_ref, commonness_flags

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    vocab_ref = build_vocab_ref(docs, "text", top_v=1 << 16)
    flag = commonness_flags("text", "doc_id", vocab_ref, rare_factor=50)

    def stats(t: pa.Table) -> pa.Table:
        f = flag(t)
        return pa.table({
            "lang": t["lang"],
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "n_rare": pa.array(
                np.asarray(f["rare"]).astype(np.int64)),
            "sum_commonness": pa.array(
                np.asarray(f["sum_commonness"], dtype=np.int64)),
            "sum_tokens": pa.array(
                np.asarray(f["n_tokens"], dtype=np.int64)),
        })

    out = docs.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_rare", alias_name="n_rare"),
            Sum("sum_commonness", alias_name="sum_commonness"),
            Sum("sum_tokens", alias_name="sum_tokens")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_docs", "n_rare", "sum_commonness", "sum_tokens"):
        out[c] = out[c].astype("int64")
    return out


SQL_FREQ_QUALITY = """
WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents
),
words AS (SELECT * FROM w WHERE word <> ''),
counts AS (SELECT word, CAST(count(*) AS BIGINT) AS c
           FROM words GROUP BY word),
vocab AS (
  SELECT * FROM counts
  QUALIFY row_number() OVER (ORDER BY c DESC, word ASC) <= 65536
),
per_doc AS (
  SELECT wo.doc_id,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(coalesce(v.c, 0)) AS BIGINT) AS sum_c
  FROM words wo LEFT JOIN vocab v ON v.word = wo.word
  GROUP BY wo.doc_id
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN coalesce(p.sum_c, 0)
                          < coalesce(p.n_tok, 0) * 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       CAST(sum(coalesce(p.sum_c, 0)) AS BIGINT) AS sum_commonness,
       CAST(sum(coalesce(p.n_tok, 0)) AS BIGINT) AS sum_tokens
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
GROUP BY d.lang ORDER BY d.lang
"""


def q_token_budget_sample(sf_dir: str) -> pd.DataFrame:
    """Per-language token-budget corpus mixing: keep documents in
    deterministic hash-rank order while each language's running token
    total (including the current doc) stays <= 20000. The cumulative
    scan is the two-level rank-bucket refinement in stages/corpus.py —
    (lang x 4096-bucket) aggregate, boundary bucket resolved exactly,
    no per-language single-task cumsum. Output: per-lang kept docs,
    kept tokens (always <= budget) and kept-id sum (proves WHICH rows
    survive, not just how many)."""
    from ..stages.corpus import space_token_counts, token_budget_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def tok_of(t: pa.Table) -> np.ndarray:
        return space_token_counts(t["text"])

    kept = token_budget_sample(docs, "lang", "doc_id", tok_of,
                               budget=20_000)

    def stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "n_kept": pa.array(np.ones(t.num_rows, np.int64)),
            "kept_tokens": pa.array(space_token_counts(t["text"]),
                                    type=pa.int64()),
            "sum_kept_ids": pa.array(
                np.asarray(t["doc_id"], dtype=np.int64)),
        })

    out = kept.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_kept", alias_name="n_kept"),
            Sum("kept_tokens", alias_name="kept_tokens"),
            Sum("sum_kept_ids", alias_name="sum_kept_ids")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_kept", "kept_tokens", "sum_kept_ids"):
        out[c] = out[c].astype("int64")
    return out


SQL_TOKEN_BUDGET_SAMPLE = """
WITH per_doc AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS BIGINT) AS n_tok,
         (doc_id * 2654435761) % 4294967296 AS r
  FROM documents
),
kept AS (
  SELECT * FROM per_doc
  QUALIFY sum(n_tok) OVER (PARTITION BY lang ORDER BY r, doc_id
                           ROWS UNBOUNDED PRECEDING) <= 20000
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
       CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids
FROM kept GROUP BY lang ORDER BY lang
"""

# Weighted corpus mixture: lang -> target share of a 20k-token budget.
# Fixed literals so the identical integers embed in the SQL oracle.
MIXTURE_WEIGHTS = {"en": 0.5, "zh": 0.2, "de": 0.15, "fr": 0.1,
                   "es": 0.05}
MIXTURE_TOTAL_BUDGET = 20_000


def q_weighted_mixture_sample(sf_dir: str) -> pd.DataFrame:
    """Weighted training-data mixing: sample each language to
    floor(weight x 20000) tokens (en 10000 / zh 4000 / de 3000 /
    fr 2000 / es 1000) in deterministic hash-rank order — the
    per-lang-budget generalization of `token_budget_sample`, one
    rank-bucket prefix scan for the whole mix. Output: per-lang kept
    docs, kept tokens (<= that lang's budget) and kept-id sum (proves
    WHICH rows survive)."""
    from ..stages.corpus import (space_token_counts,
                                 weighted_token_budget_sample)

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def tok_of(t: pa.Table) -> np.ndarray:
        return space_token_counts(t["text"])

    kept = weighted_token_budget_sample(
        docs, "lang", "doc_id", tok_of,
        weights=MIXTURE_WEIGHTS, total_budget=MIXTURE_TOTAL_BUDGET)

    def stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "n_kept": pa.array(np.ones(t.num_rows, np.int64)),
            "kept_tokens": pa.array(space_token_counts(t["text"]),
                                    type=pa.int64()),
            "sum_kept_ids": pa.array(
                np.asarray(t["doc_id"], dtype=np.int64)),
        })

    out = kept.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_kept", alias_name="n_kept"),
            Sum("kept_tokens", alias_name="kept_tokens"),
            Sum("sum_kept_ids", alias_name="sum_kept_ids")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_kept", "kept_tokens", "sum_kept_ids"):
        out[c] = out[c].astype("int64")
    return out


def _mixture_budget_values() -> str:
    from ..stages.corpus import mixture_budgets

    budgets = mixture_budgets(MIXTURE_WEIGHTS, MIXTURE_TOTAL_BUDGET)
    return ", ".join(f"('{lang}', {b})"
                     for lang, b in sorted(budgets.items()))


SQL_WEIGHTED_MIXTURE_SAMPLE = f"""
WITH budgets(lang, budget) AS (VALUES {_mixture_budget_values()}),
per_doc AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS BIGINT) AS n_tok,
         (doc_id * 2654435761) % 4294967296 AS r
  FROM documents
),
kept AS (
  SELECT p.doc_id, p.lang, p.n_tok
  FROM per_doc p JOIN budgets b ON p.lang = b.lang
  QUALIFY sum(p.n_tok) OVER (PARTITION BY p.lang ORDER BY r, p.doc_id
                             ROWS UNBOUNDED PRECEDING) <= b.budget
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
       CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids
FROM kept GROUP BY lang ORDER BY lang
"""


# Self-trained bigram-LM quality threshold: keep docs whose avg bigram
# negative log-likelihood is <= tau. Fixed literal so the identical
# value embeds in the SQL oracle; LM_MIN_COUNT=2 is the model prune.
LM_NLL_TAU = 3.35


def q_lm_quality_filter(sf_dir: str) -> pd.DataFrame:
    """CCNet-shaped LM quality filter with REAL log-probs, the LM
    self-trained on the corpus in one distributed pass: per-language
    add-one-smoothed bigram model (stages/corpus.py:build_bigram_lm_ref;
    bigrams with count < 2 pruned — the zipfian scale knob), broadcast
    once, then a streaming scoring pass computes each document's avg
    -ln P(w2|w1, lang). Docs with avg NLL <= 3.35 are kept; docs with
    < 2 tokens are unscoreable and kept. Output per lang: doc counts,
    kept counts, kept-id sum (proves WHICH docs survive) and the mean
    doc NLL (rounded — the one float column)."""
    from ..stages.corpus import build_bigram_lm_ref, lm_nll_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    model_ref = build_bigram_lm_ref(docs, "text", "lang")
    score = lm_nll_stage("text", "doc_id", "lang", model_ref)

    def stats(t: pa.Table) -> pa.Table:
        s = score(t)
        n_bg = np.asarray(s["n_bigrams"], dtype=np.int64)
        nll = np.asarray(s["nll_sum"], dtype=np.float64)
        ids = np.asarray(s["doc_id"], dtype=np.int64)
        kept = (n_bg == 0) | (nll <= LM_NLL_TAU * n_bg)
        scored = n_bg > 0
        with np.errstate(invalid="ignore"):
            ratio = np.where(scored, nll / np.maximum(n_bg, 1), 0.0)
        return pa.table({
            "lang": s["lang"],
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "n_kept": pa.array(kept.astype(np.int64)),
            "sum_kept_ids": pa.array(np.where(kept, ids, 0)),
            "n_scored": pa.array(scored.astype(np.int64)),
            "sum_ratio": pa.array(ratio),
        })

    out = docs.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("sum_kept_ids", alias_name="sum_kept_ids"),
            Sum("n_scored", alias_name="n_scored"),
            Sum("sum_ratio", alias_name="sum_ratio")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_docs", "n_kept", "sum_kept_ids"):
        out[c] = out[c].astype("int64")
    out["avg_nll"] = (out["sum_ratio"] / out["n_scored"]).round(4)
    return out[["lang", "n_docs", "n_kept", "sum_kept_ids", "avg_nll"]]


SQL_LM_QUALITY_FILTER = f"""
WITH toks AS (
  SELECT doc_id, lang,
         UNNEST(list_filter(string_split(text, ' '),
                            x -> x <> '')) AS tok,
         UNNEST(range(1, len(list_filter(string_split(text, ' '),
                                         x -> x <> '')) + 1)) AS i
  FROM documents
),
bg AS (
  SELECT a.doc_id, a.lang, a.tok AS w1, b.tok AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
bgc AS (SELECT lang, w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2, 3
        HAVING count(*) >= 2),
pfc AS (SELECT lang, w1, count(*) AS c1 FROM bg GROUP BY 1, 2),
voc AS (SELECT lang, count(DISTINCT tok) AS v FROM toks GROUP BY 1),
scores AS (
  SELECT g.doc_id, count(*) AS n_bg,
         sum(-ln((coalesce(c.c2, 0) + 1.0) / (p.c1 + v.v))) AS nll
  FROM bg g
  JOIN pfc p ON p.lang = g.lang AND p.w1 = g.w1
  JOIN voc v ON v.lang = g.lang
  LEFT JOIN bgc c ON c.lang = g.lang AND c.w1 = g.w1 AND c.w2 = g.w2
  GROUP BY 1
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s.n_bg IS NULL
                       OR s.nll <= {LM_NLL_TAU} * s.n_bg
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN s.n_bg IS NULL
                       OR s.nll <= {LM_NLL_TAU} * s.n_bg
                THEN d.doc_id ELSE 0 END) AS BIGINT) AS sum_kept_ids,
       round(avg(s.nll / s.n_bg), 4) AS avg_nll
FROM documents d LEFT JOIN scores s ON s.doc_id = d.doc_id
GROUP BY d.lang ORDER BY d.lang
"""


def q_keyword_topk(sf_dir: str) -> pd.DataFrame:
    """Per-document keyword extraction: top-3 tokens ranked by tf/df
    (frequent in the doc, rare in the corpus — tf-idf's ordering with
    the log dropped, chosen because IEEE division is correctly rounded
    so numpy and SQL rank identically; ties break word ASC). Document
    frequencies are built in one distributed pass and broadcast
    (stages/corpus.py:keyword_topk_auto); extraction streams. The df
    table is materialized vocab-sized in the object store and only
    broadcast while it fits KEYWORD_BROADCAST_VOCAB — beyond that the
    pipeline switches to the word-hash-partitioned join path, so no
    stage ever collects O(vocabulary) rows to the driver. Output
    is all-integer + the word, hash-exact across engines."""
    from ..stages.corpus import keyword_topk_auto

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = keyword_topk_auto(docs, "text", "doc_id", k=3).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    return out


SQL_KEYWORD_TOPK = """
WITH words AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split(text, ' '),
                            x -> x <> '')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
       FROM words GROUP BY 1, 2),
df AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM words GROUP BY 1),
ranked AS (
  SELECT t.doc_id, t.word, t.tf, d.df,
         row_number() OVER (
             PARTITION BY t.doc_id
             ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC, t.word ASC
         ) AS rank
  FROM tf t JOIN df d USING (word)
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, tf, df
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""


# train/val/test shares in percent — literals shared with the oracle
SPLIT_SHARES = {"train": 90, "val": 5, "test": 5}


def q_train_val_test_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic 90/5/5 train/val/test split by Knuth-rank hash of
    doc_id (stages/corpus.py:hash_split_stage): stable across runs and
    re-partitioning, docs never migrate between splits as the corpus
    grows — the property random sampling lacks. Output per (lang,
    split): doc count, token count, id sum (proves WHICH docs landed
    where)."""
    from ..stages.corpus import hash_split_stage, space_token_counts

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    split = hash_split_stage("doc_id", SPLIT_SHARES)

    def stats(t: pa.Table) -> pa.Table:
        s = split(t)
        return pa.table({
            "lang": s["lang"],
            "split": s["split"],
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "n_tokens": pa.array(space_token_counts(s["text"]),
                                 type=pa.int64()),
            "sum_ids": pa.array(
                np.asarray(s["doc_id"], dtype=np.int64)),
        })

    out = docs.map_batches(stats, batch_format="pyarrow") \
        .groupby(["lang", "split"]).aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("sum_ids", alias_name="sum_ids")) \
        .to_pandas().sort_values(["lang", "split"]).reset_index(drop=True)
    for c in ("n_docs", "n_tokens", "sum_ids"):
        out[c] = out[c].astype("int64")
    return out


SQL_TRAIN_VAL_TEST_SPLIT = """
WITH slotted AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS BIGINT) AS n_tok,
         ((doc_id * 2654435761) % 4294967296) % 100 AS slot
  FROM documents
),
labeled AS (
  SELECT *, CASE WHEN slot < 90 THEN 'train'
                 WHEN slot < 95 THEN 'val'
                 ELSE 'test' END AS split
  FROM slotted
)
SELECT lang, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM labeled GROUP BY lang, split ORDER BY lang, split
"""


def q_top_collocations(sf_dir: str) -> pd.DataFrame:
    """Corpus collocation extraction: each language's top-5 bigrams by
    corpus count (ties: w1 ASC, w2 ASC). Same distributed shape as the
    LM build — per-batch distinct-bigram partial counts, one grouped
    sum (keyed on the bigram STRINGS here, the output needs them), a
    5-rows-per-lang driver head. The descriptive-statistics face of the
    bigram machinery (collocations feed tokenizer merges and phrase
    mining)."""
    from ..stages.corpus import _batch_bigrams

    docs = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        w1, w2, lang, _ = _batch_bigrams(t, "text", "lang")
        if not len(w1):
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "w1": pa.array([], type=pa.string()),
                             "w2": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        df = pd.DataFrame({"lang": np.asarray(lang, dtype=object),
                           "w1": np.asarray(w1, dtype=object),
                           "w2": np.asarray(w2, dtype=object)})
        g = df.groupby(["lang", "w1", "w2"], sort=False).size() \
            .rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "w1", "w2"]) \
        .aggregate(Sum("n", alias_name="n"))

    # per-group top-k without a driver collect of the (huge at scale)
    # distinct-bigram table: per-block partial top-5 per lang (at most
    # 5 x langs rows leave any block), then lang-hash shards finish —
    # the q_top_parts_per_brand shape
    NSHARDS = 16

    def partial_top(df: pd.DataFrame) -> pd.DataFrame:
        from ..sketch.hashing import shard_of_values

        d = df.sort_values(["n", "w1", "w2"],
                           ascending=[False, True, True], kind="stable")
        d = d[d.groupby("lang").cumcount() < 5]
        return d.assign(shard=shard_of_values(d["lang"], NSHARDS))

    def top_shard(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["n", "w1", "w2"],
                           ascending=[False, True, True], kind="stable")
        d = d.assign(rank=d.groupby("lang").cumcount() + 1)
        return d[d["rank"] <= 5].drop(columns=["shard"])

    out = counts.map_batches(partial_top, batch_format="pandas") \
        .groupby("shard").map_groups(top_shard, batch_format="pandas") \
        .to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return out[["lang", "rank", "w1", "w2", "n"]]


SQL_TOP_COLLOCATIONS = """
WITH toks AS (
  SELECT doc_id, lang,
         UNNEST(list_filter(string_split(text, ' '),
                            x -> x <> '')) AS tok,
         UNNEST(range(1, len(list_filter(string_split(text, ' '),
                                         x -> x <> '')) + 1)) AS i
  FROM documents
),
bg AS (
  SELECT a.lang, a.tok AS w1, b.tok AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
counts AS (
  SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS n
  FROM bg GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY lang ORDER BY n DESC, w1 ASC, w2 ASC) AS rank
  FROM counts
)
SELECT lang, CAST(rank AS BIGINT) AS rank, w1, w2, n
FROM ranked WHERE rank <= 5 ORDER BY lang, rank
"""


# fixed search terms — literals shared with the SQL oracle
INDEX_TERMS = ("table", "query")


def q_inverted_index_search(sf_dir: str) -> pd.DataFrame:
    """Build-once/probe-many exact retrieval: a token-hash-BUCKETED
    inverted index is built over the corpus in one distributed pass
    (distinct (token, doc) combiner -> bucket shuffle -> each bucket
    task writes its OWN parquet partition, postings never return
    through the driver — state/inverted_index.py), then AND/OR term
    queries read exactly one bucket file per term. The exact-postings
    face of the reference's build->freeze->probe contract. Output: one
    row per search term with its document frequency plus the shared
    AND/OR match stats."""
    import tempfile

    from ..state.inverted_index import InvertedIndex

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = InvertedIndex.build(docs, "text", "doc_id",
                              tempfile.mkdtemp(prefix="lfr-invidx-",
                                               dir="/tmp"))
    hits_and = idx.search(INDEX_TERMS, mode="and")
    hits_or = idx.search(INDEX_TERMS, mode="or")
    return pd.DataFrame({
        "term": list(INDEX_TERMS),
        "df": [np.int64(len(idx.postings(t))) for t in INDEX_TERMS],
        "n_and": np.int64(len(hits_and)),
        "sum_and_ids": np.int64(hits_and.sum()) if len(hits_and)
        else np.int64(0),
        "n_or": np.int64(len(hits_or)),
    }).sort_values("term").reset_index(drop=True)


SQL_INVERTED_INDEX_SEARCH = f"""
WITH words AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id,
           UNNEST(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS word
    FROM documents)
),
t(term) AS (VALUES {", ".join(f"('{w}')" for w in INDEX_TERMS)}),
dfs AS (
  SELECT t.term, CAST(count(w.doc_id) AS BIGINT) AS df
  FROM t LEFT JOIN words w ON w.word = t.term GROUP BY t.term
),
m_and AS (
  SELECT doc_id FROM words
  WHERE word IN {str(tuple(INDEX_TERMS))}
  GROUP BY doc_id HAVING count(DISTINCT word) = {len(INDEX_TERMS)}
),
m_or AS (
  SELECT DISTINCT doc_id FROM words
  WHERE word IN {str(tuple(INDEX_TERMS))}
)
SELECT d.term, d.df,
       (SELECT CAST(count(*) AS BIGINT) FROM m_and) AS n_and,
       (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM m_and)
           AS sum_and_ids,
       (SELECT CAST(count(*) AS BIGINT) FROM m_or) AS n_or
FROM dfs d ORDER BY d.term
"""


def q_bm25_search(sf_dir: str) -> pd.DataFrame:
    """BM25 ranked retrieval over the bucketed inverted index
    (state/inverted_index.py): build once distributed (postings + term
    frequencies + a doc-length sidecar, every bucket its own parquet
    partition), then score the query's candidate set with the
    Robertson/Lucene formulation (k1=1.2, b=0.75) reading one postings
    bucket per term and only the candidates' doc-length buckets. Ties
    break by doc id. Output: the top-10 (rank, doc_id, score)."""
    import tempfile

    from ..state.inverted_index import InvertedIndex

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = InvertedIndex.build(docs, "text", "doc_id",
                              tempfile.mkdtemp(prefix="lfr-bm25-",
                                               dir="/tmp"))
    ids, scores = idx.search_bm25(INDEX_TERMS, k=10)
    return pd.DataFrame({
        "rank": np.arange(1, len(ids) + 1, dtype=np.int64),
        "doc_id": ids,
        "score": np.round(scores, 6),
    })


SQL_BM25_SEARCH = f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split(text, ' '),
                            x -> x <> '')) AS word
  FROM documents
),
consts AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
         (SELECT CAST(count(*) AS DOUBLE) FROM toks)
           / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY 1, 2),
dfs AS (SELECT word, CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY 1),
dlen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         FROM toks GROUP BY 1),
q(term) AS (VALUES {", ".join(f"('{w}')" for w in INDEX_TERMS)}),
scores AS (
  SELECT t.doc_id,
         sum(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
             * t.tf * (1.2 + 1.0)
             / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl)))
             AS score
  FROM tf t
  JOIN q ON t.word = q.term
  JOIN dfs d ON d.word = t.word
  JOIN dlen l ON l.doc_id = t.doc_id
  CROSS JOIN consts c
  GROUP BY t.doc_id
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, round(score, 6) AS score
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scores)
WHERE rank <= 10 ORDER BY rank
"""


def q_ppm_decode_features(sf_dir: str) -> pd.DataFrame:
    """REAL image decode under the driver gate: deterministic valid
    binary-P6 PPM payloads are attached per doc (pure function of
    doc_id), decoded by the actor-pool PpmFeatureStage — an actual
    header parse + numpy reshape, not a stubbed fake — and the decoded
    widths/heights/channel means aggregate per lang. The oracle
    recomputes every pixel arithmetically from the synthesis formula,
    so a decoder that misreads dimensions, strides or channel order
    hash-mismatches. Channel means aggregate as EXACT integer pixel
    sums with one final IEEE division — no float summation order, no
    round() ties anywhere on either side. (Compressed formats remain
    honestly stubbed — no codecs in this environment.)"""
    from ..stages.multimodal import PpmFeatureStage, attach_ppm_images

    return _image_decode_features(sf_dir, attach_ppm_images,
                                  PpmFeatureStage)


def _image_decode_features(sf_dir: str, attach_fn, stage_cls):
    """Shared body of the PPM/PNG decode pipelines (identical schema and
    exact-integer-mean contract; only the attach/stage pair differs).
    Single home of the px_mean division rule — one correctly-rounded
    IEEE division of exact int sums, bit-identical to the oracle's
    CAST(sum AS DOUBLE) / CAST(n_px AS DOUBLE)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    feats = docs.map_batches(attach_fn, batch_format="pyarrow") \
        .map_batches(stage_cls, batch_size=256, concurrency=(2, 16),
                     batch_format="pyarrow")

    def stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "n_images": pa.array(np.ones(t.num_rows, np.int64)),
            "sum_width": t["width"],
            "sum_height": t["height"],
            "n_px": t["n_px"],
            "px_sum_r": t["px_sum_r"],
            "px_sum_g": t["px_sum_g"],
            "px_sum_b": t["px_sum_b"],
        })

    out = feats.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_width", alias_name="sum_width"),
            Sum("sum_height", alias_name="sum_height"),
            Sum("n_px", alias_name="n_px"),
            Sum("px_sum_r", alias_name="px_sum_r"),
            Sum("px_sum_g", alias_name="px_sum_g"),
            Sum("px_sum_b", alias_name="px_sum_b")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_images", "sum_width", "sum_height", "n_px",
              "px_sum_r", "px_sum_g", "px_sum_b"):
        out[c] = out[c].astype("int64")
    for ch in ("r", "g", "b"):
        out[f"px_mean_{ch}"] = out[f"px_sum_{ch}"] / out["n_px"]
        out = out.drop(columns=[f"px_sum_{ch}"])
    return out.drop(columns=["n_px"])


SQL_PPM_DECODE_FEATURES = """
WITH dims AS (
  SELECT doc_id, lang,
         8 + doc_id % 17 AS w, 8 + doc_id % 15 AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.lang, ty.y AS y, tx.x AS x
  FROM dims d, UNNEST(range(0, d.h)) AS ty(y),
       UNNEST(range(0, d.w)) AS tx(x)
),
imgs AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_images,
         CAST(sum(w) AS BIGINT) AS sum_width,
         CAST(sum(h) AS BIGINT) AS sum_height
  FROM dims GROUP BY lang
),
pix AS (
  SELECT lang, count(*) AS n_px,
         sum((x * (y + 1) + doc_id + 0) % 256) AS sr,
         sum((x * (y + 1) + doc_id + 1) % 256) AS sg,
         sum((x * (y + 1) + doc_id + 2) % 256) AS sb
  FROM px GROUP BY lang
)
SELECT i.lang, i.n_images, i.sum_width, i.sum_height,
       CAST(p.sr AS DOUBLE) / CAST(p.n_px AS DOUBLE) AS px_mean_r,
       CAST(p.sg AS DOUBLE) / CAST(p.n_px AS DOUBLE) AS px_mean_g,
       CAST(p.sb AS DOUBLE) / CAST(p.n_px AS DOUBLE) AS px_mean_b
FROM imgs i JOIN pix p USING (lang) ORDER BY lang
"""


def q_png_decode_features(sf_dir: str) -> pd.DataFrame:
    """REAL compressed-image decode under the driver gate: deterministic
    valid PNG payloads (rows cycling ALL FIVE scanline filters, zlib
    stream split across IDAT chunks) are attached per doc, decoded by
    the actor-pool PngFeatureStage — CRC-verified chunk walk + stdlib
    inflate + exact numpy unfiltering, no codec library — and the
    decoded widths/heights/channel means aggregate per lang. The oracle
    recomputes every pixel arithmetically from the synthesis formula, so
    a decoder that mis-unfilters a single byte hash-mismatches. Channel
    means aggregate as EXACT integer pixel sums with one final IEEE
    division — no float summation order, no round() ties."""
    from ..stages.multimodal import PngFeatureStage, attach_png_images

    return _image_decode_features(sf_dir, attach_png_images,
                                  PngFeatureStage)


SQL_PNG_DECODE_FEATURES = """
WITH dims AS (
  SELECT doc_id, lang,
         8 + doc_id % 13 AS w, 8 + doc_id % 11 AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.lang, ty.y AS y, tx.x AS x
  FROM dims d, UNNEST(range(0, d.h)) AS ty(y),
       UNNEST(range(0, d.w)) AS tx(x)
),
imgs AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_images,
         CAST(sum(w) AS BIGINT) AS sum_width,
         CAST(sum(h) AS BIGINT) AS sum_height
  FROM dims GROUP BY lang
),
pix AS (
  SELECT lang, count(*) AS n_px,
         sum((x * (y + 1) + doc_id + 0) % 256) AS sr,
         sum((x * (y + 1) + doc_id + 1) % 256) AS sg,
         sum((x * (y + 1) + doc_id + 2) % 256) AS sb
  FROM px GROUP BY lang
)
SELECT i.lang, i.n_images, i.sum_width, i.sum_height,
       CAST(p.sr AS DOUBLE) / CAST(p.n_px AS DOUBLE) AS px_mean_r,
       CAST(p.sg AS DOUBLE) / CAST(p.n_px AS DOUBLE) AS px_mean_g,
       CAST(p.sb AS DOUBLE) / CAST(p.n_px AS DOUBLE) AS px_mean_b
FROM imgs i JOIN pix p USING (lang) ORDER BY lang
"""


def q_y4m_frame_sample(sf_dir: str) -> pd.DataFrame:
    """REAL video decode under the driver gate: deterministic valid
    YUV4MPEG2 payloads (2-12 C420 frames each) are attached per doc,
    decoded by the actor-pool Y4mFrameSampleStage — ASCII stream-header
    parse + FRAME walk + plane slicing, no codec — which samples every
    3rd frame and reports per-row luma/chroma means. The oracle
    recomputes every sampled pixel arithmetically, so a decoder that
    mis-slices a plane or samples the wrong frames hash-mismatches.
    Plane means aggregate as EXACT integer pixel sums with one final
    IEEE division — no float summation order, no round() ties."""
    from ..stages.multimodal import Y4mFrameSampleStage, attach_y4m_videos

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    feats = docs.map_batches(attach_y4m_videos, batch_format="pyarrow") \
        .map_batches(Y4mFrameSampleStage, batch_size=256,
                     concurrency=(2, 16), batch_format="pyarrow")

    def stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "n_videos": pa.array(np.ones(t.num_rows, np.int64)),
            "sum_frames": t["n_frames"],
            "sum_sampled": t["n_sampled"],
            "sum_y": t["sum_y"],
            "sum_u": t["sum_u"],
            "sum_v": t["sum_v"],
            "n_y_px": t["n_y_px"],
            "n_c_px": t["n_c_px"],
        })

    out = feats.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_videos", alias_name="n_videos"),
            Sum("sum_frames", alias_name="sum_frames"),
            Sum("sum_sampled", alias_name="sum_sampled"),
            Sum("sum_y", alias_name="sum_y"),
            Sum("sum_u", alias_name="sum_u"),
            Sum("sum_v", alias_name="sum_v"),
            Sum("n_y_px", alias_name="n_y_px"),
            Sum("n_c_px", alias_name="n_c_px")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_videos", "sum_frames", "sum_sampled",
              "sum_y", "sum_u", "sum_v", "n_y_px", "n_c_px"):
        out[c] = out[c].astype("int64")
    out["y_mean"] = out["sum_y"] / out["n_y_px"]
    out["u_mean"] = out["sum_u"] / out["n_c_px"]
    out["v_mean"] = out["sum_v"] / out["n_c_px"]
    return out.drop(columns=["sum_y", "sum_u", "sum_v",
                             "n_y_px", "n_c_px"])


SQL_Y4M_FRAME_SAMPLE = """
WITH vids AS (
  SELECT doc_id, lang, 2 + doc_id % 11 AS nf FROM documents
),
sampled AS (
  SELECT v.doc_id, v.lang, v.nf, tf.f AS f
  FROM vids v, UNNEST(range(0, v.nf)) AS tf(f)
  WHERE tf.f % 3 = 0
),
px AS (
  SELECT s.doc_id, s.lang, s.f, xx.x AS x, yy.y AS y
  FROM sampled s, UNNEST(range(0, 16)) AS xx(x),
       UNNEST(range(0, 12)) AS yy(y)
),
lum AS (
  SELECT lang, count(*) AS n_y_px,
         sum((x * (y + 1) + 7 * f + doc_id) % 256) AS sy
  FROM px GROUP BY lang
),
chrom AS (
  -- C420 chroma planes are 8x6=48 px, constant per frame by synthesis
  SELECT lang, count(*) * 48 AS n_c_px,
         sum(((doc_id + 5 * f) % 256) * 48) AS su,
         sum(((doc_id + 11 * f) % 256) * 48) AS sv
  FROM sampled GROUP BY lang
),
vstats AS (
  SELECT lang, count(*)::BIGINT AS n_videos,
         sum(nf)::BIGINT AS sum_frames
  FROM vids GROUP BY lang
),
sstats AS (
  SELECT lang, count(*)::BIGINT AS sum_sampled FROM sampled GROUP BY lang
)
SELECT v.lang, v.n_videos, v.sum_frames, s.sum_sampled,
       CAST(l.sy AS DOUBLE) / CAST(l.n_y_px AS DOUBLE) AS y_mean,
       CAST(c.su AS DOUBLE) / CAST(c.n_c_px AS DOUBLE) AS u_mean,
       CAST(c.sv AS DOUBLE) / CAST(c.n_c_px AS DOUBLE) AS v_mean
FROM vstats v JOIN sstats s USING (lang) JOIN lum l USING (lang)
     JOIN chrom c USING (lang)
ORDER BY lang
"""


def q_bm25_snippets(sf_dir: str) -> pd.DataFrame:
    """End-to-end search result page: BM25 top-10 over the bucketed
    index, then ONLY the 10 winning documents are fetched (doc-id
    predicate pushed into the Arrow scan — the corpus never loads) and
    a keyword-in-context snippet is cut around the first occurrence of
    the first query term (vectorized find_substring + slice). Output:
    (rank, doc_id, snippet)."""
    import tempfile

    from ..state.inverted_index import InvertedIndex

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = InvertedIndex.build(docs, "text", "doc_id",
                              tempfile.mkdtemp(prefix="lfr-snip-",
                                               dir="/tmp"))
    ids, _scores = idx.search_bm25(INDEX_TERMS, k=10)
    term = INDEX_TERMS[0]
    WIN = 24  # snippet = 2*WIN+len(term) chars centred on the hit

    hits = _read(sf_dir, "documents", columns=["doc_id", "text"],
                 filter=pc.field("doc_id").isin(ids.tolist()))

    def snippet(t: pa.Table) -> pa.Table:
        # 10 rows total — code-POINT offsets computed in Python so the
        # semantics match SQL strpos/substr on multibyte text exactly
        out = []
        texts = _str2(t["text"])
        for i in range(t.num_rows):
            s = texts[i].as_py()
            p = s.find(term)
            start = max(p - WIN, 0) if p >= 0 else 0
            out.append(s[start:start + 2 * WIN + len(term)])
        return pa.table({"doc_id": t["doc_id"],
                         "snippet": pa.array(out, type=pa.string())})

    snips = hits.map_batches(snippet, batch_format="pyarrow") \
        .to_pandas().set_index("doc_id")
    return pd.DataFrame({
        "rank": np.arange(1, len(ids) + 1, dtype=np.int64),
        "doc_id": ids,
        "snippet": snips.loc[ids, "snippet"].to_numpy(),
    })


def _str2(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col


SQL_BM25_SNIPPETS = f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split(text, ' '),
                            x -> x <> '')) AS word
  FROM documents
),
consts AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
         (SELECT CAST(count(*) AS DOUBLE) FROM toks)
           / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY 1, 2),
dfs AS (SELECT word, CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY 1),
dlen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         FROM toks GROUP BY 1),
q(term) AS (VALUES {", ".join(f"('{w}')" for w in INDEX_TERMS)}),
scores AS (
  SELECT t.doc_id,
         sum(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
             * t.tf * (1.2 + 1.0)
             / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl)))
             AS score
  FROM tf t
  JOIN q ON t.word = q.term
  JOIN dfs d ON d.word = t.word
  JOIN dlen l ON l.doc_id = t.doc_id
  CROSS JOIN consts c
  GROUP BY t.doc_id
),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
             AS rank
  FROM scores
)
SELECT CAST(r.rank AS BIGINT) AS rank, r.doc_id,
       CASE WHEN strpos(d.text, '{INDEX_TERMS[0]}') > 0
            THEN substr(d.text,
                        greatest(strpos(d.text, '{INDEX_TERMS[0]}')
                                 - 24, 1),
                        48 + length('{INDEX_TERMS[0]}'))
            ELSE substr(d.text, 1, 48 + length('{INDEX_TERMS[0]}'))
       END AS snippet
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
WHERE r.rank <= 10 ORDER BY r.rank
"""


def q_wav_decode_stats(sf_dir: str) -> pd.DataFrame:
    """REAL audio container decode under the driver gate: valid
    RIFF/WAVE PCM16 payloads (integer waveform, pure function of
    doc_id) are parsed by the actor-pool WavFeatureStage — an actual
    chunk walk, not a stub — and the decoded sample counts, durations,
    RMS and peaks aggregate per lang. The oracle recomputes every
    sample arithmetically; the per-lang RMS reduces to one division of
    EXACT int64 v^2 / sample sums plus one IEEE sqrt (both correctly
    rounded), so it matches BIT-exactly across engines with no float
    summation order anywhere (the reason the waveform is integer, not
    a sine)."""
    from ..stages.multimodal import WavFeatureStage, attach_wav_audio

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    feats = docs.map_batches(attach_wav_audio, batch_format="pyarrow") \
        .map_batches(WavFeatureStage, batch_size=256, concurrency=(2, 16),
                     batch_format="pyarrow")

    def stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "n_clips": pa.array(np.ones(t.num_rows, np.int64)),
            "sum_samples": t["n_samples"],
            "sum_duration_ms": t["duration_ms"],
            "sum_sq": t["sum_sq"],
            "max_peak": t["peak"],
        })

    out = feats.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n_clips", alias_name="n_clips"),
            Sum("sum_samples", alias_name="sum_samples"),
            Sum("sum_duration_ms", alias_name="sum_duration_ms"),
            Sum("sum_sq", alias_name="sum_sq"),
            Max("max_peak", alias_name="max_peak")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    for c in ("n_clips", "sum_samples", "sum_duration_ms", "sum_sq",
              "max_peak"):
        out[c] = out[c].astype("int64")
    out["rms_all"] = np.sqrt(out["sum_sq"] / out["sum_samples"])
    return out.drop(columns=["sum_sq"])


SQL_WAV_DECODE_STATS = """
WITH clips AS (
  SELECT doc_id, lang, 64 + doc_id % 1984 AS n
  FROM documents
),
samples AS (
  SELECT c.doc_id, c.lang, c.n,
         ((k.k * (c.doc_id + 3)) % 65536) - 32768 AS v
  FROM clips c, UNNEST(range(0, c.n)) AS k(k)
),
per_lang AS (
  SELECT lang, count(*) AS n_samples, sum(v * v) AS sum_sq,
         max(abs(v)) AS peak
  FROM samples GROUP BY lang
),
per_clip AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_clips,
         CAST(sum(n) AS BIGINT) AS sum_samples,
         CAST(sum((n * 1000) // 16000) AS BIGINT) AS sum_duration_ms
  FROM clips GROUP BY lang
)
SELECT c.lang, c.n_clips, c.sum_samples, c.sum_duration_ms,
       CAST(p.peak AS BIGINT) AS max_peak,
       sqrt(CAST(p.sum_sq AS DOUBLE) / CAST(p.n_samples AS DOUBLE))
           AS rms_all
FROM per_clip c JOIN per_lang p USING (lang) ORDER BY lang
"""


def q_crawl_delta(sf_dir: str) -> pd.DataFrame:
    """Incremental-crawl planning: per-url diff of two snapshots
    (added / removed / changed / unchanged), so a re-ingest processes
    only added+changed pages. Snapshot B is planted deterministically
    from A: doc_id % 7 == 0 pages vanish, % 5 == 0 survivors get new
    content, % 11 == 0 spawn brand-new urls. Both sides project to
    narrow (url_hash, url, content_hash) rows — payloads never shuffle
    (stages/crawl.py:crawl_delta)."""
    import pyarrow.compute as pc

    from ..sources.webpages import url_of
    from ..stages.crawl import crawl_delta

    base = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])

    def snap_a(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": url_of(t["doc_id"], t["lang"], t["source"]),
            "text": t["text"],
        })

    def snap_b(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        keep = pa.array(ids % 7 != 0)
        t2 = t.filter(keep)
        ids2 = np.asarray(t2["doc_id"], dtype=np.int64)
        text2 = t2["text"].combine_chunks() \
            if isinstance(t2["text"], pa.ChunkedArray) else t2["text"]
        changed = pc.binary_join_element_wise(text2, " v2", "")
        text_b = pc.if_else(pa.array(ids2 % 5 == 0), changed, text2)
        cur = pa.table({
            "url": url_of(t2["doc_id"], t2["lang"], t2["source"]),
            "text": text_b,
        })
        new_mask = pa.array(ids % 11 == 0)
        t3 = t.filter(new_mask)
        ids3 = np.asarray(t3["doc_id"], dtype=np.int64)
        new = pa.table({
            "url": url_of(pa.array(ids3 + 500000, type=pa.int64()),
                          t3["lang"], t3["source"]),
            "text": pc.binary_join_element_wise(
                pa.array([f"new page content {i}" for i in ids3],
                         type=pa.string()), "", ""),
        })
        return pa.concat_tables([cur, new])

    ds_a = base.map_batches(snap_a, batch_format="pyarrow")
    ds_b = base.map_batches(snap_b, batch_format="pyarrow")
    delta = crawl_delta(ds_a, ds_b)

    def count_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "status": t["status"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
        })

    out = delta.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("status").aggregate(Sum("n", alias_name="n")) \
        .to_pandas().sort_values("status").reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out


SQL_CRAWL_DELTA = """
WITH a AS (
  SELECT 'https://' || source || '.example.org/' || lang || '/page-' ||
         lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.html' AS url,
         text
  FROM documents
),
b_cur AS (
  SELECT 'https://' || source || '.example.org/' || lang || '/page-' ||
         lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.html' AS url,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
),
b_new AS (
  SELECT 'https://' || source || '.example.org/' || lang || '/page-' ||
         lpad(CAST(doc_id + 500000 AS VARCHAR), 8, '0') || '.html' AS url,
         'new page content ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 11 = 0
),
b AS (SELECT * FROM b_cur UNION ALL SELECT * FROM b_new),
d AS (
  SELECT CASE WHEN a.url IS NULL THEN 'added'
              WHEN b.url IS NULL THEN 'removed'
              WHEN a.text = b.text THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM a FULL OUTER JOIN b ON a.url = b.url
)
SELECT status, CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY status ORDER BY status
"""


def q_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """Per-market-segment customer activity INCLUDING inactive customers
    — the left-outer face of the hash-partitioned equi-join
    (stages/joins.py, how='left outer'; unmatched right columns null).
    Customers x orders co-partitioned by custkey shard; per segment:
    customers, customers with no orders, total orders, revenue."""
    from ..stages.joins import hash_equi_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"])
    joined = hash_equi_join(
        cust, orders, left_on="c_custkey", right_on="o_custkey",
        left_cols=["c_mktsegment"], right_cols=["o_totalprice"],
        how="left outer")

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        price = t["o_totalprice"]
        matched = pc.is_valid(price.combine_chunks()
                              if isinstance(price, pa.ChunkedArray)
                              else price)
        m = np.asarray(matched, dtype=bool)
        pv = np.asarray(pc.fill_null(price, 0.0), dtype=np.float64)
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        # one output row per input row; distinct-customer counting rides
        # the custkey so the groupby can COUNT DISTINCT exactly
        return pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "c_custkey": pa.array(keys, type=pa.int64()),
            "is_order": pa.array(m.astype(np.int64)),
            "price": pa.array(pv),
        })

    # two distributed groupbys, never a joined-table collect: first
    # (segment, custkey) totals — a customer's rows always co-group —
    # then per-segment sums over the customer-sized table
    per_cust = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby(["c_mktsegment", "c_custkey"]).aggregate(
            Sum("is_order", alias_name="cust_orders"),
            Sum("price", alias_name="cust_rev"))

    def seg_partial(t: pa.Table) -> pa.Table:
        n_ord = np.asarray(t["cust_orders"], dtype=np.int64)
        return pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "n_customers": pa.array(np.ones(t.num_rows, np.int64)),
            "n_inactive": pa.array((n_ord == 0).astype(np.int64)),
            "n_orders": pa.array(n_ord),
            "revenue": t["cust_rev"],
        })

    out = per_cust.map_batches(seg_partial, batch_format="pyarrow") \
        .groupby("c_mktsegment").aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("n_inactive", alias_name="n_inactive"),
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue", alias_name="revenue")) \
        .to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    for c in ("n_customers", "n_inactive", "n_orders"):
        out[c] = out[c].astype("int64")
    out["revenue"] = out["revenue"].round(2)
    return out


SQL_CUSTOMER_ORDER_COUNTS = """
WITH j AS (
  SELECT c.c_mktsegment, c.c_custkey, o.o_totalprice
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT CASE WHEN o_totalprice IS NULL
                           THEN c_custkey END) AS BIGINT) AS n_inactive,
       CAST(count(o_totalprice) AS BIGINT) AS n_orders,
       round(sum(coalesce(o_totalprice, 0)), 2) AS revenue
FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_duplicate_passage_stats(sf_dir: str) -> pd.DataFrame:
    """Exact duplicate-PASSAGE removal (substring dedup, Lee et al. 2021
    re-expressed with winnowing anchors — stages/passages.py): a fixed
    190-char boilerplate passage is planted mid-text into every doc_id %
    4 == 0 document, spans are detected distributed (anchor table ->
    min-partner pairing -> byte-exact extend) and reported per lang.
    No SQL oracle (maximal-common-substring is not SQL-expressible); the
    query self-asserts that every planted copy except the global first
    is affected and that each removed span covers the passage."""
    from ..stages.passages import duplicate_passage_spans

    PASSAGE = ("COMMON BOILERPLATE NOTICE: this exact block is injected "
               "verbatim into every fourth document of the corpus to "
               "exercise cross-document passage level deduplication at "
               "scale with stable bytes.")

    def plant(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np.asarray(t["doc_id"], dtype=np.int64)
        mark = pa.array(ids % 4 == 0)
        planted = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(t["text"], 0, 40), PASSAGE,
            pc.utf8_slice_codeunits(t["text"], 40, 1 << 30), "\n")
        text = pc.if_else(mark, planted,
                          t["text"].combine_chunks()
                          if isinstance(t["text"], pa.ChunkedArray)
                          else t["text"])
        return pa.table({"doc_id": t["doc_id"], "text": text,
                         "lang": t["lang"]})

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]) \
        .map_batches(plant, batch_format="pyarrow")
    spans = duplicate_passage_spans(docs, "text", "doc_id",
                                    min_len=128).to_pandas()
    if not len(spans) or "doc" not in spans.columns:
        raise RuntimeError("planted passages produced no spans")
    spans["len"] = spans["end"] - spans["start"]
    # self-check: every planted doc except the global first is affected,
    # and each affected doc loses at least the passage
    lang_of = _read(sf_dir, "documents", columns=["doc_id", "lang"]) \
        .to_pandas().set_index("doc_id")["lang"]
    planted_ids = sorted(i for i in lang_of.index if i % 4 == 0)
    affected = set(spans["doc"].astype(int))
    missing = set(planted_ids[1:]) - affected
    assert not missing, f"unaffected planted docs: {sorted(missing)[:5]}"
    assert planted_ids[0] not in affected, "first copy must keep"
    per_doc = spans.groupby("doc")["len"].sum()
    assert (per_doc[per_doc.index.isin(planted_ids)] >=
            len(PASSAGE)).all()
    spans["lang"] = spans["doc"].map(lang_of)
    out = spans.groupby("lang").agg(
        docs_affected=("doc", "nunique"),
        n_spans=("doc", "size"),
        chars_removed=("len", "sum")).reset_index() \
        .sort_values("lang").reset_index(drop=True)
    for c in ("docs_affected", "n_spans", "chars_removed"):
        out[c] = out[c].astype("int64")
    return out


def q_jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """The LLM-corpus interchange format end-to-end: each task writes
    its own gzip'd JSONL shard of the documents table (the resumable
    partitioned-sink shape, sources/jsonl.py), the shards are read back
    with the streaming JSONL source (one file per task, Arrow C++ NDJSON
    parse — never a per-line json.loads loop), and per-lang counts, id
    sums and code-point sums must match the original table exactly —
    any record lost, duplicated, mis-escaped or re-typed through the
    JSON framing breaks the hash (utf8_length counts code points,
    matching SQL length())."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from ..sources.jsonl import read_jsonl, write_jsonl_shards_stage

    out_dir = tempfile.mkdtemp(prefix="lfr-jsonl-", dir="/tmp")
    try:
        docs = _read(sf_dir, "documents",
                     columns=["doc_id", "lang", "text"])
        manifest = docs.map_batches(write_jsonl_shards_stage(
            out_dir, "doc_id"), batch_format="pyarrow").to_pandas()
        paths = sorted(manifest["shard_path"])

        schema = pa.schema([("doc_id", pa.int64()),
                            ("lang", pa.string()),
                            ("text", pa.string())])

        def stats(t: pa.Table) -> pa.Table:
            return pa.table({
                "lang": t["lang"],
                "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
                "sum_doc_id": pc.cast(t["doc_id"], pa.int64()),
                "sum_chars": pc.cast(pc.utf8_length(t["text"]),
                                     pa.int64()),
            })

        out = read_jsonl(paths, schema=schema) \
            .map_batches(stats, batch_format="pyarrow") \
            .groupby("lang").aggregate(
                Sum("n_docs", alias_name="n_docs"),
                Sum("sum_doc_id", alias_name="sum_doc_id"),
                Sum("sum_chars", alias_name="sum_chars")) \
            .to_pandas().sort_values("lang").reset_index(drop=True)
        for c in ("n_docs", "sum_doc_id", "sum_chars"):
            out[c] = out[c].astype("int64")
        return out
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_JSONL_ROUNDTRIP = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_link_components_stats(sf_dir: str) -> pd.DataFrame:
    """Link-graph connected components, fully distributed and EXACTLY
    oracled: edges synthesize deterministically from doc_id (anchor
    ``u -> u - u%7`` plus long-range ``u -> (31u+13)%N`` for u%13==0,
    stages/graph.py), labels come from the sharded-CC + min-label
    contraction machinery in stages/cluster.py (the same engine that
    clusters near-dup pairs, where it can never be SQL-oracled because
    LSH is probabilistic), and the per-size component histogram is
    compared against a DuckDB recursive-CTE transitive closure. A CC
    that merges one component wrong or drops one singleton mismatches."""
    from ..stages.graph import component_size_histogram

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = docs.count()
    return component_size_histogram(docs, n_docs)


SQL_LINK_COMPONENTS_STATS = """
WITH RECURSIVE n AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, doc_id - (doc_id % 7) AS dst
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id AS src, (doc_id * 31 + 13) % (SELECT n FROM n) AS dst
  FROM documents
  WHERE doc_id % 13 = 0
    AND (doc_id * 31 + 13) % (SELECT n FROM n) <> doc_id
),
ue AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT dst AS a, src AS b FROM edges
),
reach(v, lbl) AS (
  SELECT a, a FROM (SELECT a FROM ue UNION SELECT b FROM ue)
  UNION
  SELECT ue.a, r.lbl FROM ue JOIN reach r ON r.v = ue.b
),
comp AS (SELECT v, min(lbl) AS root FROM reach GROUP BY v),
lab AS (
  SELECT d.doc_id AS v, COALESCE(c.root, d.doc_id) AS root
  FROM documents d LEFT JOIN comp c ON c.v = d.doc_id
),
sizes AS (SELECT root, count(*) AS size FROM lab GROUP BY root)
SELECT CAST(size AS BIGINT) AS size,
       CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY size ORDER BY size
"""


def q_link_pagerank_topk(sf_dir: str) -> pd.DataFrame:
    """Integer-exact PageRank over the synthesized link graph: 3 rounds
    of scatter (per-node contribution ``r//outdeg`` onto formula-derived
    out-neighbors) + groupby-sum shuffle, all int64 micro-ranks so the
    unrolled-CTE oracle matches bit-for-bit — no float summation order,
    no damping rounding ambiguity. Top-10 by rank with doc_id
    tie-break; the driver hash covers exact integer ranks."""
    from ..stages.graph import pagerank_topk

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = docs.count()
    return pagerank_topk(docs, n_docs, k=10, iters=3)


SQL_LINK_PAGERANK_TOPK = """
WITH n AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, doc_id - (doc_id % 7) AS dst
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id AS src, (doc_id * 31 + 13) % (SELECT n FROM n) AS dst
  FROM documents
  WHERE doc_id % 13 = 0
    AND (doc_id * 31 + 13) % (SELECT n FROM n) <> doc_id
),
outd AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT doc_id AS v, CAST(1000000 AS BIGINT) AS r FROM documents),
c1 AS (
  SELECT e.dst AS v, sum(r0.r // o.d) AS s
  FROM edges e JOIN outd o ON o.src = e.src JOIN r0 ON r0.v = e.src
  GROUP BY e.dst
),
r1 AS (
  SELECT d.doc_id AS v,
         150000 + (85 * COALESCE(c1.s, 0)) // 100 AS r
  FROM documents d LEFT JOIN c1 ON c1.v = d.doc_id
),
c2 AS (
  SELECT e.dst AS v, sum(r1.r // o.d) AS s
  FROM edges e JOIN outd o ON o.src = e.src JOIN r1 ON r1.v = e.src
  GROUP BY e.dst
),
r2 AS (
  SELECT d.doc_id AS v,
         150000 + (85 * COALESCE(c2.s, 0)) // 100 AS r
  FROM documents d LEFT JOIN c2 ON c2.v = d.doc_id
),
c3 AS (
  SELECT e.dst AS v, sum(r2.r // o.d) AS s
  FROM edges e JOIN outd o ON o.src = e.src JOIN r2 ON r2.v = e.src
  GROUP BY e.dst
),
r3 AS (
  SELECT d.doc_id AS v,
         150000 + (85 * COALESCE(c3.s, 0)) // 100 AS r
  FROM documents d LEFT JOIN c3 ON c3.v = d.doc_id
)
SELECT CAST(v AS BIGINT) AS doc_id, CAST(r AS BIGINT) AS pr_micro
FROM r3 ORDER BY r DESC, v LIMIT 10
"""


def q_link_pagerank_redistribute(sf_dir: str) -> pd.DataFrame:
    """Standard-formulation PageRank (dangling mass REDISTRIBUTED
    uniformly each round — what real link graphs need, vs the drop
    simplification of link_pagerank_topk): r' = teleport +
    (85*(s + D//N))//100 with D = the round's total dangling mass,
    all exact int64 so the extended unrolled CTE matches bit-for-bit.
    D reaches the driver as ONE scalar tree-aggregate per round; the
    redistribution itself is folded into the damp map — no extra
    shuffle. Top-10 by rank with doc_id tie-break."""
    from ..stages.graph import pagerank_topk

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = docs.count()
    return pagerank_topk(docs, n_docs, k=10, iters=3,
                         dangling="redistribute")


SQL_LINK_PAGERANK_REDISTRIBUTE = """
WITH n AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, doc_id - (doc_id % 7) AS dst
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id AS src, (doc_id * 31 + 13) % (SELECT n FROM n) AS dst
  FROM documents
  WHERE doc_id % 13 = 0
    AND (doc_id * 31 + 13) % (SELECT n FROM n) <> doc_id
),
outd AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT doc_id AS v, CAST(1000000 AS BIGINT) AS r FROM documents),
g1 AS (
  SELECT COALESCE(sum(r0.r), 0) // (SELECT n FROM n) AS x
  FROM r0 LEFT JOIN outd o ON o.src = r0.v WHERE o.src IS NULL
),
c1 AS (
  SELECT e.dst AS v, sum(r0.r // o.d) AS s
  FROM edges e JOIN outd o ON o.src = e.src JOIN r0 ON r0.v = e.src
  GROUP BY e.dst
),
r1 AS (
  SELECT d.doc_id AS v,
         150000 + (85 * (COALESCE(c1.s, 0) + (SELECT x FROM g1))) // 100
           AS r
  FROM documents d LEFT JOIN c1 ON c1.v = d.doc_id
),
g2 AS (
  SELECT COALESCE(sum(r1.r), 0) // (SELECT n FROM n) AS x
  FROM r1 LEFT JOIN outd o ON o.src = r1.v WHERE o.src IS NULL
),
c2 AS (
  SELECT e.dst AS v, sum(r1.r // o.d) AS s
  FROM edges e JOIN outd o ON o.src = e.src JOIN r1 ON r1.v = e.src
  GROUP BY e.dst
),
r2 AS (
  SELECT d.doc_id AS v,
         150000 + (85 * (COALESCE(c2.s, 0) + (SELECT x FROM g2))) // 100
           AS r
  FROM documents d LEFT JOIN c2 ON c2.v = d.doc_id
),
g3 AS (
  SELECT COALESCE(sum(r2.r), 0) // (SELECT n FROM n) AS x
  FROM r2 LEFT JOIN outd o ON o.src = r2.v WHERE o.src IS NULL
),
c3 AS (
  SELECT e.dst AS v, sum(r2.r // o.d) AS s
  FROM edges e JOIN outd o ON o.src = e.src JOIN r2 ON r2.v = e.src
  GROUP BY e.dst
),
r3 AS (
  SELECT d.doc_id AS v,
         150000 + (85 * (COALESCE(c3.s, 0) + (SELECT x FROM g3))) // 100
           AS r
  FROM documents d LEFT JOIN c3 ON c3.v = d.doc_id
)
SELECT CAST(v AS BIGINT) AS doc_id, CAST(r AS BIGINT) AS pr_micro
FROM r3 ORDER BY r DESC, v LIMIT 10
"""


def q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016), the
    first 3 learned merges — EXACTLY oracled: the word table stays a
    Dataset (one vocab-sized pair-count shuffle + bounded partial-top-1
    collect + vectorized merge-apply per round, stages/bpe.py), while
    the oracle unrolls each round in pure SQL window functions — the
    greedy left-to-right merge rule is run-parity (merges at even
    offsets within runs of overlapping matches), which IS expressible
    as gaps-and-islands. Ties break (count DESC, left ASC, right ASC);
    all counts integer — a pair counted or merged wrong anywhere
    changes the learned merge list and mismatches."""
    from ..stages.bpe import learn_bpe_merges

    docs = _read(sf_dir, "documents", columns=["text"])
    out = learn_bpe_merges(docs, k=3, num_shards=16)
    return out.rename(columns={"left": "lsym", "right": "rsym"})


def q_bpe_token_stats(sf_dir: str) -> pd.DataFrame:
    """Tokenizer train + APPLY end-to-end: learn 3 BPE merges over the
    corpus (the distributed trainer above), then segment every document
    with them and count per-lang words/tokens — the token-budget
    measurement every mixing decision rests on. The oracle reuses the
    unrolled 3-round CTE chain to compute each distinct word's post-
    merge symbol count and joins it back onto the corpus; a single word
    segmented differently anywhere shifts a lang's token count and
    mismatches."""
    from ..stages.bpe import learn_bpe_merges, token_stats_after_merges

    docs = _read(sf_dir, "documents", columns=["lang", "text"])
    m = learn_bpe_merges(docs, k=3, num_shards=16)
    merges = list(zip(m["left"], m["right"]))
    return token_stats_after_merges(docs, merges)


def _bpe_round_sql(i: int) -> str:
    """One unrolled BPE round: s{i-1} -> b{i} (the winning pair) and
    s{i} (the re-segmented symbol table)."""
    p, c = i - 1, i
    return f"""
p{c} AS (
  SELECT a.sym AS l, b.sym AS r, CAST(sum(a.cnt) AS BIGINT) AS n
  FROM s{p} a JOIN s{p} b ON b.word = a.word AND b.pos = a.pos + 1
  GROUP BY l, r
),
b{c} AS (SELECT l, r, n FROM p{c} ORDER BY n DESC, l, r LIMIT 1),
m{c} AS (
  SELECT word, cnt, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt,
         COALESCE(sym = (SELECT l FROM b{c}) AND
           lead(sym) OVER (PARTITION BY word ORDER BY pos)
             = (SELECT r FROM b{c}), FALSE) AS m
  FROM s{p}
),
r{c} AS (
  SELECT *, CASE WHEN m THEN pos - ROW_NUMBER() OVER
       (PARTITION BY word, m ORDER BY pos) END AS run
  FROM m{c}
),
t{c} AS (
  SELECT *, m AND (ROW_NUMBER() OVER
       (PARTITION BY word, run ORDER BY pos) % 2 = 1) AS take
  FROM r{c}
),
n{c} AS (
  SELECT *, COALESCE(lag(take) OVER
       (PARTITION BY word ORDER BY pos), FALSE) AS dropped
  FROM t{c}
),
s{c} AS (
  SELECT word, cnt,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN take THEN sym || nxt ELSE sym END AS sym
  FROM n{c} WHERE NOT dropped
)"""


_BPE_PREFIX = ("""
WITH w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
),
s0 AS (
  SELECT word, cnt, string_split(word, '')[p.pos] AS sym, p.pos
  FROM w0, UNNEST(range(1, len(string_split(word, '')) + 1)) AS p(pos)
),"""
    + ",".join(_bpe_round_sql(i) for i in (1, 2, 3)))

SQL_BPE_MERGES = (_BPE_PREFIX + """
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS merge_rank, l AS lsym, r AS rsym,
         n AS pair_n FROM b1
  UNION ALL
  SELECT CAST(1 AS BIGINT), l, r, n FROM b2
  UNION ALL
  SELECT CAST(2 AS BIGINT), l, r, n FROM b3
) ORDER BY merge_rank
""")

SQL_BPE_TOKEN_STATS = (_BPE_PREFIX + """,
wsyms AS (
  SELECT word, CAST(count(*) AS BIGINT) AS nsym FROM s3 GROUP BY word
),
docw AS (
  SELECT lang, UNNEST(string_split(text, ' ')) AS word FROM documents
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(w.nsym) AS BIGINT) AS n_tokens
FROM docw d JOIN wsyms w USING (word)
WHERE d.word <> ''
GROUP BY d.lang ORDER BY d.lang
""")


# -- KMV bottom-k sketch + exact heavy hitters (round-4 additions) ---------

# splitmix64 additive constants for the KMV hash seed (the engine-wide
# DEFAULT_SEED) and the planted zipf item stream (stages/heavy.py) —
# same SQL-replay pattern as _SM_ADD_IMG above.
_KMV_K = 64
_SM_ADD_KMV = (0x5EEDBADBEE52B055 * 0x9E3779B97F4A7C15 + 1) % _M64
_SM_ADD_ZIPF = (0x21BF * 0x9E3779B97F4A7C15 + 1) % _M64


def _sql_splitmix_chain(prefix: str, src: str, in_expr: str,
                        add_const: int, carry: str = "") -> str:
    """CTE chain computing h = splitmix64(in_expr, seed) as UBIGINT
    column `h` in CTE `{prefix}3`, carrying `carry` columns through.
    Mirrors sketch/hashing.py:splitmix64 exactly (validated bit-exact by
    the existing _SM chain; multiplies via _sql_mulmod64)."""
    c = f"{carry}, " if carry else ""
    return f"""
{prefix}0 AS (SELECT {c}CAST((CAST({in_expr} AS HUGEINT) + {add_const})
                           % {_M64} AS UBIGINT) AS z FROM {src}),
{prefix}1 AS (SELECT {c}{_sql_mulmod64("CAST(xor(z, z >> 30) AS HUGEINT)",
                                       0xBF58476D1CE4E5B9)} AS z
              FROM {prefix}0),
{prefix}2 AS (SELECT {c}{_sql_mulmod64("CAST(xor(z, z >> 27) AS HUGEINT)",
                                       0x94D049BB133111EB)} AS z
              FROM {prefix}1),
{prefix}3 AS (SELECT {c}xor(z, z >> 31) AS h FROM {prefix}2)"""


def q_kmv_distinct_by_type(sf_dir: str) -> pd.DataFrame:
    """KMV bottom-k distinct sketch per event type — the DETERMINISTIC
    companion of the HLL row (sketch/kmv.py): state is exactly the k=64
    smallest distinct splitmix64(user_id) hashes, so the kept-set digest
    and the Beyer (k-1)/U_(k) estimate are exact functions of the input
    set and the oracle replays them bit-for-bit with SQL window
    functions (splitmix64 is a bijection on u64, so DISTINCT user_id ==
    DISTINCT hash). Built with the salted two-stage grouped merge
    (stages/sketch_build.py:build_grouped_sketches) — partials only ever
    hold <= k hashes, raw-mode ships plain hash lists for tiny blocks."""
    from ..sketch.kmv import KMV
    from ..stages.sketch_build import build_grouped_sketches

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    built = build_grouped_sketches(ds, key="event_type", column="user_id",
                                   kind="kmv", params={"k": _KMV_K})
    rows = []
    for _, r in built.iterrows():
        sk = KMV.from_bytes(r["payload"])
        rows.append({"event_type": r["event_type"],
                     "n_kept": len(sk.kept),
                     "kept_digest": sk.digest(),
                     "est_distinct": round(sk.estimate(), 6)})
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    out["n_kept"] = out["n_kept"].astype("int64")
    out["kept_digest"] = out["kept_digest"].astype("int64")
    return out


_SQL_KMV_KEPT = (
    "du AS (SELECT DISTINCT event_type, user_id FROM events),"
    + _sql_splitmix_chain("kh", "du", "user_id", _SM_ADD_KMV,
                          carry="event_type")
    + f""",
kr AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nd
  FROM kh3
),
kept AS (SELECT event_type, h, nd FROM kr WHERE rn <= {_KMV_K}),
meta AS (
  SELECT event_type, max(h) AS kth, count(*) AS nk, max(nd) AS nd
  FROM kept GROUP BY event_type
)""")

SQL_KMV_DISTINCT = f"""
WITH {_SQL_KMV_KEPT}
SELECT m.event_type,
       CAST(m.nk AS BIGINT) AS n_kept,
       CAST(s.dig % 9223372036854775808 AS BIGINT) AS kept_digest,
       round(CASE WHEN m.nd < {_KMV_K} THEN CAST(m.nk AS DOUBLE)
                  ELSE {_KMV_K - 1} * 18446744073709551616.0
                       / CAST(m.kth AS DOUBLE) END, 6) AS est_distinct
FROM meta m JOIN (
  SELECT event_type, sum(CAST(h AS HUGEINT)) AS dig FROM kept GROUP BY 1
) s USING (event_type)
ORDER BY m.event_type
"""


def q_kmv_set_ops_types(sf_dir: str) -> pd.DataFrame:
    """Theta-sketch set operations over the per-type KMV sketches: for
    every unordered pair of event types, restrict both kept sets below
    the common threshold theta = min of the two retention thresholds
    (each restricted set is an exact rate-theta/2^64 uniform sample of
    its user set), then scale intersection/union counts by 2^64/theta —
    distributed set-overlap estimation without ever shuffling the raw
    keys. Deterministic end to end (sketch/kmv.py:set_ops), oracled by
    replaying the bottom-k sets and the theta restriction in SQL."""
    from ..sketch.kmv import KMV, set_ops
    from ..stages.sketch_build import build_grouped_sketches

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    built = build_grouped_sketches(ds, key="event_type", column="user_id",
                                   kind="kmv", params={"k": _KMV_K})
    sks = {r["event_type"]: KMV.from_bytes(r["payload"])
           for _, r in built.iterrows()}
    types = sorted(sks)
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            o = set_ops(sks[a], sks[b])
            rows.append({"type_a": a, "type_b": b,
                         "n_common": o["n_common"],
                         "n_union_kept": o["n_union_kept"],
                         "inter_est": round(o["inter_est"], 6),
                         "union_est": round(o["union_est"], 6),
                         "jaccard": round(o["jaccard"], 6)})
    out = pd.DataFrame(rows)
    out["n_common"] = out["n_common"].astype("int64")
    out["n_union_kept"] = out["n_union_kept"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


SQL_KMV_SET_OPS = f"""
WITH {_SQL_KMV_KEPT},
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         LEAST(CASE WHEN a.nd >= {_KMV_K} THEN CAST(a.kth AS HUGEINT) + 1
                    ELSE {1 << 64} END,
               CASE WHEN b.nd >= {_KMV_K} THEN CAST(b.kth AS HUGEINT) + 1
                    ELSE {1 << 64} END) AS theta
  FROM meta a JOIN meta b ON a.event_type < b.event_type
),
uh AS (
  SELECT p.type_a, p.type_b, p.theta, k.h,
         max(CASE WHEN k.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN k.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN kept k
    ON k.event_type IN (p.type_a, p.type_b)
   AND CAST(k.h AS HUGEINT) < p.theta
  GROUP BY p.type_a, p.type_b, p.theta, k.h
),
agg AS (
  SELECT type_a, type_b, theta,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_common,
         count(*)::BIGINT AS n_union_kept
  FROM uh GROUP BY type_a, type_b, theta
)
SELECT p.type_a, p.type_b,
       COALESCE(a.n_common, 0) AS n_common,
       COALESCE(a.n_union_kept, 0) AS n_union_kept,
       round(CAST(COALESCE(a.n_common, 0) AS DOUBLE)
             * (18446744073709551616.0 / CAST(p.theta AS DOUBLE)), 6)
         AS inter_est,
       round(CAST(COALESCE(a.n_union_kept, 0) AS DOUBLE)
             * (18446744073709551616.0 / CAST(p.theta AS DOUBLE)), 6)
         AS union_est,
       round(CASE WHEN COALESCE(a.n_union_kept, 0) > 0
                  THEN CAST(a.n_common AS DOUBLE) / a.n_union_kept
                  ELSE 0.0 END, 6) AS jaccard
FROM pairs p LEFT JOIN agg a USING (type_a, type_b)
ORDER BY p.type_a, p.type_b
"""


def q_heavy_hitter_items(sf_dir: str) -> pd.DataFrame:
    """EXACT heavy hitters (count >= ceil(total/50)) over a planted
    zipf(2) item stream derived from event_id (stages/heavy.py:
    zipf_items — P(item j) = 1/j - 1/(j+1), the url/domain/token shape
    of a real crawl, same deterministic-synthesis pattern as the
    multimodal payloads). Two bounded passes: per-block Misra-Gries
    size-64 summaries -> summed lower bounds -> candidate filter INSIDE
    the Dataset (driver collects <= 1/(phi - 1/(k+1)) ~ 217 rows,
    constant in data size) -> broadcast exact recount. Exactness is the
    MG no-false-negative guarantee; the oracle is a plain GROUP BY ...
    HAVING over the replayed item derivation."""
    from ..stages.heavy import heavy_hitters, zipf_items

    ds = _read(sf_dir, "events", columns=["event_id"])

    def items(t: pa.Table) -> np.ndarray:
        ids = t.column("event_id").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return zipf_items(np.asarray(ids))

    out, _total = heavy_hitters(ds, items, k=64, phi_num=1, phi_den=50)
    return out


SQL_HEAVY_HITTERS = f"""
WITH {_sql_splitmix_chain("zh", "events", "event_id", _SM_ADD_ZIPF).lstrip()},
i AS (
  SELECT CAST(CAST(9007199254740992 AS HUGEINT)
              // (CAST(h >> 11 AS HUGEINT) + 1) AS BIGINT) AS item
  FROM zh3
),
t AS (SELECT count(*)::BIGINT AS total FROM i),
c AS (SELECT item, count(*)::BIGINT AS n FROM i GROUP BY item)
SELECT c.item, c.n FROM c, t
WHERE 50 * c.n >= t.total
ORDER BY c.n DESC, c.item ASC
"""


def q_grouped_heavy_hitter_items(sf_dir: str) -> pd.DataFrame:
    """Per-key exact heavy hitters (the Gopher-style "heavy tokens per
    language" shape, keyed by event_type here): per-block MG summaries
    per key-in-block via the sort-split idiom, per-key cutoffs against
    broadcast totals, per-key candidate recount — every stage bounded by
    #keys x the candidate constant (stages/heavy.py:
    grouped_heavy_hitters). Same planted zipf stream as
    heavy_hitter_items; the oracle joins per-type totals back in SQL."""
    from ..stages.heavy import grouped_heavy_hitters, zipf_items

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def items(t: pa.Table) -> np.ndarray:
        ids = t.column("event_id").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return zipf_items(np.asarray(ids))

    out, _totals = grouped_heavy_hitters(ds, "event_type", items, k=64,
                                         phi_num=1, phi_den=50)
    return out.rename(columns={"item": "item", "n": "n"})


SQL_GROUPED_HEAVY = f"""
WITH {_sql_splitmix_chain("gz", "events", "event_id", _SM_ADD_ZIPF,
                          carry="event_type").lstrip()},
i AS (
  SELECT event_type,
         CAST(CAST(9007199254740992 AS HUGEINT)
              // (CAST(h >> 11 AS HUGEINT) + 1) AS BIGINT) AS item
  FROM gz3
),
t AS (SELECT event_type, count(*)::BIGINT AS total FROM i GROUP BY 1),
c AS (SELECT event_type, item, count(*)::BIGINT AS n FROM i GROUP BY 1, 2)
SELECT c.event_type, c.item, c.n
FROM c JOIN t USING (event_type)
WHERE 50 * c.n >= t.total
ORDER BY c.event_type, c.n DESC, c.item
"""


def q_shuffle_shard_report(sf_dir: str) -> pd.DataFrame:
    """Deterministic global shuffle into training shards — the last step
    of every curation pipeline (the reference leaves ordering to its
    caller, c/include/filter/block.h:43-46; this engine owns it). Shard =
    top 4 bits of splitmix64(doc_id), within-shard order = ascending
    hash; the report's positional digest sum(rank * h) mod 2^64 pins
    membership AND order per shard, so the SQL oracle (row_number window
    over the replayed hash chain) verifies the permutation bit-for-bit
    (stages/shuffle.py:shuffle_shards)."""
    from ..stages.shuffle import shuffle_shards

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return shuffle_shards(ds, "doc_id", nshards_log2=4)


_SM_ADD_SHUF = (0x5A5F * 0x9E3779B97F4A7C15 + 1) % _M64

SQL_SHUFFLE_SHARDS = f"""
WITH {_sql_splitmix_chain("su", "documents", "doc_id", _SM_ADD_SHUF,
                          carry="doc_id").lstrip()},
r AS (
  SELECT doc_id, h, CAST(h >> 60 AS BIGINT) AS shard,
         row_number() OVER (PARTITION BY h >> 60 ORDER BY h) AS rn
  FROM su3
)
SELECT shard,
       count(*)::BIGINT AS n_docs,
       CAST(sum(CAST(doc_id AS HUGEINT)) % {_M64}
            % 9223372036854775808 AS BIGINT) AS sum_doc_id,
       CAST(sum((CAST(rn AS HUGEINT) * CAST(h AS HUGEINT)) % {_M64})
            % {_M64} % 9223372036854775808 AS BIGINT) AS ord_digest
FROM r GROUP BY shard ORDER BY shard
"""


def q_mad_outlier_stats(sf_dir: str) -> pd.DataFrame:
    """Robust per-type outlier stats via median absolute deviation
    (stages/robust.py:mad_outlier_stats): exact lower medians from the
    histogram-refinement order-statistics engine, deviation column
    derived per batch from broadcast medians, bounded counting pass —
    no group ever materializes. Medians are exact stored doubles, so
    abs / scale*MAD / strict > are the same IEEE ops in the oracle:
    bit-for-bit match."""
    from ..stages.robust import mad_outlier_stats

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return mad_outlier_stats(ds, "event_type", "value", scale=3.0)


SQL_MAD_OUTLIERS = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) - 1
           AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT event_type,
         max(CASE WHEN rk = CAST(floor(0.5 * (n - 1)) AS BIGINT)
                  THEN value END) AS med,
         max(n) AS n
  FROM r GROUP BY 1
),
d AS (
  SELECT e.event_type, abs(e.value - m.med) AS dev
  FROM events e JOIN med m USING (event_type)
  WHERE e.value IS NOT NULL
),
r2 AS (
  SELECT event_type, dev,
         row_number() OVER (PARTITION BY event_type ORDER BY dev) - 1
           AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (
  SELECT event_type,
         max(CASE WHEN rk = CAST(floor(0.5 * (n - 1)) AS BIGINT)
                  THEN dev END) AS mad
  FROM r2 GROUP BY 1
)
SELECT m.event_type, m.med, a.mad,
       CAST(m.n AS BIGINT) AS n,
       CAST(sum(CASE WHEN d.dev > 3.0 * a.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM med m JOIN mad a USING (event_type) JOIN d USING (event_type)
GROUP BY m.event_type, m.med, a.mad, m.n
ORDER BY m.event_type
"""


def q_dedup_keep_best(sf_dir: str) -> pd.DataFrame:
    """Quality-keyed exact dedup (stages/dedup.py:exact_dedup with
    keep_score): every duplicate set keeps its HIGHEST-score member
    (ties min id) instead of the min id — the "keep the best copy, not
    the first crawled" curation policy. Corpus = documents plus a clone
    at doc_id+100000 with per-row scores derived from splitmix64(doc_id)
    so the clone pair genuinely disagrees on score; same bounded
    drop-set machinery (bloom prune + sharded exact confirm +
    DropIdStore spill) as exact_dedup_docs."""
    from ..sketch.hashing import splitmix64
    from ..stages.dedup import exact_dedup

    base = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def clone_and_score(t: pa.Table) -> pa.Table:
        shifted = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pa.array(np.asarray(t["doc_id"], dtype=np.int64) + 100000,
                     type=pa.int64()))
        both = pa.concat_tables([t, shifted])
        h = splitmix64(np.asarray(both["doc_id"], dtype=np.int64)
                       .astype(np.uint64), seed=_BEST_SEED)
        return both.append_column(
            "score", pa.array((h % np.uint64(1000)).astype(np.int64),
                              type=pa.int64()))

    from ray.data.aggregate import Count, Sum

    dup = base.map_batches(clone_and_score, batch_format="pyarrow")
    out = exact_dedup(dup, "text", "doc_id", keep_score="score") \
        .groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("doc_id", alias_name="sum_ids"),
            Sum("score", alias_name="sum_score")).to_pandas()
    for c in ("n_docs", "sum_ids", "sum_score"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


_BEST_SEED = 0x0B57
_SM_ADD_BEST = (_BEST_SEED * 0x9E3779B97F4A7C15 + 1) % _M64

SQL_DEDUP_KEEP_BEST = f"""
WITH dupd AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang FROM documents
),
{_sql_splitmix_chain("kb", "dupd", "doc_id", _SM_ADD_BEST,
                     carry="doc_id, text, lang").lstrip()},
s AS (SELECT doc_id, text, lang,
             CAST(h % 1000 AS BIGINT) AS score FROM kb3),
r AS (
  SELECT lang, doc_id, score,
         row_number() OVER (PARTITION BY text
                            ORDER BY score DESC, doc_id) AS rn
  FROM s
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(doc_id)::BIGINT AS sum_ids,
       sum(score)::BIGINT AS sum_score
FROM r WHERE rn = 1 GROUP BY lang ORDER BY lang
"""


def q_rollup_pricing_levels(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP in one input pass (stages/rollup.py): the finest
    (returnflag, linestatus) groupby shuffles the fact table once; the
    per-flag level and the grand total re-aggregate the combo-sized
    finest RESULT, never the raw rows. l_quantity is integer-valued, so
    double sums are exact at any accumulation order; round(2) follows
    the house float convention anyway."""
    from ..stages.rollup import rollup_aggregate

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])
    out = rollup_aggregate(
        ds, ["l_returnflag", "l_linestatus"], "l_quantity").to_pandas()
    out["sum_l_quantity"] = out["sum_l_quantity"].round(2)
    out["n"] = out["n"].astype("int64")
    out["lvl"] = out["lvl"].astype("int64")
    return out.sort_values(["lvl", "l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)


SQL_ROLLUP_PRICING = """
SELECT CAST(2 - GROUPING(l_returnflag) - GROUPING(l_linestatus)
            AS BIGINT) AS lvl,
       COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_quantity), 2) AS sum_l_quantity,
       count(*)::BIGINT AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY lvl, l_returnflag, l_linestatus
"""


def q_edit1_typo_pairs(sf_dir: str) -> pd.DataFrame:
    """Typo-variant detection (stages/fuzzy.py:edit1_pairs): ALL word
    pairs within Levenshtein distance 1 over the corpus vocabulary via
    FastSS deletion-neighborhood banding — shard-sharded candidate
    generation + the vectorized exact ed<=1 verify, never the O(V^2)
    cross join the oracle runs. The synthetic vocabulary has no natural
    ed-1 pairs, so each doc plants a deterministic typo of its first
    word by doc_id % 5 (0: last char dropped, 1: '-' appended, 2: first
    char -> '#') — the same rule the SQL computes, covering all three
    edit kinds plus typo-x-typo pairs."""
    from ..stages.fuzzy import edit1_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def vocab_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = t["text"].combine_chunks() \
            if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        lists = pc.split_pattern(text, " ")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        words = np.unique(np.asarray(flat)).astype(str)
        # the typo plant (test fixture, not the operator): pandas .str
        # slicing over the batch's plant rows only
        mask = pc.and_kleene(pc.is_valid(text), pc.not_equal(text, ""))
        sub = t.filter(pc.fill_null(mask, False))
        if sub.num_rows:
            fw = pd.Series(np.asarray(
                pc.list_element(pc.split_pattern(
                    sub["text"].combine_chunks()
                    if isinstance(sub["text"], pa.ChunkedArray)
                    else sub["text"], " "), 0)).astype(str))
            r = pd.Series(np.asarray(sub["doc_id"], dtype=np.int64) % 5)
            ok = fw.str.len() >= 2
            typos = pd.concat([
                fw[ok & (r == 0)].str[:-1],
                fw[ok & (r == 1)] + "-",
                "#" + fw[ok & (r == 2)].str[1:],
            ])
            words = np.unique(np.concatenate(
                [words, typos.to_numpy(dtype="U")]))
        return pa.table({"word": pa.array(words.astype(str),
                                          type=pa.string())})

    pairs = docs.map_batches(vocab_partial, batch_format="pyarrow")
    out = edit1_pairs(pairs, "word", num_shards=32).to_pandas()
    return out.sort_values(["w1", "w2"]).reset_index(drop=True)


SQL_EDIT1_TYPO_PAIRS = """
WITH first_word AS (
  SELECT doc_id, string_split(text, ' ')[1] AS w FROM documents
  WHERE text IS NOT NULL AND text <> ''
),
typos AS (
  SELECT CASE doc_id % 5
           WHEN 0 THEN substr(w, 1, length(w) - 1)
           WHEN 1 THEN w || '-'
           WHEN 2 THEN '#' || substr(w, 2)
         END AS word
  FROM first_word WHERE doc_id % 5 <= 2 AND length(w) >= 2
),
toks AS (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents),
vocab AS (
  SELECT DISTINCT word FROM (
    SELECT word FROM toks UNION ALL SELECT word FROM typos)
  WHERE word <> '' AND word IS NOT NULL
)
SELECT a.word AS w1, b.word AS w2
FROM vocab a JOIN vocab b
  ON a.word < b.word AND levenshtein(a.word, b.word) = 1
ORDER BY w1, w2
"""


def q_value_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Exact per-type percent_rank of every event's value
    (stages/rank.py): the group never materializes — one combined
    (key, value, cnt) histogram shuffle, per-key cumsum over distinct
    values, then ranks attach to the streaming rows (broadcast
    searchsorted here; composite-hash join with equality confirm above
    the bound, proven identical in tests). count_lt and n are exact
    ints and the final division is one IEEE op — bit-exact vs the SQL
    window function."""
    from ..stages.rank import percent_rank

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    out = percent_rank(ds, "event_type", "value",
                       id_cols=["event_id"]).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)[
        ["event_id", "event_type", "pr"]]


SQL_VALUE_PERCENT_RANK = """
SELECT event_id, event_type,
       percent_rank() OVER (PARTITION BY event_type
                            ORDER BY value) AS pr
FROM events WHERE value IS NOT NULL
ORDER BY event_id
"""


def q_user_running_value(sf_dir: str) -> pd.DataFrame:
    """Row-level running window functions per user
    (stages/running.py:grouped_running): 1-based row_number, running
    sum and lag-1 of value under the total order (ts, event_id) —
    the shard-scan shape (key-hash shard, one sort + one vectorized
    pass per shard, never per-group Python). The running sum is a
    sequential in-order IEEE chain in both engines; round(2) follows
    the house float convention (DuckDB evaluates cumulative frames
    with a segment tree, so the raw accumulation order can differ)."""
    from ..stages.running import grouped_running

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    out = grouped_running(ds, "user_id", ["ts", "event_id"], "value",
                          id_cols=["event_id"]).to_pandas()
    out["run_sum"] = out["run_sum"].round(2)
    out["prev_value"] = out["prev_value"].round(2)
    out["rn"] = out["rn"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)[
        ["event_id", "user_id", "rn", "run_sum", "prev_value"]]


SQL_USER_RUNNING_VALUE = """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS run_sum,
       round(lag(value, 1, 0.0) OVER w, 2) AS prev_value
FROM events WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


def q_value_ntile(sf_dir: str) -> pd.DataFrame:
    """Equi-depth bucketing: NTILE(8) of value within each event_type
    under the total order (value, event_id) — a pure COMPOSITION of
    stages/running.py:grouped_running (row numbers via the shard scan)
    with the exact integer NTILE size rule (first n%k buckets get
    floor(n/k)+1 rows) applied vectorized per batch off a broadcast
    5-row per-key count table. All-integer output — hash-exact."""
    import pyarrow.compute as pc

    from ..stages.running import grouped_running

    K = 8
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    rn_ds = grouped_running(ds, "event_type", ["value", "event_id"],
                            "value", id_cols=["event_id"])
    def _nn(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["value"]))

    counts = ds.map_batches(_nn, batch_format="pyarrow") \
        .groupby("event_type").count().to_pandas()
    n_by_key = ray.put(dict(zip(counts["event_type"],
                                counts["count()"].astype(np.int64))))

    def bucketize(t: pa.Table) -> pa.Table:
        from ..stages.broadcast import cached_broadcast

        nk = cached_broadcast(n_by_key, lambda m: m)
        keycol = t.column("event_type").combine_chunks()
        dict_arr = pc.dictionary_encode(keycol)
        codes = np.asarray(dict_arr.indices)
        n_lut = np.array([int(nk[kv])
                          for kv in dict_arr.dictionary.to_pylist()],
                         dtype=np.int64)
        n = n_lut[codes]
        rn = t.column("rn").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q, r = n // K, n % K
        hi = r * (q + 1)
        bucket = np.where(
            rn <= hi, (rn - 1) // np.maximum(q + 1, 1) + 1,
            r + (rn - hi - 1) // np.maximum(q, 1) + 1)
        return pa.table({
            "event_id": t["event_id"],
            "event_type": keycol,
            "bucket": pa.array(bucket.astype(np.int64)),
        })

    out = rn_ds.map_batches(bucketize, batch_format="pyarrow") \
        .to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["bucket"] = out["bucket"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


SQL_VALUE_NTILE = """
SELECT event_id, event_type,
       CAST(ntile(8) OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS BIGINT)
         AS bucket
FROM events WHERE value IS NOT NULL
ORDER BY event_id
"""


def q_doc_chunks(sf_dir: str) -> pd.DataFrame:
    """Sliding-window chunking (stages/chunk.py): every document
    expands into 64-token windows at stride 32 (tail = remainder) —
    the flat_map in front of an embedding or index build. Chunk text
    is a character-offset slice of the original string (offsets fully
    vectorized; only the final substring per OUTPUT row is Python),
    and the chunk-count rule ceil(max(L-64,0)/32)+1 is shared verbatim
    with the SQL list-slicing oracle."""
    from ..stages.chunk import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = chunk_documents(ds, "text", "doc_id",
                          window=64, stride=32).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["chunk_id"] = out["chunk_id"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)


SQL_DOC_CHUNKS = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS L
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, w, L,
         UNNEST(range(0, CAST(ceil(greatest(L - 64, 0) / 32.0)
                              AS BIGINT) + 1)) AS chunk_id
  FROM t
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       array_to_string(w[chunk_id*32 + 1 :
                         least(chunk_id*32 + 64, L)], ' ') AS chunk,
       CAST(least(chunk_id*32 + 64, L) - chunk_id*32 AS BIGINT)
         AS n_tokens
FROM g ORDER BY doc_id, chunk_id
"""


def q_docs_source_pivot(sf_dir: str) -> pd.DataFrame:
    """Corpus composition matrix (stages/rollup.py:pivot_counts —
    pivot/crosstab, absent from Ray Data): per-lang document counts
    pivoted wide over the 20 declared sources. Per-batch 2-D bincount
    partials emit the fixed wide layout, one groupby-Sum finishes —
    same shuffle volume as a plain grouped count; all-integer output,
    hash-exact vs 20 conditional-sum SQL columns."""
    from ..stages.rollup import pivot_counts

    cats = [f"src{i}" for i in range(20)]
    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    out = pivot_counts(ds, "lang", "source", cats).to_pandas()
    for c in cats:
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


SQL_DOCS_SOURCE_PIVOT = "SELECT lang,\n  " + ",\n  ".join(
    f"sum(CASE WHEN source = 'src{i}' THEN 1 ELSE 0 END)::BIGINT "
    f"AS src{i}" for i in range(20)
) + "\nFROM documents GROUP BY lang ORDER BY lang"


def q_link_extraction_edges(sf_dir: str) -> pd.DataFrame:
    """Crawl-to-link-graph bridge (stages/extract.py:links_stage):
    synthesize pages whose html embeds 1-3 planted <a href> anchors
    around the document text (targets an arithmetic function of doc_id,
    the PII-plant pattern), extract every href with the vectorized
    split kernels — no regex engine, no per-row Python — and return
    the full (doc_id, dst) edge list. The oracle replants the same
    URLs, so a parser that misses an anchor, truncates a URL at the
    wrong quote or picks up surrounding markup hash-mismatches."""
    from ..stages.extract import links_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synthesize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np.asarray(t["doc_id"], dtype=np.int64)
        text = t["text"].combine_chunks() \
            if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        body = np.asarray(pc.fill_null(text, "")).astype(str)
        html = []
        for i, tx in zip(ids, body):  # plant loop (test fixture)
            anchors = "".join(
                f'<a href="https://d{(i * 7 + k) % 50}.example/'
                f'p{(i + k) % 1000}">x</a>'
                for k in range(1, 2 + i % 3))
            html.append(f"<html><body><p>{tx}</p>{anchors}</body></html>")
        return pa.table({"doc_id": t["doc_id"],
                         "html": pa.array(html, type=pa.string())})

    edges = docs.map_batches(synthesize, batch_format="pyarrow") \
        .map_batches(links_stage(html_col="html", src_col="doc_id"),
                     batch_format="pyarrow")
    out = edges.to_pandas().rename(columns={"src": "doc_id"})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values(["doc_id", "dst"]).reset_index(drop=True)


SQL_LINK_EXTRACTION = """
WITH l AS (
  SELECT doc_id, UNNEST(range(1, 2 + doc_id % 3)) AS k FROM documents
)
SELECT doc_id,
       'https://d' || CAST((doc_id * 7 + k) % 50 AS VARCHAR)
        || '.example/p' || CAST((doc_id + k) % 1000 AS VARCHAR) AS dst
FROM l ORDER BY doc_id, dst
"""


def q_bmp_decode_features(sf_dir: str) -> pd.DataFrame:
    """REAL uncompressed-image decode under the oracle gate: 24-bit
    BI_RGB BMP payloads (bottom-up rows, BGR channels, 4-byte row
    padding — the format's genuine traps) attach per doc with the SAME
    dims/pixel formula as the PPM/PNG fixtures, so the PNG oracle SQL
    applies verbatim: a decoder that forgets the row flip or channel
    swizzle hash-mismatches."""
    from ..stages.multimodal import BmpFeatureStage, attach_bmp_images

    return _image_decode_features(sf_dir, attach_bmp_images,
                                  BmpFeatureStage)


def q_gif_decode_features(sf_dir: str) -> pd.DataFrame:
    """REAL palette-image decode under the oracle gate: deterministic
    valid GIF87a payloads (pure-Python GIF-variant LZW — variable
    9..12-bit codes, LSB packing, table-full deferred-clear) attach per
    doc, decode in the actor-pool GifFeatureStage, and the decoded
    dims/channel means aggregate per lang. The palette is an arithmetic
    function of the index (r=i, g=2i mod 256, b=255-i), so the oracle
    recomputes every decoded channel value — a mis-decoded LZW code or
    palette lookup hash-mismatches. Same exact-integer-sum mean
    contract as the PPM/PNG pipelines."""
    from ..stages.multimodal import GifFeatureStage, attach_gif_images

    return _image_decode_features(sf_dir, attach_gif_images,
                                  GifFeatureStage)


SQL_GIF_DECODE_FEATURES = """
WITH dims AS (
  SELECT doc_id, lang,
         8 + doc_id % 13 AS w, 8 + doc_id % 11 AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.lang,
         (tx.x * (ty.y + 1) + d.doc_id) % 256 AS idx
  FROM dims d, UNNEST(range(0, d.h)) AS ty(y),
       UNNEST(range(0, d.w)) AS tx(x)
),
imgs AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_images,
         CAST(sum(w) AS BIGINT) AS sum_width,
         CAST(sum(h) AS BIGINT) AS sum_height
  FROM dims GROUP BY lang
),
pix AS (
  SELECT lang, count(*) AS n_px,
         sum(idx) AS sr,
         sum((2 * idx) % 256) AS sg,
         sum(255 - idx) AS sb
  FROM px GROUP BY lang
)
SELECT i.lang, i.n_images, i.sum_width, i.sum_height,
       CAST(p.sr AS DOUBLE) / CAST(p.n_px AS DOUBLE) AS px_mean_r,
       CAST(p.sg AS DOUBLE) / CAST(p.n_px AS DOUBLE) AS px_mean_g,
       CAST(p.sb AS DOUBLE) / CAST(p.n_px AS DOUBLE) AS px_mean_b
FROM imgs i JOIN pix p USING (lang) ORDER BY lang
"""


def q_wav_spectrogram_features(sf_dir: str) -> pd.DataFrame:
    """Audio feature EXTRACTION beyond container stats: framed-rfft
    spectral features (stages/multimodal.py:WavSpectrogramStage —
    dominant bin, spectral centroid, rms per clip) in an actor-pool
    stage over real decoded WAV payloads, aggregated per lang. FFT is
    not SQL-expressible — every value is instead recomputed
    sample-exactly by plain numpy in tests; rows-only driver check."""
    from ray.data.aggregate import Count, Mean

    from ..stages.multimodal import WavSpectrogramStage, attach_wav_audio

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    feats = ds.map_batches(attach_wav_audio, batch_format="pyarrow",
                           batch_size=256) \
        .map_batches(WavSpectrogramStage, batch_format="pyarrow",
                     batch_size=256, concurrency=(2, 16),
                     fn_constructor_kwargs={"frame_len": 128,
                                            "hop": 64})
    out = feats.groupby("lang").aggregate(
        Count(alias_name="n_clips"),
        Mean("n_frames", alias_name="avg_frames"),
        Mean("spectral_centroid", alias_name="avg_centroid"),
        Mean("dominant_bin", alias_name="avg_dom_bin"),
    ).to_pandas()
    out["n_clips"] = out["n_clips"].astype("int64")
    for c in ("avg_frames", "avg_centroid", "avg_dom_bin"):
        out[c] = out[c].round(4)
    return out.sort_values("lang").reset_index(drop=True)


def q_fd_embedding_sketch(sf_dir: str) -> pd.DataFrame:
    """Frequent-Directions matrix sketch of the embedding column
    (sketch/frequent_directions.py): streaming mergeable low-rank
    covariance summary — per-block partials tree-merge via the
    standard build_sketch path, driver sees ell x dim floats. No SQL
    oracle (matrix spectral norms aren't SQL); instead the query
    SELF-CHECKS the published bound ||A^T A - B^T B||_2 <= ||A||_F^2 /
    ell against the exactly-computed covariance (embeddings is the
    small table; the exact check gates off above 2^20 rows and reports
    -1). count/fnorm2/bound are exact and deterministic; the spectral
    error depends on block merge order, so only bound_ok is asserted
    stable."""
    import pyarrow.compute as pc

    from ..stages.sketch_build import build_sketch

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    ell = 16
    sk = build_sketch(ds, "embedding", "fd", {"dim": dim, "ell": ell})
    n = sk.count
    if n <= 1 << 20:
        flat = np.concatenate([
            np.asarray(t.column("embedding").combine_chunks()
                       .flatten(), dtype=np.float64)
            for t in ds.iter_batches(batch_format="pyarrow")])
        A = flat.reshape(n, dim)
        B = sk.sketch_matrix()
        err = float(np.linalg.norm(A.T @ A - B.T @ B, 2))
    else:
        err = -1.0
    return pd.DataFrame([{
        "n_vectors": np.int64(n), "dim": np.int64(dim),
        "ell": np.int64(ell),
        "fnorm2": round(sk.fnorm2, 2),
        "err_bound": round(sk.cov_error_bound(), 2),
        "bound_ok": bool(err < 0 or err <= sk.cov_error_bound()),
    }])


# Ordering policy: the correctness driver grades the FIRST 50 entries of this
# dict, so SQL-oracled queries come first (rotating so every oracled query
# eventually lands in the graded window) and the no-oracle entries (sketch
# payloads, LSH-probabilistic results, throughput rows) sit at the end.
# Round-5 window, per the r4 VERDICT rotation plan: (a) queries NEW this
# round (never graded by anyone), (b) the never-driver-graded oracled
# queries (judge-verified in r3/r4 VERDICTs but never in a driver
# CORRECTNESS window — gif/bmp/link-extraction/pivot from r4 plus the
# r3 judge-verified block), (c) the judge-requested re-admits
# (supplier_revenue, event_funnel, doc_stats_by_lang, pricing_summary,
# bloom_semijoin — driver-green in r2/r3, re-graded to guard
# regressions), and (d) the OLDEST driver-graded anchors (r1/r2
# windows) to fill to 50. Every r4-window entry (driver-confirmed
# 50/50 in CORRECTNESS_r04.json) rotates below slot 50.
QUERIES: dict[str, Callable[[str], Any]] = {
    # -- (a) new this round, never graded --
    "cuckoo_membership": q_cuckoo_membership,
    "link_pagerank_redistribute": q_link_pagerank_redistribute,
    # -- (b) oracled but never driver-graded (judge-verified only) --
    "gif_decode_features": q_gif_decode_features,
    "bmp_decode_features": q_bmp_decode_features,
    "link_extraction_edges": q_link_extraction_edges,
    "docs_source_pivot": q_docs_source_pivot,
    "sequence_packing_sharded": q_sequence_packing_sharded,
    "url_dedup_latest": q_url_dedup_latest,
    "crawl_delta": q_crawl_delta,
    "decontamination_stats": q_decontamination_stats,
    "multimodal_meta_counts": q_multimodal_meta_counts,
    "keyword_topk": q_keyword_topk,
    "ppm_decode_features": q_ppm_decode_features,
    "customer_order_counts": q_customer_order_counts,
    "train_val_test_split": q_train_val_test_split,
    "quality_percentile_cut": q_quality_percentile_cut,
    "exact_value_quantiles": q_exact_value_quantiles,
    "inverted_index_search": q_inverted_index_search,
    "bm25_search": q_bm25_search,
    # -- (c) judge-requested re-admits (driver-green r2/r3) --
    "supplier_revenue": q_supplier_revenue,
    "event_funnel": q_event_funnel,
    "doc_stats_by_lang": q_doc_stats_by_lang,
    "pricing_summary": q_pricing_summary,
    "bloom_semijoin": q_bloom_semijoin,
    # -- (d) oldest driver-graded anchors (r1/r2), re-admitted --
    "extract_roundtrip": q_extract_roundtrip,
    "hibp_members_complete": q_hibp_members_complete,
    "checkpointed_lineage_counts": q_checkpointed_lineage_counts,
    "order_priority_revenue": q_order_priority_revenue,
    "events_asof_orders": q_events_asof_orders,
    "value_band_range_join": q_value_band_range_join,
    "distinct_users_by_type": q_distinct_users_by_type,
    "value_quantiles_by_type": q_value_quantiles_by_type,
    "top_users_by_events": q_top_users_by_events,
    "text_stats_by_lang": q_text_stats_by_lang,
    "exact_dedup_docs": q_exact_dedup_docs,
    "ann_topk_brute": q_ann_topk_brute,
    "revenue_by_nation": q_revenue_by_nation,
    "orders_by_month": q_orders_by_month,
    "events_hourly_windows": q_events_hourly_windows,
    "user_sessions": q_user_sessions,
    "top_parts_per_brand": q_top_parts_per_brand,
    "json_props_stats": q_json_props_stats,
    "domain_doc_counts": q_domain_doc_counts,
    "tbf_exact_membership": q_tbf_exact_membership,
    "block_bloom_membership": q_block_bloom_membership,
    "growable_membership": q_growable_membership,
    "static_xor_membership": q_static_xor_membership,
    "minimal_taffy_membership": q_minimal_taffy_membership,
    "quality_filter_counts": q_quality_filter_counts,
    "partitioned_sink_roundtrip": q_partitioned_sink_roundtrip,
    # ---- slot 50 boundary ----
    # -- rotation: the whole r4 window (driver-confirmed 50/50 in
    # CORRECTNESS_r04.json) sits below slot 50 this round, plus
    # ngram_jaccard_dedup (driver-green r2) bumped by the pagerank
    # redistribute addition --
    "ngram_jaccard_dedup": q_ngram_jaccard_dedup,
    "bloom_antijoin": q_bloom_antijoin,
    "training_prep_pipeline": q_training_prep_pipeline,
    "bloom_per_lang_source": q_bloom_per_lang_source,
    "incremental_growable": q_incremental_growable,
    "tcf_per_domain": q_tcf_per_domain,
    "checkpointed_dedup_resume": q_checkpointed_dedup_resume,
    "line_dedup_stats": q_line_dedup_stats,
    "doc_repetition_stats": q_doc_repetition_stats,
    "top_words": q_top_words,
    "pii_scrub_stats": q_pii_scrub_stats,
    "label_centroids": q_label_centroids,
    "sequence_packing": q_sequence_packing,
    "domain_cap": q_domain_cap,
    "freq_quality_stats": q_freq_quality_stats,
    "token_budget_sample": q_token_budget_sample,
    "weighted_mixture_sample": q_weighted_mixture_sample,
    "lm_quality_filter": q_lm_quality_filter,
    "blocklist_filter_stats": q_blocklist_filter_stats,
    "top_collocations": q_top_collocations,
    "bm25_snippets": q_bm25_snippets,
    "shipping_priority": q_shipping_priority,
    "wav_decode_stats": q_wav_decode_stats,
    "ann_topk_ivf_exhaustive": q_ann_topk_ivf_exhaustive,
    "ann_topk_pq_exhaustive": q_ann_topk_pq_exhaustive,
    "embedding_exact_pairs": q_embedding_exact_pairs,
    "part_lineitem_full_join": q_part_lineitem_full_join,
    "warc_roundtrip": q_warc_roundtrip,
    "png_decode_features": q_png_decode_features,
    "checkpointed_bloom_members": q_checkpointed_bloom_members,
    "bloom_intersect_members": q_bloom_intersect_members,
    "y4m_frame_sample": q_y4m_frame_sample,
    "multimodal_features": q_multimodal_features,
    "link_components_stats": q_link_components_stats,
    "link_pagerank_topk": q_link_pagerank_topk,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "bpe_merges": q_bpe_merges,
    "bpe_token_stats": q_bpe_token_stats,
    "kmv_distinct_by_type": q_kmv_distinct_by_type,
    "kmv_set_ops_types": q_kmv_set_ops_types,
    "heavy_hitter_items": q_heavy_hitter_items,
    "grouped_heavy_hitter_items": q_grouped_heavy_hitter_items,
    "shuffle_shard_report": q_shuffle_shard_report,
    "mad_outlier_stats": q_mad_outlier_stats,
    "dedup_keep_best": q_dedup_keep_best,
    "rollup_pricing_levels": q_rollup_pricing_levels,
    "edit1_typo_pairs": q_edit1_typo_pairs,
    "value_percent_rank": q_value_percent_rank,
    "user_running_value": q_user_running_value,
    "value_ntile": q_value_ntile,
    "doc_chunks": q_doc_chunks,
    # -- remaining oracled queries (driver-green in earlier rounds;
    # family coverage stays in-window: sliding via events_hourly,
    # punct/stopword via text_stats, vq via the membership block,
    # stratified via the split/percentile pair, near_dup via
    # ngram_jaccard_dedup) --
    "events_sliding_windows": q_events_sliding_windows,
    "punct_stopword_stats": q_punct_stopword_stats,
    "vector_quotient_membership": q_vector_quotient_membership,
    "stratified_sample_counts": q_stratified_sample_counts,
    "ngram_jaccard_near_dup": q_ngram_jaccard_near_dup,
    # -- no SQL oracle (sketch payloads / probabilistic / throughput) --
    "block_bloom_per_lang": q_block_bloom_per_lang,
    "growable_filters_per_lang": q_growable_filters_per_lang,
    "sketch_summary_events": q_sketch_summary_events,
    "static_xor_per_lang": q_static_xor_per_lang,
    "checkpointed_build_resume": q_checkpointed_build_resume,
    "ann_topk_ivf": q_ann_topk_ivf,
    "minhash_near_dup": q_minhash_near_dup,
    "simhash_near_dup": q_simhash_near_dup,
    "embedding_near_dup": q_embedding_near_dup,
    "hibp_filter_report": q_hibp_filter_report,
    "sketch_build_throughput": q_sketch_build_throughput,
    "minimal_taffy_per_lang": q_minimal_taffy_per_lang,
    "vector_quotient_per_lang": q_vector_quotient_per_lang,
    "multimodal_audio": q_multimodal_audio,
    "doc_fingerprints": q_doc_fingerprints,
    "ann_topk_pq": q_ann_topk_pq,
    "duplicate_passage_stats": q_duplicate_passage_stats,
    "fd_embedding_sketch": q_fd_embedding_sketch,
    "wav_spectrogram_features": q_wav_spectrogram_features,
}

ORACLES: dict[str, str] = {
    "doc_stats_by_lang": SQL_DOC_STATS,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "bloom_semijoin": SQL_BLOOM_SEMIJOIN,
    "extract_roundtrip": SQL_EXTRACT_ROUNDTRIP,
    "distinct_users_by_type": SQL_DISTINCT_USERS,
    "value_quantiles_by_type": SQL_VALUE_QUANTILES,
    "top_users_by_events": SQL_TOP_USERS,
    "text_stats_by_lang": SQL_TEXT_STATS,
    "exact_dedup_docs": SQL_EXACT_DEDUP,
    "ann_topk_brute": SQL_ANN_TOPK,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "orders_by_month": SQL_ORDERS_BY_MONTH,
    "events_hourly_windows": SQL_EVENTS_HOURLY,
    "events_sliding_windows": SQL_EVENTS_SLIDING,
    "user_sessions": SQL_USER_SESSIONS,
    "top_parts_per_brand": SQL_TOP_PARTS,
    "json_props_stats": SQL_JSON_PROPS,
    "domain_doc_counts": SQL_DOMAIN_COUNTS,
    "tbf_exact_membership": SQL_TBF_EXACT,
    "block_bloom_membership": SQL_BLOCK_BLOOM_MEMBERSHIP,
    "growable_membership": SQL_GROWABLE_MEMBERSHIP,
    "static_xor_membership": SQL_STATIC_XOR_MEMBERSHIP,
    "minimal_taffy_membership": SQL_MINIMAL_TAFFY_MEMBERSHIP,
    "events_asof_orders": SQL_EVENTS_ASOF,
    "value_band_range_join": SQL_VALUE_BAND_RANGE_JOIN,
    "punct_stopword_stats": SQL_PUNCT_STOPWORD,
    "vector_quotient_membership": SQL_STATIC_XOR_MEMBERSHIP,
    "quality_filter_counts": SQL_QUALITY_FILTER,
    "stratified_sample_counts": SQL_STRATIFIED_SAMPLE,
    "partitioned_sink_roundtrip": SQL_SINK_ROUNDTRIP,
    "order_priority_revenue": SQL_ORDER_PRIORITY_REVENUE,
    "ngram_jaccard_near_dup": SQL_NGRAM_JACCARD,
    "ngram_jaccard_dedup": SQL_NGRAM_JACCARD_DEDUP,
    "bloom_antijoin": SQL_BLOOM_ANTIJOIN,
    "training_prep_pipeline": SQL_TRAINING_PREP,
    "event_funnel": SQL_EVENT_FUNNEL,
    "supplier_revenue": SQL_SUPPLIER_REVENUE,
    "bloom_per_lang_source": SQL_BLOOM_PER_LANG_SOURCE,
    "incremental_growable": SQL_INCREMENTAL_GROWABLE,
    "tcf_per_domain": SQL_TCF_PER_DOMAIN,
    "checkpointed_dedup_resume": SQL_EXACT_DEDUP,
    "line_dedup_stats": SQL_LINE_DEDUP_STATS,
    "doc_repetition_stats": SQL_DOC_REPETITION_STATS,
    "top_words": SQL_TOP_WORDS,
    "pii_scrub_stats": SQL_PII_SCRUB_STATS,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "sequence_packing": SQL_SEQUENCE_PACKING,
    "hibp_members_complete": SQL_HIBP_MEMBERS,
    "checkpointed_lineage_counts": SQL_CKPT_LINEAGE,
    "sequence_packing_sharded": SQL_SEQUENCE_PACKING_SHARDED,
    "url_dedup_latest": SQL_URL_DEDUP_LATEST,
    "domain_cap": SQL_DOMAIN_CAP,
    "decontamination_stats": SQL_DECONTAMINATION,
    "freq_quality_stats": SQL_FREQ_QUALITY,
    "token_budget_sample": SQL_TOKEN_BUDGET_SAMPLE,
    "weighted_mixture_sample": SQL_WEIGHTED_MIXTURE_SAMPLE,
    "lm_quality_filter": SQL_LM_QUALITY_FILTER,
    "keyword_topk": SQL_KEYWORD_TOPK,
    "train_val_test_split": SQL_TRAIN_VAL_TEST_SPLIT,
    "quality_percentile_cut": SQL_QUALITY_PERCENTILE_CUT,
    "blocklist_filter_stats": SQL_BLOCKLIST_FILTER,
    "top_collocations": SQL_TOP_COLLOCATIONS,
    "inverted_index_search": SQL_INVERTED_INDEX_SEARCH,
    "bm25_search": SQL_BM25_SEARCH,
    "bm25_snippets": SQL_BM25_SNIPPETS,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "ppm_decode_features": SQL_PPM_DECODE_FEATURES,
    "wav_decode_stats": SQL_WAV_DECODE_STATS,
    "crawl_delta": SQL_CRAWL_DELTA,
    "customer_order_counts": SQL_CUSTOMER_ORDER_COUNTS,
    "ann_topk_ivf_exhaustive": SQL_ANN_TOPK,
    "ann_topk_pq_exhaustive": SQL_ANN_TOPK,
    "embedding_exact_pairs": SQL_EMBEDDING_EXACT_PAIRS,
    "multimodal_meta_counts": SQL_MULTIMODAL_META_COUNTS,
    "exact_value_quantiles": SQL_EXACT_VALUE_QUANTILES,
    "part_lineitem_full_join": SQL_PART_LINEITEM_FULL_JOIN,
    "warc_roundtrip": SQL_WARC_ROUNDTRIP,
    "png_decode_features": SQL_PNG_DECODE_FEATURES,
    "checkpointed_bloom_members": SQL_CKPT_BLOOM_MEMBERS,
    "bloom_intersect_members": SQL_BLOOM_INTERSECT,
    "y4m_frame_sample": SQL_Y4M_FRAME_SAMPLE,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "link_components_stats": SQL_LINK_COMPONENTS_STATS,
    "link_pagerank_topk": SQL_LINK_PAGERANK_TOPK,
    "jsonl_roundtrip": SQL_JSONL_ROUNDTRIP,
    "bpe_merges": SQL_BPE_MERGES,
    "bpe_token_stats": SQL_BPE_TOKEN_STATS,
    "kmv_distinct_by_type": SQL_KMV_DISTINCT,
    "kmv_set_ops_types": SQL_KMV_SET_OPS,
    "heavy_hitter_items": SQL_HEAVY_HITTERS,
    "grouped_heavy_hitter_items": SQL_GROUPED_HEAVY,
    "shuffle_shard_report": SQL_SHUFFLE_SHARDS,
    "mad_outlier_stats": SQL_MAD_OUTLIERS,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "rollup_pricing_levels": SQL_ROLLUP_PRICING,
    "edit1_typo_pairs": SQL_EDIT1_TYPO_PAIRS,
    "value_percent_rank": SQL_VALUE_PERCENT_RANK,
    "user_running_value": SQL_USER_RUNNING_VALUE,
    "value_ntile": SQL_VALUE_NTILE,
    "doc_chunks": SQL_DOC_CHUNKS,
    "gif_decode_features": SQL_GIF_DECODE_FEATURES,
    "bmp_decode_features": SQL_PNG_DECODE_FEATURES,  # same fixture math
    "link_extraction_edges": SQL_LINK_EXTRACTION,
    "docs_source_pivot": SQL_DOCS_SOURCE_PIVOT,
    "cuckoo_membership": SQL_CUCKOO_MEMBERSHIP,
    "link_pagerank_redistribute": SQL_LINK_PAGERANK_REDISTRIBUTE,
}
