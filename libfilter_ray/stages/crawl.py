"""Crawl-curation stages over the Common-Crawl-shaped web-page table
(url, warc_ts, html, text, lang — BASELINE.json `input_hint`):

- `keyed_latest_drop_ds` / `url_dedup_latest`: keep only the NEWEST
  capture of every url (recrawl dedup — the first pass of any crawl
  snapshot merge). Same bounded distributed shape as exact dedup
  (stages/dedup.py): narrow (key_hash, order, id) shuffle, bloom-pruned
  exact confirm, O(duplicate captures) drop set through the shared
  broadcast/DropIdStore carrier.

- `per_key_cap_keep_ds` / `domain_cap`: at most `cap` documents per
  domain, chosen by a deterministic hash rank (the standard anti-spam /
  diversity cap in crawl curation). INVERTED carrier: the keep set is
  O(domains x cap) — tiny even when the corpus is not — so the keep ids
  broadcast, never the complement. Per-batch combiner pre-prunes to each
  batch's local top-`cap` before the one narrow shuffle, so a hot domain
  (the skew case) ships at most cap rows per block, not its whole mass.

- `contamination_flags` / `decontaminate`: benchmark decontamination —
  flag corpus documents sharing >= `threshold` of their distinct
  k-shingles with a benchmark document set (the eval-leakage guard every
  training-data pipeline needs). The benchmark shingle set broadcasts
  once (exact sorted array up to a bound, BlockBloom beyond it); the
  corpus side is one streaming map_batches, no shuffle at all.

No reference analogue (the reference is a filter library); these are the
engine-level operators the north star's 10^12-document crawl pipeline
composes around the sketches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketch.hashing import hash_arrow_array, shard_of_values
from .dedup import (DROP_BROADCAST_LIMIT, _str, drop_id_filter,
                    drop_source_of)

U64 = np.uint64


# ---------------------------------------------------------------------------
# keep-newest-capture dedup (url, warc_ts)
# ---------------------------------------------------------------------------

def keyed_latest_drop_ds(ds, key_col: str, order_col: str, id_col: str, *,
                         num_shards: int = 64,
                         multi_limit: int = DROP_BROADCAST_LIMIT):
    """Dataset (one int64 `drop_id` column) of every row that is NOT its
    key's latest capture (max `order_col`; ties keep the min id —
    deterministic for identical re-captures).

    Same collision-proof bounded shape as `exact_dedup_drop_ds`:

    1. narrow (key_hash, id) groupby finds keys with >1 capture; up to
       `multi_limit` of them the prune set broadcasts exactly (bloom +
       sorted array), beyond it bloom-only (false positives ride the
       confirm shuffle as singleton groups and survive unharmed).
    2. one shuffle of ONLY the multi-capture rows — (key_hash, key,
       order, id); the exact key string rides along so two keys sharing
       a 64-bit hash each keep their own latest.
    3. per-shard vectorized confirm: sort by (hash, key, -order, id),
       first row per (hash, key) survives, the rest emit as drop ids.

    `order_col` may be any Arrow type with a total order that casts to
    int64 (timestamps cast to their epoch microseconds)."""
    import ray

    from ..sketch import sizing
    from ..sketch.block_bloom import BlockBloom
    from .dedup import _empty_drop_ds
    from .sketch_build import build_sketch

    def project(t: pa.Table) -> pa.Table:
        # key hash ONLY — the Count aggregate never reads ids, and at
        # corpus scale carrying them would double this pass's shuffle
        return pa.table({
            "key_hash": pa.array(
                hash_arrow_array(t[key_col]).view(np.int64),
                type=pa.int64()),
        })

    from ray.data.aggregate import Count

    agg = ds.map_batches(project, batch_format="pyarrow") \
        .groupby("key_hash").aggregate(Count(alias_name="n_captures")) \
        .filter(expr="n_captures > 1") \
        .select_columns(["key_hash"]).materialize()
    n_multi = agg.count()
    if n_multi == 0:
        return _empty_drop_ds()
    multi_ref = None
    if n_multi <= multi_limit:
        multi = np.sort(agg.to_pandas()["key_hash"].to_numpy()
                        .astype(np.int64))
        bloom = BlockBloom(sizing.block_bytes_needed(len(multi), 0.001))
        bloom.add_hashes(multi.view(U64))
        bloom_ref = ray.put(bloom.to_bytes())
        multi_ref = ray.put(multi)
    else:
        bloom = build_sketch(
            agg, "key_hash", "block",
            {"bytes_": sizing.block_bytes_needed(n_multi, 0.001)},
            pre_hashed=True)
        bloom_ref = ray.put(bloom.to_bytes())

    def pick_multi(t: pa.Table) -> pa.Table:
        from .broadcast import cached_broadcast

        bloom = cached_broadcast(bloom_ref, BlockBloom.from_bytes)
        h = hash_arrow_array(t[key_col]).view(np.int64)
        maybe = bloom.find_hashes(h.view(U64))
        t2 = t.select([id_col, key_col, order_col]).filter(pa.array(maybe))
        h2 = h[maybe]
        if multi_ref is not None:
            multi = ray.get(multi_ref)
            idx = np.searchsorted(multi, h2)
            hit = (idx < len(multi)) & (
                multi[np.minimum(idx, len(multi) - 1)] == h2)
            t2 = t2.filter(pa.array(hit))
            h2 = h2[hit]
        order = pa.compute.cast(
            t2[order_col].combine_chunks()
            if isinstance(t2[order_col], pa.ChunkedArray)
            else t2[order_col], pa.int64())
        shard = (h2.view(U64) % U64(num_shards)).astype(np.int64)
        return pa.table({
            "key_hash": pa.array(h2, type=pa.int64()),
            key_col: t2[key_col],
            "__order": order,
            id_col: t2[id_col],
            "shard": pa.array(shard, type=pa.int64()),
        })

    def confirm_drop(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__neg=-df["__order"].to_numpy()) \
            .sort_values(["key_hash", key_col, "__neg", id_col],
                         kind="stable")
        dropped = df[df.duplicated(subset=["key_hash", key_col])]
        return pd.DataFrame({
            "drop_id": dropped[id_col].to_numpy().astype(np.int64)})

    return ds.map_batches(pick_multi, batch_format="pyarrow") \
        .groupby("shard").map_groups(confirm_drop, batch_format="pandas")


def url_dedup_latest(ds, *, url_col: str = "url",
                     ts_col: str = "warc_ts", id_col: str,
                     broadcast_limit: int = DROP_BROADCAST_LIMIT,
                     store_dir: str | None = None):
    """Keep only the newest capture of every url. One narrow dedup pass
    + one streaming filter; driver memory bounded via the shared
    broadcast/DropIdStore carrier."""
    drop_ds = keyed_latest_drop_ds(ds, url_col, ts_col, id_col) \
        .materialize()
    source = drop_source_of(drop_ds, broadcast_limit=broadcast_limit,
                            store_dir=store_dir)
    if source is None:
        return ds
    return ds.map_batches(drop_id_filter(source, id_col),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-domain cap
# ---------------------------------------------------------------------------

def domain_of(url_col) -> pa.Array:
    """Vectorized host extraction: the authority component of an absolute
    URL. Malformed/schemeless/null urls (no `//host` part) map to the ""
    sentinel domain — they cap as one group like any other domain, so the
    keep set stays bounded and one bad row can never kill the job."""
    import pyarrow.compute as pc

    col = url_col.combine_chunks() \
        if isinstance(url_col, pa.ChunkedArray) else url_col
    host = pc.struct_field(
        pc.extract_regex(col, r"^[^/]*//(?P<host>[^/]*)"), "host")
    return pc.fill_null(host, "")


def cap_rank_of(ids: np.ndarray) -> np.ndarray:
    """Deterministic 32-bit Knuth multiplicative rank of int64 ids —
    expressible in ANSI SQL as (id * 2654435761) % 4294967296 so the cap
    choice itself oracles exactly."""
    return ((ids.astype(np.int64).view(U64) * U64(2654435761))
            & U64(0xFFFFFFFF)).astype(np.int64)


def per_key_cap_keep_ds(ds, key_of, id_col: str, *, cap: int,
                        num_shards: int = 64):
    """Dataset (one int64 `keep_id` column) of the rows that survive an
    at-most-`cap`-rows-per-key filter, keys chosen by ascending
    (cap_rank(id), id).

    INVERTED drop-set shape: the survivor set is O(keys x cap) — bounded
    regardless of corpus size — so it is the side that moves. A per-batch
    combiner keeps only each batch's local per-key top-`cap` before the
    one narrow shuffle (24 B/row, at most cap rows per key per block —
    a hot domain ships cap rows per block, not its whole mass), then a
    key-sharded exact top-`cap` finishes the selection.

    `key_of(table) -> pa.Array` extracts the key column (e.g. `domain_of`
    over urls) and MUST return non-null keys — pandas groupby silently
    drops null-key rows, which here would silently DELETE them from the
    corpus (the keep set is the survivor list). `domain_of` maps
    malformed urls to the "" sentinel for exactly this reason."""

    def combiner(t: pa.Table) -> pa.Table:
        keys = key_of(t)
        if keys.null_count:
            raise ValueError(
                "per_key_cap_keep_ds: null keys would be silently "
                "dropped from the corpus — map them to a sentinel first")
        ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rank = cap_rank_of(ids)
        df = pd.DataFrame({
            "key": keys.to_numpy(zero_copy_only=False),
            "rank": rank, "id": ids,
        }).sort_values(["key", "rank", "id"], kind="stable")
        local = df.groupby("key", sort=False).head(cap)
        return pa.table({
            "key": pa.array(local["key"].to_numpy()),
            "rank": pa.array(local["rank"].to_numpy(), type=pa.int64()),
            "id": pa.array(local["id"].to_numpy(), type=pa.int64()),
            "shard": pa.array(
                shard_of_values(pa.array(local["key"].to_numpy()),
                                num_shards, seed=0xD0CA),
                type=pa.int64()),
        })

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "rank", "id"], kind="stable")
        kept = df.groupby("key", sort=False).head(cap)
        return pd.DataFrame({
            "keep_id": kept["id"].to_numpy().astype(np.int64)})

    return ds.map_batches(combiner, batch_format="pyarrow") \
        .groupby("shard").map_groups(pick, batch_format="pandas")


def keep_id_filter(keep_source, id_col: str):
    """map_batches fn keeping ONLY rows whose id is in the keep set
    (same carriers as `drop_id_filter`, membership inverted)."""
    from .dedup import _drop_mask

    def fn(t: pa.Table) -> pa.Table:
        ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.filter(pa.array(_drop_mask(keep_source, ids)))

    return fn


def domain_cap(ds, *, url_col: str = "url", id_col: str, cap: int,
               broadcast_limit: int = DROP_BROADCAST_LIMIT,
               store_dir: str | None = None):
    """At most `cap` documents per domain (host of `url_col`), chosen by
    deterministic hash rank. Keep set broadcasts (or spills to a
    DropIdStore used as a keep-store) — never the complement."""
    keep_ds = per_key_cap_keep_ds(
        ds, lambda t: domain_of(t[url_col]), id_col, cap=cap) \
        .materialize()

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["drop_id"])  # carrier expects drop_id

    source = drop_source_of(
        keep_ds.map_batches(rename, batch_format="pyarrow").materialize(),
        broadcast_limit=broadcast_limit, store_dir=store_dir)
    if source is None:
        return ds  # empty corpus — nothing to cap
    return ds.map_batches(keep_id_filter(source, id_col),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# crawl snapshot delta
# ---------------------------------------------------------------------------

def crawl_delta(ds_a, ds_b, *, url_col: str = "url",
                content_col: str = "text", num_shards: int = 64):
    """Per-url diff of two crawl snapshots: Dataset (url, status) with
    status in {'added', 'removed', 'changed', 'unchanged'} — the incremental
    ingest planner's input (process only added+changed).

    Distributed full-outer-join shape: both sides project to the NARROW
    (url_hash, url, content_hash, side) rows — ~40 B + url each, payloads
    never shuffle — tagged-union, co-partition by url-hash, per-shard
    vectorized classify. Urls colliding on the 64-bit hash only co-shard;
    classification compares exact url strings."""
    import ray.data

    def project(side: int):
        def fn(t: pa.Table) -> pa.Table:
            uh = hash_arrow_array(t[url_col]).view(np.int64)
            ch = hash_arrow_array(t[content_col]).view(np.int64)
            return pa.table({
                "url_hash": pa.array(uh, type=pa.int64()),
                url_col: t[url_col],
                "content_hash": pa.array(ch, type=pa.int64()),
                "side": pa.array(
                    np.full(t.num_rows, side, dtype=np.int64)),
                "shard": pa.array(
                    (uh.view(U64) % U64(num_shards)).astype(np.int64)),
            })
        return fn

    both = ds_a.map_batches(project(0), batch_format="pyarrow") \
        .union(ds_b.map_batches(project(1), batch_format="pyarrow"))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        # snapshots are assumed url-unique (run url_dedup_latest first);
        # duplicates within a side resolve to their first content hash
        a = df[df["side"] == 0].drop_duplicates(subset=[url_col])
        b = df[df["side"] == 1].drop_duplicates(subset=[url_col])
        m = a.merge(b, on=url_col, how="outer", suffixes=("_a", "_b"),
                    indicator=True)
        status = np.where(
            m["_merge"] == "right_only", "added",
            np.where(m["_merge"] == "left_only", "removed",
                     np.where(m["content_hash_a"] == m["content_hash_b"],
                              "unchanged", "changed")))
        return pd.DataFrame({url_col: m[url_col].to_numpy(),
                             "status": status})

    return both.groupby("shard").map_groups(classify,
                                            batch_format="pandas")


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

#: benchmark shingle sets up to this many distinct hashes broadcast as an
#: exact sorted array (8 B each); beyond it a BlockBloom broadcasts
#: instead and the contamination ratio gains the bloom's ~0.1% false-hit
#: rate (disclosed — the flags stay a strict superset).
BENCH_EXACT_LIMIT = 1 << 24


def benchmark_shingle_ref(bench_ds, column: str, *, k: int = 8,
                          exact_limit: int = BENCH_EXACT_LIMIT):
    """(ref, exact) — a plasma ObjectRef carrying the benchmark set's
    distinct k-shingle hashes as a sorted u64 array (exact=True) or a
    BlockBloom's bytes (exact=False). Distinct-ing happens distributed
    (per-batch unique -> groupby-free aggregate via np.unique of bounded
    partials when exact; bloom build when not)."""
    import ray

    from ..functions.shingles import shingle_hashes

    def per_batch(t: pa.Table) -> pa.Table:
        h, _ = shingle_hashes(_str(t[column]), k=k)
        return pa.table({"sh": pa.array(np.unique(h).view(np.int64),
                                        type=pa.int64())})

    uniq = bench_ds.map_batches(per_batch, batch_format="pyarrow") \
        .materialize()
    n = uniq.count()
    if n <= exact_limit:
        flat = uniq.to_pandas()["sh"].to_numpy().astype(np.int64)
        # unique in the U64 domain — an int64-sorted array bit-viewed as
        # u64 is NOT sorted (hashes >= 2^63 sort first), which silently
        # breaks every searchsorted against it
        return ray.put(np.unique(flat.view(U64))), True
    from ..sketch import sizing
    from .sketch_build import build_sketch

    bloom = build_sketch(
        uniq, "sh", "block",
        {"bytes_": sizing.block_bytes_needed(n, 0.001)}, pre_hashed=True)
    return ray.put(bloom.to_bytes()), False


def contamination_flags(column: str, id_col: str, sh_ref, exact: bool, *,
                        k: int = 8, threshold: float = 0.5):
    """map_batches fn: (id, n_shingles, n_hits, ratio, contaminated) per
    row — the fraction of the row's DISTINCT k-shingles present in the
    broadcast benchmark set. Rows shorter than k characters have no
    k-shingle and report ratio 0.0 (matching SQL substr semantics)."""
    import ray

    from ..functions.shingles import shingle_hashes
    from ..sketch.block_bloom import BlockBloom

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .broadcast import cached_broadcast

        col = _str(t[column])
        # BYTE length, matching the byte-k-gram shingles: a multibyte row
        # with char-len < k but byte-len >= k has real shingles that must
        # count (utf8_length would zero them and mask contamination).
        # Nulls count as length 0 (a null's NaN would dodge the < k mask
        # and let its sentinel hash score as a real shingle).
        lens = np.asarray(pc.fill_null(pc.binary_length(col), 0),
                          dtype=np.int64)
        ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h, splits = shingle_hashes(col, k=k)
        n = len(ids)
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
        order = np.lexsort((h, rows))
        r, v = rows[order], h[order]
        keep = np.r_[True, (r[1:] != r[:-1]) | (v[1:] != v[:-1])]
        r, v = r[keep], v[keep]
        if exact:
            bench = ray.get(sh_ref)  # zero-copy plasma read
            idx = np.searchsorted(bench, v)
            hit = (idx < len(bench)) & (
                bench[np.minimum(idx, max(len(bench) - 1, 0))] == v)
        else:
            bloom = cached_broadcast(sh_ref, BlockBloom.from_bytes)
            hit = bloom.find_hashes(v)
        n_sh = np.bincount(r, minlength=n)
        n_hit = np.bincount(r[hit], minlength=n)
        # rows shorter than k got a whole-row sentinel hash — zero them
        short = lens < k
        n_sh[short] = 0
        n_hit[short] = 0
        ratio = np.where(n_sh > 0, n_hit / np.maximum(n_sh, 1), 0.0)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "n_shingles": pa.array(n_sh, type=pa.int64()),
            "n_hits": pa.array(n_hit, type=pa.int64()),
            "ratio": pa.array(ratio, type=pa.float64()),
            "contaminated": pa.array(ratio >= threshold),
        })

    return fn


def contamination_filter(flag):
    """map_batches fn dropping the rows a `contamination_flags` fn marks
    contaminated — the ONE filter body shared by `decontaminate` and the
    curate CLI (so semantics can never diverge between them)."""

    def keep_clean(t: pa.Table) -> pa.Table:
        mask = np.asarray(flag(t)["contaminated"])
        return t.filter(pa.array(~mask))

    return keep_clean


def decontaminate(corpus_ds, bench_ds, column: str, id_col: str, *,
                  k: int = 8, threshold: float = 0.5,
                  exact_limit: int = BENCH_EXACT_LIMIT):
    """Corpus Dataset with rows sharing >= `threshold` of their distinct
    k-shingles with `bench_ds` REMOVED. One broadcast + one streaming
    pass; with a bloom-carried benchmark set the removal is a strict
    superset (bloom false hits only ever ADD flags)."""
    sh_ref, exact = benchmark_shingle_ref(bench_ds, column, k=k,
                                          exact_limit=exact_limit)
    flag = contamination_flags(column, id_col, sh_ref, exact,
                               k=k, threshold=threshold)
    return corpus_ds.map_batches(contamination_filter(flag),
                                 batch_format="pyarrow")


# ---------------------------------------------------------------------------
# URL blocklist filtering (UT1-style domain suffix blocking)
# ---------------------------------------------------------------------------

def blocked_domains_ref(domains):
    """Plasma ObjectRef of the sorted u64 hashes of a domain blocklist.
    Broadcast once; real blocklists (UT1 etc.) are millions of rows —
    8 B/domain, so even 10^7 entries ship as one 80 MB plasma object
    read zero-copy per task."""
    import ray

    arr = pa.array(sorted(set(map(str, domains))), type=pa.string())
    return ray.put(np.sort(hash_arrow_array(arr)))


def blocked_url_mask(url_col, blocked_ref) -> np.ndarray:
    """Vectorized per-batch blocklist test: True where the url's host
    equals a blocked domain or is a subdomain of one (dot-suffix match,
    the UT1/RefinedWeb semantics). The host is peeled one label at a
    time — each iteration hashes the remaining suffix and probes the
    broadcast sorted hash set, so the work is O(max label depth) fully
    vectorized passes, never a Python loop over rows or blocklist
    entries. SQL parity: host = d OR host LIKE '%.' || d."""
    import pyarrow.compute as pc
    import ray

    blocked = ray.get(blocked_ref)  # zero-copy plasma read
    cur = domain_of(_str(url_col))
    n = len(cur)
    mask = np.zeros(n, dtype=bool)
    if n == 0 or not len(blocked):
        return mask
    live = np.asarray(pc.not_equal(cur, ""), dtype=bool)
    # hostnames have bounded label depth; the loop runs that many times
    while live.any():
        h = hash_arrow_array(cur)
        idx = np.searchsorted(blocked, h)
        hit = (idx < len(blocked)) & (
            blocked[np.minimum(idx, len(blocked) - 1)] == h)
        mask |= hit & live
        # strip the leftmost label: suffix after the first '.'
        dot = np.asarray(pc.find_substring(cur, "."), dtype=np.int64)
        live &= dot >= 0
        if not live.any():
            break
        cur = pc.replace_substring_regex(cur, r"^[^.]*\.", "",
                                         max_replacements=1)
    return mask


def blocklist_filter(ds, url_of_batch, blocked_ref):
    """Corpus Dataset with blocklisted-host rows removed. `url_of_batch`
    maps a pyarrow batch to its url column (a column name string or a
    callable for synthesized urls)."""

    def keep(t: pa.Table) -> pa.Table:
        urls = t[url_of_batch] if isinstance(url_of_batch, str) \
            else url_of_batch(t)
        return t.filter(pa.array(~blocked_url_mask(urls, blocked_ref)))

    return ds.map_batches(keep, batch_format="pyarrow")
