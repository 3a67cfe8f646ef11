"""Exact per-group percent_rank without materializing a group of rows.

SQL `percent_rank() OVER (PARTITION BY key ORDER BY value)` =
(rank − 1) / (n − 1) where rank is the MIN rank under ties — i.e.
count_lt / (n − 1) with count_lt = rows in the group with a strictly
smaller value. count_lt and n are exact integers and the final division
is one IEEE-754 op, so the result matches any SQL engine bit-for-bit.

Distributed shape — the group never materializes, only its HISTOGRAM:

  hist+cum  ONE shuffle: per-batch combined (key, value, cnt) partials
          (pandas groupby per batch — the all-to-all moves each
          batch's distinct pairs, not rows) shuffle by KEY ONLY, and
          the per-key task merges partial histograms, sorts by value
          and cumsums in the same map_groups — task state is
          O(distinct values within the key), the operator's documented
          bound (quantize or use stages/order_stats.py when values are
          truly continuous). Folding the (key,value) groupby into the
          key-grouped task saves a second all-to-all over the
          distinct-pair table.
  attach  count_lt/n join back to the streaming rows:
            * cum fits the broadcast bound -> ray.put per-key sorted
              value arrays, searchsorted per batch (vectorized, the
              dictionary-LUT house pattern)
            * else -> co-partitioned hash join (stages/joins.py) on a
              derived composite (key, value-bits) hash, carrying the
              real key+value for a post-join equality confirm — a
              64-bit collision adds a candidate row that the confirm
              drops, never a wrong rank
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketch.hashing import hash_arrow_array, splitmix64

#: distinct (key, value) pairs at or below which the rank table
#: broadcasts (sorted arrays via ray.put) instead of hash-joining.
RANK_BROADCAST_LIMIT = 1 << 22


def _kv_hash(key_arr: pa.Array | pa.ChunkedArray,
             val_np: np.ndarray) -> np.ndarray:
    """Composite u64 of (key, float64-bits(value)) — identical on the
    row side and the histogram side because both derive from the same
    column bytes."""
    kh = hash_arrow_array(key_arr)
    return splitmix64(kh ^ val_np.astype(np.float64).view(np.uint64))


def percent_rank(ds, key: str, value: str, *, id_cols: list[str],
                 broadcast_limit: int = RANK_BROADCAST_LIMIT):
    """Dataset of (*id_cols, key, pr) — the exact SQL percent_rank of
    `value` within each `key` group. Rows with null `value` are
    excluded (SQL window ordering semantics differ engine-to-engine on
    nulls; the engine contract is nulls-out). Single-row groups get
    0.0 (SQL convention)."""
    import ray

    def drop_null(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_valid(t[value]))

    rows = ds.map_batches(drop_null, batch_format="pyarrow")

    def batch_hist(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([key, value], sort=False, observed=True) \
            .size().reset_index(name="cnt")

    def local_cum(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].iloc[0]
        h = df.groupby(value, as_index=False)["cnt"].sum() \
            .sort_values(value, kind="stable")
        c = h["cnt"].to_numpy(dtype=np.int64)
        h["count_lt"] = np.concatenate([[0], np.cumsum(c)[:-1]])
        h["n_key"] = c.sum()
        h[key] = k
        return h

    cum = rows.select_columns([key, value]) \
        .map_batches(batch_hist, batch_format="pandas") \
        .groupby(key).map_groups(
            local_cum, batch_format="pandas").materialize()

    if cum.count() <= broadcast_limit:
        pdf = cum.to_pandas()
        by_key = {
            k: (g[value].to_numpy(dtype=np.float64),
                g["count_lt"].to_numpy(dtype=np.int64),
                int(g["n_key"].iloc[0]))
            for k, g in pdf.groupby(key, sort=False)
        }
        ref = ray.put(by_key)

        def attach(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from .broadcast import cached_broadcast

            lut = cached_broadcast(ref, lambda m: m)
            keycol = t.column(key).combine_chunks()
            x = t.column(value).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            dict_arr = pc.dictionary_encode(keycol)
            codes = np.asarray(dict_arr.indices)
            pr = np.zeros(len(x), dtype=np.float64)
            for code, kv in enumerate(dict_arr.dictionary.to_pylist()):
                vals, clt, n = lut[kv]  # O(uniq keys) Python per batch
                m = codes == code
                if n > 1:
                    idx = np.searchsorted(vals, x[m], side="left")
                    pr[m] = clt[idx] / np.float64(n - 1)
            out = {c: t[c] for c in id_cols}
            out[key] = keycol
            out["pr"] = pa.array(pr, type=pa.float64())
            return pa.table(out)

        return rows.map_batches(attach, batch_format="pyarrow")

    # scale path: co-partition BOTH sides by the composite (key, value)
    # hash and attach within each shard. Deliberately NOT the generic
    # hash_equi_join: its union trick null-fills the other side's
    # columns, and a null-bearing int64 column degrades to float64 on
    # any pandas block conversion — lossy above 2^53 ids. Here every
    # placeholder is a concrete sentinel (0), so id/int columns keep
    # their types end-to-end at any id magnitude.
    num_shards = 64

    def tag_rows(t: pa.Table) -> pa.Table:
        x = t.column(value).to_numpy(zero_copy_only=False)
        kvh = _kv_hash(t[key], x)
        n = t.num_rows
        cols = {"shard": pa.array((kvh % np.uint64(num_shards))
                                  .astype(np.int64)),
                "kvh": pa.array(kvh.view(np.int64)),
                "side": pa.array(np.zeros(n, dtype=np.int8))}
        for c in (*id_cols, key, value):
            cols[c] = t[c]
        cols["count_lt"] = pa.array(np.zeros(n, dtype=np.int64))
        cols["n_key"] = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table(cols)

    sch = ds.schema()  # arrow- or pandas-block schema, metadata-only

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        t = np.dtype(t)
        return pa.string() if t == object else pa.from_numpy_dtype(t)

    id_types = {n: _pa_type(tp) for n, tp in zip(sch.names, sch.types)
                if n in id_cols}

    def tag_cum(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        x = t.column(value).to_numpy(zero_copy_only=False)
        kvh = _kv_hash(t[key], x)
        n = t.num_rows
        cols = {"shard": pa.array((kvh % np.uint64(num_shards))
                                  .astype(np.int64)),
                "kvh": pa.array(kvh.view(np.int64)),
                "side": pa.array(np.ones(n, dtype=np.int8))}
        for c in id_cols:  # concrete sentinel, never read back
            tp = id_types[c]
            if pa.types.is_integer(tp) or pa.types.is_floating(tp):
                sentinel = 0
            elif pa.types.is_string(tp) or pa.types.is_large_string(tp):
                sentinel = ""
            else:
                raise TypeError(
                    f"percent_rank join path: unsupported id column "
                    f"type {tp} for {c!r} (int/float/string only)")
            cols[c] = pc.cast(pa.array([sentinel] * n), tp)
        for c in (key, value):
            cols[c] = t[c]
        cols["count_lt"] = pa.array(
            t["count_lt"].to_numpy(zero_copy_only=False)
            .astype(np.int64))
        cols["n_key"] = pa.array(
            t["n_key"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(cols)

    tagged = rows.map_batches(tag_rows, batch_format="pyarrow").union(
        cum.map_batches(tag_cum, batch_format="pyarrow"))

    def attach_shard(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == 0]
        right = df[df["side"] == 1]
        m = left[["kvh", *id_cols, key, value]].merge(
            right[["kvh", key, value, "count_lt", "n_key"]],
            on="kvh", suffixes=("", "_r"))
        # a 2^-64 kvh collision adds a candidate row; the true
        # (key, value) partner always shares the kvh — keep exactly it
        m = m[(m[key] == m[f"{key}_r"]) & (m[value] == m[f"{value}_r"])]
        n = m["n_key"].to_numpy(dtype=np.int64)
        clt = m["count_lt"].to_numpy(dtype=np.int64)
        m["pr"] = np.where(n > 1, clt / np.maximum(n - 1, 1), 0.0)
        return m[[*id_cols, key, "pr"]]

    return tagged.groupby("shard").map_groups(attach_shard,
                                              batch_format="pandas")
