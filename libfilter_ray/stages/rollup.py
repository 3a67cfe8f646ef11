"""One-pass ROLLUP: every prefix-grouping level from a single shuffle.

SQL `GROUP BY ROLLUP(k1, .., kd)` re-scans the input once per grouping
set in a naive plan; for decomposable aggregates (sum/count) each
coarser level is exactly a re-aggregation of the NEXT-FINER level's
result, which is combo-sized, not corpus-sized. So the engine shuffles
the raw rows once (the finest groupby, with Ray's per-block map-side
combine) and derives every coarser level by re-grouping the previous
level's materialized result Dataset — at 100 TB the raw input moves
through the all-to-all exactly once and the rollup tail touches only
KB-scale combo tables.

Each intermediate level is `.materialize()`d because it is consumed
twice (decorated for output AND re-grouped for the next level) — the
lazy-lineage double-replay trap in CLAUDE.md; the materialized frames
are O(distinct key-prefix combos), the operator's documented bound.

The reference engine has no grouped aggregation at all (its callers
aggregate); this is an engine addition for the reporting family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: output sentinel for keys aggregated away at coarser levels. Output
#: key columns are cast to string so the sentinel is representable;
#: callers whose data legitimately contains the sentinel value must
#: pass a different one.
SENTINEL = "ALL"

#: finest-level combo count at or below which the rollup tail runs on
#: the driver (one pandas pass over the already-materialized finest
#: result) instead of d more Ray jobs — the engine's standard
#: driver-vs-distributed gate; at sf0.1 this turns ~5 s of fixed
#: per-stage overhead into ~0. Above the bound every level stays a
#: Dataset re-aggregation.
DRIVER_COMBO_LIMIT = 1 << 16


def rollup_aggregate(ds, keys: list[str], value: str, *,
                     sentinel: str = SENTINEL,
                     driver_combo_limit: int = DRIVER_COMBO_LIMIT):
    """All d+1 ROLLUP levels of (sum(value), count(*)) over `keys`, as
    one Dataset with columns (lvl, *keys, sum_<value>, n): lvl = number
    of live keys (d = finest .. 0 = grand total), aggregated-away keys
    = `sentinel`. sum is float64 (uniform across levels), n counts rows
    (SQL count(*); sum skips nulls like SQL SUM). Key columns must not
    contain nulls (group keys, house rule across the engine). Coarser
    levels re-sum the finest level's float64 sums rather than re-reading
    raw rows, so for non-integer-valued columns coarse sums can differ
    from SQL's per-level raw-row sums in the last ULPs; integer-valued
    columns (quantities, counts) are exact at every level."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    sum_name = f"sum_{value}"

    def decorate(lvl: int, present: list[str]):
        live = set(present)

        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = t.num_rows
            cols = {"lvl": pa.array(np.full(n, lvl, dtype=np.int64))}
            for k in keys:
                cols[k] = pc.cast(t[k], pa.string()) if k in live \
                    else pa.array([sentinel] * n, type=pa.string())
            cols[sum_name] = pc.cast(t[sum_name], pa.float64())
            cols["n"] = pc.cast(t["n"], pa.int64())
            return pa.table(cols)

        return fn

    cur = ds.groupby(keys).aggregate(
        Sum(value, alias_name=sum_name),
        Count(alias_name="n")).materialize()
    if cur.count() <= driver_combo_limit:
        return _driver_tail(cur.to_pandas(), keys, sum_name,
                            sentinel=sentinel)
    out = cur.map_batches(decorate(len(keys), keys),
                          batch_format="pyarrow")
    for d in range(len(keys) - 1, 0, -1):
        cur = cur.groupby(keys[:d]).aggregate(
            Sum(sum_name, alias_name=sum_name),
            Sum("n", alias_name="n")).materialize()
        out = out.union(cur.map_batches(decorate(d, keys[:d]),
                                        batch_format="pyarrow"))
    g = cur.aggregate(Sum(sum_name, alias_name=sum_name),
                      Sum("n", alias_name="n"))  # 1 row on the driver
    total = pa.table({
        "lvl": pa.array([0], type=pa.int64()),
        **{k: pa.array([sentinel], type=pa.string()) for k in keys},
        sum_name: pa.array([float(g[sum_name])], type=pa.float64()),
        "n": pa.array([int(g["n"])], type=pa.int64()),
    })
    return out.union(ray.data.from_arrow(total))


def _driver_tail(finest, keys, sum_name, *, sentinel):
    """Small-combos path: the whole rollup tail from the collected
    finest frame in one pandas pass (identical level semantics)."""
    import pandas as pd
    import ray.data

    frames = []
    cur = finest.copy()
    cur[sum_name] = cur[sum_name].astype(np.float64)
    cur["n"] = cur["n"].astype(np.int64)
    for k in keys:
        cur[k] = cur[k].astype(str)
    for d in range(len(keys), 0, -1):
        lv = cur if d == len(keys) else \
            cur.groupby(keys[:d], as_index=False) \
               .agg({sum_name: "sum", "n": "sum"})
        cur = lv
        lv = lv.copy()
        for k in keys[d:]:
            lv[k] = sentinel
        lv["lvl"] = np.int64(d)
        frames.append(lv[["lvl", *keys, sum_name, "n"]])
    frames.append(pd.DataFrame([{
        "lvl": np.int64(0), **{k: sentinel for k in keys},
        sum_name: float(cur[sum_name].sum()),
        "n": np.int64(cur["n"].sum())}]))
    out = pd.concat(frames, ignore_index=True)
    out["lvl"] = out["lvl"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return ray.data.from_pandas(out)


def pivot_counts(ds, row_key: str, cat_col: str, categories):
    """Wide count matrix (pivot/crosstab — absent from Ray Data): one
    int64 column per DECLARED category, one row per `row_key` value.
    Per-batch partials bincount (row, category) pairs into the fixed
    wide layout (vectorized dictionary-encode, one 2-D bincount per
    batch), then ONE groupby-Sum over the wide columns — the shuffle
    moves combo-sized wide partials, the same volume as a plain grouped
    count. The category list is part of the schema contract: a value
    outside it raises (silent other-bucketing would corrupt the
    matrix); pass an explicit "other" category to absorb strays."""
    from ray.data.aggregate import Sum

    cats = [str(c) for c in categories]
    if len(set(cats)) != len(cats):
        raise ValueError("pivot: duplicate categories")
    cat_index = {c: i for i, c in enumerate(cats)}

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rk = t[row_key].combine_chunks() \
            if isinstance(t[row_key], pa.ChunkedArray) else t[row_key]
        cc = t[cat_col].combine_chunks() \
            if isinstance(t[cat_col], pa.ChunkedArray) else t[cat_col]
        if rk.null_count or cc.null_count:
            raise ValueError(
                "pivot: null in row_key/cat_col (group keys must be "
                "non-null, house rule; map nulls to an explicit "
                "category upstream)")
        rd = pc.dictionary_encode(rk)
        rcodes = np.asarray(rd.indices)
        uniq_rows = rd.dictionary
        cd = pc.dictionary_encode(cc)
        ccodes_local = np.asarray(cd.indices)
        lut = np.empty(len(cd.dictionary), dtype=np.int64)
        for j, v in enumerate(cd.dictionary.to_pylist()):  # O(uniq cats)
            if v not in cat_index:
                raise ValueError(
                    f"pivot: category {v!r} not in the declared list")
            lut[j] = cat_index[v]
        nr, nc = len(uniq_rows), len(cats)
        mat = np.bincount(rcodes * nc + lut[ccodes_local],
                          minlength=nr * nc).reshape(nr, nc)
        cols = {row_key: uniq_rows}
        for i, c in enumerate(cats):
            cols[c] = pa.array(mat[:, i].astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(row_key) \
        .aggregate(*[Sum(c, alias_name=c) for c in cats])
