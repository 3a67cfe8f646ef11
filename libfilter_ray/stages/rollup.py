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
    contain nulls (group keys, house rule across the engine)."""
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
