"""Exact distributed order statistics (k-th smallest / quantiles) by
iterative range refinement — the EXACT complement of the engine's mergeable
quantile sketches (sketch/tdigest.py, sketch/kll.py give bounded-error
answers in one pass; this gives the precise order statistic in a few).

Reference analogue: the reference library has no quantiles at all — this is
an engine addition in the same spirit as HLL/CMS/t-digest/KLL (SURVEY §2.6),
built from published selection-by-refinement folklore (distributed k-th
selection via histogram bisection), not from any reference code.

Algorithm (per (group, q) probe):
  1. one distributed groupby pass computes per-group (count, min, max);
     the target is the 0-indexed rank k = floor(q * (n-1)) — the "lower"
     order statistic, well-defined under ties regardless of sort stability.
  2. `rounds` streaming histogram passes: each probe owns an interval
     (edge floats lo/hi + a top-inclusivity flag) containing its answer and
     a residual rank k'. A pass buckets every in-interval value of the
     probe's group via np.searchsorted over np.linspace(lo, hi, B+1) edges,
     the tiny (probes x buckets) count matrix reduces driver-side, and the
     probe narrows to the bucket containing k', subtracting counts below.
     FLOAT-EXACTNESS INVARIANT: bucket b's value set is exactly
     {v : edges[b] <= v < edges[b+1]} (<= hi for the last bucket when the
     parent interval was top-inclusive), and the next round's interval IS
     those edge floats — so membership across rounds is bit-consistent
     with the counts and k' stays an exact rank. No floor-division
     bucketing (whose rounding can disagree with interval comparisons).
  3. a final gather pass collects ONLY in-interval values (shrinks
     ~buckets-fold per round; capped by `final_cap`) and selects k'
     exactly with np.partition.

Scale shape: rounds+2 streaming passes over a (key, column) projection;
driver state is probes x buckets counters; the corpus is never collected.
Heavy duplicate skew terminates early: a zero-width interval IS the
answer. Group cardinality: the per-batch kernel loops over probes
(vectorized over rows within each), sized for few-to-hundreds of
groups x quantiles; very high-cardinality keys should use the sketch path
(KLL) instead — a documented trade, not a hidden cliff.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _col(t: pa.Table, name: str) -> np.ndarray:
    c = t[name]
    c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return np.asarray(c)


def _member(vals: np.ndarray, lo: float, hi: float,
            inclusive: bool) -> np.ndarray:
    m = vals >= lo
    return m & (vals <= hi) if inclusive else m & (vals < hi)


def exact_group_quantiles(ds, key: str, column: str,
                          qs: tuple[float, ...] = (0.5, 0.9, 0.99), *,
                          rounds: int = 2, buckets: int = 256,
                          final_cap: int = 1_000_000) -> pd.DataFrame:
    """Exact per-group quantiles (lower order statistic: value at rank
    floor(q*(n-1)) in ascending order). Returns one row per group with one
    float64 column per q named q50/q90/... — the exact data values, bit-
    identical to what an ORDER BY ... OFFSET k oracle selects. Nulls in
    `column` are excluded (matching SQL aggregate semantics)."""
    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    base = ds.groupby(key).aggregate(
        Count(on=column, ignore_nulls=True, alias_name="n"),
        Min(column, alias_name="lo"),
        Max(column, alias_name="hi")).to_pandas()

    # probe state: one row per (group, q); inclusive = top edge in-interval
    probes = []
    for gi in range(len(base)):
        n = int(base["n"].iloc[gi])
        if n == 0:
            continue
        for q in qs:
            probes.append({
                "group": base[key].iloc[gi], "q": q,
                "k": int(np.floor(q * (n - 1))),
                "lo": float(base["lo"].iloc[gi]),
                "hi": float(base["hi"].iloc[gi]),
                "inclusive": True,
            })

    def live(p) -> bool:  # zero-width interval == answered
        return p["lo"] < p["hi"]

    def scan_fn(spec_ref, emit_values: bool):
        """spec rows: (group, lo, hi, inclusive). Emits per-probe bucket
        counts (pid, b, n) or raw in-interval values (pid, v)."""

        def fn(t: pa.Table) -> pa.Table:
            sp = ray.get(spec_ref)  # zero-copy plasma read per task
            gcol = _col(t, key)
            null = pa.compute.is_null(t[column]).to_numpy(
                zero_copy_only=False)
            vals = np.where(null, np.nan,
                            _col(t, column).astype(np.float64))
            pid_out, a_out = [], []
            for pid, (g, lo, hi, inc) in enumerate(sp):
                m = (gcol == g) & ~null & _member(vals, lo, hi, inc)
                if not m.any():
                    continue
                v = vals[m]
                if emit_values:
                    pid_out.append(np.full(len(v), pid, dtype=np.int64))
                    a_out.append(v)
                else:
                    edges = np.linspace(lo, hi, buckets + 1)
                    idx = np.searchsorted(edges, v, side="right") - 1
                    np.clip(idx, 0, buckets - 1, out=idx)  # v == hi edge
                    cnt = np.bincount(idx, minlength=buckets)
                    nz = np.nonzero(cnt)[0]
                    pid_out.append(np.full(len(nz), pid, dtype=np.int64))
                    a_out.append(np.stack(
                        [nz.astype(np.int64), cnt[nz].astype(np.int64)]))
            if emit_values:
                if not pid_out:
                    return pa.table({
                        "pid": pa.array([], type=pa.int64()),
                        "v": pa.array([], type=pa.float64())})
                return pa.table({"pid": pa.array(np.concatenate(pid_out)),
                                 "v": pa.array(np.concatenate(a_out))})
            if not pid_out:
                return pa.table({"pid": pa.array([], type=pa.int64()),
                                 "b": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64())})
            bs = np.concatenate([a[0] for a in a_out])
            ns = np.concatenate([a[1] for a in a_out])
            return pa.table({"pid": pa.array(np.concatenate(pid_out)),
                             "b": pa.array(bs), "n": pa.array(ns)})

        return fn

    for _ in range(rounds):
        lp = [p for p in probes if live(p)]
        if not lp:
            break
        sref = ray.put([(p["group"], p["lo"], p["hi"], p["inclusive"])
                        for p in lp])
        # reduce the per-block partial histograms INSIDE the Dataset: the
        # driver collect is <= probes x buckets rows (the documented
        # contract) instead of O(blocks x probes x buckets) — at 100 TB
        # (~1e6 blocks) the unreduced partials would swamp the driver
        part = ds.map_batches(scan_fn(sref, emit_values=False),
                              batch_format="pyarrow") \
            .groupby(["pid", "b"]) \
            .aggregate(Sum("n", alias_name="n")).to_pandas()
        counts = np.zeros((len(lp), buckets), dtype=np.int64)
        np.add.at(counts, (part["pid"].to_numpy(), part["b"].to_numpy()),
                  part["n"].to_numpy())
        for pid, p in enumerate(lp):
            cum = np.cumsum(counts[pid])
            b = int(np.searchsorted(cum, p["k"] + 1))
            p["k"] -= int(cum[b - 1]) if b > 0 else 0
            edges = np.linspace(p["lo"], p["hi"], buckets + 1)
            # the new interval IS bucket b's exact value set (see module
            # docstring invariant): same edge floats, inclusivity only
            # survives through the last bucket
            p["lo"], p["hi"] = float(edges[b]), float(edges[b + 1])
            p["inclusive"] = p["inclusive"] and (b == buckets - 1)

    todo = [p for p in probes if live(p)]
    if todo:
        sref = ray.put([(p["group"], p["lo"], p["hi"], p["inclusive"])
                        for p in todo])
        got = ds.map_batches(scan_fn(sref, emit_values=True),
                             batch_format="pyarrow").to_pandas()
        if len(got) > final_cap:
            raise ValueError(
                f"final gather {len(got)} rows exceeds cap {final_cap}; "
                f"raise `rounds` (each round narrows ~{buckets}x)")
        for pid, p in enumerate(todo):
            v = got.loc[got["pid"] == pid, "v"].to_numpy()
            # k' is a valid 0-indexed rank within the interval by invariant
            p["lo"] = p["hi"] = float(np.partition(v, p["k"])[p["k"]])

    rows: dict = {}
    for p in probes:
        rows.setdefault(p["group"], {})[f"q{int(p['q'] * 100)}"] = p["lo"]
    if not rows:  # empty input / all-null column
        return pd.DataFrame(columns=[key] + [f"q{int(q * 100)}"
                                             for q in qs])
    out = pd.DataFrame([{key: g, **v} for g, v in rows.items()])
    return out.sort_values(key).reset_index(drop=True)
