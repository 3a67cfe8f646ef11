"""Robust per-group outlier statistics: median absolute deviation.

Quality filtering over numeric signals (doc length, perplexity, score
columns) needs a robust center/spread — mean/stddev are dragged by the
very outliers being hunted (Leys et al., "Detecting outliers: do not use
standard deviation around the mean, use absolute deviation around the
median", J. Exp. Soc. Psych. 2013; Hampel 1974). The classic rule:
flag x with |x - median| > scale * MAD.

Everything here is EXACT and never materializes a group, by composing
the histogram-refinement order-statistics engine
(stages/order_stats.py:exact_group_quantiles — the reference leaves
aggregation to its callers; this stage is an engine addition):

  pass set 1  exact lower median per group (rank floor(0.5*(n-1)))
  pass set 2  exact lower median of |x - med| per group — the deviation
              column is DERIVED per batch from the broadcast medians and
              recomputed on each streaming pass (a cheap vectorized map;
              at 100 TB recomputing beats materializing a second corpus)
  pass 3     one partial-aggregated counting pass for n and the number
             of |x - med| > scale * MAD rows

Medians are lower order statistics (the exact stored double, never an
average of two), so every comparison the SQL oracle makes — abs, the
scale*MAD product, the strict > — is the same IEEE-754 double operation
in both engines: the result matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .order_stats import exact_group_quantiles


def mad_outlier_stats(ds, key: str, column: str, *, scale: float = 3.0,
                      rounds: int = 2, buckets: int = 64) -> pd.DataFrame:
    """Exact per-group (median, MAD, n, n_outliers) where n_outliers
    counts rows with |x - median| > scale * MAD. Nulls in `column` are
    excluded throughout (SQL aggregate semantics). Driver state:
    O(#groups) medians/counters plus the order-stats probe tables."""
    import ray
    from ray.data.aggregate import Sum

    med = exact_group_quantiles(ds, key, column, qs=(0.5,),
                                rounds=rounds, buckets=buckets) \
        .rename(columns={"q50": "med"})
    med_by_key = dict(zip(med[key], med["med"]))
    med_ref = ray.put(med_by_key)

    def deviations(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        meds = ray.get(med_ref)
        col = t.column(column).combine_chunks()
        keycol = t.column(key).combine_chunks()
        mask = pc.is_valid(col)
        col, keycol = col.filter(mask), keycol.filter(mask)
        dict_arr = pc.dictionary_encode(keycol)
        codes = np.asarray(dict_arr.indices)
        lut = np.array([meds.get(kv, np.nan)
                        for kv in dict_arr.dictionary.to_pylist()],
                       dtype=np.float64)  # O(uniq) Python, not O(rows)
        x = col.to_numpy(zero_copy_only=False).astype(np.float64)
        dev = np.abs(x - lut[codes]) if len(x) else x
        return pa.table({key: keycol,
                         "dev": pa.array(dev, type=pa.float64())})

    dev_ds = ds.map_batches(deviations, batch_format="pyarrow")
    mad = exact_group_quantiles(dev_ds, key, "dev", qs=(0.5,),
                                rounds=rounds, buckets=buckets) \
        .rename(columns={"q50": "mad"})
    mad_by_key = dict(zip(mad[key], mad["mad"]))
    thr_ref = ray.put({kv: (med_by_key[kv], scale * mad_by_key[kv])
                       for kv in mad_by_key})

    def count_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        thr = ray.get(thr_ref)
        col = t.column(column).combine_chunks()
        keycol = t.column(key).combine_chunks()
        mask = pc.is_valid(col)
        col, keycol = col.filter(mask), keycol.filter(mask)
        dict_arr = pc.dictionary_encode(keycol)
        codes = np.asarray(dict_arr.indices)
        uniq = dict_arr.dictionary
        nan2 = (np.nan, np.nan)
        center_lut = np.array([thr.get(kv, nan2)[0]
                               for kv in uniq.to_pylist()],
                              dtype=np.float64)
        cut_lut = np.array([thr.get(kv, nan2)[1]
                            for kv in uniq.to_pylist()], dtype=np.float64)
        x = col.to_numpy(zero_copy_only=False).astype(np.float64)
        if len(x):
            out_flags = np.abs(x - center_lut[codes]) > cut_lut[codes]
            n_per = np.bincount(codes, minlength=len(uniq))
            out_per = np.bincount(codes, weights=out_flags,
                                  minlength=len(uniq)).astype(np.int64)
        else:
            n_per = out_per = np.zeros(len(uniq), dtype=np.int64)
        known = ~np.isnan(center_lut)
        return pa.table({key: uniq.filter(pa.array(known)),
                         "n": pa.array(n_per[known].astype(np.int64)),
                         "n_outliers": pa.array(out_per[known])})

    counts = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby(key) \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("n_outliers", alias_name="n_outliers")) \
        .to_pandas()  # O(#groups)

    out = med.merge(mad, on=key).merge(counts, on=key)
    out["n"] = out["n"].astype("int64")
    out["n_outliers"] = out["n_outliers"].astype("int64")
    return out.sort_values(key).reset_index(drop=True)[
        [key, "med", "mad", "n", "n_outliers"]]
