"""Deterministic distributed sampling for training-data pipelines.

Hash-rank sampling: each row's rank is a pure function of its id
(hash_arrow_array), so the sample is uniform, reproducible, and identical under
ANY partitioning — a Bernoulli/top-k sampler with none of the coordination
a true reservoir needs. The stratified variant keeps the `n` smallest
ranks per key.

Scale shape: a per-block combiner keeps at most `n` rows per key per
block before the shuffle (same pre-aggregation idea as the grouped sketch
partials), then key-hash shards finish the top-n per key — one Ray task
per shard, vectorized pandas inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketch.hashing import hash_arrow_array, shard_of_values


def stratified_sample(ds, key: str, id_column: str, n_per_key: int, *,
                      seed: int = 0x5A3D1E, num_shards: int = 32):
    """Dataset of at most `n_per_key` rows per `key` value: the rows whose
    hash-rank hash_arrow_array(id, seed) is smallest within the key (ties on
    rank broken by id — fully deterministic)."""

    def _rank(df: pd.DataFrame) -> np.ndarray:
        ids = pa.array(df[id_column])
        if pa.types.is_null(ids.type):  # empty/all-null object column
            return np.zeros(len(df), dtype=np.int64)
        return hash_arrow_array(ids, seed=seed).view(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # hash-rank via the generic column hasher: any id type (int,
        # string, ...) works and the rank is a pure function of the value
        d = df.assign(__rank=_rank(df)).sort_values(
            ["__rank", id_column], kind="stable")
        # dropna=False: a null stratum is still a stratum (SQL GROUP BY
        # semantics) — the default silently dropped every null-key row
        d = d[d.groupby(key, sort=False, dropna=False).cumcount()
              < n_per_key]
        return d.assign(__shard=shard_of_values(d[key], num_shards))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["__rank", id_column], kind="stable")
        d = d[d.groupby(key, sort=False, dropna=False).cumcount()
              < n_per_key]
        return d.drop(columns=["__rank", "__shard"])

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__shard").map_groups(finish, batch_format="pandas")
