"""stages/rank.py — exact distributed percent_rank."""

from __future__ import annotations

import numpy as np
import pandas as pd

from libfilter_ray.stages.rank import percent_rank


def _ref_pr(df: pd.DataFrame) -> pd.DataFrame:
    d = df[df["v"].notna()].copy()
    rank = d.groupby("k")["v"].rank(method="min")
    n = d.groupby("k")["v"].transform("size")
    d["pr"] = np.where(n > 1, (rank - 1) / (n - 1).clip(lower=1), 0.0)
    return d[["id", "k", "pr"]].sort_values("id").reset_index(drop=True)


def _make(rng, n=4000):
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.choice(["a", "b", "c", "d"], n),
        # heavy ties: quantized values, plus nulls
        "v": np.where(rng.random(n) < 0.05, np.nan,
                      np.round(rng.random(n) * 20) / 4.0),
    })


def test_percent_rank_broadcast_path(ray_session, rng):
    import ray.data

    df = _make(rng)
    ds = ray.data.from_pandas(df).repartition(8)
    got = percent_rank(ds, "k", "v", id_cols=["id"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _ref_pr(df))


def test_percent_rank_join_path_identical(ray_session, rng):
    """Forced composite-hash join path (broadcast_limit=0) returns the
    same frame bit-for-bit as the broadcast path."""
    import ray.data

    df = _make(rng, n=2000)
    ds = ray.data.from_pandas(df).repartition(4)
    a = percent_rank(ds, "k", "v", id_cols=["id"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    b = percent_rank(ds, "k", "v", id_cols=["id"],
                     broadcast_limit=0).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, _ref_pr(df))


def test_percent_rank_single_row_groups(ray_session):
    import ray.data

    df = pd.DataFrame({"id": [0, 1, 2], "k": ["x", "y", "y"],
                       "v": [5.0, 1.0, 2.0]})
    got = percent_rank(ray.data.from_pandas(df), "k", "v",
                       id_cols=["id"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert got["pr"].tolist() == [0.0, 0.0, 1.0]


def test_percent_rank_join_path_keeps_huge_int64_ids(ray_session):
    """Ids above 2^53 survive the forced join path exactly (the
    sentinel-column design exists precisely so no null-bearing int64
    ever degrades to float64 in a pandas block)."""
    import ray.data

    base = np.int64(1) << np.int64(62)
    df = pd.DataFrame({"id": base + np.arange(6, dtype=np.int64),
                       "k": ["a"] * 3 + ["b"] * 3,
                       "v": [1.0, 2.0, 2.0, 5.0, 4.0, 3.0]})
    got = percent_rank(ray.data.from_pandas(df), "k", "v",
                       id_cols=["id"], broadcast_limit=0).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert got["id"].dtype == np.int64
    assert got["id"].tolist() == df["id"].tolist()
    assert got["pr"].tolist() == [0.0, 0.5, 0.5, 1.0, 0.5, 0.0]
