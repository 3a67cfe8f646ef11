"""stages/running.py — grouped running sum / lag / row_number."""

from __future__ import annotations

import numpy as np
import pandas as pd

from libfilter_ray.stages.running import grouped_running


def test_grouped_running_matches_pandas(ray_session, rng):
    import ray.data

    n = 3000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 50, n).astype(np.int64),
        "ord": rng.integers(0, 100, n).astype(np.int64),  # heavy ties
        "v": np.where(rng.random(n) < 0.04, np.nan,
                      np.round(rng.random(n) * 100, 2)),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    got = grouped_running(ds, "k", ["ord", "id"], "v",
                          id_cols=["id"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)

    d = df[df["v"].notna()].sort_values(["k", "ord", "id"],
                                        kind="stable")
    g = d.groupby("k", sort=False)
    ref = d[["id", "k"]].copy()
    ref["rn"] = g.cumcount().to_numpy(dtype=np.int64) + 1
    ref["run_sum"] = g["v"].cumsum().to_numpy(dtype=np.float64)
    ref["prev_value"] = g["v"].shift(1).fillna(0.0) \
        .to_numpy(dtype=np.float64)
    ref = ref.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
    assert got["rn"].max() > 1  # groups actually have runs


def test_grouped_running_single_and_empty_groups(ray_session):
    import ray.data

    df = pd.DataFrame({"id": [0, 1, 2], "k": [1, 2, 2],
                       "v": [3.0, None, 5.0], "ord": [0, 1, 2]})
    got = grouped_running(ray.data.from_pandas(df), "k", ["ord", "id"],
                          "v", id_cols=["id"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    # the null-v row is excluded entirely; both survivors start groups
    assert got["id"].tolist() == [0, 2]
    assert got["rn"].tolist() == [1, 1]
    assert got["run_sum"].tolist() == [3.0, 5.0]
    assert got["prev_value"].tolist() == [0.0, 0.0]
