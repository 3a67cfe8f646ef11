"""stages/rollup.py — one-shuffle GROUP BY ROLLUP."""

from __future__ import annotations

import numpy as np
import pandas as pd

from libfilter_ray.stages.rollup import rollup_aggregate


def _ref_rollup(df: pd.DataFrame, keys, value):
    frames = []
    for d in range(len(keys), 0, -1):
        g = df.groupby(keys[:d], as_index=False).agg(
            s=(value, "sum"), n=(value, "size"))
        for k in keys[d:]:
            g[k] = "ALL"
        g["lvl"] = d
        frames.append(g)
    frames.append(pd.DataFrame([{**{k: "ALL" for k in keys},
                                 "s": df[value].sum(),
                                 "n": len(df), "lvl": 0}]))
    out = pd.concat(frames, ignore_index=True)
    out = out.rename(columns={"s": f"sum_{value}"})
    out["n"] = out["n"].astype("int64")
    out["lvl"] = out["lvl"].astype("int64")
    return out[["lvl", *keys, f"sum_{value}", "n"]] \
        .sort_values(["lvl", *keys]).reset_index(drop=True)


def test_rollup_three_keys_random(ray_session, rng):
    import ray.data

    n = 5000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "c": rng.choice(["1", "2", "3", "4"], n),
        "v": rng.integers(0, 100, n).astype(np.float64),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    ref = _ref_rollup(df, ["a", "b", "c"], "v")
    # driver-tail path (default gate) AND forced distributed path:
    # identical results (v is integer-valued, double sums exact at any
    # accumulation order)
    for limit in (None, 0):
        kw = {} if limit is None else {"driver_combo_limit": limit}
        got = rollup_aggregate(ds, ["a", "b", "c"], "v", **kw) \
            .to_pandas().sort_values(["lvl", "a", "b", "c"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_like=True)
        assert (got["lvl"] == 0).sum() == 1
        assert got.loc[got["lvl"] == 0, "n"].iloc[0] == n


def test_rollup_null_values_skipped_in_sum(ray_session):
    import ray.data

    df = pd.DataFrame({"a": ["x", "x", "y"],
                       "v": [1.0, None, 3.0]})
    ds = ray.data.from_pandas(df)
    got = rollup_aggregate(ds, ["a"], "v").to_pandas() \
        .sort_values(["lvl", "a"]).reset_index(drop=True)
    # count(*) counts the null-v row; sum skips it (SQL semantics)
    assert got.loc[(got["lvl"] == 1) & (got["a"] == "x"),
                   "n"].iloc[0] == 2
    assert got.loc[(got["lvl"] == 1) & (got["a"] == "x"),
                   "sum_v"].iloc[0] == 1.0
    assert got.loc[got["lvl"] == 0, "sum_v"].iloc[0] == 4.0
    assert got.loc[got["lvl"] == 0, "n"].iloc[0] == 3


def test_pivot_counts_matches_crosstab(ray_session, rng):
    import ray.data

    from libfilter_ray.stages.rollup import pivot_counts

    n = 4000
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], n),
        "c": rng.choice(["a", "b", "c", "d"], n)})
    ds = ray.data.from_pandas(df).repartition(8)
    got = pivot_counts(ds, "k", "c", ["a", "b", "c", "d"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for c in "abcd":
        got[c] = got[c].astype("int64")
    ref = pd.crosstab(df["k"], df["c"]).reset_index() \
        .rename_axis(None, axis=1)
    ref.columns = ["k", "a", "b", "c", "d"]
    for c in "abcd":
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(
        got[["k", "a", "b", "c", "d"]], ref)


def test_pivot_counts_rejects_undeclared_category(ray_session):
    import pytest
    import ray.data

    from libfilter_ray.stages.rollup import pivot_counts

    ds = ray.data.from_items([{"k": "x", "c": "weird"}])
    with pytest.raises(Exception, match="not in the declared"):
        pivot_counts(ds, "k", "c", ["a"]).materialize()


def test_pivot_counts_rejects_null_keys(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from libfilter_ray.stages.rollup import pivot_counts

    t = pa.table({"k": pa.array(["x", None]),
                  "c": pa.array(["a", "a"])})
    with pytest.raises(Exception, match="null in row_key/cat_col"):
        pivot_counts(ray.data.from_arrow(t), "k", "c", ["a"]) \
            .materialize()
    t2 = pa.table({"k": pa.array(["x", "y"]),
                   "c": pa.array(["a", None])})
    with pytest.raises(Exception, match="null in row_key/cat_col"):
        pivot_counts(ray.data.from_arrow(t2), "k", "c", ["a"]) \
            .materialize()
