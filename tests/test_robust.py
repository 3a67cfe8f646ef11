"""MAD outlier stats: distributed composition of the exact order-stats
engine == a local pandas/numpy reference, including nulls, ties,
constant and single-row groups."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from libfilter_ray.stages.robust import mad_outlier_stats


def _local(df: pd.DataFrame, scale: float) -> pd.DataFrame:
    rows = []
    for kv, g in df.dropna(subset=["value"]).groupby("key", sort=True):
        x = np.sort(g["value"].to_numpy(dtype=np.float64))
        med = x[int(np.floor(0.5 * (len(x) - 1)))]
        dev = np.sort(np.abs(g["value"].to_numpy(dtype=np.float64) - med))
        mad = dev[int(np.floor(0.5 * (len(dev) - 1)))]
        rows.append({"key": kv, "med": med, "mad": mad, "n": len(x),
                     "n_outliers": int((np.abs(
                         g["value"].to_numpy(dtype=np.float64) - med)
                         > scale * mad).sum())})
    out = pd.DataFrame(rows)
    out[["n", "n_outliers"]] = out[["n", "n_outliers"]].astype("int64")
    return out


def _run(df: pd.DataFrame, scale: float = 3.0, nblocks: int = 8):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(df["key"].tolist(), type=pa.string()),
        # from_pandas=True maps NaN -> Arrow null (real tables carry
        # proper nulls; the engine excludes nulls, not NaN values)
        "value": pa.array(df["value"], type=pa.float64(),
                          from_pandas=True),
    })).repartition(nblocks)
    return mad_outlier_stats(ds, "key", "value", scale=scale,
                             rounds=2, buckets=32)


def test_mad_outliers_random_with_nulls(ray_session, rng):
    n = 20_000
    df = pd.DataFrame({
        "key": np.array(["a", "b", "c"], dtype=object)[
            rng.integers(0, 3, n)],
        "value": np.round(rng.normal(50, 20, n), 2),
    })
    # plant heavy outliers + nulls + exact ties
    df.loc[df.index[:200], "value"] = 10_000.0
    df.loc[df.index[200:400], "value"] = None
    df.loc[df.index[400:900], "value"] = 42.42
    got = _run(df)
    want = _local(df, 3.0)
    assert got.equals(want)


def test_mad_outliers_never_collects_rows(ray_session, rng, monkeypatch):
    """Scale guard (the house to_pandas spy): every driver collect in
    the med -> mad -> count chain stays at O(#groups) + the order-stats
    probe/bucket state — never O(rows)."""
    import ray.data

    n = 30_000
    df = pd.DataFrame({
        "key": np.array(["a", "b", "c", "d"], dtype=object)[
            rng.integers(0, 4, n)],
        "value": rng.normal(0, 1, n),
    })
    collected = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        collected.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    got = _run(df, nblocks=10)
    want = _local(df, 3.0)
    assert got.equals(want)
    assert collected, "spy never fired"
    # 4 groups x (medians + counts) plus order-stats bucket histograms
    # (probes x buckets = 4 x 32 rows per refinement round)
    assert max(collected) <= 4 * 32 * 2, max(collected)


def test_mad_outliers_edge_groups(ray_session):
    df = pd.DataFrame({
        "key": ["const"] * 50 + ["single"] + ["two"] * 2,
        "value": [7.5] * 50 + [3.25] + [1.0, 9.0],
    })
    got = _run(df, nblocks=3)
    want = _local(df, 3.0)
    assert got.equals(want)
    # constant group: mad == 0, strict > keeps outliers at 0
    c = got.set_index("key")
    assert c.loc["const", "mad"] == 0.0 and c.loc["const",
                                                  "n_outliers"] == 0
    # single row: med == the value, mad == 0
    assert c.loc["single", "med"] == 3.25 and c.loc["single", "mad"] == 0.0
    # two rows: lower median convention picks the smaller element
    assert c.loc["two", "med"] == 1.0 and c.loc["two", "mad"] == 0.0
    assert c.loc["two", "n_outliers"] == 1  # |9-1| = 8 > 3*0
