"""Exact distributed order statistics (stages/order_stats.py): numpy
reference parity across ties/duplicates/nulls, round counts, partition
invariance, and the degenerate-group edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from libfilter_ray.stages.order_stats import exact_group_quantiles

QS = (0.5, 0.9, 0.99)


def _ref(df: pd.DataFrame, qs=QS) -> pd.DataFrame:
    rows = []
    for g, sub in df.dropna(subset=["v"]).groupby("g", sort=True):
        v = np.sort(sub["v"].to_numpy())
        row = {"g": g}
        for q in qs:
            row[f"q{int(q * 100)}"] = float(v[int(np.floor(q * (len(v) - 1)))])
        rows.append(row)
    return pd.DataFrame(rows)


def _run(df: pd.DataFrame, *, parts: int = 4, **kw) -> pd.DataFrame:
    ds = ray.data.from_pandas(df).repartition(parts)
    return exact_group_quantiles(ds, "g", "v", qs=QS, **kw)


def test_matches_reference_with_ties_and_nulls(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=n),
        # quantized values -> heavy ties; some nulls
        "v": np.round(rng.normal(50, 20, size=n), 1),
    })
    df.loc[rng.choice(n, 200, replace=False), "v"] = np.nan
    got = _run(df, rounds=2, buckets=32)
    pd.testing.assert_frame_equal(got, _ref(df), check_exact=True)


def test_rounds_and_partitioning_invariant(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"g": rng.choice(["x", "y"], size=2000),
                       "v": rng.exponential(10, size=2000)})
    ref = _ref(df)
    for rounds, parts, buckets in [(0, 2, 16), (1, 7, 16), (3, 3, 8),
                                   (2, 1, 64)]:
        got = _run(df, parts=parts, rounds=rounds, buckets=buckets)
        pd.testing.assert_frame_equal(got, ref, check_exact=True,
                                      obj=f"rounds={rounds}")


def test_degenerate_groups(ray_session):
    # single-row group, constant group, two-value group
    df = pd.DataFrame({
        "g": ["solo"] + ["const"] * 50 + ["duo"] * 2,
        "v": [3.25] + [7.5] * 50 + [1.0, 2.0],
    })
    got = _run(df, rounds=2, buckets=8)
    pd.testing.assert_frame_equal(got, _ref(df), check_exact=True)


def test_extreme_skew_one_hot_value(ray_session):
    # 99% of mass on a single value: refinement must terminate via the
    # zero-width interval short-circuit, not loop on an unsplittable bucket
    rng = np.random.default_rng(3)
    v = np.where(rng.random(3000) < 0.99, 42.0, rng.uniform(0, 100, 3000))
    df = pd.DataFrame({"g": ["s"] * 3000, "v": v})
    got = _run(df, rounds=3, buckets=16)
    pd.testing.assert_frame_equal(got, _ref(df), check_exact=True)


def test_final_cap_raises(ray_session):
    df = pd.DataFrame({"g": ["a"] * 1000,
                       "v": np.linspace(0, 1, 1000)})
    with pytest.raises(ValueError, match="final gather"):
        _run(df, rounds=0, final_cap=10)


def test_never_collects_corpus_scale_frames(ray_session, monkeypatch):
    """Scale guard (same spy as the dedup/crawl families): the operator may
    collect only the per-group base aggregate, sparse probes x buckets
    histogram partials, and the narrowed final gather — never a frame
    anywhere near corpus size."""
    import ray.data

    n = 20_000
    rng = np.random.default_rng(23)
    df = pd.DataFrame({"g": rng.choice(["a", "b"], size=n),
                       "v": rng.normal(0, 1, size=n)})
    ds = ray.data.from_pandas(df).repartition(6)

    collected: list[int] = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        collected.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    got = exact_group_quantiles(ds, "g", "v", qs=QS, rounds=2, buckets=32)
    pd.testing.assert_frame_equal(got, _ref(df), check_exact=True)
    assert collected, "spy never fired"
    # histogram collects are pre-reduced inside the Dataset: <= probes
    # (2 groups x 3 qs) x 32 buckets rows, NOT O(blocks x probes x
    # buckets); the final gather is the narrowed in-interval value set
    # (~n / buckets^2 per probe). Block count must not appear anywhere.
    assert max(collected) <= 6 * 32, collected


def test_values_are_bit_exact_passthrough(ray_session):
    # the selected quantile must be one of the stored doubles, unmodified
    rng = np.random.default_rng(19)
    vals = rng.random(999)
    df = pd.DataFrame({"g": ["a"] * 999, "v": vals})
    got = _run(df, rounds=2, buckets=16)
    stored = set(vals.tolist())
    for c in ("q50", "q90", "q99"):
        assert float(got[c].iloc[0]) in stored
