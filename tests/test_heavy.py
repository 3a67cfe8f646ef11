"""Misra-Gries heavy hitters: compress invariants, the merged-summary
no-false-negative guarantee, and the two-pass exact pipeline vs a plain
exact count."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_ray.stages.heavy import (grouped_heavy_hitters,
                                        heavy_hitters, mg_compress,
                                        zipf_items)


def _exact(items):
    vals, counts = np.unique(items, return_counts=True)
    return dict(zip(vals.tolist(), counts.tolist()))


def test_mg_compress_invariants(rng):
    items = rng.zipf(1.5, 10_000).astype(np.int64)
    vals, counts = np.unique(items, return_counts=True)
    cv, cc = mg_compress(vals, counts.astype(np.int64), 32)
    assert len(cv) <= 32
    true = _exact(items)
    for v, c in zip(cv.tolist(), cc.tolist()):
        assert 0 < c <= true[v]  # never overcounts


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 40), min_size=1, max_size=500),
       st.integers(2, 8), st.integers(4, 16))
def test_merged_summary_no_false_negatives(vals, nblocks, k):
    """Split the stream into blocks, MG-compress each, SUM the summaries
    (the groupby-Sum merge): every item with true count > n/(k+1) must
    survive with lower bound within n/(k+1) of its true count —
    Agarwal et al.'s mergeability bound, the guarantee heavy_hitters'
    candidate filter relies on."""
    items = np.array(vals, dtype=np.int64)
    n = len(items)
    true = _exact(items)
    summed: dict[int, int] = {}
    for i in range(nblocks):
        block = items[i::nblocks]
        if not len(block):
            continue
        v, c = np.unique(block, return_counts=True)
        v, c = mg_compress(v, c.astype(np.int64), k)
        for vv, cc in zip(v.tolist(), c.tolist()):
            summed[vv] = summed.get(vv, 0) + cc
    bound = n // (k + 1)
    for item, t in true.items():
        got = summed.get(item, 0)
        assert got <= t
        if t > bound:
            assert item in summed and got >= t - bound, (item, t, got, bound)


def test_zipf_items_shape():
    ids = np.arange(200_000, dtype=np.int64)
    it = zipf_items(ids)
    assert it.dtype == np.int64 and (it >= 1).all()
    # P(item=1) = 1/2, P(item=2) = 1/6 — within loose sampling bands
    share1 = (it == 1).mean()
    share2 = (it == 2).mean()
    assert 0.49 < share1 < 0.51 and 0.16 < share2 < 0.175
    # deterministic
    assert np.array_equal(it[:100], zipf_items(ids[:100]))


def test_phi_guarantee_check(ray_session):
    import ray.data

    ds = ray.data.range(10)
    with pytest.raises(ValueError):
        heavy_hitters(ds, lambda t: np.zeros(t.num_rows, dtype=np.int64),
                      k=10, phi_num=1, phi_den=50)


def test_heavy_hitters_end_to_end(ray_session, rng):
    """Two-pass MG + recount over a Ray dataset == exact pandas
    groupby + threshold, with blocks small enough that per-block MG
    compression genuinely engages."""
    import ray.data

    n = 60_000
    ids = rng.permutation(n).astype(np.int64)
    truth_items = zipf_items(ids)
    ds = ray.data.from_arrow(pa.table({"id": ids})).repartition(12)

    def items(t: pa.Table) -> np.ndarray:
        col = t.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        return zipf_items(np.asarray(col))

    out, total = heavy_hitters(ds, items, k=64, phi_num=1, phi_den=50,
                               batch_size=4096)
    assert total == n
    thresh = (n + 49) // 50
    exact = pd.Series(truth_items).value_counts()
    want = exact[exact >= thresh].sort_index()
    got = out.set_index("item")["n"].sort_index()
    assert got.index.tolist() == want.index.tolist()
    assert (got.to_numpy() == want.to_numpy()).all()


def test_heavy_hitters_empty(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"id": pa.array([], type=pa.int64())}))
    out, total = heavy_hitters(
        ds, lambda t: np.empty(0, dtype=np.int64), k=16, phi_num=1,
        phi_den=4)
    assert total == 0 and len(out) == 0


def test_heavy_hitters_never_collects_vocab(ray_session, monkeypatch):
    """Scale guard (the house to_pandas spy): with a vocabulary far wider
    than the candidate bound, every driver collect stays at
    O(1/(phi - 1/(k+1))) rows — never O(vocab)."""
    import ray.data

    # 40k-row stream: zipf head (heavy hitters) + 20k singleton items
    # (the wide crawl tail a naive collect would choke on)
    ids = np.arange(40_000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids})).repartition(8)

    def make(id_arr: np.ndarray) -> np.ndarray:
        out = zipf_items(id_arr)
        tail = id_arr >= 20_000
        out[tail] = 1_000_000_000 + id_arr[tail]
        return out

    def items(t: pa.Table) -> np.ndarray:
        col = t.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        return make(np.asarray(col))

    vocab = len(np.unique(make(ids)))
    assert vocab > 20_000  # the guard is vacuous on a narrow vocabulary

    collected = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        collected.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    out, total = heavy_hitters(ds, items, k=64, phi_num=1, phi_den=50,
                               batch_size=4096)
    assert total == 40_000 and len(out) >= 4
    assert collected, "spy never fired"
    # bound: 1/(phi - 1/(k+1)) = 1/(1/50 - 1/65) ~ 217 candidate rows
    assert max(collected) <= 250, (max(collected), vocab)


def _grouped_truth(keys, items, phi_num, phi_den):
    df = pd.DataFrame({"key": keys, "item": items})
    tot = df.groupby("key").size()
    cnt = df.groupby(["key", "item"]).size().reset_index(name="n")
    cnt["total"] = cnt["key"].map(tot)
    out = cnt[cnt["n"] * phi_den >= phi_num * cnt["total"]]
    return out.sort_values(["key", "n", "item"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)[["key", "item", "n"]], tot.to_dict()


def _grouped_ds(keys, ids, nblocks=12):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "key": pa.array(keys, type=pa.string()),
        "id": pa.array(ids, type=pa.int64()),
    })).repartition(nblocks)


def _id_items(make):
    def items(t: pa.Table) -> np.ndarray:
        col = t.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        return make(np.asarray(col))

    return items


def test_grouped_heavy_hitters_end_to_end(ray_session, rng):
    """Per-key two-pass MG + recount == exact per-key pandas groupby +
    threshold, on keys with very different stream sizes (skewed key) so
    the per-key cutoffs genuinely differ."""
    n = 50_000
    ids = rng.permutation(n).astype(np.int64)
    # skew: key 'a' carries ~70% of rows, 'c' ~2%
    u = rng.random(n)
    keys = np.where(u < 0.7, "a", np.where(u < 0.98, "b", "c"))
    truth_items = zipf_items(ids)
    want, want_totals = _grouped_truth(keys, truth_items, 1, 50)

    ds = _grouped_ds(keys.tolist(), ids)
    out, totals = grouped_heavy_hitters(ds, "key", _id_items(zipf_items),
                                        k=64, phi_num=1, phi_den=50,
                                        batch_size=4096)
    assert totals == want_totals
    assert out["key"].tolist() == want["key"].tolist()
    assert out["item"].tolist() == want["item"].tolist()
    assert out["n"].tolist() == want["n"].tolist()


def test_grouped_heavy_hitters_guards(ray_session):
    import ray.data

    ds = _grouped_ds(["a", "b"], [1, 2], nblocks=1)
    with pytest.raises(ValueError):
        grouped_heavy_hitters(
            ds, "key", lambda t: np.zeros(t.num_rows, dtype=np.int64),
            k=10, phi_num=1, phi_den=50)
    # make_items must stay row-aligned in the grouped path; the
    # misalignment raises inside a Ray task and surfaces at materialize
    with pytest.raises(Exception, match="one item per row"):
        grouped_heavy_hitters(
            ds, "key", lambda t: np.zeros(t.num_rows - 1, dtype=np.int64),
            k=64, phi_num=1, phi_den=50)

    empty = ray.data.from_arrow(pa.table({
        "key": pa.array([], type=pa.string()),
        "id": pa.array([], type=pa.int64())}))
    out, totals = grouped_heavy_hitters(
        empty, "key", lambda t: np.empty(0, dtype=np.int64),
        k=16, phi_num=1, phi_den=4)
    assert len(out) == 0 and totals == {}


def test_grouped_heavy_hitters_never_collects_vocab(ray_session,
                                                    monkeypatch):
    """Scale guard: per-key driver collects stay at O(#keys x candidate
    bound) even when each key's vocabulary is 10k+ singletons."""
    import ray.data

    n = 40_000
    ids = np.arange(n, dtype=np.int64)
    keys = np.where(ids % 2 == 0, "a", "b")

    def make(id_arr: np.ndarray) -> np.ndarray:
        out = zipf_items(id_arr)
        tail = id_arr >= n // 2
        out[tail] = 1_000_000_000 + id_arr[tail]  # per-key singleton tail
        return out

    ds = _grouped_ds(keys.tolist(), ids, nblocks=8)

    collected = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        collected.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    out, totals = grouped_heavy_hitters(ds, "key", _id_items(make),
                                        k=64, phi_num=1, phi_den=50,
                                        batch_size=4096)
    assert totals == {"a": n // 2, "b": n // 2} and len(out) >= 8
    assert collected, "spy never fired"
    # 2 keys x ~217 candidates; totals collect is 2 rows
    assert max(collected) <= 500, max(collected)
    # exactness on the same stream
    want, _ = _grouped_truth(keys, make(ids), 1, 50)
    assert out["n"].tolist() == want["n"].tolist()
    assert out["item"].tolist() == want["item"].tolist()
