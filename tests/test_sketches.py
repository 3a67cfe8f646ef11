"""HLL / CMS / t-digest / KLL accuracy vs published error bounds
(BASELINE.md "Engine sketch-accuracy bounds") + merge invariance + serde."""

from __future__ import annotations

import numpy as np
import pytest

from libfilter_ray.sketch.cms import CountMin
from libfilter_ray.sketch.hashing import hash_u64
from libfilter_ray.sketch.hll import HyperLogLog
from libfilter_ray.sketch.kll import KLL
from libfilter_ray.sketch.tdigest import TDigest


# ---------------------------------------------------------------- HLL
def test_hll_error_bound():
    """Relative error within 3 * 1.04/sqrt(m) for several cardinalities."""
    for n in (1_000, 50_000, 1_000_000):
        h = HyperLogLog(p=12)
        h.update(hash_u64(np.arange(n, dtype=np.uint64)))
        rel = abs(h.estimate() - n) / n
        assert rel < 3 * h.std_error(), (n, rel)


def test_hll_merge_is_exact_union():
    a = HyperLogLog(12).update(hash_u64(np.arange(0, 60_000, dtype=np.uint64)))
    b = HyperLogLog(12).update(hash_u64(np.arange(30_000, 100_000, dtype=np.uint64)))
    whole = HyperLogLog(12).update(hash_u64(np.arange(100_000, dtype=np.uint64)))
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge(b)
    assert merged.to_bytes() == whole.to_bytes()  # register-max: byte-exact
    assert HyperLogLog.from_bytes(merged.to_bytes()).estimate() == merged.estimate()


def test_hll_param_checks():
    with pytest.raises(ValueError):
        HyperLogLog(p=2)
    with pytest.raises(ValueError):
        HyperLogLog(12).merge(HyperLogLog(13))
    with pytest.raises(ValueError):
        HyperLogLog.from_bytes(b"junk")


def test_hll_empty():
    assert HyperLogLog(10).estimate() == 0.0


# ---------------------------------------------------------------- CMS
def test_cms_never_underestimates_and_bound(rng):
    data = rng.zipf(1.3, 100_000).astype(np.uint64)
    c = CountMin(eps=0.001, delta=0.01)
    c.update(hash_u64(data))
    keys = np.unique(data)[:200]
    true = np.array([(data == k).sum() for k in keys])
    est = c.query(hash_u64(keys)).astype(np.int64)
    assert (est >= true).all()
    # overestimate <= eps*N with prob >= 1-delta; allow a couple of outliers
    over = est - true
    assert (over <= c.eps() * c.total).mean() > 0.99


def test_cms_merge_linearity(rng):
    data = rng.integers(0, 1000, 50_000).astype(np.uint64)
    whole = CountMin(width=2048, depth=5).update(hash_u64(data))
    parts = [CountMin(width=2048, depth=5).update(hash_u64(data[i::4]))
             for i in range(4)]
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    assert np.array_equal(m.counts, whole.counts)  # cell-wise sum: byte-exact
    assert m.total == whole.total


def test_cms_weighted_update(rng):
    c = CountMin(width=1024, depth=4)
    keys = np.arange(10, dtype=np.uint64)
    c.update(hash_u64(keys), weights=np.full(10, 7, dtype=np.uint64))
    assert (c.query(hash_u64(keys)) >= 7).all()
    assert c.total == 70


def test_cms_shape_mismatch():
    with pytest.raises(ValueError):
        CountMin(width=64, depth=2).merge(CountMin(width=128, depth=2))


# ------------------------------------------------------------ t-digest
def test_tdigest_quantile_accuracy(rng):
    vals = rng.normal(0, 1, 200_000)
    t = TDigest(100)
    for ch in np.array_split(vals, 8):
        t.update(ch)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = t.quantile(q)
        rank = (vals <= est).mean()
        # rank error tightest at tails (scale fn k1): generous global bound
        assert abs(rank - q) < 0.02, (q, rank)
    assert t.quantile(0.0) == vals.min() and t.quantile(1.0) == vals.max()


def test_tdigest_merge(rng):
    vals = rng.exponential(10, 100_000)
    parts = [TDigest(100).update(ch) for ch in np.array_split(vals, 16)]
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    assert m.count == len(vals)
    assert abs((vals <= m.quantile(0.5)).mean() - 0.5) < 0.02
    g = TDigest.from_bytes(m.to_bytes())
    assert g.quantile(0.5) == m.quantile(0.5)


def test_tdigest_compression_bounds(rng):
    t = TDigest(100)
    t.update(rng.normal(0, 1, 500_000))
    t.finalize()
    assert len(t.means) < 200  # centroid count bounded ~delta


# ---------------------------------------------------------------- KLL
def test_kll_rank_error_bound(rng):
    vals = rng.normal(100, 15, 300_000)
    k = KLL(200)
    for ch in np.array_split(vals, 8):
        k.update(ch)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        rank = (vals <= k.quantile(q)).mean()
        assert abs(rank - q) < 3.0 / 200, (q, rank)
    assert k._total_size() < 1000  # sublinear space


def test_kll_merge(rng):
    vals = rng.uniform(0, 1, 100_000)
    parts = [KLL(200).update(ch) for ch in np.array_split(vals, 8)]
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    assert m.n == len(vals)
    for q in (0.1, 0.5, 0.9):
        assert abs((vals <= m.quantile(q)).mean() - q) < 3.0 / 200


def test_kll_deterministic(rng):
    """Content-derived compaction coin -> same input = same sketch bytes."""
    vals = rng.normal(0, 1, 50_000)
    a = KLL(200).update(vals)
    b = KLL(200).update(vals)
    assert a.to_bytes() == b.to_bytes()


def test_kll_serde_and_mismatch(rng):
    k = KLL(100).update(rng.normal(0, 1, 10_000))
    g = KLL.from_bytes(k.to_bytes())
    assert g.n == k.n and g.quantile(0.5) == k.quantile(0.5)
    with pytest.raises(ValueError):
        KLL(100).merge(KLL(200))


def test_values_flow_through_registry():
    from libfilter_ray.sketch import registry

    for kind in ("hll", "cms", "tdigest", "kll"):
        assert kind in registry.kinds()
    assert registry.get("tdigest").input == "values"
    assert registry.get("hll").input == "hashes"


def test_cms_deep_rows_are_independent():
    """Regression: depth > 8 used to wrap multipliers (r % 8), making rows
    8+ bit-identical to rows 0+ — zero added independence while delta()
    advertised exp(-depth). Rows <= 7 keep the pinned table (payload
    compat)."""
    import numpy as np

    from libfilter_ray.sketch.cms import CountMin

    c = CountMin(width=4096, depth=12)
    h = np.random.default_rng(3).integers(0, 2**63, 2000).astype(np.uint64)
    idx = c._indices(h)
    for r in range(8, 12):
        assert not np.array_equal(idx[r], idx[r - 8]), r
    # pinned multipliers for the first 8 rows
    for r in range(8):
        assert c._row_mult(r) == CountMin._ROW_MULT[r]


def test_cms_weighted_update_overestimates_and_rejects_negative():
    import numpy as np
    import pytest

    from libfilter_ray.sketch.cms import CountMin

    c = CountMin(width=1 << 12, depth=4)
    h = np.random.default_rng(4).integers(0, 2**63, 64).astype(np.uint64)
    c.update(h, weights=np.full(64, 0.5))
    # ceil keeps the count-min overestimate guarantee for fractional weights
    assert (c.query(h) >= 1).all()  # true weight 0.5 -> estimate >= ceil
    with pytest.raises(ValueError, match="non-negative"):
        c.update(h[:2], weights=np.array([1.0, -0.5]))
