"""KMV bottom-k sketch: exact regime, estimate error vs published bound,
merge-order invariance, serde, and theta-style set operations."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_ray.sketch.hashing import hash_u64
from libfilter_ray.sketch.kmv import KMV, set_ops


def test_exact_below_k():
    sk = KMV(k=128)
    sk.update(hash_u64(np.arange(100, dtype=np.uint64)))
    # duplicates must not inflate the kept set
    sk.update(hash_u64(np.arange(100, dtype=np.uint64)))
    assert len(sk.kept) == 100
    assert not sk.is_full
    assert sk.estimate() == 100.0
    assert sk.theta_int() == 1 << 64


def test_estimate_error_bound():
    """Relative error within 4 / sqrt(k-2) (Beyer et al. give
    ~1/sqrt(k-2) std error for the (k-1)/U_(k) estimator)."""
    for n in (10_000, 200_000):
        sk = KMV(k=1024)
        sk.update(hash_u64(np.arange(n, dtype=np.uint64)))
        rel = abs(sk.estimate() - n) / n
        assert rel < 4 * sk.std_error(), (n, rel, sk.std_error())


def test_merge_is_exact_union():
    a = KMV(64).update(hash_u64(np.arange(0, 6000, dtype=np.uint64)))
    b = KMV(64).update(hash_u64(np.arange(3000, 10000, dtype=np.uint64)))
    whole = KMV(64).update(hash_u64(np.arange(10000, dtype=np.uint64)))
    merged = KMV.from_bytes(a.to_bytes()).merge(b)
    assert merged.to_bytes() == whole.to_bytes()  # set semantics: byte-exact


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=300),
       st.integers(2, 5), st.randoms(use_true_random=False))
def test_merge_order_invariance(vals, nparts, rnd):
    """Any partition of the stream into per-part sketches, merged in any
    order, yields the same kept set as one sequential build."""
    h = np.array(vals, dtype=np.uint64)
    ref = KMV(16).update(h)
    idx = np.arange(len(h))
    rnd.shuffle(idx)
    parts = [KMV(16).update(h[idx[i::nparts]]) for i in range(nparts)]
    rnd.shuffle(parts)
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.merge(p)
    assert np.array_equal(acc.kept, ref.kept)
    assert acc.digest() == ref.digest()


def test_serde_roundtrip():
    sk = KMV(32).update(hash_u64(np.arange(1000, dtype=np.uint64)))
    back = KMV.from_bytes(sk.to_bytes())
    assert back.k == 32 and np.array_equal(back.kept, sk.kept)
    with pytest.raises(ValueError):
        KMV.from_bytes(b"junkpayload")
    with pytest.raises(ValueError):
        KMV(16).merge(KMV(32))
    with pytest.raises(ValueError):
        KMV(k=1)


def test_set_ops_exact_regime():
    """Both sketches below k: theta = 2^64 and every estimate is exact."""
    a = KMV(128).update(hash_u64(np.arange(0, 60, dtype=np.uint64)))
    b = KMV(128).update(hash_u64(np.arange(40, 100, dtype=np.uint64)))
    o = set_ops(a, b)
    assert o["theta"] == 1 << 64
    assert o["n_common"] == 20 and o["inter_est"] == 20.0
    assert o["n_union_kept"] == 100 and o["union_est"] == 100.0
    assert o["jaccard"] == 0.2


def test_set_ops_estimate_regime():
    """Planted 50% overlap at n >> k: estimates within 5 std errors."""
    k = 512
    a = KMV(k).update(hash_u64(np.arange(0, 100_000, dtype=np.uint64)))
    b = KMV(k).update(hash_u64(np.arange(50_000, 150_000, dtype=np.uint64)))
    o = set_ops(a, b)
    se = 1 / np.sqrt(k - 2)
    assert abs(o["union_est"] - 150_000) / 150_000 < 5 * se
    assert abs(o["inter_est"] - 50_000) / 50_000 < 10 * se
    assert abs(o["jaccard"] - 1 / 3) < 10 * se
    with pytest.raises(ValueError):
        set_ops(KMV(16), KMV(32))


def test_set_ops_empty():
    o = set_ops(KMV(16), KMV(16))
    assert o["n_common"] == 0 and o["jaccard"] == 0.0


def test_registry_build(ray_session):
    """kind='kmv' flows through the global tree-merge build and equals a
    local sequential build of the same hashed column."""
    import ray.data

    from libfilter_ray.sketch.hashing import DEFAULT_SEED
    from libfilter_ray.stages.sketch_build import build_sketch

    vals = np.arange(5000, dtype=np.int64)
    ds = ray.data.from_arrow(
        __import__("pyarrow").table({"v": vals})).repartition(8)
    sk = build_sketch(ds, "v", "kmv", {"k": 64})
    ref = KMV(64).update(hash_u64(vals.view(np.uint64), seed=DEFAULT_SEED))
    assert np.array_equal(sk.kept, ref.kept)
