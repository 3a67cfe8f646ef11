"""Standard cuckoo filter (sketch/cuckoo.py) — the bench-baseline sketch.
Invariants mirror the reference's conformance suite
(cpp/extras/test/block.cpp): InsertPersists / StartEmpty / fpp bound /
SerDe, plus the cuckoo-specific delete."""

import numpy as np
import pytest

from libfilter_ray.sketch.cuckoo import CuckooFilter


def _keys(n, seed=5):
    return np.random.default_rng(seed).integers(0, 2**64, n,
                                                dtype=np.uint64)


def test_start_empty():
    f = CuckooFilter(ndv=1000)
    assert not f.find_hashes(_keys(1 << 16)).any()
    assert f.occupied == 0


def test_insert_persists_across_kicks():
    """Every inserted key is always found, including after long kick
    chains near the 95% load bound (block.cpp:108-157 analogue).
    bytes_=8192 -> exactly 1024 buckets x 4 slots, so 3800 keys reach
    92.8% occupancy and relocation genuinely runs."""
    keys = _keys(3800, seed=7)
    f = CuckooFilter(bytes_=8192)
    assert f.num_buckets * 4 == 4096
    for i in range(0, len(keys), 100):
        f.add_hashes(keys[i:i + 100])
        assert f.find_hashes(keys[:i + 100]).all()
    assert f.occupied == 3800  # > 90% load reached


def test_duplicate_overflow_raises_clearly():
    """> 2b copies of one key via add_hashes fails with the duplicate
    diagnosis, not a misleading 'size it larger'."""
    f = CuckooFilter(ndv=100_000)
    one = np.full(8, 12345, dtype=np.uint64)
    f.add_hashes(one)                      # 2 buckets x 4 slots fill
    with pytest.raises(RuntimeError, match="duplicate"):
        f.add_hashes(one[:1])


def test_update_set_semantics_survive_duplicate_heavy_stream():
    """update() (the build path) never overflows on a low-cardinality
    column: 50 batches of the same 5 values across many calls."""
    vals = np.array([1, 2, 3, 4, 5], dtype=np.uint64) * np.uint64(2**40)
    f = CuckooFilter(ndv=1000)
    for _ in range(50):
        f.update(np.repeat(vals, 20))
    assert f.find_hashes(vals).all()
    assert f.occupied <= 5


def test_failed_kick_chain_unwinds_atomically():
    """On kick-chain overflow the table is restored: every previously
    inserted key is still found (no half-relocated victims)."""
    keys = _keys(900, seed=23)
    f = CuckooFilter(bytes_=1024)          # 128 buckets x 4 = 512 slots
    inserted = 0
    with pytest.raises(RuntimeError, match="restored"):
        for i in range(0, len(keys), 10):
            f.add_hashes(keys[i:i + 10])
            inserted = i + 10
    # the batch that raised may have placed a prefix of its keys; every
    # key from COMPLETED batches must still be present
    assert f.find_hashes(keys[:inserted]).all()


def test_fpp_within_fingerprint_bound():
    """Measured fpp <= the paper's 2 * slots / 2^fp_bits bound (x2 test
    slack, the reference's own FilterTest.java:69-78 style)."""
    keys = _keys(3000, seed=11)
    f = CuckooFilter(ndv=4000, fp_bits=12).add_hashes(keys)
    probes = _keys(1 << 18, seed=12)
    probes = probes[np.isin(probes, keys, invert=True)]
    fpp = f.find_hashes(probes).mean()
    assert fpp <= 2 * (2 * 4 / (1 << 12))


def test_delete_removes_and_preserves_others():
    keys = _keys(2000, seed=13)
    f = CuckooFilter(ndv=4000).add_hashes(keys)
    gone, kept = keys[:500], keys[500:]
    assert f.delete_hashes(gone).all()
    assert f.find_hashes(kept).all()       # no collateral false negatives
    # deleted keys drop to fpp-level presence
    assert f.find_hashes(gone).mean() < 0.05
    assert f.occupied == 1500


def test_duplicates_are_stored_multiset():
    """Paper §3.2 multiset semantics: duplicates occupy slots (delete
    support requires it — eliding a shared fingerprint would let one
    key's delete unfind another). Two copies, two deletes."""
    keys = _keys(100, seed=17)
    f = CuckooFilter(ndv=1000).add_hashes(keys).add_hashes(keys)
    assert f.occupied == 200               # duplicates stored, not deduped
    assert f.delete_hashes(keys).all()
    assert f.find_hashes(keys).all()       # second copies still there
    assert f.delete_hashes(keys).all()
    assert f.occupied == 0


def test_serde_roundtrip():
    keys = _keys(1500, seed=19)
    f = CuckooFilter(ndv=2000, fp_bits=10).add_hashes(keys)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.num_buckets == f.num_buckets and g.fp_bits == f.fp_bits
    assert np.array_equal(g.table, f.table)
    assert g.find_hashes(keys).all()
    assert g.occupied == f.occupied


def test_merge_refuses():
    with pytest.raises(NotImplementedError, match="taffy_cuckoo"):
        CuckooFilter(ndv=100).merge(CuckooFilter(ndv=100))


def test_overfull_raises():  # legacy name; message now notes the restore
    keys = _keys(3000, seed=23)
    f = CuckooFilter(bytes_=1024)          # 128 buckets * 4 slots = 512
    with pytest.raises(RuntimeError, match="kicks"):
        f.add_hashes(keys)


def test_registry_kind():
    from libfilter_ray.sketch import registry

    f = registry.make("cuckoo", ndv=500)
    keys = _keys(400, seed=29)
    f.update(keys)
    assert f.find_hashes(keys).all()
    assert "cuckoo" in registry.kinds()


def test_distributed_build_fails_loud_single_actor_works(ray_session):
    """The cuckoo kind is honest about not merging: the partial-merge
    build path raises with a pointer to taffy_cuckoo, while the
    single-consumer actor-pool path (no merge) builds fine."""
    import ray.data

    from libfilter_ray.stages.sketch_build import (build_sketch,
                                                   build_sketch_actor_pool)

    ds = ray.data.range(2000).map_batches(
        lambda b: {"key": b["id"] * 2654435761 % (1 << 63)},
        batch_format="numpy").repartition(4)
    with pytest.raises(NotImplementedError, match="taffy_cuckoo"):
        build_sketch(ds, "key", "cuckoo", {"ndv": 4000}, pre_hashed=True)
    f = build_sketch_actor_pool(ds, "key", "cuckoo", {"ndv": 4000},
                                concurrency=1, pre_hashed=True)
    keys = (np.arange(2000, dtype=np.uint64)
            * np.uint64(2654435761) % np.uint64(1 << 63))
    assert f.find_hashes(keys).all()


def test_insert_delete_find_interplay_property():
    """Hypothesis-style randomized interplay (fixed seeds): after any
    interleaving of inserts and deletes of disjoint key sets, every
    still-inserted key is found and occupancy bookkeeping is exact."""
    rng = np.random.default_rng(41)
    f = CuckooFilter(ndv=3000)
    live: list[np.ndarray] = []
    occupied = 0
    for step in range(12):
        ks = rng.integers(0, 2**64, 150, dtype=np.uint64)
        f.add_hashes(ks)
        live.append(ks)
        occupied += len(ks)
        if step % 3 == 2:        # delete the oldest tranche
            gone = live.pop(0)
            assert f.delete_hashes(gone).all()
            occupied -= len(gone)
        for tranche in live:
            assert f.find_hashes(tranche).all()
        assert f.occupied == occupied
