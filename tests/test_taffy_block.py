"""TaffyBlock conformance — byte-exact level parity with the compiled C
reference (tests/golden/taffy_block_golden.txt incl. growth), plus growth /
merge / serde properties."""

from __future__ import annotations

import os

import numpy as np
import pytest

from libfilter_ray.sketch.taffy_block import TaffyBlock

from conftest import rand_u64
from test_taffy_cuckoo import sm

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "taffy_block_golden.txt")


def test_golden_conformance_vs_c_reference():
    for ci, line in enumerate(open(GOLDEN)):
        parts = line.split()
        ndv, fpp, n = int(parts[0]), float(parts[1]), int(parts[2])
        cursor, ttl, last_ndv = int(parts[3]), int(parts[4]), int(parts[5])
        levels, probes = parts[6:-1], parts[-1]
        t = TaffyBlock(ndv=ndv, fpp=fpp)
        t.add_hashes(sm(0xABCD0000 + ci, n))
        assert (t.cursor, t.ttl, t.last_ndv) == (cursor, ttl, last_ndv)
        assert len(levels) == t.cursor
        for i, lv in enumerate(levels):
            nbytes, hexd = lv.split(":")
            assert t.levels[i].size_in_bytes() == int(nbytes)
            assert t.levels[i].to_bytes().hex() == hexd
        got = "".join("1" if x else "0" for x in t.find_hashes(sm(0x7777, 64)))
        assert got == probes


def test_insert_persists_across_growth(rng):
    t = TaffyBlock(ndv=100, fpp=0.01)
    keys = rand_u64(rng, 5000)
    for i in range(0, 5000, 500):
        t.add_hashes(keys[i:i + 500])
        assert t.find_hashes(keys[:i + 500]).all()
    assert t.cursor > 1  # actually grew


def test_start_empty(rng):
    t = TaffyBlock(ndv=1000, fpp=0.01)
    assert t.find_hashes(rand_u64(rng, 1 << 16)).sum() == 0


def test_fpp_budget(rng):
    """Total fpp stays within ~2x configured across growth (level budget
    6eps/i^2pi^2 sums below eps — taffy.tex:500-508)."""
    t = TaffyBlock(ndv=1000, fpp=0.01)
    t.add_hashes(rand_u64(rng, 8000))  # 3 doublings
    measured = t.find_hashes(rand_u64(rng, 1 << 18)).mean()
    assert measured < 0.02
    assert abs(t.estimated_fpp() - measured) < 0.01


def test_merge_no_false_negatives(rng):
    keys = rand_u64(rng, 6000)
    parts = [TaffyBlock(ndv=500, fpp=0.01).add_hashes(keys[i::3])
             for i in range(3)]
    acc = parts[0].clone()
    acc.merge(parts[1]).merge(parts[2])
    assert acc.find_hashes(keys).all()
    # set-level merge-order invariance on found answers for members
    acc2 = parts[2].clone()
    acc2.merge(parts[0]).merge(parts[1])
    assert acc2.find_hashes(keys).all()


def test_merge_param_mismatch():
    with pytest.raises(ValueError):
        TaffyBlock(ndv=100, fpp=0.01).merge(TaffyBlock(ndv=200, fpp=0.01))


def test_serde_roundtrip(rng):
    t = TaffyBlock(ndv=200, fpp=0.01)
    t.add_hashes(rand_u64(rng, 3000))
    u = TaffyBlock.from_bytes(t.to_bytes())
    assert u == t
    assert (u.ttl, u.last_ndv, u.counts) == (t.ttl, t.last_ndv, t.counts)
    probes = rand_u64(rng, 10000)
    assert np.array_equal(t.find_hashes(probes), u.find_hashes(probes))


def test_registered():
    from libfilter_ray.sketch import registry

    assert "taffy_block" in registry.kinds()
    assert "taffy_cuckoo" in registry.kinds()
