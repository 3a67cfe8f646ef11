"""Minimal taffy cuckoo conformance — ports of the reference's paths tests
(c/extras/test/paths.c:13-214) and the filter-level invariant suite
(InsertPersists / StartEmpty / fpp / growth through cursor wrap)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import rand_u64
from libfilter_ray.sketch.minimal_taffy_cuckoo import (
    HEAD, LEVELS, LOG_LEVELS, TAIL, MinimalTaffyCuckoo, Path, from_path_no_tail,
    re_path, to_path)
from libfilter_ray.sketch.taffy_cuckoo import Feistel, is_prefix_of

IDENTITY = Feistel((1, 0, 1, 0))
F2 = Feistel((0x37156873AB534CE7, 0x5C669C3116114489,
              0xFA52F24F2BC644D6, 0xCBA217328D2F4950))
XBASE = 0x123456789ABCDEF0
LOW = 16
M64 = (1 << 64) - 1


def _paths_iter():
    for i in range(64):
        for cursor in range(32):
            yield (XBASE << i) & M64, cursor


def test_from_to():
    """paths.c:13-38 — to_path then from_path recovers the key's top bits."""
    many = 0
    for x, cursor in _paths_iter():
        for is_short in (False, True):
            p = to_path(x, IDENTITY, cursor, LOW, is_short)
            if p.tail == 0:
                continue
            many += 1
            y = from_path_no_tail(
                p, IDENTITY, LOW + (1 if p.level < cursor else 0),
                HEAD - (0 if p.long_fp else 1))
            shift = 64 - (LOG_LEVELS + LOW + (1 if p.level < cursor else 0)
                          + HEAD - (0 if p.long_fp else 1))
            assert x >> shift == y >> shift
    assert many >= 64 * 32


def test_to_from_to():
    """paths.c:40-66 — to∘from∘to is the identity on path coordinates."""
    for x, cursor in _paths_iter():
        for is_short in (False, True):
            p = to_path(x, IDENTITY, cursor, LOW, is_short)
            if p.tail == 0:
                continue
            y = from_path_no_tail(
                p, IDENTITY, LOW + (1 if p.level < cursor else 0),
                HEAD - (0 if p.long_fp else 1))
            q = to_path(y, IDENTITY, cursor, LOW, is_short)
            assert (p.level, p.bucket, p.fingerprint, p.long_fp) == \
                (q.level, q.bucket, q.fingerprint, q.long_fp)


def test_re_path_half_identity():
    """paths.c:69-100 — re_path(identity -> f) equals direct to_path via f
    for long paths."""
    for x, cursor in _paths_iter():
        p = to_path(x, IDENTITY, cursor, LOW, False)
        if p.tail == 0:
            continue
        q, extra = re_path(p, IDENTITY, IDENTITY, F2, F2, LOW, LOW,
                           cursor, cursor)
        assert extra is None
        r = to_path(x, F2, cursor, LOW, False)
        assert r.tail != 0
        assert (q.level, q.bucket, q.fingerprint, q.long_fp, q.tail) == \
            (r.level, r.bucket, r.fingerprint, r.long_fp, r.tail)


def test_re_path_short_identity():
    """paths.c:102-131 — same for short paths that stay short."""
    for x, cursor in _paths_iter():
        p = to_path(x, IDENTITY, cursor, LOW, True)
        q = to_path(x, F2, cursor, LOW, True)
        if p.tail == 0 or q.tail == 0:
            continue
        s, extra = re_path(p, IDENTITY, IDENTITY, F2, F2, LOW, LOW,
                           cursor, cursor)
        assert extra is None
        assert (q.level, q.bucket, q.fingerprint, q.long_fp, q.tail) == \
            (s.level, s.bucket, s.fingerprint, s.long_fp, s.tail)


def test_re_path_short_long_identity():
    """paths.c:134-167 — a short path forced long (non-empty tail) lands on
    the long to_path with one tail bit consumed."""
    count = 0
    for x, cursor in _paths_iter():
        p = to_path(x, IDENTITY, cursor, LOW, True)
        if p.tail == 0:
            continue
        q = to_path(x, F2, cursor, LOW, True)
        if q.tail != 0:
            continue
        count += 1
        q = to_path(x, F2, cursor, LOW, False)
        s, extra = re_path(p, IDENTITY, IDENTITY, F2, F2, LOW, LOW,
                           cursor, cursor)
        assert extra is None
        assert (q.level, q.bucket, q.fingerprint, q.long_fp) == \
            (s.level, s.bucket, s.fingerprint, s.long_fp)
        assert is_prefix_of(s.tail, q.tail)
    assert count >= 100


def test_re_path_double():
    """paths.c:170-207 — empty-tail short->long transmutation emits TWO
    paths, one of which matches the direct long path."""
    count = 0
    for x, cursor in _paths_iter():
        p = to_path(x, IDENTITY, cursor, LOW, True)
        if p.tail == 0:
            continue
        q = to_path(x, F2, cursor, LOW, True)
        if q.tail != 0:
            continue
        count += 1
        q = to_path(x, F2, cursor, LOW, False)
        p.tail = 1 << TAIL  # empty tail encoding
        s, r = re_path(p, IDENTITY, IDENTITY, F2, F2, LOW, LOW,
                       cursor, cursor)
        assert r is not None
        assert s.tail == 1 << TAIL
        assert r.tail == 1 << TAIL
        key = (q.level, q.bucket, q.fingerprint, q.long_fp)
        assert key == (s.level, s.bucket, s.fingerprint, s.long_fp) or \
            key == (r.level, r.bucket, r.fingerprint, r.long_fp)
    assert count >= 100


# ---------------------------------------------------------------------------
# filter-level invariants
# ---------------------------------------------------------------------------

def test_insert_persists_through_growth(rng):
    """No false negatives, ever, across fine-grained growth
    (cpp/extras/test/block.cpp:108-157 pattern)."""
    f = MinimalTaffyCuckoo()
    keys = rand_u64(rng, 2000)
    for i, k in enumerate(keys):
        f.add_hash(int(k))
        if i % 97 == 0:  # spot-check the prefix so far (full scan is O(n^2))
            assert f.find_hashes(keys[:i + 1]).all(), i
    assert f.find_hashes(keys).all()


def test_start_empty(rng):
    f = MinimalTaffyCuckoo()
    probes = rand_u64(rng, 1 << 14)
    assert not f.find_hashes(probes).any()


def test_fpp_magnitude(rng):
    """kHeadSize=9 => fpp on the order of a few percent (paths.h:31-41
    'an fpp of about 3%'); assert under 6% on random probes."""
    f = MinimalTaffyCuckoo()
    f.update(rand_u64(rng, 5000))
    probes = rand_u64(rng, 1 << 15)
    fpp = f.find_hashes(probes).mean()
    assert fpp < 0.06, fpp


def test_growth_wraps_cursor(rng):
    """Insert enough to wrap the 32-level cursor (log_side_size increments,
    lo/hi Feistels swap) and stay correct."""
    f = MinimalTaffyCuckoo()
    keys = rand_u64(rng, 800)
    f.update(keys)
    assert f.log_side_size >= 1  # cursor wrapped at least once
    assert f.find_hashes(keys).all()
    assert f.occupied <= f.capacity()


def test_serde_roundtrip(rng):
    f = MinimalTaffyCuckoo()
    keys = rand_u64(rng, 1500)
    f.update(keys)
    g = MinimalTaffyCuckoo.from_bytes(f.to_bytes())
    assert g.find_hashes(keys).all()
    probes = rand_u64(rng, 4096)
    assert np.array_equal(f.find_hashes(probes), g.find_hashes(probes))
    assert g.to_bytes() == f.to_bytes()


def test_not_mergeable():
    f = MinimalTaffyCuckoo()
    with pytest.raises(TypeError, match="not mergeable"):
        f.merge(MinimalTaffyCuckoo())


def test_registry():
    from libfilter_ray.sketch import registry

    f = registry.make("minimal_taffy_cuckoo")
    assert isinstance(f, MinimalTaffyCuckoo)


def test_vectorized_find_matches_scalar(rng):
    """find_hashes (snapshot + batch paths) is bit-identical to the scalar
    find_hash across growth, members and non-members, incl. stash."""
    from conftest import rand_u64
    from libfilter_ray.sketch.minimal_taffy_cuckoo import MinimalTaffyCuckoo

    keys = rand_u64(rng, 3000)
    f2 = MinimalTaffyCuckoo()
    prev = 0
    for cut in (50, 500, 3000):
        f2.update(keys[prev:cut])
        prev = cut
        probes = np.concatenate([keys[:cut], rand_u64(rng, 3000)])
        vec = f2.find_hashes(probes)
        scalar = np.array([f2.find_hash(int(k)) for k in probes])
        assert np.array_equal(vec, scalar), cut
        assert vec[:cut].all(), cut
