"""Taffy vector-quotient filter: invariants the reference's test suite
applies to its other growable filters (block.cpp:108-157 ports)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import rand_u64


def test_tvqf_never_false_negative_across_growth(rng):
    from libfilter_ray.sketch.vector_quotient import TaffyVectorQuotient

    keys = rand_u64(rng, 3000)
    # insert incrementally, checking everything inserted so far stays found
    # across the growth steps the chunks force
    f = TaffyVectorQuotient()
    prev = 0
    for cut in (10, 100, 1000, 3000):
        f.add_hashes(keys[prev:cut])
        prev = cut
        assert f.find_hashes(keys[:cut]).all(), cut


def test_tvqf_fpp_and_size(rng):
    from libfilter_ray.sketch.vector_quotient import TaffyVectorQuotient

    keys = rand_u64(rng, 4000)
    f = TaffyVectorQuotient()
    f.add_hashes(keys)
    probes = rand_u64(rng, 1 << 14)
    probes = probes[np.isin(probes, keys, invert=True)]
    fpp = float(f.find_hashes(probes).mean())
    # 9-bit fingerprints, two choices: fpp well under 2%
    assert fpp < 0.02, fpp
    assert f.size_in_bytes() == 64 << f.log_size


def test_tvqf_serde_clone(rng):
    from libfilter_ray.sketch.vector_quotient import TaffyVectorQuotient

    keys = rand_u64(rng, 1500)
    f = TaffyVectorQuotient()
    f.add_hashes(keys)
    g = TaffyVectorQuotient.from_bytes(f.to_bytes())
    assert g.to_bytes() == f.to_bytes()
    assert g.find_hashes(keys).all()
    c = f.clone()
    c.add_hashes(rand_u64(rng, 100))
    assert f.to_bytes() != c.to_bytes()  # clone is independent
    assert TaffyVectorQuotient.from_bytes(f.to_bytes()).to_bytes() \
        == f.to_bytes()


def test_tvqf_registry():
    from libfilter_ray.sketch import registry

    f = registry.make("taffy_vector_quotient")
    f.update(np.array([1, 2, 3], dtype=np.uint64))
    assert f.find_hashes(np.array([1, 2, 3], dtype=np.uint64)).all()
