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


def test_tvqf_upsize_restart_keeps_all_keys(rng, monkeypatch):
    """If migration overflows the one-level-up target, upsize must RESTART
    with a bigger target (reference's size_up++), never let the target
    upsize mid-migration — a nested upsize reads phantom raw bits and used
    to mass-produce false negatives."""
    from libfilter_ray.sketch import vector_quotient as vq

    keys = rand_u64(rng, 800)
    f = vq.TaffyVectorQuotient()
    f.add_hashes(keys[:700])
    assert f.find_hashes(keys[:700]).all()

    # force the next migration's first attempt to fail once: the first
    # call into a FRESH target returns False, so _upsize must discard it
    # and retry at log_size + 2
    orig_try = vq.TaffyVectorQuotient._try_insert_raw
    state = {"armed": True, "failed_once": False}

    def flaky(self, raw, tail):
        if state["armed"] and self.occupancy == 0 and not state["failed_once"]:
            state["failed_once"] = True
            return False
        return orig_try(self, raw, tail)

    monkeypatch.setattr(vq.TaffyVectorQuotient, "_try_insert_raw", flaky)
    before = f.log_size
    f._upsize()
    state["armed"] = False
    assert state["failed_once"]
    assert f.log_size >= before + 2  # restarted bigger, not nested
    assert f.find_hashes(keys[:700]).all()  # zero false negatives
    f.add_hashes(keys[700:])
    assert f.find_hashes(keys).all()


def test_tvqf_vectorized_find_matches_scalar(rng):
    from libfilter_ray.sketch.vector_quotient import TaffyVectorQuotient

    keys = rand_u64(rng, 2500)
    f = TaffyVectorQuotient()
    f.add_hashes(keys)
    probes = np.concatenate([keys[:500], rand_u64(rng, 4000)])
    vec = f.find_hashes(probes)
    scalar = np.array([f.find_hash(int(k)) for k in probes])
    assert np.array_equal(vec, scalar)
    assert vec[:500].all()  # members
