"""stages/fuzzy.py — FastSS edit-distance-1 banding + vectorized verify."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_ray.stages.fuzzy import ed_le1_mask, edit1_pairs


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (full DP) — the oracle for the vectorized
    verifier."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORD = st.text(alphabet="abcxyz#-", min_size=1, max_size=8)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(WORD, WORD), min_size=1, max_size=40))
def test_ed_le1_mask_matches_dp(pairs):
    a = np.array([p[0] for p in pairs], dtype="U")
    b = np.array([p[1] for p in pairs], dtype="U")
    got = ed_le1_mask(a, b)
    ref = np.array([_lev(x, y) <= 1 for x, y in pairs])
    assert (got == ref).all()


def test_ed_le1_mask_edge_shapes():
    assert ed_le1_mask(np.array([], dtype="U"),
                       np.array([], dtype="U")).shape == (0,)
    # single-char vs empty-ish and equal strings
    a = np.array(["a", "ab", "ab", "abc", "abc"], dtype="U")
    b = np.array(["b", "a", "ba", "abc", "cba"], dtype="U")
    assert ed_le1_mask(a, b).tolist() == [True, True, False, True, False]
    # all-empty inputs (la.max() == 0) must not crash the U-dtype views
    e = np.array(["", "", ""], dtype="U")
    assert ed_le1_mask(e, e).tolist() == [True, True, True]
    assert ed_le1_mask(np.array(["", "a"], dtype="U"),
                       np.array(["", ""], dtype="U")).tolist() == \
        [True, True]


def test_edit1_pairs_matches_bruteforce(ray_session, rng):
    """Random short words + planted single-edit variants: the banded
    distributed pairs equal the O(V^2) DP truth exactly."""
    import pyarrow as pa
    import ray.data

    alphabet = np.array(list("abcdef"))
    base = ["".join(rng.choice(alphabet, rng.integers(2, 7)))
            for _ in range(120)]
    planted = []
    for w in base[:40]:
        i = int(rng.integers(0, len(w)))
        planted.append(w[:i] + w[i + 1:])              # deletion
        planted.append(w[:i] + "#" + w[i:])            # insertion
        planted.append(w[:i] + "#" + w[i + 1:])        # substitution
    words = [w for w in base + planted if w]
    # duplicates + nulls + empties must be ignored
    rows = words * 2 + ["", None]
    ds = ray.data.from_arrow(pa.table({"w": pa.array(rows,
                                                     type=pa.string())}))
    got = edit1_pairs(ds, "w", num_shards=8).to_pandas() \
        .sort_values(["w1", "w2"]).reset_index(drop=True)
    vocab = sorted(set(words))
    ref = pd.DataFrame(
        [(a, b) for i, a in enumerate(vocab) for b in vocab[i + 1:]
         if _lev(a, b) == 1], columns=["w1", "w2"])
    pd.testing.assert_frame_equal(got, ref)
    assert len(ref) >= 40  # the plants actually produced pairs


def test_edit1_pairs_rejects_long_values(ray_session):
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({"w": ["ok", "x" * 300]}))
    with pytest.raises(Exception, match="MAX_LEN"):
        edit1_pairs(ds, "w").materialize()
