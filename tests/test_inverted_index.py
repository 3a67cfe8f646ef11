"""Token-hash-bucketed inverted index (state/inverted_index.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _corpus(n=120, seed=23):
    rng = np.random.default_rng(seed)
    vocab = ["data", "engine", "fast", "key", "the", "block", "query"]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64) * 7,  # non-contiguous ids
        "text": [" ".join(rng.choice(vocab, size=12)) for _ in range(n)],
    })


def _brute_postings(df):
    out = {}
    for r in df.itertuples():
        for w in set(x for x in r.text.split(" ") if x):
            out.setdefault(w, []).append(r.doc_id)
    return {w: np.array(sorted(v), dtype=np.int64)
            for w, v in out.items()}


def test_index_matches_bruteforce(tmp_path, ray_session):
    import ray.data

    from libfilter_ray.state.inverted_index import InvertedIndex

    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(5)
    idx = InvertedIndex.build(ds, "text", "doc_id", str(tmp_path / "ix"),
                              num_buckets=8)
    want = _brute_postings(df)
    assert idx.n_terms == len(want)
    for w, plist in want.items():
        np.testing.assert_array_equal(idx.postings(w), plist)
    assert len(idx.postings("unseen-token")) == 0
    # AND/OR against set algebra
    a, b = "data", "query"
    np.testing.assert_array_equal(
        idx.search([a, b]),
        np.intersect1d(want[a], want[b]))
    np.testing.assert_array_equal(
        idx.search([a, b], mode="or"),
        np.union1d(want[a], want[b]))
    with pytest.raises(ValueError, match="mode"):
        idx.search([a], mode="xor")


def test_index_df_pruning_and_reattach(tmp_path, ray_session):
    import ray.data

    from libfilter_ray.state.inverted_index import InvertedIndex

    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": (["stop common word"] * 9) + ["rare common word"],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    idx = InvertedIndex.build(ds, "text", "doc_id",
                              str(tmp_path / "ix"), num_buckets=4,
                              min_df=2, max_df=9)
    # "rare" (df=1) pruned by min_df; "common"/"word" (df=10) by max_df
    assert len(idx.postings("rare")) == 0
    assert len(idx.postings("common")) == 0
    np.testing.assert_array_equal(idx.postings("stop"),
                                  np.arange(9, dtype=np.int64))
    # reattach from disk sees the same index
    again = InvertedIndex(str(tmp_path / "ix"))
    assert again.n_terms == idx.n_terms == 1
    np.testing.assert_array_equal(again.postings("stop"),
                                  idx.postings("stop"))
