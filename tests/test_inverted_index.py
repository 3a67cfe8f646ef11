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


def test_bm25_matches_bruteforce(tmp_path, ray_session):
    import math

    import ray.data

    from libfilter_ray.state.inverted_index import InvertedIndex

    df = _corpus(100, seed=41)
    # one empty doc: contributes to N but can never be a candidate
    df.loc[len(df)] = {"doc_id": np.int64(10_001), "text": ""}
    ds = ray.data.from_pandas(df).repartition(4)
    idx = InvertedIndex.build(ds, "text", "doc_id",
                              str(tmp_path / "ix"), num_buckets=8)
    assert idx.n_docs == len(df)

    terms = ["data", "key"]
    k1, b = 1.2, 0.75
    N = len(df)
    dlens = {r.doc_id: len([w for w in r.text.split(" ") if w])
             for r in df.itertuples()}
    avgdl = sum(dlens.values()) / N
    want = {}
    for t in terms:
        docs = [r.doc_id for r in df.itertuples()
                if t in r.text.split(" ")]
        idf = math.log(1 + (N - len(docs) + 0.5) / (len(docs) + 0.5))
        for d in docs:
            tf = df.set_index("doc_id").loc[d, "text"].split(" ").count(t)
            want[d] = want.get(d, 0.0) + idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dlens[d] / avgdl))
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    ids, scores = idx.search_bm25(terms, k=10, k1=k1, b=b)
    assert list(ids) == [d for d, _ in top]
    for got, (_, w) in zip(scores, top):
        assert abs(got - w) < 1e-12
    # doc lengths round-trip, including the empty doc
    np.testing.assert_array_equal(
        idx.doc_lengths(np.array([10_001], dtype=np.int64)), [0])
    with pytest.raises(KeyError):
        idx.doc_lengths(np.array([999_999], dtype=np.int64))


def test_index_build_never_collects_postings(tmp_path, ray_session,
                                             monkeypatch):
    """Scale guard (the dedup/crawl-family spy): InvertedIndex.build may
    collect only per-bucket summary rows (and the doc-length summary) —
    posting payloads must go straight from bucket tasks to parquet."""
    import ray.data

    from libfilter_ray.state.inverted_index import InvertedIndex

    df = _corpus(4000, seed=7)
    ds = ray.data.from_pandas(df).repartition(8)

    collected: list[int] = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        collected.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    idx = InvertedIndex.build(ds, "text", "doc_id",
                              str(tmp_path / "ix"), num_buckets=16)
    assert idx.n_docs == len(df)
    assert collected, "spy never fired"
    # summaries only: <= num_buckets rows per collect, never corpus-size
    assert max(collected) <= 16, collected


def test_incremental_merge_equals_full_build(tmp_path, ray_session):
    import ray.data

    from libfilter_ray.state.inverted_index import (InvertedIndex,
                                                    merge_indexes)

    df = _corpus(160, seed=31)
    a, b = df.iloc[:100], df.iloc[100:]
    full = InvertedIndex.build(ray.data.from_pandas(df).repartition(4),
                               "text", "doc_id", str(tmp_path / "full"),
                               num_buckets=8)
    base = InvertedIndex.build(ray.data.from_pandas(a).repartition(3),
                               "text", "doc_id", str(tmp_path / "a"),
                               num_buckets=8)
    delta = InvertedIndex.build(ray.data.from_pandas(b).repartition(2),
                                "text", "doc_id", str(tmp_path / "b"),
                                num_buckets=8)
    merged = merge_indexes(str(tmp_path / "a"), str(tmp_path / "b"),
                           str(tmp_path / "m"))
    assert merged.n_docs == full.n_docs
    assert merged.total_len == full.total_len
    assert merged.n_terms == full.n_terms
    for term in _brute_postings(df):
        np.testing.assert_array_equal(merged.postings(term),
                                      full.postings(term))
        np.testing.assert_array_equal(*[
            ix.postings_tf(term)[1] for ix in (merged, full)])
    # BM25 identical too (manifest totals + doclens merged)
    ids_m, sc_m = merged.search_bm25(["data", "query"], k=10)
    ids_f, sc_f = full.search_bm25(["data", "query"], k=10)
    np.testing.assert_array_equal(ids_m, ids_f)
    np.testing.assert_allclose(sc_m, sc_f, atol=1e-12)

    # overlap rejected
    import pytest

    with pytest.raises(Exception, match="overlap"):
        merge_indexes(str(tmp_path / "a"), str(tmp_path / "a"),
                      str(tmp_path / "bad"))
    # bucket-count mismatch rejected
    other = InvertedIndex.build(ray.data.from_pandas(b), "text",
                                "doc_id", str(tmp_path / "b4"),
                                num_buckets=4)
    with pytest.raises(ValueError, match="bucket counts"):
        merge_indexes(str(tmp_path / "a"), str(tmp_path / "b4"),
                      str(tmp_path / "bad2"))
