"""stages/chunk.py — sliding-window document chunking."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_ray.stages.chunk import chunk_documents


def _ref_chunks(texts, window, stride):
    rows = []
    for i, tx in enumerate(texts):
        if tx is None:
            continue
        toks = tx.split(" ")
        L = len(toks)
        n_chunks = (max(L - window, 0) + stride - 1) // stride + 1
        for g in range(n_chunks):
            s, e = g * stride, min(g * stride + window, L)
            rows.append((i, g, " ".join(toks[s:e]), e - s))
    return pd.DataFrame(rows, columns=["doc_id", "chunk_id", "chunk",
                                       "n_tokens"])


def test_chunk_documents_matches_reference(ray_session, rng):
    import pyarrow as pa
    import ray.data

    words = np.array(["alpha", "b", "gamma", "dd", "e"])
    texts = [" ".join(rng.choice(words, rng.integers(1, 40)))
             for _ in range(200)]
    texts += ["", "one", None, "a  b"]  # empty, short, null, empty token
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())})).repartition(4)
    got = chunk_documents(ds, "text", "doc_id", window=8, stride=3) \
        .to_pandas().sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)
    ref = _ref_chunks(texts, 8, 3)
    pd.testing.assert_frame_equal(got, ref)
    assert (got["n_tokens"] <= 8).all()
    assert got.groupby("doc_id")["chunk_id"].max().gt(0).any()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="ab λ", min_size=0, max_size=30),
                min_size=1, max_size=8),
       st.integers(1, 6), st.integers(1, 6))
def test_chunk_documents_property(ray_session, texts, window, stride):
    if stride > window:
        window, stride = stride, window  # the stage requires overlap
    """Any unicode texts, any window/stride: chunks equal the naive
    per-doc reference (incl. multi-space empty tokens)."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))
    got = chunk_documents(ds, "text", "doc_id", window=window,
                          stride=stride).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    ref = _ref_chunks(texts, window, stride)
    pd.testing.assert_frame_equal(got, ref)


def test_chunk_documents_rejects_bad_params(ray_session):
    import ray.data

    ds = ray.data.from_items([{"doc_id": 0, "text": "x"}])
    with pytest.raises(ValueError, match="window"):
        chunk_documents(ds, "text", "doc_id", window=0)
    with pytest.raises(ValueError, match="skip tokens"):
        chunk_documents(ds, "text", "doc_id", window=4, stride=5)


def test_chunk_to_index_composition(tmp_path, ray_session):
    """The retrieval-prep path composes: documents -> sliding-window
    chunks -> inverted index over chunks -> term search returns exactly
    the chunk ids whose text contains the term."""
    import pyarrow as pa
    import ray.data

    from libfilter_ray.state.inverted_index import InvertedIndex

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "text"])
    ds = ray.data.from_pandas(docs).repartition(4)
    chunks = chunk_documents(ds, "text", "doc_id",
                             window=16, stride=8).map_batches(
        lambda t: t.append_column(
            "chunk_uid", pa.array(
                np.asarray(t["doc_id"], dtype=np.int64) * 4096
                + np.asarray(t["chunk_id"], dtype=np.int64))),
        batch_format="pyarrow").materialize()
    idx = InvertedIndex.build(chunks, "chunk", "chunk_uid",
                              str(tmp_path / "ix"), num_buckets=8)
    cdf = chunks.to_pandas()
    for term in ["table", "spark", "customer"]:
        want = np.sort(cdf.loc[
            cdf["chunk"].str.split(" ").map(lambda w: term in w),
            "chunk_uid"].to_numpy(dtype=np.int64))
        got = np.sort(idx.postings(term))
        np.testing.assert_array_equal(got, want)
        assert len(want) > 0
