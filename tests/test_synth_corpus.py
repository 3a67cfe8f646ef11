"""Deterministic scale-campaign corpus generator
(sources/synth_corpus.py): shape parity with the driver testdata,
chunk invariance, planted dup/near-dup structure."""
from __future__ import annotations

import numpy as np

from libfilter_ray.sources.synth_corpus import (
    DUP_LAG, DUP_MOD, MAX_WORDS, MIN_WORDS, NEAR_MOD,
    documents_chunk, write_documents,
)


def test_shape_matches_testdata_schema():
    t = documents_chunk(0, 2000)
    assert t.column_names == ["doc_id", "text", "lang", "source",
                              "n_chars"]
    df = t.to_pandas()
    assert (df["n_chars"] == df["text"].str.len()).all()
    w = df["text"].str.split(" ").str.len()
    assert w.min() >= MIN_WORDS and w.max() <= MAX_WORDS
    assert set(df["lang"]) == {"en", "zh", "es", "fr", "de"}
    # en-heavy skew, like the testdata
    assert (df["lang"] == "en").mean() > 0.3
    assert df["source"].str.match(r"src\d+").all()


def test_chunk_invariance():
    whole = documents_chunk(0, 3000).to_pandas()
    parts = [documents_chunk(lo, lo + 700).to_pandas()
             for lo in range(0, 2800, 700)]
    import pandas as pd

    stitched = pd.concat(parts, ignore_index=True)
    pd.testing.assert_frame_equal(whole.iloc[:2800]
                                  .reset_index(drop=True), stitched)


def test_planted_duplicates_and_near_duplicates():
    df = documents_chunk(0, 5000).to_pandas()
    texts = df["text"].tolist()
    n_pairs = 0
    for i in range(DUP_MOD, 5000):
        if (i % DUP_MOD == DUP_MOD - 1 and i % NEAR_MOD
                and (i - DUP_LAG) % NEAR_MOD):
            assert texts[i] == texts[i - DUP_LAG]
            n_pairs += 1
    assert n_pairs > 30
    n_near = 0
    for i in range(NEAR_MOD, 5000, NEAR_MOD):
        if (i - 1) % DUP_MOD == DUP_MOD - 1:
            continue
        a, b = texts[i].split(" "), texts[i - 1].split(" ")
        assert len(a) == len(b)
        assert 1 <= sum(x != y for x, y in zip(a, b)) <= 2
        n_near += 1
    assert n_near > 25


def test_write_documents_resumable(tmp_path):
    import pyarrow.parquet as pq

    d = write_documents(str(tmp_path), 2500, chunk=1000)
    files = sorted(__import__("os").listdir(d))
    assert files == ["part-0000.parquet", "part-0001.parquet",
                     "part-0002.parquet"]
    t = pq.read_table(d)
    assert t.num_rows == 2500
    ids = np.sort(np.asarray(t["doc_id"], dtype=np.int64))
    assert ids.tolist() == list(range(2500))
    # second call skips existing chunks (resumable contract)
    assert write_documents(str(tmp_path), 2500, chunk=1000) == d
