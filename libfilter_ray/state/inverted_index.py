"""Distributed inverted index over Ray Data: token -> sorted posting
list, persisted as token-hash-BUCKETED parquet so a term lookup reads
exactly one bucket file instead of the whole index.

Build shape (one distributed pass + one bucketed shuffle):
1. map_batches: distinct (token, doc_id) pairs per batch (a document is
   one row, so within-row distinctness is exact), tagged with
   bucket = hash(token) % num_buckets.
2. groupby(bucket).map_groups: each bucket sorts its pairs by
   (token, doc_id) and emits one row per token — (word, df,
   postings list<int64>) — built with run-length offsets, no per-token
   Python. Buckets are hash-random, so skew is bounded by the hottest
   single token (stopword-sized, not corpus-sized; `min_df`/`max_df`
   prune rows before they are written).
3. each bucket row-group lands in its own `bucket=K/` parquet partition
   (the engine's partitioned-sink layout) — resumable and listable.

Query shape: hash the query terms, read ONLY their bucket partitions
(column- and partition-pruned), confirm the token string exactly (the
hash only routes), then intersect/union the sorted posting arrays with
numpy. At 100 TB the index is written once and every AND-query touches
q buckets x one file each, never the corpus.

Reference analogue: this is the engine-native face of the reference's
"build a membership structure once, probe it many times" contract
(SURVEY.md §2.2 HIBP pipeline) with exact postings instead of an
approximate filter.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..sketch.hashing import hash_arrow_array
from ..stages.corpus import _word_lists
from ..stages.dedup import _str

U64 = np.uint64

INDEX_MANIFEST = "index.json"


def _token_doc_pairs(t: pa.Table, column: str, id_column: str):
    """(tokens Arrow array, doc ids ndarray) of the batch's DISTINCT
    (token, doc) pairs — space-split, empties dropped."""
    import pyarrow.compute as pc

    flat, splits = _word_lists(t[column])
    n = len(splits) - 1
    ids = _str(t[id_column]).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if len(flat) == 0:
        return pa.array([], type=pa.string()), np.empty(0, np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
    ne = np.asarray(pc.not_equal(flat, ""), dtype=bool)
    toks = flat.filter(pa.array(ne))
    rows = rows[ne]
    # distinct within batch via (token-hash, row) uniqueness; hash ties
    # only co-locate, exactness comes from the per-bucket string sort
    h = hash_arrow_array(toks)
    key = np.stack([h, rows.view(U64)], axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    first.sort()
    return toks.take(pa.array(first)), ids[rows[first]]


class InvertedIndex:
    """A finished on-disk inverted index. Construct with :meth:`build`
    or attach to an existing directory with ``InvertedIndex(path)``."""

    def __init__(self, path: str):
        import json

        self.path = path
        with open(os.path.join(path, INDEX_MANIFEST)) as fh:
            m = json.load(fh)
        self.num_buckets = int(m["num_buckets"])
        self.n_terms = int(m["n_terms"])

    # -- build ----------------------------------------------------------

    @staticmethod
    def build(ds, column: str, id_column: str, path: str, *,
              num_buckets: int = 64, min_df: int = 1,
              max_df: int | None = None) -> "InvertedIndex":
        """Build the index for `ds[column]` into `path`. Tokens with
        document frequency < `min_df` or > `max_df` (stopword cut) are
        dropped. Returns the attached index."""
        import json

        import ray

        def pairs(t: pa.Table) -> pa.Table:
            toks, ids = _token_doc_pairs(t, column, id_column)
            bucket = (hash_arrow_array(toks) % U64(num_buckets)) \
                .astype(np.int64)
            return pa.table({
                "word": toks,
                "doc": pa.array(ids),
                "bucket": pa.array(bucket),
            })

        os.makedirs(path, exist_ok=True)

        def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
            """Sort the bucket's pairs, build the (word, df, postings)
            table with run-length offsets (zero per-token Python), and
            write it as the bucket's OWN parquet file (tmp + atomic
            rename — the engine's resumable-sink contract). The task
            returns only a one-row summary; posting payloads never ride
            the shuffle back."""
            bucket = int(df["bucket"].iloc[0])
            df = df.sort_values(["word", "doc"], kind="stable")
            words = df["word"].to_numpy()
            docs = df["doc"].to_numpy().astype(np.int64)
            starts = np.flatnonzero(
                np.r_[True, words[1:] != words[:-1]])
            ends = np.r_[starts[1:], len(words)]
            dfreq = (ends - starts).astype(np.int64)
            keep = dfreq >= min_df
            if max_df is not None:
                keep &= dfreq <= max_df
            # postings as one LargeList column over the sorted doc array
            kept_rows = np.repeat(keep, dfreq)
            offsets = np.zeros(int(keep.sum()) + 1, dtype=np.int64)
            np.cumsum(dfreq[keep], out=offsets[1:])
            tbl = pa.table({
                "word": pa.array(words[starts[keep]].astype(object),
                                 type=pa.string()),
                "df": pa.array(dfreq[keep]),
                "postings": pa.LargeListArray.from_arrays(
                    pa.array(offsets),
                    pa.array(docs[kept_rows], type=pa.int64())),
            })
            fname = os.path.join(path, f"bucket={bucket}.parquet")
            pq.write_table(tbl, fname + ".tmp")
            os.replace(fname + ".tmp", fname)
            return pd.DataFrame({"bucket": [bucket],
                                 "n_terms": [int(keep.sum())]})

        summary = ds.map_batches(pairs, batch_format="pyarrow") \
            .groupby("bucket").map_groups(write_bucket,
                                          batch_format="pandas") \
            .to_pandas()
        n_terms = int(summary["n_terms"].sum()) if len(summary) else 0
        with open(os.path.join(path, INDEX_MANIFEST), "w") as fh:
            json.dump({"num_buckets": num_buckets,
                       "n_terms": n_terms}, fh)
        return InvertedIndex(path)

    # -- query ----------------------------------------------------------

    def _bucket_of(self, term: str) -> int:
        return int(hash_arrow_array(pa.array([term])) [0]
                   % U64(self.num_buckets))

    def postings(self, term: str) -> np.ndarray:
        """Sorted int64 doc ids containing `term` (empty if unseen or
        pruned). Reads ONLY the term's bucket file."""
        fname = os.path.join(self.path,
                             f"bucket={self._bucket_of(term)}.parquet")
        if not os.path.exists(fname):
            return np.empty(0, dtype=np.int64)
        t = pq.read_table(fname, columns=["word", "postings"],
                          filters=[("word", "=", term)])
        if t.num_rows == 0:
            return np.empty(0, dtype=np.int64)
        return np.asarray(t["postings"][0].as_py(), dtype=np.int64)

    def search(self, terms, mode: str = "and") -> np.ndarray:
        """Sorted doc ids matching ALL (`and`) or ANY (`or`) terms."""
        if mode not in ("and", "or"):
            raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
        lists = [self.postings(t) for t in terms]
        if not lists:
            return np.empty(0, dtype=np.int64)
        out = lists[0]
        for p in lists[1:]:
            out = (np.intersect1d(out, p) if mode == "and"
                   else np.union1d(out, p))
        return out
