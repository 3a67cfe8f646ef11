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
    """(tokens Arrow array, doc ids ndarray, tf ndarray) of the batch's
    DISTINCT (token, doc) pairs with their in-document term frequencies
    — space-split, empties dropped."""
    import pyarrow.compute as pc

    flat, splits = _word_lists(t[column])
    n = len(splits) - 1
    ids = _str(t[id_column]).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if len(flat) == 0:
        return (pa.array([], type=pa.string()), np.empty(0, np.int64),
                np.empty(0, np.int64))
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
    ne = np.asarray(pc.not_equal(flat, ""), dtype=bool)
    toks = flat.filter(pa.array(ne))
    rows = rows[ne]
    # distinct within batch via (token-hash, row) uniqueness; hash ties
    # only co-locate, exactness comes from the per-bucket string sort
    h = hash_arrow_array(toks)
    key = np.stack([h, rows.view(U64)], axis=1)
    _, first, tf = np.unique(key, axis=0, return_index=True,
                             return_counts=True)
    order = np.argsort(first, kind="stable")
    first, tf = first[order], tf[order]
    return (toks.take(pa.array(first)), ids[rows[first]],
            tf.astype(np.int64))


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
        self.n_docs = int(m["n_docs"])
        self.total_len = int(m["total_len"])

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
            toks, ids, tf = _token_doc_pairs(t, column, id_column)
            bucket = (hash_arrow_array(toks) % U64(num_buckets)) \
                .astype(np.int64)
            return pa.table({
                "word": toks,
                "doc": pa.array(ids),
                "tf": pa.array(tf),
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
            # postings + tfs as parallel LargeList columns over the
            # (word, doc)-sorted arrays
            tfs = df["tf"].to_numpy().astype(np.int64)
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
                "tfs": pa.LargeListArray.from_arrays(
                    pa.array(offsets),
                    pa.array(tfs[kept_rows], type=pa.int64())),
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

        # doc-length sidecar (BM25 normalization): doc-id-hash-bucketed
        # files, each written by its own task — same resumable layout
        from ..stages.corpus import space_token_counts

        def dlen_rows(t: pa.Table) -> pa.Table:
            ids = _str(t[id_column]).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dlen = space_token_counts(t[column])
            return pa.table({
                "doc": pa.array(ids),
                "dlen": pa.array(dlen, type=pa.int64()),
                "dbucket": pa.array(
                    (ids.view(U64) % U64(num_buckets)).astype(np.int64)),
            })

        def write_dlen_bucket(df: pd.DataFrame) -> pd.DataFrame:
            bucket = int(df["dbucket"].iloc[0])
            df = df.sort_values("doc", kind="stable")
            tbl = pa.table({
                "doc": pa.array(df["doc"].to_numpy().astype(np.int64)),
                "dlen": pa.array(df["dlen"].to_numpy()
                                 .astype(np.int64)),
            })
            fname = os.path.join(path, f"doclen={bucket}.parquet")
            pq.write_table(tbl, fname + ".tmp")
            os.replace(fname + ".tmp", fname)
            return pd.DataFrame({
                "n_docs": [len(df)],
                "total_len": [int(df["dlen"].sum())]})

        dsum = ds.map_batches(dlen_rows, batch_format="pyarrow") \
            .groupby("dbucket").map_groups(write_dlen_bucket,
                                           batch_format="pandas") \
            .to_pandas()
        with open(os.path.join(path, INDEX_MANIFEST), "w") as fh:
            json.dump({
                "num_buckets": num_buckets,
                "n_terms": n_terms,
                "n_docs": int(dsum["n_docs"].sum()) if len(dsum) else 0,
                "total_len": int(dsum["total_len"].sum())
                if len(dsum) else 0,
            }, fh)
        return InvertedIndex(path)

    # -- query ----------------------------------------------------------

    def _bucket_of(self, term: str) -> int:
        return int(hash_arrow_array(pa.array([term])) [0]
                   % U64(self.num_buckets))

    def postings_tf(self, term: str):
        """(sorted doc ids, parallel term frequencies) for `term` —
        (empty, empty) if unseen or pruned. Reads ONLY the term's
        bucket file."""
        fname = os.path.join(self.path,
                             f"bucket={self._bucket_of(term)}.parquet")
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        if not os.path.exists(fname):
            return empty
        t = pq.read_table(fname, columns=["word", "postings", "tfs"],
                          filters=[("word", "=", term)])
        if t.num_rows == 0:
            return empty
        return (np.asarray(t["postings"][0].as_py(), dtype=np.int64),
                np.asarray(t["tfs"][0].as_py(), dtype=np.int64))

    def postings(self, term: str) -> np.ndarray:
        """Sorted int64 doc ids containing `term` (empty if unseen or
        pruned). Reads ONLY the term's bucket file."""
        return self.postings_tf(term)[0]

    def doc_lengths(self, docs: np.ndarray) -> np.ndarray:
        """Token counts of the given doc ids, reading only the doc-id
        buckets the query actually touches. Raises on unknown ids (the
        index and the corpus must agree)."""
        docs = np.ascontiguousarray(docs, dtype=np.int64)
        out = np.zeros(len(docs), dtype=np.int64)
        for b in np.unique(docs.view(U64) % U64(self.num_buckets)):
            fname = os.path.join(self.path, f"doclen={int(b)}.parquet")
            sel = (docs.view(U64) % U64(self.num_buckets)) == b
            if not os.path.exists(fname):
                raise KeyError(f"doc-length bucket {int(b)} missing")
            t = pq.read_table(fname)
            bd = np.asarray(t["doc"], dtype=np.int64)
            bl = np.asarray(t["dlen"], dtype=np.int64)
            idx = np.searchsorted(bd, docs[sel])
            ok = (idx < len(bd)) & (bd[np.minimum(idx, len(bd) - 1)]
                                    == docs[sel])
            if not ok.all():
                raise KeyError("doc id missing from doc-length sidecar")
            out[sel] = bl[idx]
        return out

    def search_bm25(self, terms, k: int = 10, *, k1: float = 1.2,
                    b: float = 0.75):
        """Top-`k` documents by BM25 (Robertson/Lucene idf:
        ln(1 + (N - df + 0.5)/(df + 0.5))), ties broken by doc id
        ascending. Returns (doc ids, scores) ndarrays. Reads one
        postings bucket per term plus the candidate docs' length
        buckets — never the corpus."""
        import math

        N = self.n_docs
        avgdl = (self.total_len / N) if N else 0.0
        per_term = [(t, *self.postings_tf(t)) for t in terms]
        cand = np.unique(np.concatenate(
            [d for _, d, _ in per_term] or
            [np.empty(0, dtype=np.int64)]))
        if not len(cand):
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        dlen = self.doc_lengths(cand).astype(np.float64)
        score = np.zeros(len(cand), dtype=np.float64)
        for _t, docs, tfs in per_term:
            if not len(docs):
                continue
            df = len(docs)
            idf = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
            pos = np.searchsorted(cand, docs)
            tf = tfs.astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * dlen[pos] / avgdl)
            score[pos] += idf * tf * (k1 + 1.0) / denom
        order = np.lexsort((cand, -score))[:k]
        return cand[order], score[order]

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


def merge_indexes(base_path: str, delta_path: str, out_path: str):
    """Merge two bucket-aligned indexes (disjoint doc sets) into
    `out_path` — the incremental-crawl path: index the NEW documents as
    a small delta, then merge per bucket instead of rebuilding over the
    full corpus. One Ray task per bucket id reads base bucket K + delta
    bucket K, merge-sorts the word runs (postings stay doc-sorted
    because doc ids within a word concatenate from two sorted disjoint
    runs re-sorted), and writes out bucket K — O(bucket) memory per
    task, nothing through the driver but per-bucket summaries.
    Raises ValueError on bucket-count mismatch or doc-id overlap."""
    import json

    import ray.data

    base, delta = InvertedIndex(base_path), InvertedIndex(delta_path)
    if base.num_buckets != delta.num_buckets:
        raise ValueError(
            f"bucket counts differ: {base.num_buckets} vs "
            f"{delta.num_buckets} — build the delta with the base's "
            "bucket count")
    nb = base.num_buckets
    os.makedirs(out_path, exist_ok=True)

    def merge_bucket(t: pa.Table) -> pa.Table:
        out_rows = []
        for b in np.asarray(t["bucket"], dtype=np.int64):
            b = int(b)
            parts = []
            for src in (base_path, delta_path):
                f = os.path.join(src, f"bucket={b}.parquet")
                if os.path.exists(f):
                    parts.append(pq.read_table(f))
            n_terms = 0
            if parts:
                # explode both sources back to flat (word, doc, tf)
                # pairs and rebuild with the SAME run-length writer the
                # fresh build uses — vectorized, no per-term Python
                merged = pa.concat_tables(parts)
                dfreq_src = np.asarray(merged["df"], dtype=np.int64)
                word_flat = merged["word"].combine_chunks().take(
                    pa.array(np.repeat(np.arange(len(dfreq_src)),
                                       dfreq_src)))
                pcol = merged["postings"].combine_chunks()
                tcol = merged["tfs"].combine_chunks()
                docs = np.asarray(pcol.flatten(), dtype=np.int64)
                tfs = np.asarray(tcol.flatten(), dtype=np.int64)
                df = pd.DataFrame({
                    "word": np.asarray(word_flat, dtype=object),
                    "doc": docs, "tf": tfs}) \
                    .sort_values(["word", "doc"], kind="stable")
                words = df["word"].to_numpy()
                docs = df["doc"].to_numpy()
                same = (words[1:] == words[:-1]) & \
                    (docs[1:] == docs[:-1]) if len(words) > 1 \
                    else np.zeros(0, dtype=bool)
                if same.any():
                    raise ValueError(
                        "doc-id overlap between base and delta — "
                        "incremental merge needs disjoint corpora")
                starts = np.flatnonzero(
                    np.r_[True, words[1:] != words[:-1]]) \
                    if len(words) else np.empty(0, np.int64)
                ends = np.r_[starts[1:], len(words)] \
                    if len(words) else np.empty(0, np.int64)
                dfreq = (ends - starts).astype(np.int64)
                offsets = np.zeros(len(starts) + 1, dtype=np.int64)
                np.cumsum(dfreq, out=offsets[1:])
                tbl = pa.table({
                    "word": pa.array(words[starts].astype(object)
                                     if len(words) else [],
                                     type=pa.string()),
                    "df": pa.array(dfreq),
                    "postings": pa.LargeListArray.from_arrays(
                        pa.array(offsets),
                        pa.array(docs, type=pa.int64())),
                    "tfs": pa.LargeListArray.from_arrays(
                        pa.array(offsets),
                        pa.array(df["tf"].to_numpy(), type=pa.int64())),
                })
                fname = os.path.join(out_path, f"bucket={b}.parquet")
                pq.write_table(tbl, fname + ".tmp")
                os.replace(fname + ".tmp", fname)
                n_terms = tbl.num_rows
            dparts = []
            for src in (base_path, delta_path):
                f = os.path.join(src, f"doclen={b}.parquet")
                if os.path.exists(f):
                    dparts.append(pq.read_table(f))
            if dparts:
                dl = pa.concat_tables(dparts)
                docs = np.asarray(dl["doc"], dtype=np.int64)
                order = np.argsort(docs, kind="stable")
                if len(docs) > 1:
                    s = docs[order]
                    if (s[1:] == s[:-1]).any():
                        raise ValueError(
                            "doc-id overlap between base and delta")
                tbl = pa.table({
                    "doc": pa.array(docs[order]),
                    "dlen": pa.array(np.asarray(dl["dlen"],
                                                dtype=np.int64)[order]),
                })
                fname = os.path.join(out_path, f"doclen={b}.parquet")
                pq.write_table(tbl, fname + ".tmp")
                os.replace(fname + ".tmp", fname)
            out_rows.append((b, n_terms))
        return pa.table({
            "bucket": pa.array([r[0] for r in out_rows],
                               type=pa.int64()),
            "n_terms": pa.array([r[1] for r in out_rows],
                                type=pa.int64())})

    summary = ray.data.from_arrow(
        pa.table({"bucket": pa.array(np.arange(nb, dtype=np.int64))})) \
        .repartition(min(nb, 16)) \
        .map_batches(merge_bucket, batch_format="pyarrow").to_pandas()
    with open(os.path.join(out_path, INDEX_MANIFEST), "w") as fh:
        json.dump({
            "num_buckets": nb,
            "n_terms": int(summary["n_terms"].sum()),
            "n_docs": base.n_docs + delta.n_docs,
            "total_len": base.total_len + delta.total_len,
        }, fh)
    return InvertedIndex(out_path)
