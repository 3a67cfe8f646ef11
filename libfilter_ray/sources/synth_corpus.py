"""Deterministic documents-table generator for scale-proof campaigns.

The driver testdata tops out at sf0.1 (5k documents); the 100-TB claims
need empirical evidence at 10x+ the bench scale (VERDICT r4 task 1).
This module synthesizes a documents table of EXACTLY the testdata's
shape — columns (doc_id, text, lang, source, n_chars), 5 langs with the
same en-heavy skew, 20 uniform sources, 10-100 words/doc over the same
kind of small query-noun vocabulary, a sprinkle of planted exact
duplicates and near-duplicates — at any row count, fully determined by
doc_id (token t of doc i is VOCAB[splitmix64(i*128 + t)], so any chunk
of the table can be generated independently and the result is identical
under any chunking).

Planted structure (all formula-pure, chunk-independent):
- exact dups: doc i with i % 100 == 99 copies the BASE text of i-50
  (skipped when the donor was itself overridden or when the near-dup
  rule already claimed doc i, so every planted pair is a genuine
  final-text exact pair);
- near dups: doc i with i % 137 == 0 takes doc i-1's base words with
  two fixed substitutions (high-Jaccard planted pair; skipped when the
  donor was overridden; wins lcm collisions with the exact-dup rule).

No external data — pure splitmix64 arithmetic (north rule: synthesize
deterministically at small scale; same generator serves any scale).
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sketch.hashing import splitmix64

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "table", "vector", "window", "shard", "spill", "stream",
    "probe", "build", "block", "page", "crawl", "index", "token",
    "slice", "plan",
], dtype=object)
#: long-tail word types (see _base_words: the low hash bit picks
#: head-vs-tail, so ~50% of tokens are one of 2^16 "wXXXX" types)
N_TAIL = 1 << 16
TAIL_VOCAB = np.array(["w%04x" % i for i in range(N_TAIL)], dtype=object)
#: bump when the text formula changes — write_documents wipes stale shards
GEN_VERSION = 2
LANGS = np.array(["en", "zh", "es", "fr", "de"], dtype=object)
#: cumulative per-cent thresholds mirroring the testdata's ~40/15x4 skew
LANG_CUM = np.array([40, 55, 70, 85, 100], dtype=np.int64)
N_SOURCES = 20
MIN_WORDS, MAX_WORDS = 10, 100
DUP_MOD, DUP_LAG = 100, 50       # i%100==99 copies base(i-50)
NEAR_MOD = 137                   # i%137==0 near-copies base(i-1)
_S_LEN, _S_TOK, _S_LANG, _S_SRC = 0xD0C1, 0xD0C2, 0xD0C3, 0xD0C4


def _base_words(ids: np.ndarray):
    """(lens, flat word object-array) of the BASE (pre-override) texts
    for the given doc ids — the per-doc formula everything derives
    from.

    Token t of doc i hashes once (splitmix64(i*128+t)); the low bit
    picks head (the 40 VOCAB words, ~50% of tokens — the Zipf head that
    keeps heavy-hitter / top-words pipelines meaningful) vs tail (2^16
    deterministic "wXXXX" types). The long tail is what makes random
    documents realistically DISSIMILAR: with a head-only vocabulary two
    unrelated docs share most of their k-gram shingles, so at 10^6 rows
    LSH candidate pair counts grow ~quadratically — nothing like
    Common-Crawl text, where cross-doc Jaccard of non-dups is low and
    pair counts track the planted dup rate."""
    ids = ids.astype(np.uint64)
    lens = (MIN_WORDS + splitmix64(ids, seed=_S_LEN)
            % np.uint64(MAX_WORDS - MIN_WORDS + 1)).astype(np.int64)
    di = np.repeat(ids, lens)
    tp = np.arange(len(di), dtype=np.int64) \
        - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    h = splitmix64(di * np.uint64(128) + tp.astype(np.uint64),
                   seed=_S_TOK)
    hi = (h >> np.uint64(1))
    words = np.where(
        (h & np.uint64(1)) == 0,
        VOCAB[(hi % np.uint64(len(VOCAB))).astype(np.int64)],
        TAIL_VOCAB[(hi % np.uint64(N_TAIL)).astype(np.int64)])
    return lens, words


def _texts_of(ids: np.ndarray) -> np.ndarray:
    """Final text per doc id (base formula + dup/near overrides),
    object-dtype array."""
    ids = ids.astype(np.int64)
    lens, words = _base_words(ids)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    flat = pa.array(words.tolist(), type=pa.string())
    texts = np.asarray(
        pc.binary_join_element_wise(
            pc.binary_join(pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), flat), " "), "", ""),
        dtype=object)
    # near-dup override: i%137==0, donor i-1 formula-pure
    near = np.flatnonzero((ids % NEAR_MOD == 0) & (ids > 0)
                          & ((ids - 1) % DUP_MOD != DUP_MOD - 1))
    if len(near):
        dlens, dwords = _base_words(ids[near] - 1)
        doff = np.concatenate(([0], np.cumsum(dlens)))
        for j, i in enumerate(near):
            w = dwords[doff[j]:doff[j + 1]].tolist()
            w[3 % len(w)] = "dup"
            w[7 % len(w)] = "slow"
            texts[i] = " ".join(w)
    # exact-dup override: i%100==99 copies base(i-50); skip overridden
    # donors so every planted pair is a final-text exact pair, and skip
    # docs the near-dup override already claimed (lcm collisions like
    # i=3699 — near wins, keeping both invariants unconditional)
    dup = np.flatnonzero((ids % DUP_MOD == DUP_MOD - 1)
                         & (ids >= DUP_MOD)
                         & (ids % NEAR_MOD != 0)
                         & ((ids - DUP_LAG) % NEAR_MOD != 0))
    if len(dup):
        dlens, dwords = _base_words(ids[dup] - DUP_LAG)
        doff = np.concatenate(([0], np.cumsum(dlens)))
        for j, i in enumerate(dup):
            texts[i] = " ".join(dwords[doff[j]:doff[j + 1]].tolist())
    return texts


def documents_chunk(lo: int, hi: int) -> pa.Table:
    """Rows lo..hi-1 of the synthetic documents table — identical under
    any chunking (per-doc formula + formula-pure override donors)."""
    ids = np.arange(lo, hi, dtype=np.int64)
    texts = _texts_of(ids)
    u = ids.astype(np.uint64)
    lang = LANGS[np.searchsorted(
        LANG_CUM, (splitmix64(u, seed=_S_LANG) % np.uint64(100))
        .astype(np.int64), side="right")]
    src_i = (splitmix64(u, seed=_S_SRC)
             % np.uint64(N_SOURCES)).astype(np.int64)
    source = np.array([f"src{i}" for i in src_i], dtype=object)
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(texts.tolist(), type=pa.string()),
        "lang": pa.array(lang.tolist(), type=pa.string()),
        "source": pa.array(source.tolist(), type=pa.string()),
        "n_chars": pa.array(n_chars),
    })


def write_documents(out_dir: str, n_docs: int, *,
                    chunk: int = 100_000) -> str:
    """Write `<out_dir>/documents.parquet/part-XXXX.parquet` shards
    (one per `chunk` rows — parallel-readable by ray.data.read_parquet
    as a directory). Returns the documents.parquet directory path."""
    ddir = os.path.join(out_dir, "documents.parquet")
    os.makedirs(ddir, exist_ok=True)
    ver_path = ddir + ".genver"
    try:
        stale = open(ver_path).read().strip() != str(GEN_VERSION)
    except OSError:
        stale = True
    if stale:
        for f in os.listdir(ddir):
            if f.endswith(".parquet"):
                os.unlink(os.path.join(ddir, f))
        with open(ver_path, "w") as f:
            f.write(str(GEN_VERSION))
    for k, lo in enumerate(range(0, n_docs, chunk)):
        path = os.path.join(ddir, f"part-{k:04d}.parquet")
        if os.path.exists(path):
            continue  # resumable: chunks are deterministic
        pq.write_table(documents_chunk(lo, min(lo + chunk, n_docs)),
                       path, row_group_size=50_000)
    return ddir
