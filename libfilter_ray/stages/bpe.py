"""Distributed BPE tokenizer training — merge learning over a corpus.

Training-data pipelines train their tokenizer on the corpus they curate
(Sennrich et al. 2016, the byte-pair-encoding merge procedure every
GPT/Llama-family tokenizer descends from). The expensive part at corpus
scale is the per-round symbol-pair count: this module keeps the
word-frequency table a DATASET end to end — each merge round is one
vectorized pair-count map_batches + a (l, r) groupby-sum shuffle + a
per-block partial top-1 (the driver sees ≤ num_blocks candidate rows
per round, never the pair table), then a vectorized merge-apply
map_batches. The learned merge list (K rows) is the only driver state.

Exact semantics (shared bit-for-bit with the SQL oracle and the local
reference): words come from the corpus convention `text.split(' ')`
minus empties, weighted by corpus frequency; symbols start as Unicode
code points (DuckDB `string_split(w, '')` splits identically); each
round picks the pair maximizing (count DESC, left ASC, right ASC) and
applies it greedily LEFT-TO-RIGHT — within a run of overlapping matches
(only possible when left == right, e.g. `aaaa` under (a, a)) merges
land at even run offsets. That run-parity rule is what makes one round
expressible as pure window functions in SQL.

Scale notes: the word table is O(distinct corpus words) and stays
distributed (pair partials per block collapse to distinct pairs before
the shuffle); pass `min_count` to prune the long typo tail first —
standard practice, documented as changing which rare pairs can win.
Like every iterative-dataflow loop here (see graph.py), each round
re-consumes the word table twice, so it re-checkpoints (materialize)
and re-packs (repartition) per round.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pairs_of(syms: np.ndarray, word_of: np.ndarray):
    """(l, r, at) for adjacent symbol pairs within the same word, over
    the flattened symbol array."""
    same = word_of[:-1] == word_of[1:]
    at = np.flatnonzero(same)
    return syms[at], syms[at + 1], at


def _greedy_take(match_idx: np.ndarray) -> np.ndarray:
    """Greedy left-to-right selection over sorted match positions:
    within each run of CONSECUTIVE indices, keep even run offsets."""
    if len(match_idx) == 0:
        return match_idx
    run_start = np.concatenate([[True],
                                np.diff(match_idx) > 1])
    run_id = np.cumsum(run_start) - 1
    arange = np.arange(len(match_idx), dtype=np.int64)
    first_of_run = arange[run_start]  # run_start positions, in order
    ordinal = arange - first_of_run[run_id]
    return match_idx[ordinal % 2 == 0]


def _apply_merge_flat(syms: np.ndarray, word_of: np.ndarray,
                      left: str, right: str):
    """One merge round over the flattened (syms, word_of) arrays."""
    l, r, at = _pairs_of(syms, word_of)
    match = at[(l == left) & (r == right)]
    take = _greedy_take(match)
    if len(take) == 0:
        return syms, word_of
    out = syms.copy()
    out[take] = left + right
    keep = np.ones(len(syms), dtype=bool)
    keep[take + 1] = False
    return out[keep], word_of[keep]


def _flatten(table: pa.Table):
    """(syms, word_of, counts) numpy views of a (syms: list<str>,
    cnt: int64) batch."""
    col = table["syms"].combine_chunks() \
        if isinstance(table["syms"], pa.ChunkedArray) else table["syms"]
    if isinstance(col, pa.ChunkedArray):  # zero-chunk edge
        col = pa.concat_arrays(col.chunks or
                               [pa.array([], type=col.type)])
    offsets = np.asarray(col.offsets, dtype=np.int64)
    # a sliced ListArray keeps absolute offsets into the full values
    # buffer — normalize so flat[0] is the first symbol of word 0
    flat = np.asarray(col.values, dtype=object)[offsets[0]:offsets[-1]]
    offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    word_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    cnt = np.asarray(table["cnt"], dtype=np.int64)
    return flat, word_of, lens, cnt


def _rebuild(table: pa.Table, syms: np.ndarray,
             word_of: np.ndarray) -> pa.Table:
    lens = np.bincount(word_of, minlength=table.num_rows) \
        .astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    col = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(syms.tolist(), type=pa.string()))  # object-safe, no
        # U-dtype round trip (would truncate NULs / pad to max width)
    return pa.table({"syms": col, "cnt": table["cnt"]})


def build_word_table(docs_ds, *, text_col: str = "text",
                     min_count: int = 1, num_shards: int = 16):
    """(syms: list<str>, cnt) Dataset of distinct corpus words split to
    code points — per-batch np.unique partials, one vocab-sized
    groupby-sum shuffle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def word_partial(t: pa.Table) -> pa.Table:
        col = t[text_col].combine_chunks() \
            if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        lists = pc.split_pattern(col, " ")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        words, counts = np.unique(np.asarray(flat), return_counts=True)
        return pa.table({"word": pa.array(words.tolist(),
                                          type=pa.string()),
                         "cnt": pa.array(counts, type=pa.int64())})

    words = docs_ds.map_batches(word_partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
    if min_count > 1:
        words = words.filter(expr=f"cnt >= {min_count}")

    def to_syms(t: pa.Table) -> pa.Table:
        ws = np.asarray(t["word"], dtype=object)
        seqs = [list(w) for w in ws]  # code-point split (matches
        # DuckDB string_split(w, '')); per-word Python is the honest
        # cost of ragged unicode segmentation, vectorized downstream
        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat = [c for s in seqs for c in s]
        col = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(flat, type=pa.string()))
        return pa.table({"syms": col, "cnt": t["cnt"]})

    return words.map_batches(to_syms, batch_format="pyarrow") \
        .repartition(num_shards)


def learn_bpe_merges(docs_ds, *, k: int = 3, text_col: str = "text",
                     min_count: int = 1, num_shards: int = 16):
    """pandas frame (merge_rank, left, right, pair_n) of the first `k`
    learned merges. One pair-count shuffle + one partial-top-1 collect
    (≤ blocks rows) + one merge-apply pass per round; the word table
    never reaches the driver."""
    import pandas as pd
    from ray.data.aggregate import Sum

    words = build_word_table(docs_ds, text_col=text_col,
                             min_count=min_count,
                             num_shards=num_shards)

    def pair_partial(t: pa.Table) -> pa.Table:
        syms, word_of, lens, cnt = _flatten(t)
        l, r, at = _pairs_of(syms, word_of)
        if len(at) == 0:
            return pa.table({"l": pa.array([], type=pa.string()),
                             "r": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        w = cnt[word_of[at]]
        # factorize each side separately, then pair via integer codes —
        # NO U-dtype conversion anywhere (numpy U truncates trailing
        # NULs, collapsing distinct symbols, and pads every element to
        # the longest symbol's width)
        ul, il = np.unique(l, return_inverse=True)
        ur, ir = np.unique(r, return_inverse=True)
        code = il.astype(np.int64) * len(ur) + ir
        ucode, inv = np.unique(code, return_inverse=True)
        n = np.bincount(inv, weights=w.astype(np.float64)) \
            .astype(np.int64)  # counts < 2^53: float64 path is exact
        return pa.table({"l": pa.array(ul[ucode // len(ur)].tolist(),
                                       type=pa.string()),
                         "r": pa.array(ur[ucode % len(ur)].tolist(),
                                       type=pa.string()),
                         "n": pa.array(n)})

    def block_top1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas()
        df = df.sort_values(["n", "l", "r"],
                            ascending=[False, True, True]).head(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    merges = []
    for rank in range(k):
        words = words.materialize()  # consumed twice per round
        cand = words.map_batches(pair_partial, batch_format="pyarrow") \
            .groupby(["l", "r"]).aggregate(Sum("n", alias_name="n")) \
            .map_batches(block_top1, batch_format="pyarrow").to_pandas()
        if not len(cand):
            break
        best = cand.sort_values(["n", "l", "r"],
                                ascending=[False, True, True]).iloc[0]
        left, right, n = str(best["l"]), str(best["r"]), int(best["n"])
        merges.append({"merge_rank": rank, "left": left,
                       "right": right, "pair_n": n})

        def apply(t: pa.Table, left=left, right=right) -> pa.Table:
            syms, word_of, _, _ = _flatten(t)
            syms, word_of = _apply_merge_flat(syms, word_of, left, right)
            return _rebuild(t, syms, word_of)

        words = words.map_batches(apply, batch_format="pyarrow") \
            .repartition(num_shards)

    out = pd.DataFrame(merges,
                       columns=["merge_rank", "left", "right", "pair_n"])
    for c in ("merge_rank", "pair_n"):
        out[c] = out[c].astype("int64")
    return out


def token_stats_after_merges(docs_ds, merges, *, text_col: str = "text",
                             group_col: str = "lang"):
    """Tokenizer APPLICATION: segment the corpus with an already-learned
    merge list and count tokens — the operator behind every token-budget
    decision. `merges` is a small ordered [(left, right), ...] list
    (driver state, broadcast by closure); each batch segments its OWN
    distinct words (np.unique collapses repeats before the per-word
    split) with the same vectorized run-parity merge-apply the trainer
    uses, so train and apply can never drift. One streaming pass + a
    group-sized groupby — no other shuffle.

    Returns a pandas frame (group_col, n_words, n_tokens)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    merges = [(str(a), str(b)) for a, b in merges]

    def stats(t: pa.Table) -> pa.Table:
        col = t[text_col].combine_chunks() \
            if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        # null text = zero words (what the trainer's list_flatten and
        # SQL's unnest(string_split(NULL)) both do) — without this,
        # list_value_length(null) becomes INT64_MIN under np.asarray
        # and np.repeat raises on the negative count
        col = pc.fill_null(col, "")
        lists = pc.split_pattern(col, " ")
        flat = pc.list_flatten(lists)
        doc_lens = np.asarray(pc.list_value_length(lists),
                              dtype=np.int64)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                           doc_lens)
        words = np.asarray(flat, dtype=object)
        keep = words != ""
        words, doc_of = words[keep], doc_of[keep]
        # object-dtype unique: numpy U-dtype would truncate trailing
        # NULs (collapsing distinct words) and pad every occurrence to
        # the longest word's width
        uniq, inv = np.unique(words, return_inverse=True)
        seqs = [list(w) for w in uniq]  # code-point split, as training
        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        syms = np.array([c for s in seqs for c in s], dtype=object)
        word_of = np.repeat(np.arange(len(uniq), dtype=np.int64), lens)
        for a, b in merges:
            syms, word_of = _apply_merge_flat(syms, word_of, a, b)
        nsym = np.bincount(word_of, minlength=len(uniq)) \
            .astype(np.int64)
        tok_per_doc = np.bincount(doc_of, weights=nsym[inv]
                                  .astype(np.float64),
                                  minlength=t.num_rows).astype(np.int64)
        wrd_per_doc = np.bincount(doc_of, minlength=t.num_rows) \
            .astype(np.int64)
        return pa.table({
            group_col: t[group_col],
            "n_words": pa.array(wrd_per_doc),
            "n_tokens": pa.array(tok_per_doc),
        })

    out = docs_ds.map_batches(stats, batch_format="pyarrow") \
        .groupby(group_col).aggregate(
            Sum("n_words", alias_name="n_words"),
            Sum("n_tokens", alias_name="n_tokens")) \
        .to_pandas().sort_values(group_col).reset_index(drop=True)
    for c in ("n_words", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out


#: first line of merges.txt — the version header the standard loaders
#: (GPT-2 encoder.py lineage, HF tokenizers) expect and skip
BPE_MERGES_HEADER = "#version: 0.2"


def _check_writable_symbols(symbols) -> None:
    """merges.txt is space-and-newline delimited, so a symbol containing
    either is unrepresentable. Words come from text.split(' ') here, so
    this never fires for trained merges — it guards hand-built lists."""
    for s in symbols:
        if " " in s or "\n" in s or "\r" in s:
            raise ValueError(
                f"symbol {s!r} contains whitespace — not representable "
                "in the merges.txt format (this trainer's symbols come "
                "from space-split words and never do; byte-level "
                "pretokenizers are how real tokenizers lift this)")


def bpe_alphabet(docs_ds, *, text_col: str = "text") -> list[str]:
    """Sorted distinct base symbols (code points of space-split words)
    — the vocab.json seed rows. One streaming pass of per-batch char
    uniques + an alphabet-sized groupby; the driver sees only the
    distinct characters."""
    import pyarrow.compute as pc

    def chars(t: pa.Table) -> pa.Table:
        col = t[text_col].combine_chunks() \
            if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        col = pc.fill_null(col, "")
        flat = np.asarray(pc.list_flatten(pc.split_pattern(col, " ")),
                          dtype=object)
        u = np.unique(np.array([c for w in flat for c in w],
                               dtype=object))
        return pa.table({"sym": pa.array(u.tolist(), type=pa.string())})

    out = docs_ds.map_batches(chars, batch_format="pyarrow") \
        .groupby("sym").count().to_pandas()
    return sorted(out["sym"].astype(str).tolist())


def save_bpe_artifacts(out_dir: str, merges, alphabet) -> tuple[str, str]:
    """Write the learned tokenizer as the standard two-file layout:
    ``merges.txt`` (version header + one ``left right`` line per merge,
    learned order) and ``vocab.json`` (token -> id; base alphabet
    sorted first, then each merge's joined token in merge order — the
    rank layout real BPE loaders reconstruct ids from). `merges` is an
    ordered [(left, right), ...] (or the learn_bpe_merges frame).
    Returns (merges_path, vocab_path)."""
    import json
    import os

    if hasattr(merges, "itertuples"):  # learn_bpe_merges frame
        merges = [(str(r.left), str(r.right))
                  for r in merges.itertuples()]
    merges = [(str(a), str(b)) for a, b in merges]
    alpha = sorted({str(s) for s in alphabet})
    _check_writable_symbols([s for ab in merges for s in ab])
    _check_writable_symbols(alpha)
    os.makedirs(out_dir, exist_ok=True)
    mpath = os.path.join(out_dir, "merges.txt")
    with open(mpath, "w", encoding="utf-8") as f:
        f.write(BPE_MERGES_HEADER + "\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    vocab: dict[str, int] = {}
    for s in alpha:
        vocab.setdefault(s, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vpath = os.path.join(out_dir, "vocab.json")
    with open(vpath, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=0)
    return mpath, vpath


def load_bpe_artifacts(in_dir: str):
    """(merges, vocab) back from `save_bpe_artifacts`'s layout — or any
    other producer of the standard two files. Merge lines split on the
    single space the format guarantees; blank and header lines skip."""
    import json
    import os

    merges: list[tuple[str, str]] = []
    with open(os.path.join(in_dir, "merges.txt"),
              encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, _, b = line.partition(" ")
            if not _:
                raise ValueError(f"malformed merges.txt line {line!r}")
            merges.append((a, b))
    with open(os.path.join(in_dir, "vocab.json"),
              encoding="utf-8") as f:
        vocab = {str(k): int(v) for k, v in json.load(f).items()}
    return merges, vocab


def segment_words(words, merges) -> list[list[str]]:
    """Segment `words` (list of space-free strings) with an ordered
    merge list — the same vectorized run-parity merge-apply the trainer
    and token_stats_after_merges use, so a save/load cycle provably
    cannot drift from training-time segmentation."""
    words = [str(w) for w in words]
    seqs = [list(w) for w in words]
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    syms = np.array([c for s in seqs for c in s], dtype=object)
    word_of = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    for a, b in merges:
        syms, word_of = _apply_merge_flat(syms, word_of, str(a), str(b))
    out: list[list[str]] = [[] for _ in words]
    for s, w in zip(syms.tolist(), word_of.tolist()):
        out[w].append(s)
    return out


def bpe_reference(texts, counts=None, *, k: int = 3):
    """Pure-Python reference (same semantics) for tests: texts is an
    iterable of document strings."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    words = {w: list(w) for w in wc}
    merges = []
    for rank in range(k):
        pairs = Counter()
        for w, syms in words.items():
            c = wc[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append({"merge_rank": rank, "left": a, "right": b,
                       "pair_n": n})
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges
