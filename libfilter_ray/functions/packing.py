"""Sequence packing for training-data prep: assign documents to fixed
token-budget sequences (next-fit in a deterministic order).

Next-fit is inherently a sequential chain, so the kernel advances by BIN
boundaries with searchsorted jumps over the token prefix-sum — O(#bins log n)
instead of a per-document Python loop (the same boundary-jump shape as the
t-digest greedy compressor, sketch/tdigest.py).

Scale posture: packing requires the full ordered token sequence of its
group, so at 10^12-document scale the packing key is (lang, shard) with
shard = doc_id // rows_per_shard — contiguous id RANGES, so document order
is preserved within every shard, bins never span shards, and no task ever
holds more than rows_per_shard docs (`pack_stats_grouped_ds`). The cost is
bounded: next-fit with forced breaks at shard boundaries uses at most
(shards-1) extra sequences per group (cut the sequential packing at each
boundary — still a valid per-shard interval partition — and per-shard
greedy maximal-prefix is optimal), so extra waste <= (shards-1) * budget.
The per-lang form is the rows_per_shard=None special case.
"""

from __future__ import annotations

import numpy as np


def next_fit_pack(tokens: np.ndarray, budget: int) -> np.ndarray:
    """0-based sequence id per document under next-fit packing in the given
    order: a doc joins the current sequence iff fill + tokens <= budget,
    else it starts a new one (an oversize doc occupies its own sequence).
    Equivalent maximal-prefix form: each sequence takes the longest run of
    consecutive docs whose token sum fits the budget."""
    tokens = np.ascontiguousarray(tokens, dtype=np.int64)
    if (tokens < 0).any():
        raise ValueError("negative token counts")
    n = len(tokens)
    seq = np.empty(n, dtype=np.int64)
    cs = np.concatenate([[0], np.cumsum(tokens)])
    s, b = 0, 0
    while s < n:
        e = int(np.searchsorted(cs, cs[s] + budget, side="right")) - 1
        e = max(e, s + 1)  # oversize doc: its own sequence
        seq[s:e] = b
        b += 1
        s = e
    return seq


def pack_stats_grouped_ds(ds, *, group_col: str, id_column: str,
                          tokens_col: str, budget: int,
                          rows_per_shard: int | None = None):
    """Per-group next-fit packing stats over a (group, id, n_tokens)
    Dataset: one row per group with n_docs / n_seqs / total_tokens /
    wasted_tokens. With `rows_per_shard`, documents pack per
    (group, id_column // rows_per_shard) — contiguous id ranges, order
    preserved within shards, <= rows_per_shard docs per task — and the
    per-shard partials SUM per group (waste is additive over shards).
    rows_per_shard=None packs each group whole (test-scale / oracle
    form)."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def add_shard(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_column], dtype=np.int64)
        shard = np.zeros(len(ids), dtype=np.int64) \
            if rows_per_shard is None else ids // rows_per_shard
        return t.append_column("_pshard", pa.array(shard))

    def pack_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_column, kind="stable")
        st = pack_stats(df[tokens_col].to_numpy(), budget)
        return pd.DataFrame([{group_col: df[group_col].iloc[0], **st}])

    return ds.map_batches(add_shard, batch_format="pyarrow") \
        .groupby([group_col, "_pshard"]) \
        .map_groups(pack_group, batch_format="pandas") \
        .groupby(group_col).aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_seqs", alias_name="n_seqs"),
            Sum("total_tokens", alias_name="total_tokens"),
            Sum("wasted_tokens", alias_name="wasted_tokens"))


def pack_stats(tokens: np.ndarray, budget: int) -> dict[str, int]:
    """(n_docs, n_seqs, total_tokens, wasted_tokens) for one ordered group;
    waste per sequence = max(0, budget - fill)."""
    seq = next_fit_pack(tokens, budget)
    n_seqs = int(seq[-1]) + 1 if len(seq) else 0
    fills = np.bincount(seq, weights=tokens, minlength=n_seqs) \
        .astype(np.int64) if n_seqs else np.empty(0, dtype=np.int64)
    return {"n_docs": len(tokens), "n_seqs": n_seqs,
            "total_tokens": int(tokens.sum()) if len(tokens) else 0,
            "wasted_tokens": int(np.maximum(0, budget - fills).sum())}
