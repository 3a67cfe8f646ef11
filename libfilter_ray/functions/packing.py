"""Sequence packing for training-data prep: assign documents to fixed
token-budget sequences (next-fit in a deterministic order).

Next-fit is inherently a sequential chain, so the kernel advances by BIN
boundaries with searchsorted jumps over the token prefix-sum — O(#bins log n)
instead of a per-document Python loop (the same boundary-jump shape as the
t-digest greedy compressor, sketch/tdigest.py).

Scale posture: packing requires the full ordered token sequence of its
group, so at 10^12-document scale the packing key should be (lang, shard) —
bins then never span shards and groups stay worker-sized; the slight extra
per-shard tail waste is the standard trade. The oracled query packs per
lang at test scale where groups are small.
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
