"""Vectorized text analysis for web-scale training-data pipelines:
token counting, quality scoring, n-gram language ID, content fingerprints.

All kernels are pyarrow.compute / numpy over whole batches — no per-row
Python in any hot path. Stateless by design (pure functions of the batch) so
they run in `map_batches` task pools at any parallelism; regex patterns are
module-level constants compiled once per worker process by Arrow's re2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketch.hashing import hash_arrow_array
from .shingles import winnow_fingerprints

# BPE-ish pre-tokenizer (GPT-2 style, re2-compatible subset — no lookahead):
# contractions | letter runs | digit runs | punctuation runs.
BPE_ISH = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-zÀ-ÖØ-öø-ÿ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ÖØ-öø-ÿ0-9]+"
WHITESPACE_TOKEN = r"\S+"
PUNCT = r"[.,!?;:]"

# Tiny per-language marker profiles (common-word n-gram heuristic — the
# classic stopword-profile language identifier, cf. Cavnar & Trenkle 1994).
# Patterns are whole-word, case-insensitive, re2-safe.
LANG_MARKERS: dict[str, str] = {
    "en": r"(?i)\b(the|and|of|to|is|in|that|for|with|was)\b",
    "de": r"(?i)\b(der|die|das|und|ist|nicht|ein|eine|mit|von|zu)\b",
    "es": r"(?i)\b(el|la|los|las|es|y|en|que|de|un|una|por)\b",
    "fr": r"(?i)\b(le|la|les|est|et|en|que|de|un|une|pour|dans)\b",
    # zh: CJK unified ideograph presence (character-class, not words)
    "zh": r"[\x{4e00}-\x{9fff}]",
}


def _str(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null text counts as empty — RE2 kernels return null for null input,
    # which would otherwise poison the int casts downstream
    return pc.fill_null(col, "") if col.null_count else col


def token_counts(col, pattern: str = WHITESPACE_TOKEN) -> np.ndarray:
    """Tokens per row (vectorized regex count; default whitespace tokens)."""
    return np.asarray(pc.count_substring_regex(_str(col), pattern),
                      dtype=np.int64)


def bpe_ish_token_counts(col) -> np.ndarray:
    return token_counts(col, BPE_ISH)


def _marker_counts(arr: pa.Array) -> dict[str, np.ndarray]:
    """One regex-count pass per language profile — computed ONCE per batch
    and shared by quality_stats and lang_id (they used to each run their
    own copies of the same five passes)."""
    return {lang: np.asarray(pc.count_substring_regex(arr, pat),
                             dtype=np.float64)
            for lang, pat in LANG_MARKERS.items()}


def quality_stats(col, *, marker_counts: dict | None = None,
                  n_tokens: np.ndarray | None = None) -> dict[str, np.ndarray]:
    """Per-row quality signals: n_chars, n_tokens, mean_token_len,
    punct_ratio, stopword_ratio, quality_score ∈ [0,1].

    The composite score mirrors common pretraining-corpus filters (Gopher/C4
    style rules): penalize very short docs, low stopword density (non-text),
    and punctuation floods. Pass precomputed `marker_counts` /
    `n_tokens` to share the regex passes with lang_id (text_stats_stage).
    """
    arr = _str(col)
    n_chars = np.asarray(pc.utf8_length(arr), dtype=np.float64)
    if n_tokens is None:
        n_tokens = token_counts(arr).astype(np.float64)
    n_tokens = n_tokens.astype(np.float64)
    n_punct = np.asarray(pc.count_substring_regex(arr, PUNCT),
                         dtype=np.float64)
    mc = marker_counts if marker_counts is not None else _marker_counts(arr)
    n_stop = mc["en"] + mc["de"] + mc["es"] + mc["fr"]
    safe_tok = np.maximum(n_tokens, 1.0)
    mean_token_len = np.where(n_tokens > 0, n_chars / safe_tok, 0.0)
    punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
    stop_ratio = n_stop / safe_tok
    has_cjk = mc["zh"] > 0
    length_term = np.clip(n_tokens / 50.0, 0.0, 1.0)
    stop_term = np.clip(np.where(has_cjk, 1.0, stop_ratio / 0.2), 0.0, 1.0)
    punct_term = np.clip(1.0 - punct_ratio / 0.3, 0.0, 1.0)
    wordlen_term = np.clip(1.0 - np.abs(mean_token_len - 5.5) / 10.0, 0.0, 1.0)
    score = (0.35 * length_term + 0.30 * stop_term + 0.20 * punct_term
             + 0.15 * wordlen_term)
    return {
        "n_chars": n_chars.astype(np.int64),
        "n_tokens": n_tokens.astype(np.int64),
        "mean_token_len": mean_token_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def lang_id(col, *, marker_counts: dict | None = None,
            n_tokens: np.ndarray | None = None) -> pa.Array:
    """Predicted language code per row (marker-profile argmax; 'und' when no
    profile fires). Vectorized: one regex-count pass per language (shared
    with quality_stats via `marker_counts` when both run on a batch)."""
    arr = _str(col)
    langs = list(LANG_MARKERS)
    if n_tokens is None:
        n_tokens = token_counts(arr).astype(np.float64)
    n_tokens = np.maximum(n_tokens.astype(np.float64), 1.0)
    mc = marker_counts if marker_counts is not None else _marker_counts(arr)
    scores = np.empty((len(arr), len(langs)), dtype=np.float64)
    for j, lang in enumerate(langs):
        c = mc[lang]
        # zh matches count characters, not words — normalize by chars
        if lang == "zh":
            n_chars = np.maximum(
                np.asarray(pc.utf8_length(arr), dtype=np.float64), 1.0)
            scores[:, j] = c / n_chars * 3.0
        else:
            scores[:, j] = c / n_tokens
    best = np.argmax(scores, axis=1)
    hit = scores[np.arange(len(arr)), best] > 0
    out = np.array(langs, dtype=object)[best]
    out[~hit] = "und"
    return pa.array(out.tolist(), type=pa.string())


def token_count_stage(batch: pa.Table, column: str = "text") -> pa.Table:
    """Lean map_batches stage: ONLY whitespace + BPE-ish token counts (two
    RE2 passes). Use when the consumer aggregates token counts alone — the
    full `text_stats_stage` pays ~13 regex/hash passes for columns a
    count-only pipeline never reads."""
    col = batch[column]
    return batch.drop_columns([column]) \
        .append_column("n_tokens", pa.array(token_counts(col),
                                            type=pa.int64())) \
        .append_column("n_bpe_tokens", pa.array(bpe_ish_token_counts(col),
                                                type=pa.int64()))


def text_stats_stage(batch: pa.Table, column: str = "text") -> pa.Table:
    """map_batches stage: append token counts, quality signals, predicted
    lang, and two content fingerprints (exact-hash + winnowing)."""
    col = batch[column]
    arr = _str(col)
    mc = _marker_counts(arr)  # five regex passes, shared by both kernels
    n_tok = token_counts(arr)
    stats = quality_stats(col, marker_counts=mc, n_tokens=n_tok)
    t = batch
    for name, vals in stats.items():
        if name in t.column_names:
            t = t.drop_columns([name])
        t = t.append_column(name, pa.array(vals))
    t = t.append_column("n_bpe_tokens",
                        pa.array(bpe_ish_token_counts(col), type=pa.int64()))
    t = t.append_column("lang_pred", lang_id(col, marker_counts=mc,
                                             n_tokens=n_tok))
    # int64 bit-views: Ray shuffle/aggregate round-trips group keys through
    # Python ints and overflows on u64 values >= 2^63
    t = t.append_column("content_hash",
                        pa.array(hash_arrow_array(_str(col)).view(np.int64),
                                 type=pa.int64()))
    t = t.append_column("winnow_fp",
                        pa.array(winnow_fingerprints(col).view(np.int64),
                                 type=pa.int64()))
    return t


# ---------------------------------------------------------------------------
# PII scrubbing (corpus cleaning): email / URL / IPv4 masking
# ---------------------------------------------------------------------------

#: (name, RE2 pattern, replacement) applied IN ORDER — the same patterns are
#: injected verbatim into the DuckDB oracle (both engines are RE2), so engine
#: and SQL replace and count identically.
SCRUB_RULES: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("urls", r"https?://[^ \t\n]+", "[URL]"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def scrub_text(col) -> pa.Array:
    """Mask emails, then URLs, then IPv4 literals (sequential RE2
    replace-all passes over the whole column — no per-row Python). Null
    text stays null (SQL regexp_replace semantics), unlike the stats
    kernels' null-as-empty convention."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = col
    for _, pattern, repl in SCRUB_RULES:
        out = pc.replace_substring_regex(out, pattern=pattern,
                                         replacement=repl)
    return out


def scrub_match_counts(col) -> dict[str, np.ndarray]:
    """Per-row match counts of each scrub rule against the ORIGINAL text."""
    import pyarrow.compute as pc

    arr = _str(col)
    return {name: np.asarray(pc.count_substring_regex(arr, pattern),
                             dtype=np.int64)
            for name, pattern, _ in SCRUB_RULES}
