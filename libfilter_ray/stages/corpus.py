"""Corpus-level curation: self-trained token-frequency quality scoring
and per-language token-budget sampling (training-data mixing).

- `build_vocab_ref` / `commonness_flags`: a CCNet-shaped quality filter
  with the LM replaced by the corpus's own token-frequency table — docs
  whose tokens are globally rare (avg global count below an integer
  threshold) are flagged. Two passes: a distributed word count with a
  per-batch distinct-word combiner (the `top_words` shape), global
  top-V selection by one vocab-sized sort+limit, then one broadcast and
  a streaming scoring pass. All-integer arithmetic end-to-end, so the
  flags oracle EXACTLY against SQL (no float log-prob order sensitivity).

- `token_budget_keep_ids` / `token_budget_sample`: keep documents per
  language in deterministic hash-rank order until a token budget is
  exhausted (cumulative-including-current <= budget) — corpus mixing to
  a target size. `budget` is an int (same cap for every language) or a
  {lang: budget} dict (languages absent from the dict are dropped);
  `mixture_budgets` / `weighted_token_budget_sample` derive the dict
  from mixture weights x a total token budget, the standard
  training-data mixing step (e.g. 50% en / 20% zh / ...). The cumulative scan is distributed by RANK-BUCKET
  REFINEMENT, the classic two-level prefix scan: a (lang x 4096-bucket)
  aggregate finds each language's boundary bucket on the driver (bounded:
  langs x 4096 rows), only the boundary bucket's rows (corpus/4096) are
  collected to resolve the exact cutoff, and the keep rule broadcast back
  is (bucket < boundary) OR (id in boundary-keep set). No per-language
  single-task cumsum anywhere — the skew-safe version of the pattern the
  round-2 review flagged on per-lang packing.

Tokenization is the engine-wide space-split with empty tokens dropped
(`q_top_words` / SQL string_split parity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketch.hashing import hash_arrow_array
from .dedup import _str

U64 = np.uint64


def _words_of(col) -> pa.Array:
    """Space-split tokens with empties dropped — SQL parity:
    unnest(string_split(text, ' ')) ... WHERE word <> ''."""
    import pyarrow.compute as pc

    col = _str(col)
    flat = pc.list_flatten(pc.split_pattern(col, " "))
    return flat.filter(pc.not_equal(flat, ""))


def _word_lists(col):
    """(flat tokens, row_splits) keeping row alignment (empties kept as
    positions then masked by the caller via the empty-token filter)."""
    import pyarrow.compute as pc

    col = _str(col)
    lists = pc.split_pattern(col, " ")
    lens = np.asarray(pc.fill_null(pc.list_value_length(lists), 0),
                      dtype=np.int64)
    flat = pc.list_flatten(lists)
    splits = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=splits[1:])
    return flat, splits


def space_token_counts(col) -> np.ndarray:
    """Per-row count of non-empty space-split tokens — SQL parity:
    len(list_filter(string_split(text, ' '), x -> x <> ''))."""
    import pyarrow.compute as pc

    flat, splits = _word_lists(col)
    n = len(splits) - 1
    if len(flat) == 0:
        return np.zeros(n, dtype=np.int64)
    nonempty = np.asarray(pc.not_equal(flat, ""), dtype=bool)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
    return np.bincount(rows[nonempty], minlength=n).astype(np.int64)


# ---------------------------------------------------------------------------
# self-trained frequency quality
# ---------------------------------------------------------------------------

def build_vocab_ref(ds, column: str, *, top_v: int = 1 << 16):
    """Plasma ObjectRef of (hash-sorted u64 word hashes, int64 global
    counts) for the corpus's `top_v` most frequent tokens (ties: count
    DESC, word ASC — the SQL row_number order).

    Distributed: per-batch distinct-word partial counts (the combiner
    that keeps the shuffle vocab-sized), groupby-Sum, one vocab-sized
    sort + limit; only the top-V table (bounded) reaches the driver."""
    import ray
    from ray.data.aggregate import Sum

    def word_partial(t: pa.Table) -> pa.Table:
        flat = _words_of(t[column])
        words, counts = np.unique(np.asarray(flat), return_counts=True)
        return pa.table({"word": pa.array(words.astype(str)),
                         "n": pa.array(counts, type=pa.int64())})

    vocab = ds.map_batches(word_partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n")) \
        .sort(["n", "word"], descending=[True, False]) \
        .limit(top_v).to_pandas()
    h = hash_arrow_array(pa.array(vocab["word"].astype(str)))
    order = np.argsort(h, kind="stable")
    return ray.put((h[order],
                    vocab["n"].to_numpy().astype(np.int64)[order]))


def commonness_flags(column: str, id_col: str, vocab_ref, *,
                     rare_factor: int = 50):
    """map_batches fn: (id, n_tokens, sum_commonness, rare) per row.
    sum_commonness = sum over the row's tokens (with multiplicity) of the
    token's global corpus count (0 for out-of-vocab); `rare` flags docs
    with sum_commonness < n_tokens * rare_factor — i.e. average global
    token count below `rare_factor`. All integers: bit-exact under any
    execution order."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vh, vc = ray.get(vocab_ref)  # zero-copy plasma read
        ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat, splits = _word_lists(t[column])
        nonempty = pc.not_equal(flat, "")
        mask = np.asarray(nonempty, dtype=bool) \
            if len(flat) else np.zeros(0, dtype=bool)
        h = hash_arrow_array(flat)
        rows = np.repeat(np.arange(len(ids), dtype=np.int64),
                         np.diff(splits))
        h, rows = h[mask], rows[mask]
        if len(vh):
            idx = np.searchsorted(vh, h)
            hit = (idx < len(vh)) & (
                vh[np.minimum(idx, len(vh) - 1)] == h)
            c = np.where(hit, vc[np.minimum(idx, len(vh) - 1)], 0)
        else:
            c = np.zeros(len(h), dtype=np.int64)
        n_tok = np.bincount(rows, minlength=len(ids)).astype(np.int64)
        # int64 scatter-add, NOT bincount(weights=float64): global counts
        # at 10^12-doc scale push per-doc sums past 2^53, where float64
        # accumulation would silently round and break oracle parity
        sum_c = np.zeros(len(ids), dtype=np.int64)
        np.add.at(sum_c, rows, c.astype(np.int64))
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "sum_commonness": pa.array(sum_c, type=pa.int64()),
            "rare": pa.array(sum_c < n_tok * np.int64(rare_factor)),
        })

    return fn


# ---------------------------------------------------------------------------
# per-language token-budget sampling
# ---------------------------------------------------------------------------

#: rank space is 32-bit (cap_rank_of); 4096 buckets = top 12 bits
BUDGET_BUCKET_BITS = 12


def _budget_for(budget, lang: str) -> int:
    """Per-language budget: an int applies uniformly; a {lang: budget}
    dict budgets absent languages 0 (i.e. drops them from the mix)."""
    if isinstance(budget, dict):
        return int(budget.get(lang, 0))
    return int(budget)


def mixture_budgets(weights: dict[str, float],
                    total_budget: int) -> dict[str, int]:
    """{lang: floor(weight/sum(weights) x total_budget)} — the
    deterministic integer budgets of a weighted corpus mixture, shaped
    so the same literals embed in an ANSI-SQL oracle."""
    tw = float(sum(weights.values()))
    if tw <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("mixture weights must be non-negative with a "
                         f"positive sum, got {weights}")
    return {lang: int(np.floor(w / tw * total_budget))
            for lang, w in weights.items()}


def token_budget_keep_ids(ds, lang_col: str, id_col: str,
                          token_count_of, *,
                          budget: int | dict[str, int],
                          bucket_bits: int = BUDGET_BUCKET_BITS):
    """{lang: (n_full_buckets_boundary, sorted boundary keep ids)} plus a
    broadcastable rule — returned as (boundary_bucket_per_lang dict,
    keep_ids ObjectRef) — selecting per language the documents with the
    smallest (rank, id) whose cumulative token count (including the
    current row) stays <= `budget` (int: uniform per lang; dict: per-lang
    budgets, absent langs dropped — see `_budget_for`).

    Two-level distributed prefix scan:
    1. one narrow pass aggregates (lang, rank-bucket) -> (tokens, docs);
       the langs x 2^bucket_bits table lands on the driver (bounded).
    2. per lang the driver cumsums bucket totals to find the boundary
       bucket; ONLY that bucket's rows (corpus / 2^bucket_bits) are
       collected, sorted by (rank, id) and cut at the remaining budget.
    Languages whose total fits the budget entirely skip step 2."""
    import ray
    from ray.data.aggregate import Sum

    from .crawl import cap_rank_of

    shift = np.int64(32 - bucket_bits)

    def narrow(t: pa.Table) -> pa.Table:
        ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rank = cap_rank_of(ids)
        n_tok = token_count_of(t)
        return pa.table({
            "lang": t[lang_col],
            "bucket": pa.array(rank >> shift, type=pa.int64()),
            "n_tok": pa.array(n_tok, type=pa.int64()),
            "n_docs": pa.array(np.ones(len(ids), dtype=np.int64)),
        })

    agg = ds.map_batches(narrow, batch_format="pyarrow") \
        .groupby(["lang", "bucket"]) \
        .aggregate(Sum("n_tok", alias_name="tokens"),
                   Sum("n_docs", alias_name="docs")) \
        .to_pandas()
    agg["tokens"] = agg["tokens"].astype("int64")

    boundary: dict[str, tuple[int, int]] = {}
    for lang, grp in agg.groupby("lang"):
        b_lang = _budget_for(budget, str(lang))
        grp = grp.sort_values("bucket")
        cum = grp["tokens"].cumsum()
        over = cum > b_lang
        if not over.any():
            boundary[str(lang)] = (1 << bucket_bits, 0)  # keep everything
            continue
        i = int(np.argmax(over.to_numpy()))
        b = int(grp["bucket"].iloc[i])
        spent = int(cum.iloc[i - 1]) if i > 0 else 0
        boundary[str(lang)] = (b, b_lang - spent)

    # collect ONLY boundary-bucket rows (corpus / 2^bits), resolve exact
    # per-lang cutoffs by (rank, id)
    need = {lang: b for lang, (b, _) in boundary.items()
            if b < (1 << bucket_bits)}
    keep_ids: dict[str, np.ndarray] = {}
    if need:
        blist = pa.array(list(need.values()), type=pa.int64())
        langs = pa.array(list(need.keys()))

        def pick_boundary(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            rank = cap_rank_of(ids)
            bucket = rank >> shift
            lv = _str(t[lang_col])
            m = np.zeros(len(ids), dtype=bool)
            for lg, bb in zip(langs, blist):
                m |= (np.asarray(pc.equal(lv, lg), dtype=bool)
                      & (bucket == bb.as_py()))
            return pa.table({
                "lang": lv.filter(pa.array(m)),
                "rank": pa.array(rank[m], type=pa.int64()),
                id_col: pa.array(ids[m], type=pa.int64()),
                "n_tok": pa.array(
                    np.asarray(token_count_of(t), dtype=np.int64)[m],
                    type=pa.int64()),
            })

        bdf = ds.map_batches(pick_boundary, batch_format="pyarrow") \
            .to_pandas()
        for lang, grp in bdf.groupby("lang"):
            grp = grp.sort_values(["rank", id_col], kind="stable")
            cum = grp["n_tok"].cumsum()
            rem = boundary[str(lang)][1]
            kept = grp[cum <= rem]
            keep_ids[str(lang)] = np.sort(
                kept[id_col].to_numpy().astype(np.int64))

    import ray
    return boundary, ray.put(keep_ids)


def token_budget_sample(ds, lang_col: str, id_col: str, token_count_of,
                        *, budget: int | dict[str, int],
                        bucket_bits: int = BUDGET_BUCKET_BITS):
    """Dataset filtered to each language's token-budget sample: documents
    in ascending (cap_rank, id) order while the running token total
    (including the current document) stays <= `budget` (int or per-lang
    dict)."""
    boundary, keep_ref = token_budget_keep_ids(
        ds, lang_col, id_col, token_count_of, budget=budget,
        bucket_bits=bucket_bits)
    return apply_token_budget(ds, lang_col, id_col, boundary, keep_ref,
                              bucket_bits=bucket_bits)


def weighted_token_budget_sample(ds, lang_col: str, id_col: str,
                                 token_count_of, *,
                                 weights: dict[str, float],
                                 total_budget: int,
                                 bucket_bits: int = BUDGET_BUCKET_BITS):
    """Weighted corpus mixing: sample each language to
    floor(weight share x total_budget) tokens in deterministic
    (cap_rank, id) order; languages absent from `weights` are dropped.
    Same two-level rank-bucket prefix scan as `token_budget_sample` —
    one narrow aggregate pass + one boundary-bucket gather per run,
    regardless of how many languages the mix names."""
    return token_budget_sample(
        ds, lang_col, id_col, token_count_of,
        budget=mixture_budgets(weights, total_budget),
        bucket_bits=bucket_bits)


def apply_token_budget(ds, lang_col: str, id_col: str, boundary: dict,
                       keep_ref, *,
                       bucket_bits: int = BUDGET_BUCKET_BITS):
    """One streaming pass applying a (boundary, keep-set) budget rule —
    split out so a checkpointed job can persist the rule and re-attach
    without recomputing the selection scan."""
    import ray

    from .crawl import cap_rank_of

    shift = np.int64(32 - bucket_bits)
    boundary_items = sorted(boundary.items())

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep_ids = ray.get(keep_ref)
        ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bucket = cap_rank_of(ids) >> shift
        lv = _str(t[lang_col])
        m = np.zeros(len(ids), dtype=bool)
        for lang, (b, _) in boundary_items:
            in_lang = np.asarray(pc.equal(lv, lang), dtype=bool)
            m |= in_lang & (bucket < b)
            ki = keep_ids.get(lang)
            if ki is not None and len(ki):
                idx = np.searchsorted(ki, ids)
                hit = (idx < len(ki)) & (
                    ki[np.minimum(idx, len(ki) - 1)] == ids)
                m |= in_lang & (bucket == b) & hit
        return t.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# self-trained bigram LM quality filter (CCNet-shaped, real log-probs)
# ---------------------------------------------------------------------------

#: field separator inside LM hash keys — unambiguous for any token text
#: that can appear after a space split (tokens never contain 0x1F).
LM_SEP = "\x1f"

#: bigrams seen fewer times than this are dropped from the model (scored
#: as unseen). The prune is what bounds the broadcast model: at web scale
#: raise it until the surviving bigram table fits a worker heap (the
#: count distribution is zipfian — min_count=4 already cuts ~90% of
#: distinct bigrams on real crawls).
LM_MIN_COUNT = 2


def _batch_bigrams(t: pa.Table, column: str, lang_col: str):
    """Vectorized per-batch bigram extraction: (w1, w2, lang, row_of)
    where row_of maps each bigram to its batch row. Tokens are the
    engine-wide space split with empties dropped BEFORE pairing — SQL
    parity: adjacent ordinals of list_filter(string_split(text,' '),
    x -> x <> '')."""
    import pyarrow.compute as pc

    flat, splits = _word_lists(t[column])
    n = len(splits) - 1
    if len(flat) == 0:
        empty = pa.array([], type=pa.string())
        return empty, empty, empty, np.empty(0, dtype=np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
    nonempty = np.asarray(pc.not_equal(flat, ""), dtype=bool)
    flat_ne = flat.filter(pa.array(nonempty))
    rows_ne = rows[nonempty]
    if len(rows_ne) < 2:
        empty = pa.array([], type=pa.string())
        return empty, empty, empty, np.empty(0, dtype=np.int64)
    adj = np.flatnonzero(rows_ne[1:] == rows_ne[:-1])
    w1 = flat_ne.take(pa.array(adj))
    w2 = flat_ne.take(pa.array(adj + 1))
    row_of = rows_ne[adj]
    lang = _str(t[lang_col]).take(pa.array(row_of))
    return w1, w2, lang, row_of


def _lm_keys(kind: str, *parts) -> np.ndarray:
    """u64 hash of kind + LM_SEP-joined string parts (vectorized)."""
    import pyarrow.compute as pc

    return hash_arrow_array(
        pc.binary_join_element_wise(kind, *parts, LM_SEP))


def build_bigram_lm_ref(ds, column: str, lang_col: str, *,
                        min_count: int = LM_MIN_COUNT,
                        prefix_min_count: int = 1):
    """Plasma ObjectRef of a per-language add-one-smoothed bigram LM
    trained on the corpus itself — the self-trained stand-in for CCNet's
    external KenLM quality model.

    Model = (sorted u64 bigram-key hashes + counts [pruned at
    `min_count`], sorted u64 prefix-key hashes + counts [the count of w1
    as a bigram PREFIX, so P(.|w1) sums to <= 1; pruned at
    `prefix_min_count`, default 1 = unpruned], {lang: V} vocabulary
    sizes). Scoring uses
    P(w2 | w1, lang) = (c(w1 w2) + 1) / (c(w1 .) + V_lang).

    ONE distributed pass: each batch emits distinct-key partial counts
    for three key kinds (bigram / prefix / token — the token rows only
    feed the distinct-vocabulary count), a (kind, lang, h) groupby sums
    them, and a distributed shrink stage bounds what the driver sees:
    bigram rows below `min_count` and prefix rows below
    `prefix_min_count` are filtered INSIDE the shuffled Dataset, and the
    token rows collapse to one (lang, distinct-count) partial per block.
    Driver memory is therefore O(pruned model + langs x blocks), never
    O(all distinct bigrams) or O(vocabulary). The zipfian `min_count`
    prune is the scale knob (see LM_MIN_COUNT); raise `prefix_min_count`
    too when even the prefix table outgrows a worker heap — prefixes
    pruned there score as unseen (c1 = 0), a documented model change, so
    the default keeps them all."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        w1, w2, lang, _ = _batch_bigrams(t, column, lang_col)
        bh = _lm_keys("B", lang, w1, w2).view(np.int64)
        ph = _lm_keys("P", lang, w1).view(np.int64)
        # tokens (for V): every non-empty token of the batch, per lang
        import pyarrow.compute as pc

        flat, splits = _word_lists(t[column])
        n = len(splits) - 1
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
        ne = np.asarray(pc.not_equal(flat, ""), dtype=bool) \
            if len(flat) else np.empty(0, dtype=bool)
        tok = flat.filter(pa.array(ne)) if len(flat) else \
            pa.array([], type=pa.string())
        tlang = _str(t[lang_col]).take(pa.array(rows[ne])) if len(flat) \
            else pa.array([], type=pa.string())
        th = _lm_keys("T", tlang, tok).view(np.int64)

        hs, kinds, langs, ns = [], [], [], []
        for kind, h, lg in ((0, bh, lang), (1, ph, lang), (2, th, tlang)):
            if not len(h):
                continue
            # lang of each distinct key: first occurrence (keys embed
            # the lang, so all occurrences agree)
            uh, first, cnt = np.unique(h, return_index=True,
                                       return_counts=True)
            hs.append(uh)
            kinds.append(np.full(len(uh), kind, dtype=np.int64))
            lg = lg.combine_chunks() if isinstance(lg, pa.ChunkedArray) \
                else lg
            langs.append(lg.take(pa.array(first)))
            ns.append(cnt.astype(np.int64))
        if not hs:
            return pa.table({"kind": pa.array([], type=pa.int64()),
                             "lang": pa.array([], type=pa.string()),
                             "h": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({
            "kind": pa.array(np.concatenate(kinds)),
            "lang": pa.concat_arrays(langs),
            "h": pa.array(np.concatenate(hs)),
            "n": pa.array(np.concatenate(ns)),
        })

    from ray.data.aggregate import Min, Sum

    def shrink(t: pa.Table) -> pa.Table:
        """Runs INSIDE the aggregated Dataset (distributed): prune
        below-threshold bigram/prefix rows and fold the token rows to
        one (lang, distinct-count) partial per block — the driver never
        collects O(all bigrams) or O(vocabulary) rows."""
        import pyarrow.compute as pc

        kind = np.asarray(t["kind"], dtype=np.int64)
        n = np.asarray(t["n"], dtype=np.int64)
        keep = ((kind == 0) & (n >= min_count)) | \
            ((kind == 1) & (n >= prefix_min_count))
        kept = t.filter(pa.array(keep)).select(["kind", "lang", "h", "n"])
        if (kind == 2).any():
            vc = pc.value_counts(
                t.filter(pa.array(kind == 2))["lang"].combine_chunks())
            langs = vc.field("values")
            counts = vc.field("counts")
            vrows = pa.table({
                "kind": pa.array(np.full(len(langs), 2, dtype=np.int64)),
                "lang": langs,
                "h": pa.array(np.zeros(len(langs), dtype=np.int64)),
                "n": pc.cast(counts, pa.int64()),
            })
            kept = pa.concat_tables([kept, vrows])
        return kept

    # single int64 group key (h embeds kind+lang); kind/lang ride as
    # Min carries — constant per group, and the shuffle sorts 8-byte
    # keys instead of (int, string, int) triples
    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("h").aggregate(
            Sum("n", alias_name="n"),
            Min("kind", alias_name="kind"),
            Min("lang", alias_name="lang")) \
        .map_batches(shrink, batch_format="pyarrow").to_pandas()
    if not len(agg):
        return ray.put((np.empty(0, np.uint64), np.empty(0, np.int64),
                        np.empty(0, np.uint64), np.empty(0, np.int64),
                        {}))
    big = agg[agg["kind"] == 0]
    pre = agg[agg["kind"] == 1]
    vocab = agg[agg["kind"] == 2].groupby("lang")["n"].sum()
    bh = big["h"].to_numpy().view(np.uint64)
    border = np.argsort(bh, kind="stable")
    ph = pre["h"].to_numpy().view(np.uint64)
    porder = np.argsort(ph, kind="stable")
    return ray.put((
        bh[border], big["n"].to_numpy().astype(np.int64)[border],
        ph[porder], pre["n"].to_numpy().astype(np.int64)[porder],
        {str(lg): int(v) for lg, v in vocab.items()}))


def _sorted_lookup(sorted_h: np.ndarray, h: np.ndarray,
                   counts: np.ndarray) -> np.ndarray:
    """counts[h] for keys present in the sorted model table, 0 otherwise."""
    out = np.zeros(len(h), dtype=np.int64)
    if len(sorted_h) and len(h):
        idx = np.searchsorted(sorted_h, h)
        hit = (idx < len(sorted_h)) & (
            sorted_h[np.minimum(idx, len(sorted_h) - 1)] == h)
        out[hit] = counts[idx[hit]]
    return out


def lm_nll_stage(column: str, id_col: str, lang_col: str, model_ref):
    """map_batches fn: (id, lang, n_bigrams, nll_sum) per document —
    nll_sum = sum over the doc's bigrams of -ln P(w2 | w1, lang) under
    the broadcast model (ray.put once, zero-copy plasma read + per-worker
    deserialize memo per task). Docs with < 2 tokens emit n_bigrams = 0,
    nll_sum = 0 — the caller's keep rule treats them as unscoreable
    (kept). Fully vectorized: Arrow joins + one searchsorted per kind."""
    from .broadcast import cached_broadcast

    def fn(t: pa.Table) -> pa.Table:
        bh_s, bc, ph_s, pcnt, vby = cached_broadcast(model_ref,
                                                     lambda m: m)
        w1, w2, lang, row_of = _batch_bigrams(t, column, lang_col)
        n = t.num_rows
        nll_sum = np.zeros(n, dtype=np.float64)
        n_bg = np.zeros(n, dtype=np.int64)
        if len(row_of):
            c2 = _sorted_lookup(bh_s, _lm_keys("B", lang, w1, w2), bc)
            c1 = _sorted_lookup(ph_s, _lm_keys("P", lang, w1), pcnt)
            lcodes, uniq = pd.factorize(np.asarray(lang))
            V = np.array([vby.get(str(lg), 0) for lg in uniq],
                         dtype=np.int64)[lcodes]
            nll = -np.log((c2 + 1.0) / (c1 + V))
            np.add.at(nll_sum, row_of, nll)
            n_bg = np.bincount(row_of, minlength=n).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            lang_col: t[lang_col],
            "n_bigrams": pa.array(n_bg),
            "nll_sum": pa.array(nll_sum),
        })

    return fn


# ---------------------------------------------------------------------------
# idf-weighted keyword extraction (tf/df ranking)
# ---------------------------------------------------------------------------

def _df_partial(column: str):
    """Per-batch COMBINED document-frequency partial: distinct
    (row, word-hash) pairs -> per-hash containing-doc counts. Exact
    because a document is exactly one input row; keeps the df shuffle
    at combined (8-byte hash, count) rows, never one row per raw
    (doc, word) pair."""
    def partial(t: pa.Table) -> pa.Table:
        flat, splits = _word_lists(t[column])
        n = len(splits) - 1
        if len(flat) == 0:
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        import pyarrow.compute as pc

        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
        ne = np.asarray(pc.not_equal(flat, ""), dtype=bool)
        h = hash_arrow_array(flat.filter(pa.array(ne)))
        rows = rows[ne]
        # distinct (row, word) pairs -> per-word containing-doc counts
        pair = np.unique(np.stack([rows.view(U64), h], axis=1), axis=0)
        uh, cnt = np.unique(pair[:, 1], return_counts=True)
        return pa.table({"h": pa.array(uh.view(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    return partial


def doc_freq_dataset(ds, column: str):
    """Distributed (h, df) document-frequency Dataset — the per-batch
    combined partial above + one hash-keyed groupby-Sum. Both keyword
    paths derive from this: the broadcast path collects it (small
    vocabularies), the join path co-partitions against it."""
    from ray.data.aggregate import Sum

    return ds.map_batches(_df_partial(column), batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("n", alias_name="df"))


def build_doc_freq_ref(ds, column: str):
    """Plasma ObjectRef of (sorted u64 word hashes, int64 document
    frequencies): how many documents contain each distinct token. ONE
    distributed pass (`doc_freq_dataset`); only the vocabulary-sized
    table reaches the driver. The broadcast side of
    `keyword_topk_stage`.

    BOUNDED-CORPUS PATH: the collected table is O(distinct vocabulary),
    which on web-scale text (typos, URLs, hex blobs) is billions of
    tokens — use `keyword_topk_auto`, which measures the vocabulary
    first and switches to the hash-partitioned join path
    (`keyword_topk_join_from`) when it exceeds the broadcast bound."""
    import ray

    agg = doc_freq_dataset(ds, column).to_pandas()
    if not len(agg):
        return ray.put((np.empty(0, np.uint64), np.empty(0, np.int64)))
    h = agg["h"].to_numpy().view(np.uint64)
    order = np.argsort(h, kind="stable")
    return ray.put((h[order],
                    agg["df"].to_numpy().astype(np.int64)[order]))


def keyword_topk_stage(column: str, id_col: str, df_ref, *, k: int = 3):
    """map_batches fn: the top-`k` keywords of each document ranked by
    tf/df — frequent in the doc, rare in the corpus (the tf-idf ordering
    with idf's log dropped: tf/df ranks IDENTICALLY to tf * (1/df) and,
    unlike ln(), IEEE division is correctly rounded, so numpy and any
    SQL engine order ties identically). Ties break (word ASC). Output
    rows: (id, rank 1..k, word, tf, df) — all-integer + the word, so
    results hash-compare exactly across engines. Docs with fewer than
    `k` distinct tokens emit fewer rows; empty/null docs emit none."""
    from .broadcast import cached_broadcast

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dh, dfc = cached_broadcast(df_ref, lambda m: m)
        flat, splits = _word_lists(t[column])
        n = len(splits) - 1
        ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            "word": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "df": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
        ne = np.asarray(pc.not_equal(flat, ""), dtype=bool)
        words = flat.filter(pa.array(ne))
        rows = rows[ne]
        if not len(rows):
            return empty
        wpd = pd.DataFrame({"row": rows,
                            "word": np.asarray(words, dtype=object)})
        tf = wpd.groupby(["row", "word"], sort=False).size() \
            .rename("tf").reset_index()
        h = hash_arrow_array(pa.array(tf["word"], type=pa.string()))
        idx = np.searchsorted(dh, h)
        hit = (idx < len(dh)) & (dh[np.minimum(idx, len(dh) - 1)] == h)
        if not hit.all():
            raise RuntimeError("token missing from doc-freq table — "
                               "df_ref built on a different corpus?")
        tf["df"] = dfc[idx]
        tf["score"] = tf["tf"].to_numpy() / tf["df"].to_numpy()
        tf = tf.sort_values(["row", "score", "word"],
                            ascending=[True, False, True],
                            kind="stable")
        topk = tf.groupby("row", sort=True).head(k)
        rank = topk.groupby("row", sort=False).cumcount() + 1
        return pa.table({
            id_col: pa.array(ids[topk["row"].to_numpy()]),
            "rank": pa.array(rank.to_numpy().astype(np.int64)),
            "word": pa.array(topk["word"], type=pa.string()),
            "tf": pa.array(topk["tf"].to_numpy().astype(np.int64)),
            "df": pa.array(topk["df"].to_numpy().astype(np.int64)),
        })

    return fn


#: above this many distinct tokens the keyword extractor stops
#: broadcasting the doc-freq table and joins instead (2^22 hashes+counts
#: = 64 MiB per worker — the same order as the dedup DropIdStore bound)
KEYWORD_BROADCAST_VOCAB = 1 << 22


def doc_word_tf(ds, column: str, id_col: str):
    """Dataset of (id, word, h, tf) — one row per distinct (document,
    token) with its in-document term frequency and the token's u64 hash
    (as int64, the join key against `doc_freq_dataset`). Exact per batch
    because a document is exactly one input row. Only the JOIN path of
    keyword extraction materializes this; the broadcast path never
    builds per-pair rows."""
    def pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, splits = _word_lists(t[column])
        n = len(splits) - 1
        ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            "word": pa.array([], type=pa.string()),
            "h": pa.array([], type=pa.int64()),
            "tf": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
        ne = np.asarray(pc.not_equal(flat, ""), dtype=bool)
        words = flat.filter(pa.array(ne))
        rows = rows[ne]
        if not len(rows):
            return empty
        wpd = pd.DataFrame({"row": rows,
                            "word": np.asarray(words, dtype=object)})
        tf = wpd.groupby(["row", "word"], sort=False).size() \
            .rename("tf").reset_index()
        warr = pa.array(tf["word"], type=pa.string())
        return pa.table({
            id_col: pa.array(ids[tf["row"].to_numpy()]),
            "word": warr,
            "h": pa.array(hash_arrow_array(warr).view(np.int64)),
            "tf": pa.array(tf["tf"].to_numpy().astype(np.int64)),
        })

    return ds.map_batches(pairs, batch_format="pyarrow")


def keyword_topk_join_from(pairs, df_ds, id_col: str, *, k: int = 3,
                           num_shards: int = 64):
    """Fully-distributed exact keyword extraction — the scale path that
    NEVER collects the vocabulary anywhere: (id, word, h, tf) pairs join
    their document frequencies co-partitioned ON THE 8-BYTE TOKEN HASH
    (`joins.hash_equi_join` against `doc_freq_dataset`; same
    hash-identity assumption the broadcast path already makes), then one
    doc-hash shuffle regroups each document's candidates for a
    vectorized per-shard top-k. Output rows (id, rank 1..k, word, tf,
    df) — identical to the broadcast path (both are exact), same tf/df
    DESC, word ASC order."""
    from ..sketch.hashing import shard_of_values
    from .joins import hash_equi_join

    joined = hash_equi_join(
        pairs, df_ds, left_on="h", right_on="h",
        left_cols=[id_col, "word", "tf"], right_cols=["df"],
        num_shards=num_shards)

    def add_shard(t: pa.Table) -> pa.Table:
        return t.append_column("shard", pa.array(
            shard_of_values(t[id_col], num_shards, seed=0x4B57),
            type=pa.int64()))

    def topk_shard(t: pa.Table) -> pa.Table:
        d = t.select([id_col, "word", "tf", "df"]).to_pandas()
        d["score"] = d["tf"].to_numpy() / d["df"].to_numpy()
        d = d.sort_values([id_col, "score", "word"],
                          ascending=[True, False, True], kind="stable")
        topk = d.groupby(id_col, sort=True).head(k)
        rank = topk.groupby(id_col, sort=False).cumcount() + 1
        return pa.table({
            id_col: pa.array(topk[id_col].to_numpy().astype(np.int64)),
            "rank": pa.array(rank.to_numpy().astype(np.int64)),
            "word": pa.array(topk["word"], type=pa.string()),
            "tf": pa.array(topk["tf"].to_numpy().astype(np.int64)),
            "df": pa.array(topk["df"].to_numpy().astype(np.int64)),
        })

    return joined.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("shard").map_groups(topk_shard, batch_format="pyarrow")


def keyword_topk_auto(ds, column: str, id_col: str, *, k: int = 3,
                      max_broadcast_vocab: int = KEYWORD_BROADCAST_VOCAB,
                      num_shards: int = 64):
    """Per-document top-`k` keywords by tf/df with an automatic
    broadcast-or-join switch (the dedup family's established pattern,
    `dedup.py` candidate attach): the document-frequency table is built
    once as the hash-keyed `doc_freq_dataset` — per-batch COMBINED
    partials, so the shuffle carries (8-byte hash, count) rows, never
    one row per raw (doc, word) pair — and MATERIALIZED in the object
    store (vocab-sized, distributed, spillable — never on the driver).
    Its exact row count picks the path:

    - vocab <= `max_broadcast_vocab`: collect the small (h, df) table,
      sort + broadcast via ray.put, stream `keyword_topk_stage` — one
      pass over the corpus, zero extra shuffles, and the per-pair word
      table is never built at all.
    - vocab > bound: `keyword_topk_join_from` — token-hash
      co-partitioned join + doc-hash top-k regroup; the driver sees only
      results.

    Both paths are exact and return identical rows."""
    import ray

    df_ds = doc_freq_dataset(ds, column).materialize()
    if df_ds.count() <= max_broadcast_vocab:
        pdf = df_ds.to_pandas()
        h = pdf["h"].to_numpy().view(np.uint64)
        order = np.argsort(h, kind="stable")
        ref = ray.put((h[order],
                       pdf["df"].to_numpy().astype(np.int64)[order]))
        return ds.map_batches(
            keyword_topk_stage(column, id_col, ref, k=k),
            batch_format="pyarrow")
    pairs = doc_word_tf(ds, column, id_col)
    return keyword_topk_join_from(pairs, df_ds, id_col, k=k,
                                  num_shards=num_shards)


# ---------------------------------------------------------------------------
# deterministic hash split (train / validation / test)
# ---------------------------------------------------------------------------

def hash_split_stage(id_col: str, splits: dict[str, int], *,
                     denom: int = 100):
    """map_batches fn appending a `split` column: each row lands in the
    named slice whose cumulative [lo, hi) window (in `denom`-ths of the
    32-bit Knuth rank space, insertion order) contains
    cap_rank_of(id) % denom. Pure function of the id — stable across
    runs, machines and re-partitioning, and docs never move between
    splits when the corpus grows (the property random sampling lacks).
    `splits` maps name -> share; shares must sum to `denom`.
    SQL parity: ((id * 2654435761) % 4294967296) % denom."""
    from .crawl import cap_rank_of

    if sum(splits.values()) != denom:
        raise ValueError(f"split shares {splits} must sum to {denom}")
    names = list(splits)
    edges = np.cumsum([splits[nm] for nm in names])

    def fn(t: pa.Table) -> pa.Table:
        ids = _str(t[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        slot = cap_rank_of(ids) % denom
        which = np.searchsorted(edges, slot, side="right")
        lab = pa.DictionaryArray.from_arrays(
            pa.array(which.astype(np.int32)), pa.array(names)) \
            .dictionary_decode()
        return t.append_column("split", lab)

    return fn
