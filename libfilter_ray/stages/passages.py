"""Exact duplicate-PASSAGE removal across documents (substring dedup).

The operator a heavily-templated crawl needs beyond whole-doc / line
dedup: exact substrings of >= `min_len` bytes repeated across documents
are removed from every copy except the globally first occurrence
(published approach: Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better" — suffix-array duplicate removal; here
re-expressed for Ray Data with winnowing anchors instead of a global
suffix array, which cannot stream).

Distributed shape (every stage bounded):

1. anchors — one map_batches pass emits (anchor_hash, doc, pos) rows:
   winnowing over k-byte rolling hashes with window w
   (Schleimer/Wilkes/Aiken 2003). Self-alignment guarantee: any common
   substring of length >= w + k - 1 contains a window fully inside it,
   both copies see the identical hash sequence there and select the SAME
   content-relative k-gram, so both emit an anchor with equal hash at the
   aligned content position.
2. candidate pairing — groupby(anchor-hash shard): each occurrence pairs
   with its bucket's MINIMUM (doc, pos) occurrence — O(bucket) pairs,
   not O(bucket^2), and every non-first copy is covered by a pair whose
   partner is first-or-earlier.
3. verify+extend — candidate doc texts are gathered via the shared
   bounded prune (stages/dedup._candidate_rows) and attached to pairs
   with the broadcast/hash-join auto-switch; each pair byte-verifies the
   anchor k-gram (hash-collision guard) and extends left/right to the
   maximal common substring; spans shorter than `min_len` drop.
4. apply — spans merge per doc (vectorized interval union) and one
   streaming pass rebuilds text with the spans cut. The span table is
   O(duplicated passages), carried by the same bounded broadcast /
   Dataset machinery as the drop sets.

Self-dup caveat: within-ONE-doc repetition is left to the zero-shuffle
`doc_repetition_stats` quality signal; spans here are cross-document
(pairs with doc_a == doc_b are dropped) — matching the reference
pipeline's split between intra- and inter-document handling.

Recall caveat (the price of streaming vs a global suffix array): a pair
is only attempted against the anchor bucket's min occurrence and the
sorted-adjacent neighbor. A duplicated passage is missed only if, in
EVERY one of its ~len(passage)/w anchor buckets, both partners are
documents sharing just that k-gram and not the passage — probability
decays geometrically with passage length. Detection of every pair the
stage does attempt is exact (byte-verified maximal extension); the
brute-force reference test in tests/test_passages.py checks exactness
end-to-end on its corpora.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketch.hashing import shard_of_values
from .dedup import _str

U64 = np.uint64

_span_store_cache: dict[str, "SpanStore"] = {}


def _span_attached(path: str) -> "SpanStore":
    hit = _span_store_cache.get(path)
    if hit is None:
        hit = _span_store_cache[path] = SpanStore(path)
    return hit


def winnow_anchor_positions(col, *, k: int = 16, w: int = 16):
    """(hash u64, row int64, pos int64) flat arrays of winnowing anchors:
    per row, the first-minimal k-gram hash of every w-window of
    consecutive k-gram hashes, deduplicated per (row, pos). Rows shorter
    than k + w - 1 bytes emit no anchors (no full window exists).

    Fully vectorized: one rolling-hash pass (functions/shingles), one
    global sliding-window argmin, boundary windows masked out."""
    from ..functions.shingles import shingle_hashes

    flat, splits = shingle_hashes(col, k=k)
    n = len(splits) - 1
    counts = np.diff(splits)
    empty = (np.empty(0, dtype=U64), np.empty(0, dtype=np.int64),
             np.empty(0, dtype=np.int64))
    if len(flat) < w:
        return empty
    # NB rows shorter than k contribute ONE whole-row hash (shingle_hashes
    # contract); their single window can never be fully inside, and the
    # boundary mask below excludes them.
    W = np.lib.stride_tricks.sliding_window_view(flat, w)
    pick = W.argmin(axis=1)  # first-minimal index per window
    starts = np.arange(len(W), dtype=np.int64)
    sel = starts + pick
    row_of = np.searchsorted(splits, starts, side="right") - 1
    # window fully inside its row's shingle run, and the row long enough
    # to have real k-grams (counts >= k-gram count means len >= k)
    valid = ((starts + w) <= splits[row_of + 1]) \
        & (counts[row_of] >= w) & (counts[row_of] > 1)
    sel, row_of = sel[valid], row_of[valid]
    if not len(sel):
        return empty
    # dedupe repeated picks (adjacent windows often select the same gram)
    keep = np.r_[True, (sel[1:] != sel[:-1]) | (row_of[1:] != row_of[:-1])]
    # non-adjacent repeats of the same pick are possible after masking —
    # do an exact unique over (row, sel)
    pair = row_of[keep] * np.int64(1 << 40) + sel[keep]
    uniq, idx = np.unique(pair, return_index=True)
    sel_u = sel[keep][idx]
    row_u = row_of[keep][idx]
    pos = sel_u - splits[row_u]
    return flat[sel_u], row_u, pos


def anchor_table_fn(column: str, id_column: str, *, k: int = 16,
                    w: int = 16):
    """map_batches fn: (anchor int64, doc int64, pos int64) narrow rows
    (24 B + shard tag), sharded by anchor hash."""

    def fn(t: pa.Table) -> pa.Table:
        h, row, pos = winnow_anchor_positions(_str(t[column]), k=k, w=w)
        ids = _str(t[id_column]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "anchor": pa.array(h.view(np.int64), type=pa.int64()),
            "doc": pa.array(ids[row], type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
        })

    return fn


def _pair_with_min(df: pd.DataFrame, max_bucket: int) -> pd.DataFrame:
    """Within each anchor bucket (sorted by (doc, pos)): pair every
    occurrence with (a) the bucket's minimum occurrence and (b) its
    sorted-adjacent predecessor. Both pairings are O(bucket), so EVERY
    member participates — no truncation-by-rank (which would
    systematically exclude the same high-doc-id copies from every one of
    a passage's anchor buckets). `max_bucket` only clamps pathological
    single-anchor floods (default 2^20) and is a disclosed recall bound
    when hit. Fully vectorized — one DataFrame per shard call."""
    df = df.sort_values(["anchor", "doc", "pos"], kind="stable")
    a = df["anchor"].to_numpy()
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    sizes = np.r_[starts[1:], len(a)] - starts
    clamped = np.minimum(sizes, max_bucket)
    docs = df["doc"].to_numpy()
    poss = df["pos"].to_numpy()
    empty = pd.DataFrame({
        "doc_a": np.array([], dtype=np.int64),
        "pos_a": np.array([], dtype=np.int64),
        "doc_b": np.array([], dtype=np.int64),
        "pos_b": np.array([], dtype=np.int64)})
    multi = clamped >= 2
    if not multi.any():
        return empty
    s_m = starts[multi]
    n_m = clamped[multi]
    # member indices: every in-bucket offset 1..n-1
    mem = np.repeat(s_m, n_m - 1) + (
        np.arange(int((n_m - 1).sum()), dtype=np.int64)
        - np.repeat(np.cumsum(n_m - 1) - (n_m - 1), n_m - 1)) + 1
    first = np.repeat(s_m, n_m - 1)  # bucket-min partner per member
    prev = mem - 1                   # sorted-adjacent partner per member
    da, pa_, db, pb = [], [], [], []
    keep_min = docs[mem] != docs[first]
    da.append(docs[first][keep_min]); pa_.append(poss[first][keep_min])
    db.append(docs[mem][keep_min]);   pb.append(poss[mem][keep_min])
    keep_adj = (docs[mem] != docs[prev]) & (prev != first)
    da.append(docs[prev][keep_adj]);  pa_.append(poss[prev][keep_adj])
    db.append(docs[mem][keep_adj]);   pb.append(poss[mem][keep_adj])
    res = pd.DataFrame({
        "doc_a": np.concatenate(da), "pos_a": np.concatenate(pa_),
        "doc_b": np.concatenate(db), "pos_b": np.concatenate(pb)})
    if not len(res):
        return empty
    return res.drop_duplicates(subset=["doc_a", "pos_a", "doc_b",
                                       "pos_b"]).reset_index(drop=True)


def anchor_candidate_pairs_ds(anchors_ds, *, max_bucket: int = 1 << 20,
                              num_shards: int = 64):
    """(doc_a, pos_a, doc_b, pos_b) candidate Dataset from the anchor
    table — bucket-sharded exactly like candidate_pairs_ds (an anchor
    hash never splits across shards)."""

    def add_shard(t: pa.Table) -> pa.Table:
        return t.append_column("shard", pa.array(
            shard_of_values(t["anchor"], num_shards, seed=0xA17C),
            type=pa.int64()))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        return _pair_with_min(df, max_bucket)

    return anchors_ds.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("shard").map_groups(scan, batch_format="pandas")


def _extend_matches(ta: bytes, pa_: int, tb: bytes, pb: int,
                    k: int) -> tuple[int, int] | None:
    """Byte-verify the k-gram at (ta[pa_:], tb[pb:]) and extend to the
    maximal common substring; returns (start_b, end_b) in tb or None on
    hash collision. Chunked numpy comparison, no per-byte Python."""
    if ta[pa_:pa_ + k] != tb[pb:pb + k]:
        return None
    # extend right
    max_r = min(len(ta) - pa_, len(tb) - pb)
    r = k
    CH = 256
    while r < max_r:
        step = min(CH, max_r - r)
        xa = np.frombuffer(ta, dtype=np.uint8, count=step,
                           offset=pa_ + r)
        xb = np.frombuffer(tb, dtype=np.uint8, count=step,
                           offset=pb + r)
        neq = np.flatnonzero(xa != xb)
        if len(neq):
            r += int(neq[0])
            break
        r += step
    # extend left
    max_l = min(pa_, pb)
    lft = 0
    while lft < max_l:
        step = min(CH, max_l - lft)
        xa = np.frombuffer(ta, dtype=np.uint8, count=step,
                           offset=pa_ - lft - step)
        xb = np.frombuffer(tb, dtype=np.uint8, count=step,
                           offset=pb - lft - step)
        neq = np.flatnonzero(xa[::-1] != xb[::-1])
        if len(neq):
            lft += int(neq[0])
            break
        lft += step
    return pb - lft, pb + r


def duplicate_passage_spans(ds, column: str, id_column: str, *,
                            min_len: int = 64, k: int = 16, w: int = 16,
                            max_bucket: int = 1 << 20,
                            num_shards: int = 64):
    """Dataset (doc, start, end) of byte spans to REMOVE: for every exact
    cross-document substring of >= min_len bytes, every occurrence in a
    (doc, pos) later than the anchor bucket's first keeps nothing.
    Requires min_len >= w + k - 1 (the winnowing detection guarantee)."""
    if min_len < w + k - 1:
        raise ValueError(
            f"min_len must be >= w + k - 1 = {w + k - 1} "
            "(winnowing detection bound)")
    from .dedup import _candidate_rows, _attach_pair_payloads

    anchors = ds.map_batches(anchor_table_fn(column, id_column, k=k, w=w),
                             batch_format="pyarrow")
    pairs = anchor_candidate_pairs_ds(anchors, max_bucket=max_bucket,
                                      num_shards=num_shards)

    # normalize to the (id_a, id_b) contract of the shared payload attach
    # and CO-LOCATE each DIAGONAL (equal (doc_a, doc_b, pos_a - pos_b)):
    # a passage's ~len/w anchors all lie on one diagonal and extend to
    # the same maximal span, so the extend stage processes diagonals in
    # sorted order and skips anchors already inside a produced span.
    # Dropping all-but-one anchor per diagonal UP FRONT would be wrong —
    # two DISTINCT passages can share a diagonal (templated pages with
    # equal-length differing middles) and the second would never extend.
    def norm(t: pa.Table) -> pa.Table:
        delta = np.asarray(t["pos_a"], dtype=np.int64) \
            - np.asarray(t["pos_b"], dtype=np.int64)
        da = np.asarray(t["doc_a"], dtype=np.int64)
        db = np.asarray(t["doc_b"], dtype=np.int64)
        with np.errstate(over="ignore"):
            dk = (da.view(U64) * U64(0x9E3779B97F4A7C15)
                  ^ db.view(U64) * U64(0xC2B2AE3D27D4EB4F)
                  ^ delta.view(U64))
        return pa.table({
            "id_a": t["doc_a"], "id_b": t["doc_b"],
            "pos_a": t["pos_a"], "pos_b": t["pos_b"],
            "diag": pa.array((dk % U64(num_shards)).astype(np.int64)),
        })

    def diag_sort(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["id_a", "id_b", "pos_a", "pos_b"],
                              kind="stable") \
            [["id_a", "id_b", "pos_a", "pos_b"]]

    pairs_mat = pairs.map_batches(norm, batch_format="pyarrow") \
        .groupby("diag").map_groups(diag_sort, batch_format="pandas") \
        .materialize()
    if pairs_mat.count() == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc": pa.array([], type=pa.int64()),
            "start": pa.array([], type=pa.int64()),
            "end": pa.array([], type=pa.int64())}))
    cand = _candidate_rows(ds, id_column, pairs_mat,
                           {column: "__txt"}).materialize()
    joined = _attach_pair_payloads(pairs_mat, cand, id_column, "__txt",
                                   num_shards,
                                   carry_cols=["pos_a", "pos_b"])

    def extend(t: pa.Table) -> pa.Table:
        docs, starts, ends = [], [], []
        pa_arr = np.asarray(t["pos_a"], dtype=np.int64)
        pb_arr = np.asarray(t["pos_b"], dtype=np.int64)
        da_arr = np.asarray(t["id_a"], dtype=np.int64)
        db_arr = np.asarray(t["id_b"], dtype=np.int64)
        ta_col = _str(t["__txt_a"])
        tb_col = _str(t["__txt_b"])
        # process each diagonal's anchors in (pos) order and skip anchors
        # already inside a span this batch produced for the same diagonal
        # (a pure optimization — splitting a diagonal across batches only
        # costs duplicate extensions, which the span merge collapses)
        order = np.lexsort((pb_arr, pa_arr - pb_arr, db_arr, da_arr))
        last_key = None
        covered_end = -1
        for i in map(int, order):
            key = (int(da_arr[i]), int(db_arr[i]),
                   int(pa_arr[i]) - int(pb_arr[i]))
            if key == last_key and int(pb_arr[i]) + k <= covered_end:
                continue
            ta = ta_col[i].as_py().encode()
            tb = tb_col[i].as_py().encode()
            span = _extend_matches(ta, int(pa_arr[i]), tb,
                                   int(pb_arr[i]), k)
            if span is not None:
                last_key, covered_end = key, span[1]
                if span[1] - span[0] >= min_len:
                    docs.append(int(db_arr[i]))
                    starts.append(span[0])
                    ends.append(span[1])
            else:
                last_key, covered_end = None, -1
        return pa.table({
            "doc": pa.array(docs, type=pa.int64()),
            "start": pa.array(starts, type=pa.int64()),
            "end": pa.array(ends, type=pa.int64())})

    spans = joined.map_batches(extend, batch_format="pyarrow",
                               batch_size=None)

    # exact-dup spans surface once per shared anchor — merge per doc
    def add_doc_shard(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc"], dtype=np.int64)
        return t.append_column("dshard", pa.array(
            (d.view(U64) % U64(num_shards)).astype(np.int64)))

    def merge_spans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc", "start", "end"], kind="stable")
        d = df["doc"].to_numpy()
        s = df["start"].to_numpy()
        e = df["end"].to_numpy()
        out_d, out_s, out_e = [], [], []
        # vectorized interval union per doc: running max of end within doc
        new_doc = np.r_[True, d[1:] != d[:-1]]
        cur_e = -1
        for i in range(len(d)):
            if new_doc[i] or s[i] > cur_e:
                out_d.append(d[i]); out_s.append(s[i]); out_e.append(e[i])
                cur_e = e[i]
            else:
                cur_e = max(cur_e, e[i])
                out_e[-1] = cur_e
        return pd.DataFrame({
            "doc": np.array(out_d, dtype=np.int64),
            "start": np.array(out_s, dtype=np.int64),
            "end": np.array(out_e, dtype=np.int64)})

    return spans.map_batches(add_doc_shard, batch_format="pyarrow") \
        .groupby("dshard").map_groups(merge_spans, batch_format="pandas")


SPAN_MANIFEST = "manifest.json"
_span_part_cache: dict[str, tuple] = {}


class SpanStore:
    """Range-partitioned on-disk span table — the DropIdStore shape for
    (doc, start, end) rows, so passage removal streams with driver memory
    independent of how duplicated the corpus is. Files are doc-sorted
    parquet parts with a manifest of per-file [doc_lo, doc_hi] ranges and
    a BlockBloom over doc ids (docs without spans — the overwhelming
    majority — skip on the bloom miss)."""

    def __init__(self, path: str):
        import json

        self.path = path
        with open(os.path.join(path, SPAN_MANIFEST)) as fh:
            m = json.load(fh)
        self.n_spans = int(m["n_spans"])
        self.files = [os.path.join(path, f) for f in m["files"]]
        self.los = np.asarray(m["los"], dtype=np.int64)
        self.his = np.asarray(m["his"], dtype=np.int64)

    @classmethod
    def write(cls, spans_ds, path: str, *, fpp: float = 1e-3,
              rows_per_file: int = 1 << 22) -> "SpanStore":
        """Distributed-sort the (doc, start, end) Dataset by doc into
        `path`; bloom + manifest beside the parts."""
        import json

        import pyarrow.parquet as pq

        from ..sketch import sizing
        from ..sketch.block_bloom import BlockBloom
        from .sketch_build import build_sketch

        os.makedirs(path, exist_ok=True)
        if os.path.exists(os.path.join(path, SPAN_MANIFEST)):
            raise FileExistsError(
                f"span store already exists at {path}")
        n = spans_ds.count()
        files: list[str] = []
        los: list[int] = []
        his: list[int] = []
        if n == 0:
            bloom = BlockBloom(sizing.block_bytes_needed(1, fpp))
        else:
            bloom = build_sketch(
                spans_ds.select_columns(["doc"]), "doc", "block",
                {"bytes_": sizing.block_bytes_needed(n, fpp)})
            target = max(1, (n + rows_per_file - 1) // rows_per_file)
            data_dir = os.path.join(path, "spans")
            spans_ds.repartition(target).sort(["doc", "start"]) \
                .write_parquet(data_dir)
            for name in sorted(os.listdir(data_dir)):
                if not name.endswith(".parquet"):
                    continue
                fp = os.path.join(data_dir, name)
                md = pq.ParquetFile(fp).metadata
                if md.num_rows == 0:
                    os.unlink(fp)
                    continue
                doc_i = [i for i in range(md.num_row_groups)
                         if md.row_group(i).num_rows]
                stats = [md.row_group(i).column(0).statistics
                         for i in doc_i]
                files.append(os.path.join("spans", name))
                los.append(min(s.min for s in stats))
                his.append(max(s.max for s in stats))
        with open(os.path.join(path, "bloom.bin"), "wb") as fh:
            fh.write(bloom.to_bytes())
        order = np.argsort(np.asarray(los, dtype=np.int64),
                           kind="stable") if files \
            else np.empty(0, dtype=np.int64)
        manifest = {"n_spans": int(n),
                    "files": [files[i] for i in order],
                    "los": [int(los[i]) for i in order],
                    "his": [int(his[i]) for i in order]}
        tmp = os.path.join(path, SPAN_MANIFEST + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(path, SPAN_MANIFEST))
        return cls(path)

    def _part(self, f: str):
        import pyarrow.parquet as pq

        hit = _span_part_cache.get(f)
        if hit is None:
            t = pq.read_table(f)
            hit = _span_part_cache[f] = (
                t["doc"].to_numpy().astype(np.int64),
                t["start"].to_numpy().astype(np.int64),
                t["end"].to_numpy().astype(np.int64))
            while len(_span_part_cache) > 16:
                _span_part_cache.pop(next(iter(_span_part_cache)))
        return hit

    def spans_for(self, ids: np.ndarray):
        """(doc, start, end) arrays, (doc, start)-sorted, restricted to
        the requested doc ids — bloom prune then only overlapped parts."""
        from ..sketch.block_bloom import BlockBloom
        from ..sketch.hashing import hash_arrow_array
        from .dropstore import _load_bloom

        ids = np.unique(np.ascontiguousarray(ids, dtype=np.int64))
        empty = (np.empty(0, dtype=np.int64),) * 3
        if not len(ids) or not self.n_spans:
            return empty
        bloom = _load_bloom(os.path.join(self.path, "bloom.bin"))
        maybe = bloom.find_hashes(
            hash_arrow_array(pa.array(ids, type=pa.int64())))
        sus = ids[maybe]
        if not len(sus):
            return empty
        # every file whose [lo, hi] doc range contains a suspect: files
        # are globally doc-sorted so los AND his are nondecreasing; a doc
        # straddling several parts (all with lo <= doc <= hi) picks them
        # all via [first hi >= doc, first lo > doc)
        f_lo = np.searchsorted(self.his, sus, side="left")
        f_hi = np.searchsorted(self.los, sus, side="right")
        cand_files = set()
        for a, b in zip(f_lo, f_hi):
            cand_files.update(range(int(a), int(b)))
        got_d, got_s, got_e = [], [], []
        want = np.sort(sus)
        for f in sorted(cand_files):
            d, s, e = self._part(self.files[f])
            pos = np.searchsorted(want, d)
            hit = (pos < len(want)) & (
                want[np.minimum(pos, len(want) - 1)] == d)
            if hit.any():
                got_d.append(d[hit])
                got_s.append(s[hit])
                got_e.append(e[hit])
        if not got_d:
            return empty
        d = np.concatenate(got_d)
        s = np.concatenate(got_s)
        e = np.concatenate(got_e)
        order = np.lexsort((s, d))
        return d[order], s[order], e[order]


def remove_passages_fn(spans_source, column: str, id_column: str):
    """map_batches fn cutting each doc's spans out of `column`. The span
    table is carried as an ObjectRef to a (doc-sorted) pandas DataFrame
    (bounded broadcast) or a SpanStore path-attached on shared storage —
    the same auto-switch contract as the drop sets."""
    import ray

    store_path = spans_source.path \
        if isinstance(spans_source, SpanStore) else None

    def fn(t: pa.Table) -> pa.Table:
        ids = _str(t[id_column]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        col = _str(t[column])
        if store_path is not None:
            store = _span_attached(store_path)
            sdoc, ss_a, se_a = store.spans_for(ids)
            spans = pd.DataFrame({"doc": sdoc, "start": ss_a,
                                  "end": se_a})
        else:
            spans = ray.get(spans_source) if isinstance(
                spans_source, ray.ObjectRef) else spans_source
        sdoc = spans["doc"].to_numpy()
        lo = np.searchsorted(sdoc, ids, side="left")
        hi = np.searchsorted(sdoc, ids, side="right")
        affected = np.flatnonzero(lo != hi)
        if not len(affected):
            return t
        # span-free rows (the common case) stay in Arrow untouched;
        # only span-bearing rows cross into Python for byte surgery
        texts = col.take(pa.array(affected)).to_pylist()
        out = []
        ss = spans["start"].to_numpy()
        se = spans["end"].to_numpy()
        def snap(b: bytes, s: int, e: int) -> tuple[int, int]:
            """Shrink a byte span to UTF-8 character boundaries: byte
            extension can stop mid-multibyte-character (copies sharing a
            lead byte), and cutting there would leave dangling
            continuation bytes that break .decode(). Shrinking is always
            safe — the trimmed bytes were part of the duplicate."""
            while s < e and s < len(b) and (b[s] & 0xC0) == 0x80:
                s += 1  # finish the char straddling the left edge
            while e > s and e < len(b) and (b[e] & 0xC0) == 0x80:
                e -= 1  # keep the char straddling the right edge whole
            return s, e

        for i, txt in zip(affected, texts):
            if txt is None:
                out.append(txt)
                continue
            b = txt.encode()
            parts, cur = [], 0
            for j in range(lo[i], hi[i]):
                s2, e2 = snap(b, int(ss[j]), int(se[j]))
                if e2 <= s2:
                    continue
                parts.append(b[cur:s2])
                cur = max(cur, e2)
            parts.append(b[cur:])
            out.append(b"".join(parts).decode())
        import pyarrow.compute as pc

        mask = np.zeros(len(ids), dtype=bool)
        mask[affected] = True
        rebuilt = pc.replace_with_mask(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col,
            pa.array(mask), pa.array(out, type=col.type))
        return t.set_column(t.schema.get_field_index(column), column,
                            rebuilt)

    return fn


#: span tables up to this many rows broadcast via plasma (24 B/span);
#: larger ones spill to a range-partitioned SpanStore so driver memory
#: stays bounded at any boilerplate rate
SPAN_BROADCAST_LIMIT = 1 << 22


def remove_duplicate_passages(ds, column: str, id_column: str, *,
                              min_len: int = 64, k: int = 16,
                              w: int = 16, max_bucket: int = 1 << 20,
                              num_shards: int = 64,
                              broadcast_limit: int = SPAN_BROADCAST_LIMIT,
                              store_dir: str | None = None):
    """End-to-end substring dedup: every exact cross-document substring
    of >= min_len bytes survives only in its anchor-first occurrence;
    later copies are cut out of the text. Returns the rebuilt Dataset.
    Span tables <= broadcast_limit rows broadcast once; larger ones
    spill to a SpanStore under `store_dir` (default a fresh /tmp dir —
    point it at shared storage on a real cluster)."""
    import tempfile

    import ray

    spans_ds = duplicate_passage_spans(
        ds, column, id_column, min_len=min_len, k=k, w=w,
        max_bucket=max_bucket, num_shards=num_shards).materialize()
    n = spans_ds.count()
    if n == 0:
        return ds
    if n <= broadcast_limit:
        spans = spans_ds.to_pandas()
        if "doc" not in spans.columns:
            return ds
        spans = spans.sort_values(["doc", "start"]).reset_index(drop=True)
        source = ray.put(spans)
    else:
        source = SpanStore.write(
            spans_ds, store_dir or tempfile.mkdtemp(prefix="lfr-spans-",
                                                    dir="/tmp"))
    return ds.map_batches(remove_passages_fn(source, column, id_column),
                          batch_format="pyarrow")
