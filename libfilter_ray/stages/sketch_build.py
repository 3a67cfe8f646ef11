"""Distributed mergeable-sketch builds over Ray Data.

Two layers:

(Default batch_size=None everywhere: one partial per BLOCK. A fixed
batch_size would coalesce small blocks into few huge tasks and collapse
parallelism; block size is governed upstream by the read/repartition.)

1. **Per-block partials + tree merge** (the scale path, SURVEY.md §2.4):
   a stateless `map_batches` stage turns each input block into ONE small
   serialized partial sketch — a pure function of the block, so Ray task
   retries are safe and results are deterministic — then an associative
   merge tree (`map_batches` over batches of partials, repeated) reduces
   ~millions of partials without ever concentrating them on the driver.

2. **Grouped sketches** (per-lang / per-domain): per-batch *per-key*
   partials (pre-aggregation: at most one row per key per block leaves the
   map stage) -> optional salted first-stage groupby merge for hot keys ->
   final unsalted groupby merge. This is the north star's two-stage
   salted-key skew mitigation.

The reference's merge ops backing this: BlockBloom bitwise OR (implied by
c/lib/block.c construction), taffy-cuckoo union (c/lib/taffy-cuckoo.c:260-348),
level-wise OR for taffy-block — see SURVEY.md §2.6.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ..sketch import registry
from ..sketch.hashing import DEFAULT_SEED, hash_arrow_array


def _column_input(sketch) -> str:
    return getattr(sketch, "input", "hashes")


def _updates_from(batch_col, sketch, seed: int, pre_hashed: bool = False):
    """Feed an Arrow column into a sketch (hash it first if hash-consuming).

    pre_hashed=True: the column already holds 64-bit hashes (the reference's
    own API contract — it only ever sees pre-hashed keys, block.h:43-46);
    int64 columns are bit-reinterpreted as u64."""
    if pre_hashed:
        vals = batch_col.to_numpy(zero_copy_only=False)
        sketch.update(np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64))
    elif _column_input(sketch) == "hashes":
        sketch.update(hash_arrow_array(batch_col, seed=seed))
    elif _column_input(sketch) == "vectors":
        # list<float> column -> (n, dim) float64 matrix (null rows out);
        # flatten() respects offsets so sliced/filtered arrays are safe
        col = batch_col.combine_chunks() \
            if isinstance(batch_col, pa.ChunkedArray) else batch_col
        col = col.drop_null()
        if len(col):
            widths = np.diff(np.asarray(col.offsets, dtype=np.int64))
            if widths.min() != widths.max():
                raise ValueError(
                    "vector sketch: ragged list column (rows of "
                    f"width {widths.min()}..{widths.max()})")
            flat = np.asarray(col.flatten(), dtype=np.float64)
            sketch.update(flat.reshape(len(col), int(widths[0])))
    else:
        vals = batch_col.to_numpy(zero_copy_only=False).astype(np.float64)
        sketch.update(vals[~np.isnan(vals)])
    return sketch


class _PartialBuilder:
    """Stateless per-block partial: block -> one serialized sketch row."""

    def __init__(self, kind: str, params: dict, column: str, seed: int,
                 pre_hashed: bool = False):
        self.kind, self.params, self.column, self.seed = kind, params, column, seed
        self.pre_hashed = pre_hashed

    def __call__(self, batch: pa.Table) -> pa.Table:
        sk = registry.make(self.kind, **self.params)
        _updates_from(batch[self.column], sk, self.seed, self.pre_hashed)
        return pa.table({
            "kind": pa.array([self.kind]),
            "payload": pa.array([sk.to_bytes()], type=pa.large_binary()),
            "rows": pa.array([batch.num_rows], type=pa.int64()),
        })


def _merge_payload_batch(kind: str):
    cls = registry.get(kind)

    def merge_batch(batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        acc = cls.from_bytes(payloads[0].as_py())
        for p in payloads[1:]:
            acc = acc.merge(cls.from_bytes(p.as_py()))
        return pa.table({
            "kind": pa.array([kind]),
            "payload": pa.array([acc.to_bytes()], type=pa.large_binary()),
            "rows": pa.array([int(pa.compute.sum(batch["rows"]).as_py() or 0)],
                             type=pa.int64()),
        })

    return merge_batch


def build_sketch(ds, column: str, kind: str, params: dict | None = None, *,
                 seed: int = DEFAULT_SEED, batch_size: int | None = None,
                 merge_fanin: int = 64, driver_fanin: int = 256,
                 pre_hashed: bool = False):
    """Build ONE global sketch of `column` over the whole Dataset.

    read -> map_batches(partial per block) -> tree merge (map_batches over
    partial batches, log_fanin rounds) -> small driver-side final merge.
    Returns the finalized sketch object.
    """
    params = params or {}
    partials = ds.map_batches(
        _PartialBuilder(kind, params, column, seed, pre_hashed),
        batch_format="pyarrow", batch_size=batch_size)
    # Tree merge: each round collapses `merge_fanin` partials into one.
    # Partial counts shrink geometrically; at 100 TB (~1M blocks) this is
    # 3 rounds of tiny tasks instead of 1M payloads on the driver.
    # Each round materializes its (small — KBs per row) partial set so the
    # next round doesn't re-execute the full upstream lineage.
    partials = partials.materialize()
    rows = partials.count()
    while rows > driver_fanin:
        partials = partials.repartition(max(1, rows // merge_fanin)) \
            .map_batches(_merge_payload_batch(kind), batch_format="pyarrow",
                         batch_size=merge_fanin).materialize()
        rows = partials.count()
    cls = registry.get(kind)
    out = None
    for row in partials.take_all():
        sk = cls.from_bytes(row["payload"])
        out = sk if out is None else out.merge(sk)
    if out is None:
        out = registry.make(kind, **params)
    return out.finalize()


def _null_count(indices) -> int:
    return indices.null_count


class _GroupedPartialBuilder:
    """Per-block, per-key partial sketches (pre-aggregation before shuffle).

    Rows with a NULL key are EXCLUDED from grouped builds (and from the
    returned per-key `rows` counts) — unlike SQL GROUP BY, which groups
    them; pre-filter nulls (or fill a sentinel) if they must be counted.
    """

    def __init__(self, kind: str, params: dict, column: str, key: str,
                 seed: int, num_salts: int):
        self.kind, self.params = kind, params
        self.column, self.key, self.seed = column, key, seed
        self.num_salts = num_salts

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keys_out, salts_out, payloads, counts = [], [], [], []
        # group rows of this block by key (vectorized dictionary-encode)
        enc = batch[self.column]
        keycol = batch[self.key]
        dict_arr = pc.dictionary_encode(
            keycol.combine_chunks() if isinstance(keycol, pa.ChunkedArray) else keycol)
        codes = np.asarray(dict_arr.indices)
        uniq = dict_arr.dictionary
        col = enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc
        # Deterministic per-block salt (pure function of block content ->
        # retry-safe): hash of the block's first column value + row count.
        from ..sketch.hashing import splitmix64
        if self.num_salts > 1 and batch.num_rows:
            try:
                block_fp = int(hash_arrow_array(col.slice(0, 1),
                                                seed=7)[0])
            except TypeError:
                # vector (list<float>) columns aren't key-hashable —
                # fingerprint the block off its first KEY value instead
                # (same retry-safe pure-function-of-content property)
                kc = dict_arr.dictionary.take(
                    dict_arr.indices.slice(0, 1).cast(pa.int64()))
                block_fp = int(hash_arrow_array(kc, seed=7)[0])
            # int() BEFORE the modulo: numpy-u64 % python-int promotes to
            # float64 and rounds away the low bits (salt was always 0)
            salt = int(splitmix64(np.array([block_fp ^ batch.num_rows],
                                           dtype=np.uint64))[0]) % self.num_salts
        else:
            salt = 0
        fmts = []
        probe = registry.make(self.kind, **self.params)
        # raw mode only for hash-consuming sketches (value sketches like
        # t-digest/KLL must see the raw values, and their partials are small)
        raw_ok = _column_input(probe) == "hashes"
        sk_bytes = (probe.size_in_bytes() if hasattr(probe, "size_in_bytes")
                    else len(probe.to_bytes()))
        budget = sk_bytes // 2 if raw_ok else 0
        # Sort-split, NOT per-key filter: one argsort of the key codes, one
        # column take/hash pass, then every key's rows are a ZERO-COPY slice
        # — per-key cost is O(its rows), so thousands of keys (per-domain
        # builds) stay linear instead of keys x column-scan quadratic.
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
        # the take is skippable only when the identity order is provably
        # correct: a single distinct key AND no null-key rows (null codes
        # sort past the last bound, so with them present the unsorted
        # column would attribute the wrong rows to the key)
        take_needed = len(uniq) > 1 or _null_count(dict_arr.indices) > 0
        col_sorted = col.take(pa.array(order)) if take_needed else col
        hashed_sorted = (hash_arrow_array(col_sorted, seed=self.seed)
                         if raw_ok else None)
        for code in range(len(uniq)):
            b0, b1 = int(bounds[code]), int(bounds[code + 1])
            n_rows = b1 - b0
            # Shuffle-volume guard (the 100 TB lever): a per-block per-key
            # partial of a FIXED-SIZE sketch (e.g. a corpus-sized BlockBloom)
            # costs size_in_bytes regardless of how few rows it holds, and
            # partial count scales with blocks x keys. When the raw 8-byte
            # hash list is smaller, ship THAT and let the reducer insert —
            # shuffle bytes become min(8*rows, sketch_bytes) per partial.
            if raw_ok and n_rows * 8 < budget:
                payloads.append(hashed_sorted[b0:b1].tobytes())
                fmts.append("raw")
            else:
                sk = registry.make(self.kind, **self.params)
                if raw_ok:
                    sk.update(hashed_sorted[b0:b1])
                else:
                    _updates_from(col_sorted.slice(b0, n_rows), sk, self.seed)
                payloads.append(sk.to_bytes())
                fmts.append("sketch")
            keys_out.append(uniq[code].as_py())
            salts_out.append(salt)
            counts.append(n_rows)
        # explicit key type: pa.array([]) would infer NULL for an empty
        # block and crash downstream schema unification / shard hashing
        return pa.table({
            self.key: pa.array(keys_out, type=keycol.type),
            "salt": pa.array(salts_out, type=pa.int32()),
            "fmt": pa.array(fmts, type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "rows": pa.array(counts, type=pa.int64()),
        })


def _add_merge_shard(key: str, num_shards: int, with_salt: bool):
    """map_batches callable tagging partial rows with a merge shard: a pure
    hash of (key[, salt]) so one (key, salt) group never splits across
    shards. Sharded merges run ONE Ray task per shard with a pandas groupby
    inside — at thousands of keys (per-domain builds) this replaces
    keys x salts Ray map_groups calls with `num_shards` tasks."""
    from ..sketch.hashing import splitmix64

    def add(t: pa.Table) -> pa.Table:
        kh = hash_arrow_array(t[key], seed=0x5AAD)
        if with_salt:
            kh = kh ^ (np.asarray(t["salt"], dtype=np.int64).view(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15))
        shard = (splitmix64(kh) % np.uint64(num_shards)).astype(np.int64)
        return t.append_column("mshard", pa.array(shard, type=pa.int64()))

    return add


def build_grouped_sketches(ds, key: str, column: str, kind: str,
                           params: dict | None = None, *,
                           seed: int = DEFAULT_SEED,
                           batch_size: int | None = None,
                           num_salts: int = 8, num_shards: int = 32):
    """Per-key sketches via the salted two-stage merge.

    map_batches(per-key partials) -> sharded groupby merge on (key, salt)
    -> sharded groupby merge on key. Returns a pandas DataFrame
    (key, payload, rows). Hot keys (Zipfian lang/domain) spread over
    `num_salts` first-stage reducers; merge tasks are per SHARD (hash range
    of keys), not per key, so high-cardinality keys stay cheap.
    """
    import pandas as pd

    params = params or {}
    cls = registry.get(kind)
    partials = ds.map_batches(
        _GroupedPartialBuilder(kind, params, column, key, seed, num_salts),
        batch_format="pyarrow", batch_size=batch_size)

    def merge_frame(by):
        def merge(df: pd.DataFrame) -> pd.DataFrame:
            parts = []
            for _, g in df.groupby(by, sort=False):
                acc = None
                raw = [p for p, f in zip(g["payload"], g["fmt"])
                       if f == "raw"]
                for p, f in zip(g["payload"], g["fmt"]):
                    if f == "sketch":
                        sk = cls.from_bytes(p)
                        acc = sk if acc is None else acc.merge(sk)
                if raw:
                    if acc is None:
                        acc = registry.make(kind, **params)
                    acc.update(np.frombuffer(b"".join(raw), dtype=np.uint64))
                first = g.iloc[:1].copy()
                first["payload"] = [acc.to_bytes()]
                first["fmt"] = ["sketch"]
                first["rows"] = g["rows"].sum()
                parts.append(first)
            return pd.concat(parts, ignore_index=True) \
                .drop(columns=["mshard"])
        return merge

    stage1 = partials \
        .map_batches(_add_merge_shard(key, num_shards, True),
                     batch_format="pyarrow") \
        .groupby("mshard").map_groups(merge_frame([key, "salt"]),
                                      batch_format="pandas")
    final = stage1 \
        .map_batches(_add_merge_shard(key, num_shards, False),
                     batch_format="pyarrow") \
        .groupby("mshard").map_groups(merge_frame([key]),
                                      batch_format="pandas")
    out = final.to_pandas()
    if not len(out):  # fully empty input: typed empty frame, no KeyError
        return pd.DataFrame({key: [], "payload": [], "rows": []})
    out = out.drop(columns=["salt", "fmt"]).sort_values(key)
    return out.reset_index(drop=True)


class _MultiGroupedPartialBuilder:
    """One pass, many sketches: per-block per-key partials for a list of
    (name, kind, params, column) specs. At 100 TB this is the pattern that
    matters — one read feeds every sketch instead of one pipeline each.

    Same shuffle-volume guard as the single-sketch builder: a hash-consuming
    spec whose per-key row count is small ships the raw 8-byte hash list
    ("raw" fmt) instead of a fixed-size sketch; each column is hashed ONCE
    per block and reused by every spec consuming it."""

    def __init__(self, specs, key: str, seed: int, num_salts: int = 8):
        self.specs, self.key, self.seed = specs, key, seed
        self.num_salts = num_salts

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keycol = batch[self.key]
        dict_arr = pc.dictionary_encode(
            keycol.combine_chunks() if isinstance(keycol, pa.ChunkedArray)
            else keycol)
        codes = np.asarray(dict_arr.indices)
        uniq = dict_arr.dictionary
        cols, hashed = {}, {}
        for (_, _, _, column) in self.specs:
            if column not in cols:
                c = batch[column]
                cols[column] = c.combine_chunks() \
                    if isinstance(c, pa.ChunkedArray) else c
        probes = {name: registry.make(kind, **params)
                  for (name, kind, params, _c) in self.specs}
        budgets = {name: (p.size_in_bytes() // 2
                          if _column_input(p) == "hashes"
                          and hasattr(p, "size_in_bytes")
                          else len(p.to_bytes()) // 2
                          if _column_input(p) == "hashes" else 0)
                   for name, p in probes.items()}
        from ..sketch.hashing import splitmix64
        if self.num_salts > 1 and batch.num_rows:
            first_col = cols[self.specs[0][3]]
            block_fp = int(hash_arrow_array(first_col.slice(0, 1), seed=7)[0])
            salt = int(splitmix64(np.array([block_fp ^ batch.num_rows],
                                           dtype=np.uint64))[0]) % self.num_salts
        else:
            salt = 0
        out: dict[str, list] = {self.key: [], "rows": [], "salt": []}
        for (name, *_rest) in self.specs:
            out[f"payload_{name}"] = []
            out[f"fmt_{name}"] = []
        # Sort-split (see _GroupedPartialBuilder): one stable argsort of the
        # key codes, one take + one hash pass per column, then every key's
        # rows are a zero-copy slice — linear in rows even at thousands of
        # keys. Stable order preserves within-key row order, so
        # order-sensitive value sketches (t-digest) stay byte-identical.
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
        # see _GroupedPartialBuilder: null-key rows sort past the last
        # bound, so identity order is only safe with one key AND no nulls
        take_needed = len(uniq) > 1 or _null_count(dict_arr.indices) > 0
        sorted_cols = {c: (v.take(pa.array(order)) if take_needed else v)
                       for c, v in cols.items()}
        # hash each needed column once for the whole block (sorted order)
        for (name, kind, params, column) in self.specs:
            if budgets[name] and column not in hashed:
                hashed[column] = hash_arrow_array(sorted_cols[column],
                                                  seed=self.seed)
        for code in range(len(uniq)):
            b0, b1 = int(bounds[code]), int(bounds[code + 1])
            n_rows = b1 - b0
            out[self.key].append(uniq[code].as_py())
            out["rows"].append(n_rows)
            out["salt"].append(salt)
            for (name, kind, params, column) in self.specs:
                if budgets[name] and n_rows * 8 < budgets[name]:
                    out[f"payload_{name}"].append(
                        hashed[column][b0:b1].tobytes())
                    out[f"fmt_{name}"].append("raw")
                else:
                    sk = registry.make(kind, **params)
                    # reuse the block-level hash pass ONLY for
                    # hash-consuming specs (budgets>0); value sketches
                    # (t-digest/KLL) must see the raw values
                    if budgets[name] and column in hashed:
                        sk.update(hashed[column][b0:b1])
                    else:
                        _updates_from(sorted_cols[column].slice(b0, n_rows),
                                      sk, self.seed)
                    out[f"payload_{name}"].append(sk.to_bytes())
                    out[f"fmt_{name}"].append("sketch")
        arrays = {self.key: pa.array(out[self.key], type=keycol.type),
                  "salt": pa.array(out["salt"], type=pa.int32()),
                  "rows": pa.array(out["rows"], type=pa.int64())}
        for (name, *_r) in self.specs:
            arrays[f"payload_{name}"] = pa.array(out[f"payload_{name}"],
                                                 type=pa.large_binary())
            arrays[f"fmt_{name}"] = pa.array(out[f"fmt_{name}"],
                                             type=pa.string())
        return pa.table(arrays)


def build_grouped_multi(ds, key: str, specs, *, seed: int = DEFAULT_SEED,
                        batch_size: int | None = None, num_salts: int = 8,
                        num_shards: int = 32):
    """Per-key sketches for several (name, kind, params, column) specs in ONE
    pass over the data + the salted two-stage shuffle of tiny partial rows.
    Merge tasks are sharded by key-hash (see _add_merge_shard), not per key.
    Returns pandas (key, rows, payload_<name>...)."""
    import pandas as pd

    specs = list(specs)
    partials = ds.map_batches(
        _MultiGroupedPartialBuilder(specs, key, seed, num_salts),
        batch_format="pyarrow", batch_size=batch_size)
    classes = {name: registry.get(kind) for (name, kind, _p, _c) in specs}
    paramsby = {name: params for (name, _k, params, _c) in specs}
    kinds = {name: kind for (name, kind, _p, _c) in specs}

    def merge_group(df: pd.DataFrame, finalize: bool) -> pd.DataFrame:
        first = df.iloc[:1].copy()
        for name, cls in classes.items():
            pcol, fcol = f"payload_{name}", f"fmt_{name}"
            acc = None
            raw = [p for p, f in zip(df[pcol], df[fcol]) if f == "raw"]
            for p, f in zip(df[pcol], df[fcol]):
                if f == "sketch":
                    sk = cls.from_bytes(p)
                    acc = sk if acc is None else acc.merge(sk)
            if raw:
                if acc is None:
                    acc = registry.make(kinds[name], **paramsby[name])
                acc.update(np.frombuffer(b"".join(raw), dtype=np.uint64))
            if finalize:
                acc = acc.finalize()
            first[pcol] = [acc.to_bytes()]
            first[fcol] = ["sketch"]
        first["rows"] = df["rows"].sum()
        return first

    def merge_frame(by, finalize: bool):
        def merge(df: pd.DataFrame) -> pd.DataFrame:
            parts = [merge_group(g, finalize)
                     for _, g in df.groupby(by, sort=False)]
            return pd.concat(parts, ignore_index=True) \
                .drop(columns=["mshard"])
        return merge

    stage1 = partials \
        .map_batches(_add_merge_shard(key, num_shards, True),
                     batch_format="pyarrow") \
        .groupby("mshard").map_groups(merge_frame([key, "salt"], False),
                                      batch_format="pandas")
    final = stage1 \
        .map_batches(_add_merge_shard(key, num_shards, False),
                     batch_format="pyarrow") \
        .groupby("mshard").map_groups(merge_frame([key], True),
                                      batch_format="pandas")
    drop = ["salt"] + [f"fmt_{name}" for name in classes]
    out = final.to_pandas()
    if not len(out):  # fully empty input: typed empty frame, no KeyError
        cols = {key: [], "rows": []}
        cols.update({f"payload_{name}": [] for name in classes})
        return pd.DataFrame(cols)
    return out.drop(columns=drop).sort_values(key) \
        .reset_index(drop=True)


def build_sketch_exact(ds, column: str, kind: str = "taffy_block",
                       params: dict | None = None, *,
                       seed: int = DEFAULT_SEED,
                       batch_size: int | None = None,
                       pre_hashed: bool = False):
    """Partition-INVARIANT exact build for growth-order-sensitive sketches.

    TaffyBlock's distributed level-OR merge is exact only while both sides
    share one level plan (taffy_block.py docstring) — growth under merge
    degrades the fpp plan. This path sidesteps merge entirely: the partial
    for each block is the RAW 8-byte hash list (concatenation-mergeable
    under ANY partitioning — the grouped builder's own "raw" fmt,
    `_GroupedPartialBuilder`), and finalize canonicalizes the multiset by
    sorting before a single-writer insert inside ONE remote task. The
    result is byte-identical to a sequential build over the sorted hash
    stream no matter how the input was partitioned (property-tested).

    Scale shape: hashing runs distributed in map_batches; only the 8 B/row
    hash stream funnels into the finalize worker (never the driver) via
    streaming_split. The single-writer finalize is inherent: byte-exact
    growable-filter construction is sequential in the reference too
    (c/lib/taffy-block.c:9-32)."""
    import ray

    params = params or {}

    def to_hashes(t: pa.Table) -> pa.Table:
        if pre_hashed:
            h = np.ascontiguousarray(
                t[column].to_numpy(zero_copy_only=False),
                dtype=np.int64).view(np.uint64)
        else:
            h = hash_arrow_array(t[column], seed=seed)
        return pa.table({"h": pa.array(h.view(np.int64), type=pa.int64())})

    hashed = ds.map_batches(to_hashes, batch_format="pyarrow",
                            batch_size=batch_size)

    @ray.remote
    def finalize(it) -> bytes:
        chunks = [np.ascontiguousarray(
            b["h"].to_numpy(zero_copy_only=False), dtype=np.int64)
            .view(np.uint64)
            for b in it.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows]
        h = (np.sort(np.concatenate(chunks), kind="stable")
             if chunks else np.empty(0, dtype=np.uint64))
        sk = registry.make(kind, **params)
        sk.update(h)
        return sk.to_bytes()

    it, = hashed.streaming_split(1)
    out = ray.get(finalize.remote(it))
    return registry.get(kind).from_bytes(out).finalize()


def build_sketch_actor_pool(ds, column: str, kind: str,
                            params: dict | None = None, *,
                            seed: int = DEFAULT_SEED, concurrency: int = 4,
                            pre_hashed: bool = False):
    """Actor-pool accumulate variant of `build_sketch` (SURVEY.md §7.2):
    each long-lived actor consumes one `streaming_split` iterator and keeps
    ONE accumulator across all its batches, flushing a single partial at end
    — `concurrency` partials total instead of one per block (fewer merges;
    the high-throughput shape for corpus-sized accumulators).

    This is the one stage expressed with raw Ray actors: Dataset.map_batches
    offers no end-of-stream flush hook, so the accumulate-then-flush
    semantics genuinely need `streaming_split` + `@ray.remote` consumers.

    For order-invariant sketches the result is byte-identical to
    `build_sketch` (asserted in tests). Caveat: actor state is lost on actor
    failure — for retry-safe checkpointable builds use the per-block partial
    path or `state/checkpoint.py` (SURVEY.md §4.2).
    """
    import ray

    params = params or {}

    # num_cpus=0.5: the consumers BLOCK on streaming_split iterators that
    # only advance while the producing Dataset's read/map tasks can get
    # CPUs — full-CPU consumers can deadlock the whole job when
    # concurrency (+ any actor pool still tearing down from a previous
    # stage) reaches the session's CPU count (classic Ray
    # consumer-starves-producer deadlock; observed under num_cpus=4 with
    # concurrency=3 and one straggler actor). Half a CPU keeps the
    # accumulate work scheduled while guaranteeing producer headroom.
    @ray.remote(num_cpus=0.5)
    def consume(it, kind: str, params: dict, column: str, seed: int,
                pre_hashed: bool) -> bytes:
        sk = registry.make(kind, **params)
        for batch in it.iter_batches(batch_size=None, batch_format="pyarrow"):
            if batch.num_rows:
                _updates_from(batch[column], sk, seed, pre_hashed)
        return sk.to_bytes()

    its = ds.streaming_split(concurrency, equal=False)
    payloads = ray.get([
        consume.remote(it, kind, params, column, seed, pre_hashed)
        for it in its])
    cls = registry.get(kind)
    out = cls.from_bytes(payloads[0])
    for p in payloads[1:]:
        out = out.merge(cls.from_bytes(p))
    return out.finalize()


def grouped_probe_counts(payloads_ref, from_bytes, key: str, column: str, *,
                         seed: int = DEFAULT_SEED, count_name: str = "n",
                         found_name: str = "found"):
    """A map_batches FUNCTION emitting per-key membership counts against a
    broadcast dict of per-key serialized filters: dictionary-encode the key
    column once per batch, one vectorized find_hashes per present key, one
    tiny (key, n, found) row per key per batch for the downstream Sum.

    `payloads_ref` = ray.put({key: filter_bytes}); filters deserialize ONCE
    per worker process (stages/broadcast.py memo). The shared body behind
    the flagship / per-(lang,source) / incremental-growth probes — fix a
    probe bug here, not in three copies."""
    import pyarrow.compute as pc

    from .broadcast import cached_broadcast

    def probe(t: pa.Table) -> pa.Table:
        fs = cached_broadcast(
            payloads_ref,
            lambda pl: {k: from_bytes(v) for k, v in pl.items()})
        keycol = t[key]
        dict_arr = pc.dictionary_encode(
            keycol.combine_chunks()
            if isinstance(keycol, pa.ChunkedArray) else keycol)
        codes = np.asarray(dict_arr.indices)
        vals = t[column]
        vals = vals.combine_chunks() \
            if isinstance(vals, pa.ChunkedArray) else vals
        keys, n, found = [], [], []
        for code in range(len(dict_arr.dictionary)):
            kv = dict_arr.dictionary[code].as_py()
            mask = codes == code
            keys.append(kv)
            n.append(int(mask.sum()))
            f = fs.get(kv)
            if f is None:
                # key absent from the broadcast filter set (probe corpus
                # wider than the build corpus): nothing can be a member
                found.append(0)
                continue
            h = hash_arrow_array(vals.filter(pa.array(mask)), seed=seed)
            found.append(int(f.find_hashes(h).sum()))
        return pa.table({key: pa.array(keys, type=pa.string()),
                         count_name: pa.array(n, type=pa.int64()),
                         found_name: pa.array(found, type=pa.int64())})

    return probe


def probe_stage(sketch_bytes_ref, kind: str, column: str, *,
                seed: int = DEFAULT_SEED, out_column: str = "found"):
    """A map_batches callable CLASS probing rows against a broadcast sketch.

    The serialized sketch is `ray.put` once on the driver; each actor
    deserializes it ONCE in __init__ (not per batch).
    """

    class Prober:
        def __init__(self):
            import ray
            cls = registry.get(kind)
            self.sketch = cls.from_bytes(ray.get(sketch_bytes_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            hashes = hash_arrow_array(batch[column], seed=seed)
            found = self.sketch.find_hashes(hashes)
            return batch.append_column(out_column, pa.array(found))

    return Prober
