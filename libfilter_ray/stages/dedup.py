"""Distributed deduplication over Ray Data: exact, MinHash+LSH, SimHash,
and embedding-cosine near-dup.

Engine additions beyond the reference (training-data family). Shapes:

- **exact_dedup**: hash-partition + per-group first. The shuffle key is the
  64-bit content hash of the dedup column, NOT the full payload — only
  (hash, id) rows move through the groupby; survivors then filter the full
  table via the broadcast-Bloom semi-join pattern (SURVEY.md §2.5), so the
  wide columns (html!) never shuffle. At 100 TB the all-to-all moves 16
  bytes/row.
- **minhash_lsh / simhash near-dup**: vectorized signatures in map_batches ->
  flat_map to (band, band_key, id) candidate rows -> groupby(band_key) emits
  candidate pairs (only buckets with >1 member — rare) -> exact verification
  (true Jaccard / Hamming) on the candidates only -> union-find clustering
  of the (tiny) confirmed pair list -> keep min id per cluster.
  Partitioning assumption: bucket sizes are small (hash-random); a
  pathological bucket (all-identical corpus) degrades to one group —
  cap `max_bucket` and sample within it.
- **embedding near-dup**: random-hyperplane LSH bucket key per row ->
  groupby(bucket) -> in-bucket pairwise cosine >= threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.shingles import (hamming64, jaccard_pairwise, lsh_band_keys,
                                  minhash_signatures, simhash64)
from ..sketch.hashing import hash_arrow_array

U64 = np.uint64


def _str(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_keys(ds, column: str, id_column: str):
    """Dataset of surviving ids: one (min id) per distinct content hash.

    map_batches(project to (content_hash, id)) -> groupby(hash) -> min(id).
    Only 16-byte rows shuffle. NB the result is keyed on the 64-bit hash —
    `exact_dedup` adds the exact confirmation pass that makes the overall
    dedup collision-proof."""
    from ray.data.aggregate import Count, Min

    def project(t: pa.Table) -> pa.Table:
        # int64 bit-view of the u64 hash: Ray group keys round-trip through
        # Python ints, and >2^63 values overflow the native conversion
        return pa.table({
            "content_hash": pa.array(
                hash_arrow_array(t[column]).view(np.int64), type=pa.int64()),
            id_column: t[id_column],
        })

    proj = ds.map_batches(project, batch_format="pyarrow")
    return proj.groupby("content_hash").aggregate(
        Min(id_column, alias_name="keep_id"),
        Count(alias_name="n_members"))


def exact_dedup(ds, column: str, id_column: str):
    """Full exact dedup: survivors' ids -> broadcast exact-set semi-join of
    the original dataset (wide columns never shuffle).

    Collision-proof: hash groups with >1 member (the only place a 64-bit
    collision could silently drop a distinct payload — expected ~50% odds at
    5e9 rows) are re-verified on the EXACT payload: their rows' payloads are
    fetched (tiny set relative to the corpus), grouped by true value, and
    any distinct payload that lost its min-id to a colliding neighbor is
    added back to the survivor set."""
    import ray

    keep = exact_dedup_keys(ds, column, id_column).to_pandas()
    multi = keep[keep["n_members"] > 1]
    extra_ids: list[int] = []
    if len(multi):
        cand = _rows_in_hash_groups(ds, column, id_column,
                                    multi["content_hash"])
        by_val: dict[str, int] = {}
        for i, v in sorted(zip(cand[id_column].astype(int), cand[column])):
            if v not in by_val:
                by_val[v] = i
        confirmed = set(by_val.values())
        extra_ids = sorted(confirmed - set(multi["keep_id"].astype(int)))
    keep_ids = np.sort(np.concatenate(
        [keep["keep_id"].to_numpy().astype(np.int64),
         np.array(extra_ids, dtype=np.int64)]))
    ref = ray.put(keep_ids)

    class KeepFilter:
        def __init__(self):
            self.ids = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = _str(t[id_column]).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return t.filter(pa.array(np.isin(ids, self.ids)))

    return ds.map_batches(KeepFilter, batch_format="pyarrow", concurrency=2)




def _rows_in_hash_groups(ds, column: str, id_column: str, hashes):
    """(id, value) rows whose content hash is in `hashes` — ONE broadcast
    filter pass (ids and payloads together; a separate id pass would double
    the read)."""
    import ray

    hset = ray.put(np.sort(np.asarray(hashes, dtype=np.int64)))

    class Pick:
        def __init__(self):
            self.h = ray.get(hset)

        def __call__(self, t: pa.Table) -> pa.Table:
            h = hash_arrow_array(t[column]).view(np.int64)
            return t.select([id_column, column]) \
                .filter(pa.array(np.isin(h, self.h)))

    return ds.map_batches(Pick, batch_format="pyarrow",
                          concurrency=2).to_pandas()


# ---------------------------------------------------------------------------
# candidate-pair machinery shared by minhash / simhash / embedding paths
# ---------------------------------------------------------------------------

def _pairs_from_buckets(df: pd.DataFrame, id_column: str,
                        max_bucket: int = 64) -> pd.DataFrame:
    """All unordered id pairs within one bucket (capped against pathological
    buckets; the cap is logged upstream via the bucket-size histogram)."""
    ids = np.sort(df[id_column].to_numpy())[:max_bucket]
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []}, dtype=np.int64)
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})


def _union_find(pairs: np.ndarray, ids: np.ndarray) -> dict[int, int]:
    """Cluster confirmed duplicate pairs; returns id -> cluster-min-id.
    Driver-side on the (rare) confirmed pairs only."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {int(i): find(int(i)) for i in ids}


def _candidate_pairs(buckets, key: str, id_column: str, *,
                     extra_cols: list[str] | None = None,
                     max_bucket: int = 64) -> pd.DataFrame:
    """Unordered id pairs within each bucket, computed by a vectorized
    sorted-run scan over the collected (bucket_key, id) rows.

    The bucket table is 16-24 bytes/row — at this test scale it collects to
    the driver; the multi-member buckets (the only ones producing pairs) are
    rare, so the pair loop touches hundreds of runs, not millions of rows.
    At 10^12-row scale, shard this by `groupby(key)` ranges first (same run
    scan inside map_groups over RANGES of keys, not one group per bucket —
    per-bucket map_groups pays Python overhead per tiny group)."""
    cols = [key, id_column] + list(extra_cols or [])
    df = buckets.select_columns(cols).to_pandas()
    df = df.sort_values([key, id_column], kind="stable")
    kv = df[key].to_numpy()
    ids = df[id_column].to_numpy()
    run_starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
    run_ends = np.r_[run_starts[1:], len(kv)]
    out_a, out_b, out_extra_a, out_extra_b = [], [], [], []
    extras = {c: df[c].to_numpy() for c in (extra_cols or [])}
    for s, e in zip(run_starts, run_ends):
        n = e - s
        if n < 2:
            continue
        n = min(n, max_bucket)
        uniq_ids = np.unique(ids[s:s + n])
        if len(uniq_ids) < 2:
            continue
        a, b = np.triu_indices(len(uniq_ids), k=1)
        out_a.append(uniq_ids[a])
        out_b.append(uniq_ids[b])
        if extras:
            # map each unique id back to its first extra value in the run
            first_idx = s + np.searchsorted(ids[s:s + n], uniq_ids)
            for c in extras:
                out_extra_a.append(extras[c][first_idx][a])
                out_extra_b.append(extras[c][first_idx][b])
    if not out_a:
        return pd.DataFrame({"id_a": [], "id_b": []})
    res = pd.DataFrame({"id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b)})
    if extras:
        c = list(extras)[0]
        res["sim_a"] = np.concatenate(out_extra_a)
        res["sim_b"] = np.concatenate(out_extra_b)
    return res.drop_duplicates(subset=["id_a", "id_b"]).reset_index(drop=True)


def minhash_near_dup_pairs(ds, column: str, id_column: str, *, k: int = 5,
                           num_perm: int = 128, bands: int = 16,
                           threshold: float = 0.7,
                           batch_size: int = 4096) -> pd.DataFrame:
    """Confirmed near-duplicate pairs (exact Jaccard >= threshold) found via
    MinHash+LSH banding. Returns (id_a, id_b, jaccard) pandas.

    Stage 1 (map_batches): per-row signatures -> (band_key, id) rows.
    Stage 2 (groupby band_key): candidate pairs from multi-member buckets.
    Stage 3 (verify): exact k-shingle Jaccard on candidate texts only —
    texts fetched via a broadcast dict of the candidate ids (tiny set).
    """
    import ray

    def sig_stage(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(t[column], k=k, num_perm=num_perm)
        keys = lsh_band_keys(sig, bands=bands)
        n = t.num_rows
        ids = _str(t[id_column]).to_numpy(zero_copy_only=False)
        return pa.table({
            "band_key": pa.array(keys.ravel().view(np.int64),
                                 type=pa.int64()),
            id_column: pa.array(np.repeat(ids, bands)),
        })

    buckets = ds.map_batches(sig_stage, batch_format="pyarrow",
                             batch_size=batch_size)
    cand = _candidate_pairs(buckets, "band_key", id_column)
    if not len(cand):
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    cand = cand.drop_duplicates().reset_index(drop=True)

    # verification: fetch candidate texts once (ids are rare), broadcast
    need = np.unique(np.concatenate([cand["id_a"], cand["id_b"]]))
    texts = _collect_texts(ds, column, id_column, need)
    ta = pa.array([texts[int(i)] for i in cand["id_a"]], type=pa.large_string())
    tb = pa.array([texts[int(i)] for i in cand["id_b"]], type=pa.large_string())
    jac = jaccard_pairwise(ta, tb, k=k)
    out = cand.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


def _collect_texts(ds, column: str, id_column: str,
                   ids: np.ndarray) -> dict[int, str]:
    """Pull `column` for the given (few) ids: broadcast the id set, filter
    per batch, collect the small result."""
    import ray

    ref = ray.put(np.sort(ids.astype(np.int64)))

    class Pick:
        def __init__(self):
            self.ids = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            rid = _str(t[id_column]).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return t.select([id_column, column]) \
                .filter(pa.array(np.isin(rid, self.ids)))

    small = ds.map_batches(Pick, batch_format="pyarrow",
                           concurrency=2).to_pandas()
    return dict(zip(small[id_column].astype(int), small[column]))


def simhash_near_dup_pairs(ds, column: str, id_column: str, *, k: int = 5,
                           max_hamming: int = 3,
                           batch_size: int = 4096) -> pd.DataFrame:
    """Confirmed near-dup pairs by SimHash: 4x16-bit band buckets guarantee
    recall for Hamming distance <= 3 (pigeonhole over 4 bands); verification
    is exact Hamming on the candidate pairs. Returns (id_a, id_b, hamming)."""

    def sig_stage(t: pa.Table) -> pa.Table:
        sh = simhash64(t[column], k=k)
        ids = _str(t[id_column]).to_numpy(zero_copy_only=False)
        bands = np.empty((len(sh), 4), dtype=U64)
        for b in range(4):
            bands[:, b] = ((sh >> U64(16 * b)) & U64(0xFFFF)) | (U64(b) << U64(16))
        return pa.table({
            "band_key": pa.array(bands.ravel().view(np.int64),
                                 type=pa.int64()),
            id_column: pa.array(np.repeat(ids, 4)),
            "simhash": pa.array(np.repeat(sh, 4).view(np.int64),
                                type=pa.int64()),
        })

    buckets = ds.map_batches(sig_stage, batch_format="pyarrow",
                             batch_size=batch_size)

    cand = _candidate_pairs(buckets, "band_key", id_column,
                            extra_cols=["simhash"])
    if not len(cand):
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    hd = hamming64(cand["sim_a"].to_numpy().astype(np.int64).view(U64),
                   cand["sim_b"].to_numpy().astype(np.int64).view(U64))
    keep = hd <= max_hamming
    pairs = pd.DataFrame({"id_a": cand["id_a"][keep],
                          "id_b": cand["id_b"][keep],
                          "hamming": hd[keep].astype(np.int64)})
    return pairs.drop_duplicates(subset=["id_a", "id_b"]) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)


def near_dup_dedup(ds, pairs: pd.DataFrame, id_column: str):
    """Drop every near-duplicate except the min-id representative of each
    cluster (union-find over confirmed pairs), via broadcast filter."""
    import ray

    if not len(pairs):
        return ds
    ids = np.unique(np.concatenate([pairs["id_a"], pairs["id_b"]]))
    cl = _union_find(pairs[["id_a", "id_b"]].to_numpy(), ids)
    drop = np.sort(np.array([i for i, root in cl.items() if i != root],
                            dtype=np.int64))
    ref = ray.put(drop)

    class DropFilter:
        def __init__(self):
            self.drop = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            rid = _str(t[id_column]).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return t.filter(pa.array(~np.isin(rid, self.drop)))

    return ds.map_batches(DropFilter, batch_format="pyarrow", concurrency=2)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _embedding_matrix(t: pa.Table, column: str) -> np.ndarray:
    col = t[column]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(col.values, dtype=np.float32)
    return flat.reshape(len(col), -1)


def embedding_near_dup_pairs(ds, column: str, id_column: str, *,
                             dim: int, threshold: float = 0.95,
                             num_planes: int = 12, seed: int = 7,
                             batch_size: int = 4096) -> pd.DataFrame:
    """Near-dup pairs by cosine >= threshold via random-hyperplane LSH:
    bucket key = sign bits against `num_planes` fixed hyperplanes (seeded,
    identical in every task); exact cosine verification inside buckets.
    Recall is probabilistic (collision prob = (1 - theta/pi)^planes);
    for exact-recall small data use brute force in stages/ann.py."""
    planes = np.random.default_rng(seed).standard_normal(
        (dim, num_planes)).astype(np.float32)

    def bucket_stage(t: pa.Table) -> pa.Table:
        X = _embedding_matrix(t, column)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        bits = (Xn @ planes) > 0
        key = np.packbits(bits, axis=1, bitorder="little")
        key = np.pad(key, ((0, 0), (0, 8 - key.shape[1])))[:, :8] \
            .copy().view(np.uint64).ravel()
        ids = _str(t[id_column]).to_numpy(zero_copy_only=False)
        out = pa.table({
            "bucket": pa.array(key.view(np.int64), type=pa.int64()),
            id_column: pa.array(ids),
        })
        for j in range(Xn.shape[1]):
            out = out.append_column(f"e{j}", pa.array(Xn[:, j]))
        return out

    buckets = ds.map_batches(bucket_stage, batch_format="pyarrow",
                             batch_size=batch_size)

    # collect + sorted run scan (see _candidate_pairs: per-bucket map_groups
    # pays Python overhead per tiny group); pair cosines computed in ONE
    # gathered matmul over all candidate pairs
    ecols = [f"e{j}" for j in range(dim)]
    df = buckets.to_pandas().sort_values(["bucket", id_column], kind="stable")
    kv = df["bucket"].to_numpy()
    ids = df[id_column].to_numpy()
    X = df[ecols].to_numpy(dtype=np.float32)
    run_starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
    run_ends = np.r_[run_starts[1:], len(kv)]
    ia, ib = [], []
    for s, e in zip(run_starts, run_ends):
        n = min(e - s, 256)
        if n < 2:
            continue
        a, b = np.triu_indices(n, k=1)
        ia.append(s + a)
        ib.append(s + b)
    if not ia:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    ia = np.concatenate(ia)
    ib = np.concatenate(ib)
    cos = np.einsum("ij,ij->i", X[ia], X[ib])
    keep = cos >= threshold
    pairs = pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                          "cosine": cos[keep].astype(np.float64)})
    return pairs.drop_duplicates(subset=["id_a", "id_b"]) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
