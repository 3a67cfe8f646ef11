"""Similarity search over an embedding column (list<float>).

- **brute_topk**: exact cosine top-k. The query matrix is `ray.put` once and
  read by every task (broadcast, never re-shipped per batch); each map_batches
  task computes a (batch x queries) matmul and emits only its LOCAL top-k
  candidate rows per query (k x num_queries small rows per block), so the
  final exact merge handles num_blocks*k*q candidates, not the corpus. This
  is the scale-correct baseline: at 100 TB the reduction is
  corpus -> (blocks*k*q) -> k*q.
- **ivf_topk**: IVF-style scale path. Centroids are trained driver-side on a
  bounded sample (k-means, seeded, few Lloyd iterations), broadcast; each
  batch row is assigned to its nearest centroid; only rows whose centroid is
  among the query's `nprobe` nearest lists are scored. Recall vs brute force
  is asserted in tests (not exact by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _block_topk_rows(sim: np.ndarray, ids: np.ndarray,
                     kk: int) -> np.ndarray:
    """Row indices of each query's block-local top-kk, with the documented
    DETERMINISTIC tie-break (cosine desc, neighbor_id asc). argpartition
    alone resolves rank-kk boundary ties arbitrarily — a tied smaller-id
    neighbor could be dropped before the exact global merge ever sees it.
    One exact lexsort per query over the batch — O(q·n log n), noise next
    to the (n x q x dim) matmul that produced `sim`, and free of the
    boundary-tie edge case any pruning scheme reintroduces. Returns flat
    row indices, query-major (q x kk)."""
    nq = sim.shape[1]
    out = np.empty((nq, kk), dtype=np.int64)
    for qi in range(nq):
        out[qi] = np.lexsort((ids, -sim[:, qi]))[:kk]
    return out.ravel()


def _matrix(t: pa.Table, column: str, dtype=np.float32) -> np.ndarray:
    col = t[column]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(col.values, dtype=dtype).reshape(len(col), -1)


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


# Per-block partial-top-k candidate sets are O(blocks x queries x k)
# rows. Below this bound they collect straight to the driver; above it
# (the dedup.py auto-switch idiom) an exact per-query top-k merge runs
# inside the Dataset first, so the driver only ever sees queries x k
# rows. The merge is semantics-preserving: global top-k of per-block
# top-ks equals top-k of everything, with the same deterministic
# (value desc, neighbor_id asc) tie-break at every level.
DRIVER_MERGE_LIMIT = 1 << 20


def _collect_candidates(cand_ds, k: int, value_col: str) -> pd.DataFrame:
    cand_ds = cand_ds.materialize()  # candidates, never the corpus
    if cand_ds.count() <= DRIVER_MERGE_LIMIT:
        return cand_ds.to_pandas()

    def merge_q(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([value_col, "neighbor_id"],
                             ascending=[False, True]).head(k)

    return cand_ds.groupby("query_id") \
        .map_groups(merge_q, batch_format="pandas").to_pandas()


def brute_topk(ds, queries: np.ndarray, *, column: str = "embedding",
               id_column: str = "vec_id", k: int = 10,
               batch_size: int = 4096, dtype=np.float32) -> pd.DataFrame:
    """Exact cosine top-k: returns (query_id, neighbor_id, cosine, rank),
    rank 1 = best. Ties broken by neighbor_id ascending (stable/oracle-able).
    dtype=np.float64 gives bit-parity with double-precision oracles."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=dtype))
    qref = ray.put(Q)

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # np.argpartition rejects empty axes
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        Qm = ray.get(qref)  # zero-copy plasma read per task
        X = _normalize(_matrix(t, column, Qm.dtype))
        ids = np.asarray(t[id_column].combine_chunks()
                         if isinstance(t[id_column], pa.ChunkedArray)
                         else t[id_column]).astype(np.int64)
        sim = X @ Qm.T  # (batch, q)
        kk = min(k, len(ids))
        rows = _block_topk_rows(sim, ids, kk)  # deterministic ties
        nq = Qm.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        return pa.table({
            "query_id": pa.array(qid),
            "neighbor_id": pa.array(ids[rows]),
            "cosine": pa.array(sim[rows, qid].astype(np.float64)),
        })

    cand = _collect_candidates(
        ds.map_batches(partial_topk, batch_format="pyarrow",
                       batch_size=batch_size), k, "cosine")
    # exact final merge over the small candidate set
    cand = cand.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def exact_cosine_pairs(ds, *, column: str = "embedding",
                       id_column: str = "vec_id", threshold: float = 0.8,
                       num_chunks: int = 1, batch_size: int = 4096,
                       dtype=np.float64) -> pd.DataFrame:
    """Distributed EXACT cosine similarity self-join: every pair
    (id_a < id_b) with cosine >= threshold. The deterministic complement of
    the hyperplane-LSH near-dup path (stages/dedup.py:
    embedding_near_dup_pairs) — LSH trades recall for subquadratic cost;
    this is the exact tool for small/medium corpora and the conformance
    oracle for the approximate one (mirroring how ngram_jaccard_near_dup
    anchors MinHash+LSH).

    Scale shape: exact all-pairs is inherently O(n^2) compute. It runs as
    `num_chunks` streaming passes: pass c gathers ONLY chunk c (rows with
    splitmix64(id) % num_chunks == c) into one plasma broadcast, then
    streams the WHOLE corpus against it — each task one (batch x chunk)
    matmul, emitting only above-threshold pairs whose streamed id is
    smaller than the chunk id (each unordered pair is owned by exactly one
    pass: the one holding its larger id). Peak broadcast memory is
    O(n/num_chunks x dim) regardless of corpus size; compute spreads over
    blocks x chunks tasks. The collected result is O(matching pairs) only.
    """
    import ray

    from ..sketch.hashing import splitmix64

    def ids_of(t: pa.Table) -> np.ndarray:
        col = t[id_column]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return np.asarray(col).astype(np.int64)

    parts = []
    for c in range(num_chunks):
        def pick_chunk(t: pa.Table, c=c) -> pa.Table:
            ids = ids_of(t)
            keep = (splitmix64(ids.view(np.uint64), seed=0xC41F)
                    % np.uint64(num_chunks)) == np.uint64(c)
            return t.select([id_column, column]).filter(pa.array(keep))

        chunk = ds.map_batches(pick_chunk, batch_format="pyarrow",
                               batch_size=batch_size).to_pandas()
        if not len(chunk):
            continue
        cids = chunk[id_column].to_numpy().astype(np.int64)
        M = _normalize(np.stack(chunk[column].to_numpy()).astype(dtype))
        cref = ray.put((cids, M))

        def scan(t: pa.Table) -> pa.Table:
            empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                              "id_b": pa.array([], type=pa.int64()),
                              "cosine": pa.array([], type=pa.float64())})
            if t.num_rows == 0:
                return empty
            cid, Mm = ray.get(cref)  # zero-copy plasma read per task
            X = _normalize(_matrix(t, column, Mm.dtype))
            bids = ids_of(t)
            sim = X @ Mm.T  # (batch, chunk)
            hit = (sim >= threshold) & (bids[:, None] < cid[None, :])
            r, k = np.nonzero(hit)
            return pa.table({
                "id_a": pa.array(bids[r]),
                "id_b": pa.array(cid[k]),
                "cosine": pa.array(sim[r, k].astype(np.float64)),
            })

        parts.append(ds.map_batches(scan, batch_format="pyarrow",
                                    batch_size=batch_size).to_pandas())

    if not parts:
        return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def train_centroids(ds, *, column: str = "embedding", num_centroids: int = 16,
                    sample_rows: int = 4096, iters: int = 10,
                    seed: int = 11) -> np.ndarray:
    """Driver-side k-means on a bounded sample (kmeans++-free seeded init;
    Lloyd iterations in numpy). The sample is `limit`ed, never the corpus."""
    sample = ds.limit(sample_rows).to_pandas()
    X = _normalize(np.stack(sample[column].to_numpy()).astype(np.float32))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(num_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def train_centroids_distributed(ds, *, column: str = "embedding",
                                num_centroids: int = 16, iters: int = 5,
                                seed: int = 11, init_sample: int = 4096,
                                batch_size: int = 4096) -> np.ndarray:
    """Distributed Lloyd k-means over the FULL corpus (the scale path when
    a bounded sample under-represents the distribution).

    Per iteration: broadcast centroids (ray.put once), one streaming
    map_batches pass emits k partial rows per batch — (centroid, count,
    per-dim float64 sums) — and a distributed groupby(c).Sum reduces them
    (Ray pre-aggregates per block, so the shuffle is k x (dim+2) doubles
    per block, never the corpus). The driver only ever sees the k x dim
    reduced table. Init = seeded draw from a `limit` sample (as
    `train_centroids`), so fixed seed + data => deterministic init; final
    centroids can differ in float ulps across partitionings (summation
    order), which IVF recall tolerates by construction.
    """
    import ray
    from ray.data.aggregate import Sum

    C = train_centroids(ds, column=column, num_centroids=num_centroids,
                        sample_rows=init_sample, iters=0, seed=seed)
    k, dim = C.shape
    sum_cols = [f"s{i}" for i in range(dim)]

    for _ in range(iters):
        cref = ray.put(C)

        def partial(t: pa.Table) -> pa.Table:
            Cm = ray.get(cref)
            cols = {"c": pa.array(np.arange(k, dtype=np.int64))}
            if t.num_rows == 0:
                cols["n"] = pa.array(np.zeros(k, dtype=np.int64))
                for i, sc in enumerate(sum_cols):
                    cols[sc] = pa.array(np.zeros(k, dtype=np.float64))
                return pa.table(cols)
            X = _normalize(_matrix(t, column))
            assign = np.argmax(X @ Cm.T, axis=1)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, assign, X.astype(np.float64))
            cols["n"] = pa.array(np.bincount(assign, minlength=k)
                                 .astype(np.int64))
            for i, sc in enumerate(sum_cols):
                cols[sc] = pa.array(sums[:, i])
            return pa.table(cols)

        red = ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size) \
            .groupby("c").aggregate(
                Sum("n", alias_name="n"),
                *[Sum(sc, alias_name=sc) for sc in sum_cols]).to_pandas() \
            .sort_values("c")
        counts = red["n"].to_numpy().astype(np.int64)
        sums = red[sum_cols].to_numpy()
        newC = C.astype(np.float64).copy()
        nz = counts > 0
        newC[nz] = sums[nz] / counts[nz, None]
        C = _normalize(newC).astype(np.float32)
    return C


def train_pq_codebooks(ds, *, column: str = "embedding", m: int = 8,
                       ncodes: int = 256, sample_rows: int = 8192,
                       iters: int = 12, seed: int = 17) -> np.ndarray:
    """(m, ncodes, dim/m) float32 product-quantization codebooks: the
    embedding space splits into `m` contiguous subspaces, each clustered
    independently by seeded k-means on a bounded `limit` sample (the
    standard PQ training protocol — codebooks need a sample, never the
    corpus). Vectors are L2-normalized BEFORE splitting, so summed
    per-subspace inner products approximate full cosine."""
    sample = ds.limit(sample_rows).to_pandas()
    X = _normalize(np.stack(sample[column].to_numpy()).astype(np.float32))
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ncodes, dsub), dtype=np.float32)
    for j in range(m):
        S = X[:, j * dsub:(j + 1) * dsub]
        k = min(ncodes, n)
        C = S[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            # ||s-c||^2 = ||s||^2 - 2 s.c + ||c||^2 (never materializes
            # the (n, k, dsub) difference tensor)
            d2 = (S ** 2).sum(1)[:, None] - 2.0 * (S @ C.T) \
                + (C ** 2).sum(1)[None, :]
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                mem = S[assign == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        books[j, :k] = C
        if k < ncodes:  # degenerate tiny sample: repeat last centroid
            books[j, k:] = C[-1]
    return books


def pq_encode_fn(books_ref, column: str, id_column: str):
    """map_batches fn: (id, code) rows — each vector compressed to `m`
    uint8 codes (fixed_size_binary), a dim*4/m-fold reduction. The
    codebooks ride one plasma broadcast."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        books = ray.get(books_ref)  # zero-copy plasma read
        mm, ncodes, dsub = books.shape
        if ncodes > 256:
            raise ValueError(  # uint8 codes would silently wrap
                f"ncodes={ncodes} > 256 cannot encode as uint8")
        ids = np.asarray(t[id_column].combine_chunks()
                         if isinstance(t[id_column], pa.ChunkedArray)
                         else t[id_column]).astype(np.int64)
        if t.num_rows == 0:
            return pa.table({
                id_column: pa.array([], type=pa.int64()),
                "code": pa.array([], type=pa.binary(mm))})
        X = _normalize(_matrix(t, column))
        codes = np.empty((len(ids), mm), dtype=np.uint8)
        for j in range(mm):
            S = X[:, j * dsub:(j + 1) * dsub]
            C = books[j]
            d2 = (S ** 2).sum(1)[:, None] - 2.0 * (S @ C.T) \
                + (C ** 2).sum(1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        raw = codes.tobytes()  # row-major: row i = raw[i*m:(i+1)*m]
        return pa.table({
            id_column: pa.array(ids),
            "code": pa.array([raw[i * mm:(i + 1) * mm]
                              for i in range(len(ids))],
                             type=pa.binary(mm)),
        })

    return fn


def pq_topk(ds, queries: np.ndarray, *, column: str = "embedding",
            id_column: str = "vec_id", k: int = 10, m: int = 8,
            ncodes: int = 256, rerank: int = 4,
            batch_size: int = 4096,
            books: np.ndarray | None = None,
            rerank_dtype=np.float32) -> pd.DataFrame:
    """PQ approximate top-k with exact rerank: codebooks train on a
    bounded sample, every batch encodes to m uint8 codes and scores ALL
    queries by asymmetric distance (one (m x ncodes) lookup table per
    query, np.take + sum — no full matmul), each block emits its local
    top-(rerank*k) candidates, and the final exact cosine rerank touches
    only the gathered candidate vectors. Same output schema as
    `brute_topk`; recall depends on m/ncodes (asserted vs brute in
    tests). At scale the corpus-resident state is the m-byte code table —
    a dim*4/m-fold memory reduction (32x at dim=64, m=8).

    Exhaustive gate: when rerank*k >= batch_size every row of every block
    becomes a rerank candidate, so the exact-cosine rerank IS brute force —
    with rerank_dtype=np.float64 the output matches brute_topk bit-for-bit
    and shares its SQL oracle (`ann_topk_pq_exhaustive`)."""
    import ray

    if books is None:
        books = train_pq_codebooks(ds, column=column, m=m, ncodes=ncodes)
    mm, ncodes_, dsub = books.shape
    Q = _normalize(np.asarray(queries, dtype=np.float32))
    nq, dim = Q.shape
    if dim != mm * dsub:
        raise ValueError(f"query dim {dim} != codebook dim {mm * dsub}")
    # ADC tables: lut[q, j, c] = Q_sub(q, j) . codeword(j, c)
    lut = np.einsum("qjd,jcd->qjc",
                    Q.reshape(nq, mm, dsub), books).astype(np.float32)
    bref = ray.put((books, lut))
    kk_cand = min(rerank * k, 1 << 12)

    def adc_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64())})
        if t.num_rows == 0:
            return empty
        booksw, lutw = ray.get(bref)  # zero-copy plasma read
        X = _normalize(_matrix(t, column))
        ids = np.asarray(t[id_column].combine_chunks()
                         if isinstance(t[id_column], pa.ChunkedArray)
                         else t[id_column]).astype(np.int64)
        n = len(ids)
        codes = np.empty((n, mm), dtype=np.int64)
        for j in range(mm):
            S = X[:, j * dsub:(j + 1) * dsub]
            C = booksw[j]
            d2 = (S ** 2).sum(1)[:, None] - 2.0 * (S @ C.T) \
                + (C ** 2).sum(1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1)
        # ADC score: sum_j lut[q, j, codes[i, j]] -> (n, nq)
        sim = np.zeros((n, lutw.shape[0]), dtype=np.float32)
        for j in range(mm):
            sim += lutw[:, j, :].T[codes[:, j]]  # (n, nq)
        kk = min(kk_cand, n)
        rows = _block_topk_rows(sim, ids, kk)
        qid = np.repeat(np.arange(lutw.shape[0], dtype=np.int64), kk)
        return pa.table({
            "query_id": pa.array(qid),
            "neighbor_id": pa.array(ids[rows]),
            "score": pa.array(sim[rows, qid].astype(np.float64)),
        })

    cand = ds.map_batches(adc_partial, batch_format="pyarrow",
                          batch_size=batch_size).to_pandas()
    # exact rerank: gather ONLY candidate vectors (bounded:
    # blocks * rerank*k * q rows), compute true cosine
    need = np.unique(cand["neighbor_id"].to_numpy().astype(np.int64))
    need_ref = ray.put(np.sort(need))

    def pick(t: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        ids = np.asarray(t[id_column].combine_chunks()
                         if isinstance(t[id_column], pa.ChunkedArray)
                         else t[id_column]).astype(np.int64)
        idx = np.searchsorted(want, ids)
        hit = (idx < len(want)) & (
            want[np.minimum(idx, max(len(want) - 1, 0))] == ids)
        return t.filter(pa.array(hit))

    vecs = ds.map_batches(pick, batch_format="pyarrow",
                          batch_size=batch_size).to_pandas()
    V = _normalize(np.stack(vecs[column].to_numpy()).astype(rerank_dtype))
    Qr = _normalize(np.asarray(queries, dtype=rerank_dtype))
    vid = vecs[id_column].to_numpy().astype(np.int64)
    order = np.argsort(vid)
    vid, V = vid[order], V[order]
    out_rows = []
    for qi in range(nq):
        nb = np.unique(
            cand.loc[cand["query_id"] == qi, "neighbor_id"]
            .to_numpy().astype(np.int64))
        pos = np.searchsorted(vid, nb)
        cos = V[pos] @ Qr[qi]
        sel = np.lexsort((nb, -cos))[:k]
        for r, s in enumerate(sel):
            out_rows.append((qi, nb[s], float(cos[s]), r + 1))
    return pd.DataFrame(out_rows, columns=["query_id", "neighbor_id",
                                           "cosine", "rank"])


def ivf_topk(ds, queries: np.ndarray, *, column: str = "embedding",
             id_column: str = "vec_id", k: int = 10, num_centroids: int = 16,
             nprobe: int = 4, batch_size: int = 4096,
             train: str = "sample", dtype=np.float32) -> pd.DataFrame:
    """IVF approximate top-k: score only rows whose nearest centroid is in
    the query's `nprobe` closest lists. Same output schema as brute_topk.
    train="sample" (default) trains centroids driver-side on a bounded
    sample; train="distributed" runs full-corpus Lloyd iterations
    (train_centroids_distributed) — the 100 TB path.

    With nprobe >= num_centroids every list is probed, the centroid mask is
    all-True, and the result is EXACTLY brute_topk (same scores, same
    deterministic tie-break) — pass dtype=np.float64 for bit-parity with a
    double-precision SQL oracle. That exhaustive mode is how the IVF path is
    driver-gated (`ann_topk_ivf_exhaustive`)."""
    import ray

    if train == "distributed":
        C = train_centroids_distributed(ds, column=column,
                                        num_centroids=num_centroids)
    else:
        C = train_centroids(ds, column=column, num_centroids=num_centroids)
    C = C.astype(dtype)
    Q = _normalize(np.asarray(queries, dtype=dtype))
    # per-query probe set (nprobe nearest centroids)
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    allowed = np.zeros((Q.shape[0], C.shape[0]), dtype=bool)
    for qi in range(Q.shape[0]):
        allowed[qi, probe[qi]] = True
    qref = ray.put((Q, C, allowed))

    def ivf_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # np.argpartition rejects empty axes
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        Qm, Cm, allow = ray.get(qref)  # zero-copy plasma read per task
        X = _normalize(_matrix(t, column, Qm.dtype))
        ids = np.asarray(t[id_column].combine_chunks()
                         if isinstance(t[id_column], pa.ChunkedArray)
                         else t[id_column]).astype(np.int64)
        assign = np.argmax(X @ Cm.T, axis=1)  # (batch,)
        sim = X @ Qm.T  # (batch, q)
        mask = allow[:, assign].T  # (batch, q)
        sim = np.where(mask, sim, -np.inf)
        kk = min(k, len(ids))
        rows = _block_topk_rows(sim, ids, kk)  # deterministic ties
        nq = Qm.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        vals = sim[rows, qid]
        keep = np.isfinite(vals)
        return pa.table({
            "query_id": pa.array(qid[keep]),
            "neighbor_id": pa.array(ids[rows][keep]),
            "cosine": pa.array(vals[keep].astype(np.float64)),
        })

    cand = _collect_candidates(
        ds.map_batches(ivf_partial, batch_format="pyarrow",
                       batch_size=batch_size), k, "cosine")
    cand = cand.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out
