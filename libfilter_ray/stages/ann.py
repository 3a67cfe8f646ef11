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

    cand = ds.map_batches(partial_topk, batch_format="pyarrow",
                          batch_size=batch_size).to_pandas()
    # exact final merge over the small candidate set
    cand = cand.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


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


def ivf_topk(ds, queries: np.ndarray, *, column: str = "embedding",
             id_column: str = "vec_id", k: int = 10, num_centroids: int = 16,
             nprobe: int = 4, batch_size: int = 4096,
             train: str = "sample") -> pd.DataFrame:
    """IVF approximate top-k: score only rows whose nearest centroid is in
    the query's `nprobe` closest lists. Same output schema as brute_topk.
    train="sample" (default) trains centroids driver-side on a bounded
    sample; train="distributed" runs full-corpus Lloyd iterations
    (train_centroids_distributed) — the 100 TB path."""
    import ray

    if train == "distributed":
        C = train_centroids_distributed(ds, column=column,
                                        num_centroids=num_centroids)
    else:
        C = train_centroids(ds, column=column, num_centroids=num_centroids)
    Q = _normalize(np.asarray(queries, dtype=np.float32))
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
        X = _normalize(_matrix(t, column))
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

    cand = ds.map_batches(ivf_partial, batch_format="pyarrow",
                          batch_size=batch_size).to_pandas()
    cand = cand.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out
