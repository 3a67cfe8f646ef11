"""Deterministic global shuffle into training shards: report vs a local
numpy reference, shard-file round trip, resume semantics, CLI face."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from libfilter_ray.sketch.hashing import splitmix64
from libfilter_ray.stages.shuffle import (SHUFFLE_SEED, ordered_digest,
                                          shuffle_shards)


def _local_report(ids: np.ndarray, b: int) -> pd.DataFrame:
    h = splitmix64(ids.astype(np.uint64), seed=SHUFFLE_SEED)
    shard = (h >> np.uint64(64 - b)).astype(np.int64) if b else \
        np.zeros(len(h), dtype=np.int64)
    rows = []
    for s in np.unique(shard):
        hs = np.sort(h[shard == s])
        with np.errstate(over="ignore"):
            sid = int(ids[shard == s].astype(np.uint64)
                      .sum(dtype=np.uint64) % np.uint64(1 << 63))
        rows.append({"shard": int(s), "n_docs": len(hs),
                     "sum_doc_id": sid, "ord_digest": ordered_digest(hs)})
    return pd.DataFrame(rows).astype("int64")


def _ds(ids, extra=None, nblocks=8):
    import ray.data

    cols = {"doc_id": pa.array(ids, type=pa.int64())}
    if extra:
        cols.update(extra)
    return ray.data.from_arrow(pa.table(cols)).repartition(nblocks)


def test_shuffle_report_matches_local_reference(ray_session, rng):
    ids = rng.permutation(20_000).astype(np.int64)
    got = shuffle_shards(_ds(ids), "doc_id", nshards_log2=3)
    want = _local_report(ids, 3).sort_values("shard") \
        .reset_index(drop=True)[got.columns.tolist()]
    assert got.equals(want)
    # single-shard degenerate case: the digest pins the full permutation
    got1 = shuffle_shards(_ds(ids[:500], nblocks=3), "doc_id",
                          nshards_log2=0)
    want1 = _local_report(ids[:500], 0)[got1.columns.tolist()]
    assert got1.equals(want1)


def test_shuffle_shard_files_roundtrip_and_resume(ray_session, tmp_path,
                                                  rng):
    ids = rng.permutation(5_000).astype(np.int64)
    lang = np.array(["ab", "cd", "ef", "gh"], dtype=object)[ids % 4]
    out = tmp_path / "shards"
    report = shuffle_shards(
        _ds(ids, {"lang": pa.array(lang.tolist())}), "doc_id",
        nshards_log2=2, out_dir=str(out), payload_columns=("lang",))
    assert len(report) == 4 and report["n_docs"].sum() == 5_000
    parts = []
    for _, r in report.iterrows():
        t = pq.read_table(r["path"])
        assert t.column_names == ["doc_id", "lang"]
        h = splitmix64(t.column("doc_id").to_numpy().astype(np.uint64),
                       seed=SHUFFLE_SEED)
        # within-shard order is ascending hash, entirely in this shard
        assert (np.diff(h.astype(np.uint64)) > 0).all()
        assert (h >> np.uint64(62) == r["shard"]).all()
        assert ordered_digest(h) == r["ord_digest"]
        parts.append(t.to_pandas())
    whole = pd.concat(parts).sort_values("doc_id").reset_index(drop=True)
    orig = pd.DataFrame({"doc_id": ids, "lang": lang}) \
        .sort_values("doc_id").reset_index(drop=True)
    assert whole.equals(orig)  # a permutation: nothing lost, nothing added
    # payload rides with its row
    assert (whole["lang"] == np.array(["ab", "cd", "ef", "gh"],
                                      dtype=object)[whole["doc_id"] % 4]).all()

    # resume: identical rerun skips finished shard files (same inode
    # content — tmp+rename never touched them) and reports identically
    mtimes = {r["path"]: pq.read_metadata(r["path"]) for _, r in
              report.iterrows()}
    import os
    stamps = {p: os.stat(p).st_mtime_ns for p in mtimes}
    report2 = shuffle_shards(
        _ds(ids, {"lang": pa.array(lang.tolist())}), "doc_id",
        nshards_log2=2, out_dir=str(out), payload_columns=("lang",))
    assert report2.drop(columns="path").equals(
        report.drop(columns="path"))
    assert {p: os.stat(p).st_mtime_ns for p in stamps} == stamps


def test_shuffle_guards(ray_session):
    with pytest.raises(ValueError):
        shuffle_shards(_ds([1, 2, 3], nblocks=1), "doc_id",
                       nshards_log2=30)
