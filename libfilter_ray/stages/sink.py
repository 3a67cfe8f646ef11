"""Resumable partitioned-parquet output.

The scale posture (SURVEY §4.2): never one giant file — write hive-partitioned
parquet (one directory per key / shard) so a failed run resumes by skipping
finished partitions, and downstream reads prune by partition.

`write_partitioned` wraps `Dataset.write_parquet(partition_cols=...)` with a
run-marker protocol: a `_SUCCESS` file is written only after the dataset
write completes, so `is_complete(out_dir)` distinguishes a finished run from
a crashed one; `write_partitioned(..., resume=True)` no-ops when complete.
(Finer-grained partition-level resume for sketch builds lives in
`state/checkpoint.py` — this sink is for row-level pipeline OUTPUT.)
"""

from __future__ import annotations

import os
import shutil

SUCCESS = "_SUCCESS"


def is_complete(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, SUCCESS))


def write_partitioned(ds, out_dir: str, *, partition_cols: list[str],
                      resume: bool = True) -> bool:
    """Write `ds` as hive-partitioned parquet under `out_dir`.

    Returns True if a write happened, False if a completed output was
    reused (resume). An incomplete previous attempt (no _SUCCESS) is
    removed and rewritten — partial output is never silently kept.
    """
    if resume and is_complete(out_dir):
        return False
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)  # crashed attempt: rewrite from scratch
    ds.write_parquet(out_dir, partition_cols=partition_cols)
    with open(os.path.join(out_dir, SUCCESS), "w") as f:
        f.write("")
    return True


def read_partitioned(path: str, **kwargs):
    import ray.data

    return ray.data.read_parquet(path, **kwargs)


def write_bucketed(ds, out_dir: str, *, bucket_by: str,
                   num_buckets: int = 64, resume: bool = True) -> bool:
    """Write hash-BUCKETED parquet: rows land in `bucket=<hash(key)%N>`
    directories (seed/scheme = `sketch.hashing.shard_of_values`, the same
    bucketing the engine's shuffles use). A dataset written this way is
    pre-co-located for later joins / grouped builds on the same key:
    read one bucket directory per task and keys never cross buckets —
    no re-shuffle. Same _SUCCESS resume protocol as write_partitioned."""
    import pyarrow as pa

    from ..sketch.hashing import shard_of_values

    if resume and is_complete(out_dir):
        return False
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(
            shard_of_values(t[bucket_by], num_buckets, seed=0x0E9C),
            type=pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, SUCCESS), "w") as f:
        f.write("")
    return True


def read_bucket(path: str, bucket: int, **kwargs):
    """Read ONE bucket directory of a `write_bucketed` output — the unit a
    co-located consumer schedules per task."""
    import ray.data

    return ray.data.read_parquet(f"{path}/bucket={bucket}", **kwargs)
