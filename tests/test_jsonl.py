"""Gzip'd JSONL source + sink (sources/jsonl.py): round-trip identity,
idempotent shard naming, escape/unicode fidelity, type gating."""
from __future__ import annotations

import gzip
import json

import numpy as np
import pyarrow as pa
import pytest

from libfilter_ray.sources.jsonl import (
    parse_jsonl_stage, read_jsonl, write_jsonl_gz,
    write_jsonl_shards_stage,
)

SCHEMA = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                    ("text", pa.string())])


def _table(n=50, seed=7):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "zh"])[rng.integers(0, 3, n)]
    texts = [f'line "{i}"\twith\\escapes\nand ünïcode 中文 {i}'
             for i in range(n)]
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "lang": pa.array(langs),
                     "text": pa.array(texts)})


def test_write_read_identity(tmp_path):
    t = _table()
    path = str(tmp_path / "a.jsonl.gz")
    assert write_jsonl_gz(path, t) == t.num_rows
    lines = gzip.decompress(
        (tmp_path / "a.jsonl.gz").read_bytes()).decode().splitlines()
    assert len(lines) == t.num_rows
    assert json.loads(lines[3])["text"] == t["text"][3].as_py()

    got = []
    for batch in parse_jsonl_stage(batch_rows=16, schema=SCHEMA)(
            pa.table({"bytes": pa.array(
                [(tmp_path / "a.jsonl.gz").read_bytes()])})):
        assert batch.num_rows <= 16
        got.append(batch)
    back = pa.concat_tables(got)
    assert back.schema == SCHEMA
    assert back.sort_by("doc_id").equals(t.sort_by("doc_id"))


def test_plain_jsonl_passthrough(tmp_path):
    t = _table(8)
    raw = "\n".join(json.dumps(
        {c: t[c][i].as_py() for c in t.column_names})
        for i in range(8)) + "\n"
    (tmp_path / "b.jsonl").write_text(raw)
    batches = list(parse_jsonl_stage(schema=SCHEMA)(
        pa.table({"bytes": pa.array(
            [(tmp_path / "b.jsonl").read_bytes()])})))
    assert pa.concat_tables(batches).num_rows == 8


def test_non_json_native_type_rejected(tmp_path):
    t = pa.table({"k": pa.array([1]),
                  "ts": pa.array([0], type=pa.timestamp("us"))})
    with pytest.raises(TypeError, match="non-JSON-native"):
        write_jsonl_gz(str(tmp_path / "x.jsonl.gz"), t)


def test_shard_stage_idempotent_naming(tmp_path):
    t = _table(32)
    fn = write_jsonl_shards_stage(str(tmp_path), "doc_id")
    m1, m2 = fn(t), fn(t)  # re-run of a finished block
    assert m1["shard_path"].to_pylist() == m2["shard_path"].to_pylist()
    assert len(list(tmp_path.glob("shard-*.jsonl.gz"))) == 1
    assert m1["n_records"][0].as_py() == 32


def test_ray_roundtrip_dataset(ray_session, tmp_path):
    import ray.data

    t = _table(200)
    ds = ray.data.from_arrow(t).repartition(4)
    manifest = ds.map_batches(
        write_jsonl_shards_stage(str(tmp_path), "doc_id"),
        batch_format="pyarrow").to_pandas()
    assert int(manifest["n_records"].sum()) == 200
    paths = sorted(manifest["shard_path"])
    back = read_jsonl(paths, schema=SCHEMA).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    orig = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(orig)


def test_shard_names_distinct_for_shared_keys(tmp_path):
    """Different batches must write DIFFERENT shards even when their
    key columns are identical multisets — shard_name digests the full
    batch content, never a single column."""
    fn = write_jsonl_shards_stage(str(tmp_path), "lang")
    t1 = pa.table({"lang": pa.array(["en", "en"]),
                   "text": pa.array(["a", "b"])})
    t2 = pa.table({"lang": pa.array(["en", "en"]),   # same key multiset
                   "text": pa.array(["c", "d"])})    # different payload
    p1 = fn(t1)["shard_path"][0].as_py()
    p2 = fn(t2)["shard_path"][0].as_py()
    assert p1 != p2
    assert len(list(tmp_path.glob("shard-*.jsonl.gz"))) == 2
    # and idempotency still holds for a re-run of the same block
    assert fn(t1)["shard_path"][0].as_py() == p1


def test_empty_shard_and_nan_gate(tmp_path):
    # zero-record shards must parse to nothing, not crash
    (tmp_path / "e.jsonl").write_text("")
    batches = list(parse_jsonl_stage(schema=SCHEMA)(
        pa.table({"bytes": pa.array([(tmp_path / "e.jsonl").read_bytes()])})))
    assert batches == []
    # non-finite floats are rejected at write (invalid RFC 8259)
    t = pa.table({"x": pa.array([float("nan")])})
    with pytest.raises(ValueError):
        write_jsonl_gz(str(tmp_path / "n.jsonl.gz"), t)
