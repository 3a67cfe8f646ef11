"""Gzip'd JSONL source + sink — the de facto LLM training-data format.

Every public corpus release (The Pile, RedPajama, Dolma, FineWeb dumps)
moves documents as newline-delimited JSON, usually gzip'd in shards; an
engine that curates training data has to speak it natively on both
sides. Same contract as the WARC module (`sources/warc.py`): stream the
wire format <-> Arrow batches, stdlib ``gzip``/``json`` + pyarrow only.

Scale shape mirrors WARC: one shard file per read task
(``ray.data.read_binary_files`` -> a GENERATOR map_batches stage), but
the PARSE is vectorized — each decompressed shard goes through
``pyarrow.json.read_json`` (Arrow's C++ NDJSON reader), never a
per-line ``json.loads`` loop — and yields in bounded slices with
backpressure. Writing is the resumable partitioned-sink rule: each
task serializes its own ``.jsonl.gz`` shard (named by the batch's min
key hash, so re-running a finished block overwrites idempotently) and
emits a manifest row.

Type fidelity: JSON carries strings / integers / floats / booleans /
null natively; anything else (timestamps, binary) must be projected to
those before the sink — the writer fails fast on non-JSON-native Arrow
types rather than silently stringifying.
"""

from __future__ import annotations

import gzip
import io
import json

import pyarrow as pa

_JSON_NATIVE = (pa.types.is_integer, pa.types.is_floating,
                pa.types.is_boolean, pa.types.is_string,
                pa.types.is_large_string, pa.types.is_null)


def _check_json_native(schema: pa.Schema) -> None:
    for f in schema:
        if not any(p(f.type) for p in _JSON_NATIVE):
            raise TypeError(
                f"column {f.name!r} has non-JSON-native type {f.type}; "
                "project timestamps/binary to string/int before the "
                "JSONL sink")


def write_jsonl_gz(path: str, table: pa.Table) -> int:
    """One gzip'd JSONL file from an Arrow table; returns row count.
    Keys follow column order; ints/floats/bools/strings/null only."""
    _check_json_native(table.schema)
    cols = table.column_names
    pydict = [table[c].to_pylist() for c in cols]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for i in range(table.num_rows):
            # allow_nan=False: bare NaN/Infinity tokens are invalid
            # RFC 8259 — fail fast at write (the format's whole point
            # is interchange; strict parsers reject such shards)
            f.write(json.dumps(
                {c: v[i] for c, v in zip(cols, pydict)},
                ensure_ascii=False, separators=(",", ":"),
                allow_nan=False) + "\n")
    return table.num_rows


def parse_jsonl_stage(batch_rows: int = 4096, schema: pa.Schema = None):
    """GENERATOR map_batches fn over read_binary_files rows: gunzips
    each shard (plain ``.jsonl`` passes through) and parses it with
    Arrow's C++ NDJSON reader, yielding bounded slices. Pass `schema`
    to pin types (otherwise Arrow infers per shard — fine when every
    shard carries every column, the writer's invariant)."""
    import pyarrow.json as pj

    # unexpected_field_behavior="ignore": a pinned schema must actually
    # pin — otherwise shards carrying an extra key gain an extra column
    # and the Dataset's block schemas go ragged
    opts = (pj.ParseOptions(explicit_schema=schema,
                            unexpected_field_behavior="ignore")
            if schema is not None else None)

    def fn(t: pa.Table):
        for blob in t["bytes"]:
            data = blob.as_py()
            if data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)
            if not data.strip():  # zero-record shard: common in dumps;
                continue          # Arrow raises 'Empty JSON file'
            parsed = pj.read_json(io.BytesIO(data), parse_options=opts)
            for off in range(0, parsed.num_rows, batch_rows):
                yield parsed.slice(off, batch_rows)

    return fn


def read_jsonl(paths, *, batch_rows: int = 4096,
               schema: pa.Schema = None):
    """Ray Dataset from one or more ``.jsonl`` / ``.jsonl.gz`` shards —
    one file per read task, vectorized parse, bounded batches. (Ray's
    own ``read_json`` covers the uncompressed case; this source exists
    for the member-gzip'd shard layout the sink below writes and for
    schema-pinned streaming reads.)"""
    import ray.data

    return ray.data.read_binary_files(paths).map_batches(
        parse_jsonl_stage(batch_rows, schema), batch_format="pyarrow")


def write_jsonl_shards_stage(out_dir: str, key_col: str = None):
    """map_batches fn turning each batch into ONE ``.jsonl.gz`` shard
    under `out_dir` + a manifest row (shard_path, n_records) — the same
    resumable partitioned-sink shape as the WARC and parquet sinks:
    shard names digest the batch's full content (`warc.shard_name`), so
    a re-run of a finished input block overwrites its own file
    idempotently and distinct batches can never clobber each other.
    `key_col` is accepted for signature compatibility; naming no longer
    depends on any single column."""
    from .warc import shard_name

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"shard_path": pa.array([], type=pa.string()),
                             "n_records": pa.array([], type=pa.int64())})
        path = f"{out_dir}/{shard_name(t)}.jsonl.gz"
        n = write_jsonl_gz(path, t)
        return pa.table({"shard_path": pa.array([path]),
                         "n_records": pa.array([n], type=pa.int64())})

    return fn
