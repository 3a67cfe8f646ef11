"""Config-driven pipeline API (SURVEY §2.10 extension surface)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_DIR_01
from libfilter_ray.pipelines.config import run_config


def test_grouped_config_one_pass(ray_session):
    out = run_config({
        "table": "events",
        "columns": ["event_type", "user_id", "value"],
        "key": "event_type",
        "sketches": [
            {"name": "users", "kind": "hll", "params": {"p": 12},
             "column": "user_id"},
            {"name": "vals", "kind": "kll", "params": {"k": 200},
             "column": "value"},
        ],
    }, SF_DIR_01)
    assert {"event_type", "rows", "payload_users", "payload_vals"} \
        <= set(out.columns)
    assert len(out) == 5
    from libfilter_ray.sketch.hll import HyperLogLog

    for _, r in out.iterrows():
        est = HyperLogLog.from_bytes(r["payload_users"]).estimate()
        assert 0 < est < 2 * r["rows"]


def test_global_config_and_webpages_source(ray_session):
    out = run_config({
        "table": "webpages",
        "columns": ["url", "lang"],
        "sketches": [
            {"name": "urls", "kind": "block", "params": {"bytes_": 8192},
             "column": "url"},
            {"name": "nd", "kind": "hll", "params": {"p": 12},
             "column": "url"},
        ],
    }, SF_DIR_01)
    assert list(out["name"]) == ["urls", "nd"]
    from libfilter_ray.sketch.block_bloom import BlockBloom

    f = BlockBloom.from_bytes(out.loc[0, "payload"])
    assert f.num_buckets == 8192 // 32


def test_unknown_kind_fails_fast(ray_session):
    with pytest.raises(KeyError, match="unknown sketch kind"):
        run_config({"table": "events", "sketches": [
            {"name": "x", "kind": "nope", "column": "user_id"}]}, SF_DIR_01)


def test_exact_flag_routes_to_canonical_build(ray_session):
    """'exact': true on an ungrouped spec uses the partition-invariant
    raw-hash build — byte-identical to a sorted sequential build."""
    import numpy as np
    import pyarrow.parquet as pq

    from libfilter_ray.pipelines.config import run_config
    from libfilter_ray.sketch.hashing import DEFAULT_SEED, hash_arrow_array
    from libfilter_ray.sketch.taffy_block import TaffyBlock

    SF = "/root/testdata/sf0.001"
    spec = {"table": "documents", "columns": ["text"],
            "sketches": [{"name": "tbf", "kind": "taffy_block",
                          "params": {"ndv": 128, "fpp": 0.02},
                          "column": "text", "exact": True}]}
    out = run_config(spec, SF)
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].combine_chunks()
    h = np.sort(hash_arrow_array(texts, seed=DEFAULT_SEED), kind="stable")
    want = TaffyBlock(ndv=128, fpp=0.02).add_hashes(h).to_bytes()
    assert out["payload"].iloc[0] == want


def test_exact_flag_fails_fast_on_invalid_specs(ray_session):
    from libfilter_ray.pipelines.config import run_config

    with pytest.raises(ValueError, match="grouped"):
        run_config({"table": "documents", "key": "lang", "sketches": [
            {"name": "t", "kind": "taffy_block", "column": "text",
             "exact": True}]}, "/root/testdata/sf0.001")
    with pytest.raises(ValueError, match="hash-consuming"):
        run_config({"table": "events", "sketches": [
            {"name": "q", "kind": "kll", "column": "value",
             "exact": True}]}, "/root/testdata/sf0.001")


def test_config_filter_and_dedup_prestages(ray_session):
    """filter + exact-dedup pre-stages compose from config: planting exact
    clones then deduping through the spec must leave counts identical to
    the raw table's filtered counts."""
    import pandas as pd
    import pyarrow.parquet as pq

    from libfilter_ray.sketch.hll import HyperLogLog

    spec = {
        "table": "documents",
        "columns": ["doc_id", "lang", "text", "n_chars"],
        "filter": "n_chars >= 150",
        "dedup": {"column": "text", "id_column": "doc_id"},
        "key": "lang",
        "sketches": [
            {"name": "texts", "kind": "hll", "params": {"p": 12},
             "column": "text"},
        ],
    }
    out = run_config(spec, SF_DIR_01)
    want = pq.read_table(f"{SF_DIR_01}/documents.parquet",
                         columns=["lang", "n_chars"]).to_pandas()
    want = want[want["n_chars"] >= 150].groupby("lang").size()
    got = out.set_index("lang")["rows"]
    # no exact dups in the raw table: dedup must be a no-op on counts
    pd.testing.assert_series_equal(got.sort_index().astype("int64"),
                                   want.sort_index().astype("int64"),
                                   check_names=False)
    for _, r in out.iterrows():
        est = HyperLogLog.from_bytes(r["payload_texts"]).estimate()
        assert 0.5 * r["rows"] <= est <= 1.5 * r["rows"]
