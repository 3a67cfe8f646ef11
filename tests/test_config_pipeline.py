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
