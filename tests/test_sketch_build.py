"""Distributed sketch-build framework over Ray Data (global tree merge,
salted grouped merge, broadcast probe) — SURVEY.md §2.4/§2.6."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from libfilter_ray.sketch.block_bloom import BlockBloom
from libfilter_ray.sketch.hashing import hash_arrow_array
from libfilter_ray.sketch import registry
from libfilter_ray.stages import sketch_build as sb

from conftest import SF_DIR, SF_DIR_01


@pytest.fixture()
def docs(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])


def test_registry():
    assert "block" in registry.kinds()
    sk = registry.make("block", bytes_=64)
    assert isinstance(sk, BlockBloom)
    with pytest.raises(KeyError, match="unknown sketch kind"):
        registry.get("nope")


def test_global_build_matches_local(docs):
    """Distributed build == single-process build, byte for byte."""
    dist = sb.build_sketch(docs, "text", "block", {"bytes_": 2048},
                           batch_size=64)
    local = BlockBloom(2048)
    tbl = docs.to_pandas()
    local.add_hashes(hash_arrow_array(pa.array(tbl["text"].tolist())))
    assert dist == local


def test_global_build_forced_tree_rounds(docs):
    """Tiny fanin forces multiple merge rounds; result still byte-identical."""
    dist = sb.build_sketch(docs, "text", "block", {"bytes_": 1024},
                           batch_size=16, merge_fanin=4, driver_fanin=4)
    local = BlockBloom(1024)
    tbl = docs.to_pandas()
    local.add_hashes(hash_arrow_array(pa.array(tbl["text"].tolist())))
    assert dist == local


def test_grouped_build_no_false_negatives(docs):
    grouped = sb.build_grouped_sketches(docs, "lang", "text", "block",
                                        {"bytes_": 1024}, batch_size=64,
                                        num_salts=4)
    tbl = docs.to_pandas()
    assert set(grouped["lang"]) == set(tbl["lang"])
    for _, row in grouped.iterrows():
        f = BlockBloom.from_bytes(row["payload"])
        texts = pa.array(tbl.loc[tbl["lang"] == row["lang"], "text"].tolist())
        assert len(texts) == row["rows"]
        assert f.find_hashes(hash_arrow_array(texts)).all()


def test_grouped_build_matches_local_bytes(docs):
    """Per-key OR-merge is order invariant -> equals local per-key build."""
    grouped = sb.build_grouped_sketches(docs, "lang", "text", "block",
                                        {"bytes_": 512}, batch_size=32,
                                        num_salts=8)
    tbl = docs.to_pandas()
    for _, row in grouped.iterrows():
        local = BlockBloom(512)
        texts = pa.array(tbl.loc[tbl["lang"] == row["lang"], "text"].tolist())
        local.add_hashes(hash_arrow_array(texts))
        assert BlockBloom.from_bytes(row["payload"]) == local


def test_probe_stage(docs, ray_session):
    import ray

    sk = sb.build_sketch(docs, "text", "block", {"bytes_": 4096})
    ref = ray.put(sk.to_bytes())
    prober = sb.probe_stage(ref, "block", "text")
    probed = docs.map_batches(prober, batch_format="pyarrow",
                              concurrency=2).to_pandas()
    assert probed["found"].all()


def test_actor_pool_variant_identical_bytes(ray_session):
    """SURVEY.md §7.2: the actor-pool accumulate variant and the per-block
    partial variant produce IDENTICAL final sketches for order-invariant
    kinds (BlockBloom OR-merge; HLL register-max)."""
    import ray

    from libfilter_ray.stages.sketch_build import (build_sketch,
                                                   build_sketch_actor_pool)

    ds = ray.data.read_parquet(f"{SF_DIR_01}/events.parquet",
                               columns=["user_id"])
    a = build_sketch(ds, "user_id", "block", {"bytes_": 8192})
    b = build_sketch_actor_pool(ds, "user_id", "block", {"bytes_": 8192},
                                concurrency=3)
    assert a.to_bytes() == b.to_bytes()
    h1 = build_sketch(ds, "user_id", "hll", {"p": 12})
    h2 = build_sketch_actor_pool(ds, "user_id", "hll", {"p": 12},
                                 concurrency=3)
    assert h1.to_bytes() == h2.to_bytes()


def test_salted_merge_under_extreme_skew(ray_session):
    """SURVEY.md §7.4: deliberately skewed fixture — 95% of rows share ONE
    key. The salted two-stage merge must (a) stay correct (byte-identical
    result to num_salts=1) and (b) actually spread the hot key's partials
    across multiple stage-1 salt groups."""
    import pyarrow as pa
    import ray

    from libfilter_ray.sketch.block_bloom import BlockBloom
    from libfilter_ray.sketch.hashing import DEFAULT_SEED, hash_arrow_array
    from libfilter_ray.stages.sketch_build import (_GroupedPartialBuilder,
                                                   build_grouped_sketches)

    n = 20000
    keys = ["hot"] * (n * 95 // 100) + ["cold"] * (n - n * 95 // 100)
    vals = [f"v{i}" for i in range(n)]
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(16)

    salted = build_grouped_sketches(ds, "k", "v", "block",
                                    {"bytes_": 16384}, num_salts=8)
    unsalted = build_grouped_sketches(ds, "k", "v", "block",
                                      {"bytes_": 16384}, num_salts=1)
    assert list(salted["k"]) == list(unsalted["k"])
    for a, b in zip(salted["payload"], unsalted["payload"]):
        assert a == b  # OR-merge is order/stage invariant -> byte identical

    # salting actually spreads: stage-1 partials for the hot key land in >1
    # salt group across blocks
    partials = ds.map_batches(
        _GroupedPartialBuilder("block", {"bytes_": 16384}, "v", "k",
                               DEFAULT_SEED, 8),
        batch_format="pyarrow", batch_size=None).to_pandas()
    hot_salts = partials.loc[partials["k"] == "hot", "salt"].nunique()
    assert hot_salts > 1, "hot key's partials all hit one stage-1 reducer"

    # and the filters are correct: every member found
    f = BlockBloom.from_bytes(
        salted.loc[salted["k"] == "hot", "payload"].iloc[0])
    hot_vals = pa.array([v for k, v in zip(keys, vals) if k == "hot"])
    assert f.find_hashes(hash_arrow_array(hot_vals)).all()


def test_build_sketch_exact_partition_invariant(ray_session, rng):
    """build_sketch_exact: ANY partitioning of the same rows yields a
    byte-identical TaffyBlock, equal to a sequential single-writer build
    over the SORTED hash multiset (the canonical order)."""
    import pyarrow as pa

    import ray
    from libfilter_ray.sketch.hashing import DEFAULT_SEED, hash_arrow_array
    from libfilter_ray.sketch.taffy_block import TaffyBlock
    from libfilter_ray.stages.sketch_build import build_sketch_exact

    vals = [f"key-{i}" for i in rng.integers(0, 3000, 2500)]  # dups included
    params = {"ndv": 64, "fpp": 0.02}
    h = np.sort(hash_arrow_array(pa.array(vals), seed=DEFAULT_SEED),
                kind="stable")
    want = TaffyBlock(**params).add_hashes(h).to_bytes()

    outs = []
    for blocks in (1, 3, 17):
        ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})) \
            .repartition(blocks)
        sk = build_sketch_exact(ds, "v", "taffy_block", params)
        outs.append(sk.to_bytes())
    assert outs[0] == want
    assert all(o == want for o in outs)
    # shuffled row order too: same multiset => same canonical build
    perm = rng.permutation(len(vals))
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array([vals[i] for i in perm])})).repartition(5)
    assert build_sketch_exact(ds, "v", "taffy_block", params) \
        .to_bytes() == want


def test_grouped_build_null_keys_excluded_correct_rows(ray_session):
    """Null-key rows are EXCLUDED (documented) and — the regression — the
    single-distinct-key + null case must still attribute the RIGHT rows:
    key ['a', None, 'a'] with values v0,v1,v2 must sketch exactly {v0,v2}
    (the unsorted-column shortcut used to sketch {v0,v1} and drop v2)."""
    import pyarrow as pa

    import ray

    from libfilter_ray.sketch.block_bloom import BlockBloom
    from libfilter_ray.sketch.hashing import DEFAULT_SEED, hash_arrow_array
    from libfilter_ray.stages.sketch_build import build_grouped_sketches

    t = pa.table({"k": pa.array(["a", None, "a"]),
                  "v": pa.array(["v0", "v1", "v2"])})
    out = build_grouped_sketches(ray.data.from_arrow(t), "k", "v", "block",
                                 {"bytes_": 1024}, num_salts=1)
    assert out["k"].tolist() == ["a"]
    assert out["rows"].tolist() == [2]
    f = BlockBloom.from_bytes(out["payload"].iloc[0])
    h = hash_arrow_array(pa.array(["v0", "v1", "v2"]), seed=DEFAULT_SEED)
    got = f.find_hashes(h)
    assert got[0] and got[2], "member rows must be found (no false negatives)"
    # v1 belongs to the NULL key; a 1KB bloom with 2 members makes a false
    # positive on it vanishingly unlikely — its presence means the bug
    assert not got[1], "null-key row leaked into the 'a' sketch"


def test_grouped_build_empty_input_returns_typed_empty_frame(ray_session):
    import pyarrow as pa

    import ray

    from libfilter_ray.stages.sketch_build import (build_grouped_multi,
                                                   build_grouped_sketches)

    t = pa.table({"k": pa.array([], type=pa.string()),
                  "v": pa.array([], type=pa.string())})
    out = build_grouped_sketches(ray.data.from_arrow(t), "k", "v", "block",
                                 {"bytes_": 1024})
    assert len(out) == 0 and {"k", "payload", "rows"} <= set(out.columns)
    out2 = build_grouped_multi(ray.data.from_arrow(t), "k",
                               [("b", "block", {"bytes_": 1024}, "v")])
    assert len(out2) == 0 and "payload_b" in out2.columns
