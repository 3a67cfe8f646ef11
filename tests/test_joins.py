"""Distributed as-of join: semantics vs a single-process pandas merge_asof."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


def _mk(left, right):
    lt = pa.table({
        "k": pa.array(left["k"], type=pa.int64()),
        "ts": pa.array(pd.to_datetime(left["ts"])),
        "tag": pa.array(left["tag"]),
    })
    rt = pa.table({
        "k": pa.array(right["k"], type=pa.int64()),
        "rts": pa.array(pd.to_datetime(right["rts"])),
        "val": pa.array(right["val"], type=pa.float64()),
    })
    return ray.data.from_arrow(lt), ray.data.from_arrow(rt)


def test_asof_join_matches_pandas(ray_session, rng):
    from libfilter_ray.stages.joins import asof_join

    n, m = 500, 300
    base = np.datetime64("2024-01-01T00:00:00")
    left = {
        "k": rng.integers(0, 40, n),          # keys 0..39
        "ts": base + rng.integers(0, 10**6, n).astype("timedelta64[s]"),
        "tag": [f"t{i % 7}" for i in range(n)],
    }
    right = {
        "k": rng.integers(20, 60, m),         # keys 20..59 (partial overlap)
        "rts": base + rng.integers(0, 10**6, m).astype("timedelta64[s]"),
        "val": rng.normal(0, 1, m),
    }
    # dedupe right on (k, rts) for deterministic as-of picks
    rdf = pd.DataFrame(right).groupby(["k", "rts"], as_index=False) \
        .agg(val=("val", "max"))
    lds, rds = _mk(left, {"k": rdf["k"].to_numpy(),
                          "rts": rdf["rts"], "val": rdf["val"].to_numpy()})

    out = asof_join(lds, rds, on="k", left_ts="ts", right_ts="rts",
                    left_cols=["tag"], right_cols=["val"],
                    num_shards=8).to_pandas()

    want = pd.merge_asof(
        pd.DataFrame(left)
        .assign(ts=pd.to_datetime(left["ts"]).astype("datetime64[us]"))
        .sort_values("ts", kind="stable"),
        rdf.rename(columns={"rts": "ts"})
        .assign(ts=lambda d: d["ts"].astype("datetime64[us]"))
        .sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward")

    key = ["k", "ts", "tag"]
    a = out.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)[a.columns.tolist()]
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-12)
    # keys outside the right side's range must survive with null val
    assert a.loc[a["k"] < 20, "val"].isna().all()
    # inclusive boundary: a left ts equal to a right ts matches it
    assert (a["val"].notna() == (a["k"] >= 20) &
            a.apply(lambda r: ((rdf["k"] == r["k"])
                               & (rdf["rts"] <= r["ts"])).any(), axis=1)).all()


def test_asof_join_string_keys(ray_session, rng):
    """Key columns need not be integers — shard tagging goes through the
    generic column hasher."""
    from libfilter_ray.stages.joins import asof_join

    base = np.datetime64("2024-01-01T00:00:00")
    kl = [f"user-{i % 9}" for i in range(120)]
    lt = pa.table({
        "k": pa.array(kl, type=pa.string()),
        "ts": pa.array(pd.to_datetime(
            base + rng.integers(0, 10**5, 120).astype("timedelta64[s]"))),
        "tag": pa.array([f"t{i}" for i in range(120)]),
    })
    rdf = pd.DataFrame({
        "k": [f"user-{i % 6}" for i in range(60)],
        "rts": pd.to_datetime(
            base + rng.integers(0, 10**5, 60).astype("timedelta64[s]")),
        "val": rng.normal(0, 1, 60),
    }).groupby(["k", "rts"], as_index=False).agg(val=("val", "max"))
    rt = pa.table({"k": pa.array(rdf["k"], type=pa.string()),
                   "rts": pa.array(rdf["rts"]),
                   "val": pa.array(rdf["val"], type=pa.float64())})
    out = asof_join(ray.data.from_arrow(lt).repartition(3),
                    ray.data.from_arrow(rt), on="k", left_ts="ts",
                    right_ts="rts", left_cols=["tag"], right_cols=["val"],
                    num_shards=5).to_pandas()
    want = pd.merge_asof(
        lt.to_pandas().assign(ts=lambda d: d["ts"].astype("datetime64[us]"))
        .sort_values("ts", kind="stable"),
        rdf.rename(columns={"rts": "ts"})
        .assign(ts=lambda d: d["ts"].astype("datetime64[us]"))
        .sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward")
    key = ["k", "ts", "tag"]
    a = out.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)[a.columns.tolist()]
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-12)


def test_hash_equi_join_inner_matches_pandas(ray_session, rng):
    from libfilter_ray.stages.joins import hash_equi_join

    n, m = 700, 1100
    lt = pa.table({
        "lk": pa.array(rng.integers(0, 120, n), type=pa.int64()),
        "lval": pa.array(rng.normal(0, 1, n), type=pa.float64()),
        "tag": pa.array([f"t{i % 5}" for i in range(n)]),
    })
    rt = pa.table({
        "rk": pa.array(rng.integers(60, 200, m), type=pa.int64()),
        "rval": pa.array(rng.integers(0, 10**6, m), type=pa.int64()),
    })
    out = hash_equi_join(
        ray.data.from_arrow(lt).repartition(4),
        ray.data.from_arrow(rt).repartition(3),
        left_on="lk", right_on="rk", left_cols=["lval", "tag"],
        right_cols=["rval"], num_shards=7).to_pandas()
    want = lt.to_pandas().merge(
        rt.to_pandas().rename(columns={"rk": "lk"}), on="lk", how="inner")
    key = ["lk", "lval", "tag", "rval"]
    a = out.sort_values(key).reset_index(drop=True)[key]
    b = want.sort_values(key).reset_index(drop=True)[key]
    pd.testing.assert_frame_equal(a, b)


def test_hash_equi_join_left_outer_nulls(ray_session, rng):
    from libfilter_ray.stages.joins import hash_equi_join

    lt = pa.table({"k": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                   "a": pa.array([10, 20, 30, 40, 50], type=pa.int64())})
    rt = pa.table({"rk": pa.array([2, 2, 4], type=pa.int64()),
                   "b": pa.array([7, 8, 9], type=pa.int64())})
    out = hash_equi_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                         left_on="k", right_on="rk", left_cols=["a"],
                         right_cols=["b"], num_shards=3,
                         how="left outer").to_pandas()
    out = out.sort_values(["k", "b"]).reset_index(drop=True)
    # unmatched left rows survive with null b; key 2 fans out to both rows
    assert len(out) == 6
    assert out.loc[out["k"].isin([1, 3, 5]), "b"].isna().all()
    assert sorted(out.loc[out["k"] == 2, "b"].astype(int)) == [7, 8]


def test_hash_equi_join_full_outer_matches_pandas(ray_session, rng):
    """Full outer == pandas outer merge: both directions null-extend,
    fan-out keys multiply, the coalesced key is never null (non-null-key
    rows), and each unmatched key appears exactly once."""
    from libfilter_ray.stages.joins import hash_equi_join

    n, m = 400, 600
    lt = pa.table({
        "lk": pa.array(rng.integers(0, 80, n), type=pa.int64()),
        "a": pa.array(np.arange(n), type=pa.int64()),
    })
    rt = pa.table({
        "rk": pa.array(rng.integers(40, 160, m), type=pa.int64()),
        "b": pa.array(np.arange(m), type=pa.int64()),
    })
    out = hash_equi_join(
        ray.data.from_arrow(lt).repartition(4),
        ray.data.from_arrow(rt).repartition(3),
        left_on="lk", right_on="rk", left_cols=["a"], right_cols=["b"],
        num_shards=7, how="full outer").to_pandas()
    want = lt.to_pandas().merge(
        rt.to_pandas().rename(columns={"rk": "lk"}), on="lk", how="outer")
    key = ["lk", "a", "b"]
    a = out.sort_values(key).reset_index(drop=True)[key].astype("float64")
    b = want.sort_values(key).reset_index(drop=True)[key].astype("float64")
    pd.testing.assert_frame_equal(a, b)
    assert out["lk"].notna().all()  # coalesced key
    assert out["a"].isna().any() and out["b"].isna().any()  # both sides


def test_hash_equi_join_full_outer_null_keys_and_prune_reject(ray_session):
    """Null keys never match but DO null-extend from both sides under
    full outer (SQL semantics); bloom pruning is rejected for full outer
    (it would drop right-only rows)."""
    from libfilter_ray.stages.joins import hash_equi_join

    lt = pa.table({"k": pa.array([1, None, 3], type=pa.int64()),
                   "a": pa.array([10, 20, 30], type=pa.int64())})
    rt = pa.table({"rk": pa.array([None, 3, 5], type=pa.int64()),
                   "b": pa.array([7, 8, 9], type=pa.int64())})
    kw = dict(left_on="k", right_on="rk", left_cols=["a"],
              right_cols=["b"], num_shards=3)
    out = hash_equi_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                         how="full outer", **kw).to_pandas()
    # 1 match (3-3) + left rows {1, null} + right rows {null, 5}
    assert len(out) == 5
    assert out.loc[out["b"] == 8, "k"].tolist() == [3]
    assert out["k"].isna().sum() == 2  # one null-key row from EACH side
    assert out.loc[out["a"].isna() & out["b"].isna()].empty

    with pytest.raises(ValueError, match="incompatible with a full outer"):
        hash_equi_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                       how="full outer", bloom_prune_right=True, **kw)


def test_hash_equi_join_bloom_pruned_equals_plain(ray_session, rng):
    """Semi-join bloom reduction: identical result, right side pre-filtered
    before the shuffle (left keys cover ~1/4 of right keys)."""
    from libfilter_ray.stages.joins import hash_equi_join

    lt = pa.table({
        "lk": pa.array(rng.integers(0, 50, 300), type=pa.int64()),
        "a": pa.array(np.arange(300), type=pa.int64()),
    })
    rt = pa.table({
        "rk": pa.array(rng.integers(0, 200, 2000), type=pa.int64()),
        "b": pa.array(np.arange(2000), type=pa.int64()),
    })
    kw = dict(left_on="lk", right_on="rk", left_cols=["a"],
              right_cols=["b"], num_shards=6)
    plain = hash_equi_join(ray.data.from_arrow(lt).repartition(3),
                           ray.data.from_arrow(rt).repartition(4),
                           **kw).to_pandas()
    pruned = hash_equi_join(ray.data.from_arrow(lt).repartition(3),
                            ray.data.from_arrow(rt).repartition(4),
                            bloom_prune_right=True, **kw).to_pandas()
    key = ["lk", "a", "b"]
    a = plain.sort_values(key).reset_index(drop=True)[key]
    b = pruned.sort_values(key).reset_index(drop=True)[key]
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_hash_equi_join_null_keys_sql_semantics(ray_session):
    """Null join keys never match (SQL semantics, inner + left outer);
    left outer keeps the null-key left row with null right columns."""
    from libfilter_ray.stages.joins import hash_equi_join

    lt = pa.table({"k": pa.array([1, None, 3], type=pa.int64()),
                   "a": pa.array([10, 20, 30], type=pa.int64())})
    rt = pa.table({"rk": pa.array([None, 3, 3], type=pa.int64()),
                   "b": pa.array([7, 8, 9], type=pa.int64())})
    kw = dict(left_on="k", right_on="rk", left_cols=["a"],
              right_cols=["b"], num_shards=3)
    inner = hash_equi_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                           **kw).to_pandas().sort_values(["k", "b"])
    assert inner["k"].tolist() == [3, 3]
    assert sorted(inner["b"].astype(int)) == [8, 9]
    louter = hash_equi_join(ray.data.from_arrow(lt),
                            ray.data.from_arrow(rt), how="left outer",
                            **kw).to_pandas()
    assert len(louter) == 4  # 2 matches + key-1 unmatched + null-key row
    assert louter.loc[louter["k"].isna(), "b"].isna().all()
    assert louter.loc[louter["k"] == 1, "b"].isna().all()


def test_hash_equi_join_salted_skew_equals_plain(ray_session, rng):
    """Hot-key salting: one key carries 60% of the right side; salted and
    plain joins must produce identical rows, and detect_hot_keys must find
    the heavy key."""
    from libfilter_ray.stages.joins import detect_hot_keys, hash_equi_join

    n_hot = 1200
    rk = np.concatenate([np.full(n_hot, 7), rng.integers(8, 100, 800)])
    rng.shuffle(rk)
    lt = pa.table({"k": pa.array(np.arange(100), type=pa.int64()),
                   "a": pa.array(np.arange(100) * 10, type=pa.int64())})
    rt = pa.table({"rk": pa.array(rk, type=pa.int64()),
                   "b": pa.array(np.arange(len(rk)), type=pa.int64())})
    rds = ray.data.from_arrow(rt).repartition(6)
    hot = detect_hot_keys(rds, "rk", sample_per_batch=64, min_frac=0.2)
    assert 7 in set(int(x) for x in hot)

    kw = dict(left_on="k", right_on="rk", left_cols=["a"],
              right_cols=["b"], num_shards=8)
    plain = hash_equi_join(ray.data.from_arrow(lt), rds, **kw).to_pandas()
    salted = hash_equi_join(ray.data.from_arrow(lt), rds,
                            hot_keys=hot, hot_salt=4, **kw).to_pandas()
    key = ["k", "a", "b"]
    a = plain.sort_values(key).reset_index(drop=True)[key]
    b = salted.sort_values(key).reset_index(drop=True)[key]
    pd.testing.assert_frame_equal(a, b)
    assert (a["k"] == 7).sum() == n_hot


def test_hash_equi_join_salting_never_duplicates(ray_session):
    """Regression: sub-shards of a hot key must be INJECTIVE in the salt —
    an independent per-salt hash collided two sub-shards ~50% of the time
    (salt=4, shards=8) and the duplicated left replicas joined the same
    right rows twice. Every key hot, exact row-count check."""
    from libfilter_ray.stages.joins import hash_equi_join

    lt = pa.table({"k": pa.array(np.arange(200), type=pa.int64()),
                   "a": pa.array(np.arange(200), type=pa.int64())})
    rk = np.repeat(np.arange(200), 5)
    rt = pa.table({"rk": pa.array(rk, type=pa.int64()),
                   "b": pa.array(np.arange(len(rk)), type=pa.int64())})
    out = hash_equi_join(ray.data.from_arrow(lt).repartition(3),
                         ray.data.from_arrow(rt).repartition(4),
                         left_on="k", right_on="rk", left_cols=["a"],
                         right_cols=["b"], num_shards=8,
                         hot_keys=list(range(200)), hot_salt=4).to_pandas()
    assert len(out) == 1000
    assert out.groupby("k").size().eq(5).all()
    assert out["b"].nunique() == 1000


def test_hash_equi_join_string_keys(ray_session, rng):
    from libfilter_ray.stages.joins import hash_equi_join

    lt = pa.table({"k": pa.array([f"u{i % 11}" for i in range(200)]),
                   "a": pa.array(np.arange(200), type=pa.int64())})
    rt = pa.table({"rk": pa.array([f"u{i % 7}" for i in range(90)]),
                   "b": pa.array(np.arange(90), type=pa.int64())})
    out = hash_equi_join(ray.data.from_arrow(lt).repartition(3),
                         ray.data.from_arrow(rt),
                         left_on="k", right_on="rk", left_cols=["a"],
                         right_cols=["b"], num_shards=5).to_pandas()
    want = lt.to_pandas().merge(
        rt.to_pandas().rename(columns={"rk": "k"}), on="k", how="inner")
    key = ["k", "a", "b"]
    a = out.sort_values(key).reset_index(drop=True)[key]
    b = want.sort_values(key).reset_index(drop=True)[key]
    pd.testing.assert_frame_equal(a, b)


def test_stratified_sample_string_ids(ray_session):
    import pyarrow.parquet as pq

    from libfilter_ray.stages.sample import stratified_sample

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "lang"])
    t = t.append_column("sid", pa.array([f"doc-{i}" for i in
                                         np.asarray(t["doc_id"])]))
    picks = []
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = stratified_sample(ds, "lang", "sid", 15).to_pandas()
        assert (out.groupby("lang").size() <= 15).all()
        picks.append(set(out["sid"]))
    assert picks[0] == picks[1]


def test_hash_equi_join_validates_inputs(ray_session):
    from libfilter_ray.stages.joins import hash_equi_join

    lt = pa.table({"k": pa.array([1], type=pa.int64()),
                   "a": pa.array([1], type=pa.int64())})
    rt = pa.table({"rk": pa.array([1], type=pa.int64()),
                   "b": pa.array([1], type=pa.int64())})
    lds, rds = ray.data.from_arrow(lt), ray.data.from_arrow(rt)
    with pytest.raises(ValueError, match="disjoint"):
        hash_equi_join(lds, rds, left_on="k", right_on="rk",
                       left_cols=["a"], right_cols=["a"])
    with pytest.raises(ValueError, match="how"):
        hash_equi_join(lds, rds, left_on="k", right_on="rk",
                       left_cols=["a"], right_cols=["b"], how="right outer")
    with pytest.raises(ValueError, match="full outer"):
        hash_equi_join(lds, rds, left_on="k", right_on="rk",
                       left_cols=["a"], right_cols=["b"], how="full outer",
                       bloom_prune_right=True)
    with pytest.raises(ValueError, match="salting"):
        hash_equi_join(lds, rds, left_on="k", right_on="rk",
                       left_cols=["a"], right_cols=["b"], how="left outer",
                       hot_keys=[1])
