"""Range-partitioned drop-id store (stages/dropstore.py) and the
broadcast-vs-store switch in exact/line dedup (stages/dedup.py).

The round-3 scale contract: the drop set is a Dataset end-to-end; only a
bounded carrier (sorted array <= DROP_BROADCAST_LIMIT, else a bloom +
range manifest) is ever shared — so forcing tiny limits must leave every
result byte-identical to the broadcast path."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


@pytest.fixture()
def tmp_store_dir(tmp_path):
    return str(tmp_path / "store")


def _ids_ds(ids):
    return ray.data.from_arrow(
        pa.table({"drop_id": pa.array(ids, type=pa.int64())}))


def test_store_contains_matches_isin(ray_session, tmp_store_dir):
    from libfilter_ray.stages.dropstore import DropIdStore

    rng = np.random.default_rng(7)
    drop = np.unique(rng.integers(-(1 << 40), 1 << 40, 5000))
    store = DropIdStore.write(_ids_ds(drop).repartition(4), tmp_store_dir,
                              rows_per_file=512)
    assert store.n_ids == len(drop)
    assert len(store.files) >= 2  # actually range-partitioned
    probe = np.concatenate([drop[::3],
                            rng.integers(-(1 << 40), 1 << 40, 3000)])
    got = store.contains(probe)
    assert np.array_equal(got, np.isin(probe, drop))
    # re-attach from disk in a fresh object (resume path)
    again = DropIdStore(tmp_store_dir)
    assert np.array_equal(again.contains(probe), got)


def test_store_empty(ray_session, tmp_store_dir):
    from libfilter_ray.stages.dropstore import DropIdStore

    store = DropIdStore.write(_ids_ds([]), tmp_store_dir)
    assert store.n_ids == 0
    assert not store.contains(np.array([1, 2, 3], dtype=np.int64)).any()


def test_store_refuses_overwrite(ray_session, tmp_store_dir):
    from libfilter_ray.stages.dropstore import DropIdStore

    DropIdStore.write(_ids_ds([1, 2]), tmp_store_dir)
    with pytest.raises(FileExistsError):
        DropIdStore.write(_ids_ds([3]), tmp_store_dir)


def test_exact_dedup_store_path_identical(ray_session, tmp_store_dir):
    from libfilter_ray.stages.dedup import exact_dedup

    n = 3000
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": [f"payload-{i % 700}" for i in range(n)],
    })).repartition(6)
    base = exact_dedup(ds, "text", "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    via_store = exact_dedup(ds, "text", "doc_id", broadcast_limit=16,
                            store_dir=tmp_store_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(base) == 700
    assert base.equals(via_store)


def test_exact_dedup_bloom_only_multi_path(ray_session):
    """multi_limit smaller than the dup-group count forces the
    distributed-bloom-only prune; result must be identical (false
    positives survive as their own group's min)."""
    from libfilter_ray.stages.dedup import (exact_dedup_drop_ds,
                                            exact_dedup_drop_ids)

    n = 2000
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": [f"x-{i % 450}" for i in range(n)],
    })).repartition(5)
    ref = exact_dedup_drop_ids(ds, "text", "doc_id")
    got = exact_dedup_drop_ds(ds, "text", "doc_id",
                              multi_limit=3).to_pandas()
    assert np.array_equal(np.sort(got["drop_id"].to_numpy()), ref)


def test_line_dedup_store_path_identical(ray_session, tmp_store_dir):
    from libfilter_ray.stages.dedup import line_dedup

    docs = pa.table({
        "doc_id": pa.array(np.arange(80), type=pa.int64()),
        "text": [f"boiler A\nunique {i}\nboiler B" for i in range(80)],
    })
    ds = ray.data.from_arrow(docs).repartition(4)
    a = line_dedup(ds, "text", "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = line_dedup(ds, "text", "doc_id", broadcast_limit=2,
                   store_dir=tmp_store_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert a["text"][0] == "boiler A\nunique 0\nboiler B"
    assert a["text"][1] == "unique 1"
