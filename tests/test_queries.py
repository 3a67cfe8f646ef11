"""Driver-gate replica: run every oracled queries() entry at sf0.001 and
compare schema + values against its oracle_sql() in DuckDB; sanity-check the
sketch queries against exact answers."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from conftest import SF_DIR

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "_ray_entry_test", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_index(axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_oracled_queries_match_duckdb(entry_mod, duck):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        res = qs[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        oracle = duck.sql(sql).df()
        a, b = _norm(res), _norm(oracle)
        assert list(a.columns) == list(b.columns), name
        assert len(a) == len(b), name
        b = b.astype(a.dtypes.to_dict())
        pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-9,
                                      obj=name)


def test_entry_smoke(entry_mod):
    out = entry_mod.entry()
    assert len(out) > 0
    assert (out["members_found"] == out["rows"]).all()
    assert (out["fpp_measured"] < 2 * out["fpp_configured"] + 0.002).all()


def test_sketch_summary_within_bounds(entry_mod, duck):
    res = entry_mod.queries()["sketch_summary_events"](SF_DIR)
    exact = duck.sql("""
        SELECT event_type, count(DISTINCT user_id) AS nd,
               quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY event_type ORDER BY event_type""").df()
    merged = res.merge(exact, on="event_type")
    # HLL within 3*1.04/sqrt(2^12)
    rel = (merged["distinct_users_est"] - merged["nd"]).abs() / merged["nd"]
    assert (rel < 3 * 1.04 / 2**6).all()
    # quantile sketches near exact (value range ~[0, 300])
    assert ((merged["value_p50_td"] - merged["p50"]).abs() < 5).all()
    assert ((merged["value_p50_kll"] - merged["p50"]).abs() < 5).all()
