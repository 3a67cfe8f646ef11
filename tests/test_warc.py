"""Gzip'd WARC source/sink (sources/warc.py): byte-level round-trips,
record skipping, error paths, and the Ray streaming read."""

import gzip

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_ray.sources.warc import (iter_warc_records, read_warc,
                                        response_member, warcinfo_member,
                                        write_warc_gz,
                                        write_warc_shards_stage)


def _roundtrip(urls, ts_us, htmls, tmp_path):
    path = str(tmp_path / "t.warc.gz")
    n = write_warc_gz(path, urls, ts_us, htmls)
    with open(path, "rb") as f:
        got = list(iter_warc_records(f.read()))
    assert n == len(urls) == len(got)
    return got


def test_roundtrip_exact(tmp_path):
    urls = ["https://a.example.org/en/page-1.html",
            "https://b.example.org/de/page-2.html"]
    ts = [1_709_251_200_000_000, 1_709_252_537_000_000]
    htmls = [b"<html>hello</html>", b"bytes \x00\xff\r\n\r\n tricky"]
    got = _roundtrip(urls, ts, htmls, tmp_path)
    for (u, t, h), wu, wt, wh in zip(got, urls, ts, htmls):
        assert u == wu
        assert t == wt // 1_000_000 * 1_000_000  # WARC-Date = seconds
        assert h == wh


def test_non_response_records_skipped(tmp_path):
    """warcinfo (and any other non-response type) must be skipped."""
    data = warcinfo_member("x.warc.gz") + response_member(
        "https://x.example.org/en/page-3.html", 1_709_251_200_000_000,
        b"<html>one</html>")
    got = list(iter_warc_records(data))
    assert len(got) == 1
    assert got[0][2] == b"<html>one</html>"


def test_plain_uncompressed_warc():
    """Auto-detects a plain .warc stream (no gzip framing)."""
    rec = gzip.decompress(response_member(
        "https://x.example.org/en/page-4.html", 1_709_251_200_000_000,
        b"<p>plain</p>"))
    got = list(iter_warc_records(rec * 3))
    assert len(got) == 3
    assert all(h == b"<p>plain</p>" for _, _, h in got)


def test_truncated_and_corrupt_raise(tmp_path):
    full = warcinfo_member("t") + response_member(
        "https://x.example.org/en/page-5.html", 0, b"abc")
    with pytest.raises(ValueError, match="truncated|corrupt"):
        list(iter_warc_records(full[:-7]))
    bad = bytearray(full)
    bad[len(full) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt|truncated|malformed"):
        list(iter_warc_records(bytes(bad)))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=4096), min_size=1,
                max_size=8),
       st.integers(min_value=0, max_value=2**33))  # < year 2242
def test_html_payload_roundtrip_property(tmp_path_factory, htmls, ts0):
    """Any byte payload — including CRLF pairs, gzip magic, nulls —
    survives the WARC/HTTP/gzip framing exactly."""
    tmp = tmp_path_factory.mktemp("warcprop")
    urls = [f"https://p.example.org/en/page-{i}.html"
            for i in range(len(htmls))]
    ts = [(ts0 + i) * 1_000_000 for i in range(len(htmls))]
    got = _roundtrip(urls, ts, htmls, tmp)
    for (u, t, h), wu, wt, wh in zip(got, urls, ts, htmls):
        assert (u, t, h) == (wu, wt, wh)


def test_ray_read_warc_streams_batches(tmp_path, ray_session):
    """End-to-end: distributed shard write -> read_warc -> counts; the
    generator stage yields bounded batches."""
    import ray.data

    n = 700
    df = pa.table({
        "url": [f"https://s.example.org/en/page-{i}.html"
                for i in range(n)],
        "warc_ts": pa.array(
            np.arange(n, dtype=np.int64) * 1_000_000 + 1_709_251_200_000_000,
            type=pa.timestamp("us")),
        "html": [f"<html>doc {i}</html>".encode() for i in range(n)],
    })
    ds = ray.data.from_arrow(df).repartition(3)
    manifest = ds.map_batches(write_warc_shards_stage(str(tmp_path)),
                              batch_format="pyarrow").to_pandas()
    assert manifest["n_records"].sum() == n
    assert len(manifest) >= 3
    back = read_warc(sorted(manifest["shard_path"]), batch_rows=128)
    got = back.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == n
    assert set(got["url"]) == set(df["url"].to_pylist())
    assert bytes(got["html"].iloc[0]).startswith(b"<html>doc ")


def test_shard_write_is_idempotent(tmp_path, ray_session):
    """Re-running the same input block overwrites its own shard file
    (resumable partitioned output), never appends a duplicate."""
    import ray.data

    df = pa.table({
        "url": [f"https://s.example.org/en/page-{i}.html"
                for i in range(50)],
        "warc_ts": pa.array(np.full(50, 1_709_251_200_000_000),
                            type=pa.timestamp("us")),
        "html": [b"<p>x</p>"] * 50,
    })
    ds = ray.data.from_arrow(df).repartition(1)
    stage = write_warc_shards_stage(str(tmp_path))
    m1 = ds.map_batches(stage, batch_format="pyarrow").to_pandas()
    m2 = ds.map_batches(stage, batch_format="pyarrow").to_pandas()
    assert sorted(m1["shard_path"]) == sorted(m2["shard_path"])
    total = sum(len(list(iter_warc_records(open(p, "rb").read())))
                for p in set(m1["shard_path"]))
    assert total == 50


def test_warc11_fractional_second_dates():
    """WARC 1.1 fractional-second WARC-Date values (warcio-style) parse
    to µs instead of crashing the import."""
    from libfilter_ray.sources.warc import _parse_warc_date

    assert _parse_warc_date("2023-06-01T12:00:00Z") \
        == _parse_warc_date("2023-06-01T12:00:00.000Z")
    assert _parse_warc_date("2023-06-01T12:00:00.123456Z") \
        == _parse_warc_date("2023-06-01T12:00:00Z") + 123456
    assert _parse_warc_date("2023-06-01T12:00:00.5Z") \
        == _parse_warc_date("2023-06-01T12:00:00Z") + 500000
    # end-to-end: a record with a fractional date round-trips
    import gzip

    from libfilter_ray.sources.warc import (iter_warc_records,
                                            response_member)
    rec = gzip.decompress(response_member(
        "https://x.example.org/en/page-9.html", 1_700_000_000_000_000,
        b"<p>x</p>"))
    rec = rec.replace(b"WARC-Date: 2023-11-14T22:13:20Z",
                      b"WARC-Date: 2023-11-14T22:13:20.250000Z")
    (url, ts, html), = iter_warc_records(rec)
    assert ts == 1_700_000_000_250_000
