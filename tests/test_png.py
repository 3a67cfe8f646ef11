"""Real PNG decode (stages/multimodal.py): stdlib-zlib chunk walk +
exact numpy unfiltering of all five scanline filter types."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_ray.stages.multimodal import (PNG_SIG, PngFeatureStage,
                                             attach_png_images,
                                             decode_png, encode_png)


@settings(max_examples=50, deadline=None)
@given(w=st.integers(1, 24), h=st.integers(1, 20),
       seed=st.integers(0, 10_000), gray=st.booleans())
def test_png_roundtrip_property(w, h, seed, gray):
    """Any uint8 image survives encode->decode byte-exactly; the encoder
    cycles all five filter types, so every unfilter path is exercised
    whenever h >= 5."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_png(encode_png(img))
    want = img[:, :, None] if gray else img
    np.testing.assert_array_equal(got, want)


def test_every_filter_type_decodes():
    """A 10-row image guarantees each filter type (y % 5) runs twice."""
    y, x, c = np.ogrid[0:10, 0:7, 0:3]
    img = ((x * (y + 1) + c * 31) % 256).astype(np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def test_multi_idat_concatenation():
    """The zlib stream split across many tiny IDAT chunks still inflates
    to the same image."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    one = encode_png(img, idat_chunk=1 << 20)
    many = encode_png(img, idat_chunk=16)
    assert many.count(b"IDAT") > one.count(b"IDAT")
    np.testing.assert_array_equal(decode_png(one), decode_png(many))


def test_malformed_png_raises():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    # flip a byte inside IDAT data -> CRC mismatch
    bad = bytearray(good)
    idat_pos = good.find(b"IDAT")
    bad[idat_pos + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(good[:-8])
    # unsupported: 16-bit depth in IHDR (CRC recomputed to isolate the
    # depth check from the CRC check)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    rest = good[8 + 12 + 13:]
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(PNG_SIG + chunk + rest)


def test_png_feature_stage_matches_formula(ray_session):
    """End-to-end actor-pool decode: per-image channel means equal the
    synthesis formula's exact means."""
    import ray.data

    ids = np.arange(40, dtype=np.int64)
    t = pa.table({"doc_id": ids, "lang": ["en"] * 40})
    ds = ray.data.from_arrow(t).repartition(3)
    out = ds.map_batches(attach_png_images, batch_format="pyarrow") \
        .map_batches(PngFeatureStage, batch_size=16, concurrency=2,
                     batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for _, r in out.iterrows():
        i = int(r["doc_id"])
        w, h = 8 + i % 13, 8 + i % 11
        assert (r["width"], r["height"]) == (w, h)
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        px = ((x * (y + 1) + i + c) % 256).astype(np.float64)
        np.testing.assert_allclose(
            [r["mean_r"], r["mean_g"], r["mean_b"]],
            px.mean(axis=(0, 1)), rtol=0, atol=1e-12)


def test_png_stage_rejects_other_codecs():
    with pytest.raises(NotImplementedError):
        PngFeatureStage(codec="jpeg")
