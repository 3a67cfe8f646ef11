"""stages/multimodal.py 24-bit BMP codec — bottom-up/BGR/padding traps."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_ray.stages.multimodal import (BmpFeatureStage,
                                             attach_bmp_images,
                                             decode_bmp, encode_bmp)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40),
       st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_decoder_honors_topdown_sign():
    """Negative biHeight = rows stored top-down (spec): a hand-built
    payload (not from our bottom-up encoder) decodes unflipped."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (3, 5, 3)).astype(np.uint8)
    stride = (5 * 3 + 3) & ~3
    data = bytearray()
    for y in range(3):
        data += img[y, :, ::-1].tobytes() + b"\x00" * (stride - 15)
    payload = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, 5, -3, 1, 24, 0,
                             len(data), 0, 0, 0, 0) + bytes(data))
    np.testing.assert_array_equal(decode_bmp(payload), img)


def test_bmp_feature_stage_matches_formula(ray_session):
    import pyarrow as pa

    t = pa.table({"doc_id": pa.array(range(30), type=pa.int64())})
    out = BmpFeatureStage()(attach_bmp_images(t))
    for i in range(30):
        w, h = 8 + i % 13, 8 + i % 11
        y, x = np.ogrid[0:h, 0:w]
        base = (x * (y + 1) + i).astype(np.int64)
        assert out["width"][i].as_py() == w
        assert out["height"][i].as_py() == h
        for c, ch in enumerate("rgb"):
            assert out[f"px_sum_{ch}"][i].as_py() == \
                int(((base + c) % 256).sum())
    assert "image" not in out.column_names


def test_bmp_rejections():
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        BmpFeatureStage(codec="jpeg")
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"GIF87a...")
    img = np.zeros((2, 2, 3), np.uint8)
    raw = bytearray(encode_bmp(img))
    raw[28] = 8  # bpp 24 -> 8
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(raw))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(encode_bmp(img))[:-4])
