"""stages/multimodal.py GIF87a codec — pure-Python GIF-variant LZW."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_ray.stages.multimodal import (GifFeatureStage,
                                             attach_gif_images,
                                             decode_gif, encode_gif)


def _wrap_gif(w, h, palette, mcs, lzw_bytes):
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h) + bytes([0xF7, 0, 0])
    out += palette.astype(np.uint8).tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(mcs)
    for i in range(0, len(lzw_bytes), 255):
        b = lzw_bytes[i:i + 255]
        out.append(len(b))
        out += b
    out += b"\x00\x3B"
    return bytes(out)


def test_decoder_spec_anchor_handpacked():
    """Decode a stream hand-packed from the GIF spec's coding rules
    (NOT produced by our encoder): pixels [0,1,1,0] at min-code-size 8
    = codes [CLEAR=256, 0, 1, 1, 0, EOI=257], all 9 bits, LSB-first."""
    codes = [256, 0, 1, 1, 0, 257]
    acc = n = 0
    out = bytearray()
    for c in codes:
        acc |= c << n
        n += 9
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    img = decode_gif(_wrap_gif(2, 2, pal, 8, bytes(out)))
    np.testing.assert_array_equal(
        img[:, :, 0], np.array([[0, 1], [1, 0]], dtype=np.uint8))


def test_decoder_skips_gif89a_extensions():
    """A GIF89a graphic-control extension before the image descriptor
    is skipped, not fatal."""
    idx = np.arange(16, dtype=np.uint8).reshape(4, 4)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    raw = bytearray(encode_gif(idx, pal))
    raw[:6] = b"GIF89a"
    ext = b"\x21\xF9\x04\x00\x00\x00\x00\x00"  # GCE + terminator
    pos = 13 + 768  # header + GCT
    payload = bytes(raw[:pos]) + ext + bytes(raw[pos:])
    np.testing.assert_array_equal(decode_gif(payload), pal[idx])


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 60), st.integers(1, 60), st.integers(0, 2**32 - 1))
def test_gif_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(idx, pal)),
                                  pal[idx])


def test_gif_roundtrip_table_full():
    """A low-entropy 19k-px image drives the LZW table through every
    width bump to 4096 entries (deferred-clear: adds stop, stream keeps
    decoding)."""
    idx = np.tile(np.arange(96, dtype=np.uint8), 200).reshape(150, 128)
    pal = np.zeros((256, 3), np.uint8)
    pal[:, 1] = np.arange(256)
    np.testing.assert_array_equal(decode_gif(encode_gif(idx, pal)),
                                  pal[idx])


def test_gif_feature_stage_matches_formula(ray_session):
    import pyarrow as pa

    t = pa.table({"doc_id": pa.array(range(30), type=pa.int64())})
    out = GifFeatureStage()(attach_gif_images(t))
    for i in range(30):
        w, h = 8 + i % 13, 8 + i % 11
        y, x = np.ogrid[0:h, 0:w]
        idx = ((x * (y + 1) + i) % 256).astype(np.int64)
        assert out["width"][i].as_py() == w
        assert out["height"][i].as_py() == h
        assert out["px_sum_r"][i].as_py() == int(idx.sum())
        assert out["px_sum_g"][i].as_py() == int(((2 * idx) % 256).sum())
        assert out["px_sum_b"][i].as_py() == int((255 - idx).sum())
    assert "image" not in out.column_names


def test_gif_stage_rejects_codecs():
    with pytest.raises(NotImplementedError, match="codec library"):
        GifFeatureStage(codec="webp")


def test_gif_decoder_rejects_malformed():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG...")
    idx = np.zeros((4, 4), np.uint8)
    pal = np.zeros((256, 3), np.uint8)
    raw = bytearray(encode_gif(idx, pal))
    raw[10] &= 0x7F  # clear the GCT flag
    with pytest.raises(ValueError, match="color table"):
        decode_gif(bytes(raw))
