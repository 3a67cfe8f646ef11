"""Real YUV4MPEG2 video decode (stages/multimodal.py): header/FRAME
walk, plane slicing, frame sampling."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_ray.stages.multimodal import (Y4M_H, Y4M_W,
                                             Y4mFrameSampleStage,
                                             attach_y4m_videos,
                                             decode_y4m, encode_y4m)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(1, 8), w2=st.integers(1, 12), h2=st.integers(1, 10),
       seed=st.integers(0, 10_000))
def test_y4m_roundtrip_property(n, w2, h2, seed):
    """Any C420 plane stack survives encode->decode byte-exactly."""
    rng = np.random.default_rng(seed)
    w, h = 2 * w2, 2 * h2
    y = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, size=(n, h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, size=(n, h // 2, w // 2), dtype=np.uint8)
    gy, gu, gv = decode_y4m(encode_y4m(y, u, v))
    np.testing.assert_array_equal(gy, y)
    np.testing.assert_array_equal(gu, u)
    np.testing.assert_array_equal(gv, v)


def test_y4m_malformed_raises():
    y = np.zeros((2, 4, 4), dtype=np.uint8)
    u = v = np.zeros((2, 2, 2), dtype=np.uint8)
    good = encode_y4m(y, u, v)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF" + good)
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(good[:-3])
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(good[:good.find(b"FRAME")] + b"JUNK!\n"
                   + good[good.find(b"FRAME") + 6:])
    # C444 rejected honestly
    bad = good.replace(b"C420", b"C444")
    with pytest.raises(ValueError, match="C420"):
        decode_y4m(bad)
    with pytest.raises(ValueError, match="no frames"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420\n")


def test_frame_sample_stage_matches_formula(ray_session):
    """Per-video sampled-frame means equal the synthesis formula."""
    import ray.data

    ids = np.arange(30, dtype=np.int64)
    t = pa.table({"doc_id": ids, "lang": ["en"] * 30})
    out = ray.data.from_arrow(t).repartition(2) \
        .map_batches(attach_y4m_videos, batch_format="pyarrow") \
        .map_batches(Y4mFrameSampleStage, batch_size=16, concurrency=2,
                     batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for _, r in out.iterrows():
        i = int(r["doc_id"])
        nf = 2 + i % 11
        assert r["n_frames"] == nf
        fr = np.arange(nf)[::3]
        assert r["n_sampled"] == len(fr)
        f, y, x = np.ogrid[0:nf, 0:Y4M_H, 0:Y4M_W]
        luma = ((x * (y + 1) + 7 * f + i) % 256).astype(np.float64)
        want_y = luma[fr].mean(axis=(1, 2)).mean()
        np.testing.assert_allclose(r["mean_y"], want_y, rtol=0,
                                   atol=1e-12)
        np.testing.assert_allclose(
            r["mean_u"], ((i + 5 * fr) % 256).astype(float).mean(),
            atol=1e-12)
        np.testing.assert_allclose(
            r["mean_v"], ((i + 11 * fr) % 256).astype(float).mean(),
            atol=1e-12)


def test_y4m_stage_rejects_other_codecs():
    with pytest.raises(NotImplementedError):
        Y4mFrameSampleStage(codec="h264")
