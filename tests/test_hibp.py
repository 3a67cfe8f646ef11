"""HIBP-format source: bit-exact reversed-nibble decode
(cpp/extras/benchmarks/hibp.cpp:27-31,79-90) and the 32->64 re-hash
(java BlockFilter.java:236-247)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from conftest import rand_u64
from libfilter_ray.sketch.hashing import REHASH_32, rehash_32_to_64
from libfilter_ray.sources.hibp import (parse_hibp_lines, parse_stage,
                                        read_hibp, write_hibp_file)


def _reference_parse(line: str) -> int:
    """Literal transcription of the reference's FromHex loop."""
    def from_hex(c):
        return ord(c) - ord("0") if c <= "9" else 10 + ord(c) - ord("A")

    x = 0
    for i in range(16):
        x = (x << 4) | from_hex(line[39 - i])
    return x


def test_roundtrip_and_reference_parity(rng, tmp_path):
    keys = rand_u64(rng, 500)
    path = str(tmp_path / "corpus.txt")
    write_hibp_file(path, keys)
    lines = open(path).read().splitlines()
    assert all(len(l) >= 42 and l[40] == ":" for l in lines)
    # vectorized decode == reference scalar decode == original keys
    got = parse_hibp_lines(pa.array(lines))
    assert np.array_equal(got, keys)
    for i in (0, 7, 499):
        assert _reference_parse(lines[i]) == keys[i]


def test_parse_stage_counts(rng, tmp_path):
    keys = rand_u64(rng, 64)
    counts = np.arange(1, 65, dtype=np.int64)
    path = str(tmp_path / "c.txt")
    write_hibp_file(path, keys, counts)
    t = parse_stage(pa.table({"text": pa.array(open(path).read().splitlines())}))
    assert np.array_equal(np.asarray(t["key"]).view(np.uint64), keys)
    assert np.asarray(t["count"]).tolist() == counts.tolist()


def test_read_hibp_distributed(rng, tmp_path, ray_session):
    keys = rand_u64(rng, 2000)
    path = str(tmp_path / "d.txt")
    write_hibp_file(path, keys)
    out = read_hibp(path).to_pandas()
    assert np.array_equal(np.sort(out["key"].to_numpy().view(np.uint64)),
                          np.sort(keys))


def test_rehash_32_to_64_matches_reference():
    h = np.array([0, 1, 0x7FFFFFFF, 0xFFFFFFFF, 0xDEADBEEF], dtype=np.uint32)
    got = rehash_32_to_64(h)
    for i, v in enumerate(h):
        # java: (((REHASH_32 * (long) hash) >>> 32) << 32) | hash, with the
        # implicit sign extension of (long) int — replicate exactly
        signed = int(np.int32(v)) % (1 << 64)  # java (long) int, as u64
        prod = (int(REHASH_32) * signed) % (1 << 64)
        want = ((prod >> 32) << 32 | signed) % (1 << 64)
        assert int(got[i]) == want, (v, int(got[i]), want)
