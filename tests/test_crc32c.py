"""CRC32C kernel: the numpy lockstep/tree-combine implementation vs
the byte-at-a-time reference, plus the published check value."""

import numpy as np
import pytest

from beats_ray.sources.crc32c import crc32c, crc32c_many, crc32c_py


def test_published_check_value():
    # the CRC32C check value from the Castagnoli spec (RFC 3720 B.4)
    assert crc32c_py(b"123456789") == 0xE3069283
    assert crc32c(b"123456789") == 0xE3069283


@pytest.mark.parametrize("size", [
    0, 1, 2, 7, 63, 127, 255, 1024, 4095, 4096, 4097, 5000,
    65536, 200001,
])
def test_streamed_matches_reference(size):
    rng = np.random.default_rng(size)
    data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    assert crc32c(data) == crc32c_py(data)


def test_incremental_continuation():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 9000, dtype=np.uint8).tobytes()
    assert crc32c(b, value=crc32c(a)) == crc32c_py(a + b)
    assert crc32c_py(b, value=crc32c_py(a)) == crc32c(a + b)


def test_many_mixed_sizes_and_empties():
    rng = np.random.default_rng(2)
    sizes = [0, 1, 3, 100, 100, 127, 128, 129, 4096, 25000, 0, 200000]
    bufs = [rng.integers(0, 256, s, dtype=np.uint8).tobytes()
            for s in sizes]
    got = crc32c_many(bufs)
    assert got.dtype == np.uint32
    assert list(got) == [crc32c_py(b) for b in bufs]


def test_many_empty_input():
    assert crc32c_many([]).shape == (0,)
    assert list(crc32c_many([b"", b""])) == [0, 0]


def test_many_bucket_boundaries():
    # sizes straddling the power-of-two bucket edges
    rng = np.random.default_rng(3)
    bufs = [rng.integers(0, 256, s, dtype=np.uint8).tobytes()
            for s in [255, 256, 257, 511, 512, 513]]
    assert list(crc32c_many(bufs)) == [crc32c_py(b) for b in bufs]
