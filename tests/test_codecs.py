"""Pure-Python PNG/WAV codec tests: encode→decode round-trips, all
five PNG scanline filters, PIL cross-check when available."""

import struct
import zlib

import numpy as np
import pytest

from beats_ray.dataops.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def _rng_img(shape, seed=0):
    return np.random.RandomState(seed).randint(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("shape", [(5, 7), (8, 3, 3), (4, 4, 4)])
def test_png_roundtrip(shape):
    arr = _rng_img(shape)
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def _png_with_filters(arr, ftypes):
    """Assemble a gray PNG whose scanline y uses filter ftypes[y] —
    applying the spec's filter functions forward so decode must invert
    them."""
    h, w = arr.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        line = arr[y].astype(np.int32)
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        for i in range(w):
            left = int(line[i - 1]) if i >= 1 else 0
            up = int(prev[i])
            ul = int(prev[i - 1]) if i >= 1 else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = line[i] - left
            elif ft == 2:
                v = line[i] - up
            elif ft == 3:
                v = line[i] - (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else ul)
                v = line[i] - pred
            raw.append(v & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filters(ftypes):
    arr = _rng_img((6, 9), seed=3)
    data = _png_with_filters(arr, ftypes)
    assert np.array_equal(decode_png(data), arr)


def test_png_pil_crosscheck():
    PIL = pytest.importorskip("PIL.Image")
    import io

    arr = _rng_img((10, 12, 3), seed=5)
    ours = encode_png(arr)
    assert np.array_equal(np.asarray(PIL.open(io.BytesIO(ours))), arr)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


@pytest.mark.parametrize("stereo", [False, True])
def test_wav_roundtrip(stereo):
    rng = np.random.RandomState(2)
    shape = (1000, 2) if stereo else (1000,)
    samples = rng.randint(-32768, 32767, size=shape).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, 22050))
    assert rate == 22050
    assert np.array_equal(out, samples)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
