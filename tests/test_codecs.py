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


def test_avi_roundtrip_rgb_and_gray():
    from beats_ray.dataops.codecs import decode_avi, encode_avi

    rng = np.random.RandomState(3)
    # width 9 → stride padding exercised; gray replicates to 3 channels
    for shape in [(5, 24, 32, 3), (3, 7, 9), (2, 1, 1, 3)]:
        fr = rng.randint(0, 256, shape).astype(np.uint8)
        dec, fps = decode_avi(encode_avi(fr, fps=25))
        want = np.repeat(fr[..., None], 3, axis=3) if fr.ndim == 3 else fr
        assert fps == 25
        assert np.array_equal(dec, want)


def test_avi_rejects_garbage_and_compressed():
    import struct

    from beats_ray.dataops.codecs import decode_avi

    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxNOPE")
    # biCompression != 0 → honest NotImplementedError (needs a codec)
    strf = struct.pack("<IiiHHI", 40, 4, 4, 1, 24, 1)
    body = (b"AVI " + struct.pack("<4sI", b"strf", len(strf)) + strf)
    data = struct.pack("<4sI", b"RIFF", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_avi(data)


def test_frame_sampler_real_path_decodes_avi():
    import pandas as pd

    from beats_ray.dataops.codecs import encode_avi
    from beats_ray.dataops.multimodal import FrameSampler

    fr = (np.arange(4 * 6 * 8) % 256).astype(np.uint8).reshape(4, 6, 8)
    payload = encode_avi(fr, fps=10)  # 400 ms
    df = pd.DataFrame(
        {"media_id": [7], "duration_ms": [400], "payload": [payload]}
    )
    out = FrameSampler(every_ms=200, fake=False)(df)
    assert out["frame_ms"].tolist() == [0, 200]
    # hashes come from the DECODED frames 0 and 2
    import hashlib

    rgb = np.repeat(fr[..., None], 3, axis=3)
    assert out["frame_hash"].tolist() == [
        hashlib.md5(rgb[0].tobytes()).hexdigest()[:16],
        hashlib.md5(rgb[2].tobytes()).hexdigest()[:16],
    ]


# ------------------------------------------------------------- JPEG


def test_jpeg_roundtrip_smooth_gradient_bounded_error():
    """Baseline JPEG is lossy; on a smooth (non-wrapping) gradient the
    quality-50 quantization error stays small."""
    import math

    from beats_ray.dataops.codecs import decode_jpeg_gray, encode_jpeg_gray

    y, x = np.mgrid[0:24, 0:32]
    img = (60 + x * 2 + y * 3).astype(np.uint8)  # max 60+62+69 < 256
    data = encode_jpeg_gray(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg_gray(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() <= 3


def test_jpeg_flat_blocks_match_closed_form():
    """Flat 8×8 blocks survive the lossy pipeline in closed form —
    the identity the jpeg_real_decode oracle relies on."""
    import math

    from beats_ray.dataops.codecs import decode_jpeg_gray, encode_jpeg_gray

    for v in (0, 1, 5, 77, 128, 200, 254, 255):
        img = np.full((16, 24), v, np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        q = math.floor((v - 128) / 2 + 0.5)
        expect = min(max(2 * q + 128, 0), 255)
        assert set(out.ravel().tolist()) == {expect}, v


def test_jpeg_nonaligned_dimensions_and_extremes():
    from beats_ray.dataops.codecs import decode_jpeg_gray, encode_jpeg_gray

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(13, 21), dtype=np.uint8)  # pad path
    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert out.shape == (13, 21)  # padding cropped back off


def test_jpeg_rejects_unsupported_variants():
    from beats_ray.dataops.codecs import decode_jpeg_gray, encode_jpeg_gray

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00\x01")
    # flip SOF0 -> SOF2 (progressive) in a real stream
    data = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_gray(bytes(data))


def test_jpeg_feature_stage_end_to_end(ray_session):
    """synthesize → decode → features through the actor/task stage —
    the pipeline path the jpeg_real_decode query drives."""
    import ray.data as rd

    from beats_ray.dataops.multimodal import (
        image_features,
        synthesize_jpeg_media_table,
    )

    media = rd.from_arrow(synthesize_jpeg_media_table(6))
    out = image_features(media, fake=False).to_pandas()
    assert len(out) == 6
    assert (out["n_px"] == 32 * 24).all()
