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


# ------------------------------------------------- G.711 (WAV fmt 6/7)


def test_g711_decode_luts_match_audioop_exactly():
    """All 256 codes, both laws, vs CPython's audioop (an independent
    implementation of the same ITU-T G.711 tables)."""
    audioop = pytest.importorskip("audioop")
    from beats_ray.dataops.codecs import ALAW_DECODE_LUT, MULAW_DECODE_LUT

    codes = bytes(range(256))
    assert np.array_equal(
        MULAW_DECODE_LUT, np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2")
    )
    assert np.array_equal(
        ALAW_DECODE_LUT, np.frombuffer(audioop.alaw2lin(codes, 2), "<i2")
    )


def test_g711_encoders_match_audioop_full_sweep():
    audioop = pytest.importorskip("audioop")
    from beats_ray.dataops.codecs import alaw_encode, mulaw_encode

    sweep = np.arange(-32768, 32768, dtype=np.int64)
    raw = sweep.astype("<i2").tobytes()
    assert np.array_equal(
        mulaw_encode(sweep), np.frombuffer(audioop.lin2ulaw(raw, 2), np.uint8)
    )
    assert np.array_equal(
        alaw_encode(sweep), np.frombuffer(audioop.lin2alaw(raw, 2), np.uint8)
    )


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_wav_roundtrip_and_fixed_point(law):
    from beats_ray.dataops.codecs import decode_wav, encode_wav_g711

    s = ((np.arange(4001) * 37) % 4096 - 2048).astype(np.int16)
    dec, rate = decode_wav(encode_wav_g711(s, 8000, law))
    assert rate == 8000 and len(dec) == len(s)
    # companding error is bounded by the local quantization step
    assert np.abs(dec.astype(np.int64) - s.astype(np.int64)).max() <= 128
    # decoded values are fixed points of the law (re-encode is lossless)
    dec2, _ = decode_wav(encode_wav_g711(dec, 8000, law))
    assert np.array_equal(dec2, dec)


# --------------------------------------------- IMA ADPCM (WAV fmt 0x11)


def _scalar_adpcm_decode(payload: bytes, block_align: int) -> np.ndarray:
    """Per-sample reference decoder straight off the IMA spec text —
    the independent check for the block-vectorized implementation."""
    from beats_ray.dataops.codecs import _ADPCM_INDEX_ADJ, _ADPCM_STEPS

    out = []
    for off in range(0, len(payload), block_align):
        blk = payload[off : off + block_align]
        pred = struct.unpack_from("<h", blk, 0)[0]
        idx = min(88, blk[2])
        out.append(pred)
        for b in blk[4:]:
            for nib in (b & 0xF, b >> 4):
                step = int(_ADPCM_STEPS[idx])
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                if nib & 8:
                    diff = -diff
                pred = max(-32768, min(32767, pred + diff))
                idx = max(0, min(88, idx + int(_ADPCM_INDEX_ADJ[nib & 7])))
                out.append(pred)
    return np.array(out, np.int16)


def test_adpcm_vectorized_decode_matches_scalar_reference():
    from beats_ray.dataops.codecs import decode_ima_adpcm, encode_ima_adpcm

    rng = np.random.RandomState(11)
    s = np.cumsum(rng.randint(-300, 301, 3000)).clip(-32768, 32767)
    enc = encode_ima_adpcm(s.astype(np.int16), 128)
    assert np.array_equal(
        decode_ima_adpcm(enc, 128), _scalar_adpcm_decode(enc, 128)
    )


def test_adpcm_wav_roundtrip_tracks_smooth_signal():
    from beats_ray.dataops.codecs import decode_wav, encode_wav_adpcm

    t = np.arange(8000)
    s = (3000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    dec, rate = decode_wav(encode_wav_adpcm(s, 8000, 256))
    assert rate == 8000 and len(dec) == len(s)  # 'fact' trims padding
    err = np.abs(dec.astype(np.int64) - s.astype(np.int64))
    # 4-bit differential coding: tolerance ~ one adapted step size
    assert err.max() <= 400 and err.mean() <= 100


def test_adpcm_decoder_rejects_stereo_and_truncated_header():
    from beats_ray.dataops.codecs import decode_ima_adpcm

    with pytest.raises(ValueError):
        decode_ima_adpcm(b"\x00\x01\x02", 256)  # <4-byte trailing block


# -------------------------------------------------------- MJPEG AVI


def _flat_block_frames(n, h, w):
    """(frame, bx, by) → flat 8×8 blocks of value
    (f*11 + bx*7 + by*3) % 256 — survives JPEG in closed form."""
    bx, by = w // 8, h // 8
    v = (
        np.arange(n)[:, None, None] * 11
        + np.arange(bx)[None, :, None] * 7
        + np.arange(by)[None, None, :] * 3
    ) % 256
    frames = np.repeat(
        np.repeat(v.transpose(0, 2, 1), 8, axis=1), 8, axis=2
    ).astype(np.uint8)
    return frames, v


def test_mjpeg_avi_flat_blocks_closed_form():
    from beats_ray.dataops.codecs import decode_avi, encode_avi

    frames, v = _flat_block_frames(3, 24, 32)
    out, fps = decode_avi(encode_avi(frames, fps=10, codec="mjpeg"))
    assert fps == 10 and out.shape == (3, 24, 32, 3)
    q = np.floor((v.astype(np.float64) - 128) / 2 + 0.5)
    exp = np.clip(2 * q + 128, 0, 255).astype(np.uint8)
    exp_frames = np.repeat(
        np.repeat(exp.transpose(0, 2, 1), 8, axis=1), 8, axis=2
    )
    assert np.array_equal(out[..., 0], exp_frames)
    assert np.array_equal(out[..., 0], out[..., 1])  # gray replicated


def test_mjpeg_avi_smooth_frames_bounded_error():
    from beats_ray.dataops.codecs import decode_avi, encode_avi

    y, x = np.mgrid[0:16, 0:24]
    frames = np.stack(
        [((x * 3 + y * 5 + f * 17) % 200 + 20).astype(np.uint8)
         for f in range(4)]
    )
    out, _ = decode_avi(encode_avi(frames, fps=5, codec="mjpeg"))
    err = np.abs(out[..., 0].astype(np.int64) - frames.astype(np.int64))
    assert err.max() <= 40  # lossy, but bounded (baseline Q tables)


def test_mjpeg_avi_rgb_input_uses_luma():
    from beats_ray.dataops.codecs import decode_avi, encode_avi

    rgb = np.zeros((2, 8, 8, 3), np.uint8)
    rgb[..., 0] = 90
    rgb[..., 1] = 120
    rgb[..., 2] = 150  # luma mean = 120, flat blocks → closed form
    out, _ = decode_avi(encode_avi(rgb, fps=4, codec="mjpeg"))
    q = np.floor((120.0 - 128) / 2 + 0.5)
    assert np.all(out == np.clip(2 * q + 128, 0, 255))


# -------------------------------------------------------------- GIF


def test_lzw_roundtrip_and_dict_reset():
    from beats_ray.dataops.codecs import _lzw_decode, _lzw_encode

    rng = np.random.RandomState(0)
    cases = [
        bytes(rng.randint(0, 256, 5000, dtype=np.uint8)),  # incompressible
        bytes([7]) * 10000,                                # max repetition
        bytes(range(256)) * 30,                            # cyclic
        b"\x00",                                           # single byte
        bytes(rng.randint(0, 4, 30000, dtype=np.uint8)),   # forces 12-bit
    ]
    for data in cases:
        assert _lzw_decode(8, _lzw_encode(8, data)) == data


def test_gif_roundtrip_lossless_single_and_animated():
    from beats_ray.dataops.codecs import decode_gif, encode_gif

    y, x = np.mgrid[0:24, 0:32]
    img = ((x * 5 + y * 7) % 256).astype(np.uint8)
    out = decode_gif(encode_gif(img))
    assert out.shape == (1, 24, 32, 3)
    assert np.array_equal(out[0, :, :, 0], img)
    assert np.array_equal(out[0, :, :, 0], out[0, :, :, 2])  # gray pal
    frames = np.stack(
        [((x * 5 + y * 7 + f * 13) % 256).astype(np.uint8) for f in range(5)]
    )
    out = decode_gif(encode_gif(frames, delay_ms=200))
    assert out.shape == (5, 24, 32, 3)
    assert np.array_equal(out[..., 0], frames)


def test_gif_large_random_crosses_dict_full_reset():
    from beats_ray.dataops.codecs import decode_gif, encode_gif

    big = np.random.RandomState(3).randint(0, 256, (200, 300), dtype=np.uint8)
    out = decode_gif(encode_gif(big))
    assert np.array_equal(out[0, :, :, 0], big)


def test_gif_rejects_garbage_and_unsupported():
    from beats_ray.dataops.codecs import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    # interlaced image descriptor -> honest NotImplementedError
    hdr = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)
           + bytes(2 * 3))  # 2-entry palette
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0x40)
    with pytest.raises(NotImplementedError):
        decode_gif(hdr + img + b"\x02\x00\x3b")


def test_gif_through_image_feature_stage(ray_session):
    import ray.data as rd

    from beats_ray.dataops.multimodal import (
        image_features,
        synthesize_gif_media_table,
    )

    out = image_features(
        rd.from_arrow(synthesize_gif_media_table(6)), fake=False
    ).to_pandas().set_index("media_id").sort_index()
    y, x = np.mgrid[0:24, 0:32]
    for i in range(6):
        want = int((((i * 31 + x * 7 + y * 3) % 256).sum()) * 3)
        assert out.loc[i, "px_sum"] == want
        assert out.loc[i, "n_px"] == 24 * 32 * 3


def test_frame_sampler_real_path_decodes_animated_gif():
    import hashlib

    import pandas as pd

    from beats_ray.dataops.codecs import encode_gif
    from beats_ray.dataops.multimodal import FrameSampler

    fr = np.stack([
        ((np.arange(6 * 8).reshape(6, 8) + f * 31) % 256).astype(np.uint8)
        for f in range(4)
    ])
    payload = encode_gif(fr, delay_ms=100)  # 10 fps → 400 ms
    df = pd.DataFrame(
        {"media_id": [9], "duration_ms": [400], "payload": [payload]}
    )
    out = FrameSampler(every_ms=200, fake=False)(df)
    assert out["frame_ms"].tolist() == [0, 200]
    rgb = np.repeat(fr[..., None], 3, axis=3)
    assert out["frame_hash"].tolist() == [
        hashlib.md5(rgb[0].tobytes()).hexdigest()[:16],
        hashlib.md5(rgb[2].tobytes()).hexdigest()[:16],
    ]


# -------------------------------------------------------------- BMP


def test_bmp_roundtrip_gray_rgb_and_stride_padding():
    from beats_ray.dataops.codecs import decode_bmp, encode_bmp

    rng = np.random.RandomState(5)
    for shape in [(7, 9), (24, 32, 3), (1, 1), (3, 5, 3)]:
        arr = rng.randint(0, 256, shape).astype(np.uint8)
        out = decode_bmp(encode_bmp(arr))
        want = np.repeat(arr[..., None], 3, axis=2) if arr.ndim == 2 else arr
        assert np.array_equal(out, want), shape


def test_bmp_rejects_garbage_and_compressed():
    from beats_ray.dataops.codecs import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"XXnotabmp")
    hdr = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 1, 0, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError):
        decode_bmp(hdr + dib)


def test_bmp_through_image_feature_decode():
    from beats_ray.dataops.codecs import encode_bmp
    from beats_ray.dataops.multimodal import ImageFeatures

    y, x = np.mgrid[0:8, 0:16]
    arr = ((x * 3 + y * 5) % 256).astype(np.uint8)
    px = ImageFeatures(fake=False).decode(encode_bmp(arr), 16, 8)
    assert px.shape == (8, 16, 3)
    assert np.array_equal(px[..., 0], arr)


def test_jpeg_restart_markers_round_trip():
    """Regression: the entropy BitReader treated every 0xFF as byte
    stuffing, so RSTn markers in a DRI-using baseline file were
    consumed as data and the DC predictor never reset — silent
    corruption. Restart-interval encodes must now decode exactly."""
    import numpy as np

    from beats_ray.dataops.codecs import decode_jpeg_gray, encode_jpeg_gray

    rng = np.random.default_rng(3)
    for shape in [(8, 8), (24, 40), (17, 31)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg_gray(encode_jpeg_gray(img))
        for ri in (1, 2, 7):
            dec = decode_jpeg_gray(
                encode_jpeg_gray(img, restart_interval=ri))
            assert (dec == base).all(), (shape, ri)
    # DRI header is present only when asked
    assert b"\xff\xdd" in encode_jpeg_gray(img, restart_interval=2)
