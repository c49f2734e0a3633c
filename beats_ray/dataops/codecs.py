"""Pure-Python media codecs — the REAL decode path for the multimodal
stages, dependency-free.

This container ships no imaging/audio libraries, but PNG needs only
``zlib`` (stdlib) and WAV-PCM only ``struct`` — so a correct decoder
for both is implementable offline, upgrading the decode seam from a
stub to a working path:

- PNG: 8-bit depth, color types 0 (gray) / 2 (RGB) / 6 (RGBA),
  non-interlaced, all five scanline filters (spec §6). The unfilter
  loop is per-scanline numpy with a per-pixel pass only for the
  sequential filters (Sub/Paeth) — correctness first; a production
  deployment routes through the PIL path when available and uses this
  as the fallback.
- WAV: PCM 16-bit (mono/stereo), G.711 μ-law / A-law (fmt codes 7/6 —
  the companded 8-bit telephony formats, decoded by a vectorized
  256-entry LUT; encoders bit-exact vs CPython's audioop), and IMA
  ADPCM (fmt 0x11 — 4-bit differential; blocks are independent, so
  decode vectorizes ACROSS blocks with a short loop over the
  intra-block sample position, the only sequential axis).
- JPEG: baseline sequential DCT, grayscale (real markers, Huffman
  entropy coding, 8×8 DCT) — see the JPEG section; color/progressive
  raise with a PIL pointer.
- AVI: uncompressed 24-bit DIB frames, plus MJPEG ('MJPG' fourcc —
  each frame a baseline JPEG, riding the JPEG codec above), the
  compressed form webcam/security corpora actually ship.

Encoders exist so tests and fixtures can synthesize REAL files
deterministically (encode → decode round-trips are the test oracle).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA → PNG
    bytes (filter 0 scanlines, one zlib stream)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, ch = 2, 3
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, ch = 6, 4
        flat = arr
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 per scanline
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc_:
        return a
    if pb <= pc_:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) or (h, w, channels)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    width = height = None
    color = depth = interlace = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or color not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG variant not supported offline (depth={depth}, "
            f"color={color}, interlace={interlace}); install PIL for "
            "full coverage"
        )
    ch = _CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub (sequential in x)
            cur = line
            for i in range(ch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        elif ftype == 2:  # Up (vectorized)
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    if ch == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, ch)


# ------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples (n,) mono or (n, 2) stereo → RIFF/WAVE PCM16."""
    samples = np.asarray(samples, dtype="<i2")
    n_ch = 1 if samples.ndim == 1 else samples.shape[1]
    payload = samples.tobytes()
    byte_rate = rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, byte_rate, n_ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (samples int16 [(n,) or (n, ch)], rate).

    Formats: PCM16 (fmt 1), G.711 A-law/μ-law (fmt 6/7 → LUT expand to
    int16), IMA ADPCM (fmt 0x11, mono → block-parallel expand)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = n_ch = fmt_code = block_align = None
    fact_n = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, n_ch, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            expect = {1: 16, 6: 8, 7: 8, 0x11: 4}.get(fmt_code)
            if expect is None or bits != expect:
                raise NotImplementedError(
                    f"WAV variant not supported (fmt={fmt_code}, bits={bits})"
                )
        elif tag == b"fact":
            (fact_n,) = struct.unpack_from("<I", body)
        elif tag == b"data":
            payload = body
    if rate is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_code == 1:
        samples = np.frombuffer(payload, dtype="<i2")
    elif fmt_code in (6, 7):
        lut = ALAW_DECODE_LUT if fmt_code == 6 else MULAW_DECODE_LUT
        samples = lut[np.frombuffer(payload, dtype=np.uint8)]
    else:  # 0x11 IMA ADPCM
        if n_ch != 1:
            raise NotImplementedError("IMA ADPCM decode is mono-only")
        samples = decode_ima_adpcm(payload, block_align)
        if fact_n is not None:
            samples = samples[:fact_n]
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch)
    return samples, rate


# ----------------------------------------------------------- G.711
# μ-law / A-law companded audio (ITU-T G.711) — the 8-bit telephony
# formats call-center / voice corpora ship inside WAV (fmt codes 7/6).
# Each law is a bijective 256-code→int16 map, so DECODE is one
# vectorized LUT gather; encoders are the Sun/CCITT reference
# algorithms, verified bit-exact against CPython's audioop across the
# full int16 sweep (tests/test_codecs.py).

_MULAW_BIAS = 0x84  # 132


def _mulaw_decode_lut() -> np.ndarray:
    c = np.arange(256, dtype=np.int64)
    u = (~c) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _alaw_decode_lut() -> np.ndarray:
    c = np.arange(256, dtype=np.int64)
    a = c ^ 0x55
    seg = (a >> 4) & 0x07
    mant = a & 0x0F
    base = np.where(seg == 0, (mant << 4) + 8, (mant << 4) + 0x108)
    mag = base << np.maximum(seg - 1, 0)
    # A-law stores POSITIVE with the sign bit set (opposite of μ-law)
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


MULAW_DECODE_LUT = _mulaw_decode_lut()
ALAW_DECODE_LUT = _alaw_decode_lut()


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 → μ-law codes (uint8). audioop-exact: 14-bit domain via
    arithmetic shift BEFORE negation, clip 8158, bias 33."""
    s = np.asarray(samples, np.int64)
    sign = s < 0
    q = s >> 2
    pcm = np.minimum(np.where(sign, -q, q), 8158) + 33
    # frexp exponent of v∈[2^k, 2^(k+1)) is k+1; pcm ≥ 33 → exp ≥ 0
    exp = (np.frexp(pcm.astype(np.float64))[1] - 6).clip(0, 7).astype(np.int64)
    mant = (pcm >> (exp + 1)) & 0x0F
    code = ~((sign.astype(np.int64) << 7) | (exp << 4) | mant)
    return (code & 0xFF).astype(np.uint8)


_ALAW_SEG_ENDS = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], np.int64
)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 → A-law codes (uint8), audioop-exact (13-bit domain)."""
    s = np.asarray(samples, np.int64)
    pos = s >= 0
    pcm = np.where(pos, s, -s - 1) >> 3
    seg = np.searchsorted(_ALAW_SEG_ENDS, pcm, side="left")
    shift = np.where(seg < 2, 1, seg)
    aval = np.where(seg >= 8, 0x7F, (seg << 4) | ((pcm >> shift) & 0x0F))
    return (aval ^ np.where(pos, 0xD5, 0x55)).astype(np.uint8)


def g711_wav_from_codes(codes: np.ndarray, rate: int = 8000,
                        law: str = "mulaw") -> bytes:
    """Raw G.711 code bytes → RIFF/WAVE framing (fmt 7/6). This is the
    wire form a telephony capture ships: the payload IS the code
    stream, so fixtures can make codes follow a closed formula and an
    oracle can recompute the decode without the codec."""
    codes = np.asarray(codes, dtype=np.uint8).reshape(-1)
    fmt_code = {"mulaw": 7, "alaw": 6}.get(law)
    if fmt_code is None:
        raise ValueError(f"unknown law {law!r}")
    payload = codes.tobytes()
    fmt = struct.pack("<HHIIHH", fmt_code, 1, rate, rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(codes))
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    if len(payload) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711(samples: np.ndarray, rate: int = 8000,
                    law: str = "mulaw") -> bytes:
    """int16 mono samples → RIFF/WAVE with G.711 payload (fmt 7/6)."""
    samples = np.asarray(samples, dtype=np.int64).reshape(-1)
    codes = mulaw_encode(samples) if law == "mulaw" else alaw_encode(samples)
    return g711_wav_from_codes(codes, rate, law)


# ------------------------------------------------------- IMA ADPCM
# 4-bit differential PCM (WAV fmt 0x11, "DVI/IMA"). Each block carries
# its own (predictor, step-index) header, so blocks decode
# INDEPENDENTLY: the decoder below vectorizes across all blocks at
# once and loops only over the intra-block sample position — the one
# genuinely sequential axis (the recurrence pred/index ← f(nibble)).
# The encoder makes the same choice (state resets at each block
# header), trading a hair of quality at block seams for
# block-parallelism on both sides; any conforming decoder accepts the
# output because the header snapshots are authoritative.

_ADPCM_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
], np.int64)
_ADPCM_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int64)


def _adpcm_tables() -> tuple[np.ndarray, np.ndarray]:
    """Precompute (89 step-indexes × 16 nibbles) signed-diff and
    next-index tables — the whole per-sample recurrence becomes two
    table gathers + one clip, instead of ~10 numpy ops."""
    idx = np.arange(89)[:, None]
    nib = np.arange(16)[None, :]
    step = _ADPCM_STEPS[idx]
    mag = ((step >> 3)
           + np.where(nib & 1, step >> 2, 0)
           + np.where(nib & 2, step >> 1, 0)
           + np.where(nib & 4, step, 0))
    diff = np.where(nib & 8, -mag, mag)
    nxt = np.clip(idx + _ADPCM_INDEX_ADJ[nib & 7], 0, 88)
    return diff.astype(np.int64), nxt.astype(np.int64)


_ADPCM_DIFF, _ADPCM_NEXT = _adpcm_tables()


def _adpcm_step(pred: np.ndarray, index: np.ndarray,
                nib: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One decode step for a VECTOR of blocks: (pred, index, nibble) →
    (new pred, new index). Two precomputed-table gathers + a clip."""
    pred = np.clip(pred + _ADPCM_DIFF[index, nib], -32768, 32767)
    return pred, _ADPCM_NEXT[index, nib]


def decode_ima_adpcm(payload: bytes, block_align: int) -> np.ndarray:
    """IMA ADPCM data-chunk bytes (mono) → int16 samples. Vectorized
    across blocks; a trailing short block decodes via zero-padding and
    trimming (its sample count follows from its byte length)."""
    n_full = len(payload) // block_align
    tail = len(payload) - n_full * block_align
    tail_samples = 0
    if tail:
        if tail < 4:
            raise ValueError("truncated ADPCM block header")
        payload = payload + b"\x00" * (block_align - tail)
        tail_samples = (tail - 4) * 2 + 1
    blocks = np.frombuffer(payload, np.uint8).reshape(-1, block_align)
    n_blk = len(blocks)
    pred = blocks[:, :2].copy().view("<i2")[:, 0].astype(np.int64)
    index = np.clip(blocks[:, 2].astype(np.int64), 0, 88)
    nib_bytes = blocks[:, 4:]
    spb = (block_align - 4) * 2  # nibble samples per block
    out = np.empty((n_blk, 1 + spb), np.int64)
    out[:, 0] = pred
    nibs = np.empty((n_blk, spb), np.uint8)
    nibs[:, 0::2] = nib_bytes & 0x0F   # low nibble first (spec order)
    nibs[:, 1::2] = nib_bytes >> 4
    for t in range(spb):
        pred, index = _adpcm_step(pred, index, nibs[:, t].astype(np.int64))
        out[:, t + 1] = pred
    flat = out.reshape(-1)
    if tail:
        flat = np.concatenate([
            out[:-1].reshape(-1), out[-1, :tail_samples]
        ])
    return flat.astype(np.int16)


def encode_ima_adpcm(samples: np.ndarray, block_align: int = 256) -> bytes:
    """int16 mono samples → IMA ADPCM block bytes (pads the final block
    by repeating the last sample; pair with a 'fact' chunk to trim).
    Vectorized across blocks (state resets per block header)."""
    samples = np.asarray(samples, np.int64).reshape(-1)
    spb = (block_align - 4) * 2 + 1  # samples per block incl. header
    n_blk = max(1, -(-len(samples) // spb))
    padded = np.full(n_blk * spb, samples[-1] if len(samples) else 0,
                     np.int64)
    padded[: len(samples)] = samples
    mat = padded.reshape(n_blk, spb)
    pred = mat[:, 0].copy()
    # seed each block's step index from its own mean |Δ| (header
    # snapshots make any seed legal; this one avoids the re-adaptation
    # transient a plain index=0 reset pays at every block seam while
    # keeping the encoder block-parallel)
    mean_d = np.abs(np.diff(mat, axis=1)).mean(axis=1).astype(np.int64)
    init_index = np.clip(np.searchsorted(_ADPCM_STEPS, mean_d), 0, 88)
    index = init_index.copy()
    nibs = np.empty((n_blk, spb - 1), np.uint8)
    for t in range(spb - 1):
        target = mat[:, t + 1]
        step = _ADPCM_STEPS[index]
        delta = target - pred
        nib = np.where(delta < 0, 8, 0)
        delta = np.abs(delta)
        take = delta >= step
        nib |= np.where(take, 4, 0)
        delta -= np.where(take, step, 0)
        take = delta >= (step >> 1)
        nib |= np.where(take, 2, 0)
        delta -= np.where(take, step >> 1, 0)
        nib |= np.where(delta >= (step >> 2), 1, 0)
        pred, index = _adpcm_step(pred, index, nib)
        nibs[:, t] = nib.astype(np.uint8)
    blocks = np.empty((n_blk, block_align), np.uint8)
    hdr = np.zeros((n_blk, 2), "<i2")
    hdr[:, 0] = mat[:, 0].astype(np.int16)
    blocks[:, :4] = np.frombuffer(hdr.tobytes(), np.uint8).reshape(n_blk, 4)
    blocks[:, 2] = init_index.astype(np.uint8)  # per-block seed index
    blocks[:, 3] = 0
    blocks[:, 4:] = nibs[:, 0::2] | (nibs[:, 1::2] << 4)
    return blocks.tobytes()


def encode_wav_adpcm(samples: np.ndarray, rate: int = 8000,
                     block_align: int = 256) -> bytes:
    """int16 mono samples → RIFF/WAVE IMA ADPCM (fmt 0x11) with the
    required wSamplesPerBlock extension and 'fact' sample count."""
    samples = np.asarray(samples, dtype=np.int64).reshape(-1)
    payload = encode_ima_adpcm(samples, block_align)
    spb = (block_align - 4) * 2 + 1
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate, byte_rate,
                      block_align, 4, 2, spb)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(samples))
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    if len(payload) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------------ AVI
# Uncompressed AVI (RIFF container, '00db' DIB frames, 24-bit BGR,
# bottom-up rows padded to 4 bytes) — the one mainstream video container
# that needs no codec library, so the video decode seam can be REAL
# offline just like PNG/WAV. Reference layout: msdn AVI RIFF form
# ('avih' MainAVIHeader / 'strh' AVISTREAMHEADER / 'strf'
# BITMAPINFOHEADER / LIST 'movi').


def _stride(width: int) -> int:
    return (3 * width + 3) // 4 * 4


_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def _le_chunk(tag: bytes, payload: bytes) -> bytes:
    out = struct.pack("<4sI", tag, len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"  # RIFF chunks are word-aligned
    return out


def _le_list(kind: bytes, payload: bytes) -> bytes:
    return _le_chunk(b"LIST", kind + payload)


def encode_avi(frames: np.ndarray, fps: int = 10,
               codec: str = "raw") -> bytes:
    """uint8 frames (n, h, w) gray or (n, h, w, 3) RGB → AVI bytes.

    ``codec="raw"``: uncompressed 24-bit DIB ('00db'); gray replicates
    into BGR. ``codec="mjpeg"``: each frame a baseline grayscale JPEG
    in a '00dc' chunk under fourcc 'MJPG' (RGB input is luma-averaged
    — the offline JPEG codec is single-component). Any stock player
    opens either form — real containers, not bespoke formats."""
    if codec == "mjpeg":
        return _encode_avi_mjpeg(frames, fps)
    if codec != "raw":
        raise ValueError(f"unknown AVI codec {codec!r}")
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = np.repeat(frames[..., None], 3, axis=3)
    n, h, w, _ = frames.shape
    stride = _stride(w)
    frame_bytes = stride * h

    le_chunk, le_list = _le_chunk, _le_list

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags: no AVIF_HASINDEX — we write no idx1 chunk, and a
        # strict player honoring the flag would fail to seek/open
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,  # dwScale / dwRate → fps
        0, n, frame_bytes, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = le_list(
        b"hdrl",
        le_chunk(b"avih", avih)
        + le_list(b"strl", le_chunk(b"strh", strh) + le_chunk(b"strf", strf)),
    )
    movi_payload = b""
    pad = stride - 3 * w
    for f in range(n):
        # bottom-up BGR rows, each padded to a 4-byte boundary
        bgr = frames[f, ::-1, :, ::-1]
        if pad:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
            data = rows.tobytes()
        else:
            data = bgr.tobytes()
        movi_payload += le_chunk(b"00db", data)
    movi = le_list(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def _encode_avi_mjpeg(frames: np.ndarray, fps: int) -> bytes:
    """Motion-JPEG AVI: per-frame baseline JPEGs in '00dc' chunks."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 4:  # RGB → luma (offline JPEG is grayscale)
        frames = frames.mean(axis=3).astype(np.uint8)
    n, h, w = frames.shape
    payloads = [encode_jpeg_gray(frames[f]) for f in range(n)]
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, max_bytes * fps, 0, 0,
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, n, max_bytes, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, _MJPG_FOURCC, 0, 0, 0, 0, 0
    )
    hdrl = _le_list(
        b"hdrl",
        _le_chunk(b"avih", avih)
        + _le_list(b"strl", _le_chunk(b"strh", strh)
                   + _le_chunk(b"strf", strf)),
    )
    movi = _le_list(
        b"movi", b"".join(_le_chunk(b"00dc", p) for p in payloads)
    )
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → (frames (n, h, w, 3) RGB uint8, fps). Supports the
    uncompressed 24-bit DIB form ('00db'/'00dc' with biCompression=0)
    and Motion-JPEG ('MJPG' — per-frame baseline JPEG via the offline
    JPEG codec); other codecs raise (they genuinely need a library)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    w = h = None
    fps = 0
    top_down = False
    mjpeg = False
    frames_raw: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, fps, top_down, mjpeg
        while pos + 8 <= end:
            tag, size = struct.unpack_from("<4sI", buf, pos)
            body_start = pos + 8
            if tag == b"LIST":
                walk(buf, body_start + 4, body_start + size)
            elif tag == b"strh":
                fcc, _, _, _, _, _, scale, rate = struct.unpack_from(
                    "<4s4sIHHIII", buf, body_start
                )[:8]
                if fcc == b"vids" and scale:
                    fps = rate // scale
            elif tag == b"strf":
                (_, bw, bh, _, bits, comp) = struct.unpack_from(
                    "<IiiHHI", buf, body_start
                )
                if comp == _MJPG_FOURCC:
                    mjpeg = True
                elif comp != 0 or bits != 24:
                    raise NotImplementedError(
                        "AVI codec not supported offline (only raw DIB "
                        "and MJPG decode without a codec library)"
                    )
                # negative biHeight = rows already top-down (legal DIB)
                w, h, top_down = bw, abs(bh), bh < 0
            elif tag in (b"00db", b"00dc"):
                frames_raw.append(buf[body_start : body_start + size])
            pos = body_start + size + (size % 2)

    walk(data, 12, len(data))
    if w is None or not frames_raw or fps <= 0:
        # fps==0: no vids strh, or dwRate < dwScale (sub-1fps — out of
        # scope); a clean error here beats a ZeroDivisionError in the
        # frame-sampling stages
        raise ValueError("no video stream found")
    if mjpeg:
        grays = [decode_jpeg_gray(raw) for raw in frames_raw]
        if any(g.shape != grays[0].shape for g in grays):
            raise ValueError("MJPEG frame sizes differ within stream")
        return np.repeat(np.stack(grays)[..., None], 3, axis=3), fps
    stride = _stride(w)
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        rows = np.frombuffer(raw, dtype=np.uint8)[: stride * h].reshape(
            h, stride
        )
        bgr = rows[:, : 3 * w].reshape(h, w, 3)
        # bottom-up BGR → top-down RGB (top-down DIBs skip the flip)
        out[i] = bgr[:, :, ::-1] if top_down else bgr[::-1, :, ::-1]
    return out, fps


# -------------------------------------------------------------- BMP
# Uncompressed 24-bit BMP — the same bottom-up padded BGR DIB rows as
# the raw-AVI frames, in a standalone file header. Trivial but real
# (screenshots/exports ship it), and it makes the DIB row logic a
# shared, twice-tested path.


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → 24-bit BMP bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    h, w, _ = arr.shape
    stride = _stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)
    pixels = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(pixels), 0, 0, 0, 0)
    off = 14 + len(dib)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    return hdr + dib + pixels


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) RGB uint8."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", data, 10)
    _, w, bh, _, bits, comp = struct.unpack_from("<IiiHHI", data, 14)
    if comp != 0 or bits != 24:
        raise NotImplementedError(
            "only uncompressed 24-bit BMP decodes offline"
        )
    h, top_down = abs(bh), bh < 0
    stride = _stride(w)
    rows = np.frombuffer(
        data, np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)
    bgr = rows[:, : 3 * w].reshape(h, w, 3)
    return (bgr[:, :, ::-1] if top_down else bgr[::-1, :, ::-1]).copy()


# -------------------------------------------------------------- GIF
# GIF89a with REAL LZW (the third mainstream image compression after
# PNG's DEFLATE and JPEG's DCT+Huffman, and the format of animated web
# corpora). Grayscale 256-entry global palette on encode; decode
# handles any global/local palette, multi-frame (full-size frames),
# variable-width LSB-first codes with dictionary reset. Interlace and
# partial-frame composition raise (rare; need PIL). GIF is LOSSLESS,
# so fixtures decode to exactly their generating formula — the oracle
# needs no closed-form trick.


def _lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """Variable-width LSB-first LZW (GIF flavor: clear/end codes,
    width grows at dict size 2^width, capped at 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev = None
    bitpos = 0
    total = len(data) * 8
    while bitpos + width <= total:
        i = bitpos >> 3
        val = int.from_bytes(data[i: i + 4], "little") >> (bitpos & 7)
        code = val & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Inverse of _lzw_decode (emits clear up-front and on dict-full,
    end at EOF) — real compression, not the clear-code-spam trick."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    w_str = b""
    for b in indices:
        wk = w_str + bytes([b])
        if wk in table:
            w_str = wk
            continue
        emit(table[w_str], width)
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # dict full: reset (decoder mirrors on the clear code)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = end + 1
        w_str = bytes([b])
    if w_str:
        emit(table[w_str], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Package bytes as GIF data sub-blocks (≤255 + length prefix)."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames: np.ndarray, delay_ms: int = 100) -> bytes:
    """uint8 (h, w) or (n, h, w) gray → GIF89a bytes (256-gray global
    palette, real LZW, one GCE per frame when animated)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global 256-entry
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()
    for f in range(n):
        if n > 1:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0,
                               max(1, delay_ms // 10), 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_encode(8, frames[f].tobytes()))
    out.append(0x3B)
    return bytes(out)


def gif_delays_cs(data: bytes) -> list[int]:
    """Per-frame delays (centiseconds) from the Graphic Control
    Extensions, in stream order — empty for a non-animated GIF."""
    out = []
    pos = 13
    if data[10] & 0x80:
        pos += 3 * (2 << (data[10] & 0x07))
    while pos < len(data) and data[pos] != 0x3B:
        if data[pos] == 0x21:
            if data[pos + 1] == 0xF9:
                (delay,) = struct.unpack_from("<H", data, pos + 4)
                out.append(delay)
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif data[pos] == 0x2C:
            _, _, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 0x07))
            pos += 1  # LZW min code size
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        else:
            break
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → frames (n, h, w, 3) RGB uint8. Full-size frames
    only (each image descriptor must cover the logical screen);
    interlaced streams raise."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    g_pal = None
    if flags & 0x80:
        n_ent = 2 << (flags & 0x07)
        g_pal = np.frombuffer(
            data[pos: pos + 3 * n_ent], np.uint8
        ).reshape(n_ent, 3)
        pos += 3 * n_ent
    frames = []

    def skip_sub_blocks(p: int) -> int:
        while data[p]:
            p += 1 + data[p]
        return p + 1

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos = skip_sub_blocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        pal = g_pal
        if iflags & 0x80:
            n_ent = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                data[pos: pos + 3 * n_ent], np.uint8
            ).reshape(n_ent, 3)
            pos += 3 * n_ent
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF needs PIL")
        if (left, top, fw, fh) != (0, 0, w, h):
            raise NotImplementedError(
                "partial-frame GIF composition needs PIL"
            )
        if pal is None:
            raise ValueError("GIF image with no palette")
        mcs = data[pos]
        pos += 1
        comp = bytearray()
        while data[pos]:
            ln = data[pos]
            comp += data[pos + 1: pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode(mcs, bytes(comp)), np.uint8)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame short of pixels")
        frames.append(pal[idx[: fw * fh]].reshape(fh, fw, 3))
    if not frames:
        raise ValueError("no image data in GIF")
    return np.stack(frames)


# ------------------------------------------------------------- JPEG
# Baseline sequential DCT, grayscale (ITU T.81 / JFIF): real markers,
# real Huffman entropy coding, real 8×8 DCT — the compressed-image
# format actual training corpora ship. Custom (spec-legal) canonical
# Huffman tables are emitted in the DHT segment, so any conforming
# decoder reads these files; compression ratio is not the point.
#
# DC coefficients are computed by the EXACT integer identity
# F(0,0) = sum(block - 128) / 8 (binary-exact in float), so images
# built from flat 8×8 blocks decode to closed-form pixel values an SQL
# oracle can recompute: q = floor((v-128)/2 + 0.5) for Q[0,0]=16, then
# pixel = clamp(floor(q*Q00/8 + 128 + 0.5)).

# Annex K luminance quantization table (T.81 Table K.1 — public spec)
JPEG_QTABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, generated (anti-diagonal walk,
    alternating direction) rather than hand-typed."""
    order = []
    for s in range(15):
        idx = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            idx.reverse()  # even diagonals walk up-right
        order.extend(i * 8 + j for i, j in idx)
    return np.asarray(order, dtype=np.int64)


_ZIGZAG = _zigzag_order()

# orthonormal DCT-II basis: F = C @ B @ C.T
_DCT_C = np.array([
    [np.cos((2 * x + 1) * u * np.pi / 16)
     * (np.sqrt(1 / 8) if u == 0 else 0.5)
     for x in range(8)]
    for u in range(8)
])

# canonical Huffman: DC = 12 category symbols at length 4 (16 codes,
# all-ones unused); AC = the 162 baseline (run<<4|size) symbols at
# length 8 (256 codes). Both are written into DHT, so decode is
# self-describing.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0] * 16
_DC_BITS[3] = len(_DC_SYMBOLS)   # all codes length 4 (index 3 = L-1)
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMBOLS)   # all codes length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict:
    """symbol → (code, length), canonical JPEG assignment."""
    out, code, k = {}, 0, 0
    for li, n in enumerate(bits):
        for _ in range(n):
            out[symbols[k]] = (code, li + 1)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec

    def raw_marker(self, byte2: int) -> None:
        """Append an FF xx marker pair verbatim (markers are never
        byte-stuffed); call align() first."""
        self.buf += bytes([0xFF, byte2])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, cat: int) -> int:
    # negative values are stored one's-complement style (T.81 F.1.2.1)
    return v if v >= 0 else v + (1 << cat) - 1


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_gray(arr: np.ndarray, restart_interval: int = 0) -> bytes:
    """uint8 (h, w) → baseline JFIF bytes (grayscale, one scan).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that many MCUs (libjpeg's robustness convention), resetting
    the DC predictor — exercised round-trip by the decoder tests."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw)), mode="edge")
    H, W = padded.shape
    blocks = (
        padded.reshape(H // 8, 8, W // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ux,nxy,vy->nuv", _DCT_C, blocks, _DCT_C)
    # exact-integer DC identity (see module comment): kills the float
    # half-way ambiguity that would break the closed-form oracle
    coef[:, 0, 0] = blocks.sum(axis=(1, 2)) / 8.0
    q = np.floor(coef / JPEG_QTABLE + 0.5).astype(np.int64)
    zz = q.reshape(-1, 64)[:, _ZIGZAG]

    bw = _BitWriter()
    prev_dc = 0
    rst_seg = 0
    for bi, blk in enumerate(zz):
        if restart_interval and bi and bi % restart_interval == 0:
            bw.align()
            bw.raw_marker(0xD0 + (rst_seg % 8))
            rst_seg += 1
            prev_dc = 0  # RST resets the DC predictor
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        cat = _category(diff)
        code, ln = _DC_CODES[cat]
        bw.put(code, ln)
        if cat:
            bw.put(_amplitude(diff, cat), cat)
        run = 0
        nz = np.flatnonzero(blk[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = _AC_CODES[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            cat = _category(v)
            code, ln = _AC_CODES[(run << 4) | cat]
            bw.put(code, ln)
            bw.put(_amplitude(v, cat), cat)
            run = 0
        if last < 63:
            code, ln = _AC_CODES[0x00]  # EOB
            bw.put(code, ln)

    qz = JPEG_QTABLE.reshape(-1)[_ZIGZAG].astype(np.uint8)
    dht_dc = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMBOLS)
    dht_ac = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + qz.tobytes())  # DQT, table 0
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1)
                + bytes([1, 0x11, 0]))  # SOF0: 1 component, no subsample
    out += _seg(0xFFC4, dht_dc) + _seg(0xFFC4, dht_ac)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def take(self, n: int) -> int:
        while self.nbits < n:
            b = 0
            if self.pos < len(self.data):
                b = self.data[self.pos]
                if b == 0xFF:
                    nxt = (self.data[self.pos + 1]
                           if self.pos + 1 < len(self.data) else 0xD9)
                    if nxt == 0x00:
                        self.pos += 2  # byte-stuffed data FF
                    else:
                        # a real marker (RSTn/EOI): entropy data ends
                        # here — feed zero bits (libjpeg's convention)
                        # and stay put; restart() consumes the marker
                        b = 0
                else:
                    self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (FFD0-FFD7): pad bits
        buffered past the previous MCU row are discarded, per spec."""
        self.acc = 0
        self.nbits = 0
        if (self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise ValueError("expected RSTn restart marker")


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Baseline grayscale JFIF bytes → uint8 (h, w). Reads the DQT and
    DHT tables from the stream (self-describing — decodes any
    single-component baseline file with ≤16-bit codes, not just this
    encoder's output)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtab = None
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    scan_start = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker sync")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4: pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            if payload[0] & 0x0F == 0:
                dezz = np.empty(64, np.int64)
                dezz[_ZIGZAG] = np.frombuffer(
                    payload[1:65], dtype=np.uint8
                ).astype(np.int64)
                qtab = dezz.reshape(8, 8)
        elif marker == 0xC0:
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if ncomp != 1:
                raise NotImplementedError(
                    "only single-component (grayscale) baseline JPEG "
                    "decodes offline; install PIL for color"
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential DCT (SOF0) decodes offline"
            )
        elif marker == 0xC4:
            cls_id = payload[0]
            bits = list(payload[1:17])
            syms = list(payload[17: 17 + sum(bits)])
            table: dict[tuple[int, int], int] = {}
            code, k = 0, 0
            for li, n in enumerate(bits):
                for _ in range(n):
                    table[(li + 1, code)] = syms[k]
                    code += 1
                    k += 1
                code <<= 1
            huff[(cls_id >> 4, cls_id & 0x0F)] = table
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:
            scan_start = pos
            break
    if qtab is None or h is None or scan_start is None:
        raise ValueError("JPEG missing DQT/SOF0/SOS")
    dc_tab, ac_tab = huff[(0, 0)], huff[(1, 0)]

    br = _BitReader(data[scan_start:])

    def read_symbol(table: dict) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | br.take(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")

    def extend(v: int, cat: int) -> int:
        return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1

    bh, bw_ = -(-h // 8), -(-w // 8)
    nblocks = bh * bw_
    zz = np.zeros((nblocks, 64), dtype=np.int64)
    prev_dc = 0
    for b in range(nblocks):
        if restart_interval and b and b % restart_interval == 0:
            br.restart()
            prev_dc = 0  # RSTn resets the DC predictor
        cat = read_symbol(dc_tab)
        diff = extend(br.take(cat), cat) if cat else 0
        prev_dc += diff
        zz[b, 0] = prev_dc
        k = 1
        while k < 64:
            sym = read_symbol(ac_tab)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, cat = sym >> 4, sym & 0x0F
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            zz[b, k] = extend(br.take(cat), cat)
            k += 1
    coef = np.zeros((nblocks, 64), dtype=np.int64)
    coef[:, _ZIGZAG] = zz
    coef = coef.reshape(-1, 8, 8) * qtab
    pix = np.einsum("xu,nuv,yv->nxy", _DCT_C.T, coef.astype(np.float64),
                    _DCT_C.T)
    pix = np.clip(np.floor(pix + 128.0 + 0.5), 0, 255).astype(np.uint8)
    out = (
        pix.reshape(bh, bw_, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw_ * 8)
    )
    return out[:h, :w]
