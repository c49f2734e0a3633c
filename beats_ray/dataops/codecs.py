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
- WAV: PCM 16-bit (mono/stereo), RIFF parsing via ``struct``.

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
    """RIFF/WAVE PCM16 → (samples int16 [(n,) or (n, ch)], rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = n_ch = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV variant not supported (fmt={fmt_code}, bits={bits})"
                )
        elif tag == b"data":
            payload = body
    if rate is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(payload, dtype="<i2")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch)
    return samples, rate


# ------------------------------------------------------------------ AVI
# Uncompressed AVI (RIFF container, '00db' DIB frames, 24-bit BGR,
# bottom-up rows padded to 4 bytes) — the one mainstream video container
# that needs no codec library, so the video decode seam can be REAL
# offline just like PNG/WAV. Reference layout: msdn AVI RIFF form
# ('avih' MainAVIHeader / 'strh' AVISTREAMHEADER / 'strf'
# BITMAPINFOHEADER / LIST 'movi').


def _stride(width: int) -> int:
    return (3 * width + 3) // 4 * 4


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """uint8 frames (n, h, w) gray or (n, h, w, 3) RGB → uncompressed
    AVI bytes. Gray replicates into BGR. Any stock player opens the
    result — this is a real container, not a bespoke format."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = np.repeat(frames[..., None], 3, axis=3)
    n, h, w, _ = frames.shape
    stride = _stride(w)
    frame_bytes = stride * h

    def le_chunk(tag: bytes, payload: bytes) -> bytes:
        out = struct.pack("<4sI", tag, len(payload)) + payload
        if len(payload) % 2:
            out += b"\x00"  # RIFF chunks are word-aligned
        return out

    def le_list(kind: bytes, payload: bytes) -> bytes:
        return le_chunk(b"LIST", kind + payload)

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


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → (frames (n, h, w, 3) RGB uint8, fps). Supports the
    uncompressed 24-bit DIB form ('00db'/'00dc' with biCompression=0);
    anything compressed raises (that genuinely needs a codec library)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    w = h = None
    fps = 0
    top_down = False
    frames_raw: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, fps, top_down
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
                if comp != 0 or bits != 24:
                    raise NotImplementedError(
                        "compressed AVI needs a codec library"
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
