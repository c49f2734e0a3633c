"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decode paths, in preference order: PIL when installed → the REAL
pure-Python codecs in ``dataops.codecs`` (PNG via stdlib zlib,
RIFF/WAVE PCM16, uncompressed-AVI video) → ``fake=True`` deterministic
test decoder. Compressed video (h264 etc.) genuinely needs a codec
library and raises; the uncompressed-DIB AVI form decodes for real.
Large binary payloads need SMALL batch sizes (batch bytes ×
concurrency must fit worker heap — guide: memory-aware batching),
hence the explicit ``batch_size`` defaults.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media_table(n: int = 64) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests: payload bytes
    derived from the id."""
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(f"media-{i}".encode(), digest_size=32).digest() * 8
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
        )
        rows["width"].append(64 if kind != "audio" else 0)
        rows["height"].append(48 if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else 1000 + i * 10)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes → pseudo-pixels."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = max(1, width) * max(1, height)
    reps = int(np.ceil(need / len(arr)))
    return np.tile(arr, reps)[:need].reshape(max(1, height), max(1, width))


class ImageFeatures:
    """Decode → feature-extract stage (run as a cached task via
    stagecache.task_stage; construct once per worker). Decode prefers
    PIL, falls back to the pure-Python PNG codec, or the fake test
    decoder when fake=True."""

    def __init__(self, fake: bool = False):
        self.fake = fake
        try:  # gate the real decoder behind an import-try
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.fake:
            # fake wins even when PIL exists — deterministic test path
            return _fake_decode(payload, width, height)
        if self._pil:
            import io

            import PIL.Image

            return np.asarray(PIL.Image.open(io.BytesIO(payload)))
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            # REAL offline decode path: pure-Python PNG (stdlib zlib)
            from .codecs import decode_png

            return decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            # REAL offline decode path: pure-Python baseline JPEG
            # (grayscale; color/progressive raise with a PIL pointer)
            from .codecs import decode_jpeg_gray

            return decode_jpeg_gray(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            # REAL offline decode path: pure-Python LZW GIF; image
            # features read the first frame
            from .codecs import decode_gif

            return decode_gif(payload)[0]
        if payload[:2] == b"BM":
            from .codecs import decode_bmp

            return decode_bmp(payload)
        raise NotImplementedError(
            "only PNG, grayscale baseline JPEG, GIF, and 24-bit BMP "
            "decode offline (pure-Python paths); other formats need "
            "PIL — pass fake=True for the deterministic test decoder"
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        means, stds, n_px, px_sum = [], [], [], []
        for payload, w, h in zip(df["payload"], df["width"], df["height"]):
            px = self.decode(payload, int(w), int(h))
            means.append(float(px.mean()))
            stds.append(float(px.std()))
            # integer evidence (exactly oracle-comparable; mean/std are
            # float conveniences derived from these)
            n_px.append(int(px.size))
            px_sum.append(int(px.sum(dtype=np.int64)))
        return pd.DataFrame(
            {
                "media_id": df["media_id"],
                "feat_mean": means,
                "feat_std": stds,
                "n_px": pd.array(n_px, dtype="int64"),
                "px_sum": pd.array(px_sum, dtype="int64"),
            }
        )


def image_features(media_ds, fake: bool = False, batch_size: int = 32):
    """Feature extraction over image rows — small batches (binary
    payloads), actor pool sized explicitly."""
    import pyarrow.compute as pc

    imgs = media_ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    from .stagecache import task_stage

    # light state → fused task (per-worker cache); batch_size stays
    # SMALL because payload bytes x batch x workers must fit the heap
    return imgs.map_batches(
        task_stage(ImageFeatures, fake=fake),
        batch_format="pandas",
        batch_size=batch_size,
    )


def synthesize_real_media_table(n: int = 24, width: int = 32,
                                height: int = 24) -> pa.Table:
    """Media corpus with REAL payloads: PNG images whose pixel (x, y)
    of item i is ``(i*31 + x*7 + y*3) % 256`` and PCM WAVs whose sample
    t is ``((i*17 + t*5) % 2048) - 1024`` — closed-form contents, so an
    independent oracle can recompute the decoded features without
    running any codec."""
    from .codecs import encode_png, encode_wav

    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        if i % 2 == 0:
            y, x = np.mgrid[0:height, 0:width]
            arr = ((i * 31 + x * 7 + y * 3) % 256).astype(np.uint8)
            payload, kind, mime = encode_png(arr), "image", "image/png"
            w, h, dur = width, height, 0
        else:
            n_samp = 400 + 16 * i
            t = np.arange(n_samp, dtype=np.int64)
            samples = ((i * 17 + t * 5) % 2048 - 1024).astype(np.int16)
            payload, kind, mime = encode_wav(samples, 16000), "audio", "audio/wav"
            w, h, dur = 0, 0, int(n_samp * 1000 // 16000)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synthesize_jpeg_media_table(n: int = 24, width: int = 32,
                                height: int = 24) -> pa.Table:
    """Media corpus of REAL baseline-JPEG payloads. Images are built
    from FLAT 8×8 blocks — block (bx, by) of item i has every pixel
    equal to ``(i*31 + bx*7 + by*3) % 256`` — because a flat block
    survives JPEG's lossy pipeline in closed form: only the DC
    coefficient is nonzero, so the decoded value is exactly
    ``clamp(2*floor((v-128)/2 + 0.5) + 128)`` for Q[0,0]=16 (see
    codecs.py JPEG section) and an SQL oracle can recompute the decoded
    pixel sum with integer math, no codec."""
    from .codecs import encode_jpeg_gray

    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        by, bx = np.mgrid[0:height // 8, 0:width // 8]
        blocks = ((i * 31 + bx * 7 + by * 3) % 256).astype(np.uint8)
        arr = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(encode_jpeg_gray(arr))
        rows["mime"].append("image/jpeg")
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_ms"].append(0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synthesize_gif_media_table(n: int = 24, width: int = 32,
                               height: int = 24) -> pa.Table:
    """Media corpus of REAL GIF payloads (LZW-compressed, gray
    palette): pixel (x, y) of item i is ``(i*31 + x*7 + y*3) % 256``.
    GIF is LOSSLESS, so the oracle recomputes the decoded pixel sum
    from the formula directly (×3: the palette replicates gray into
    RGB)."""
    from .codecs import encode_gif

    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        y, x = np.mgrid[0:height, 0:width]
        arr = ((i * 31 + x * 7 + y * 3) % 256).astype(np.uint8)
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(encode_gif(arr))
        rows["mime"].append("image/gif")
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_ms"].append(0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synthesize_g711_media_table(n: int = 24) -> pa.Table:
    """Media corpus of COMPRESSED audio: G.711 WAVs as a telephony
    capture ships them — μ-law (even ids) / A-law (odd ids), fmt codes
    7/6, 8 kHz. The payload code stream follows the closed formula
    ``code(i, t) = (i*17 + t*13) % 256`` and the decode laws are pure
    integer maps, so an SQL oracle recomputes Σ|decoded| from the
    G.711 bit-field math alone (no codec, no LUT sharing)."""
    from .codecs import g711_wav_from_codes

    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        n_samp = 300 + 8 * i
        t = np.arange(n_samp, dtype=np.int64)
        codes = ((i * 17 + t * 13) % 256).astype(np.uint8)
        law = "mulaw" if i % 2 == 0 else "alaw"
        rows["media_id"].append(i)
        rows["kind"].append("audio")
        rows["payload"].append(g711_wav_from_codes(codes, 8000, law))
        rows["mime"].append("audio/wav")
        rows["width"].append(0)
        rows["height"].append(0)
        rows["duration_ms"].append(int(n_samp * 1000 // 8000))
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synthesize_mjpeg_video_table(n: int = 8, width: int = 32,
                                 height: int = 24, n_frames: int = 8,
                                 fps: int = 10) -> pa.Table:
    """Media corpus of COMPRESSED video: Motion-JPEG AVIs (fourcc
    'MJPG', per-frame baseline JPEG). Frames are FLAT 8×8 blocks —
    block (bx, by) of frame f of item i is
    ``(i*11 + f*29 + bx*7 + by*3) % 256`` — so each frame survives the
    lossy JPEG pipeline in closed form (DC-only blocks; see codecs.py
    JPEG section) and an SQL oracle recomputes sampled-frame pixel sums
    with integer math."""
    from .codecs import encode_avi

    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        f, by, bx = np.mgrid[0:n_frames, 0:height // 8, 0:width // 8]
        blocks = ((i * 11 + f * 29 + bx * 7 + by * 3) % 256).astype(np.uint8)
        frames = np.repeat(np.repeat(blocks, 8, axis=1), 8, axis=2)
        rows["media_id"].append(i)
        rows["kind"].append("video")
        rows["payload"].append(encode_avi(frames, fps=fps, codec="mjpeg"))
        rows["mime"].append("video/x-msvideo")
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_ms"].append(int(n_frames * 1000 // fps))
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synthesize_real_video_table(n: int = 12, width: int = 32,
                                height: int = 24, n_frames: int = 8,
                                fps: int = 10) -> pa.Table:
    """Media corpus with REAL uncompressed-AVI payloads: pixel (x, y)
    of frame f of item i is ``(i*11 + f*29 + x*7 + y*3) % 256`` (gray,
    replicated to BGR) — closed-form contents, so an independent oracle
    recomputes decoded frame features without running the container
    parser."""
    from .codecs import encode_avi

    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        f, y, x = np.mgrid[0:n_frames, 0:height, 0:width]
        frames = ((i * 11 + f * 29 + x * 7 + y * 3) % 256).astype(np.uint8)
        payload = encode_avi(frames, fps=fps)
        rows["media_id"].append(i)
        rows["kind"].append("video")
        rows["payload"].append(payload)
        rows["mime"].append("video/x-msvideo")
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_ms"].append(int(n_frames * 1000 // fps))
    return pa.table(rows, schema=MEDIA_SCHEMA)


class VideoFrameFeatures:
    """REAL video decode → per-sampled-frame integer features
    (frame_ms, n_px, px_sum over the R channel): the AVI container
    parses via the pure-Python codec (dataops/codecs.py) — the video
    analogue of Image/AudioFeatures, flat_map-shaped (one output row
    per sampled frame)."""

    def __init__(self, every_ms: int = 500):
        self.every_ms = every_ms

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from .codecs import decode_avi

        out = {"media_id": [], "frame_ms": [], "n_px": [], "px_sum": []}
        for mid, payload in zip(df["media_id"], df["payload"]):
            frames, fps = decode_avi(payload)
            n, h, w, _ = frames.shape
            dur_ms = n * 1000 // fps
            for t in range(0, int(dur_ms), self.every_ms):
                f = min(n - 1, t * fps // 1000)
                ch = frames[f, :, :, 0].astype(np.int64)
                out["media_id"].append(mid)
                out["frame_ms"].append(t)
                out["n_px"].append(h * w)
                out["px_sum"].append(int(ch.sum()))
        return pd.DataFrame(
            {
                "media_id": pd.array(out["media_id"], dtype="int64"),
                "frame_ms": pd.array(out["frame_ms"], dtype="int64"),
                "n_px": pd.array(out["n_px"], dtype="int64"),
                "px_sum": pd.array(out["px_sum"], dtype="int64"),
            }
        )


def video_frame_features(media_ds, every_ms: int = 500, batch_size: int = 8):
    """Actor-shaped frame-feature stage over the ``video`` rows; small
    batch_size — video payloads are the fattest binaries in the
    corpus (batch bytes × concurrency must fit the worker heap)."""
    import pyarrow.compute as pc

    from .stagecache import task_stage

    vids = media_ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "video")),
        batch_format="pyarrow",
    )
    return vids.map_batches(
        task_stage(VideoFrameFeatures, every_ms=every_ms),
        batch_format="pandas",
        batch_size=batch_size,
    )


class AudioFeatures:
    """WAV decode → integer amplitude features
    (n_samples, sample_rate, amp_sum = Σ|sample|) — the audio analogue
    of ImageFeatures, real decode via the pure-Python PCM path."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from .codecs import decode_wav

        n_samples, rates, amp_sum = [], [], []
        for payload in df["payload"]:
            samples, rate = decode_wav(payload)
            flat = np.abs(samples.astype(np.int64)).reshape(-1)
            n_samples.append(int(samples.shape[0]))
            rates.append(int(rate))
            amp_sum.append(int(flat.sum()))
        return pd.DataFrame(
            {
                "media_id": df["media_id"],
                "n_samples": pd.array(n_samples, dtype="int64"),
                "sample_rate": pd.array(rates, dtype="int64"),
                "amp_sum": pd.array(amp_sum, dtype="int64"),
            }
        )


def audio_features(media_ds, batch_size: int = 32):
    import pyarrow.compute as pc

    wavs = media_ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")), batch_format="pyarrow"
    )
    from .stagecache import task_stage

    return wavs.map_batches(
        task_stage(AudioFeatures),
        batch_format="pandas",
        batch_size=batch_size,
    )


class FrameSampler:
    """Video frame sampling (one output row per sampled frame —
    flat_map-shaped). ``fake=False`` is a REAL decode path now: the
    payload parses as an AVI (raw DIB or MJPEG) or an animated GIF
    (frame rate from the first Graphic Control delay), and the frame
    id is the md5 of the decoded frame's RGB bytes. ``fake=True``
    keeps the deterministic pseudo-frame path whose hash the SQL
    oracle replays without a container parser."""

    def __init__(self, every_ms: int = 500, fake: bool = True):
        self.every_ms = every_ms
        self.fake = fake

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            from .codecs import decode_avi, decode_gif, gif_delays_cs

        out = {"media_id": [], "frame_ms": [], "frame_hash": []}
        for mid, dur, payload in zip(
            df["media_id"], df["duration_ms"], df["payload"]
        ):
            if self.fake:
                for t in range(0, int(dur), self.every_ms):
                    # md5 over "payloadhex-t": a stand-in frame id the
                    # SQL oracle reproduces exactly
                    # (substr(md5(hex||'-'||t),1,16))
                    h = hashlib.md5(
                        f"{payload.hex()}-{t}".encode("ascii")
                    ).hexdigest()[:16]
                    out["media_id"].append(mid)
                    out["frame_ms"].append(t)
                    out["frame_hash"].append(h)
                continue
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                frames = decode_gif(payload)
                delays = gif_delays_cs(payload)
                fps = (max(1, round(100 / max(1, delays[0])))
                       if delays else 10)
            else:
                frames, fps = decode_avi(payload)
            n = frames.shape[0]
            for t in range(0, int(n * 1000 // fps), self.every_ms):
                f = min(n - 1, t * fps // 1000)
                h = hashlib.md5(frames[f].tobytes()).hexdigest()[:16]
                out["media_id"].append(mid)
                out["frame_ms"].append(t)
                out["frame_hash"].append(h)
        return pd.DataFrame(out)


def sample_frames(media_ds, every_ms: int = 500, batch_size: int = 16):
    import pyarrow.compute as pc

    vids = media_ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "video")), batch_format="pyarrow"
    )
    from .stagecache import task_stage

    return vids.map_batches(
        task_stage(FrameSampler, every_ms=every_ms, fake=True),
        batch_format="pandas",
        batch_size=batch_size,
    )
