"""Vectorized CRC32C (Castagnoli) — the checksum of the Kafka
record-batch format (KIP-98: the v2 batch header carries a CRC32C over
everything after the crc field).

No CRC32C implementation is available in this environment (stdlib zlib
is CRC32/IEEE), and a byte-at-a-time table loop in Python runs ~4 MB/s
— too slow to check-CRC a real segment read.  This module computes the
same CRC two orders of magnitude faster with numpy, using two
public-domain identities:

1. **Leading zeros are free when the register starts at 0**: with a
   zero initial state a 0x00 input byte maps state 0 to 0, so
   *front-padded* equal-length chunks have the same zero-init CRC as
   the unpadded ones.  That turns one sequential byte stream into many
   independent streams processed in lockstep: a numpy state vector
   advances one byte column per step (``states = (states >> 8) ^
   TABLE[(states ^ column) & 0xFF]``), so the Python-level loop runs
   ``len/streams`` times instead of ``len`` times.  The same trick
   batches MANY buffers (``crc32c_many``): all buffers are front-padded
   to a common length and share the lockstep loop.
2. **CRC concatenation combine** (the zlib ``crc32_combine`` algorithm):
   ``crc(A||B) = shift_{len B}(crc A) ^ crc(B)`` where ``shift`` is a
   linear operator over GF(2).  Per-stream CRCs tree-reduce in
   ``log2(streams)`` vectorized levels; each level's fixed shift
   operator is baked into four 256-entry lookup tables so a whole level
   is one fancy-indexing expression, and the next level's operator is
   the square of the current one (32 vectorized applications).

Shift operators for arbitrary distances come from cached
power-of-two-byte matrices (binary decomposition), so repeated calls
with recurring batch sizes never rebuild them.  The register init
(0xFFFFFFFF) is handled outside the streamed part with
``crc(init=I, d) = crc(init=0, d) ^ shift_{len d}(I)``.

Used by beats_ray.sources.kafka for batch CRC verification (the
consumer's ``check.crcs`` behavior) and by the segment fixture writer.
"""

from __future__ import annotations

import numpy as np

__all__ = ["crc32c", "crc32c_many", "crc32c_py"]

_POLY = 0x82F63B78  # reflected Castagnoli polynomial


def _make_table() -> np.ndarray:
    t = np.empty(256, np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ _POLY if c & 1 else c >> 1
        t[i] = c
    return t


_TABLE = _make_table()
_TABLE_LIST = _TABLE.tolist()  # Python ints: faster for the scalar loop


def crc32c_py(data, value: int = 0) -> int:
    """Reference byte-at-a-time CRC32C (tests + short inputs)."""
    crc = value ^ 0xFFFFFFFF
    tbl = _TABLE_LIST
    for b in bytes(data):
        crc = (crc >> 8) ^ tbl[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# GF(2) shift operators.  A matrix is a length-32 uint32 ndarray of
# column images; "tables" are its (4, 256) uint32 lookup form applying
# it to a uint32 vector in 4 fancy-indexing ops.
# ---------------------------------------------------------------------------


def _mat_to_tables(mat: np.ndarray) -> np.ndarray:
    tabs = np.zeros((4, 256), np.uint32)
    idx = np.arange(256)
    for pos in range(4):
        t = tabs[pos]
        for bit in range(8):
            t[(idx >> bit) & 1 == 1] ^= mat[8 * pos + bit]
    return tabs


def _apply_tables(tabs: np.ndarray, vals: np.ndarray) -> np.ndarray:
    return (
        tabs[0][vals & np.uint32(0xFF)]
        ^ tabs[1][(vals >> np.uint32(8)) & np.uint32(0xFF)]
        ^ tabs[2][(vals >> np.uint32(16)) & np.uint32(0xFF)]
        ^ tabs[3][vals >> np.uint32(24)]
    )


def _one_byte_matrix() -> np.ndarray:
    basis = np.left_shift(np.uint32(1), np.arange(32, dtype=np.uint32))
    return (basis >> np.uint32(8)) ^ _TABLE[basis & np.uint32(0xFF)]


_POW2: list[np.ndarray] = [_one_byte_matrix()]  # _POW2[j]: shift 2^j bytes


def _pow2_matrix(j: int) -> np.ndarray:
    while len(_POW2) <= j:
        m = _POW2[-1]
        _POW2.append(_apply_tables(_mat_to_tables(m), m))
    return _POW2[j]


_matrix_cache: dict[int, np.ndarray] = {}


def _shift_matrix(nbytes: int) -> np.ndarray:
    """Operator for appending ``nbytes`` zero bytes, by binary
    decomposition over cached power-of-two matrices."""
    mat = _matrix_cache.get(nbytes)
    if mat is not None:
        return mat
    out = None
    n, j = nbytes, 0
    while n:
        if n & 1:
            p = _pow2_matrix(j)
            out = p if out is None else _apply_tables(_mat_to_tables(p), out)
        n >>= 1
        j += 1
    if out is None:  # identity
        out = np.left_shift(np.uint32(1), np.arange(32, dtype=np.uint32))
    if len(_matrix_cache) < 4096:
        _matrix_cache[nbytes] = out
    return out


def _shift_value(value: int, nbytes: int) -> int:
    """shift_{nbytes}(value) for a scalar, via binary decomposition —
    no matrix products, just ≤log2(n) matrix·vector applications."""
    if value == 0 or nbytes == 0:
        return value
    v, n, j = value, nbytes, 0
    while n:
        if n & 1:
            mat = _pow2_matrix(j)
            acc, vv, bit = 0, v, 0
            while vv:
                if vv & 1:
                    acc ^= int(mat[bit])
                vv >>= 1
                bit += 1
            v = acc
        n >>= 1
        j += 1
    return v


# ---------------------------------------------------------------------------
# Streamed CRC
# ---------------------------------------------------------------------------

_MIN_STREAMED = 4096
_TARGET_CHUNK = 1280  # aim for ~1.2KB columns; streams = n / chunk


def _lockstep(grid: np.ndarray) -> np.ndarray:
    """Zero-init CRC registers of every row of ``grid`` (2-D uint8),
    advanced one byte column per step."""
    states = np.zeros(grid.shape[0], np.uint32)
    tbl = _TABLE
    for j in range(grid.shape[1]):
        states = (states >> np.uint32(8)) ^ tbl[
            (states ^ grid[:, j]) & np.uint32(0xFF)
        ]
    return states


def _tree_combine(states: np.ndarray, chunk: int, axis_len: int) -> np.ndarray:
    """Combine ``axis_len`` consecutive per-stream zero-init CRCs (last
    axis of ``states`` reshaped (-1, axis_len)) into one per row.
    crc(L||R) = shift_{len R}(crc L) ^ crc R; the shift doubles per
    level via matrix squaring."""
    mat = _shift_matrix(chunk)
    k = axis_len
    while k > 1:
        tabs = _mat_to_tables(mat)
        states = _apply_tables(tabs, states[:, 0::2]) ^ states[:, 1::2]
        k //= 2
        if k > 1:
            mat = _apply_tables(tabs, mat)  # square: shift distance ×2
    return states[:, 0]


def _pick_streams(n: int) -> int:
    s = 1
    while s < 8192 and n // (2 * s) >= _TARGET_CHUNK:
        s *= 2
    return s


def crc32c(data, value: int = 0) -> int:
    """CRC32C of ``data`` (bytes-like or uint8 ndarray), optionally
    continuing from a previous ``value``."""
    buf = data if isinstance(data, np.ndarray) else np.frombuffer(
        data, np.uint8
    )
    n = buf.size
    if n < _MIN_STREAMED:
        return crc32c_py(buf.tobytes(), value)

    s = _pick_streams(n)
    chunk = (n + s - 1) // s
    pad = s * chunk - n
    if pad:  # front-pad: no-op for the zero-init stream 0 (identity 1)
        grid = np.zeros(s * chunk, np.uint8)
        grid[pad:] = buf
    else:
        grid = buf
    states = _lockstep(grid.reshape(s, chunk))
    crc0 = int(_tree_combine(states.reshape(1, s), chunk, s)[0])
    return crc0 ^ _shift_value(value ^ 0xFFFFFFFF, n) ^ 0xFFFFFFFF


_init_cache: dict[int, int] = {}


def _init_shift(n: int) -> int:
    v = _init_cache.get(n)
    if v is None:
        v = _shift_value(0xFFFFFFFF, n)
        if len(_init_cache) < 65536:
            _init_cache[n] = v
    return v


def _crc0_bucket(bufs, idx: np.ndarray, m: int) -> np.ndarray:
    """Zero-init CRCs of the buffers at ``idx`` (all of size <= m),
    front-padded to m and processed in one lockstep grid."""
    nb = len(idx)
    # streams per buffer: enough total lanes (nb*s) that each lockstep
    # step amortizes numpy dispatch, bounded so the grid stays cheap
    s = 1
    while s < 8192 and m // (2 * s) >= 64 and nb * s <= 65536:
        s *= 2
    chunk = (m + s - 1) // s
    grid = np.zeros((nb, s * chunk), np.uint8)
    for row, i in enumerate(idx):
        b = bufs[i]
        if b.size:
            grid[row, s * chunk - b.size:] = b
    states = _lockstep(grid.reshape(nb * s, chunk))
    return _tree_combine(states.reshape(nb, s), chunk, s)


def crc32c_many(buffers) -> np.ndarray:
    """CRC32C of many buffers at once (uint32 ndarray, one per buffer).

    Buffers are bucketed by power-of-two size class (bounding the
    front-padding waste at 2x), each bucket front-padded to a common
    length — free under the zero-init identity — and processed as one
    lockstep grid + one vectorized tree-combine.  This is the kernel
    the Kafka reader uses to check every batch CRC in a file, and the
    fixture writer to stamp every batch it emits, in a handful of
    numpy passes.
    """
    bufs = [
        b if isinstance(b, np.ndarray) else np.frombuffer(b, np.uint8)
        for b in buffers
    ]
    nb = len(bufs)
    if nb == 0:
        return np.zeros(0, np.uint32)
    lens = np.array([b.size for b in bufs], np.int64)
    out = np.zeros(nb, np.uint32)
    nonzero = lens > 0
    classes = np.zeros(nb, np.int64)
    classes[nonzero] = np.int64(1) << np.ceil(
        np.log2(lens[nonzero])).astype(np.int64)
    for cls in np.unique(classes):
        if cls == 0:
            continue
        idx = np.flatnonzero(classes == cls)
        m = int(lens[idx].max())
        out[idx] = _crc0_bucket(bufs, idx, m)
    inits = np.fromiter((_init_shift(int(n)) for n in lens),
                        np.uint32, nb)
    return out ^ inits ^ np.uint32(0xFFFFFFFF)
