"""Deterministic synthetic transcript corpus (FIXTURES.md §1-§4).

The BASELINE.json input_hint defines the table shape:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.  Everything here is a pure function of
(scale factor, fixed seed constants) — no wall-clock, no RNG state — so
the Ray pipeline and the DuckDB oracle read byte-identical inputs.

Text content mix per FIXTURES.md §2 (class decided by a per-row hash):
  <60  dissect-able tool-call line      (reference: dissect fixtures,
        libbeat/processors/dissect/testdata/dissect_tests.json)
  <75  ndjson turn                      (reader/readjson/json.go)
  <85  RFC3164 syslog-style line        (reader/syslog/rfc3164)
  <95  multiline stack trace            (reader/multiline pattern mode)
  <100 malformed (truncated JSON / empty / garbage) — parse-error parity

Skew fixture: every 100th conversation is "hot" (50× the turns), so
groupby(conv_id) stages see realistic key skew.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TRANSCRIPT_SCHEMA

BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
TOOLS = np.array(["bash", "read", "write", "grep", "search"])
ROLES = np.array(["user", "assistant", "tool", "system"])
LEVELS = np.array(["info", "warn", "error", "debug"])
EXCEPTIONS = np.array(
    ["NullPointerException", "IllegalArgumentException", "IOException"]
)

# Enrichment small sides (FIXTURES.md §3-§4) — broadcast lookup tables
# modelling add_host_metadata / dns / translate_* processors.
TOOL_LOOKUP: dict[str, tuple[str, str]] = {
    "bash": ("shell", "high"),
    "read": ("fs", "low"),
    "write": ("fs", "medium"),
    "grep": ("search", "low"),
    "search": ("search", "low"),
    "none": ("n/a", "low"),
}
ROLE_LOOKUP: dict[str, str] = {
    "user": "human",
    "assistant": "model",
    "tool": "machine",
    "system": "control",
}

def fnv1a32(s: str) -> int:
    """FNV-1a 32-bit string hash — the engine's stable partitioner."""
    h = 2166136261
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def fnv1a32_arrow(arr) -> np.ndarray:
    """TRUE vectorized FNV-1a over an Arrow string column: one numpy
    pass per byte POSITION (total work = total bytes, no Python loop
    over rows or bytes). Bit-identical to ``fnv1a32`` per string; nulls
    hash as ``str(None)`` == "None" (parity with the per-unique
    ``fnv1a32(str(u))`` call sites this replaces). Returns int64.

    Strings longer than 512 bytes would pay one numpy call per byte on
    a shrinking active set — partition keys are short, so that path
    falls back to the per-unique scalar hash."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    offsets = np.frombuffer(off_buf, dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    starts, lens = offsets[:-1], offsets[1:] - offsets[:-1]
    null_mask = None
    if arr.null_count:
        null_mask = np.asarray(arr.is_null())
        lens = np.where(null_mask, 0, lens)  # don't walk null slots
    max_len = int(lens.max()) if n else 0
    if max_len > 512:
        uniq = pa.compute.unique(arr)
        import pyarrow.compute as pc

        vals = pa.array(
            [fnv1a32(str(u)) for u in uniq.to_pylist()], pa.int64()
        )
        return (
            pc.take(vals, pc.index_in(arr, value_set=uniq))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    h = np.full(n, 2166136261, dtype=np.uint64)
    active = lens > 0
    pos = 0
    while pos < max_len:
        idx = np.flatnonzero(active)
        b = data[starts[idx] + pos].astype(np.uint64)
        h[idx] = ((h[idx] ^ b) * 16777619) & 0xFFFFFFFF
        pos += 1
        active &= lens > pos
    if null_mask is not None and null_mask.any():
        h[null_mask] = fnv1a32("None")
    return h.astype(np.int64)


def fnv1a32_bucket(keys, mod: int) -> "pa.Array":
    """Adaptive bucket assignment for keyed shuffles: Arrow-unique the
    keys first and run the vectorized kernel over the uniques when they
    repeat (conv_id batches: ~3.5× vs hashing every row), else hash all
    rows directly (near-unique keys: unique+take overhead loses, direct
    kernel is ~10× the per-unique Python loop). Returns int64."""
    import pyarrow.compute as pc

    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    uniq = pc.unique(keys)
    if len(uniq) * 2 <= len(keys):
        vals = pa.array(fnv1a32_arrow(uniq) % mod, pa.int64())
        out = pc.take(vals, pc.index_in(keys, value_set=uniq))
        return pc.fill_null(out, fnv1a32("None") % mod)
    return pa.array(fnv1a32_arrow(keys) % mod, pa.int64())


def fnv1a32_series(values: pd.Series) -> np.ndarray:
    """Vectorized FNV over a string Series (Arrow byte-position kernel;
    falls back to per-unique scalar hashing for non-string payloads)."""
    try:
        return fnv1a32_arrow(pa.array(values.astype("string")))
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        # str(u): the only way here is a payload astype('string')
        # rejected, so hashing raw values would crash .encode — and the
        # primary path hashes the STRINGIFIED value, so both paths must
        # agree
        uniq = pd.unique(values)
        table = {u: fnv1a32(str(u)) for u in uniq}
        return values.map(table).to_numpy(dtype=np.int64)


def scale_turns(sf: float) -> int:
    """Target turn count: matches the driver's lineitem scaling (6M × sf)."""
    return max(200, int(6_000_000 * sf))


def _conv_layout(n_turns: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (conv_num, turn_idx, lengths) covering ≈ n_turns rows."""
    # Deterministic lengths: 8 + (i*37 % 23); every 100th conv is hot (×50).
    avg = 19.0 * 0.99 + 19.0 * 50 * 0.01  # ≈ 28.3
    n_conv = max(10, int(round(n_turns / avg)))
    i = np.arange(n_conv, dtype=np.int64)
    lengths = 8 + (i * 37) % 23
    lengths = np.where(i % 100 == 0, lengths * 50, lengths)
    conv_num = np.repeat(i, lengths)
    # turn_idx = position within each conversation
    ends = np.cumsum(lengths)
    starts = ends - lengths
    turn_idx = np.arange(ends[-1], dtype=np.int64) - np.repeat(starts, lengths)
    return conv_num, turn_idx, lengths


def build_transcripts(sf: float) -> pa.Table:
    """Build the full transcript table for a scale factor (deterministic)."""
    n_target = scale_turns(sf)
    conv_num, turn_idx, _ = _conv_layout(n_target)
    n = len(conv_num)

    conv_id = pd.Series(conv_num).map(lambda i: f"conv-{i:06d}").astype("string")
    role_code = (conv_num * 7 + turn_idx * 3) % 20
    role = np.select(
        [role_code < 8, role_code < 16, role_code < 19], ROLES[:3], ROLES[3]
    )
    tool = np.where(
        role == "tool", TOOLS[(conv_num + turn_idx) % 5], "none"
    ).astype(object)
    ts_us = BASE_TS_US + conv_num * 127_000_000 + turn_idx * 7_000_000

    h = (conv_num * 1_000_003 + turn_idx * 7_919) % 100
    aux = (conv_num * 31 + turn_idx * 17) % 1_000_000

    dt_idx = pd.to_datetime(ts_us, unit="us", utc=True)
    ts_iso = dt_idx.strftime("%Y-%m-%dT%H:%M:%SZ")
    # explicit month table: %b is LOCALE-DEPENDENT and would break the
    # byte-identical determinism contract (and the syslog regex) on
    # non-C-locale hosts
    months = np.array(["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                       "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])
    syslog_ts = pd.Series(months[dt_idx.month - 1]) + dt_idx.strftime(
        " %d %H:%M:%S"
    )

    level = LEVELS[aux % 4]
    status = np.where(aux % 5 == 0, "fail", "ok")
    ncmd = (aux % 7 + 1).astype(str)

    s = pd.Series  # shorthand for object-dtype vectorized concat
    text_dissect = (
        "level=" + s(level) + " ts=" + s(np.asarray(ts_iso, dtype=object))
        + " tool=" + s(tool) + " status=" + s(status)
        + ' msg="ran ' + s(ncmd.astype(object)) + ' commands"'
    )

    dur = (aux % 500 + 1).astype(str)
    jtool = TOOLS[aux % 5]
    ev = np.where(aux % 4 == 0, "tool_result", "tool_call")
    text_json = (
        '{"event":"' + s(ev.astype(object)) + '","tool":"' + s(jtool.astype(object))
        + '","args":{"pattern":"x"},"duration_ms":' + s(dur.astype(object)) + "}"
    )

    pri = (aux % 192).astype(str)
    pid = (aux % 9_000 + 100).astype(str)
    hostn = "host" + s((aux % 9).astype(str).astype(object))
    text_syslog = (
        "<" + s(pri.astype(object)) + ">" + s(np.asarray(syslog_ts, dtype=object))
        + " " + hostn + " app[" + s(pid.astype(object))
        + "]: job " + s(dur.astype(object)) + " finished"
    )

    exc = EXCEPTIONS[aux % 3]
    lineno = (aux % 400 + 10).astype(str)
    text_multi = (
        'Exception in thread "main" java.lang.' + s(exc.astype(object))
        + ": op failed\n\tat com.example.Foo.bar(Foo.java:"
        + s(lineno.astype(object))
        + ")\n\tat com.example.Main.main(Main.java:12)"
    )

    bad_kind = aux % 3
    text_bad = np.select(
        [bad_kind == 0, bad_kind == 1],
        ['{"event":"tool_call","tool":', ""],
        "### $$$ not a log line",
    ).astype(object)

    text = np.select(
        [h < 60, h < 75, h < 85, h < 95],
        [
            text_dissect.to_numpy(dtype=object),
            text_json.to_numpy(dtype=object),
            text_syslog.to_numpy(dtype=object),
            text_multi.to_numpy(dtype=object),
        ],
        text_bad,
    )

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx.astype(np.int32), pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def num_partitions(sf: float) -> int:
    return 16 if sf >= 0.05 else 8


def transcripts_dir(sf: float, root: str = "/tmp/beats_ray_fixtures") -> str:
    return os.path.join(root, f"sf{sf:g}", "transcripts")


def _fixture_token(sf: float) -> str:
    """Cache-validity token: generation parameters + a generator-source
    digest, so editing the generator (or changing the partition count)
    regenerates instead of silently serving a stale corpus."""
    import hashlib

    src = Path(__file__).read_bytes()
    return (
        f"sf={sf} p={num_partitions(sf)} "
        f"gen={hashlib.md5(src).hexdigest()[:12]}"
    )


def ensure_transcripts(sf: float, root: str = "/tmp/beats_ray_fixtures") -> str:
    """Write the transcript corpus as P hash(conv_id)-partitioned parquet
    files (FIXTURES.md: ≥8 files so resume/lineage tests span partitions).
    Idempotent & cached: a _DONE marker carrying the generation token
    short-circuits regeneration; generation happens in a temp dir that
    atomically os.replace()s into place, so a concurrent caller never
    reads truncated part files and a stale cache (generator edited,
    partition count changed) regenerates instead of being served.
    """
    out = Path(transcripts_dir(sf, root))
    done = out / "_DONE"
    token = _fixture_token(sf)
    if done.exists() and done.read_text() == token:
        return str(out)
    tmp = Path(str(out) + f".tmp-{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True, exist_ok=True)
    tbl = build_transcripts(sf)
    p = num_partitions(sf)
    part = fnv1a32_series(pd.Series(tbl["conv_id"].to_pandas())) % p
    part_arr = np.asarray(part)
    for k in range(p):
        sub = tbl.filter(pa.array(part_arr == k))
        pq.write_table(sub, tmp / f"part-{k:05d}.parquet")
    (tmp / "_DONE").write_text(token)
    # atomic publish under an flock: serializes concurrent generators
    # (losers re-check the _DONE token and discard their tmp dir), and
    # readers that arrive mid-swap only see either the old complete dir
    # or the new complete dir — never a truncated part file. The brief
    # missing-dir window between the two os.replace calls only exists
    # inside the lock, and every writer re-checks under it.
    out.parent.mkdir(parents=True, exist_ok=True)
    lock_path = Path(str(out) + ".lock")
    with open(lock_path, "w") as lk:
        try:
            import fcntl

            fcntl.flock(lk, fcntl.LOCK_EX)
        except ImportError:  # non-POSIX: fall back to best-effort swap
            pass
        if done.exists() and done.read_text() == token:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race
            return str(out)
        aside = Path(str(out) + ".old")
        shutil.rmtree(aside, ignore_errors=True)
        try:
            if out.exists():
                os.replace(out, aside)
            os.replace(tmp, out)
        except OSError:
            # another (non-locking legacy) writer swapped concurrently:
            # accept its corpus if its token checks out
            if not (done.exists() and done.read_text() == token):
                raise
        shutil.rmtree(aside, ignore_errors=True)
    return str(out)


def sf_from_dir(sf_dir: str) -> float:
    """Extract the scale factor from a driver sf dir like /root/testdata/sf0.01."""
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        return float(name[2:])
    raise ValueError(f"cannot infer scale factor from {sf_dir!r}")


def tool_lookup_table() -> pa.Table:
    rows = sorted(TOOL_LOOKUP.items())
    return pa.table(
        {
            "tool": [k for k, _ in rows],
            "tool_category": [v[0] for _, v in rows],
            "risk_level": [v[1] for _, v in rows],
        }
    )


def role_lookup_table() -> pa.Table:
    rows = sorted(ROLE_LOOKUP.items())
    return pa.table(
        {"role": [k for k, _ in rows], "role_tag": [v for _, v in rows]}
    )
