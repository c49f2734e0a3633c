"""Kafka input over the public on-disk segment-log format.

The reference's kafka input (filebeat/input/kafka/input.go) consumes
topics from a broker via the sarama consumer-group client and maps each
record to a beat.Event (input.go:436-470 composeEventMetadata /
composeMessage).  No broker exists in this environment, so — exactly
like journald (export format) and winlog (exported event XML) — the
input is modeled over the system's public *interchange* format: Kafka's
on-disk segment log (RecordBatch magic v2, KIP-98), byte-identical to
what a broker serves in fetch responses.  Behaviors modeled:

- record → event mapping (input.go:436-470): ``message`` = value,
  ``kafka.{topic,partition,offset,key,headers,block_timestamp}``,
  ``ts`` = the record CreateTime (the version ≥ 0.10 branch;
  LogAppendTime batches stamp every record with the batch
  maxTimestamp, broker semantics for attribute bit 3)
- headers serialized ``"key: value"`` with ``':'`` in the key masked to
  ``'_'`` (input.go:226-241 arrayForKafkaHeaders)
- ``expand_event_list_from_field`` (input.go:369-434
  listFromFieldReader / parseMultipleMessages: top-level JSON object,
  the named field's array re-serialized one message per element;
  undecodable payloads produce zero messages)
- ``isolation_level`` read_uncommitted | read_committed
  (config.go:87-106): control batches are never emitted as events;
  under read_committed, records of a transactional producer whose
  transaction ends with an ABORT marker — or never terminates inside
  the read segments (i.e. past the last stable offset) — are dropped
- ``check_crcs`` (sarama's Consumer.Fetch default): CRC32C batch
  verification, vectorized over every batch in a file via
  :func:`beats_ray.sources.crc32c.crc32c_many`; corrupt batches are
  skipped (sarama logs and discards the fetch block)
- gzip codec (attribute bits 0-2); snappy/lz4/zstd raise
  NotImplementedError — the libraries are absent here, the same
  documented capability boundary as beats_ray/codecs.py

Scale notes: segments are the file-parallel unit (one scan task per
segment, like every other source in this package); topic selection
prunes at the *path* level so unselected topics are never read; batch
CRCs for a whole segment check in a handful of numpy passes.
"""

from __future__ import annotations

import gzip
import json
import struct

import numpy as np
import pyarrow as pa

from .crc32c import crc32c_many

__all__ = [
    "kafka_events",
    "kafka_segment_paths",
    "read_kafka_segments",
    "scan_kafka_segment",
    "write_kafka_record_batch",
    "write_kafka_segments_fixture",
]

_CODEC_NONE, _CODEC_GZIP = 0, 1
_CODEC_NAMES = {2: "snappy", 3: "lz4", 4: "zstd"}

_HEADER = struct.Struct(">qiibIhiqqqhii")  # the 61-byte v2 batch header
_HEADER_LEN = _HEADER.size
assert _HEADER_LEN == 61


# ---------------------------------------------------------------------------
# Zigzag varints (the record-level encoding, KIP-98)
# ---------------------------------------------------------------------------

def _read_varint(buf, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (result >> 1) ^ -(result & 1), pos


def _write_varint(out: bytearray, n: int) -> None:
    u = (n << 1) ^ (n >> 63)  # arbitrary-precision arithmetic shift: ok
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


# ---------------------------------------------------------------------------
# Segment scanner
# ---------------------------------------------------------------------------

def _empty_table(topic: str, partition: int) -> pa.Table:
    return pa.table({
        "kafka.topic": pa.array([], pa.string()),
        "kafka.partition": pa.array([], pa.int32()),
        "kafka.offset": pa.array([], pa.int64()),
        "kafka.key": pa.array([], pa.string()),
        "kafka.headers": pa.array([], pa.list_(pa.string())),
        "kafka.block_timestamp": pa.array([], pa.timestamp("us")),
        "message": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
    })


def _parse_batch_records(payload, count: int, base_offset: int,
                         base_ts: int, max_ts: int, log_append: bool):
    """One decompressed records blob → (offsets, ts_ms, keys, values,
    headers) python lists.  Sequential varints force the per-record
    loop; it is the only row loop in the input and runs inside the
    file-parallel scan task."""
    offs: list[int] = []
    tss: list[int] = []
    keys: list[str | None] = []
    vals: list[str | None] = []
    hdrs: list[list[str]] = []
    rv = _read_varint
    pos = 0
    for _ in range(count):
        length, pos = rv(payload, pos)
        end = pos + length
        pos += 1  # record attributes: unused (KIP-98)
        ts_delta, pos = rv(payload, pos)
        off_delta, pos = rv(payload, pos)
        klen, pos = rv(payload, pos)
        if klen >= 0:
            key = bytes(payload[pos:pos + klen]).decode("utf-8", "replace")
            pos += klen
        else:
            key = None
        vlen, pos = rv(payload, pos)
        if vlen >= 0:
            val = bytes(payload[pos:pos + vlen]).decode("utf-8", "replace")
            pos += vlen
        else:
            val = None
        hcount, pos = rv(payload, pos)
        hs = []
        for _h in range(hcount):
            hklen, pos = rv(payload, pos)
            hkey = bytes(payload[pos:pos + hklen]).decode("utf-8", "replace")
            pos += hklen
            hvlen, pos = rv(payload, pos)
            if hvlen >= 0:
                hval = bytes(payload[pos:pos + hvlen]).decode(
                    "utf-8", "replace")
                pos += hvlen
            else:
                hval = ""
            # input.go:236: ':' in the key masked so "key: value" parses
            hs.append(hkey.replace(":", "_") + ": " + hval)
        pos = end
        offs.append(base_offset + off_delta)
        tss.append(max_ts if log_append else base_ts + ts_delta)
        keys.append(key)
        vals.append(val)
        hdrs.append(hs)
    return offs, tss, keys, vals, hdrs


def scan_kafka_segment(data: bytes, *, topic: str = "", partition: int = 0,
                       check_crcs: bool = True,
                       isolation_level: str = "read_uncommitted") -> pa.Table:
    """Scan one segment file (RecordBatch v2 framing) into an Arrow
    table of event-ready rows.  A truncated trailing batch (torn broker
    write / mid-flight copy) is ignored, like a fetch that ends at the
    log end offset.  CRC-corrupt batches are skipped when
    ``check_crcs`` (sarama discards the block)."""
    if isolation_level not in ("read_uncommitted", "read_committed"):
        raise ValueError(f"unknown isolation_level {isolation_level!r}")
    committed = isolation_level == "read_committed"
    view = memoryview(data)
    n = len(data)
    pos = 0
    batches = []  # (payload_slice, header_fields)
    crc_regions = []
    stored_crcs = []
    while pos + _HEADER_LEN <= n:
        (base_offset, batch_len, _leader_epoch, magic, crc, attrs,
         _last_off_delta, base_ts, max_ts, producer_id, _producer_epoch,
         _base_seq, count) = _HEADER.unpack_from(view, pos)
        total = 12 + batch_len  # batch_len counts bytes after its field
        if pos + total > n:
            break  # torn tail
        if magic != 2:
            raise ValueError(
                f"unsupported record-batch magic {magic} at byte {pos} "
                "(only v2, the format since Kafka 0.11, is supported)")
        batches.append((
            view[pos + _HEADER_LEN:pos + total],
            attrs, base_offset, base_ts, max_ts, producer_id, count,
        ))
        crc_regions.append(np.frombuffer(view[pos + 21:pos + total],
                                         np.uint8))
        stored_crcs.append(crc)
        pos += total

    ok = np.ones(len(batches), bool)
    if check_crcs and batches:
        ok = crc32c_many(crc_regions) == np.array(stored_crcs, np.uint32)

    # Pass 2: decode batches in log order; transactional data under
    # read_committed is held per-producer until its control marker.
    parts: list[tuple] = []          # visible (offs, tss, keys, vals, hdrs, block_ts)
    pending: dict[int, list[int]] = {}  # producer_id -> indexes into parts
    gated: list[bool] = []           # parts[i] awaiting a commit marker
    for i, (payload, attrs, base_offset, base_ts, max_ts, producer_id,
            count) in enumerate(batches):
        if not ok[i]:
            continue
        is_control = bool(attrs & 0x20)
        is_txn = bool(attrs & 0x10)
        if is_control:
            # marker key = (int16 version, int16 type: 0=abort 1=commit);
            # parse the first record's key directly
            kpos = 0
            _length, kpos = _read_varint(payload, kpos)
            kpos += 1  # record attributes
            _, kpos = _read_varint(payload, kpos)  # ts delta
            _, kpos = _read_varint(payload, kpos)  # offset delta
            klen, kpos = _read_varint(payload, kpos)
            commit = False
            if klen >= 4:
                _version, ctype = struct.unpack_from(
                    ">hh", payload, kpos)
                commit = ctype == 1
            for j in pending.pop(producer_id, []):
                gated[j] = not commit  # abort → stays dropped
            continue
        codec = attrs & 0x07
        if codec == _CODEC_GZIP:
            payload = gzip.decompress(bytes(payload))
        elif codec != _CODEC_NONE:
            raise NotImplementedError(
                f"kafka {_CODEC_NAMES.get(codec, codec)} codec: "
                "library not available in this environment; re-compress "
                "segments with gzip or none (same boundary as "
                "beats_ray/codecs.py)")
        parsed = _parse_batch_records(payload, count, base_offset,
                                      base_ts, max_ts,
                                      bool(attrs & 0x08))
        parts.append(parsed + (max_ts,))
        gated.append(committed and is_txn)
        if committed and is_txn:
            pending.setdefault(producer_id, []).append(len(parts) - 1)
    # unterminated transactions sit past the LSO: invisible to
    # read_committed consumers (gated stays True)

    offs: list[int] = []
    tss: list[int] = []
    keys: list[str | None] = []
    vals: list[str | None] = []
    hdrs: list[list[str]] = []
    blk: list[int] = []
    for i, (o, t, k, v, h, bts) in enumerate(parts):
        if gated[i]:
            continue
        offs.extend(o)
        tss.extend(t)
        keys.extend(k)
        vals.extend(v)
        hdrs.extend(h)
        blk.extend([bts] * len(o))
    if not offs:
        return _empty_table(topic, partition)
    nrows = len(offs)
    ms_to_us = np.array(tss, np.int64) * 1000
    blk_us = np.array(blk, np.int64) * 1000
    return pa.table({
        "kafka.topic": pa.array([topic] * nrows, pa.string()),
        "kafka.partition": pa.array([partition] * nrows, pa.int32()),
        "kafka.offset": pa.array(offs, pa.int64()),
        "kafka.key": pa.array(keys, pa.string()),
        "kafka.headers": pa.array(hdrs, pa.list_(pa.string())),
        "kafka.block_timestamp": pa.array(blk_us, pa.timestamp("us")),
        "message": pa.array(vals, pa.string()),
        "ts": pa.array(ms_to_us, pa.timestamp("us")),
    })


def _topic_partition_from_path(path: str) -> tuple[str, int]:
    """``.../<topic>-<partition>/<20-digit base offset>.log`` — the
    broker's on-disk layout."""
    import os
    d = os.path.basename(os.path.dirname(path))
    topic, _, part = d.rpartition("-")
    if not topic or not part.isdigit():
        return d, 0
    return topic, int(part)


def kafka_segment_paths(root: str, topics: list[str] | None = None
                        ) -> list[str]:
    """Segment files under a broker log dir, pruned by topic BEFORE any
    bytes are read (config.go:39 ``topics`` — the subscription set)."""
    import glob
    import os
    paths = []
    for d in sorted(glob.glob(os.path.join(root, "*-*"))):
        topic, _ = _topic_partition_from_path(os.path.join(d, "x.log"))
        if topics is not None and topic not in topics:
            continue
        paths.extend(sorted(glob.glob(os.path.join(d, "*.log"))))
    return paths


def read_kafka_segments(paths: list[str] | str,
                        topics: list[str] | None = None, *,
                        check_crcs: bool = True,
                        isolation_level: str = "read_uncommitted"):
    """Read Kafka segment files as a Dataset of events — file-parallel
    (one scan task per segment; partitions-within-topic is exactly the
    consumer-group parallelism model, input.go:309 ConsumeClaim runs
    one reader per claimed partition)."""
    import ray.data

    if isinstance(paths, str):
        paths = kafka_segment_paths(paths, topics)
    elif topics is not None:
        paths = [p for p in paths
                 if _topic_partition_from_path(p)[0] in topics]

    def parse(batch: dict) -> pa.Table:
        tables = []
        for data, path in zip(batch["bytes"], batch["path"]):
            topic, part = _topic_partition_from_path(path)
            tables.append(scan_kafka_segment(
                bytes(data), topic=topic, partition=part,
                check_crcs=check_crcs, isolation_level=isolation_level))
        if not tables:
            return _empty_table("", 0)
        return pa.concat_tables(tables)

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse, batch_format="numpy")


# ---------------------------------------------------------------------------
# expand_event_list_from_field
# ---------------------------------------------------------------------------

def kafka_events(ds, *, expand_event_list_from_field: str | None = None):
    """The event-composition layer.  Without expansion this is the
    identity (the scan already emits composeMessage's fields); with
    ``expand_event_list_from_field`` each record's value is parsed as a
    JSON object and the named field's array becomes one message per
    element, kafka.* metadata repeated (input.go:416-434
    parseMultipleMessages: undecodable values or a missing/non-array
    field yield zero messages, logged not errored)."""
    if not expand_event_list_from_field:
        return ds
    field = expand_event_list_from_field

    def expand(t: pa.Table) -> pa.Table:
        msgs = t["message"].to_pylist()
        take: list[int] = []
        out: list[str] = []
        for i, m in enumerate(msgs):
            if m is None:
                continue
            try:
                obj = json.loads(m)
            except ValueError:
                continue
            if not isinstance(obj, dict):
                continue
            lst = obj.get(field)
            if not isinstance(lst, list):
                continue
            for el in lst:
                take.append(i)
                out.append(json.dumps(el, separators=(",", ":")))
        base = t.drop_columns(["message"]).take(pa.array(take, pa.int64()))
        return base.append_column("message", pa.array(out, pa.string()))

    return ds.map_batches(expand, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Batch writer (fixture + test vector construction)
# ---------------------------------------------------------------------------

def _batch_region(records, *, codec: str = "none",
                  producer_id: int = -1,
                  producer_epoch: int = -1,
                  base_sequence: int = -1,
                  transactional: bool = False,
                  control: bool = False,
                  log_append_time: bool = False) -> bytes:
    """The CRC-covered region of a RecordBatch v2 (attributes →
    records blob).  Split out so bulk writers can defer CRCs and
    compute them all in ONE vectorized crc32c_many pass."""
    if not records:
        raise ValueError("a record batch must contain >= 1 record")
    base_ts = min(r[0] for r in records)
    max_ts = max(r[0] for r in records)
    blob = bytearray()
    for i, (ts, key, val, headers) in enumerate(records):
        rec = bytearray()
        rec.append(0)  # record attributes
        _write_varint(rec, ts - base_ts)
        _write_varint(rec, i)  # offset delta
        if key is None:
            _write_varint(rec, -1)
        else:
            _write_varint(rec, len(key))
            rec += key
        if val is None:
            _write_varint(rec, -1)
        else:
            _write_varint(rec, len(val))
            rec += val
        _write_varint(rec, len(headers))
        for hk, hv in headers:
            hkb = hk.encode()
            _write_varint(rec, len(hkb))
            rec += hkb
            if hv is None:
                _write_varint(rec, -1)
            else:
                _write_varint(rec, len(hv))
                rec += hv
        _write_varint(blob, len(rec))
        blob += rec
    codec_bits = {"none": _CODEC_NONE, "gzip": _CODEC_GZIP}[codec]
    if codec_bits == _CODEC_GZIP:
        blob = bytearray(gzip.compress(bytes(blob), 1))
    attrs = (codec_bits
             | (0x08 if log_append_time else 0)
             | (0x10 if transactional or control else 0)
             | (0x20 if control else 0))
    return struct.pack(">hiqqqhii", attrs, len(records) - 1, base_ts,
                       max_ts, producer_id, producer_epoch,
                       base_sequence, len(records)) + bytes(blob)


def _frame_batch(base_offset: int, region: bytes, crc: int,
                 partition_leader_epoch: int = 0) -> bytes:
    batch_len = 4 + 1 + 4 + len(region)
    return (struct.pack(">qiibI", base_offset, batch_len,
                        partition_leader_epoch, 2, crc) + region)


def write_kafka_record_batch(records, *, base_offset: int,
                             partition_leader_epoch: int = 0,
                             **kw) -> bytes:
    """Serialize one RecordBatch v2.  ``records`` is a list of
    ``(timestamp_ms, key: bytes|None, value: bytes|None,
    headers: list[(str, bytes)])``."""
    region = _batch_region(records, **kw)
    crc = int(crc32c_many([region])[0])
    return _frame_batch(base_offset, region, crc, partition_leader_epoch)


def control_marker_batch(offset: int, producer_id: int, *,
                         commit: bool, timestamp_ms: int = 0,
                         producer_epoch: int = 0) -> bytes:
    """An end-transaction control batch (abort/commit marker): one
    control record whose key is (version int16, type int16)."""
    key = struct.pack(">hh", 0, 1 if commit else 0)
    return write_kafka_record_batch(
        [(timestamp_ms, key, b"", [])], base_offset=offset,
        producer_id=producer_id, producer_epoch=producer_epoch,
        control=True)


# ---------------------------------------------------------------------------
# Deterministic fixture: the transcript corpus as broker segment logs
# ---------------------------------------------------------------------------

_FIXTURE_PARTITIONS = 4
_SEGMENT_RECORDS = 4096   # roll a new .log every N log entries
_BATCH_RECORDS = 200

def write_kafka_segments_fixture(sf: float,
                                 root: str = "/tmp/beats_ray_fixtures"
                                 ) -> str:
    """Materialize the transcript corpus as broker log dirs
    (``transcripts-<p>/<base offset>.log`` + a ``bundles-0`` topic).
    Deterministic & cached; replayed 1:1 by the kafka oracle SQL:

    - partition   = numeric suffix of conv_id % 4
    - log order   = (conv_id, turn_idx) within the partition, except
      role='system' turns, which are appended at the END of each
      partition inside ABORTED transactions (producer_id=7) — visible
      to read_uncommitted, dropped by read_committed
    - key = conv_id; value = text; timestamp = epoch ms of ts
    - headers = [("turn_idx", n), ("role", role)]
    - committed offsets are therefore dense 0..n-1 in sort order
    - every other committed batch is gzip-compressed
    - topic ``bundles``: one record per conversation, value =
      {"records": [{conv_id, turn_idx, role, text} ...]} — the
      expand_event_list_from_field corpus (azure-fileset shape,
      input.go:279-281)
    """
    import os
    import pathlib
    import shutil

    import pyarrow.parquet as pq

    from ..fixtures import ensure_transcripts

    src_dir = ensure_transcripts(sf, root)
    out = pathlib.Path(root) / f"sf{sf:g}" / "kafka_segments"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    tmp = out.with_name(out.name + f".tmp-{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True, exist_ok=True)

    import glob as _glob
    import pyarrow.compute as pc
    tbl = pa.concat_tables([
        pq.read_table(f, columns=["conv_id", "turn_idx", "role", "text",
                                  "ts"])
        for f in sorted(_glob.glob(src_dir + "/part-*.parquet"))
    ])
    tbl = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    convnum = pc.cast(pc.utf8_slice_codeunits(tbl["conv_id"], 5, 99),
                      pa.int64())
    part_of = pa.array(
        np.asarray(convnum) % _FIXTURE_PARTITIONS, pa.int32())
    epoch_ms = pc.divide(pc.cast(tbl["ts"], pa.int64()), 1000)
    tbl = tbl.append_column("part", part_of).append_column("ts_ms", epoch_ms)

    # Batches are assembled CRC-less; every CRC in the fixture is then
    # computed in ONE vectorized crc32c_many pass (the per-batch scalar
    # path costs ~2.5 ms each — 100x the batched cost).
    pending: list[tuple[str, int, bytes]] = []  # (file, base_offset, region)

    _ctrl_key = struct.pack(">hh", 0, 0)  # version 0, type 0 = ABORT

    def to_rec(r):
        return (r["ts_ms"], r["conv_id"].encode(),
                (r["text"] or "").encode(),
                [("turn_idx", str(r["turn_idx"]).encode()),
                 ("role", r["role"].encode())])

    for p in range(_FIXTURE_PARTITIONS):
        sub = tbl.filter(pc.equal(tbl["part"], p))
        rows = sub.to_pylist()
        normal = [r for r in rows if r["role"] != "system"]
        aborted = [r for r in rows if r["role"] == "system"]
        (tmp / f"transcripts-{p}").mkdir()
        offset = 0
        seg_start = 0

        def emit(region: bytes, n_entries: int):
            nonlocal offset, seg_start
            if offset - seg_start >= _SEGMENT_RECORDS:
                seg_start = offset
            pending.append((
                f"transcripts-{p}/{seg_start:020d}.log", offset, region))
            offset += n_entries

        bi = 0
        for i in range(0, len(normal), _BATCH_RECORDS):
            chunk = normal[i:i + _BATCH_RECORDS]
            emit(_batch_region([to_rec(r) for r in chunk],
                               codec="gzip" if bi % 2 else "none"),
                 len(chunk))
            bi += 1
        # aborted transactions: data batch + ABORT marker per system turn
        for r in aborted:
            emit(_batch_region([to_rec(r)], producer_id=7,
                               producer_epoch=0, base_sequence=offset,
                               transactional=True), 1)
            emit(_batch_region([(r["ts_ms"], _ctrl_key, b"", [])],
                               producer_id=7, producer_epoch=0,
                               control=True), 1)

    # bundles topic: azure-fileset-shaped event lists, one per conv
    (tmp / "bundles-0").mkdir()
    by_conv: dict[str, list[dict]] = {}
    for r in tbl.to_pylist():
        by_conv.setdefault(r["conv_id"], []).append(r)
    offset = 0
    seg_start = 0
    recs = []
    for conv_id in sorted(by_conv):
        turns = by_conv[conv_id]
        val = json.dumps({"records": [
            {"conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
             "role": t["role"], "text": t["text"]} for t in turns
        ]}, separators=(",", ":")).encode()
        recs.append((turns[0]["ts_ms"], conv_id.encode(), val, []))
        if len(recs) == 64:
            if offset - seg_start >= _SEGMENT_RECORDS:
                seg_start = offset
            pending.append((f"bundles-0/{seg_start:020d}.log", offset,
                            _batch_region(recs)))
            offset += len(recs)
            recs = []
    if recs:
        if offset - seg_start >= _SEGMENT_RECORDS:
            seg_start = offset
        pending.append((f"bundles-0/{seg_start:020d}.log", offset,
                        _batch_region(recs)))

    crcs = crc32c_many([r for _f, _o, r in pending])
    files: dict[str, bytearray] = {}
    for (fname, base_off, region), crc in zip(pending, crcs):
        files.setdefault(fname, bytearray()).extend(
            _frame_batch(base_off, region, int(crc)))
    for fname, data in files.items():
        (tmp / fname).write_bytes(bytes(data))

    (tmp / "_DONE").write_text("ok")
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent writer won
    return str(out)
