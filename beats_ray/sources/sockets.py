"""Socket inputs — filebeat's tcp/udp/unix/syslog-socket servers as
actor-hosted listeners draining into Datasets.

Reference surface: filebeat/inputsource/tcp (config.go: timeout,
max_message_size), inputsource/udp, inputsource/unix, with framing from
inputsource/common/streaming (scan.go: delimiter split and RFC6587
octet-counting) and the per-remote metadata field ``log.source.address``.
The syslog input is the socket listener composed with the existing
``syslog`` processor (format auto: RFC3164 + RFC5424), exactly the
reference's input/syslog layering.

Ray-Data shape: the LISTENER is the one genuinely stateful, push-driven
piece, so it is a raw Ray actor (``num_cpus=0`` — it blocks on accept,
not compute); everything downstream is the ordinary batch pipeline. A
``drain()`` call snapshots-and-clears the buffer as one Arrow table;
``drain_to_dataset`` wraps it for the micro-batch loop (the
MicroBatchRunner seam SURVEY §2.1 names). At scale: one listener actor
per node/port behind the site's load balancer, each drained
independently per window — no cross-actor coordination, and the buffer
cap applies real TCP backpressure (the reader thread stops pulling from
the socket, the kernel window closes, the sender blocks) instead of
dropping. UDP, per its semantics, drops-and-counts when the buffer is
full.

Durability (``wal_dir=``): the diskqueue analogue
(libbeat/publisher/queue/diskqueue) — accepted messages append to an
on-disk segment BEFORE counting as received, ``drain`` seals the
segment, and ``ack_drained`` deletes it only after the caller has
durably written the window downstream. A listener crash re-delivers
every un-acked message on restart: at-least-once, matching the
reference's guaranteed-send contract (its ACK chain truncates the disk
queue only after the output confirms the batch).
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time

import pyarrow as pa
import ray


def _now_us() -> int:
    return time.time_ns() // 1_000


class _Wal:
    """Write-ahead log for the listener buffer — the diskqueue analogue
    (libbeat/publisher/queue/diskqueue/queue.go:43-80): every accepted
    message is appended to the current segment BEFORE it counts as
    received; ``drain`` seals the segment and hands its epoch to the
    caller; ``ack(epoch)`` deletes sealed segments once the drained
    window is durably written downstream — at-least-once across a
    listener crash (un-acked segments are re-read into the buffer on
    restart, so a crash between drain and downstream write re-delivers,
    never loses). Record: u32 text len + bytes, u16 addr len + bytes,
    i64 recv_us. Appends are buffered through the OS file cache (same
    stance as the reference's writer; pass fsync=True to harden against
    host crashes too)."""

    def __init__(self, wal_dir: str, fsync: bool = False):
        self.dir = wal_dir
        self.fsync = fsync
        os.makedirs(wal_dir, exist_ok=True)
        existing = sorted(
            int(f[4:-4]) for f in os.listdir(wal_dir)
            if f.startswith("seg-") and f.endswith(".wal")
        )
        self.epoch = (existing[-1] + 1) if existing else 0
        self._f = None
        self._io_lock = threading.Lock()

    def _path(self, epoch: int) -> str:
        return os.path.join(self.dir, f"seg-{epoch:08d}.wal")

    def recover(self) -> list[tuple[str, str, int]]:
        """Read every un-acked segment (oldest first) → records."""
        out = []
        for name in sorted(os.listdir(self.dir)):
            if not (name.startswith("seg-") and name.endswith(".wal")):
                continue
            with open(os.path.join(self.dir, name), "rb") as f:
                data = f.read()
            pos = 0
            while pos + 4 <= len(data):
                (tl,) = struct.unpack_from("<I", data, pos)
                p = pos + 4
                if p + tl + 2 > len(data):
                    break  # torn tail record (crash mid-append): drop
                text = data[p: p + tl].decode("utf-8", "replace")
                p += tl
                (al,) = struct.unpack_from("<H", data, p)
                p += 2
                if p + al + 8 > len(data):
                    break
                addr = data[p: p + al].decode("utf-8", "replace")
                (ts,) = struct.unpack_from("<q", data, p + al)
                out.append((text, addr, ts))
                pos = p + al + 8
        return out

    def append(self, text: str, addr: str, ts: int) -> None:
        tb, ab = text.encode(), addr.encode()
        rec = (struct.pack("<I", len(tb)) + tb
               + struct.pack("<H", len(ab)) + ab + struct.pack("<q", ts))
        with self._io_lock:
            if self._f is None:
                self._f = open(self._path(self.epoch), "ab")
            self._f.write(rec)
            # flush PER RECORD: "received ⇒ on disk" is the contract a
            # raw socket needs (there is no producer-ack channel to
            # defer durability through, unlike the reference's queue
            # producer callbacks). Measured cost on 37-byte messages:
            # ~2× vs no WAL (tools/scale_probe.py socket_wal) — real
            # log lines are 5-30× larger, shrinking the relative tax.
            # fsync=True additionally hardens against HOST crashes.
            self._f.flush()
            if self.fsync:
                os.fsync(self._f.fileno())

    def seal(self) -> int:
        """Close the current segment (flushing any buffered tail);
        subsequent appends open the next. Returns the sealed epoch
        (the ack handle for this drain)."""
        with self._io_lock:
            sealed = self.epoch
            if self._f is not None:
                self._f.close()
                self._f = None
            self.epoch += 1
            return sealed

    def ack(self, up_to_epoch: int) -> int:
        """Delete sealed segments ≤ epoch; returns how many."""
        n = 0
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("seg-") and name.endswith(".wal"):
                if int(name[4:-4]) <= up_to_epoch:
                    os.unlink(os.path.join(self.dir, name))
                    n += 1
        return n


class _Buffer:
    """Bounded line buffer shared between reader threads and drain().
    With a ``wal``, every accepted message is appended to the log
    before it counts as received (persist-then-ack ordering)."""

    def __init__(self, cap: int, wal: _Wal | None = None):
        self.cap = cap
        self.lock = threading.Lock()
        self.wal = wal
        self.texts: list[str] = []
        self.addrs: list[str] = []
        self.ts: list[int] = []
        self.received = 0
        self.dropped = 0
        self.truncated = 0
        if wal is not None:
            for text, addr, ts in wal.recover():
                self.texts.append(text)
                self.addrs.append(addr)
                self.ts.append(ts)

    def put(self, text: str, addr: str, *, block: bool) -> None:
        while True:
            with self.lock:
                if len(self.texts) < self.cap:
                    ts = _now_us()
                    if self.wal is not None:
                        self.wal.append(text, addr, ts)
                    self.texts.append(text)
                    self.addrs.append(addr)
                    self.ts.append(ts)
                    self.received += 1
                    return
                if not block:
                    self.dropped += 1  # UDP semantics: full buffer drops
                    return
            time.sleep(0.005)  # TCP semantics: stall the reader →
            # kernel window closes → sender blocks (backpressure)

    def drain(self) -> tuple[pa.Table, int]:
        """Snapshot-and-clear → (table, sealed WAL epoch). The epoch is
        the ack handle: pass it to ``ack`` once the drained window is
        durably written downstream (-1 when no WAL is configured)."""
        with self.lock:
            t = pa.table({
                "text": pa.array(self.texts, pa.string()),
                "log.source.address": pa.array(self.addrs, pa.string()),
                "recv_us": pa.array(self.ts, pa.int64()),
            })
            self.texts, self.addrs, self.ts = [], [], []
            epoch = self.wal.seal() if self.wal is not None else -1
            return t, epoch


def _frame_stream(buf: _Buffer, conn, addr: str, delimiter: bytes,
                  framing: str, max_message_size: int) -> None:
    """Read a stream connection to EOF, splitting into messages.
    ``delimiter`` framing mirrors streaming/scan.go FactoryDelimiter;
    ``rfc6587`` handles both octet counting ("123 <bytes>") and
    non-transparent (delimiter) framing per message, like
    FactoryRFC6587Framing. Over-long messages are truncated + counted,
    never dropped (the engine's tag-don't-drop rule)."""
    pending = b""
    skip = 0  # remaining bytes of an over-long counted frame to discard
    # True while discarding the tail of an over-long DELIMITED message:
    # its truncated head was already emitted, so bytes are dropped until
    # the next delimiter re-synchronizes the stream
    discard_to_delim = False
    while True:
        try:
            chunk = conn.recv(65536)
        except OSError:
            break
        if not chunk:
            break
        pending += chunk
        if skip:
            drop = min(skip, len(pending))
            pending = pending[drop:]
            skip -= drop
            if skip:
                continue
        while True:
            if discard_to_delim:
                j = pending.find(delimiter)
                if j < 0:
                    # keep only enough tail to catch a delimiter split
                    # across chunk boundaries — the buffer stays O(1)
                    pending = (pending[-(len(delimiter) - 1):]
                               if len(delimiter) > 1 else b"")
                    break
                pending = pending[j + len(delimiter):]
                discard_to_delim = False
            # RFC6587 octet counting applies iff the frame starts with
            # a 1-10 digit length and a space ("123 <bytes>"); anything
            # else uses non-transparent (delimiter) framing — both may
            # interleave on one connection per the RFC
            use_octet = False
            if framing == "rfc6587" and pending[:1].isdigit():
                sp = pending.find(b" ", 0, 11)
                if sp > 0 and pending[:sp].isdigit():
                    use_octet = True
                elif (sp < 0 and len(pending) <= 11
                      and pending.find(delimiter) < 0):
                    break  # can't tell the framing yet — wait for bytes
            if use_octet:
                n = int(pending[:sp])
                if len(pending) < sp + 1 + n:
                    if (n > max_message_size
                            and len(pending) >= sp + 1 + max_message_size):
                        # over-long counted frame: don't buffer n bytes
                        # (a hostile "9999999999 " header would exhaust
                        # memory) — emit the truncated head now and
                        # discard the remainder as it streams in
                        msg = pending[sp + 1: sp + 1 + max_message_size]
                        skip = n - (len(pending) - (sp + 1))
                        pending = b""
                        with buf.lock:
                            buf.truncated += 1
                        buf.put(msg.decode("utf-8", "replace"), addr,
                                block=True)
                    break  # wait for the full counted frame
                msg = pending[sp + 1: sp + 1 + n]
                pending = pending[sp + 1 + n:]
            else:
                i = pending.find(delimiter)
                if i < 0:
                    if len(pending) > max_message_size:
                        # delimiter-less flood: cap the buffer exactly
                        # like the over-long counted path — emit the
                        # truncated head now, discard until the next
                        # delimiter (filebeat's line scanner caps its
                        # buffer at max_message_size the same way)
                        with buf.lock:
                            buf.truncated += 1
                        buf.put(
                            pending[:max_message_size].decode(
                                "utf-8", "replace"),
                            addr, block=True)
                        pending = b""
                        discard_to_delim = True
                    break
                msg = pending[:i]
                pending = pending[i + len(delimiter):]
            if len(msg) > max_message_size:
                msg = msg[:max_message_size]
                with buf.lock:
                    buf.truncated += 1
            buf.put(msg.decode("utf-8", "replace"), addr, block=True)
    if pending and not discard_to_delim:
        # EOF flushes a trailing unterminated message (a discard tail is
        # the remainder of an already-emitted truncated message)
        buf.put(pending[:max_message_size].decode("utf-8", "replace"),
                addr, block=True)
    try:
        conn.close()
    except OSError:
        pass


@ray.remote(num_cpus=0)
class SocketListener:
    """One network listener = one actor (num_cpus=0: it blocks on
    accept/recv, not compute). proto: "tcp" | "udp" | "unix". Port 0
    binds an ephemeral port — read it back via ``address()``."""

    def __init__(self, proto: str = "tcp", host: str = "127.0.0.1",
                 port: int = 0, path: str | None = None,
                 line_delimiter: str = "\n", framing: str = "delimiter",
                 max_message_size: int = 20 * 1024 * 1024,
                 max_buffer: int = 1_000_000,
                 wal_dir: str | None = None, wal_fsync: bool = False,
                 ssl_certfile: str | None = None,
                 ssl_keyfile: str | None = None):
        if framing not in ("delimiter", "rfc6587"):
            raise ValueError(f"unknown framing {framing!r}")
        self.proto = proto
        self._ssl = None
        if ssl_certfile:
            # filebeat tcp input `ssl:` parity (inputsource/tcp +
            # libbeat/common/transport/tlscommon): TLS server on the
            # stream listener; handshake runs on the per-connection
            # thread so a slow client never blocks accept
            import ssl as _sslmod

            if proto != "tcp":
                raise ValueError("ssl is supported on tcp listeners only")
            self._ssl = _sslmod.SSLContext(_sslmod.PROTOCOL_TLS_SERVER)
            self._ssl.load_cert_chain(ssl_certfile, ssl_keyfile)
        wal = _Wal(wal_dir, fsync=wal_fsync) if wal_dir else None
        self.buf = _Buffer(max_buffer, wal=wal)
        self._sealed = -1  # last drained-but-unacked WAL epoch
        self.delim = line_delimiter.encode()
        self.framing = framing
        self.max_msg = max_message_size
        self._closing = False
        if proto == "tcp":
            self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self.sock.bind((host, port))
            self.sock.listen(64)
            self.addr = self.sock.getsockname()
            target = self._accept_loop
        elif proto == "unix":
            self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self.sock.bind(path)
            self.sock.listen(64)
            self.addr = (path, 0)
            self._unix_path = path
            target = self._accept_loop
        elif proto == "udp":
            self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            self.sock.bind((host, port))
            self.addr = self.sock.getsockname()
            target = self._udp_loop
        else:
            raise ValueError(f"unknown proto {proto!r}")
        self._thread = threading.Thread(target=target, daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        while not self._closing:
            try:
                conn, peer = self.sock.accept()
            except OSError:
                break
            addr = (f"{peer[0]}:{peer[1]}" if isinstance(peer, tuple)
                    else str(self.addr[0]))
            threading.Thread(
                target=self._serve_conn, args=(conn, addr), daemon=True,
            ).start()

    def _serve_conn(self, conn, addr: str) -> None:
        if self._ssl is not None:
            try:
                conn = self._ssl.wrap_socket(conn, server_side=True)
            except (OSError, ValueError):
                # failed handshake (plaintext client, bad cipher):
                # count and drop the CONNECTION, never the listener
                with self.buf.lock:
                    self.buf.dropped += 1
                try:
                    conn.close()
                except OSError:
                    pass
                return
        _frame_stream(self.buf, conn, addr, self.delim, self.framing,
                      self.max_msg)

    def _udp_loop(self) -> None:
        while not self._closing:
            try:
                data, peer = self.sock.recvfrom(65536)
            except OSError:
                break
            if len(data) > self.max_msg:
                data = data[: self.max_msg]
                with self.buf.lock:
                    self.buf.truncated += 1
            # one message per datagram (inputsource/udp) — UDP drops
            # when the buffer is full rather than blocking the loop
            self.buf.put(data.decode("utf-8", "replace"),
                         f"{peer[0]}:{peer[1]}", block=False)

    def address(self) -> tuple[str, int]:
        return (str(self.addr[0]), int(self.addr[1]))

    def pending(self) -> int:
        with self.buf.lock:
            return len(self.buf.texts)

    def drain(self) -> pa.Table:
        """Snapshot-and-clear the buffer. With a WAL configured this
        seals the covering segment(s); call ``ack_drained()`` after the
        drained window is durably written downstream — un-acked
        segments re-deliver on restart (at-least-once, the reference's
        guaranteed-send contract)."""
        t, epoch = self.buf.drain()
        if epoch >= 0:
            self._sealed = max(self._sealed, epoch)
        return t

    def ack_drained(self) -> int:
        """Delete WAL segments covered by the last drain; returns how
        many segment files were removed (0 when no WAL)."""
        if self.buf.wal is None or self._sealed < 0:
            return 0
        return self.buf.wal.ack(self._sealed)

    def stats(self) -> dict:
        with self.buf.lock:
            return {"received": self.buf.received,
                    "dropped": self.buf.dropped,
                    "truncated": self.buf.truncated,
                    "buffered": len(self.buf.texts)}

    def close(self) -> None:
        self._closing = True
        try:
            self.sock.close()
        except OSError:
            pass
        # a unix socket leaves its filesystem node behind; without the
        # unlink a restarted listener on the same path (the WAL crash-
        # recovery flow) fails with EADDRINUSE
        path = getattr(self, "_unix_path", None)
        if path is not None:
            try:
                os.unlink(path)
            except OSError:
                pass


def drain_to_dataset(listener, max_bytes: int = 10 * 1024 * 1024):
    """One micro-batch drain → line Dataset through the same
    StripNewline/LimitReader chain as the file sources (so socket rows
    carry the identical truncated-flag semantics). Driver holds only
    the drained window, exactly like a window's worth of file rows."""
    import ray.data as rd

    from .readers import line_reader_chain

    table = ray.get(listener.drain.remote())
    return line_reader_chain(rd.from_arrow(table), max_bytes=max_bytes)


def drain_window_to_parquet(listener, out_dir: str, window_id: int,
                            max_bytes: int = 10 * 1024 * 1024) -> int:
    """One micro-batch window, crash-ordered: drain → line chain →
    write the window's parquet partition → ONLY THEN ack the WAL.
    A crash anywhere before the ack re-delivers the window's messages
    on restart (at-least-once — the reference's guaranteed-send
    contract); re-delivered rows land in a later window, so pair the
    output with the fingerprint→_id dedup sink for exactly-once
    EFFECT, exactly as the reference pairs its disk queue with
    Elasticsearch create-mode dedup. Returns rows written."""
    import os as _os

    ds = drain_to_dataset(listener, max_bytes=max_bytes).materialize()
    part = _os.path.join(out_dir, f"window-{window_id:06d}")
    n = ds.count()
    if n:
        ds.write_parquet(part)
    ray.get(listener.ack_drained.remote())
    return n


def read_syslog_socket(listener, max_bytes: int = 10 * 1024 * 1024):
    """Syslog-over-socket input: drain + the ``syslog`` processor
    (RFC3164/RFC5424 auto) — the reference's input/syslog layering over
    the tcp/udp listeners."""
    from ..processors import build_processor

    proc = build_processor({"syslog": {}})
    return drain_to_dataset(listener, max_bytes=max_bytes).map_batches(
        proc, batch_format="pyarrow"
    )
