"""MQTT input — the reference's mqtt input (filebeat/input/mqtt) on
the real MQTT 3.1.1 wire protocol (public OASIS spec), broker-parallel
over Ray Data.

Reference surface: filebeat/input/mqtt/input.go — a paho client
connects, subscribes to the configured topics
(createClientSubscriptions, SubscribeMultiple: one subscription map
filter->qos), and every received message becomes one event
(createOnMessageHandler, input.go:111-135): ``message`` = payload as
string and ``mqtt.{duplicate,message_id,qos,retained,topic}``.  Config
(config.go): hosts, topics (default ``#``), qos, client_id (1-23
chars), username/password, clean_session.

Ray-Data shape: like the redis input, the scale axis is the broker
fan-out — ``read_mqtt`` is ``from_items(addrs)`` through
``map_batches``; each worker owns one full session (CONNECT/CONNACK,
SUBSCRIBE/SUBACK, PUBLISH collection with the QoS1 PUBACK and QoS2
PUBREC/PUBREL/PUBCOMP handshakes) and emits a typed Arrow table when
the broker closes the stream.  For an unbounded live broker the
``SocketListener``-style micro-batch seam applies (SURVEY §2.1): run
the same session under ``max_messages``/deadline per window.

The codec below implements the 3.1.1 packets this flow needs —
CONNECT/CONNACK, SUBSCRIBE/SUBACK, PUBLISH + both QoS handshakes,
DISCONNECT — plus :func:`topic_matches`, the spec 4.7 filter grammar
('+' one level, '#' multi-level tail, '$'-topics hidden from
wildcard-leading filters).  ``ScriptedMqttBroker`` serves a
deterministic message script to every subscriber (filtered by its
subscriptions, efficiently pre-encoded), standing in for a live broker
the way paho's mocked client stands in for one in the reference's
input_test.go.
"""

from __future__ import annotations

import socket
import struct
import threading

import pyarrow as pa

# packet types
CONNECT, CONNACK, PUBLISH, PUBACK, PUBREC, PUBREL, PUBCOMP = range(1, 8)
SUBSCRIBE, SUBACK, UNSUBSCRIBE, UNSUBACK, PINGREQ, PINGRESP, DISCONNECT = \
    range(8, 15)


def _varint(n: int) -> bytes:
    """Remaining-length encoding (spec 2.2.3): 7-bit little groups."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _mstr(s: str | bytes) -> bytes:
    b = s if isinstance(s, bytes) else s.encode()
    return struct.pack(">H", len(b)) + b


def packet(ptype: int, body: bytes, flags: int = 0) -> bytes:
    return bytes([ptype << 4 | flags]) + _varint(len(body)) + body


def connect_packet(client_id: str, *, clean_session: bool = True,
                   username: str = "", password: str = "",
                   keepalive: int = 60) -> bytes:
    flags = (0x02 if clean_session else 0)
    tail = b""
    if username:
        flags |= 0x80
        tail += _mstr(username)
        if password:
            flags |= 0x40
            tail += _mstr(password)
    body = (_mstr("MQTT") + b"\x04" + bytes([flags])
            + struct.pack(">H", keepalive) + _mstr(client_id) + tail)
    return packet(CONNECT, body)


def subscribe_packet(packet_id: int, subs: dict[str, int]) -> bytes:
    body = struct.pack(">H", packet_id)
    for topic, qos in subs.items():
        body += _mstr(topic) + bytes([qos])
    return packet(SUBSCRIBE, body, flags=0x02)


def publish_packet(topic: str, payload: bytes, *, qos: int = 0,
                   retain: bool = False, dup: bool = False,
                   packet_id: int = 0) -> bytes:
    flags = (0x08 if dup else 0) | (qos << 1) | (0x01 if retain else 0)
    body = _mstr(topic)
    if qos > 0:
        body += struct.pack(">H", packet_id)
    return packet(PUBLISH, body + payload, flags=flags)


class _PacketReader:
    """Buffered fixed-header/remaining-length framing off a socket.

    The remaining-length header comes from the PEER and the spec
    allows up to 256 MB, so it is capped (``max_packet``) BEFORE the
    body is buffered — a hostile/broken peer can't make the reader
    allocate its claimed size."""

    def __init__(self, sock: socket.socket, *,
                 max_packet: int = 16 * 1024 * 1024):
        self.sock = sock
        self.buf = b""
        self.max_packet = max_packet

    def _need(self, n: int) -> bool:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                return False
            self.buf += chunk
        return True

    def read(self) -> tuple[int, int, bytes] | None:
        """-> (type, flags, body) or None at EOF."""
        if not self._need(2):
            return None
        length, shift, i = 0, 0, 1
        while True:
            if not self._need(i + 1):
                return None
            b = self.buf[i]
            length |= (b & 0x7F) << shift
            shift += 7
            i += 1
            if not (b & 0x80):
                break
            if shift > 28:
                raise ValueError("malformed remaining length")
        if length > self.max_packet:
            raise ValueError(
                f"packet length {length} exceeds max_packet "
                f"{self.max_packet}")
        if not self._need(i + length):
            return None
        head = self.buf[0]
        body = self.buf[i:i + length]
        self.buf = self.buf[i + length:]
        return head >> 4, head & 0x0F, body


def topic_matches(filt: str, topic: str) -> bool:
    """Spec 4.7 filter match: '+' one level, '#' the rest (must be
    last); topics starting with '$' are hidden from filters whose
    first level is a wildcard (4.7.2)."""
    if topic.startswith("$") and filt[:1] in ("+", "#"):
        return False
    fl, tl = filt.split("/"), topic.split("/")
    for i, f in enumerate(fl):
        if f == "#":
            return i == len(fl) - 1
        if i >= len(tl):
            return False
        if f != "+" and f != tl[i]:
            return False
    return len(fl) == len(tl)


# ---------------------------------------------------------------------------
# Client session (the harvest cycle)

_SCHEMA = pa.schema([
    ("message", pa.string()),
    ("mqtt.duplicate", pa.bool_()),
    ("mqtt.message_id", pa.int64()),
    ("mqtt.qos", pa.int64()),
    ("mqtt.retained", pa.bool_()),
    ("mqtt.topic", pa.string()),
])


class MqttError(Exception):
    pass


def collect_mqtt(host: str, port: int, topics: dict[str, int], *,
                 client_id: str = "filebeat", username: str = "",
                 password: str = "", clean_session: bool = True,
                 max_messages: int | None = None,
                 timeout: float = 60.0) -> pa.Table:
    """One full session: CONNECT/CONNACK, one SUBSCRIBE for the whole
    topic map (the SubscribeMultiple shape, input.go:158-160), then
    collect PUBLISHes — answering QoS1 with PUBACK and QoS2 with the
    PUBREC/PUBREL/PUBCOMP handshake — until the broker closes (or
    ``max_messages``, the micro-batch window bound).  Each message
    maps per createOnMessageHandler (input.go:118-131)."""
    cols: dict[str, list] = {n: [] for n in _SCHEMA.names}
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.settimeout(timeout)
        r = _PacketReader(s)
        s.sendall(connect_packet(client_id, clean_session=clean_session,
                                 username=username, password=password))
        pkt = r.read()
        if pkt is None or pkt[0] != CONNACK:
            raise MqttError("no CONNACK")
        if pkt[2][1] != 0:
            raise MqttError(f"connection refused, return code {pkt[2][1]}")
        s.sendall(subscribe_packet(1, topics))
        pkt = r.read()
        if pkt is None or pkt[0] != SUBACK:
            raise MqttError("no SUBACK")
        if any(rc == 0x80 for rc in pkt[2][2:]):
            raise MqttError("subscription rejected")

        qos2_pending: set[int] = set()
        while True:
            pkt = r.read()
            if pkt is None:
                break  # broker closed: end of stream
            ptype, flags, body = pkt
            if ptype == PUBLISH:
                qos = (flags >> 1) & 0x03
                tlen = struct.unpack(">H", body[:2])[0]
                topic = body[2:2 + tlen].decode()
                off = 2 + tlen
                pid = 0
                if qos > 0:
                    pid = struct.unpack(">H", body[off:off + 2])[0]
                    off += 2
                if qos == 2 and pid in qos2_pending:
                    s.sendall(packet(PUBREC, struct.pack(">H", pid)))
                    continue  # exactly-once: already delivered
                cols["message"].append(
                    body[off:].decode("utf-8", "replace"))
                cols["mqtt.duplicate"].append(bool(flags & 0x08))
                cols["mqtt.message_id"].append(pid)
                cols["mqtt.qos"].append(qos)
                cols["mqtt.retained"].append(bool(flags & 0x01))
                cols["mqtt.topic"].append(topic)
                if qos == 1:
                    s.sendall(packet(PUBACK, struct.pack(">H", pid)))
                elif qos == 2:
                    qos2_pending.add(pid)
                    s.sendall(packet(PUBREC, struct.pack(">H", pid)))
                if max_messages and len(cols["message"]) >= max_messages:
                    s.sendall(packet(DISCONNECT, b""))
                    break
            elif ptype == PUBREL:
                pid = struct.unpack(">H", body[:2])[0]
                qos2_pending.discard(pid)
                s.sendall(packet(PUBCOMP, struct.pack(">H", pid)))
            elif ptype == PINGREQ:
                s.sendall(packet(PINGRESP, b""))
            # SUBACK dups / PINGRESP / anything else: ignore
    return pa.table(
        {n: pa.array(cols[n], _SCHEMA.field(n).type) for n in _SCHEMA.names})


def read_mqtt(addrs: list[dict], topics: dict[str, int] | list[str], *,
              qos: int = 1, client_id: str = "filebeat",
              username: str = "", password: str = "",
              max_messages: int | None = None,
              concurrency: int | None = None):
    """Broker-parallel subscription harvest as a Dataset — one full
    session per broker dict (``{"host", "port"}``), the redis-input
    fan-out shape.  ``topics`` may be a list (uniform ``qos``) or a
    filter->qos map (createClientSubscriptions, input.go:139-149)."""
    import ray.data as rd

    subs = (dict(topics) if isinstance(topics, dict)
            else {t: qos for t in topics})

    def _collect(batch: pa.Table) -> pa.Table:
        tables = [
            collect_mqtt(row["host"], int(row["port"]), subs,
                         client_id=client_id, username=username,
                         password=password, max_messages=max_messages)
            for row in batch.to_pylist()
        ]
        return pa.concat_tables(tables) if tables else _SCHEMA.empty_table()

    ds = rd.from_items([dict(a) for a in addrs])
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(_collect, batch_format="pyarrow", batch_size=1,
                          **kw)


# ---------------------------------------------------------------------------
# Scripted broker (tests / fixtures / oracle stand-in)


class ScriptedMqttBroker:
    """A deterministic localhost 3.1.1 broker: CONNACK (with optional
    password check), SUBACK, then plays one message script —
    ``(topic, payload, qos, retain)`` tuples — to each subscriber,
    filtered by its subscription set, effective qos =
    min(publish qos, granted qos) per spec 3.8.4, packet ids assigned
    1.. per connection in delivery order of qos>0 messages.  After the
    script it half-closes; the subscriber reads EOF as end-of-stream.
    A drainer thread consumes the client's PUBACK/PUBREC/PUBREL flow
    so large scripts never deadlock on the TCP window."""

    def __init__(self, script: list[tuple[str, bytes, int, bool]], *,
                 password: str = ""):
        self._script = list(script)
        self._password = password
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._done = False
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        while not self._done:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._session, args=(conn,),
                             daemon=True).start()

    def _session(self, conn: socket.socket):
        try:
            r = _PacketReader(conn)
            pkt = r.read()
            if pkt is None or pkt[0] != CONNECT:
                return
            # minimal CONNECT parse: flags + optional user/password tail
            body = pkt[2]
            flags = body[7]
            off = 10
            cid_len = struct.unpack(">H", body[off:off + 2])[0]
            off += 2 + cid_len
            if flags & 0x80:
                ulen = struct.unpack(">H", body[off:off + 2])[0]
                off += 2 + ulen
            pw = b""
            if flags & 0x40:
                plen = struct.unpack(">H", body[off:off + 2])[0]
                pw = body[off + 2:off + 2 + plen]
            if self._password and pw.decode() != self._password:
                conn.sendall(packet(CONNACK, b"\x00\x04"))  # bad user/pass
                return
            conn.sendall(packet(CONNACK, b"\x00\x00"))

            pkt = r.read()
            if pkt is None or pkt[0] != SUBSCRIBE:
                return
            body = pkt[2]
            sub_pid = struct.unpack(">H", body[:2])[0]
            subs: dict[str, int] = {}
            off = 2
            while off < len(body):
                ln = struct.unpack(">H", body[off:off + 2])[0]
                topic = body[off + 2:off + 2 + ln].decode()
                subs[topic] = body[off + 2 + ln]
                off += 3 + ln
            conn.sendall(packet(
                SUBACK, struct.pack(">H", sub_pid) + bytes(subs.values())))

            # consume the client's QoS flow so sendall never deadlocks
            stop = threading.Event()

            def drain():
                try:
                    while not stop.is_set():
                        p = r.read()
                        if p is None:
                            return
                        if p[0] == PUBREC:  # qos2 step 2: release
                            conn.sendall(packet(
                                PUBREL, p[2][:2], flags=0x02))
                except OSError:
                    return  # client closed first: benign

            drainer = threading.Thread(target=drain, daemon=True)
            drainer.start()

            next_pid = 1
            out = bytearray()
            for topic, payload, pub_qos, retain in self._script:
                granted = [g for f, g in subs.items()
                           if topic_matches(f, topic)]
                if not granted:
                    continue
                eff = min(pub_qos, max(granted))
                pid = 0
                if eff > 0:
                    pid = next_pid
                    next_pid += 1
                out += publish_packet(topic, payload, qos=eff,
                                      retain=retain, packet_id=pid)
                if len(out) >= 1 << 20:
                    conn.sendall(out)
                    out.clear()
            conn.sendall(out)
            try:
                conn.shutdown(socket.SHUT_WR)  # end-of-stream to client
            except OSError:
                pass
            drainer.join(timeout=30)
            stop.set()
        except (OSError, ValueError, struct.error):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def close(self):
        self._done = True
        try:
            self._srv.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Deterministic fixture: the transcript corpus as an mqtt message flow

_FIXTURE_BROKERS = 4


def scripted_mqtt_messages(sf: float, root: str = "/tmp/beats_ray_fixtures"
                           ) -> list[list[tuple[str, bytes, int, bool]]]:
    """Per-broker message scripts derived 1:1 from the transcript
    corpus (turns with ``turn_idx % 4 == 0``), replayed by the oracle
    SQL in ``__ray_entry__.oracle_sql``:

    - broker  = numeric conv_id suffix % 4
    - order   = (conv_id, turn_idx) per broker
    - topic   = ``conv/<conv_id>/<role>``; payload = text (UTF-8)
    - publish qos = turn_idx % 3 (QoS1 subscribers see min(qos, 1))
    - retain  = (turn_idx == 0)
    """
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import numpy as np

    from ..fixtures import ensure_transcripts

    src = ensure_transcripts(sf, root)
    tbl = pa.concat_tables([
        pq.read_table(f, columns=["conv_id", "turn_idx", "role", "text"])
        for f in sorted(glob.glob(src + "/part-*.parquet"))
    ])
    tbl = tbl.filter(pc.equal(pc.bit_wise_and(
        pc.cast(tbl["turn_idx"], pa.int64()), 3), 0))
    tbl = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    broker = np.asarray(pc.cast(
        pc.utf8_slice_codeunits(tbl["conv_id"], 5, 99), pa.int64())) \
        % _FIXTURE_BROKERS
    conv = tbl["conv_id"].to_pylist()
    role = tbl["role"].to_pylist()
    text = tbl["text"].to_pylist()
    turn = tbl["turn_idx"].to_pylist()
    scripts: list[list] = [[] for _ in range(_FIXTURE_BROKERS)]
    for i in range(len(conv)):
        scripts[int(broker[i])].append((
            f"conv/{conv[i]}/{role[i]}",
            (text[i] or "").encode(),
            int(turn[i]) % 3,
            int(turn[i]) == 0,
        ))
    return scripts


def start_scripted_mqtt(sf: float, root: str = "/tmp/beats_ray_fixtures"
                        ) -> tuple[list["ScriptedMqttBroker"], list[dict]]:
    """Spin the 4-broker scripted fleet for the fixture corpus."""
    brokers, addrs = [], []
    for script in scripted_mqtt_messages(sf, root):
        b = ScriptedMqttBroker(script)
        brokers.append(b)
        addrs.append({"host": "127.0.0.1", "port": b.port})
    return brokers, addrs
