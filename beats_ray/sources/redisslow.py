"""Redis slowlog input — the reference's experimental redis input
(filebeat/input/redis) re-expressed host-parallel over Ray Data.

Reference surface: filebeat/input/redis/harvester.go — one harvester
per host pipelines ``SLOWLOG GET`` + ``SLOWLOG RESET`` + ``ROLE`` on a
single connection (harvester.go:117-135: Send x3, Flush, then three
Receives in order), scans each slowlog entry (4 fields on redis < 6.0,
6 fields — clientAddr/clientName appended — on >= 6.0,
harvester.go:169-176), splits args into cmd/key/rest
(harvester.go:179-188) and emits one event per entry
(harvester.go:190-227): ``message`` = args joined by spaces,
``redis.slowlog.{id,cmd,key,duration.us,role}`` always,
``clientAddr``/``clientName`` only when non-empty, ``args`` only when
more than two were given, ``@timestamp`` = the entry's unix-second
timestamp.  Config (config.go): hosts, network tcp, username/password
(AUTH), maxconn.

Ray-Data shape: a SLOWLOG is a small bounded buffer per host
(slowlog-max-len, default 128), so the scale axis is *hosts*, not
entries — ``read_redis_slowlog`` is ``from_items(addrs)`` fanned out
through ``map_batches``; each worker owns the whole
connect/pipeline/scan cycle for its batch of hosts and emits a typed
Arrow table.  10k hosts harvest as ~10k independent tasks with no
shared state; the RESET in the pipeline makes each poll cycle
exactly-once per entry on the server side (the reference's own
contract — entries arriving between GET and RESET are lost there too,
harvester.go:154 comment).

The wire protocol is RESP2 (the public REdis Serialization Protocol:
``+simple`` ``-error`` ``:int`` ``$bulk`` ``*array``), implemented
here directly — both the client side used by the harvester and a
scripted in-process server (`ScriptedRedisServer`) that serves a
deterministic slowlog for tests, fixtures and the DuckDB oracle
replay, standing in for a live redis exactly like the reference's
mocked-conn unit tests (input_test.go) stand in for theirs.
"""

from __future__ import annotations

import socket
import threading

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# RESP2 codec


class RespError(Exception):
    """A ``-ERR ...`` reply."""


class Simple(str):
    """Marker: encode as a RESP simple string (``+OK``) not a bulk."""


def encode_command(*args) -> bytes:
    """Client->server: every command is an array of bulk strings."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode()
        out.append(b"$%d\r\n%s\r\n" % (len(b), b))
    return b"".join(out)


def encode_reply(v) -> bytes:
    """Server->client encoding for the value shapes the slowlog
    exchange uses: ints, bulk strings, nested arrays, nil, +simple."""
    if isinstance(v, Simple):
        return b"+%s\r\n" % v.encode()
    if isinstance(v, RespError):
        return b"-%s\r\n" % str(v).encode()
    if isinstance(v, bool):  # before int: bool is an int subclass
        raise TypeError("RESP2 has no boolean")
    if isinstance(v, (int, np.integer)):
        return b":%d\r\n" % int(v)
    if v is None:
        return b"$-1\r\n"
    if isinstance(v, (bytes, str)):
        b = v if isinstance(v, bytes) else v.encode()
        return b"$%d\r\n%s\r\n" % (len(b), b)
    if isinstance(v, (list, tuple)):
        return b"*%d\r\n" % len(v) + b"".join(encode_reply(x) for x in v)
    raise TypeError(f"unencodable RESP value {type(v)}")


class _Reader:
    """Buffered RESP value reader over a socket.

    Length headers come from the PEER, so both are capped before any
    allocation (the hostile-header class the RFC6587 socket fix
    covered): ``max_bulk`` defaults to redis's own proto-max-bulk-len
    (512 MB) and ``max_array`` far above any real SLOWLOG."""

    def __init__(self, sock: socket.socket, *,
                 max_bulk: int = 512 * 1024 * 1024,
                 max_array: int = 1 << 20):
        self.f = sock.makefile("rb")
        self.max_bulk = max_bulk
        self.max_array = max_array

    def _line(self) -> bytes:
        ln = self.f.readline()
        if not ln.endswith(b"\r\n"):
            raise ConnectionError("RESP stream closed mid-line")
        return ln[:-2]

    def read(self):
        ln = self._line()
        t, rest = ln[:1], ln[1:]
        if t == b"+":
            return rest.decode()
        if t == b"-":
            raise RespError(rest.decode())
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            if n == -1:
                return None
            if n > self.max_bulk:
                raise RespError(f"bulk length {n} exceeds max_bulk")
            body = self.f.read(n + 2)
            if len(body) != n + 2:
                raise ConnectionError("RESP stream closed mid-bulk")
            return body[:-2]
        if t == b"*":
            n = int(rest)
            if n == -1:
                return None
            if n > self.max_array:
                raise RespError(f"array length {n} exceeds max_array")
            return [self.read() for _ in range(n)]
        raise RespError(f"unknown RESP type byte {t!r}")


# ---------------------------------------------------------------------------
# Harvester (client side)

_SCHEMA = pa.schema([
    ("host", pa.string()),
    ("message", pa.string()),
    ("ts", pa.timestamp("us")),
    ("redis.slowlog.id", pa.int64()),
    ("redis.slowlog.cmd", pa.string()),
    ("redis.slowlog.key", pa.string()),
    ("redis.slowlog.duration.us", pa.int64()),
    ("redis.slowlog.role", pa.string()),
    ("redis.slowlog.clientAddr", pa.string()),
    ("redis.slowlog.clientName", pa.string()),
    ("redis.slowlog.args", pa.list_(pa.string())),
])


def harvest_slowlog(host: str, port: int, *, name: str | None = None,
                    username: str = "", password: str = "",
                    timeout: float = 30.0) -> pa.Table:
    """One reference harvest cycle against one host: AUTH if
    configured, then SLOWLOG GET + SLOWLOG RESET + ROLE pipelined in a
    single write (harvester.go:117-135), replies read in order, every
    entry mapped to an event row (harvester.go:160-227)."""
    label = name if name is not None else f"{host}:{port}"
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.settimeout(timeout)
        r = _Reader(s)
        if password:
            s.sendall(encode_command("AUTH", username, password)
                      if username else encode_command("AUTH", password))
            r.read()  # +OK or raises RespError like redigo's Dial
        s.sendall(encode_command("SLOWLOG", "GET")
                  + encode_command("SLOWLOG", "RESET")
                  + encode_command("ROLE"))
        entries = r.read()
        r.read()                      # SLOWLOG RESET -> +OK
        role_reply = r.read()         # ROLE -> array, [0] = role name
        role = role_reply[0]
        role = role.decode() if isinstance(role, bytes) else str(role)

    cols: dict[str, list] = {name_: [] for name_ in _SCHEMA.names}
    for entry in entries or []:
        # redis < 6.0: [id, ts, dur, args]; >= 6.0 adds addr, name
        if not isinstance(entry, list) or len(entry) < 4:
            continue  # skip like harvester.go:166 on scan error
        eid, ets, edur, eargs = entry[0], entry[1], entry[2], entry[3]
        args = [a.decode() if isinstance(a, bytes) else str(a)
                for a in (eargs or [])]
        addr = cname = None
        if len(entry) >= 6:
            addr = entry[4].decode() if entry[4] else None
            cname = entry[5].decode() if entry[5] else None
        cols["host"].append(label)
        cols["message"].append(" ".join(args))
        cols["ts"].append(int(ets) * 1_000_000)
        cols["redis.slowlog.id"].append(int(eid))
        cols["redis.slowlog.cmd"].append(args[0] if len(args) > 0 else "")
        cols["redis.slowlog.key"].append(args[1] if len(args) > 1 else "")
        cols["redis.slowlog.duration.us"].append(int(edur))
        cols["redis.slowlog.role"].append(role)
        # only when non-empty, harvester.go:205-210
        cols["redis.slowlog.clientAddr"].append(addr or None)
        cols["redis.slowlog.clientName"].append(cname or None)
        # only beyond cmd+key, harvester.go:212-214
        cols["redis.slowlog.args"].append(args[2:] if len(args) > 2
                                          else None)
    return pa.table(
        {n: pa.array(cols[n], _SCHEMA.field(n).type) for n in _SCHEMA.names})


def read_redis_slowlog(addrs: list[dict], *, username: str = "",
                       password: str = "", concurrency: int | None = None):
    """Host-parallel slowlog harvest as a Dataset.

    ``addrs``: one dict per host — ``{"host", "port"}`` plus an
    optional stable ``"name"`` label (defaults to host:port) that
    becomes the ``host`` column.  Each worker batch runs the full
    connect/pipeline/scan cycle for its hosts; at fleet scale this is
    the whole input — thousands of independent single-connection
    tasks, nothing shared, nothing driver-side.
    """
    import ray.data as rd

    def _harvest(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            tables.append(harvest_slowlog(
                row["host"], int(row["port"]),
                name=row.get("name"), username=username,
                password=password))
        return (pa.concat_tables(tables) if tables
                else _SCHEMA.empty_table())

    ds = rd.from_items([dict(a) for a in addrs])
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(_harvest, batch_format="pyarrow", batch_size=1,
                          **kw)


# ---------------------------------------------------------------------------
# Scripted server (tests / fixtures / oracle stand-in)


class ScriptedRedisServer:
    """A deterministic localhost RESP2 server holding one slowlog
    script: enough of the command surface for the harvest cycle (AUTH,
    PING, SLOWLOG GET/RESET/LEN, ROLE, QUIT).  GET returns newest-first
    like redis; RESET clears, so a second harvest cycle sees an empty
    log — the reference's poll-cycle contract."""

    def __init__(self, entries: list[list], *, role: str = "master",
                 password: str = ""):
        self._lock = threading.Lock()
        self._entries = list(entries)
        self._role = role
        self._password = password
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._done = False
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    def _role_reply(self):
        if self._role == "master":
            return ["master", 1000, [["10.0.0.2", "6379", "1000"]]]
        return ["slave", "10.0.0.1", 6379, "connected", 1000]

    def _serve(self):
        while not self._done:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._client, args=(conn,),
                             daemon=True).start()

    def _client(self, conn: socket.socket):
        authed = not self._password
        try:
            r = _Reader(conn)
            while True:
                try:
                    cmd = r.read()
                except (ConnectionError, OSError):
                    return
                if not isinstance(cmd, list) or not cmd:
                    conn.sendall(encode_reply(RespError("ERR protocol")))
                    continue
                name = cmd[0].decode().upper()
                sub = cmd[1].decode().upper() if len(cmd) > 1 else ""
                if name == "AUTH":
                    pw = cmd[-1].decode()
                    if pw == self._password:
                        authed = True
                        conn.sendall(encode_reply(Simple("OK")))
                    else:
                        conn.sendall(encode_reply(
                            RespError("WRONGPASS invalid password")))
                    continue
                if not authed:
                    conn.sendall(encode_reply(
                        RespError("NOAUTH Authentication required.")))
                    continue
                if name == "PING":
                    conn.sendall(encode_reply(Simple("PONG")))
                elif name == "SLOWLOG" and sub == "GET":
                    with self._lock:
                        newest_first = list(reversed(self._entries))
                    conn.sendall(encode_reply(newest_first))
                elif name == "SLOWLOG" and sub == "RESET":
                    with self._lock:
                        self._entries = []
                    conn.sendall(encode_reply(Simple("OK")))
                elif name == "SLOWLOG" and sub == "LEN":
                    with self._lock:
                        conn.sendall(encode_reply(len(self._entries)))
                elif name == "ROLE":
                    conn.sendall(encode_reply(self._role_reply()))
                elif name == "QUIT":
                    conn.sendall(encode_reply(Simple("OK")))
                    return
                else:
                    conn.sendall(encode_reply(
                        RespError(f"ERR unknown command '{name}'")))
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
# Deterministic fixture: a slowlog derived from the transcript corpus

_FIXTURE_HOSTS = 4


def scripted_slowlog_entries(sf: float,
                             root: str = "/tmp/beats_ray_fixtures"
                             ) -> list[list[list]]:
    """Per-host slowlog scripts derived 1:1 from the transcript corpus
    (every turn with ``turn_idx % 8 == 0``), replayed by the oracle SQL
    in ``__ray_entry__.oracle_sql``:

    - host        = numeric conv_id suffix % 4
    - id          = 0-based rank in (conv_id, turn_idx) order per host
    - timestamp   = epoch seconds of ts
    - duration us = length(text) * 10 + turn_idx
    - args        = [cmd, conv_id, str(turn_idx)] with cmd =
      upper(tool) when tool != 'none' else 'GET'
    - hosts 0-1 serve 6-field (redis >= 6.0) entries with clientAddr =
      10.0.0.(convnum % 200 + 1):(40000 + turn_idx) and clientName =
      role; hosts 2-3 serve the 4-field pre-6.0 shape
    - host 0 replicates as master, hosts 1-3 as slaves
    """
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..fixtures import ensure_transcripts

    src = ensure_transcripts(sf, root)
    tbl = pa.concat_tables([
        pq.read_table(f, columns=["conv_id", "turn_idx", "role", "text",
                                  "tool", "ts"])
        for f in sorted(glob.glob(src + "/part-*.parquet"))
    ])
    tbl = tbl.filter(pc.equal(pc.bit_wise_and(
        pc.cast(tbl["turn_idx"], pa.int64()), 7), 0))
    tbl = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    convnum = np.asarray(pc.cast(
        pc.utf8_slice_codeunits(tbl["conv_id"], 5, 99), pa.int64()))
    hosts = convnum % _FIXTURE_HOSTS
    epoch_s = np.asarray(pc.cast(tbl["ts"], pa.int64())) // 1_000_000
    turn = np.asarray(pc.cast(tbl["turn_idx"], pa.int64()))
    text_len = np.asarray(pc.utf8_length(tbl["text"]), dtype=np.int64)
    dur = text_len * 10 + turn
    conv = tbl["conv_id"].to_pylist()
    role = tbl["role"].to_pylist()
    tool = tbl["tool"].to_pylist()

    scripts: list[list[list]] = [[] for _ in range(_FIXTURE_HOSTS)]
    for i in range(len(conv)):
        h = int(hosts[i])
        cmd = tool[i].upper() if tool[i] != "none" else "GET"
        entry = [len(scripts[h]), int(epoch_s[i]), int(dur[i]),
                 [cmd, conv[i], str(turn[i])]]
        if h < 2:  # redis >= 6.0 shape
            entry += [f"10.0.0.{int(convnum[i]) % 200 + 1}"
                      f":{40000 + int(turn[i])}", role[i]]
        scripts[h].append(entry)
    return scripts


def start_scripted_redis(sf: float, root: str = "/tmp/beats_ray_fixtures"
                         ) -> tuple[list["ScriptedRedisServer"],
                                    list[dict]]:
    """Spin the 4-host scripted fleet for the fixture corpus; returns
    (servers, addrs) where addrs feed ``read_redis_slowlog`` and use
    the stable labels ``redis-0..3`` the oracle SQL replays."""
    servers, addrs = [], []
    for h, entries in enumerate(scripted_slowlog_entries(sf, root)):
        srv = ScriptedRedisServer(
            entries, role="master" if h == 0 else "slave")
        servers.append(srv)
        addrs.append({"host": "127.0.0.1", "port": srv.port,
                      "name": f"redis-{h}"})
    return servers, addrs
