"""redis slowlog input — RESP2 codec, the pipelined harvest cycle
(filebeat/input/redis/harvester.go), entry-shape variants, and the
host-parallel Dataset reader against real localhost scripted servers
(the reference mocks the conn in input_test.go; we script the whole
wire protocol)."""

import socket

import pyarrow as pa
import pytest

from beats_ray.sources.redisslow import (
    RespError,
    ScriptedRedisServer,
    Simple,
    _Reader,
    encode_command,
    encode_reply,
    harvest_slowlog,
    read_redis_slowlog,
    scripted_slowlog_entries,
    start_scripted_redis,
)

# the slowlog entry from harvester.go's doc comment (lines 45-53)
REF_ENTRY = [13, 1309448128, 30, ["slowlog", "get", "100"],
             "100.1.1.1:12345", "client-name"]


def test_resp_codec_roundtrip():
    assert encode_command("SLOWLOG", "GET") == \
        b"*2\r\n$7\r\nSLOWLOG\r\n$3\r\nGET\r\n"
    assert encode_reply(Simple("OK")) == b"+OK\r\n"
    assert encode_reply(42) == b":42\r\n"
    assert encode_reply(None) == b"$-1\r\n"
    assert encode_reply("a\r\nb") == b"$4\r\na\r\nb\r\n"  # binary-safe bulk
    wire = encode_reply([REF_ENTRY])
    a, b = socket.socketpair()
    a.sendall(wire + encode_reply(RespError("ERR boom")))
    r = _Reader(b)
    got = r.read()
    assert got == [[13, 1309448128, 30,
                    [b"slowlog", b"get", b"100"],
                    b"100.1.1.1:12345", b"client-name"]]
    with pytest.raises(RespError, match="boom"):
        r.read()
    a.close()
    b.close()


def test_reference_doc_entry_mapping():
    """The harvester.go doc-comment entry maps exactly per
    harvester.go:179-227: cmd/key from args[0:2], rest into args,
    message = join, 6-field shape carries client fields."""
    srv = ScriptedRedisServer([REF_ENTRY], role="master")
    t = harvest_slowlog("127.0.0.1", srv.port, name="h")
    srv.close()
    row = t.to_pylist()[0]
    assert row["message"] == "slowlog get 100"
    assert row["redis.slowlog.id"] == 13
    assert row["redis.slowlog.cmd"] == "slowlog"
    assert row["redis.slowlog.key"] == "get"
    assert row["redis.slowlog.args"] == ["100"]
    assert row["redis.slowlog.duration.us"] == 30
    assert row["redis.slowlog.clientAddr"] == "100.1.1.1:12345"
    assert row["redis.slowlog.clientName"] == "client-name"
    assert row["ts"].isoformat() == "2011-06-30T15:35:28"


def test_entry_shapes_and_empty_fields():
    entries = [
        [0, 1700000000, 5, ["GET"]],                 # 1 arg: key ""
        [1, 1700000001, 6, ["SET", "k"]],            # 2 args: no args col
        [2, 1700000002, 7, ["DEL", "k", "a", "b"]],  # 4 args
        [3, 1700000003, 8, ["GET", "k"], "", ""],    # 6-field, empty client
    ]
    srv = ScriptedRedisServer(entries, role="slave")
    t = harvest_slowlog("127.0.0.1", srv.port)
    srv.close()
    rows = sorted(t.to_pylist(), key=lambda r: r["redis.slowlog.id"])
    assert rows[0]["redis.slowlog.key"] == ""
    assert rows[0]["redis.slowlog.args"] is None
    assert rows[1]["redis.slowlog.args"] is None
    assert rows[2]["redis.slowlog.args"] == ["a", "b"]
    assert rows[2]["message"] == "DEL k a b"
    # empty clientAddr/Name stay absent (harvester.go:205-210)
    assert rows[3]["redis.slowlog.clientAddr"] is None
    assert rows[3]["redis.slowlog.clientName"] is None
    assert all(r["redis.slowlog.role"] == "slave" for r in rows)


def test_auth_and_reset_cycle():
    srv = ScriptedRedisServer([REF_ENTRY], password="sekrit")
    with pytest.raises(RespError):
        harvest_slowlog("127.0.0.1", srv.port, password="wrong")
    t1 = harvest_slowlog("127.0.0.1", srv.port, password="sekrit",
                         username="default")
    # the GET+RESET pipeline makes each poll exactly-once server-side
    t2 = harvest_slowlog("127.0.0.1", srv.port, password="sekrit")
    srv.close()
    assert t1.num_rows == 1 and t2.num_rows == 0
    assert t2.schema.equals(t1.schema)  # empty harvest is schema-stable


def test_read_redis_slowlog_dataset(ray_session):
    servers, addrs = start_scripted_redis(0.001)
    try:
        df = read_redis_slowlog(addrs).to_pandas()
    finally:
        for s in servers:
            s.close()
    scripts = scripted_slowlog_entries(0.001)
    assert len(df) == sum(len(s) for s in scripts)
    got_per_host = df.groupby("host").size().to_dict()
    assert got_per_host == {
        f"redis-{h}": len(s) for h, s in enumerate(scripts) if s}
    # master on host 0, slaves elsewhere (ROLE reply parsed per host)
    roles = df.groupby("host")["redis.slowlog.role"].first()
    assert roles["redis-0"] == "master"
    assert set(roles.drop("redis-0")) == {"slave"}
    # ids are the per-host append order -> dense 0..n-1
    for h, s in enumerate(scripts):
        ids = sorted(df[df["host"] == f"redis-{h}"]["redis.slowlog.id"])
        assert ids == list(range(len(s)))


def test_hostile_length_headers_capped():
    """A peer claiming a giant bulk/array must fail fast, BEFORE the
    reader allocates the claimed size (the hostile-header class of
    the RFC6587 socket fix)."""
    import socket as _socket

    a, b = _socket.socketpair()
    a.sendall(b"$9999999999\r\n")
    with pytest.raises(RespError, match="max_bulk"):
        _Reader(b).read()
    a.sendall(b"*9999999999\r\n")
    with pytest.raises(RespError, match="max_array"):
        _Reader(b).read()
    a.close()
    b.close()
