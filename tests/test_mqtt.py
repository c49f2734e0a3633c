"""mqtt input — 3.1.1 packet codec, spec-4.7 wildcard grammar, the
full session flow (CONNECT/SUBSCRIBE/PUBLISH + QoS1/QoS2 handshakes)
against a real localhost scripted broker, and the broker-parallel
Dataset reader (filebeat/input/mqtt input.go semantics)."""

import struct

import pytest

from beats_ray.sources.mqtt import (
    MqttError,
    ScriptedMqttBroker,
    collect_mqtt,
    connect_packet,
    packet,
    publish_packet,
    read_mqtt,
    scripted_mqtt_messages,
    start_scripted_mqtt,
    subscribe_packet,
    topic_matches,
    _PacketReader,
    CONNECT, PUBLISH,
)


def test_topic_filter_grammar():
    # spec 4.7.1 examples
    assert topic_matches("sport/tennis/player1/#", "sport/tennis/player1")
    assert topic_matches("sport/tennis/player1/#",
                         "sport/tennis/player1/ranking")
    assert not topic_matches("sport/tennis/+", "sport/tennis/player1/rank")
    assert topic_matches("sport/+", "sport/")
    assert not topic_matches("sport/+", "sport")
    assert topic_matches("+/+", "/finance")
    assert not topic_matches("+", "/finance")
    # 4.7.2: '$'-topics are hidden from wildcard-leading filters
    assert not topic_matches("#", "$SYS/uptime")
    assert not topic_matches("+/monitor/Clients", "$SYS/monitor/Clients")
    assert topic_matches("$SYS/#", "$SYS/uptime")


def test_packet_codec_roundtrip():
    import socket

    a, b = socket.socketpair()
    a.sendall(connect_packet("cid", username="u", password="p"))
    a.sendall(publish_packet("t/x", b"payload", qos=1, retain=True,
                             packet_id=7))
    r = _PacketReader(b)
    ptype, flags, body = r.read()
    assert ptype == CONNECT
    assert body[:6] == b"\x00\x04MQTT"
    assert body[6] == 4  # protocol level 3.1.1
    ptype, flags, body = r.read()
    assert ptype == PUBLISH
    assert flags == (1 << 1) | 1  # qos1 + retain
    tlen = struct.unpack(">H", body[:2])[0]
    assert body[2:2 + tlen] == b"t/x"
    assert struct.unpack(">H", body[5:7])[0] == 7
    assert body[7:] == b"payload"
    a.close()
    b.close()


def test_varint_boundary():
    # remaining length crossing the 1/2-byte boundary (127 -> 128)
    big = publish_packet("t", b"x" * 200)
    assert big[1] & 0x80  # two-byte varint
    import socket

    a, b = socket.socketpair()
    a.sendall(big)
    ptype, _, body = _PacketReader(b).read()
    assert ptype == PUBLISH and body[3:] == b"x" * 200
    a.close()
    b.close()


def test_session_qos_and_ids():
    script = [
        ("conv/c1/user", b"m0", 0, True),
        ("conv/c1/tool", b"m1", 1, False),   # filtered out below
        ("conv/c2/user", b"m2", 2, False),   # qos2 handshake
        ("conv/c3/user", b"m3", 1, False),
    ]
    b = ScriptedMqttBroker(script)
    t = collect_mqtt("127.0.0.1", b.port, {"conv/+/user": 1},
                     client_id="t1")
    rows = t.to_pylist()
    assert [r["message"] for r in rows] == ["m0", "m2", "m3"]
    # delivered qos = min(publish, granted 1); ids count qos>0 from 1
    assert [r["mqtt.qos"] for r in rows] == [0, 1, 1]
    assert [r["mqtt.message_id"] for r in rows] == [0, 1, 2]
    assert [r["mqtt.retained"] for r in rows] == [True, False, False]
    # a qos2 subscription gets the exactly-once handshake
    t2 = collect_mqtt("127.0.0.1", b.port, {"conv/c2/#": 2},
                      client_id="t2")
    assert [(r["mqtt.qos"], r["message"]) for r in t2.to_pylist()] == \
        [(2, "m2")]
    b.close()


def test_connect_auth_and_max_messages():
    script = [(f"t/{i}", str(i).encode(), 0, False) for i in range(10)]
    b = ScriptedMqttBroker(script, password="pw")
    with pytest.raises(MqttError, match="return code 4"):
        collect_mqtt("127.0.0.1", b.port, {"#": 0})
    t = collect_mqtt("127.0.0.1", b.port, {"#": 0}, username="u",
                     password="pw", max_messages=4)
    assert t.num_rows == 4  # the micro-batch window bound
    b.close()


def test_read_mqtt_dataset(ray_session):
    brokers, addrs = start_scripted_mqtt(0.001)
    try:
        df = read_mqtt(addrs, ["conv/+/user", "conv/+/assistant"],
                       qos=1).to_pandas()
    finally:
        for b in brokers:
            b.close()
    scripts = scripted_mqtt_messages(0.001)
    want = sum(1 for s in scripts for topic, *_ in s
               if topic.rsplit("/", 1)[1] in ("user", "assistant"))
    assert len(df) == want
    assert set(df["mqtt.topic"].str.rsplit("/", n=1).str[1]) == \
        {"user", "assistant"}
    assert (df[df["mqtt.qos"] == 0]["mqtt.message_id"] == 0).all()
    assert (df[df["mqtt.qos"] > 0]["mqtt.message_id"] > 0).all()


def test_hostile_remaining_length_capped():
    """A peer claiming a near-spec-max (256 MB) remaining length must
    fail fast, before the reader buffers the claimed size."""
    import socket as _socket

    a, b = _socket.socketpair()
    a.sendall(bytes([PUBLISH << 4]) + b"\xff\xff\xff\x7f")  # 268435455
    with pytest.raises(ValueError, match="max_packet"):
        _PacketReader(b).read()
    a.close()
    b.close()
