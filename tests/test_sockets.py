"""Socket inputs (tcp/udp/unix/syslog-socket) — real localhost
connections against the actor-hosted listeners, mirroring the
reference's inputsource tests (tcp/server_test.go shapes: delimiter
framing, split packets, RFC6587 octet counting, max_message_size)."""

import socket
import time

import pytest
import ray


def _wait_pending(listener, n, timeout=10.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if ray.get(listener.pending.remote()) >= n:
            return
        time.sleep(0.02)
    raise TimeoutError(
        f"listener buffered {ray.get(listener.pending.remote())}/{n}"
    )


def _tcp_send(addr, payload: bytes, chunk: int = 0):
    with socket.create_connection(addr) as s:
        if chunk:
            for i in range(0, len(payload), chunk):
                s.sendall(payload[i: i + chunk])
                time.sleep(0.01)
        else:
            s.sendall(payload)


def test_tcp_lines_and_split_packets(ray_session):
    from beats_ray.sources.sockets import SocketListener, drain_to_dataset

    lis = SocketListener.remote(proto="tcp")
    addr = ray.get(lis.address.remote())
    # lines split mid-message across packets must reassemble
    _tcp_send(addr, b"hello one\nhello two\nhel", chunk=0)
    _tcp_send(addr, "unicode café\n".encode(), chunk=4)
    _wait_pending(lis, 3)
    df = drain_to_dataset(lis).to_pandas()
    texts = sorted(df["text"])
    # "hel" had no newline: flushed at connection EOF (CollectOnEOF)
    assert texts == ["hel", "hello one", "hello two", "unicode café"]
    assert df["log.source.address"].str.startswith("127.0.0.1:").all()
    ray.get(lis.close.remote())


def test_tcp_max_message_size_truncates_not_drops(ray_session):
    from beats_ray.sources.sockets import SocketListener, drain_to_dataset

    lis = SocketListener.remote(proto="tcp", max_message_size=10)
    addr = ray.get(lis.address.remote())
    _tcp_send(addr, b"x" * 100 + b"\nok\n")
    _wait_pending(lis, 2)
    df = drain_to_dataset(lis).to_pandas()
    assert sorted(df["text"]) == ["ok", "x" * 10]
    assert ray.get(lis.stats.remote())["truncated"] == 1
    ray.get(lis.close.remote())


def test_udp_one_message_per_datagram(ray_session):
    from beats_ray.sources.sockets import SocketListener, drain_to_dataset

    lis = SocketListener.remote(proto="udp")
    addr = ray.get(lis.address.remote())
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(b"datagram one", addr)
    s.sendto(b"datagram two\nwith newline", addr)  # NOT line-framed
    s.close()
    _wait_pending(lis, 2)
    df = drain_to_dataset(lis).to_pandas()
    assert sorted(df["text"]) == ["datagram one", "datagram two\nwith newline"]
    ray.get(lis.close.remote())


def test_unix_socket_lines(ray_session, tmp_path):
    from beats_ray.sources.sockets import SocketListener, drain_to_dataset

    path = str(tmp_path / "in.sock")
    lis = SocketListener.remote(proto="unix", path=path)
    ray.get(lis.address.remote())  # wait for bind
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(path)
        s.sendall(b"via unix\nsecond\n")
    _wait_pending(lis, 2)
    df = drain_to_dataset(lis).to_pandas()
    assert sorted(df["text"]) == ["second", "via unix"]
    ray.get(lis.close.remote())


def test_rfc6587_octet_counting_and_mixed_framing(ray_session):
    from beats_ray.sources.sockets import SocketListener, drain_to_dataset

    lis = SocketListener.remote(proto="tcp", framing="rfc6587")
    addr = ray.get(lis.address.remote())
    # octet-counted frames back to back (message content may contain
    # newlines), then a non-transparent (delimiter) frame on the same
    # connection — split across packets to exercise buffering
    m1 = b"<34>May  1 00:10:00 h app: line\none"
    payload = (str(len(m1)).encode() + b" " + m1
               + b"11 hello world"
               + b"<13>plain delimiter frame\n")
    _tcp_send(addr, payload, chunk=7)
    _wait_pending(lis, 3)
    df = drain_to_dataset(lis).to_pandas()
    assert sorted(df["text"]) == sorted(
        [m1.decode(), "hello world", "<13>plain delimiter frame"]
    )
    ray.get(lis.close.remote())


def test_syslog_socket_end_to_end(ray_session):
    from beats_ray.sources.sockets import SocketListener, read_syslog_socket

    lis = SocketListener.remote(proto="udp")
    addr = ray.get(lis.address.remote())
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(b"<34>May  1 00:10:00 host1 app[42]: started ok", addr)
    s.sendto(b"<165>1 2024-05-01T00:10:05Z host2 app2 7 - - v5424 body",
             addr)
    s.close()
    _wait_pending(lis, 2)
    out = read_syslog_socket(lis).to_pandas().sort_values(
        "syslog.host").reset_index(drop=True)
    assert out["syslog.ok"].all()
    assert out["syslog.host"].tolist() == ["host1", "host2"]
    assert out["syslog.severity"].tolist() == [2, 5]  # 34&7, 165&7
    assert out["syslog.facility"].tolist() == [4, 20]  # 34>>3, 165>>3
    ray.get(lis.close.remote())


def test_udp_full_buffer_drops_and_counts(ray_session):
    from beats_ray.sources.sockets import SocketListener

    lis = SocketListener.remote(proto="udp", max_buffer=3)
    addr = ray.get(lis.address.remote())
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for i in range(10):
        s.sendto(f"m{i}".encode(), addr)
    s.close()
    _wait_pending(lis, 3)
    time.sleep(0.3)  # let the tail datagrams arrive and be dropped
    stats = ray.get(lis.stats.remote())
    assert stats["buffered"] == 3
    assert stats["received"] == 3
    assert stats["dropped"] >= 1  # UDP drops when full (no blocking)
    ray.get(lis.close.remote())


def test_rfc6587_overlong_counted_frame_bounded_memory(ray_session):
    """A counted frame longer than max_message_size must NOT be
    buffered whole: the truncated head is emitted as soon as it
    arrives, the remainder is discarded as it streams in, and framing
    resumes cleanly on the next message."""
    from beats_ray.sources.sockets import SocketListener, drain_to_dataset

    lis = SocketListener.remote(
        proto="tcp", framing="rfc6587", max_message_size=64
    )
    addr = ray.get(lis.address.remote())
    big = b"A" * 5000  # claims 5000 bytes, cap is 64
    payload = (
        str(len(big)).encode() + b" " + big
        + b"5 after"
        + b"tail delimiter\n"
    )
    _tcp_send(addr, payload, chunk=512)
    _wait_pending(lis, 3)
    df = drain_to_dataset(lis, max_bytes=10_000).to_pandas()
    texts = sorted(df["text"])
    assert texts == sorted(["A" * 64, "after", "tail delimiter"])
    stats = ray.get(lis.stats.remote())
    assert stats["truncated"] == 1
    ray.get(lis.close.remote())


def test_wal_redelivers_unacked_messages_after_crash(ray_session, tmp_path):
    """Diskqueue semantics: messages persist before they count as
    received; a listener killed WITHOUT ack re-delivers everything on
    restart; ack_drained truncates the log so the next restart delivers
    nothing."""
    from beats_ray.sources.sockets import SocketListener

    wal = str(tmp_path / "wal")
    lis = SocketListener.remote(proto="tcp", wal_dir=wal)
    addr = ray.get(lis.address.remote())
    _tcp_send(addr, b"one\ntwo\nthree\n")
    _wait_pending(lis, 3)
    ray.kill(lis)  # crash before any drain

    lis2 = SocketListener.remote(proto="tcp", wal_dir=wal)
    t = ray.get(lis2.drain.remote())
    assert sorted(t["text"].to_pylist()) == ["one", "three", "two"]
    # crash AFTER drain but BEFORE ack → still re-delivered
    ray.kill(lis2)
    lis3 = SocketListener.remote(proto="tcp", wal_dir=wal)
    t = ray.get(lis3.drain.remote())
    assert sorted(t["text"].to_pylist()) == ["one", "three", "two"]
    # ack → log truncated → restart delivers nothing
    assert ray.get(lis3.ack_drained.remote()) >= 1
    ray.kill(lis3)
    lis4 = SocketListener.remote(proto="tcp", wal_dir=wal)
    assert len(ray.get(lis4.drain.remote())) == 0
    ray.get(lis4.close.remote())


def test_wal_mixes_recovered_and_new_messages(ray_session, tmp_path):
    from beats_ray.sources.sockets import SocketListener

    wal = str(tmp_path / "wal")
    lis = SocketListener.remote(proto="udp", wal_dir=wal)
    addr = ray.get(lis.address.remote())
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(b"old", addr)
    _wait_pending(lis, 1)
    ray.kill(lis)

    lis2 = SocketListener.remote(proto="udp", wal_dir=wal)
    addr2 = ray.get(lis2.address.remote())
    s.sendto(b"new", addr2)
    s.close()
    _wait_pending(lis2, 2)
    t = ray.get(lis2.drain.remote())
    assert sorted(t["text"].to_pylist()) == ["new", "old"]
    ray.get(lis2.ack_drained.remote())
    ray.get(lis2.close.remote())


def test_wal_recover_drops_torn_tail_record(tmp_path):
    """A crash mid-append leaves a torn tail record: recover() keeps
    every complete record and drops only the torn one."""
    import struct as _s

    from beats_ray.sources.sockets import _Wal

    wal = _Wal(str(tmp_path / "w"))
    wal.append("complete", "a:1", 123)
    wal.seal()
    # hand-write a segment with one good and one torn record
    good = (_s.pack("<I", 4) + b"good" + _s.pack("<H", 3) + b"b:2"
            + _s.pack("<q", 456))
    with open(wal._path(wal.epoch), "wb") as f:
        f.write(good + _s.pack("<I", 100) + b"only-part-of-it")
    recovered = _Wal(str(tmp_path / "w")).recover()
    assert [(r[0], r[1], r[2]) for r in recovered] == [
        ("complete", "a:1", 123), ("good", "b:2", 456)
    ]


def test_drain_window_write_then_ack_ordering(ray_session, tmp_path):
    """Windowed socket consumption: parquet write precedes the WAL ack,
    so a crash between drain and ack re-delivers into a later window —
    no loss; duplicates collapse under the fingerprint dedup sink."""
    import glob

    import pyarrow.parquet as pq

    from beats_ray.sources.sockets import (
        SocketListener,
        drain_to_dataset,
        drain_window_to_parquet,
    )

    wal = str(tmp_path / "wal")
    out = str(tmp_path / "out")
    lis = SocketListener.remote(proto="tcp", wal_dir=wal)
    addr = ray.get(lis.address.remote())

    _tcp_send(addr, b"w1-a\nw1-b\n")
    _wait_pending(lis, 2)
    assert drain_window_to_parquet(lis, out, 1) == 2
    # acked: nothing re-delivers
    ray.kill(lis)
    lis2 = SocketListener.remote(proto="tcp", wal_dir=wal)
    addr2 = ray.get(lis2.address.remote())
    assert ray.get(lis2.pending.remote()) == 0

    # window 2: drain + write happen, but CRASH before ack
    _tcp_send(addr2, b"w2-a\n")
    _wait_pending(lis2, 1)
    ds = drain_to_dataset(lis2)
    assert ds.count() == 1  # drained, WAL sealed, NOT acked
    ray.kill(lis2)

    # restart: w2-a re-delivers and lands in the next window
    lis3 = SocketListener.remote(proto="tcp", wal_dir=wal)
    assert drain_window_to_parquet(lis3, out, 3) == 1
    ray.get(lis3.close.remote())

    files = sorted(glob.glob(out + "/window-*/*.parquet"))
    texts = []
    for f in files:
        texts += pq.read_table(f, columns=["text"])["text"].to_pylist()
    assert sorted(texts) == ["w1-a", "w1-b", "w2-a"]  # no loss


def _self_signed(tmp_path):
    """Self-signed localhost cert via the cryptography lib."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "localhost")]
    )
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=1))
        .sign(key, hashes.SHA256())
    )
    certf = tmp_path / "cert.pem"
    keyf = tmp_path / "key.pem"
    certf.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyf.write_bytes(key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption(),
    ))
    return str(certf), str(keyf)


def test_tls_tcp_listener(ray_session, tmp_path):
    """filebeat tcp input `ssl:` parity: TLS clients stream framed
    lines; a plaintext client is dropped without killing the listener."""
    import ssl

    pytest.importorskip("cryptography")
    from beats_ray.sources.sockets import SocketListener, drain_to_dataset

    certf, keyf = _self_signed(tmp_path)
    lis = SocketListener.remote(
        proto="tcp", ssl_certfile=certf, ssl_keyfile=keyf
    )
    addr = ray.get(lis.address.remote())

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    raw = socket.create_connection(addr)
    s = ctx.wrap_socket(raw)
    s.sendall(b"secure one\nsecure two\n")
    s.close()
    _wait_pending(lis, 2)

    # plaintext client: handshake fails, connection dropped, listener
    # keeps serving
    p = socket.create_connection(addr)
    p.sendall(b"not tls\n")
    p.close()
    time.sleep(0.3)

    s2 = ctx.wrap_socket(socket.create_connection(addr))
    s2.sendall(b"still alive\n")
    s2.close()
    _wait_pending(lis, 3)

    df = drain_to_dataset(lis).to_pandas()
    assert sorted(df["text"]) == ["secure one", "secure two", "still alive"]
    ray.get(lis.close.remote())


def test_delimiterless_flood_is_capped(ray_session):
    """Regression: a delimiter-less sender previously grew ``pending``
    without bound (max_message_size was only enforced AFTER a delimiter
    arrived). The buffer must cap at max_message_size: truncated head
    emitted, remainder discarded, stream resyncs at the next
    delimiter."""
    from beats_ray.sources.sockets import SocketListener

    lis = SocketListener.remote(proto="tcp", max_message_size=1000)
    addr = ray.get(lis.address.remote())
    with socket.create_connection(addr) as s:
        s.sendall(b"x" * 50_000)     # no delimiter anywhere
        s.sendall(b"\nafter\n")      # resync, then a normal message
    _wait_pending(lis, 2)
    t = ray.get(lis.drain.remote())
    texts = t["text"].to_pylist()
    assert texts[0] == "x" * 1000
    assert texts[-1] == "after"
    stats = ray.get(lis.stats.remote())
    assert stats["truncated"] >= 1
    ray.get(lis.close.remote())


def test_flood_resync_with_multibyte_delimiter(ray_session):
    """The discard path must catch a multi-byte delimiter split across
    recv chunks."""
    from beats_ray.sources.sockets import SocketListener

    lis = SocketListener.remote(
        proto="tcp", max_message_size=100, line_delimiter="<|>")
    addr = ray.get(lis.address.remote())
    with socket.create_connection(addr) as s:
        s.sendall(b"a" * 5000)
        time.sleep(0.05)
        s.sendall(b"<")              # delimiter split across sends
        time.sleep(0.05)
        s.sendall(b"|>rest<|>")
    _wait_pending(lis, 2)
    t = ray.get(lis.drain.remote())
    assert t["text"].to_pylist() == ["a" * 100, "rest"]
    ray.get(lis.close.remote())


def test_unix_listener_close_unlinks_socket_path(ray_session, tmp_path):
    """Regression: close() left the unix socket file behind, so a
    restarted listener on the same path (the WAL crash-recovery flow)
    failed with EADDRINUSE."""
    import os

    from beats_ray.sources.sockets import SocketListener

    p = str(tmp_path / "events.sock")
    lis = SocketListener.remote(proto="unix", path=p)
    ray.get(lis.address.remote())
    assert os.path.exists(p)
    ray.get(lis.close.remote())
    for _ in range(100):
        if not os.path.exists(p):
            break
        time.sleep(0.02)
    assert not os.path.exists(p)
    # the restart the WAL recovery flow performs must now succeed
    lis2 = SocketListener.remote(proto="unix", path=p)
    ray.get(lis2.address.remote())
    ray.get(lis2.close.remote())
