"""Kafka input over the on-disk segment format (RecordBatch v2).

Semantics mirrored from filebeat/input/kafka/input.go (event mapping,
header serialization, expand_event_list_from_field) and the public
KIP-98 batch format (CRCs, codecs, control batches, transactions)."""

import struct

import pyarrow as pa
import pytest

from beats_ray.sources.kafka import (
    _topic_partition_from_path,
    control_marker_batch,
    kafka_events,
    kafka_segment_paths,
    read_kafka_segments,
    scan_kafka_segment,
    write_kafka_record_batch,
    write_kafka_segments_fixture,
)

RECS = [
    (1000, b"k1", b"hello", [("a", b"1"), ("b:c", b"2")]),
    (1500, None, None, []),
    (2000, b"k3", "héllo".encode(), [("h", None)]),
]


def test_roundtrip_offsets_ts_keys_values():
    seg = write_kafka_record_batch(RECS, base_offset=10)
    t = scan_kafka_segment(seg, topic="t", partition=3)
    rows = t.to_pylist()
    assert [r["kafka.offset"] for r in rows] == [10, 11, 12]
    assert [r["kafka.key"] for r in rows] == ["k1", None, "k3"]
    assert [r["message"] for r in rows] == ["hello", None, "héllo"]
    assert [int(r["ts"].timestamp() * 1000) for r in rows] == [
        1000, 1500, 2000]
    assert all(r["kafka.topic"] == "t" and r["kafka.partition"] == 3
               for r in rows)
    # block_timestamp = the batch maxTimestamp
    assert all(int(r["kafka.block_timestamp"].timestamp() * 1000) == 2000
               for r in rows)


def test_header_serialization_masks_colon():
    # input.go:236: ':' in the key replaced with '_' so "key: value"
    # stays parseable; null header value -> empty string
    seg = write_kafka_record_batch(RECS, base_offset=0)
    t = scan_kafka_segment(seg)
    assert t.column("kafka.headers").to_pylist() == [
        ["a: 1", "b_c: 2"], [], ["h: "]]


def test_gzip_codec_roundtrip():
    plain = scan_kafka_segment(
        write_kafka_record_batch(RECS, base_offset=0))
    gz = scan_kafka_segment(
        write_kafka_record_batch(RECS, base_offset=0, codec="gzip"))
    assert plain.equals(gz)


def test_unsupported_codec_raises():
    seg = bytearray(write_kafka_record_batch(RECS, base_offset=0))
    # attributes int16 lives at bytes 21-23; set codec bits to snappy
    attrs = struct.unpack_from(">h", seg, 21)[0]
    struct.pack_into(">h", seg, 21, (attrs & ~0x07) | 2)
    with pytest.raises(NotImplementedError, match="snappy"):
        scan_kafka_segment(bytes(seg), check_crcs=False)


def test_crc_corrupt_batch_skipped():
    good = write_kafka_record_batch(RECS, base_offset=0)
    tail = write_kafka_record_batch(RECS, base_offset=3)
    bad = bytearray(good)
    bad[70] ^= 0xFF
    t = scan_kafka_segment(bytes(bad) + tail)
    assert t.column("kafka.offset").to_pylist() == [3, 4, 5]
    t2 = scan_kafka_segment(bytes(bad) + tail, check_crcs=False)
    assert t2.num_rows == 6  # unchecked: the flipped byte flows through


def test_torn_tail_tolerated():
    good = write_kafka_record_batch(RECS, base_offset=0)
    nxt = write_kafka_record_batch(RECS, base_offset=3)
    for cut in (1, 20, len(nxt) - 1):
        t = scan_kafka_segment(good + nxt[:cut])
        assert t.num_rows == 3


def test_log_append_time_stamps_max_timestamp():
    seg = write_kafka_record_batch(RECS, base_offset=0,
                                   log_append_time=True)
    t = scan_kafka_segment(seg)
    assert [int(r.timestamp() * 1000) for r in t.column("ts").to_pylist()
            ] == [2000, 2000, 2000]


def test_transactions_and_isolation_levels():
    base = write_kafka_record_batch(RECS, base_offset=0)
    txn = write_kafka_record_batch(
        [(0, b"k", b"in-txn", [])], base_offset=3, producer_id=7,
        transactional=True)
    abort = control_marker_batch(4, 7, commit=False)
    commit = control_marker_batch(4, 7, commit=True)

    # control batches are never events
    assert scan_kafka_segment(base + txn + abort).num_rows == 4
    assert scan_kafka_segment(base + txn + commit).num_rows == 4
    # read_committed: aborted and unterminated (past-LSO) txns drop
    rc = "read_committed"
    assert scan_kafka_segment(base + txn + abort,
                              isolation_level=rc).num_rows == 3
    assert scan_kafka_segment(base + txn + commit,
                              isolation_level=rc).num_rows == 4
    assert scan_kafka_segment(base + txn,
                              isolation_level=rc).num_rows == 3
    # markers only end their own producer's transaction
    other = control_marker_batch(4, 99, commit=True)
    assert scan_kafka_segment(base + txn + other,
                              isolation_level=rc).num_rows == 3


def test_bad_magic_raises():
    seg = bytearray(write_kafka_record_batch(RECS, base_offset=0))
    seg[16] = 1  # magic v1 (pre-0.11 MessageSet)
    with pytest.raises(ValueError, match="magic"):
        scan_kafka_segment(bytes(seg))


def test_topic_partition_from_path():
    assert _topic_partition_from_path(
        "/x/logs/web-events-12/00000000000000000000.log"
    ) == ("web-events", 12)
    assert _topic_partition_from_path("/x/odd/seg.log") == ("odd", 0)


def test_fixture_counts_and_isolation(ray_session):
    import duckdb

    from beats_ray.fixtures import transcripts_dir

    d = write_kafka_segments_fixture(0.001)
    paths = kafka_segment_paths(d, ["transcripts"])
    assert paths and all("transcripts-" in p for p in paths)
    assert kafka_segment_paths(d, ["nope"]) == []

    n_all, n_committed = duckdb.sql(
        "SELECT COUNT(*), COUNT(*) FILTER (WHERE role <> 'system') FROM "
        f"read_parquet('{transcripts_dir(0.001)}/part-*.parquet')"
    ).fetchall()[0]
    ds = read_kafka_segments(d, ["transcripts"])
    assert ds.count() == n_all
    ds_c = read_kafka_segments(d, ["transcripts"],
                               isolation_level="read_committed")
    assert ds_c.count() == n_committed


def test_expand_event_list_from_field(ray_session):
    import ray.data

    # the reference integration test's golden payload
    # (kafka_integration_test.go:162: {"records": [...]}, expanded to
    # one message per element)
    rows = [
        {"kafka.key": "a", "kafka.offset": 0,
         "message": '{"records": [{"val":"val1"}, {"val":"val2"}]}'},
        {"kafka.key": "b", "kafka.offset": 1, "message": "not json"},
        {"kafka.key": "c", "kafka.offset": 2,
         "message": '{"other": [{"val":"x"}]}'},
        {"kafka.key": "d", "kafka.offset": 3,
         "message": '["top-level array"]'},
        {"kafka.key": "e", "kafka.offset": 4, "message": None},
    ]
    ds = kafka_events(ray.data.from_items(rows),
                      expand_event_list_from_field="records")
    got = ds.to_pandas().sort_values("message").to_dict("records")
    assert [(r["kafka.key"], r["message"]) for r in got] == [
        ("a", '{"val":"val1"}'), ("a", '{"val":"val2"}')]


def test_expand_without_field_is_identity(ray_session):
    import ray.data

    rows = [{"message": '{"records": [1, 2]}', "kafka.offset": 0}]
    ds = kafka_events(ray.data.from_items(rows))
    assert ds.take_all() == rows
