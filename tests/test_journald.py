"""journald input: export-format scanner, journalfield conversion, and
journalctl-style filtering.

Golden expectations mirror the reference's
filebeat/input/journald/pkg/journalfield/conv_test.go and the
binary.export conformance file (filebeat/input/journald/testdata/).
"""

import json
import os
import struct

import pyarrow as pa
import pytest

from beats_ray.sources.journald import (
    journald_conv,
    parse_journal_export,
    read_journal_export,
    write_journal_export_fixture,
)

REF_BINARY = "/root/reference/filebeat/input/journald/testdata/binary.export"


def _export_bytes(entries: list[dict[str, str]]) -> bytes:
    """Render entries in Journal Export Format (binary framing when the
    value contains a newline, like journald itself)."""
    buf = bytearray()
    for e in entries:
        for k, v in e.items():
            raw = v.encode()
            if "\n" in v:
                buf += k.encode() + b"\n" + struct.pack("<Q", len(raw)) + raw + b"\n"
            else:
                buf += k.encode() + b"=" + raw + b"\n"
        buf += b"\n"
    return bytes(buf)


def _conv_one(fields: dict[str, str], **kw):
    """Run one entry through scanner + converter, return a row dict."""
    import ray.data as rd

    fields = {"__REALTIME_TIMESTAMP": "1724080855230058", **fields}
    tbl = parse_journal_export(_export_bytes([fields]))
    ds = journald_conv(rd.from_arrow(tbl), **kw)
    df = ds.to_pandas()
    assert len(df) == 1
    return df.iloc[0]


# --------------------------------------------------------------- scanner


def test_export_scanner_text_binary_and_boundaries(ray_session):
    data = _export_bytes(
        [
            {"__CURSOR": "s=abc;i=1", "__REALTIME_TIMESTAMP": "1000000",
             "__MONOTONIC_TIMESTAMP": "77", "MESSAGE": "plain",
             "_PID": "12"},
            {"MESSAGE": "line1\nline2\n\nline4", "K": "v=with=equals"},
        ]
    )
    t = parse_journal_export(data, "j.export")
    assert t.num_rows == 2
    f0 = json.loads(t["fields_json"][0].as_py())
    assert f0 == {"MESSAGE": "plain", "_PID": "12"}
    assert t["cursor"][0].as_py() == "s=abc;i=1"
    assert t["ts"][0].as_py().isoformat() == "1970-01-01T00:00:01"
    assert t["monotonic_us"][0].as_py() == 77
    # binary value survives embedded newlines AND blank lines verbatim
    f1 = json.loads(t["fields_json"][1].as_py())
    assert f1["MESSAGE"] == "line1\nline2\n\nline4"
    assert f1["K"] == "v=with=equals"
    assert t["log.file.path"][0].as_py() == "j.export"


def test_export_scanner_tolerates_truncation(ray_session):
    full = _export_bytes([{"A": "1", "MESSAGE": "has\nnewline"}])
    # layout: b"A=1\n" (4) + b"MESSAGE\n" (8) + le64 size (8) + payload
    # (11) + b"\n".  Two contracts, no crash either way:
    # 1. cut mid-payload -> the partial binary field drops, the entry's
    #    already-completed fields are still flushed
    t = parse_journal_export(full[: 4 + 8 + 8 + 5])
    assert t.num_rows == 1
    assert json.loads(t["fields_json"][0].as_py()) == {"A": "1"}
    # 2. cut mid-size-header (fewer than 8 bytes after the name line)
    t = parse_journal_export(full[: 4 + 8 + 3])
    assert t.num_rows == 1
    assert json.loads(t["fields_json"][0].as_py()) == {"A": "1"}


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference testdata not present")
def test_export_scanner_reference_golden(ray_session):
    """The reference's hand-crafted binary.export conformance file."""
    t = parse_journal_export(open(REF_BINARY, "rb").read())
    assert t.num_rows == 9
    fields = [json.loads(s) for s in t["fields_json"].to_pylist()]
    # entry 3 is the hand-crafted literal-backslash case
    assert fields[3]["MESSAGE"] == "FOO\\nBAR\\nFOO"
    # every entry carried its realtime timestamp out of band
    assert t["ts"].null_count == 0
    assert all(f.get("_TRANSPORT") == "journal" for f in fields)


# ------------------------------------------------------------- converter
# (golden cases from journalfield/conv_test.go)


def test_conv_field_rename(ray_session):
    row = _conv_one({"_BOOT_ID": "123456"})
    assert row["journald.host.boot_id"] == "123456"


def test_conv_integer_plain_and_user_append_and_junk(ray_session):
    assert _conv_one({"SYSLOG_PID": "123456"})["log.syslog.procid"] == 123456
    # "'syslog.pid' field with user append"
    assert _conv_one({"SYSLOG_PID": "123456,root"})["log.syslog.procid"] == 123456
    # "'syslog.priority' field with junk"
    assert _conv_one({"PRIORITY": "123456, "})["log.syslog.priority"] == 123456


def test_conv_integer_unparsable_is_null(ray_session):
    # the reference keeps the raw string under the ECS name (mixed-type
    # map); a typed column can't, so unparsable -> null, raw value still
    # in fields_json (documented substitution)
    row = _conv_one({"SYSLOG_PID": ""})
    import pandas as pd

    assert pd.isna(row["log.syslog.procid"])


def test_conv_custom_and_dropped_fields(ray_session):
    row = _conv_one(
        {"my_custom_field": "value", "_SOURCE_MONOTONIC_TIMESTAMP": "x",
         "_WEIRD": "w"}
    )
    custom = json.loads(row["journald.custom"])
    # lowered + left-underscore-trimmed names (conv.go:44-47)
    assert custom == {"my_custom_field": "value", "weird": "w"}


def test_conv_custom_columns_surfaced(ray_session):
    row = _conv_one({"CONV_ID": "c-1"}, custom_columns=["conv_id", "missing"])
    assert row["journald.custom.conv_id"] == "c-1"
    assert row["journald.custom.missing"] is None


def test_conv_gid_uid_enrichment(ray_session):
    # audit == uid -> user.id/user.group.id
    row = _conv_one({"_AUDIT_LOGINUID": "1000", "_UID": "1000", "_GID": "10"})
    assert row["user.id"] == "1000"
    assert row["user.group.id"] == "10"
    assert row["user.effective.id"] is None
    # audit != uid -> effective ids (conv.go:117-121)
    row = _conv_one({"_AUDIT_LOGINUID": "1000", "_UID": "0", "_GID": "0"})
    assert row["user.id"] == "1000"
    assert row["user.effective.id"] == "0"
    assert row["user.effective.group.id"] == "0"


def test_conv_process_fields_and_args(ray_session):
    row = _conv_one(
        {"_PID": "42", "_COMM": "bash",
         "_EXE": "/usr/bin/bash",
         "_CMDLINE": 'bash -c "echo \\"hi there\\"" last'}
    )
    assert row["process.pid"] == 42
    assert row["process.name"] == "bash"
    assert row["process.executable"] == "/usr/bin/bash"
    assert row["process.args_count"] == 4
    assert list(row["process.args"]) == [
        "bash", "-c", '"echo \\"hi there\\""', "last"]
    # object fields overwrite (withECSEnrichment ordering)
    row = _conv_one({"_PID": "42", "OBJECT_PID": "43"})
    assert row["process.pid"] == 43


def test_conv_capabilities_expansion(ray_session):
    row = _conv_one({"_CAP_EFFECTIVE": "a"})  # bits 1,3
    assert list(row["process.thread.capabilities.effective"]) == [
        "CAP_DAC_OVERRIDE", "CAP_FOWNER"]
    # zero -> skipped (capabilities_linux.go FromUint64 of 0)
    assert _conv_one({"_CAP_EFFECTIVE": "0"})[
        "process.thread.capabilities.effective"] is None
    # unknown-but-valid high bit -> CAP_<n>
    row = _conv_one({"_CAP_EFFECTIVE": "20000000000000"})  # bit 53
    assert list(row["process.thread.capabilities.effective"]) == ["CAP_53"]


def test_conv_container_partial_tags(ray_session):
    row = _conv_one({"CONTAINER_PARTIAL_MESSAGE": "true"})
    assert list(row["tags"]) == ["partial_message"]
    assert "container.partial" not in row.index
    row = _conv_one({"CONTAINER_PARTIAL_MESSAGE": "false"})
    assert row["tags"] is None


def test_conv_save_remote_hostname(ray_session):
    row = _conv_one({"_HOSTNAME": "remote-1"}, save_remote_hostname=True)
    assert row["log.source.address"] == "remote-1"
    assert row["host.hostname"] == "remote-1"
    assert row["event.kind"] == "event"


# --------------------------------------------------------------- filters


def _mk_ds(entries):
    import ray.data as rd

    return rd.from_arrow(parse_journal_export(_export_bytes(entries)))


def test_include_matches_journalctl_semantics(ray_session):
    entries = [
        {"_SYSTEMD_UNIT": "a.service", "_TRANSPORT": "journal", "MESSAGE": "1"},
        {"_SYSTEMD_UNIT": "b.service", "_TRANSPORT": "journal", "MESSAGE": "2"},
        {"_SYSTEMD_UNIT": "a.service", "_TRANSPORT": "stdout", "MESSAGE": "3"},
        {"_SYSTEMD_UNIT": "c.service", "_TRANSPORT": "stdout", "MESSAGE": "4"},
    ]
    # same field repeated = OR; different fields = AND
    out = journald_conv(
        _mk_ds(entries),
        include_matches=["_SYSTEMD_UNIT=a.service", "_SYSTEMD_UNIT=b.service",
                         "systemd.transport=journal"],
    ).to_pandas()
    assert sorted(out["message"]) == ["1", "2"]
    # '+' separates OR-groups
    out = journald_conv(
        _mk_ds(entries),
        include_matches=["_SYSTEMD_UNIT=b.service", "+",
                         "systemd.transport=stdout"],
    ).to_pandas()
    assert sorted(out["message"]) == ["2", "3", "4"]
    with pytest.raises(ValueError):
        journald_conv(_mk_ds(entries), include_matches=["nonsense"])


def test_units_identifiers_transports_facilities_filters(ray_session):
    entries = [
        {"_SYSTEMD_UNIT": "a.service", "SYSLOG_IDENTIFIER": "x",
         "_TRANSPORT": "journal", "SYSLOG_FACILITY": "16", "MESSAGE": "1"},
        {"_SYSTEMD_UNIT": "a.service", "SYSLOG_IDENTIFIER": "y",
         "_TRANSPORT": "journal", "SYSLOG_FACILITY": "1", "MESSAGE": "2"},
        {"_SYSTEMD_UNIT": "b.service", "SYSLOG_IDENTIFIER": "x",
         "_TRANSPORT": "stdout", "SYSLOG_FACILITY": "16", "MESSAGE": "3"},
    ]
    out = journald_conv(_mk_ds(entries), units=["a.service"]).to_pandas()
    assert sorted(out["message"]) == ["1", "2"]
    out = journald_conv(_mk_ds(entries), identifiers=["x"],
                        facilities=[16]).to_pandas()
    assert sorted(out["message"]) == ["1", "3"]
    out = journald_conv(_mk_ds(entries), transports=["stdout"]).to_pandas()
    assert sorted(out["message"]) == ["3"]


# ------------------------------------------------------------ round-trip


def test_journal_export_roundtrip_text_equality(ray_session, sf0001_dir):
    """Per-turn text + timestamp equality through the exported-journal
    surface (the north rule's row invariant)."""
    import glob as g

    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = write_journal_export_fixture(0.001)
    ds = journald_conv(
        read_journal_export(sorted(g.glob(d + "/*.export"))),
        custom_columns=["conv_id", "turn_idx"],
    )
    got = ds.to_pandas()
    got["turn_idx"] = got["journald.custom.turn_idx"].astype("int64")
    got = got.rename(columns={"journald.custom.conv_id": "conv_id"})
    got = got[["conv_id", "turn_idx", "message", "ts"]].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)

    want = pq.read_table(sf0001_dir).select(
        ["conv_id", "turn_idx", "text", "ts"]).to_pandas()
    want["turn_idx"] = want["turn_idx"].astype("int64")
    want = want.rename(columns={"text": "message"}).sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # the corpus' multiline turns really exercised the binary framing
    assert got["message"].str.contains("\n").any()


def test_scanner_vectorized_vs_scalar_randomized(ray_session):
    """The vectorized scanner must agree BYTE-identically with the
    scalar reference scanner (or fall back to it) on randomized inputs
    covering every structural feature: binary framing, blank-line runs,
    '=' in values, unicode, tabs/CRs, quotes/backslashes, empty keys,
    dup keys (fallback), truncation at every byte class, and the
    projection pushdown."""
    import random

    from beats_ray.sources.journald import (
        _parse_export_arrow,
        _parse_export_python,
    )

    rng = random.Random(20260820)
    keysets = [None, ["MESSAGE"], ["MESSAGE", "K1"], ["NOPE"]]
    pool_k = ["MESSAGE", "K1", "K2", "_PID", "JUNK", ""]
    pool_v = ["plain", "a=b=c", "new\nline", "tab\there", 'q"b\\s',
              "ünïcode", "", "cr\rhere", "x\n\ny", "0", "123456"]
    for trial in range(200):
        buf = bytearray()
        for _ in range(rng.randrange(0, 5)):
            n_fields = rng.randrange(0, 5)
            if rng.random() < 0.7:
                buf += f"__CURSOR=c{trial}\n".encode()
                buf += f"__REALTIME_TIMESTAMP={rng.randrange(10**9)}\n".encode()
            used = []
            for _ in range(n_fields):
                k = rng.choice(pool_k)
                used.append(k)
                v = rng.choice(pool_v)
                raw = v.encode()
                if "\n" in v or rng.random() < 0.1:
                    buf += k.encode() + b"\n" + struct.pack(
                        "<Q", len(raw)) + raw + b"\n"
                else:
                    buf += k.encode() + b"=" + raw + b"\n"
            buf += b"\n"
            if rng.random() < 0.2:
                buf += b"\n"  # extra blank line
        data = bytes(buf)
        if rng.random() < 0.3 and data:
            data = data[: rng.randrange(len(data))]  # truncate anywhere
        for keys in keysets:
            p = _parse_export_python(data, "f", keys)
            try:
                a = _parse_export_arrow(data, "f", keys)
            except Exception as ex:
                from beats_ray.sources.journald import _FallbackParse

                assert isinstance(ex, _FallbackParse)
                continue
            assert a.equals(p), (trial, keys, data,
                                 a.to_pydict(), p.to_pydict())


def test_scanner_projection_pushdown(ray_session):
    """keys= prunes fields_json to the requested keys (+ specials out
    of band); entries with nothing left and no special vanish."""
    data = _export_bytes([
        {"__CURSOR": "c", "__REALTIME_TIMESTAMP": "5", "MESSAGE": "m",
         "JUNK": "j"},
        {"JUNK": "only"},
        {"MESSAGE": "multi\nline", "JUNK": "x\ny"},
    ])
    t = parse_journal_export(data, "p", keys=["MESSAGE"])
    assert t.num_rows == 2
    f = [json.loads(s) for s in t["fields_json"].to_pylist()]
    assert f == [{"MESSAGE": "m"}, {"MESSAGE": "multi\nline"}]
    assert t["cursor"][0].as_py() == "c"
