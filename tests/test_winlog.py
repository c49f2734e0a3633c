"""winlog input: exported-XML scanner, winevent decode + ToEvent
mapping, and recordFilter semantics.

Golden expectations mirror the reference's
winlogbeat/eventlog/record_filter.go + record_filter_test.go, the
Record.ToEvent mapping (eventlog/eventlog.go:71-103), and the
wineventlog testdata exports (sys/wineventlog/testdata/*.xml).
"""

import json
import os

import pandas as pd
import pytest
import ray

from beats_ray.sources.winlog import (
    parse_event_id_ranges,
    parse_levels,
    read_winlog_xml,
    split_winlog_xml,
    winlog_events,
    write_winlog_xml_fixture,
)

REF_SYSMON = ("/root/reference/winlogbeat/sys/wineventlog/testdata/"
              "sysmon-9.01.xml")


def _evt(event_id=100, level=4, provider="Prov", record=7,
         ts="2019-03-18T16:57:52.4333673Z", message="hello",
         data=()) -> str:
    ed = "".join(f"<Data Name='{k}'>{v}</Data>" for k, v in data)
    return (
        "<Event xmlns='http://schemas.microsoft.com/win/2004/08/events/"
        "event'><System>"
        f"<Provider Name='{provider}'/>"
        f"<EventID>{event_id}</EventID><Version>2</Version>"
        f"<Level>{level}</Level><Task>0</Task><Opcode>0</Opcode>"
        f"<TimeCreated SystemTime='{ts}'/>"
        f"<EventRecordID>{record}</EventRecordID>"
        "<Channel>Application</Channel><Computer>vm-1</Computer>"
        f"</System><EventData>{ed}</EventData>"
        "<RenderingInfo Culture='en-US'>"
        f"<Message>{message}</Message><Level>Information</Level>"
        "</RenderingInfo></Event>"
    )


def _run(xml_events, **kw) -> pd.DataFrame:
    import ray.data as rd

    ds = rd.from_arrow(split_winlog_xml("".join(xml_events).encode(), "f.xml"))
    return winlog_events(ds, **kw).to_pandas()


# --------------------------------------------------------------- scanner


def test_scanner_splits_wrapped_and_bare_streams(ray_session):
    bare = (_evt(1) + "\r\n" + _evt(2)).encode()
    t = split_winlog_xml(bare, "a.xml")
    assert t.num_rows == 2
    wrapped = ("﻿<?xml version=\"1.0\"?>\n<Events>\n"
               + _evt(1) + "\n" + _evt(2) + "\n</Events>\n").encode()
    t = split_winlog_xml(wrapped)
    assert t.num_rows == 2
    # <EventData>/<EventID>/<EventRecordID> never open a new event
    assert all(x.startswith("<Event ") for x in t["xml"].to_pylist())


def test_scanner_drops_truncated_trailing_event(ray_session):
    full = (_evt(1) + _evt(2)).encode()
    t = split_winlog_xml(full[: len(full) - 40])
    assert t.num_rows == 1


# ---------------------------------------------------- decode + ToEvent


def test_decode_to_event_mapping(ray_session):
    df = _run([_evt(message="line1&#13;&#10;line2", data=(("K", "v"),))],
              event_data_columns=["K", "Missing"], include_xml=True)
    row = df.iloc[0]
    assert row["event.code"] == "100"
    assert row["event.kind"] == "event"
    assert row["event.provider"] == "Prov"
    assert row["host.name"] == "vm-1"
    # RemoveWindowsLineEndings (strings.go:43-46) via the shared kernel
    assert row["message"] == "line1\nline2"
    assert row["log.level"] == "information"
    assert row["winlog.record_id"] == 7
    assert row["winlog.level_raw"] == 4
    assert row["winlog.event_data.K"] == "v"
    assert row["winlog.event_data.Missing"] is None
    # @timestamp = TimeCreated/SystemTime, 100ns fraction truncated to µs
    assert row["ts"].isoformat() == "2019-03-18T16:57:52.433367"
    assert row["event.original"].startswith("<Event ")
    win = json.loads(row["winlog"])
    assert win["channel"] == "Application"
    assert win["event_data"] == {"K": "v"}
    assert row["log.file.path"] == "f.xml"


def test_decode_bad_xml_tag_and_keep(ray_session):
    df = _run([_evt(1), "<Event ><System><broken</Event>", _evt(2)],
              event_id="1-999")  # filters must not drop errored rows
    assert len(df) == 3
    bad = df[df["error.message"].notna()]
    assert len(bad) == 1
    assert bad.iloc[0]["winlog"] is None


# --------------------------------------------------------------- filters
# (record_filter_test.go semantics)


def test_parse_event_id_ranges():
    inc, exc = parse_event_id_ranges("1, 100-200, -75, -300-400")
    assert inc == [(1, 1), (100, 200)]
    assert exc == [(75, 75), (300, 400)]
    for bad in ("x", "5-1", "1-2-3", ","):
        with pytest.raises(ValueError):
            parse_event_id_ranges(bad)


def test_parse_levels():
    assert parse_levels("information") == {0, 4}
    assert parse_levels("warn,error") == {3, 2}
    assert parse_levels("verbose, CRITICAL") == {5, 1}
    with pytest.raises(ValueError):
        parse_levels("loud")


def test_event_id_include_exclude(ray_session):
    evts = [_evt(i) for i in (1, 50, 75, 150, 250)]
    df = _run(evts, event_id="1-100,-75")
    assert sorted(df["event.code"]) == ["1", "50"]
    # excludes alone: everything else passes (no includes = include-all)
    df = _run(evts, event_id="-75")
    assert sorted(df["event.code"].astype(int)) == [1, 50, 150, 250]


def test_level_and_provider_filters(ray_session):
    evts = [_evt(1, level=0, provider="A"), _evt(2, level=4, provider="B"),
            _evt(3, level=2, provider="A"), _evt(4, level=5, provider="B")]
    # 'information' aliases raw level 0 AND 4 (parseLevels)
    df = _run(evts, level="information")
    assert sorted(df["event.code"]) == ["1", "2"]
    df = _run(evts, level="err,verbose", provider=["B"])
    assert sorted(df["event.code"]) == ["4"]
    # a record with no <Level> has LevelRaw 0 -> matched by info
    no_level = _evt(9).replace("<Level>4</Level>", "")
    df = _run([no_level], level="information")
    assert list(df["event.code"]) == ["9"]


# ---------------------------------------------------------------- golden


@pytest.mark.skipif(not os.path.exists(REF_SYSMON),
                    reason="reference testdata not present")
def test_reference_sysmon_export_golden(ray_session):
    """The reference's 32-event sysmon export parses end-to-end with the
    field values its own tests assert on (wineventlog_test.go)."""
    import ray.data as rd

    t = split_winlog_xml(open(REF_SYSMON, "rb").read(), REF_SYSMON)
    assert t.num_rows == 32
    df = winlog_events(rd.from_arrow(t),
                       event_data_columns=["Image"]).to_pandas()
    assert len(df) == 32
    assert df["error.message"].isna().all()
    assert (df["event.provider"] == "Microsoft-Windows-Sysmon").all()
    assert df["winlog.record_id"].notna().all()
    win0 = json.loads(df.iloc[0]["winlog"])
    assert win0["channel"] == "Microsoft-Windows-Sysmon/Operational"
    assert win0["user"]["identifier"] == "S-1-5-18"
    img = df["winlog.event_data.Image"].dropna()
    assert len(img) == 30  # two DNS-query events carry no Image param
    assert img.iloc[0].startswith("C:\\Program Files")
    assert img.iloc[-1] == "C:\\Windows\\Sysmon.exe"
    # provider filter replays on real data
    assert len(winlog_events(
        rd.from_arrow(t), provider=["NotThere"]).to_pandas()) == 0


# ------------------------------------------------------------ round-trip


def test_winlog_roundtrip_text_equality(ray_session, sf0001_dir):
    """Per-turn text + timestamp equality through the exported-XML
    surface (the north rule's row invariant)."""
    import glob as g

    import pyarrow.parquet as pq

    d = write_winlog_xml_fixture(0.001)
    ds = winlog_events(
        read_winlog_xml(sorted(g.glob(d + "/*.xml"))),
        event_data_columns=["ConvId", "TurnIdx"],
    )
    got = ds.to_pandas()
    got["turn_idx"] = got["winlog.event_data.TurnIdx"].astype("int64")
    got = got.rename(columns={"winlog.event_data.ConvId": "conv_id"})
    got = got[["conv_id", "turn_idx", "message", "ts"]].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)

    want = pq.read_table(sf0001_dir).select(
        ["conv_id", "turn_idx", "text", "ts"]).to_pandas()
    want["turn_idx"] = want["turn_idx"].astype("int64")
    # decode strips trailing newlines (RemoveWindowsLineEndings) and
    # skips empty values entirely (winevent AddOptional -> null)
    want["message"] = (
        want["text"].str.replace(r"\n+$", "", regex=True).replace("", None)
    )
    want = want[["conv_id", "turn_idx", "message", "ts"]].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # the corpus' multiline turns really exercised XML escaping
    assert got["message"].str.contains("\n").any()


def test_fast_path_matches_et_path(ray_session, sf0001_dir):
    """winlog_json=False (all-Arrow regex decode) must emit EXACTLY the
    ET path's columns — over the fixture corpus (multiline texts, XML
    escapes) AND an adversarial corpus hitting every fallback guard:
    named+numeric entities, CRLF, empty message/level, absent sections,
    UserData, audit keyword masks, self-closing / duplicate Data
    params, incomplete elements."""
    import glob as g

    import pyarrow as pa

    d = write_winlog_xml_fixture(0.001)
    files = sorted(g.glob(d + "/*.xml"))[:2]
    key = ["winlog.event_data.ConvId", "winlog.record_id"]
    slow = winlog_events(
        read_winlog_xml(files), event_data_columns=["ConvId", "TurnIdx"]
    ).to_pandas().sort_values(key).reset_index(drop=True)
    fast = winlog_events(
        read_winlog_xml(files), event_data_columns=["ConvId", "TurnIdx"],
        winlog_json=False,
    ).to_pandas().sort_values(key).reset_index(drop=True)
    for col in fast.columns:
        pd.testing.assert_series_equal(slow[col], fast[col], check_names=False)

    adv = [
        '<Event xmlns="x"><System><Provider Name="a&amp;b &lt;x&gt;"/>'
        "<EventID>5</EventID><Level>2</Level>"
        "<Keywords>0x10000000000000</Keywords>"
        '<TimeCreated SystemTime="2024-01-02T03:04:05.1234567Z"/>'
        "<EventRecordID>9</EventRecordID><Computer>c&quot;1</Computer>"
        '<Security UserID="S-1-5-18"/></System>'
        '<EventData><Data Name="K">v&apos;1</Data></EventData>'
        '<RenderingInfo Culture="en-US"><Message>line1\r\nline2\n\n'
        "</Message><Level>Error</Level><Task>T&amp;sk</Task>"
        "</RenderingInfo></Event>",
        "<Event><System><EventID>7</EventID>"
        "<Keywords>0x20000000000000</Keywords></System></Event>",
        '<Event><System><Provider Guid="{g}" Name="p2"/>'
        "<EventID> 8 </EventID></System><RenderingInfo><Message></Message>"
        "<Level></Level></RenderingInfo></Event>",
        "<Event><System><EventID>9</EventID></System><EventData>"
        '<Data Name="K">&#65;num</Data></EventData></Event>',
        "<Event><System><EventID>10</EventID></System>"
        "<UserData><Inner><A>1</A></Inner></UserData></Event>",
        "<Event><System><EventID>11</EventID></System>"
        '<EventData><Data Name="K"/></EventData></Event>',
        "<Event><System><EventID>12</EventID></System><EventData>"
        '<Data Name="K">one</Data><Data Name="K">two</Data>'
        "</EventData></Event>",
        "<Event><System><EventID>13</EventID><Task>0</Task>"
        "<Level>4</Level></System><RenderingInfo><Keywords>"
        "<Keyword>Classic</Keyword></Keywords></RenderingInfo></Event>",
        "<Event><broken",
    ]
    t = pa.table({"xml": pa.array(adv, pa.string())})
    ds = ray.data.from_arrow(t)
    s = winlog_events(ds, event_data_columns=["K"]).to_pandas()
    f = winlog_events(ds, event_data_columns=["K"],
                      winlog_json=False).to_pandas()
    for col in f.columns:
        pd.testing.assert_series_equal(s[col], f[col], check_names=False)
    # the malformed element really went down the error path in BOTH
    assert s["error.message"].notna().sum() == 1


def test_range_parallel_scan_equals_whole_file(ray_session):
    """Range ownership (event start in [start,end)) must reproduce the
    whole-file scan exactly at every split size — including splits that
    land mid-event, mid-tag, and mid-multibyte text."""
    import glob as g

    from beats_ray.sources.winlog import scan_winlog_range

    d = write_winlog_xml_fixture(0.001)
    f = sorted(g.glob(d + "/*.xml"))[0]
    data = open(f, "rb").read()
    want = split_winlog_xml(data, f)["xml"].to_pylist()
    size = len(data)
    import pyarrow as pa

    for split in (size + 1, size // 2, 100_000, 7_777, 1_003):
        got = []
        for off in range(0, size, split):
            t = scan_winlog_range(f, off, min(off + split, size),
                                  margin=1 << 16)
            got.extend(t["xml"].to_pylist())
        assert got == want, f"split={split}: {len(got)} vs {len(want)}"

    # the Dataset reader with range splitting agrees with file mode
    a = read_winlog_xml([f], split_bytes=50_000).to_pandas()
    b = read_winlog_xml([f], split_bytes=None).to_pandas()
    assert sorted(a["xml"]) == sorted(b["xml"])
    assert (a["log.file.path"] == f).all()
