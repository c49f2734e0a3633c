"""Tests for multiline join, sources (line-reader chain, ndjson
round-trip), sinks fan-out, and the extras processors."""

import glob

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from beats_ray.processors import build_processor


# ---------------------------------------------------------- multiline


def test_multiline_merge_pattern_after(ray_session):
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 0, "line": "Exception: x"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 1, "line": "\tat Foo.java:1"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 2, "line": "\tat Bar.java:2"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 3, "line": "next event"},
        {"conv_id": "c2", "turn_idx": 0, "line_idx": 0, "line": "\torphan cont"},
    ]
    from beats_ray.stages.multiline import multiline_merge

    out = (
        multiline_merge(rd.from_items(rows), pattern=r"^\s", match="after")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "event_id"])
        .reset_index(drop=True)
    )
    assert out.loc[0, "text"] == "Exception: x\n\tat Foo.java:1\n\tat Bar.java:2"
    assert out.loc[0, "n_lines"] == 3
    assert out.loc[1, "text"] == "next event"
    # a leading continuation with no prior line still starts an event
    assert out.loc[2, "text"] == "\torphan cont"


def test_multiline_roundtrip_reconstructs(ray_session, sf0001_dir):
    """explode → merge must reconstruct every original turn text."""
    from beats_ray.stages.multiline import explode_lines, multiline_merge

    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))[:2]
    src = rd.read_parquet(files).select_columns(["conv_id", "turn_idx", "text"])
    orig = src.to_pandas()
    merged = multiline_merge(explode_lines(src), pattern=r"^\s").to_pandas()
    m = merged.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    o = orig.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(m) == len(o)  # every turn → exactly one event
    assert (m["text"].to_numpy() == o["text"].to_numpy()).all()


def test_multiline_count_mode(ray_session):
    from beats_ray.stages.multiline import multiline_count

    rows = [
        {"conv_id": "c", "turn_idx": 0, "line_idx": i, "line": f"l{i}"}
        for i in range(5)
    ]
    out = (
        multiline_count(rd.from_items(rows), count=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == ["l0\nl1", "l2\nl3", "l4"]


# ------------------------------------------------------------ sources


def test_ndjson_source_roundtrip(ray_session, sf0001_dir):
    from beats_ray.sources import read_ndjson_logs, write_ndjson_fixture

    log_dir = write_ndjson_fixture(0.001)
    ds = read_ndjson_logs(
        sorted(glob.glob(log_dir + "/*.log")),
        expected={"conv_id": "string", "turn_idx": "int64", "role": "string",
                  "tool": "string"},
    )
    df = ds.to_pandas()
    parquet_rows = rd.read_parquet(sorted(glob.glob(sf0001_dir + "/part-*.parquet"))).count()
    assert len(df) == parquet_rows
    assert df["conv_id"].notna().all()
    assert set(df["role"].unique()) == {"user", "assistant", "tool", "system"}
    assert "log.file.path" in df.columns


def test_line_reader_truncates_and_flags(ray_session):
    from beats_ray.sources import line_reader_chain

    ds = rd.from_items([{"text": "x" * 100}, {"text": "short\n"}])
    out = line_reader_chain(ds, max_bytes=10).to_pandas()
    assert out["text"].tolist() == ["x" * 10, "short"]
    assert out["log.flags"].tolist() == ["truncated", None]


# -------------------------------------------------------------- sinks


def test_write_routed_formats(ray_session, sf0001_dir, tmp_path):
    from beats_ray.pipeline import build_dataset
    from beats_ray.sinks import write_routed

    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))[:2]
    routed = build_dataset(rd.read_parquet(files), num_parts=8)
    metrics = write_routed(
        routed,
        str(tmp_path / "sinks"),
        sinks={
            "errors": {"format": "ndjson"},
            "default": {"format": "parquet"},
            "tool_events": {"format": "discard"},
        },
    )
    assert set(metrics) == {"errors", "tool_events", "assistant", "default"}
    assert metrics["errors"]["format"] == "ndjson"
    assert (tmp_path / "sinks" / "sink=errors" / "_ndjson").is_dir()
    assert not (tmp_path / "sinks" / "sink=tool_events").exists()
    total_in = rd.read_parquet(files).count()
    assert sum(m["rows"] for m in metrics.values()) == total_in


def test_dedup_by_doc_id(ray_session):
    from beats_ray.sinks import dedup_by_doc_id

    rows = [
        {"conv_id": "c1", "turn_idx": 1, "meta.doc_id": "a"},
        {"conv_id": "c1", "turn_idx": 0, "meta.doc_id": "a"},
        {"conv_id": "c2", "turn_idx": 0, "meta.doc_id": "b"},
    ]
    out = dedup_by_doc_id(rd.from_items(rows)).to_pandas()
    assert len(out) == 2
    kept_a = out[out["meta.doc_id"] == "a"]
    assert kept_a["turn_idx"].tolist() == [0]  # deterministic survivor


# ------------------------------------------------------------- extras


def test_decode_xml():
    t = pa.table({"message": ["<a x='1'><b>hi</b></a>", "<broken"]})
    out = build_processor({"decode_xml": {"field": "message"}})(t)
    assert '"@x": "1"' in out["xml"][0].as_py()
    assert out["xml"][1].as_py() is None
    assert out["error.message"][1].as_py() is not None


def test_extract_array():
    t = pa.table({"arr": [[1, 2, 3], [4, 5, 6]]})
    out = build_processor(
        {"extract_array": {"field": "arr", "mappings": {"first": 0, "last": 2}}}
    )(t)
    assert out["first"].to_pylist() == [1, 4]
    assert out["last"].to_pylist() == [3, 6]


def test_community_id_known_vector():
    # public test vector: tcp 128.232.110.120:34855 -> 66.35.250.204:80
    t = pa.table(
        {
            "source.ip": ["128.232.110.120"],
            "destination.ip": ["66.35.250.204"],
            "source.port": [34855],
            "destination.port": [80],
            "network.transport": ["tcp"],
        }
    )
    out = build_processor({"community_id": {}})(t)
    assert out["network.community_id"][0].as_py() == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="


def test_add_network_direction():
    t = pa.table(
        {
            "source.ip": ["10.0.0.1", "8.8.8.8", "10.0.0.2", "1.1.1.1"],
            "destination.ip": ["8.8.4.4", "10.0.0.9", "10.0.0.3", "9.9.9.9"],
        }
    )
    out = build_processor(
        {"add_network_direction": {"internal_networks": ["10.0.0.0/8"]}}
    )(t)
    assert out["network.direction"].to_pylist() == [
        "outbound",
        "inbound",
        "internal",
        "external",
    ]


def test_translate():
    t = pa.table({"code": ["a", "b", "zz"]})
    out = build_processor(
        {"translate": {"field": "code", "target_field": "name",
                       "dictionary": {"a": "alpha", "b": "beta"},
                       "default": "unknown"}}
    )(t)
    assert out["name"].to_pylist() == ["alpha", "beta", "unknown"]


def test_script_udf():
    t = pa.table({"n": [1, 2, 3], "s": ["a", "b", "c"]})
    src = (
        "def process(row):\n"
        "    if row['n'] == 2:\n"
        "        return None\n"
        "    row['n2'] = row['n'] * 10\n"
        "    return row\n"
    )
    out = build_processor({"script": {"source": src}})(t)
    assert out["n2"].to_pylist() == [10, 30]
    # drop semantics under when:
    out2 = build_processor(
        {"script": {"source": src}, "when": {"equals": {"s": "b"}}}
    )(t)
    assert out2.num_rows == 2


def test_multiline_while_pattern(ray_session):
    from beats_ray.stages.multiline import multiline_while

    rows = [
        {"conv_id": "c", "turn_idx": 0, "line_idx": i, "line": ln}
        for i, ln in enumerate(["+a", "+b", "solo", "+c", "+d", "end"])
    ]
    out = (
        multiline_while(rd.from_items(rows), pattern=r"^\+")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == ["+a\n+b", "solo", "+c\n+d", "end"]


def test_syslog_rfc5424_and_auto():
    t = pa.table(
        {
            "text": [
                '<34>1 2026-01-01T00:00:07Z host9 app 123 MSGID [x@1 k="v"] hello 5424',
                "<34>Jan  1 00:00:07 host9 app[123]: hello 3164",
                "<165>1 2026-01-01T00:00:07Z h - - - - heartbeat",
                "not syslog",
            ]
        }
    )
    out = build_processor({"syslog": {"format": "auto"}})(t)
    assert out["syslog.ok"].to_pylist() == [True, True, True, False]
    assert out["syslog.msg"].to_pylist()[:2] == ["hello 5424", "hello 3164"]
    assert out["syslog.version"].to_pylist() == [1, None, 1, None]
    assert out["syslog.pid"].to_pylist() == [123, 123, None, None]
    assert out["syslog.facility"][2].as_py() == 165 >> 3
    # forced single-format modes
    only3 = build_processor({"syslog": {"format": "rfc3164"}})(t)
    assert only3["syslog.ok"].to_pylist() == [False, True, False, False]


def test_container_parser():
    t = pa.table(
        {
            "text": [
                '{"log":"line 1\\n","stream":"stdout","time":"2026-01-01T00:00:00Z"}',
                '{"log":"err line\\n","stream":"stderr","time":"2026-01-01T00:00:01Z"}',
                "garbage",
            ]
        }
    )
    out = build_processor({"container": {}})(t)
    assert out["container.log"].to_pylist() == ["line 1\n", "err line\n", None]
    filt = build_processor({"container": {"stream": "stderr"}})(t)
    assert filt.num_rows == 1
    assert filt["container.stream"][0].as_py() == "stderr"


def test_metadata_alias_processors():
    t = pa.table({"x": [1]})
    for name, col in [
        ("add_observer_metadata", "observer.type"),
        ("add_agent_metadata", "agent.type"),
        ("add_cloud_metadata", "cloud.provider"),
    ]:
        out = build_processor({name: {}})(t)
        assert out[col][0].as_py() is not None


def test_keyed_metadata_processors():
    t = pa.table({"container.id": ["abc", "zzz"], "process.pid": [41, 7]})
    out = build_processor(
        {"add_docker_metadata": {"index": {"abc": {"name": "web", "image": "nginx"}}}}
    )(t)
    assert out["container.name"].to_pylist() == ["web", None]
    out = build_processor(
        {"add_process_metadata": {"index": {"41": {"name": "bash", "exe": "/bin/bash"}}}}
    )(t)
    assert out["process.name"].to_pylist() == ["bash", None]
    out = build_processor(
        {"add_kubernetes_metadata": {"index": {"abc": {"pod": "p1", "namespace": "ns"}}}}
    )(t)
    assert out["kubernetes.pod"].to_pylist() == ["p1", None]


def test_decode_xml_wineventlog():
    # full winlog field mapping (winevent Fields()), not a raw tree dump
    t = pa.table({"message": ["<Event><System><EventID>42</EventID></System></Event>"]})
    out = build_processor({"decode_xml_wineventlog": {}})(t)
    assert '"event_id": "42"' in out["winlog"][0].as_py()
    assert out["event.code"][0].as_py() == "42"


def test_multiline_flush_pattern(ray_session):
    """flush_pattern (multiline/pattern.go flushPattern): the matching
    line ends the event INCLUSIVE; the next line opens a new event even
    if it would otherwise be a continuation."""
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 0, "line": "start A"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 1, "line": "\tcont A"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 2, "line": "END"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 3, "line": "\twould-be cont"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 4, "line": "start B"},
    ]
    from beats_ray.stages.multiline import multiline_merge

    out = (
        multiline_merge(
            rd.from_items(rows), pattern=r"^\s", match="after",
            flush_pattern=r"^END$",
        )
        .to_pandas()
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == [
        "start A\n\tcont A\nEND",   # flushed inclusive of END
        "\twould-be cont",          # forced new event after flush
        "start B",
    ]


def test_multiline_flush_pattern_first_line_of_buffer(ray_session):
    """pattern.go fidelity: readFirst loads a buffer-opening line
    WITHOUT a flush check, so a flush-matching line that opens a buffer
    does not terminate it — continuations still join — and of two
    CONSECUTIVE flush lines only the second one (read while the buffer
    is open) flushes."""
    from beats_ray.stages.multiline import multiline_merge

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 0, "line": "END"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 1, "line": "\tcont"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 2, "line": "END"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 3, "line": "END"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 4, "line": "END"},
    ]
    out = (
        multiline_merge(
            rd.from_items(rows), pattern=r"^\s", match="after",
            flush_pattern=r"^END$",
        )
        .to_pandas()
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    # line 0 opens (no flush check), line 1 joins (continuation), line 2
    # effective-flushes INCLUSIVE; line 3 re-opens (no flush check),
    # line 4 effective-flushes inclusive.
    assert out["text"].tolist() == ["END\n\tcont\nEND", "END\nEND"]


def test_multiline_flush_overrides_predicate_break(ray_session):
    """pattern.go order: the flush check runs BEFORE the continuation
    predicate, so a flush line that is NOT a continuation still JOINS
    the open event before terminating it."""
    from beats_ray.stages.multiline import multiline_merge

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 0, "line": "start A"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 1, "line": "END"},
        {"conv_id": "c1", "turn_idx": 0, "line_idx": 2, "line": "start B"},
    ]
    out = (
        multiline_merge(
            rd.from_items(rows), pattern=r"^\s", match="after",
            flush_pattern=r"^END$",
        )
        .to_pandas()
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    # END is not a continuation (^\s fails) but flush-joins event A
    assert out["text"].tolist() == ["start A\nEND", "start B"]
