"""Processor library tests — table-driven, mirroring the reference's
per-processor *_test.go cases (e.g. actions/rename_test.go)."""

import pyarrow as pa
import pytest

from beats_ray.processors import build_processor, run_chain


@pytest.fixture
def table():
    return pa.table(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": ["user", "assistant", "tool"],
            "text": [
                "level=info ts=2026-01-01T00:00:00Z tool=none status=ok msg=\"hi\"",
                '{"event":"tool_call","tool":"grep","duration_ms":12}',
                "garbage",
            ],
            "num_str": ["1", "2", "oops"],
        }
    )


def run(spec, t):
    return build_processor(spec)(t)


def test_add_fields(table):
    out = run({"add_fields": {"target": "", "fields": {"env": "prod"}}}, table)
    assert out["env"].to_pylist() == ["prod"] * 3


def test_add_tags(table):
    out = run({"add_tags": {"tags": ["a", "b"]}}, table)
    assert out["tags"].to_pylist() == ["a,b"] * 3
    out2 = run({"add_tags": {"tags": ["c"]}}, out)
    assert out2["tags"].to_pylist() == ["a,b,c"] * 3


def test_rename_and_copy(table):
    out = run({"rename": {"fields": [{"from": "num_str", "to": "n"}]}}, table)
    assert "num_str" not in out.column_names and "n" in out.column_names
    out = run({"copy_fields": {"fields": [{"from": "role", "to": "role2"}]}}, table)
    assert out["role2"].to_pylist() == out["role"].to_pylist()


def test_rename_existing_target_fails(table):
    # rename.go Run: rollback + error.message, stream keeps flowing —
    # never an exception that would abort the whole batch/job
    out = run({"rename": {"fields": [{"from": "role", "to": "text"}]}}, table)
    assert out["role"].to_pylist() == table["role"].to_pylist()
    assert all("target" in m for m in out["error.message"].to_pylist())


def test_drop_and_include_fields(table):
    out = run({"drop_fields": {"fields": ["num_str"]}}, table)
    assert "num_str" not in out.column_names
    out = run({"include_fields": {"fields": ["role"]}}, table)
    assert set(out.column_names) == {"conv_id", "turn_idx", "role"}


def test_drop_event_when(table):
    out = run(
        {"drop_event": {}, "when": {"equals": {"role": "tool"}}}, table
    )
    assert out.num_rows == 2
    assert "tool" not in out["role"].to_pylist()


def test_replace(table):
    out = run(
        {"replace": {"fields": [{"field": "text", "pattern": r"\d+", "replacement": "N"}]}},
        table,
    )
    assert "duration_ms\":N" in out["text"][1].as_py()


def test_truncate_fields(table):
    out = run({"truncate_fields": {"fields": ["text"], "max_characters": 10}}, table)
    assert all(len(v) <= 10 for v in out["text"].to_pylist())
    flags = out["log.flags"].to_pylist()
    assert flags[0] == "truncated" and flags[2] is None


def test_convert_with_rollback(table):
    out = run(
        {"convert": {"fields": [{"from": "num_str", "to": "num", "type": "long"}]}},
        table,
    )
    assert out["num"].to_pylist() == [1, 2, None]
    errs = out["error.message"].to_pylist()
    assert errs[2] is not None and errs[0] is None


def test_timestamp(table):
    chain = [
        {"dissect": {"tokenizer": 'level=%{level} ts=%{ts} tool=%{tool} status=%{status} msg="%{msg}"', "ignore_failure": True}},
        {"timestamp": {"field": "dissect.ts", "target": "ts2"}},
    ]
    out = run_chain(table, [build_processor(s) for s in chain])
    assert str(out["ts2"][0].as_py()) == "2026-01-01 00:00:00"
    assert out["ts2"][2].as_py() is None


def test_decode_json_fields(table):
    out = run({"decode_json_fields": {"fields": ["text"], "add_error_key": True}}, table)
    assert out["parsed.event"].to_pylist() == [None, "tool_call", None]
    assert out["parsed.duration_ms"].to_pylist() == [None, 12, None]
    # "garbage" doesn't look like JSON → not an error; truncated JSON is
    t2 = pa.table({"text": ['{"a":', '{"event":"x"}']})
    out2 = run({"decode_json_fields": {"fields": ["text"], "add_error_key": True, "expected": {"event": "string"}}}, t2)
    assert out2["error.message"].to_pylist()[0] is not None


def test_syslog():
    t = pa.table({"text": ["<34>Jan  1 00:00:07 host9 app[123]: it broke", "nope"]})
    out = run({"syslog": {}}, t)
    assert out["syslog.pri"][0].as_py() == 34
    assert out["syslog.facility"][0].as_py() == 4
    assert out["syslog.severity"][0].as_py() == 2
    assert out["syslog.pid"][0].as_py() == 123
    assert out["syslog.msg"][0].as_py() == "it broke"
    assert out["syslog.ok"].to_pylist() == [True, False]


def test_fingerprint_and_add_id(table):
    out = run({"fingerprint": {"fields": ["conv_id", "turn_idx"], "method": "md5"}}, table)
    import hashlib

    assert out["fingerprint"][0].as_py() == hashlib.md5(b"2:c1|1:0").hexdigest()
    out = run({"add_id": {}}, table)
    assert len(set(out["meta.doc_id"].to_pylist())) == 3


def test_include_message(table):
    out = run({"include_message": {"patterns": ["level="]}}, table)
    assert out.num_rows == 1


def test_if_then_else(table):
    spec = {
        "if": {"equals": {"role": "user"}},
        "then": [{"add_fields": {"target": "", "fields": {"cls": "u"}}}],
        "else": [{"add_fields": {"target": "", "fields": {"cls": "other"}}}],
    }
    out = build_processor(spec)(table)
    got = dict(zip(out["role"].to_pylist(), out["cls"].to_pylist()))
    assert got == {"user": "u", "assistant": "other", "tool": "other"}


def test_when_blends_only_matching_rows(table):
    out = run(
        {
            "add_fields": {"target": "", "fields": {"m": "yes"}},
            "when": {"equals": {"role": "user"}},
        },
        table,
    )
    assert out["m"].to_pylist() == ["yes", None, None]


def test_multiline_stats():
    t = pa.table({"text": ["a\nb\nc", "single"]})
    out = run({"multiline_stats": {}}, t)
    assert out["multiline.n_lines"].to_pylist() == [3, 1]
    assert out["multiline.first_line"].to_pylist() == ["a", "single"]


def test_format_string():
    from beats_ray.processors.metadata import compile_format_string

    t = pa.table(
        {"role": ["user"], "ts": pa.array([1767225600000000], pa.timestamp("us"))}
    )
    r = compile_format_string("idx-%{[role]}-%{+yyyy.MM.dd}")(t)
    assert r.to_pylist() == ["idx-user-2026.01.01"]
    r2 = compile_format_string("%{[missing]:fallback}")(t)
    assert r2.to_pylist() == ["fallback"]


def test_decode_base64_and_urldecode():
    t = pa.table({"b": ["aGVsbG8=", "!!!"], "u": ["a%20b", None]})
    out = run({"decode_base64_field": {"field": {"from": "b", "to": "b2"}}}, t)
    assert out["b2"].to_pylist()[0] == "hello"
    assert out["error.message"].to_pylist()[1] is not None
    out = run({"urldecode": {"fields": [{"from": "u"}]}}, t)
    assert out["u"].to_pylist() == ["a b", None]


def test_decode_duration():
    t = pa.table({"d": ["1h2m3s", "150ms", "bogus"]})
    out = run({"decode_duration": {"field": "d", "target": "sec"}}, t)
    assert out["sec"].to_pylist() == [3723.0, 0.15, None]


def test_syslog_rfc5424_structured_data():
    """SD-element parsing against the reference's rfc5424 test corpus
    shapes (reader/syslog/parser_test.go): single element, multiple
    elements, param-less element, escaped ", ] and \\ in values, and
    the nil cases."""
    import json

    from beats_ray.processors.parse import parse_sd_elements

    cases = [
        (
            '[exampleSDID@32473 iut="3" eventSource="Application" eventID="1011"]',
            {"exampleSDID@32473": {
                "iut": "3", "eventSource": "Application", "eventID": "1011"}},
        ),
        ('[a@1 k="v"][b@2]', {"a@1": {"k": "v"}, "b@2": {}}),
        ('[x@1 m="q \\" e"]', {"x@1": {"m": 'q " e'}}),
        ('[x@1 m="br \\] ck"]', {"x@1": {"m": "br ] ck"}}),
        ('[x@1 m="bs \\\\ sl"]', {"x@1": {"m": "bs \\ sl"}}),
        ("-", None),
        ("", None),
        (None, None),
    ]
    for sd, want in cases:
        got = parse_sd_elements(sd)
        assert (json.loads(got) if got else None) == want, sd


def test_syslog_5424_sd_column(ray_session):
    """End-to-end: the syslog processor emits syslog.sd for 5424 rows
    and null for 3164 rows."""
    import json

    import pyarrow as pa

    from beats_ray.processors import build_processor

    proc = build_processor({"syslog": {}})
    t = pa.table(
        {
            "text": [
                '<165>1 2024-01-01T00:00:00Z h app - MID [m@1 k="v"] hi',
                "<34>Oct 11 22:14:15 mymachine su: 'su root' failed",
            ]
        }
    )
    out = proc(t)
    sd = out["syslog.sd"].to_pylist()
    assert json.loads(sd[0]) == {"m@1": {"k": "v"}}
    assert sd[1] is None
    assert out["syslog.ok"].to_pylist() == [True, True]


def test_dead_letter_route(ray_session):
    """Oversized / field-missing docs re-route to dead_letter with the
    reason and original sink preserved; healthy docs untouched
    (dead_letter_index.go semantics: never drop, always annotate)."""
    import pandas as pd

    import ray.data as rd

    from beats_ray.sinks import dead_letter_route

    rows = [
        {"sink": "main", "text": "ok", "tool": "bash"},
        {"sink": "main", "text": "x" * 500, "tool": "bash"},
        {"sink": "other", "text": "ok2", "tool": None},
    ]
    out = (
        dead_letter_route(
            rd.from_items(rows), max_text_bytes=100, required=("tool",)
        )
        .to_pandas()
        .sort_values("text")
        .reset_index(drop=True)
    )
    assert out.loc[0, "sink"] == "main"
    assert pd.isna(out.loc[0, "dead_letter.reason"])
    assert out.loc[1, "sink"] == "dead_letter"
    assert out.loc[1, "dead_letter.reason"] == "missing_field:tool"
    assert out.loc[1, "dead_letter.original_sink"] == "other"
    assert out.loc[2, "sink"] == "dead_letter"
    assert out.loc[2, "dead_letter.reason"] == "doc_too_large"
    assert out.loc[2, "dead_letter.original_sink"] == "main"


def test_decode_xml_wineventlog_golden():
    """Full field mapping against the reference's golden event
    (decode_xml_wineventlog/processor_test.go testMessage /
    testMessageOutput): winlog map + ECS projection."""
    import json

    import pyarrow as pa

    from beats_ray.processors import build_processor

    xml = (
        "<Event xmlns='http://schemas.microsoft.com/win/2004/08/events/event'>"
        "<System><Provider Name='Microsoft-Windows-Security-Auditing' "
        "Guid='{54849625-5478-4994-a5ba-3e3b0328c30d}'/>"
        "<EventID>4672</EventID><Version>0</Version><Level>0</Level>"
        "<Task>12548</Task><Opcode>0</Opcode>"
        "<Keywords>0x8020000000000000</Keywords>"
        "<TimeCreated SystemTime='2021-03-23T09:56:13.137310000Z'/>"
        "<EventRecordID>11303</EventRecordID>"
        "<Correlation ActivityID='{ffb23523-1f32-0000-c335-b2ff321fd701}'/>"
        "<Execution ProcessID='652' ThreadID='4660'/>"
        "<Channel>Security</Channel><Computer>vagrant</Computer>"
        "<Security/></System>"
        "<EventData><Data Name='SubjectUserSid'>S-1-5-18</Data>"
        "<Data Name='SubjectUserName'>SYSTEM</Data></EventData>"
        "<RenderingInfo Culture='en-US'><Message>Special privileges assigned "
        "to new logon.</Message><Level>Information</Level>"
        "<Task>Special Logon</Task><Opcode>Info</Opcode>"
        "<Channel>Security</Channel>"
        "<Provider>Microsoft Windows security auditing.</Provider>"
        "<Keywords><Keyword>Audit Success</Keyword></Keywords>"
        "</RenderingInfo></Event>"
    )
    proc = build_processor({"decode_xml_wineventlog": {"field": "message"}})
    out = proc(pa.table({"message": [xml]}))
    win = json.loads(out["winlog"][0].as_py())
    assert win["channel"] == "Security"
    assert win["event_id"] == "4672"
    assert win["provider_name"] == "Microsoft-Windows-Security-Auditing"
    assert win["provider_guid"] == "{54849625-5478-4994-a5ba-3e3b0328c30d}"
    assert win["record_id"] == 11303
    assert win["computer_name"] == "vagrant"
    assert win["task"] == "Special Logon"
    assert win["opcode"] == "Info"
    assert win["level"] == "information"
    assert win["outcome"] == "success"   # 0x8020... & auditSuccess
    assert win["keywords"] == ["Audit Success"]
    assert win["time_created"] == "2021-03-23T09:56:13.137310000Z"
    assert win["activity_id"] == "{ffb23523-1f32-0000-c335-b2ff321fd701}"
    assert win["process.pid"] == 652
    assert win["process.thread.id"] == 4660
    assert win["event_data"] == {
        "SubjectUserSid": "S-1-5-18", "SubjectUserName": "SYSTEM"}
    assert "version" not in win     # zero values skipped (AddOptional)
    assert "user" not in win        # Security had no UserID attr
    # ECS projection
    assert out["event.code"][0].as_py() == "4672"
    assert out["event.kind"][0].as_py() == "event"
    assert out["event.provider"][0].as_py() == "Microsoft-Windows-Security-Auditing"
    assert out["event.action"][0].as_py() == "Special Logon"
    assert out["host.name"][0].as_py() == "vagrant"
    assert out["event.outcome"][0].as_py() == "success"
    assert out["log.level"][0].as_py() == "information"
    assert out["message"][0].as_py() == "Special privileges assigned to new logon."


def test_decode_xml_wineventlog_bad_xml():
    import pyarrow as pa

    from beats_ray.processors import build_processor

    proc = build_processor({"decode_xml_wineventlog": {"field": "message"}})
    out = proc(pa.table({"message": ["<unclosed", None]}))
    assert out["winlog"].to_pylist() == [None, None]
    assert out["error.message"][0].as_py() == "failed to decode xml"


def test_translate_sid_and_ldap_aliases():
    import pyarrow as pa

    t = pa.table({"winlog.user.identifier": ["S-1-5-18", "S-1-0-0"],
                  "user.id": ["u1", "u2"]})
    out = build_processor(
        {"translate_sid": {"dictionary": {"S-1-5-18": "SYSTEM"},
                           "default": "unknown"}}
    )(t)
    assert out["user.name"].to_pylist() == ["SYSTEM", "unknown"]
    out = build_processor(
        {"translate_ldap_attribute": {"dictionary": {"u1": "Alice"}}}
    )(t)
    assert out["user.attribute"].to_pylist() == ["Alice", None]


def test_dns_lookup_and_failure_tag():
    import pyarrow as pa

    t = pa.table({"source.domain": ["a.example", "missing.example", None]})
    out = build_processor(
        {"dns": {"resolutions": {"a.example": "10.0.0.1"}}}
    )(t)
    assert out["dns.answer"].to_pylist() == ["10.0.0.1", None, None]
    assert out["dns.answer.status"].to_pylist() == ["OK", "NXDOMAIN", None]


def test_dns_action_append_replace_and_failure_tags():
    """Reference field actions (dns.go:116-138 setFieldValue): append
    (the default, config.go:73) joins onto an existing target value,
    replace overwrites; tag_on_failure (dns.go:85-88) tags only rows
    whose lookup failed."""
    import pyarrow as pa

    t = pa.table({
        "source.domain": ["a.example", "missing.example", "a.example"],
        "dns.answer": ["cached.addr", None, None],
        "tags": [None, "pre", None],
    })
    res = {"resolutions": {"a.example": "10.0.0.1"},
           "tag_on_failure": ["_dns_fail"]}
    out = build_processor({"dns": res})(t)  # default action = append
    assert out["dns.answer"].to_pylist() == [
        "cached.addr,10.0.0.1", None, "10.0.0.1",
    ]
    # failure row got tagged (appended to its existing tags); others kept
    assert out["tags"].to_pylist() == [None, "pre,_dns_fail", None]

    out = build_processor({"dns": {**res, "action": "replace"}})(t)
    assert out["dns.answer"].to_pylist() == ["10.0.0.1", None, "10.0.0.1"]

    with pytest.raises(ValueError, match="action"):
        build_processor({"dns": {"action": "upsert"}})


def test_dns_cache_replay_reference_semantics(ray_session):
    """TTL lookup-cache replay vs a hand-computed reference trace
    (cache.go): miss installs expiry=ts+ttl, ts<=expiry hits (boundary
    instant INCLUSIVE — IsExpired is now.After(expires)), first event
    past expiry re-misses; failures cache for failure_ttl; min_ttl
    clamps short success TTLs (cache.go:219)."""
    import pandas as pd
    import ray.data as rd

    from beats_ray.dataops.dnscache import dns_cache_replay

    base = pd.Timestamp("2024-05-01 00:00:00")
    rows = []
    # ok.example: ttl_s=10 clamped up to min_ttl_s=60
    #   t=0 miss (expiry 60), t=30 hit, t=60 hit (boundary), t=61 miss
    for i, sec in enumerate([0, 30, 60, 61]):
        rows.append({"event_id": i, "query": "ok.example",
                     "ts": base + pd.Timedelta(seconds=sec)})
    # bad.example fails, failure_ttl 20: t=0 miss, t=20 hit, t=21 miss
    for i, sec in enumerate([0, 20, 21]):
        rows.append({"event_id": 10 + i, "query": "bad.example",
                     "ts": base + pd.Timedelta(seconds=sec)})
    out = dns_cache_replay(
        rd.from_items(rows), key="query", order_col="event_id",
        resolutions={"ok.example": {"answer": "10.0.0.1", "ttl_s": 10}},
        success_ttl_s=300, failure_ttl_s=20, min_ttl_s=60, buckets=4,
    ).to_pandas().sort_values("event_id")
    got = list(zip(out["event_id"], out["status"], out["cache"]))
    assert got == [
        (0, "OK", "miss"), (1, "OK", "hit"), (2, "OK", "hit"),
        (3, "OK", "miss"),
        (10, "NXDOMAIN", "miss"), (11, "NXDOMAIN", "hit"),
        (12, "NXDOMAIN", "miss"),
    ]
    assert out["answer"].tolist()[:4] == ["10.0.0.1"] * 4
    assert out["answer"].isna().tolist()[4:] == [True] * 3


def test_now_requires_injected_value():
    import pyarrow as pa

    t = pa.table({"x": [1]})
    out = build_processor({"now": {"value": "2024-05-01T00:00:00"}})(t)
    assert str(out["event.created"][0].as_py()) == "2024-05-01 00:00:00"
    with pytest.raises(ValueError, match="value"):
        build_processor({"now": {}})


def test_stage_only_processors_redirect():
    with pytest.raises(ValueError, match="stages"):
        build_processor({"rate_limit": {"limit": "100/s"}})
    with pytest.raises(ValueError, match="stages"):
        build_processor({"cache": {}})
