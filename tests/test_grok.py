"""Grok processor: pattern expansion, vectorized extraction, typed
captures, first-match-wins, failure semantics. Pure Table-in/Table-out
(no Ray session needed)."""

import pyarrow as pa
import pytest

from beats_ray.processors import build_processor, registry
from beats_ray.processors.grok import (
    GrokError,
    compile_grok,
    expand_pattern,
    grok_batch,
)

LINE = 'level=error ts=2026-01-01T00:04:14Z tool=none status=ok msg="ran 7 commands"'
PAT = ('level=%{LOGLEVEL:level} ts=%{TIMESTAMP_ISO8601:ts} '
       'tool=%{WORD:tool} status=%{WORD:status} '
       'msg="ran %{INT:n_cmds:int} commands"')


def test_registered():
    assert "grok" in registry()


def test_basic_extraction_and_types():
    f, ok = grok_batch(compile_grok([PAT]), pa.array([LINE, "nope", None]))
    assert f["level"].to_pylist() == ["error", None, None]
    assert f["ts"].to_pylist() == ["2026-01-01T00:04:14Z", None, None]
    assert f["n_cmds"].to_pylist() == [7, None, None]
    assert f["n_cmds"].type == pa.int64()
    assert ok.to_pylist() == [True, False, False]


def test_composite_library_patterns():
    cases = {
        "%{IPV4:v}": ("addr 192.168.0.255 here", "192.168.0.255"),
        "%{IP:v}": ("x 2001:db8::1 y", "2001:db8::1"),
        "%{UUID:v}": ("u=123e4567-e89b-12d3-a456-426614174000",
                      "123e4567-e89b-12d3-a456-426614174000"),
        "%{NUMBER:v}": ("pi=-3.14!", "-3.14"),
        "%{HOSTPORT:v}": ("at db-01.internal.example:5432 ok",
                          "db-01.internal.example:5432"),
        "%{SYSLOGTIMESTAMP:v}": ("Feb  5 17:32:18 host app: hi",
                                 "Feb  5 17:32:18"),
        "%{URI:v}": ("see https://u@h.example:8080/a/b?q=1 now",
                     "https://u@h.example:8080/a/b?q=1"),
        "%{EMAILADDRESS:v}": ("mail bob.smith@corp.example stop",
                              "bob.smith@corp.example"),
        "%{COMMONMAC:v}": ("if 00:1a:2b:3c:4d:5e up", "00:1a:2b:3c:4d:5e"),
    }
    for pat, (text, want) in cases.items():
        f, ok = grok_batch(compile_grok([pat]), pa.array([text]))
        assert ok.to_pylist() == [True], pat
        assert f["v"].to_pylist() == [want], pat


def test_unnamed_refs_match_without_capturing():
    f, ok = grok_batch(
        compile_grok(["^%{IPV4} -> %{WORD:verb}$"]),
        pa.array(["10.0.0.1 -> GET", "x -> GET"]),
    )
    assert ok.to_pylist() == [True, False]
    assert list(f) == ["verb"]


def test_no_capture_pattern_is_pure_filter():
    f, ok = grok_batch(
        compile_grok(["^%{IPV4}$"]), pa.array(["10.0.0.1", "nope"])
    )
    assert f == {}
    assert ok.to_pylist() == [True, False]


def test_first_match_wins_across_patterns():
    c = compile_grok(["id=%{MYID:id}", "uid=%{UUID:id}"],
                     {"MYID": r"[A-Z]{3}-[0-9]+"})
    f, ok = grok_batch(
        c,
        pa.array([
            "id=ABC-42",
            "uid=123e4567-e89b-12d3-a456-426614174000",
            # matches BOTH (id= line also contains uid text): pattern
            # order decides
            "id=XYZ-7 uid=123e4567-e89b-12d3-a456-426614174000",
            "neither",
        ]),
    )
    assert f["id"].to_pylist() == [
        "ABC-42", "123e4567-e89b-12d3-a456-426614174000", "XYZ-7", None,
    ]
    assert ok.to_pylist() == [True, True, True, False]


def test_cross_pattern_type_conflict_degrades_to_string():
    c = compile_grok(["n=%{INT:val:int}", "s=%{WORD:val}"])
    f, _ = grok_batch(c, pa.array(["n=5", "s=abc"]))
    assert f["val"].type == pa.string()
    assert f["val"].to_pylist() == ["5", "abc"]


def test_float_and_boolean_types():
    c = compile_grok([r"%{NUMBER:x:float} %{WORD:b:boolean}"])
    f, _ = grok_batch(c, pa.array(["1.5 true", "2 FALSE"]))
    assert f["x"].to_pylist() == [1.5, 2.0]
    assert f["b"].to_pylist() == [True, False]


def test_processor_failure_flag_and_ignore():
    t = pa.table({"text": [LINE, "nope"]})
    flagged = build_processor({"grok": {"patterns": [PAT]}})(t)
    assert flagged["log.flags"].to_pylist() == [None, "grok_parsing_error"]
    quiet = build_processor(
        {"grok": {"patterns": [PAT], "ignore_failure": True}}
    )(t)
    assert "log.flags" not in quiet.column_names
    assert quiet["grok.level"].to_pylist() == ["error", None]


def test_overwrite_keys_semantics():
    t = pa.table({
        "text": ["v=1", "v=2"],
        "grok.n": pa.array([None, 99], pa.int64()),
    })
    cfg = {"patterns": ["v=%{INT:n:int}"], "ignore_failure": True}
    keep = build_processor({"grok": cfg})(t)
    assert keep["grok.n"].to_pylist() == [1, 99]  # existing value wins
    clobber = build_processor({"grok": {**cfg, "overwrite_keys": True}})(t)
    assert clobber["grok.n"].to_pylist() == [1, 2]


def test_when_condition_masks_rows():
    t = pa.table({"text": ["v=1", "v=2"], "role": ["user", "tool"]})
    proc = build_processor({
        "grok": {"patterns": ["v=%{INT:n:int}"], "ignore_failure": True},
        "when": {"equals": {"role": "tool"}},
    })
    out = proc(t)
    assert out["grok.n"].to_pylist() == [None, 2]


def test_unknown_pattern_and_cycles_fail_at_build():
    with pytest.raises(GrokError, match="unknown grok pattern"):
        expand_pattern("%{NO_SUCH_THING:x}")
    with pytest.raises(GrokError, match="depth"):
        expand_pattern("%{A:x}", {"A": "%{B}", "B": "%{A}"})
    with pytest.raises(GrokError, match="duplicate semantic"):
        compile_grok(["%{INT:x} %{INT:x}"])
    with pytest.raises(GrokError, match="patterns"):
        build_processor({"grok": {}})


def test_unknown_config_key_rejected():
    with pytest.raises(Exception, match="unexpected_key"):
        build_processor({"grok": {"patterns": ["%{INT:x}"],
                                  "unexpected_key": 1}})


def test_apache_common_log_composed():
    line = ('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326')
    # capture-free composite validates the line shape...
    _, ok = grok_batch(compile_grok(["^%{COMMONAPACHELOG}$"]),
                       pa.array([line, "garbage"]))
    assert ok.to_pylist() == [True, False]
    # ...and the same vocabulary composes with semantics
    f, ok2 = grok_batch(compile_grok([
        r'^%{IPORHOST:client} %{USER} %{USER:auth} \[%{HTTPDATE:ts}\] '
        r'"%{HTTPMETHOD:verb} %{NOTSPACE:path}(?: HTTP/%{NUMBER:httpv})?" '
        r"%{NONNEGINT:code:int} (?:%{NONNEGINT:bytes:int}|-)$"
    ]), pa.array([line]))
    assert ok2.to_pylist() == [True]
    assert f["client"].to_pylist() == ["127.0.0.1"]
    assert f["verb"].to_pylist() == ["GET"]
    assert f["code"].to_pylist() == [200]
    assert f["bytes"].to_pylist() == [2326]


def test_raw_named_groups_are_captures():
    f, ok = grok_batch(
        compile_grok([r"(?P<word>[a-z]+)=%{INT:n:int}"]),
        pa.array(["abc=9"]),
    )
    assert f["word"].to_pylist() == ["abc"]
    assert f["n"].to_pylist() == [9]


def test_custom_field_name():
    t = pa.table({"message": ["v=7"], "text": ["ignored"]})
    out = build_processor({
        "grok": {"patterns": ["v=%{INT:n:int}"], "field": "message",
                 "ignore_failure": True}
    })(t)
    assert out["grok.n"].to_pylist() == [7]


# ---------------------------------------------------------------------------
# Cross-engine property check: Python `re` as an independent oracle.
# Both Python re and Arrow's RE2 use leftmost-first alternation and
# greedy quantifiers, so on the (lookaround-free) expanded patterns the
# first-match extraction must agree byte-for-byte.
# ---------------------------------------------------------------------------

import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st

from beats_ray.processors.grok import expand_pattern

_PATS = [
    "%{IPV4:v}",
    "%{IP:v}",
    "%{NUMBER:v}",
    "%{TIMESTAMP_ISO8601:v}",
    "%{UUID:v}",
    "%{HOSTPORT:v}",
    "level=%{LOGLEVEL:v}",
    "%{WORD:a} %{NONNEGINT:v}",
]

_fragments = st.sampled_from([
    "10.0.0.1", "256.1.2.3", "2001:db8::1", "::1", "fe80::", "x::",
    "1.5", "-3.14", ".5", "1..2", "+7",
    "2026-08-20T07:00:00Z", "2026-8-20 07:00", "9999-99-99",
    "123e4567-e89b-12d3-a456-426614174000", "123e4567-e89b",
    "db-01.example:5432", "host:0", "level=INFO", "level=noise",
    "word 42", "word -1", "", " ", "a=b", "哈哈", "tab\there",
])


@st.composite
def _texts(draw):
    parts = draw(st.lists(_fragments, min_size=0, max_size=4))
    return " ".join(parts)


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(_texts(), min_size=1, max_size=8),
       pat=st.sampled_from(_PATS))
def test_grok_agrees_with_python_re(texts, pat):
    rx, caps = expand_pattern(pat)
    # re.ASCII mirrors RE2's default ASCII \w/\b/\d/\s classes (Python
    # re is Unicode-classed by default — the one semantic divergence)
    prx = _re.compile(rx, _re.ASCII)
    f, ok = grok_batch(compile_grok([pat]), pa.array(texts, pa.string()))
    got_v = f["v"].to_pylist() if "v" in f else [None] * len(texts)
    for i, text in enumerate(texts):
        m = prx.search(text)
        assert ok[i].as_py() == (m is not None), (pat, text)
        want = None
        if m is not None:
            for alias, semantic, _ in caps:
                if semantic == "v":
                    want = m.group(alias)
        if got_v[i] is not None or want is not None:
            assert str(got_v[i]) == str(want), (pat, text, got_v[i], want)


def test_webaccess_preset_parses_and_routes():
    """The configs/webaccess.yaml module-style preset (nginx/apache
    archetype): YAML → grok chain + status-class router, no Ray."""
    from pathlib import Path

    import yaml

    from beats_ray.processors import build_chain, run_chain
    from beats_ray.routing import Router

    cfg = yaml.safe_load(
        (Path(__file__).resolve().parent.parent / "configs"
         / "webaccess.yaml").read_text()
    )
    t = pa.table({"text": [
        '10.0.0.1 - alice [10/Oct/2000:13:55:36 -0700] "GET /index.html HTTP/1.0" 200 1043',
        '10.0.0.2 - - [10/Oct/2000:13:55:37 -0700] "POST /api/v1 HTTP/1.1" 503 -',
        '10.0.0.3 - bob [10/Oct/2000:13:55:38 -0700] "GET /nope HTTP/1.1" 404 12',
        "not an access log line",
    ]})
    out = run_chain(t, build_chain(cfg["processors"]))
    assert out["http.clientip"].to_pylist() == [
        "10.0.0.1", "10.0.0.2", "10.0.0.3", None]
    assert out["http.status"].to_pylist() == [200, 503, 404, None]
    assert out["http.bytes"].to_pylist() == [1043, None, 12, None]
    routed = Router(cfg["routes"])(out)
    assert routed["sink"].to_pylist() == [
        "ok", "server_errors", "client_errors", "unparsed"]
