"""Extended per-processor table-driven coverage — the processors that
did not yet have dedicated cases (mirrors the reference's exhaustive
*_test.go convention)."""

import pyarrow as pa
import pytest

from beats_ray.processors import build_processor


def run(spec, t):
    return build_processor(spec)(t)


def test_append_values_and_fields():
    t = pa.table({"a": ["x", None], "b": ["y", "z"], "tags": ["t0", None]})
    out = run({"append": {"target_field": "tags", "fields": ["a", "b"],
                          "values": ["v1"]}}, t)
    assert out["tags"].to_pylist() == ["t0,x,y,v1", "z,v1"]


def test_extract_field_positive_and_negative_index():
    t = pa.table({"path": ["a/b/c", "solo"]})
    out = run({"extract_field": {"field": "path", "separator": "/",
                                 "index": 0, "target": "first"}}, t)
    assert out["first"].to_pylist() == ["a", "solo"]
    out = run({"extract_field": {"field": "path", "separator": "/",
                                 "index": -1, "target": "last"}}, t)
    assert out["last"].to_pylist() == ["c", "solo"]


def test_move_fields_prefix():
    t = pa.table({"kube.pod": ["p"], "kube.ns": ["n"], "other": ["o"]})
    out = run({"move_fields": {"from": "kube.", "to": "k8s."}}, t)
    assert set(out.column_names) == {"k8s.pod", "k8s.ns", "other"}


def test_decode_csv_fields_quoting():
    t = pa.table({"line": ['a,"b,c",d', None]})
    out = run({"decode_csv_fields": {"fields": {"line": "cols"}}}, t)
    assert out["cols"].to_pylist() == [["a", "b,c", "d"], None]


def test_detect_mime_type_magics():
    t = pa.table({"payload": ["\x89PNG rest", "{\"j\": 1}", "plain words"]})
    out = run({"detect_mime_type": {"field": "payload"}}, t)
    assert out["mime_type"].to_pylist() == [
        "image/png", "application/json", "text/plain"
    ]


def test_registered_domain_etld():
    t = pa.table({"domain": ["a.b.example.co.uk", "www.example.com", "localhost"]})
    out = run({"registered_domain": {}}, t)
    assert out["registered_domain"].to_pylist() == [
        "example.co.uk", "example.com", "localhost"
    ]


def test_add_data_stream_index():
    t = pa.table({"x": [1]})
    out = run({"add_data_stream": {"type": "logs", "dataset": "transcripts",
                                   "namespace": "prod"}}, t)
    assert out["meta.index"][0].as_py() == "logs-transcripts-prod"


def test_add_locale_and_host_metadata():
    t = pa.table({"x": [1]})
    out = run({"add_locale": {"timezone": "+02:00"}}, t)
    assert out["event.timezone"][0].as_py() == "+02:00"
    out = run({"add_host_metadata": {"host": {"name": "n1"}}}, t)
    assert out["host.name"][0].as_py() == "n1"


def test_case_fold_field_names():
    t = pa.table({"Mixed": [1], "UPPER": [2], "keep": [3]})
    out = run({"lowercase": {"fields": ["Mixed"]}}, t)
    assert set(out.column_names) == {"mixed", "UPPER", "keep"}
    out = run({"uppercase": {}}, t)  # no list = all fields
    assert set(out.column_names) == {"MIXED", "UPPER", "KEEP"}


def test_timeseries_instance_hash_stable():
    t = pa.table({"host": ["h1", "h1", "h2"], "metric": ["m", "m", "m"]})
    out = run({"timeseries": {"fields": ["host", "metric"]}}, t)
    vals = out["timeseries.instance"].to_pylist()
    assert vals[0] == vals[1] != vals[2]


def test_add_id_deterministic():
    t = pa.table({"conv_id": ["c1", "c1"], "turn_idx": [0, 0]})
    out1 = run({"add_id": {}}, t)
    out2 = run({"add_id": {}}, t)
    assert out1["meta.doc_id"].to_pylist() == out2["meta.doc_id"].to_pylist()


def test_dissect_ignore_failure_vs_flag():
    t = pa.table({"text": ["level=x", "nope"]})
    tok = {"tokenizer": "level=%{level}"}
    flagged = run({"dissect": tok}, t)
    assert flagged["log.flags"].to_pylist() == [None, "dissect_parsing_error"]
    silent = run({"dissect": {**tok, "ignore_failure": True}}, t)
    assert "log.flags" not in silent.column_names


def test_dissect_trim_config():
    t = pa.table({"text": ["k=  v  "]})
    out = run({"dissect": {"tokenizer": "k=%{v}", "trim_values": "all"}}, t)
    assert out["dissect.v"][0].as_py() == "v"


def test_convert_rename_mode():
    t = pa.table({"n": ["1", "2"]})
    out = run({"convert": {"fields": [{"from": "n", "to": "m", "type": "long"}],
                           "mode": "rename"}}, t)
    assert "n" not in out.column_names
    assert out["m"].to_pylist() == [1, 2]


def test_convert_ip_validation():
    t = pa.table({"ip": ["10.0.0.1", "999.1.1.1", None]})
    out = run({"convert": {"fields": [{"from": "ip", "to": "ip2", "type": "ip"}]}}, t)
    assert out["ip2"].to_pylist() == ["10.0.0.1", None, None]
    assert out["error.message"][1].as_py() is not None
    assert out["error.message"][2].as_py() is None  # null input is not an error


def test_timestamp_multiple_layouts():
    t = pa.table({"ts_str": ["2026-01-01T00:00:00Z", "01/02/2026 03:04:05"]})
    out = run({"timestamp": {"field": "ts_str", "target": "parsed",
                             "layouts": ["%Y-%m-%dT%H:%M:%SZ",
                                         "%d/%m/%Y %H:%M:%S"]}}, t)
    vals = [str(v) for v in out["parsed"].to_pylist()]
    assert vals == ["2026-01-01 00:00:00", "2026-02-01 03:04:05"]


def test_decompress_gzip_field():
    import gzip

    payload = gzip.compress(b"hello gz").decode("latin-1")
    t = pa.table({"raw": [payload, "not-gzip"]})
    out = run({"decompress_gzip_field": {"field": {"from": "raw", "to": "txt"}}}, t)
    assert out["txt"].to_pylist()[0] == "hello gz"
    assert out["error.message"][1].as_py() is not None


def test_drop_fields_protected():
    t = pa.table({"ts": [1], "conv_id": ["c"], "extra": [2]})
    out = run({"drop_fields": {"fields": ["ts", "conv_id", "extra"]}}, t)
    # @timestamp-equivalents are protected (drop_fields.go semantics)
    assert set(out.column_names) == {"ts", "conv_id"}
