"""Regression tests for the round-1 code-review findings — each case
previously crashed a whole batch or silently produced wrong results."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from beats_ray.processors import build_processor


def test_syslog_alphanumeric_procid():
    # RFC5424 PROCID may be any token; used to crash the batch on cast
    t = pa.table({"text": ["<34>1 2026-01-01T00:00:07Z host app ID47 M - hi"]})
    out = build_processor({"syslog": {"format": "rfc5424"}})(t)
    assert out["syslog.ok"][0].as_py()
    assert out["syslog.pid"][0].as_py() is None  # non-numeric → null


def test_parse_stage_with_column_dropping_processor():
    # ParseStage used to KeyError when a processor dropped/renamed a column
    from beats_ray.pipeline import ParseStage

    cfg = {"processors": [{"rename": {"fields": [{"from": "tool", "to": "tool2"}]}}]}
    t = pa.table({"conv_id": ["c"], "turn_idx": [0], "role": ["user"],
                  "tool": ["bash"], "text": ["x"]})
    out = ParseStage(cfg)(t)
    assert "tool2" in out.column_names and "tool" not in out.column_names


def test_if_then_else_typed_branch_columns():
    # then-branch adds an int64 column; else-branch padding used to be
    # string-typed nulls → ArrowTypeError at concat
    spec = {
        "if": {"equals": {"k": "json"}},
        "then": [{"decode_json_fields": {"fields": ["text"],
                                         "expected": {"duration_ms": "int64"}}}],
        "else": [],
    }
    t = pa.table({"k": ["json", "other"],
                  "text": ['{"duration_ms": 5}', "plain"]})
    out = build_processor(spec)(t)
    assert out["parsed.duration_ms"].type == pa.int64()
    assert sorted(out["parsed.duration_ms"].to_pylist(), key=lambda x: (x is None, x)) == [5, None]


def test_truncate_max_bytes_multibyte_boundary():
    # slicing mid-codepoint used to raise ArrowInvalid for the batch
    t = pa.table({"text": ["héllo wörld", "ascii"]})
    out = build_processor({"truncate_fields": {"fields": ["text"], "max_bytes": 2}})(t)
    assert out["text"].to_pylist() == ["h", "as"]  # partial 'é' dropped
    from beats_ray.sources import line_reader_chain
    import ray.data as rd


def test_line_reader_multibyte_truncation(ray_session):
    import ray.data as rd

    from beats_ray.sources import line_reader_chain

    out = line_reader_chain(
        rd.from_items([{"text": "é" * 10}]), max_bytes=3
    ).to_pandas()
    assert out["text"][0] == "é"  # 3 bytes = é (2) + partial (dropped)


def test_dissect_typed_key_bad_value_is_null_not_crash():
    from beats_ray.dissect import compile_tokenizer, dissect_batch

    cd = compile_tokenizer("n=%{n|integer}")
    fields, ok = dissect_batch(cd, pa.array(["n=42", "n=abc"]))
    assert fields["n"].to_pylist() == [42, None]
    assert ok.to_pylist() == [True, True]


def test_when_drop_fields_nulls_matching_rows():
    # column removal under when: = per-event deletion → null for matches
    t = pa.table({"role": ["user", "bot"], "secret": ["a", "b"]})
    out = build_processor(
        {"drop_fields": {"fields": ["secret"]}, "when": {"equals": {"role": "user"}}}
    )(t)
    assert out["secret"].to_pylist() == [None, "b"]


def test_when_drops_rows_processor_keeps_column_outputs():
    # container under when: used to filter but lose the decoded columns
    t = pa.table({"k": ["go", "skip"],
                  "text": ['{"log":"l\\n","stream":"stdout","time":"t"}'] * 2})
    out = build_processor(
        {"container": {}, "when": {"equals": {"k": "go"}}}
    )(t)
    got = dict(zip(out["k"].to_pylist(), out["container.log"].to_pylist()))
    assert got == {"go": "l\n", "skip": None}


def test_network_public_condition():
    from beats_ray.conditions import compile_condition

    t = pa.table({"ip": ["8.8.8.8", "10.0.0.1", "127.0.0.1", "not-ip"]})
    m = compile_condition({"network": {"ip": "public"}})(t).to_pylist()
    assert m == [True, False, False, False]


def test_function_processor_registered_via_package_import():
    # previously only registered if beats_ray.functions was imported
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from beats_ray.processors import registry\n"
        "assert 'function' in registry(), sorted(registry())\n"
        "print('ok')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]


def test_base64_fail_on_error_false_no_annotation():
    t = pa.table({"b": ["!!!"]})
    out = build_processor(
        {"decode_base64_field": {"field": {"from": "b", "to": "b2"},
                                 "fail_on_error": False}}
    )(t)
    assert "error.message" not in out.column_names
    # the reference leaves the event UNTOUCHED on failure: the separate
    # target is never populated (the source keeps the raw payload)
    assert out["b2"][0].as_py() is None
    assert out["b"][0].as_py() == "!!!"


def test_minhash_uint64_exact():
    import numpy as np

    from beats_ray.dataops.dedup import MinHasher, _MERSENNE

    mh = MinHasher()
    sig = mh.signature({2**32 - 1, 12345})
    assert sig.dtype == np.uint64
    assert (sig < _MERSENNE).all()
    # exactness: recompute one permutation in python ints
    x = np.uint64(12345)
    expect = (int(mh.a[0]) * 12345 + int(mh.b[0])) % _MERSENNE
    vals = (mh.a[0] * x + mh.b[0]) % np.uint64(_MERSENNE)
    assert int(vals) == expect


def test_stream_wipes_uncommitted_window(ray_session, sf0001_dir, tmp_path):
    """Crash between a window's write and its lineage commit must not
    double-count on resume (stale dir wiped before re-write)."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from beats_ray.dataops.agg import grouped_count
    from beats_ray.pipeline import build_dataset
    from beats_ray.stream import MicroBatchRunner
    import ray.data as rd

    files = sorted(_glob.glob(sf0001_dir + "/part-*.parquet"))[:2]
    runner = MicroBatchRunner(str(tmp_path / "s"), window_s=3600)
    # plant a stale uncommitted window dir full of junk rows
    import pyarrow.parquet as pqw

    first_w = 1767225600_000_000 // (3600 * 1_000_000)
    stale = tmp_path / "s" / f"window={first_w}" / "sink=ghost"
    stale.mkdir(parents=True)
    pqw.write_table(pa.table({"x": list(range(100))}), stale / "junk.parquet")

    totals = runner.run(files)
    batch = {
        r["sink"]: int(r["n"])
        for r in grouped_count(
            build_dataset(rd.read_parquet(files), num_parts=8), ["sink"]
        ).iter_rows()
    }
    assert totals["rows_routed"] == batch  # no ghost rows, no double count


def test_sink_rotation_cap(ray_session, sf0001_dir, tmp_path):
    """max_rows_per_file is a CAP (rotation), not a floor."""
    import glob as _glob
    import json as _json

    import ray.data as rd

    from beats_ray.pipeline import build_dataset
    from beats_ray.sinks import write_routed

    files = sorted(_glob.glob(sf0001_dir + "/part-*.parquet"))[:1]
    routed = build_dataset(rd.read_parquet(files), num_parts=8)
    metrics = write_routed(
        routed, str(tmp_path / "o"),
        sinks={"default": {"format": "ndjson", "max_rows_per_file": 100}},
    )
    conv = tmp_path / "o" / "sink=default" / "_ndjson"
    sizes = [sum(1 for _ in open(p)) for p in conv.iterdir()]
    assert max(sizes) <= 100 + 1  # cap holds (repartition is row-exact)


def test_bucket_join_mixed_key_dtypes(ray_session):
    """int keys on one side, numeric strings on the other must co-locate
    (previously bucketed by different hash rules -> silent empty join)."""
    import ray.data as rd

    from beats_ray.dataops.joins import _bucket_of
    import pandas as pd

    a = _bucket_of(pd.Series([7, 8, 9]), 32)
    b = _bucket_of(pd.Series(["7", "8", "9"]), 32)
    assert a.tolist() == b.tolist()
    # null keys survive (left-join rows), no IntCastingNaNError
    c = _bucket_of(pd.Series([7.0, None]), 32)
    assert len(c) == 2


def test_bucket_join_left_with_empty_right_bucket(ray_session):
    import ray.data as rd

    from beats_ray.dataops.joins import bucket_hash_join

    left = rd.from_items([{"k": i, "x": i} for i in range(40)])
    right = rd.from_items([{"rk": 0, "y": "only-bucket-zero"}])
    out = (
        bucket_hash_join(left, right, "k", "rk", buckets=8, how="left")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 40  # every left row survives
    assert "y" in out.columns
    assert out.loc[0, "y"] == "only-bucket-zero"
    assert out["y"].notna().sum() == 1


def test_ann_empty_block(ray_session):
    import numpy as np
    import ray.data as rd

    from beats_ray.dataops.ann import brute_topk

    vecs = np.random.RandomState(3).randn(10, 8).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(10)]
    ).repartition(20)  # more blocks than rows -> empty blocks guaranteed
    out = brute_topk(ds, vecs[:1].astype(np.float64), k=3)
    assert len(out) == 3


def test_extract_field_out_of_bounds_positive():
    t = pa.table({"p": ["a/b/c", "x"]})
    out = build_processor({"extract_field": {"field": "p", "separator": "/",
                                             "index": 2, "target": "t2"}})(t)
    assert out["t2"].to_pylist() == ["c", None]  # no batch crash


def test_decode_json_multi_field_merge():
    t = pa.table({"a": ['{"event":"from_a"}', None],
                  "b": [None, '{"event":"from_b"}']})
    out = build_processor(
        {"decode_json_fields": {"fields": ["a", "b"],
                                "expected": {"event": "string"}}}
    )(t)
    assert out["parsed.event"].to_pylist() == ["from_a", "from_b"]


def test_condition_type_mismatch_is_false():
    from beats_ray.conditions import compile_condition

    t = pa.table({"status": ["200", "404"]})
    assert compile_condition({"equals": {"status": 200}})(t).to_pylist() == [
        False, False,
    ]
    t2 = pa.table({"n": [1, 2]})
    assert compile_condition({"contains": {"n": "x"}})(t2).to_pylist() == [
        False, False,
    ]


def test_network_public_mixed_with_cidr():
    from beats_ray.conditions import compile_condition

    t = pa.table({"ip": ["10.1.5.5", "10.99.0.1", "8.8.8.8", "127.0.0.1"]})
    m = compile_condition({"network": {"ip": ["public", "10.1.0.0/16"]}})(t)
    # explicit CIDR OR public — not inverted by the public flag
    assert m.to_pylist() == [True, False, True, False]


def test_multiline_stats_missing_field_noop():
    t = pa.table({"other": ["x"]})
    out = build_processor({"multiline_stats": {"field": "message"}})(t)
    assert out.column_names == ["other"]


def test_dissect_typed_nonsimple_mixed_convertibility():
    from beats_ray.dissect import compile_tokenizer, dissect_batch

    cd = compile_tokenizer("%{v|integer} %{*p} %{&p}")
    fields, ok = dissect_batch(cd, pa.array(["12 k a", "xy k b"]))
    assert fields["v"].to_pylist() == [12, None]
    assert fields["k"].to_pylist() == ["a", "b"]


def test_parse_stage_without_text_column():
    from beats_ray.pipeline import ParseStage

    cfg = {"processors": [{"drop_fields": {"fields": ["text"]}}]}
    t = pa.table({"conv_id": ["c"], "turn_idx": [0], "role": ["user"],
                  "tool": ["none"], "text": ["level=x"]})
    out = ParseStage(cfg)(t)  # must not KeyError
    assert "text" not in out.column_names
    assert out["parsed.kind"].to_pylist() == ["none"]


def test_router_first_match_wins_with_unconditional():
    from beats_ray.routing import Router

    t = pa.table({"text": ["level=error x", "plain"], "level": ["error", "info"]})
    # unconditional FIRST rule catches everything (outil.Select order)
    r = Router([{"name": "catchall"},
                {"name": "errors", "when": {"contains": {"text": "error"}}}])
    assert r(t)["sink"].to_pylist() == ["catchall", "catchall"]
    # format-string unconditional rule is EVALUATED, not literal
    r2 = Router([{"name": "lvl-%{[level]}"}])
    assert r2(t)["sink"].to_pylist() == ["lvl-error", "lvl-info"]


def test_router_mappings_table_form():
    """`mappings:` selector (outil/select.go:289-296 LookupSelectorExpr
    via buildSingle select.go:288-325): the rule's key expression is
    looked up in a value->sink table; a missed lookup falls back to the
    rule's `default`, or — without one — leaves the row unrouted so the
    NEXT rule may claim it (mapSelector '' -> listSelector continues)."""
    from beats_ray.routing import Router

    t = pa.table({
        "level": ["error", "warn", "info", "debug"],
        "text": ["a", "b", "c", "d"],
    })
    r = Router([
        {"index": "%{[level]}",
         "mappings": {"error": "critical-sink", "warn": "watch-sink"},
         "when": {"has_fields": ["level"]}},
        {"name": "rest"},
    ])
    assert r(t)["sink"].to_pylist() == [
        "critical-sink", "watch-sink", "rest", "rest",
    ]
    assert "critical-sink" in r.sink_names and "watch-sink" in r.sink_names

    # with a rule-level default the mapping rule itself absorbs misses
    r2 = Router([
        {"index": "%{[level]}",
         "mappings": {"error": "critical-sink"}, "default": "other"},
        {"name": "unreachable"},
    ])
    assert r2(t)["sink"].to_pylist() == [
        "critical-sink", "other", "other", "other",
    ]


def test_minhash_bands_not_dividing_num_perm():
    """Band byte-slicing is computed per doc ROW: with bands that do not
    divide num_perm the leftover permutations are ignored (same as the
    per-doc signature path), never folded into a cross-row window."""
    import hashlib

    import pandas as pd

    from beats_ray.dataops.dedup import MinHasher, word_shingles

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["a b c d e f", "g h i j k l"]})
    out = MinHasher(num_perm=64, bands=12, shingle_k=3)(df)
    assert len(out) == 24  # 2 docs x 12 bands, rows_per_band = 5
    sig = MinHasher(64, 12, 3).signature(word_shingles("a b c d e f", 3))
    exp = hashlib.blake2b(sig[0:5].tobytes(), digest_size=8).hexdigest()
    assert out["band_hash"].iloc[0] == exp


def test_asof_join_null_tie_value_loses(ray_session):
    """A right row whose tie column is NULL must lose to any non-null
    tie at the same (key, ts) — matching the oracle's ORDER BY tie DESC
    (DuckDB places nulls last on DESC)."""
    import pandas as pd
    import ray.data as rd

    from beats_ray.dataops.joins import asof_join

    base = pd.Timestamp("2024-05-01")
    left = rd.from_items([{"k": 1, "ts": base, "ev": 7}])
    right = rd.from_items([
        {"k": 1, "ts": base, "v": None},
        {"k": 1, "ts": base, "v": "real"},
    ])
    out = asof_join(left, right, key="k", tie_cols=["v"],
                    buckets=2).to_pandas()
    assert out["v"].tolist() == ["real"]


def test_dns_cache_replay_null_keys(ray_session):
    """Null query keys form ONE chain (NaN != NaN must not reset the
    expiry every row, and None must not collide with the loop's
    no-previous-key sentinel)."""
    import pandas as pd
    import ray.data as rd

    from beats_ray.dataops.dnscache import dns_cache_replay

    base = pd.Timestamp("2024-05-01")
    rows = [{"event_id": i, "query": None,
             "ts": base + pd.Timedelta(seconds=s)}
            for i, s in enumerate([0, 10, 30])]
    out = dns_cache_replay(
        rd.from_items(rows), resolutions={}, failure_ttl_s=20, buckets=2,
    ).to_pandas().sort_values("event_id")
    assert out["cache"].tolist() == ["miss", "hit", "miss"]


def test_window_dup_spans_string_ids(ray_session):
    """id_col dtype follows the input column — string doc ids work."""
    import ray.data as rd

    from beats_ray.dataops.dedup import window_dup_spans

    span = " ".join(f"s{i}" for i in range(30))
    docs = rd.from_items([
        {"doc_id": "u1", "text": span},
        {"doc_id": "u2", "text": "x " + span},
        {"doc_id": "u3", "text": " ".join(f"c{i}" for i in range(30))},
    ])
    out = window_dup_spans(docs, k=10, sample_mod=2, buckets=2).to_pandas()
    assert sorted(out["doc_id"]) == ["u1", "u2"]


def test_dns_cache_config_parsed_and_validated():
    """success_cache/failure_cache (dns config.go:32-44) parse to
    attributes on the processor for the event-time replay model; bad
    TTLs fail eagerly."""
    from beats_ray.processors.base import build_processor

    p = build_processor({"dns": {
        "resolutions": {}, "success_cache": {"min_ttl": 60},
        "failure_cache": {"ttl": 30},
    }})
    assert p.success_min_ttl_s == 60 and p.failure_ttl_s == 30

    with pytest.raises(ValueError, match="failure_cache"):
        build_processor({"dns": {"failure_cache": {"ttl": 0}}})


def test_dedup_seen_state_dataset_equals_dataframe(ray_session):
    """dedup_by_doc_id accepts the carried seen-id state as a pandas
    DataFrame (broadcast path) or a Dataset (distributed anti-join for
    corpus-proportional state) — both produce identical survivors and
    identical emitted state."""
    import pandas as pd
    import ray.data as rd

    from beats_ray.sinks import dedup_by_doc_id

    base = pd.Timestamp("2024-05-01")
    ds = rd.from_items([
        {"meta.doc_id": d, "ts": base + pd.Timedelta(seconds=s)}
        for d, s in [("a", 1), ("b", 2), ("c", 3), ("b", 4)]
    ])
    seen_df = pd.DataFrame({"meta.doc_id": ["a"], "last_us": [0]})
    seen_ds = rd.from_pandas(seen_df)

    for emit in (False, True):
        out_df = dedup_by_doc_id(ds, seen_state=seen_df, emit_state=emit,
                                 buckets=2).to_pandas()
        out_ds = dedup_by_doc_id(ds, seen_state=seen_ds, emit_state=emit,
                                 buckets=2).to_pandas()
        left = out_df.sort_values("meta.doc_id").reset_index(drop=True)
        right = out_ds.sort_values("meta.doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(left[sorted(left.columns)],
                                      right[sorted(right.columns)])
        assert left["meta.doc_id"].tolist() == ["b", "c"]


def test_decode_json_heterogeneous_value_types():
    """A JSON key whose value type varies across rows must null only the
    bad rows, not crash the batch or wipe the column."""
    from beats_ray.processors.base import build_processor

    t = pa.table({"text": [
        '{"duration_ms": 5}', '{"duration_ms": "fast"}',
        '{"duration_ms": 7}', "not json",
    ]})
    out = build_processor({"decode_json_fields": {
        "fields": ["text"], "expected": {"duration_ms": "int64"},
    }})(t)
    assert out["parsed.duration_ms"].to_pylist() == [5, None, 7, None]


def test_cache_put_get_null_key_is_miss(ray_session):
    """A get with a NULL key must resolve as a miss, not crash the
    int64 restore cast after the asof join's NaN padding."""
    import pandas as pd
    import ray.data as rd

    from beats_ray.dataops.kvcache import cache_put_get

    base = pd.Timestamp("2024-05-01")
    ops = rd.from_items([
        {"k": 1, "ts": base, "op": "put", "v": 42},
        {"k": 1, "ts": base + pd.Timedelta(seconds=1), "op": "get", "v": 0},
        {"k": None, "ts": base + pd.Timedelta(seconds=2), "op": "get", "v": 0},
    ])
    out = cache_put_get(ops, buckets=2).to_pandas()
    hits = out.set_index(out["k"].astype("string"))
    assert bool(hits.loc["1", "hit"]) is True
    null_row = out[out["k"].isna()]
    assert len(null_row) == 1 and not bool(null_row["hit"].iloc[0])


def test_dissect_does_not_null_prior_values_on_failure():
    """processor.go: a failed parse leaves the event untouched — a row
    an earlier dissect populated keeps its values; overwrite_keys=False
    flags conflicts and keeps the old value."""
    from beats_ray.processors.base import build_processor

    t = pa.table({"text": ["job 5 done", "completely different"]})
    p1 = build_processor({"dissect": {"tokenizer": "job %{id} done"}})
    t = p1(t)
    assert t["dissect.id"].to_pylist() == ["5", None]
    # second chained dissect: row 0 fails (keeps "5"), row 1 matches
    p2 = build_processor({"dissect": {"tokenizer": "completely %{id}"}})
    out = p2(t)
    assert out["dissect.id"].to_pylist() == ["5", "different"]

    # overwrite_keys=true lets a successful parse replace
    p3 = build_processor({"dissect": {"tokenizer": "job %{id} done",
                                      "overwrite_keys": True}})
    out2 = p3(pa.table({"text": ["job 9 done"],
                        "dissect.id": ["old"]}))
    assert out2["dissect.id"].to_pylist() == ["9"]


def test_dissect_cast_failure_keeps_old_values_for_failed_rows():
    """ADVICE regression: when the prior target column cannot cast to
    the new array's type (string "old" vs an int-converted key), the
    merge falls back to string space — rows whose parse FAILED must
    still keep their previously-populated values instead of being
    replaced wholesale."""
    from beats_ray.processors.base import build_processor

    p = build_processor(
        {"dissect": {"tokenizer": "n=%{id|integer}"}}
    )
    t = pa.table({"text": ["n=7", "nope"],
                  "dissect.id": ["old0", "old1"]})
    out = p(t)
    # row 0 parsed but overwrite_keys=False keeps the existing value
    # (and flags the conflict); row 1 failed and must keep "old1"
    assert out["dissect.id"].to_pylist() == ["old0", "old1"]

    p2 = build_processor(
        {"dissect": {"tokenizer": "n=%{id|integer}",
                     "overwrite_keys": True}}
    )
    out2 = p2(t)
    assert out2["dissect.id"].to_pylist() == ["7", "old1"]


def test_condition_empty_combinator_fails_eagerly():
    from beats_ray.conditions import compile_condition

    with pytest.raises(ValueError, match="at least one"):
        compile_condition({"and": []})
    with pytest.raises(ValueError, match="at least one"):
        compile_condition({"or": []})


def test_explode_lines_strips_crlf(ray_session):
    import ray.data as rd

    from beats_ray.stages.multiline import explode_lines

    out = explode_lines(
        rd.from_items([{"conv_id": "c", "turn_idx": 0,
                        "text": "cmd \\\r\ncont\r\nlast"}])
    ).to_pandas()
    assert out["line"].tolist() == ["cmd \\", "cont", "last"]


def test_dead_letter_route_empty_batch_and_missing_text(ray_session):
    """Empty blocks pass through schema-stable (pa.array([]) is
    null-typed and used to crash pc.invert); a batch without the text
    column skips the size check instead of raising KeyError."""
    import ray.data as rd

    from beats_ray.sinks import dead_letter_route

    ds = rd.from_items([{"sink": "es", "text": "x" * 10}]).filter(
        lambda r: False
    )
    out = dead_letter_route(ds, max_text_bytes=5).to_pandas()
    assert len(out) == 0

    ds2 = rd.from_items([{"sink": "es", "other": 1}])
    out2 = dead_letter_route(ds2, max_text_bytes=5).to_pandas()
    assert out2["sink"].tolist() == ["es"]


def test_ann_batch_tiebreak_matches_oracle(ray_session):
    """Per-batch top-k must break exact-sim ties by vec_id ASC like the
    global merge and the SQL oracle — not by row position within the
    block."""
    import numpy as np
    import ray.data as rd

    from beats_ray.dataops.ann import brute_topk

    v = [1.0, 0.0]
    rows = [{"vec_id": i, "embedding": v} for i in (9, 5, 3, 7, 1)]
    ds = rd.from_items(rows)
    out = brute_topk(ds, np.array([v]), k=2)
    assert out["vec_id"].tolist() == [1, 3]  # lowest ids win the tie


def test_rename_fail_on_error_false_keeps_target():
    """rename.go: target-exists is an error; fail_on_error=false leaves
    BOTH fields untouched instead of silently overwriting the target."""
    from beats_ray.processors.base import build_processor

    t = pa.table({"a": ["v"], "b": ["orig"]})
    out = build_processor({"rename": {
        "fields": [{"from": "a", "to": "b"}], "fail_on_error": False,
    }})(t)
    assert out["b"].to_pylist() == ["orig"]
    assert out["a"].to_pylist() == ["v"]


def test_decode_base64_failure_restores_original():
    """decode_base64_field.go failOnError=true restores the backup
    event: the raw payload survives, annotated in-band."""
    from beats_ray.processors.base import build_processor

    t = pa.table({"payload": ["aGk=", "!!!not-base64!!!"]})
    out = build_processor({"decode_base64_field": {"field": "payload"}})(t)
    assert out["payload"].to_pylist() == ["hi", "!!!not-base64!!!"]
    assert "failed to decode" in (out["error.message"][1].as_py() or "")


def test_decode_duration_negative():
    from beats_ray.processors.base import build_processor

    t = pa.table({"d": ["-1h30m", "1.5s", "-250ms"]})
    out = build_processor({"decode_duration": {"field": "d"}})(t)
    assert out["d"].to_pylist() == [-5400.0, 1.5, -0.25]


def test_format_string_null_value_renders_like_missing():
    """A null field VALUE must not null the whole rendered string —
    it resolves like a missing field (token default, else '')."""
    from beats_ray.processors.metadata import compile_format_string

    t = pa.table({"app": ["web", None]})
    assert compile_format_string("logs-%{[app]}")(t).to_pylist() == [
        "logs-web", "logs-",
    ]
    assert compile_format_string("logs-%{[app]:other}")(t).to_pylist() == [
        "logs-web", "logs-other",
    ]


def test_stream_runner_validates_stage_specs_eagerly(ray_session, tmp_path):
    """Review regression: the stateful window path applies stages with
    skip_stages=True, so apply_stages' validation never runs — the
    runner must validate the FULL stage list itself instead of silently
    dropping everything after a malformed entry."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from beats_ray.schema import TRANSCRIPT_SCHEMA
    from beats_ray.stream import MicroBatchRunner

    f = str(tmp_path / "part-0.parquet")
    pq.write_table(pa.table({
        "conv_id": ["c0"], "turn_idx": pa.array([0], pa.int32()),
        "role": ["user"], "text": ["x"], "tool": ["none"],
        "ts": pa.array([pd.Timestamp("2024-05-01")], pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA), f)
    bad = {"processors": [],
           "stages": [{"dedup": {"field": "conv_id"}}, "typo-entry"],
           "routes": [{"name": "default"}]}
    with pytest.raises(ValueError, match="single-key mapping"):
        MicroBatchRunner(str(tmp_path / "o"), window_s=3600).run([f], bad)
    bad2 = {"processors": [],
            "stages": [{"nope": {}}], "routes": [{"name": "default"}]}
    with pytest.raises(ValueError, match="unknown stage"):
        MicroBatchRunner(str(tmp_path / "o2"), window_s=3600).run([f], bad2)


def test_lsh_all_miss_batches_keep_schema(ray_session):
    """Review regression: blocks whose vectors hash outside every
    probed bucket must still emit int64/float64-typed (empty) frames,
    not float64 object-built ones — mixed block schemas otherwise."""
    import ray.data as rd

    from beats_ray.dataops.ann import lsh_topk

    rng = np.random.RandomState(9)
    vecs = rng.randn(256, 8)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(256)],
        override_num_blocks=16,
    )
    out = lsh_topk(ds, vecs[:2], k=3, n_planes=10, n_probe=1)
    assert str(out["vec_id"].dtype) in ("int64", "Int64")
    assert len(out) <= 6


def test_avi_top_down_dib_and_zero_fps():
    """Review regressions: negative biHeight (top-down DIB) must not be
    vertically mirrored; fps==0 raises cleanly instead of dividing."""
    import struct

    from beats_ray.dataops.codecs import decode_avi, encode_avi

    fr = (np.arange(2 * 4 * 4) % 256).astype(np.uint8).reshape(2, 4, 4)
    enc = bytearray(encode_avi(fr, fps=5))
    # flip biHeight negative + reverse each frame's rows in place: the
    # decoded result must equal the original frames
    strf_at = enc.find(b"strf") + 8
    w, h = struct.unpack_from("<ii", enc, strf_at + 4)
    struct.pack_into("<i", enc, strf_at + 8, -h)
    stride = (3 * w + 3) // 4 * 4
    pos = enc.find(b"00db")
    while pos != -1:
        size = struct.unpack_from("<I", enc, pos + 4)[0]
        body = pos + 8
        rows = np.frombuffer(bytes(enc[body:body + size]),
                             dtype=np.uint8).reshape(h, stride)
        enc[body:body + size] = rows[::-1].tobytes()
        pos = enc.find(b"00db", body + size)
    dec, fps = decode_avi(bytes(enc))
    want = np.repeat(fr[..., None], 3, axis=3)
    assert fps == 5 and (dec == want).all()

    # fps == 0 (dwRate < dwScale): clean ValueError
    enc2 = bytearray(encode_avi(fr, fps=5))
    strh_at = enc2.find(b"strh") + 8
    struct.pack_into("<II", enc2, strh_at + 20, 10, 5)  # scale>rate
    with pytest.raises(ValueError, match="no video stream"):
        decode_avi(bytes(enc2))


def test_dissect_mismatched_prior_type_is_schema_stable():
    """Review regression: with a prior column of a DIFFERENT type, the
    merge must land in string space for every batch — whether or not
    the values happen to cast — so one Dataset never mixes int64 and
    string blocks for the same column."""
    from beats_ray.processors.base import build_processor

    p = build_processor({"dissect": {"tokenizer": "n=%{id|integer}",
                                     "overwrite_keys": True}})
    # castable prior values ("9") and uncastable ("old") must yield the
    # SAME column type (string)
    t1 = p(pa.table({"text": ["n=7"], "dissect.id": ["9"]}))
    t2 = p(pa.table({"text": ["n=7"], "dissect.id": ["old"]}))
    assert t1["dissect.id"].type == t2["dissect.id"].type == pa.string()
    # equal prior type stays typed
    t3 = p(pa.table({"text": ["n=7"],
                     "dissect.id": pa.array([9], pa.int64())}))
    assert t3["dissect.id"].type == pa.int64()


def test_fingerprint_no_delimiter_injection():
    """Review regression: ('x|y','z') and ('x','y|z') joined with a raw
    '|' produced identical fingerprints — and fingerprint/add_id are
    the exact-dedup keys. The length-prefixed encoding is prefix-free;
    null and empty also hash differently."""
    from beats_ray.processors.base import build_processor

    p = build_processor({"fingerprint": {"fields": ["a", "b"]}})
    t = pa.table({"a": ["x|y", "x", None, ""],
                  "b": ["z", "y|z", "q", "q"]})
    fps = p(t)["fingerprint"].to_pylist()
    assert len(set(fps)) == 4  # all four rows distinct

    # empty fields list fails at BUILD time, not inside a worker
    with pytest.raises(ValueError, match="fields"):
        build_processor({"fingerprint": {}})


def test_network_condition_list_field_matches_any():
    """Review regression: a list-typed field (ECS related.ip) crashed
    the batch with TypeError: unhashable; must mask per-element ANY."""
    from beats_ray.conditions import compile_condition

    t = pa.table({"ips": [["8.8.8.8", "10.0.0.1"], ["10.0.0.2"], None]})
    m = compile_condition({"network": {"ips": "public"}})(t).to_pylist()
    assert m == [True, False, False]


def test_cache_put_get_str_kind_int_values(ray_session):
    """Review regression: value_kind='str' with int64 put values read
    back '7.0' (float64 promotion through the typed-null padding)."""
    import ray.data as rd

    from beats_ray.dataops.kvcache import cache_put_get

    base = pd.Timestamp("2024-05-01")
    ops = rd.from_items([
        {"k": 1, "ts": base, "op": "put", "v": 7},
        {"k": 1, "ts": base + pd.Timedelta(seconds=1), "op": "get", "v": 0},
    ])
    out = cache_put_get(ops, buckets=2, value_kind="str").to_pandas()
    assert out["cached"].tolist() == ["7"]


def test_line_strip_exactly_one_terminator(ray_session):
    """Review regression: rtrim('\\r\\n') ate content CR/LFs —
    'data\\r\\r\\n' must frame to 'data\\r' (one terminator stripped),
    both in the reader chain and in explode_lines."""
    import ray.data as rd

    from beats_ray.sources import line_reader_chain
    from beats_ray.stages.multiline import explode_lines

    out = line_reader_chain(
        rd.from_items([{"text": "data\r\r\n"}, {"text": "x\n"}])
    ).to_pandas()
    assert out["text"].tolist() == ["data\r", "x"]

    lines = explode_lines(
        rd.from_items([{"conv_id": "c", "text": "a\r\r\nb"}])
    ).to_pandas().sort_values("line_idx")
    assert lines["line"].tolist() == ["a\r", "b"]


def test_convert_preserves_failed_row_original():
    """Review regression: an in-place string->long convert destroyed
    the failed row's datum; it now rides error.convert.original."""
    from beats_ray.processors.base import build_processor

    p = build_processor({"convert": {"fields": [{"from": "a", "type": "long"}]}})
    out = p(pa.table({"a": ["1", "abc"]}))
    assert out["a"].to_pylist() == [1, None]
    assert out["error.convert.original"].to_pylist() == [None, "a=abc"]


def test_dissect_indirect_key_typed_conversion():
    """Review regression: %{&k|integer} stored the value at the dynamic
    target as a STRING (the convert loop only looked at static names)."""
    from beats_ray.dissect import DissectError, compile_tokenizer, dissect_batch

    cd = compile_tokenizer("%{*k} %{&k|integer}")
    assert cd.apply("port 8080") == {"port": 8080}
    f, ok = dissect_batch(cd, pa.array(["port 8080", "port abc"]))
    assert f["port"].to_pylist() == [8080, None]
    assert f["port"].type == pa.int64()
    # adjacent variable-width keys are an invalid tokenizer (the first
    # lazy capture always matched empty); fixed-length stays legal
    with pytest.raises(DissectError, match="zero-width"):
        compile_tokenizer("%{a}%{b}")
    assert compile_tokenizer("%{a#2}%{b}").apply("xxrest") == {
        "a": "xx", "b": "rest"
    }


def test_keyed_lookup_keeps_existing_on_miss():
    """Review regression: add_docker_metadata nulled pre-existing
    container.name on rows whose id missed the lookup table."""
    from beats_ray.processors.base import build_processor

    p = build_processor({
        "add_docker_metadata": {
            "index": {"abc": {"name": "svc-a", "image": "img",
                              "labels": "x"}},
        }
    })
    t = pa.table({"container.id": ["abc", "zzz"],
                  "container.name": [None, "pre-existing"]})
    out = p(t)
    assert out["container.name"].to_pylist() == ["svc-a", "pre-existing"]


def test_router_sanitizes_data_derived_sink_names(ray_session):
    """Review regression: a format-string sink rendered from event data
    containing '/' nested directories and mis-attributed rows."""
    from beats_ray.routing import Router

    r = Router([{"name": "logs-%{[svc]}"}, {"name": "default"}])
    t = pa.table({"svc": ["a/b", "ok", "x=y"]})
    sinks = r(t)["sink"].to_pylist()
    assert sinks == ["logs-a_b", "logs-ok", "logs-x_y"]


def test_normalize_text_keeps_nbsp_like_oracle(ray_session):
    """Review regression: utf8_trim_whitespace stripped NBSP edges the
    DuckDB oracle chain (RE2 \\s+ collapse + trim()) keeps."""
    import ray.data as rd

    from beats_ray.dataops.textnorm import normalize_text

    out = normalize_text(
        rd.from_items([{"text": "\xa0nbsp edge\xa0"}, {"text": "  x  "}])
    ).to_pandas()
    assert out["norm_text"].tolist() == ["\xa0nbsp edge\xa0", "x"]


def test_repetition_score_is_per_row(ray_session):
    """Review regression: duplicate-id rows pooled their word counts
    within a batch (batch-boundary-dependent scores)."""
    import ray.data as rd

    from beats_ray.dataops.textnorm import repetition_score

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [7, 7], "text": ["x x", "y"]}
    ))
    out = repetition_score(docs).to_pandas()
    assert sorted(zip(out["n_words"], out["top_word_n"])) == [(1, 1), (2, 2)]


def test_extract_array_out_of_bounds_is_null_not_crash():
    from beats_ray.processors.base import build_processor

    p = build_processor({"extract_array": {"field": "arr",
                                           "mappings": {"x": 2, "y": -1}}})
    out = p(pa.table({"arr": [["a", "b", "c"], ["q"], None]}))
    assert out["x"].to_pylist() == ["c", None, None]
    assert out["y"].to_pylist() == ["c", "q", None]


def test_copy_fields_never_silently_overwrites():
    from beats_ray.processors.base import build_processor

    p = build_processor({"copy_fields": {"fields": [{"from": "a", "to": "b"}]}})
    out1 = p(pa.table({"a": ["1"], "b": ["keep"]}))
    assert out1["b"].to_pylist() == ["keep"]  # rollback, not overwrite
    assert "exists" in out1["error.message"].to_pylist()[0]
    p2 = build_processor({"copy_fields": {"fields": [{"from": "a", "to": "b"}],
                                          "fail_on_error": False}})
    out = p2(pa.table({"a": ["1"], "b": ["keep"]}))
    assert out["b"].to_pylist() == ["keep"]


def test_community_id_malformed_port_is_null_not_crash():
    from beats_ray.processors.base import build_processor

    p = build_processor({"community_id": {}})
    t = pa.table({
        "source.ip": ["10.0.0.1", "10.0.0.1"],
        "destination.ip": ["10.0.0.2", "10.0.0.2"],
        "source.port": ["abc", "99999"],
        "destination.port": ["80", "80"],
        "network.transport": ["tcp", "tcp"],
    })
    out = p(t)
    assert out["network.community_id"].to_pylist() == [None, None]


def test_translate_default_skips_null_source():
    from beats_ray.processors.base import build_processor

    p = build_processor({"translate": {
        "field": "k", "target_field": "v",
        "dictionary": {"a": "A"}, "default": "DFLT",
    }})
    out = p(pa.table({"k": ["a", "zz", None]}))
    assert out["v"].to_pylist() == ["A", "DFLT", None]


def test_wineventlog_keeps_message_on_parse_failure():
    from beats_ray.processors.base import build_processor

    p = build_processor({"decode_xml_wineventlog": {"field": "message"}})
    t = pa.table({"message": ["<not-xml", "plain text"]})
    out = p(t)
    # neither row parsed — the original message column must survive
    assert out["message"].to_pylist() == ["<not-xml", "plain text"]


def test_stream_empty_corpus_returns_totals(ray_session, tmp_path):
    from beats_ray.stream import MicroBatchRunner

    totals = MicroBatchRunner(str(tmp_path / "s"), window_s=3600).run([])
    assert totals == {"rows_routed": {}, "windows_done": []}
