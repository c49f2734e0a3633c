"""Property-based tests (hypothesis) for the compilers — mirrors the
reference's table-driven breadth with generated cases."""

import string

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from beats_ray.conditions import compile_condition
from beats_ray.dissect import compile_tokenizer

DELIMS = ["-", ",", ";", " | ", "/", "::"]
VALUE_ALPHABET = string.ascii_letters + string.digits + "._"

values = st.lists(
    st.text(VALUE_ALPHABET, min_size=1, max_size=12), min_size=1, max_size=6
)
delims = st.sampled_from(DELIMS)


@given(vals=values, delim=delims)
@settings(max_examples=200, deadline=None)
def test_dissect_roundtrip_extraction(vals, delim):
    """For any delimiter-free values joined by a fixed delimiter, the
    compiled tokenizer must extract exactly the original values — on
    BOTH the single-string and the vectorized Arrow path."""
    tok = delim.join(f"%{{k{i}}}" for i in range(len(vals)))
    msg = delim.join(vals)
    cd = compile_tokenizer(tok)
    got = cd.apply(msg)
    assert got == {f"k{i}": v for i, v in enumerate(vals)}
    from beats_ray.dissect import dissect_batch

    fields, ok = dissect_batch(cd, pa.array([msg]))
    assert ok[0].as_py()
    assert {k: a[0].as_py() for k, a in fields.items()} == got


@given(vals=values, delim=delims, ordinal_shift=st.integers(0, 3))
@settings(max_examples=100, deadline=None)
def test_dissect_append_reassembles(vals, delim, ordinal_shift):
    """Append modifier with explicit ordinals must reassemble values in
    ordinal order joined by the source delimiters."""
    n = len(vals)
    order = [(i + ordinal_shift) % n for i in range(n)]
    tok = delim.join(f"%{{+k/{order[i] + 1}}}" for i in range(n))
    msg = delim.join(vals)
    got = compile_tokenizer(tok).apply(msg)
    # reference join rule: pieces in ordinal order; each subsequent piece
    # joins with its own PRECEDING tokenizer delimiter (space for the
    # pattern-initial piece) — field.go:221-234
    ranked = sorted(range(len(vals)), key=lambda i: order[i])
    buf = vals[ranked[0]]
    for i in ranked[1:]:
        buf += (delim if i > 0 else " ") + vals[i]
    assert got == {"k": buf}


rows = st.integers(0, 100)


@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", None]), st.integers(-5, 5)),
        min_size=1,
        max_size=30,
    ),
    pivot=st.integers(-5, 5),
)
@settings(max_examples=200, deadline=None)
def test_conditions_match_python_semantics(data, pivot):
    """Compiled condition masks must equal a row-wise Python oracle:
    missing/null ⇒ False, not() inverts, combinators compose."""
    t = pa.table(
        {
            "s": pa.array([d[0] for d in data], pa.string()),
            "n": pa.array([d[1] for d in data], pa.int64()),
        }
    )
    spec = {
        "or": [
            {"and": [{"equals": {"s": "a"}}, {"range": {"n": {"gte": pivot}}}]},
            {"not": {"has_fields": ["s"]}},
        ]
    }
    got = compile_condition(spec)(t).to_pylist()
    want = [
        (s == "a" and n >= pivot) or (s is None) for s, n in data
    ]
    assert got == want


def test_config_validation_names_bad_key():
    import pytest

    from beats_ray.processors import build_processor

    with pytest.raises(ValueError, match="tokenzier"):
        build_processor({"dissect": {"tokenzier": "%{a}"}})  # typo'd key
    # valid config still builds
    build_processor({"dissect": {"tokenizer": "%{a}"}})


@given(
    vals=st.lists(st.text(VALUE_ALPHABET, min_size=1, max_size=8),
                  min_size=2, max_size=5),
    pad=st.integers(1, 4),
)
@settings(max_examples=100, deadline=None)
def test_dissect_greedy_collapses_delimiter_runs(vals, pad):
    """%{k->} with a repeated delimiter run extracts the same values as
    a single delimiter (reference: ignore-padding cases)."""
    tok = " ".join(
        f"%{{k{i}->}}" if i < len(vals) - 1 else f"%{{k{i}}}"
        for i in range(len(vals))
    )
    msg = (" " * pad).join(vals)
    got = compile_tokenizer(tok).apply(msg)
    assert got == {f"k{i}": v for i, v in enumerate(vals)}


@given(
    widths=st.lists(st.integers(1, 6), min_size=1, max_size=5),
    data=st.data(),
)
@settings(max_examples=100, deadline=None)
def test_dissect_fixed_length_partition(widths, data):
    """Adjacent fixed-length keys partition the message exactly; any
    leftover byte is a failure."""
    vals = [
        data.draw(st.text(VALUE_ALPHABET, min_size=w, max_size=w))
        for w in widths
    ]
    tok = "".join(f"%{{k{i}#{w}}}" for i, w in enumerate(widths))
    msg = "".join(vals)
    cd = compile_tokenizer(tok)
    assert cd.apply(msg) == {f"k{i}": v for i, v in enumerate(vals)}
    assert cd.apply(msg + "x") is None  # leftover → fail
    if len(msg) > 1:
        assert cd.apply(msg[:-1]) is None  # short → fail


# ------------------------------------------------- round-2 op properties


@given(
    gaps_ms=st.lists(st.integers(0, 5000), min_size=1, max_size=40),
    limit_n=st.integers(1, 3),
    burst=st.integers(1, 4),
)
@settings(max_examples=60, deadline=None)
def test_token_bucket_matches_reference_replay(gaps_ms, limit_n, burst):
    """The vectorized bucket replay must equal a straight-line
    re-implementation of the reference recurrence (rate_limit.go:
    replenish-then-spend, clamped at capacity) for arbitrary event
    spacings and parameters."""
    import numpy as np
    import pandas as pd

    ts_us = np.cumsum(np.array(gaps_ms, dtype=np.int64) * 1000)
    # reference replay in exact sub-token units (1 token = per_s*1e6)
    per_s = 1
    unit = per_s * 1_000_000
    cap, cost = burst * unit, unit
    tok, last = cap, ts_us[0]
    want = []
    for i, t in enumerate(ts_us):
        if i > 0:
            tok = min(cap, tok + limit_n * (t - last))
        last = t
        if tok >= cost:
            want.append(i)
            tok -= cost

    from beats_ray.dataops.flows import token_bucket_limit

    import ray.data as rd

    base = pd.Timestamp("2024-01-01")
    rows = [
        {"event_id": i, "user_id": 1,
         "ts": base + pd.Timedelta(microseconds=int(t))}
        for i, t in enumerate(ts_us)
    ]
    kept = token_bucket_limit(
        rd.from_items(rows), key="user_id", limit_n=limit_n, per_s=per_s,
        burst=burst,
    ).to_pandas()
    assert sorted(kept["event_id"].tolist()) == want


@given(
    toks=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    budget=st.integers(5, 60),
)
@settings(max_examples=60, deadline=None)
def test_pack_sequences_matches_greedy_replay(toks, budget):
    """Distributed packing must equal the straight-line greedy replay
    for a single bucket (docs in key order, overflow starts a bin)."""
    import pandas as pd

    import ray.data as rd

    from beats_ray.dataops.sampling import pack_sequences

    # doc_id = i*B keeps every doc in bucket 0 of B buckets
    B = 4
    rows = [
        {"doc_id": i * B, "text": " ".join(["w"] * t) if t else ""}
        for i, t in enumerate(toks)
    ]
    out = (
        pack_sequences(rd.from_items(rows), budget=budget, buckets=B)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    run, cur, want = None, 0, []
    for t in toks:
        if run is None:
            run, cur = t, 0
        elif run + t > budget:
            cur, run = cur + 1, t
        else:
            run += t
        want.append(cur)
    assert out["bin_id"].tolist() == want
    assert out["n_tokens"].tolist() == toks


@given(
    params=st.dictionaries(
        st.text(string.ascii_lowercase, min_size=1, max_size=8),
        st.text(string.ascii_letters + string.digits + ' "]\\',
                min_size=0, max_size=12),
        min_size=0, max_size=4,
    ),
    sd_id=st.text(string.ascii_lowercase + string.digits, min_size=1, max_size=8),
)
@settings(max_examples=100, deadline=None)
def test_sd_escape_roundtrip(params, sd_id):
    """Encoding arbitrary param values with RFC5424 escaping and parsing
    back must recover the originals exactly."""
    import json

    from beats_ray.processors.parse import parse_sd_elements

    def esc(v: str) -> str:
        return v.replace("\\", "\\\\").replace('"', '\\"').replace("]", "\\]")

    body = "".join(f' {k}="{esc(v)}"' for k, v in params.items())
    sd = f"[{sd_id}{body}]"
    got = parse_sd_elements(sd)
    assert got is not None
    assert json.loads(got) == {sd_id: params}
