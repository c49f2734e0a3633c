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
