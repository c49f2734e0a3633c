"""Dissect compiler conformance tests.

The corpus mirrors the reference's golden set
(libbeat/processors/dissect/testdata/dissect_tests.json, loaded by
dissect_test.go:140-150) — the contract for modifier semantics.
"""

import sys
from pathlib import Path

import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).parent / "data"))
from dissect_corpus import CASES  # noqa: E402

from beats_ray.dissect import compile_tokenizer, dissect_batch


@pytest.mark.parametrize("name,tok,msg,expected,fail", CASES, ids=[c[0][:48] for c in CASES])
def test_corpus_single(name, tok, msg, expected, fail):
    cd = compile_tokenizer(tok)
    got = cd.apply(msg)
    if fail:
        assert got is None, f"expected failure, got {got}"
    else:
        assert got == expected


@pytest.mark.parametrize("name,tok,msg,expected,fail", CASES, ids=[c[0][:48] for c in CASES])
def test_corpus_vectorized(name, tok, msg, expected, fail):
    """Same corpus through the Arrow batch path (extract_regex)."""
    cd = compile_tokenizer(tok)
    arr = pa.array([msg, msg], pa.string())
    fields, ok = dissect_batch(cd, arr)
    if fail:
        assert not ok[0].as_py()
    else:
        assert ok[0].as_py()
        got = {k: v[0].as_py() for k, v in fields.items()}
        # batch path returns every captured name; compare on expected keys
        assert got == expected


def test_typed_conversion():
    cd = compile_tokenizer("%{n|integer} %{f|float} %{b|boolean} %{s}")
    assert cd.apply("42 1.5 TRUE x") == {"n": 42, "f": 1.5, "b": True, "s": "x"}
    fields, ok = dissect_batch(cd, pa.array(["42 1.5 true x"]))
    assert fields["n"].type == pa.int64()
    assert fields["f"].type == pa.float64()
    assert fields["n"][0].as_py() == 42


def test_boolean_parsebool_tokens():
    """strconv.ParseBool's EXACT set (dissect.go:266): 12 tokens incl.
    the capitalized forms; anything else is a conversion FAILURE — the
    scalar path keeps the raw string (reference convertData keeps b on
    error), the typed batch path yields null, never a silent false."""
    cd = compile_tokenizer("%{b|boolean}")
    for tok, want in [("1", True), ("t", True), ("T", True), ("TRUE", True),
                      ("true", True), ("True", True), ("0", False),
                      ("f", False), ("F", False), ("FALSE", False),
                      ("false", False), ("False", False)]:
        assert cd.apply(tok) == {"b": want}, tok
    # invalid tokens (incl. mixed case — ParseBool is case-sensitive
    # beyond its 12 literals) keep the raw string, like the reference
    for tok in ("nope", "2", "tRuE", "yes"):
        assert cd.apply(tok) == {"b": tok}, tok
    fields, ok = dissect_batch(
        cd, pa.array(["1", "t", "TRUE", "0", "f", "x", "tRuE"])
    )
    assert fields["b"].to_pylist() == [
        True, True, True, False, False, None, None,
    ]


def test_trim_values():
    cd = compile_tokenizer("%{a},%{b}")
    fields, ok = dissect_batch(cd, pa.array([" x , y "]), trim_values="all")
    assert fields["a"][0].as_py() == "x"
    assert fields["b"][0].as_py() == "y"


def test_failure_mask_mixed_batch():
    cd = compile_tokenizer("level=%{level} msg=%{msg}")
    arr = pa.array(["level=info msg=hi", "nope", None])
    fields, ok = dissect_batch(cd, arr)
    assert ok.to_pylist() == [True, False, False]
    assert fields["level"].to_pylist() == ["info", None, None]
