"""Condition compiler tests — mirror the reference's table-driven cases
(libbeat/conditions/conditions_test.go)."""

import pyarrow as pa
import pytest

from beats_ray.conditions import compile_condition


@pytest.fixture
def table():
    return pa.table(
        {
            "role": ["user", "assistant", "tool", None],
            "text": ["level=error boom", "hello world", "<34>syslog", ""],
            "n": [1, 5, 10, None],
            "ip": ["10.1.2.3", "8.8.8.8", "127.0.0.1", "not-an-ip"],
        }
    )


def m(spec, table):
    return compile_condition(spec)(table).to_pylist()


def test_equals(table):
    assert m({"equals": {"role": "user"}}, table) == [True, False, False, False]


def test_equals_missing_field(table):
    assert m({"equals": {"nope": "x"}}, table) == [False] * 4


def test_contains(table):
    assert m({"contains": {"text": "world"}}, table) == [False, True, False, False]


def test_regexp(table):
    assert m({"regexp": {"text": "level=error|<\\d+>"}}, table) == [
        True,
        False,
        True,
        False,
    ]


def test_range(table):
    assert m({"range": {"n": {"gte": 5, "lt": 10}}}, table) == [
        False,
        True,
        False,
        False,
    ]


def test_has_fields(table):
    assert m({"has_fields": ["n"]}, table) == [True, True, True, False]
    assert m({"has_fields": ["n", "missing"]}, table) == [False] * 4


def test_network(table):
    assert m({"network": {"ip": "10.0.0.0/8"}}, table) == [
        True,
        False,
        False,
        False,
    ]
    assert m({"network": {"ip": ["private", "loopback"]}}, table) == [
        True,
        False,
        True,
        False,
    ]


def test_combinators(table):
    spec = {
        "and": [
            {"not": {"equals": {"role": "assistant"}}},
            {"or": [{"contains": {"text": "error"}}, {"range": {"n": {"gt": 5}}}]},
        ]
    }
    assert m(spec, table) == [True, False, True, False]


def test_not_on_null_is_true(table):
    # Beats: condition over null/missing = false; not(false) = true
    assert m({"not": {"equals": {"role": "user"}}}, table) == [
        False,
        True,
        True,
        True,
    ]
