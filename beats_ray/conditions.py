"""Condition AST → vectorized Arrow boolean-mask compiler.

Models the reference's condition language (libbeat/conditions/
conditions.go:30-99): ``equals``, ``contains``, ``regexp``, ``range``
(gt/gte/lt/lte), ``has_fields``, ``network`` (CIDR), and the
``and``/``or``/``not`` combinators. Every processor's ``when:`` clause
and every routing rule compiles through here
(processors/conditionals.go:33-44; outputs/outil/select.go:30-67).

Semantics parity: a condition over a missing field or a null value is
FALSE (Beats: lookup error ⇒ no match), and ``not`` inverts that result
— masks are null-filled to False *before* combinators apply.
"""

from __future__ import annotations

import ipaddress
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

Mask = pa.ChunkedArray | pa.Array
Condition = Callable[[pa.Table], Mask]

_PRIVATE_NETS = ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16", "fd00::/8"]
_LOOPBACK_NETS = ["127.0.0.0/8", "::1/128"]
_NAMED_NETS = {
    "loopback": _LOOPBACK_NETS,
    "private": _PRIVATE_NETS,
    # "public" = valid address NOT in private/loopback/link-local —
    # resolved via a negated membership set (see compile below)
}
_PUBLIC_EXCLUDE = _PRIVATE_NETS + _LOOPBACK_NETS + ["169.254.0.0/16", "fe80::/10"]


def _false(n: int) -> pa.Array:
    return pa.array(np.zeros(n, dtype=bool))


def _col(table: pa.Table, field: str) -> pa.ChunkedArray | None:
    if field in table.column_names:
        return table[field]
    return None


def _fill(mask: Mask) -> Mask:
    return pc.fill_null(mask, False)


def _safe(kernel, col, val, n: int) -> Mask:
    """Type-mismatched comparisons are FALSE, not crashes (Beats: a
    lookup/compare error means no match)."""
    try:
        return _fill(kernel(col, val))
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid, pa.ArrowTypeError):
        return _false(n)


def compile_condition(spec: dict) -> Condition:
    """Compile a condition dict (YAML shape) into table → boolean mask."""
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError(f"condition must be a single-key dict, got {spec!r}")
    op, body = next(iter(spec.items()))

    if op in ("and", "or"):
        if not body:
            # fail at BUILD time, not with an IndexError inside a
            # remote task (the reference's config unpack also rejects
            # an empty condition list)
            raise ValueError(f"condition {op!r} requires at least one sub-condition")
        subs = [compile_condition(s) for s in body]
        kernel = pc.and_ if op == "and" else pc.or_
        return lambda t: _combine(kernel, subs, t)
    if op == "not":
        sub = compile_condition(body)
        return lambda t: pc.invert(_fill(sub(t)))

    if op == "equals":
        pairs = list(body.items())

        def eq(t: pa.Table) -> Mask:
            mask: Mask | None = None
            for fld, val in pairs:
                col = _col(t, fld)
                m = (
                    _false(t.num_rows)
                    if col is None
                    else _safe(pc.equal, col, val, t.num_rows)
                )
                mask = m if mask is None else pc.and_(mask, m)
            return mask if mask is not None else _false(t.num_rows)

        return eq

    if op == "contains":
        pairs = list(body.items())

        def contains(t: pa.Table) -> Mask:
            mask: Mask | None = None
            for fld, val in pairs:
                col = _col(t, fld)
                m = (
                    _false(t.num_rows)
                    if col is None
                    else _safe(
                        lambda c, v: pc.match_substring(c, v), col, str(val),
                        t.num_rows,
                    )
                )
                mask = m if mask is None else pc.and_(mask, m)
            return mask if mask is not None else _false(t.num_rows)

        return contains

    if op == "regexp":
        pairs = list(body.items())

        def regexp(t: pa.Table) -> Mask:
            mask: Mask | None = None
            for fld, pat in pairs:
                col = _col(t, fld)
                m = (
                    _false(t.num_rows)
                    if col is None
                    else _safe(
                        lambda c, v: pc.match_substring_regex(c, v), col,
                        str(pat), t.num_rows,
                    )
                )
                mask = m if mask is None else pc.and_(mask, m)
            return mask if mask is not None else _false(t.num_rows)

        return regexp

    if op == "range":
        # {field: {gte: x, lt: y}, ...} — all bounds AND-ed (range.go)
        bounds = []
        for fld, spec_f in body.items():
            for cmp_op, val in spec_f.items():
                kernel = {
                    "gt": pc.greater,
                    "gte": pc.greater_equal,
                    "lt": pc.less,
                    "lte": pc.less_equal,
                }[cmp_op]
                bounds.append((fld, kernel, val))

        def rng(t: pa.Table) -> Mask:
            mask: Mask | None = None
            for fld, kernel, val in bounds:
                col = _col(t, fld)
                m = (
                    _false(t.num_rows)
                    if col is None
                    else _safe(kernel, col, val, t.num_rows)
                )
                mask = m if mask is None else pc.and_(mask, m)
            return mask if mask is not None else _false(t.num_rows)

        return rng

    if op == "has_fields":
        fields = list(body) if isinstance(body, (list, tuple)) else [body]

        def has(t: pa.Table) -> Mask:
            mask: Mask | None = None
            for fld in fields:
                col = _col(t, fld)
                m = _false(t.num_rows) if col is None else pc.is_valid(col)
                mask = m if mask is None else pc.and_(mask, m)
            return mask if mask is not None else _false(t.num_rows)

        return has

    if op == "network":
        # {field: "10.0.0.0/8"} or {field: ["private", "10.1.0.0/16"]}
        pairs = {
            fld: (spec_n if isinstance(spec_n, list) else [spec_n])
            for fld, spec_n in body.items()
        }
        # per field: explicit/named networks are OR-ed with the "public"
        # predicate (valid ∧ not private/loopback/link-local) — mixing
        # "public" with explicit CIDRs must not invert the CIDR matches
        nets: dict[str, tuple[list, bool]] = {}
        exclude = [ipaddress.ip_network(x) for x in _PUBLIC_EXCLUDE]
        for fld, specs in pairs.items():
            include: list[str] = []
            has_public = False
            for s in specs:
                if s == "public":
                    has_public = True
                else:
                    include.extend(_NAMED_NETS.get(s, [s]))
            nets[fld] = ([ipaddress.ip_network(x) for x in include], has_public)

        def network(t: pa.Table) -> Mask:
            mask: Mask | None = None
            for fld, (include, has_public) in nets.items():
                col = _col(t, fld)
                if col is None:
                    m: Mask = _false(t.num_rows)
                else:
                    # unique-value memoized membership test (IPs repeat)
                    vals = col.to_pylist()
                    memo: dict[str | None, bool] = {}
                    bits = np.zeros(len(vals), dtype=bool)

                    def one(v) -> bool:
                        try:
                            if v in memo:
                                return memo[v]
                        except TypeError:  # unhashable (non-list) value
                            return False
                        try:
                            addr = ipaddress.ip_address(v)
                            hit = any(addr in n for n in include)
                            if not hit and has_public:
                                hit = not any(addr in n for n in exclude)
                        except (ValueError, TypeError):
                            hit = False
                        memo[v] = hit
                        return hit

                    for idx, v in enumerate(vals):
                        if isinstance(v, (list, tuple)):
                            # ECS array field (e.g. related.ip): match
                            # if ANY member matches — and never crash
                            # the batch on the unhashable list value
                            bits[idx] = any(one(x) for x in v)
                        else:
                            bits[idx] = one(v)
                    m = pa.array(bits)
                mask = m if mask is None else pc.and_(mask, m)
            return mask if mask is not None else _false(t.num_rows)

        return network

    raise ValueError(f"unknown condition operator {op!r}")


def _combine(kernel, subs: list[Condition], t: pa.Table) -> Mask:
    mask = _fill(subs[0](t))
    for s in subs[1:]:
        mask = kernel(mask, _fill(s(t)))
    return mask
