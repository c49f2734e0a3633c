"""Processor framework: config → composable Arrow batch transforms.

Models the reference's ``beat.Processor`` chain (libbeat/beat/
pipeline.go:149-152; chain runner processors/processor.go:170-183) with
columnar semantics: a processor is ``pa.Table → pa.Table``; dropping a
row = filtering it out of the batch (Beats' nil-return); every processor
accepts an optional ``when:`` condition (processors/conditionals.go:33-74)
applied as a row mask — transformed values are blended back only for
matching rows.

Registration mirrors the reference's global registry
(processors/registry.go RegisterPlugin): ``@register("name")``.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

from ..conditions import compile_condition

Transform = Callable[[pa.Table], pa.Table]

_REGISTRY: dict[str, Callable[[dict], Transform]] = {}


def _named(name: str):
    """Attach a .name to a processor transform (shared by every
    processor module — display/debug identity)."""

    def deco(fn):
        fn.name = name
        return fn

    return deco


def register(name: str):
    def deco(factory: Callable[[dict], Transform]):
        _REGISTRY[name] = factory
        factory.processor_name = name  # type: ignore[attr-defined]
        return factory

    return deco


def registry() -> dict[str, Callable[[dict], Transform]]:
    return dict(_REGISTRY)


def set_col(table: pa.Table, name: str, arr: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Add or replace a column (Beats PutValue on a dot-path)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if name in table.column_names:
        idx = table.column_names.index(name)
        return table.set_column(idx, name, arr)
    return table.append_column(name, arr)


def get_col(table: pa.Table, name: str) -> pa.ChunkedArray | None:
    return table[name] if name in table.column_names else None


def add_flag(table: pa.Table, mask: pa.Array | pa.ChunkedArray, flag: str) -> pa.Table:
    """Append ``flag`` to the comma-joined ``log.flags`` column for rows
    in ``mask`` (Beats AddTagsWithKey → log.flags, event.go:38)."""
    mask = pc.fill_null(mask, False)
    if "log.flags" in table.column_names:
        cur = table["log.flags"].combine_chunks()
    else:
        cur = pa.nulls(table.num_rows, pa.string())
    appended = pc.if_else(
        pc.is_null(cur),
        pa.scalar(flag),
        pc.binary_join_element_wise(pc.cast(cur, pa.string()), flag, ","),
    )
    new = pc.if_else(mask, appended, cur)
    return set_col(table, "log.flags", new)


def set_error(
    table: pa.Table, mask: pa.Array | pa.ChunkedArray, message: str
) -> pa.Table:
    """Record an in-band parse error (Beats SetErrorWithOption →
    error.message, event.go:303-316). Never drops the row."""
    mask = pc.fill_null(mask, False)
    cur = get_col(table, "error.message")
    if cur is None:
        cur = pa.nulls(table.num_rows, pa.string())
    else:
        cur = cur.combine_chunks()
    new = pc.if_else(pc.and_(mask, pc.is_null(cur)), pa.scalar(message), cur)
    return set_col(table, "error.message", new)


class WhenWrapper:
    """Apply ``proc`` only to rows matching ``when`` (WhenProcessor,
    processors/conditionals.go:47-80). The processor runs on the full
    batch; outputs are blended back by mask — vectorized equivalent of
    per-event conditional dispatch. Row-dropping processors declare
    ``drops_rows`` and get mask-aware filtering instead."""

    def __init__(self, proc: Transform, when: dict):
        self.proc = proc
        self.cond = compile_condition(when)
        self.name = getattr(proc, "name", proc.__class__.__name__)

    def __call__(self, table: pa.Table) -> pa.Table:
        mask = pc.fill_null(self.cond(table), False)
        if getattr(self.proc, "drops_rows", False):
            # run the FULL processor on matching rows (row filtering AND
            # its column outputs), pass non-matching rows through
            t_match = self.proc(table.filter(mask))
            t_rest = table.filter(pc.invert(mask))
            return _concat_aligned([t_match, t_rest])
        out = self.proc(table)
        if out.num_rows != table.num_rows:
            raise ValueError(
                f"{self.name}: row-count change under when: is not supported"
            )
        merged = table
        for col_name in out.column_names:
            new = out[col_name].combine_chunks()
            if col_name in table.column_names:
                old = table[col_name].combine_chunks()
                if new.type != old.type:
                    old = pc.cast(old, new.type)
                merged = set_col(merged, col_name, pc.if_else(mask, new, old))
            else:
                blank = pa.nulls(table.num_rows, new.type)
                merged = set_col(merged, col_name, pc.if_else(mask, new, blank))
        # column REMOVAL under when: = per-event field deletion — the
        # columnar equivalent nulls the field for matching rows
        for col_name in table.column_names:
            if col_name not in out.column_names:
                old = table[col_name].combine_chunks()
                blank = pa.nulls(table.num_rows, old.type)
                merged = set_col(merged, col_name, pc.if_else(mask, blank, old))
        return merged


def build_processor(spec: dict) -> Transform:
    """Build one processor from its config dict ``{name: {...config},
    when?: cond}`` — including the dedicated if/then/else form
    (IfThenElseProcessor, conditionals.go:137-240)."""
    spec = dict(spec)
    when = spec.pop("when", None)
    if "if" in spec:
        return _build_if_then_else(spec)
    if len(spec) != 1:
        raise ValueError(f"processor spec must have one name: {spec!r}")
    name, cfg = next(iter(spec.items()))
    if name not in _REGISTRY:
        raise ValueError(f"unknown processor {name!r}")
    from .validation import validate_config

    validate_config(name, cfg or {})
    proc = _REGISTRY[name](cfg or {})
    if when is not None:
        return WhenWrapper(proc, when)
    return proc


def _build_if_then_else(spec: dict) -> Transform:
    cond = compile_condition(spec["if"])
    then_procs = [build_processor(s) for s in spec.get("then", [])]
    else_procs = [build_processor(s) for s in spec.get("else", [])]

    def run(table: pa.Table) -> pa.Table:
        mask = pc.fill_null(cond(table), False)
        # split, transform, re-concat; order restored by the caller's sort
        # invariant (north rule: equality under (conv_id, turn_idx) sort)
        t_then = table.filter(mask)
        t_else = table.filter(pc.invert(mask))
        for p in then_procs:
            t_then = p(t_then)
        for p in else_procs:
            t_else = p(t_else)
        return _concat_aligned([t_then, t_else])

    return run


def _concat_aligned(tables: list[pa.Table]) -> pa.Table:
    cols: list[str] = []
    col_types: dict[str, pa.DataType] = {}
    for t in tables:
        for c in t.column_names:
            if c not in cols:
                cols.append(c)
                col_types[c] = t.schema.field(c).type
    fixed = []
    for t in tables:
        for c in cols:
            if c not in t.column_names:
                # pad with the column's REAL type from whichever branch
                # produced it (string-typed nulls would break concat for
                # int/float branch outputs)
                t = t.append_column(c, pa.nulls(t.num_rows, col_types[c]))
        fixed.append(t.select(cols))
    return pa.concat_tables(fixed, promote_options="permissive")


def build_chain(specs: list[dict]) -> list[Transform]:
    return [build_processor(s) for s in specs]


def run_chain(table: pa.Table, chain: list[Transform]) -> pa.Table:
    """Serial chain execution (Processors.Run, processor.go:170-183) —
    the published semantics log-and-continue on processor error
    (processor.go:131-143): an operator raising here is a bug, not data."""
    for proc in chain:
        table = proc(table)
    return table
