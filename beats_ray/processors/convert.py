"""Typed conversion processors: convert, timestamp
(libbeat/processors/convert/, libbeat/processors/timestamp/)."""

from __future__ import annotations

import ipaddress

import pyarrow as pa
import pyarrow.compute as pc

from .base import _named, get_col, register, set_col, set_error


_TYPES = {
    "integer": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "boolean": pa.bool_(),
}


@register("convert")
def convert(cfg: dict):
    """Typed field conversion with mode copy/rename and transactional
    rollback on failure (convert/convert.go:74-120, config.go:59-70).

    Columnar rollback semantics: with ``fail_on_error`` (default true),
    rows where ANY conversion fails keep ALL original values and get
    ``error.message``; other rows convert. ``ignore_missing`` skips
    absent fields."""
    fields = cfg.get("fields", [])
    mode = cfg.get("mode", "copy")
    fail_on_error = cfg.get("fail_on_error", True)
    ignore_missing = cfg.get("ignore_missing", False)

    @_named("convert")
    def run(t: pa.Table) -> pa.Table:
        n = t.num_rows
        failed = pa.array([False] * n)
        # the failed row's original datum, preserved as
        # "field=value" (reference rollback keeps the whole event; a
        # typed column can't hold both the converted and the original
        # type, so the original rides in this string sidecar — column
        # present whenever fail_on_error, so the schema is config-
        # deterministic, never value-dependent)
        original = pa.nulls(n, pa.string())
        converted: list[tuple[str, str, pa.Array, pa.ChunkedArray]] = []
        for f in fields:
            src, dst = f["from"], f.get("to", f["from"])
            typ = f.get("type", "string")
            col = get_col(t, src)
            if col is None:
                if ignore_missing:
                    continue
                raise KeyError(f"convert: missing field {src!r}")
            col = col.combine_chunks()
            if typ == "ip":
                vals = col.to_pylist()
                ok = []
                for v in vals:
                    try:
                        ipaddress.ip_address(v)
                        ok.append(True)
                    except (ValueError, TypeError):
                        ok.append(False)
                new = pa.array(
                    [v if o else None for v, o in zip(vals, ok)], pa.string()
                )
                row_fail = pc.and_(pc.is_valid(col), pa.array([not o for o in ok]))
            else:
                target_type = _TYPES[typ]
                try:
                    new = pc.cast(col, target_type)
                    row_fail = pa.array([False] * n)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    # per-row: cast via safe=False after validity probe
                    new_list = []
                    fail_list = []
                    for v in col.to_pylist():
                        if v is None:
                            new_list.append(None)
                            fail_list.append(False)
                            continue
                        try:
                            new_list.append(
                                pa.scalar(v).cast(target_type).as_py()
                            )
                            fail_list.append(False)
                        except (pa.ArrowInvalid, ValueError, OverflowError):
                            new_list.append(None)
                            fail_list.append(True)
                    new = pa.array(new_list, target_type)
                    row_fail = pa.array(fail_list)
            row_fail = pc.fill_null(row_fail, False)
            failed = pc.or_(failed, row_fail)
            if fail_on_error:
                as_str = pc.fill_null(pc.cast(col, pa.string(), safe=False), "")
                labelled = pc.binary_join_element_wise(
                    pa.array([src] * n), as_str, "="
                )
                # first failing field wins (rows rarely fail twice)
                original = pc.if_else(
                    pc.and_(row_fail, pc.is_null(original)),
                    labelled, original,
                )
            converted.append((src, dst, new, col))
        for src, dst, new, orig in converted:
            if fail_on_error:
                # rollback: failed rows keep original value (if same col)
                if dst == src:
                    if new.type == orig.type:
                        merged = pc.if_else(failed, orig.combine_chunks() if isinstance(orig, pa.ChunkedArray) else orig, new)
                    else:
                        merged = pc.if_else(failed, pa.nulls(n, new.type), new)
                else:
                    merged = pc.if_else(failed, pa.nulls(n, new.type), new)
                t = set_col(t, dst, merged)
            else:
                t = set_col(t, dst, new)
            if mode == "rename" and dst != src and src in t.column_names:
                t = t.drop_columns([src])
        if fail_on_error:
            t = set_error(t, failed, "unable to convert value")
            # rollback preservation: the failed rows' original values
            # (null elsewhere) — without this, an in-place string→long
            # convert (or rename mode) silently destroyed the datum the
            # error-tagged row would need for requeue/inspection
            t = set_col(t, "error.convert.original", original)
        return t

    return run


@register("timestamp")
def timestamp_proc(cfg: dict):
    """Parse a string field into a timestamp column
    (timestamp/timestamp.go:87; Go layouts → strptime formats,
    config.go:22-35). Config: field, target (default "ts_parsed"),
    layouts (strptime formats tried in order), ignore_missing,
    ignore_failure."""
    field = cfg["field"]
    target = cfg.get("target", "ts_parsed")
    layouts = cfg.get("layouts", ["%Y-%m-%dT%H:%M:%SZ"])
    ignore_missing = cfg.get("ignore_missing", False)
    ignore_failure = cfg.get("ignore_failure", True)

    @_named("timestamp")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            if ignore_missing:
                return t
            raise KeyError(f"timestamp: missing field {field!r}")
        col = col.combine_chunks()
        result = pa.nulls(t.num_rows, pa.timestamp("us"))
        remaining = pc.is_valid(col)
        for layout in layouts:
            parsed = pc.strptime(
                pc.fill_null(col, ""), format=layout, unit="us", error_is_null=True
            )
            take = pc.and_(remaining, pc.is_valid(parsed))
            result = pc.if_else(take, parsed, result)
            remaining = pc.and_(remaining, pc.is_null(parsed))
        t = set_col(t, target, result)
        if not ignore_failure:
            t = set_error(t, remaining, "failure parsing time field")
        return t

    return run
