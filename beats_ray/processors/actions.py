"""Stateless field-manipulation processors (libbeat/processors/actions/).

Each factory takes the processor's YAML-shaped config dict and returns a
vectorized ``pa.Table → pa.Table`` transform. Field addressing is flat
dotted column names (see beats_ray.schema docstring).
"""

from __future__ import annotations

import base64
import binascii
import gzip
import re
import urllib.parse

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import _named, add_flag, get_col, register, set_col, set_error


def bytes_truncate(col: pa.Array, max_bytes: int) -> pa.Array:
    """Byte-length truncation that never produces invalid UTF-8: slice,
    try the vectorized cast, and repair only the rare rows whose slice
    landed mid-codepoint (decode errors='ignore' drops the partial)."""
    sliced = pc.binary_slice(pc.cast(col, pa.binary()), 0, max_bytes)
    try:
        return pc.cast(sliced, pa.string())
    except pa.ArrowInvalid:
        out = []
        for v in sliced.to_pylist():
            out.append(None if v is None else v.decode("utf-8", "ignore"))
        return pa.array(out, pa.string())


@register("add_fields")
def add_fields(cfg: dict):
    """Constant fields under optional target prefix (actions/add_fields.go;
    target default "fields", "" = root)."""
    target = cfg.get("target", "fields")
    prefix = f"{target}." if target else ""
    fields = {f"{prefix}{k}": v for k, v in cfg.get("fields", {}).items()}

    @_named("add_fields")
    def run(t: pa.Table) -> pa.Table:
        for k, v in fields.items():
            t = set_col(t, k, pa.nulls(t.num_rows, pa.string()).fill_null(str(v))
                        if isinstance(v, str)
                        else pa.array(np.full(t.num_rows, v)))
        return t

    return run


@register("add_labels")
def add_labels(cfg: dict):
    """Flattened constant labels under ``labels.`` (actions/add_labels.go)."""
    return add_fields({"target": "labels", "fields": cfg.get("labels", {})})


@register("add_tags")
def add_tags(cfg: dict):
    """Append constant strings to the ``tags`` list field
    (actions/add_tags.go:77) — comma-joined string representation."""
    tags = cfg.get("tags", [])
    target = cfg.get("target", "tags")
    joined = ",".join(tags)

    @_named("add_tags")
    def run(t: pa.Table) -> pa.Table:
        cur = get_col(t, target)
        if cur is None:
            cur = pa.nulls(t.num_rows, pa.string())
        else:
            cur = cur.combine_chunks()
        new = pc.if_else(
            pc.is_null(cur),
            pa.scalar(joined),
            pc.binary_join_element_wise(pc.cast(cur, pa.string()), joined, ","),
        )
        return set_col(t, target, new)

    return run


@register("drop_fields")
def drop_fields(cfg: dict):
    """Delete columns by name or regex (actions/drop_fields.go:93; regex
    form :39,:102). ``@timestamp``-equivalents (ts) are protected."""
    names = set(cfg.get("fields", []))
    patterns = [re.compile(p.strip("/")) for p in cfg.get("fields", []) if p.startswith("/")]
    protected = {"ts", "conv_id", "turn_idx"}

    @_named("drop_fields")
    def run(t: pa.Table) -> pa.Table:
        drop = [
            c
            for c in t.column_names
            if c not in protected
            and (c in names or any(p.search(c) for p in patterns))
        ]
        return t.drop_columns(drop) if drop else t

    return run


@register("include_fields")
def include_fields(cfg: dict):
    """Keep-list projection; timestamp/keys always kept
    (actions/include_fields.go:70)."""
    keep = list(cfg.get("fields", []))
    always = ["conv_id", "turn_idx", "ts"]

    @_named("include_fields")
    def run(t: pa.Table) -> pa.Table:
        cols = [c for c in t.column_names if c in keep or c in always]
        return t.select(cols)

    return run


@register("rename")
def rename(cfg: dict):
    """Move fields from→to; fails (flags) if target exists
    (actions/rename.go:34-200)."""
    pairs = [(f["from"], f["to"]) for f in cfg.get("fields", [])]
    fail_on_error = cfg.get("fail_on_error", True)
    ignore_missing = cfg.get("ignore_missing", False)

    @_named("rename")
    def run(t: pa.Table) -> pa.Table:
        for src, dst in pairs:
            if src not in t.column_names:
                if ignore_missing:
                    continue
                if fail_on_error:
                    # rename.go Run: the event is rolled back, gets
                    # error.message, and the stream keeps flowing — a
                    # config/schema mismatch must not abort the job.
                    # Column-absence is batch-wide here, so every row
                    # gets the tag.
                    t = set_error(
                        t, pa.array([True] * t.num_rows),
                        f"rename: missing field {src!r}")
                continue
            if dst in t.column_names:
                if fail_on_error:
                    t = set_error(
                        t, pa.array([True] * t.num_rows),
                        f"rename: target {dst!r} exists")
                # rename.go renameField: target-exists is an error; the
                # event is restored UNTOUCHED — never silently
                # overwrite the existing target
                continue
            col = t[src]
            t = t.drop_columns([src])
            t = set_col(t, dst, col)
        return t

    return run


@register("copy_fields")
def copy_fields(cfg: dict):
    """Copy value from→to (actions/copy_fields.go:71). Same guards as
    rename (copy_fields.go fail_on_error default true): a missing
    source or an already-existing target is an error — never a silent
    overwrite of the target column."""
    pairs = [(f["from"], f["to"]) for f in cfg.get("fields", [])]
    fail_on_error = cfg.get("fail_on_error", True)
    ignore_missing = cfg.get("ignore_missing", False)

    @_named("copy_fields")
    def run(t: pa.Table) -> pa.Table:
        for src, dst in pairs:
            if src not in t.column_names:
                if ignore_missing:
                    continue
                if fail_on_error:
                    # copy_fields.go Run: rollback + error.message +
                    # keep processing (never abort the batch)
                    t = set_error(
                        t, pa.array([True] * t.num_rows),
                        f"copy_fields: missing field {src!r}")
                continue
            if dst in t.column_names:
                if fail_on_error:
                    t = set_error(
                        t, pa.array([True] * t.num_rows),
                        f"copy_fields: target {dst!r} exists")
                continue
            t = set_col(t, dst, t[src])
        return t

    return run


@register("replace")
def replace(cfg: dict):
    """Regex find/replace on string fields (actions/replace.go:84)."""
    rules = [
        (f["field"], f["pattern"], f["replacement"]) for f in cfg.get("fields", [])
    ]

    @_named("replace")
    def run(t: pa.Table) -> pa.Table:
        for field, pat, repl in rules:
            col = get_col(t, field)
            if col is None:
                continue
            t = set_col(
                t, field, pc.replace_substring_regex(col, pattern=pat, replacement=repl)
            )
        return t

    return run


@register("truncate_fields")
def truncate_fields(cfg: dict):
    """Truncate to max_bytes/max_characters + ``truncated`` flag
    (actions/truncate_fields.go:38-84; flag semantics like
    readfile/limit.go)."""
    fields = cfg.get("fields", [])
    max_chars = cfg.get("max_characters")
    max_bytes = cfg.get("max_bytes")
    if max_chars is None and max_bytes is None:
        raise ValueError("truncate_fields: need max_characters or max_bytes")

    @_named("truncate_fields")
    def run(t: pa.Table) -> pa.Table:
        for field in fields:
            col = get_col(t, field)
            if col is None:
                continue
            col = col.combine_chunks()
            if max_chars is not None:
                too_long = pc.greater(pc.utf8_length(col), max_chars)
                cut = pc.utf8_slice_codeunits(col, 0, max_chars)
            else:
                too_long = pc.greater(pc.binary_length(col), max_bytes)
                cut = bytes_truncate(col, max_bytes)
            too_long = pc.fill_null(too_long, False)
            t = set_col(t, field, pc.if_else(too_long, cut, col))
            t = add_flag(t, too_long, "truncated")
        return t

    return run


@register("lowercase")
def lowercase(cfg: dict):
    """Case-fold FIELD NAMES (actions/lowercase.go:42 — alters keys, not
    values)."""
    fields = set(cfg.get("fields", []))

    @_named("lowercase")
    def run(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [c.lower() if (not fields or c in fields) else c for c in t.column_names]
        )

    return run


@register("uppercase")
def uppercase(cfg: dict):
    fields = set(cfg.get("fields", []))

    @_named("uppercase")
    def run(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [c.upper() if (not fields or c in fields) else c for c in t.column_names]
        )

    return run


@register("extract_field")
def extract_field(cfg: dict):
    """Split string by separator, take index (actions/extract_field.go:76)."""
    field = cfg["field"]
    sep = cfg.get("separator", " ")
    index = cfg.get("index", 0)
    target = cfg.get("target", f"{field}.extracted")

    @_named("extract_field")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        parts = pc.split_pattern(col, pattern=sep)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        # Arrow list_element raises on ANY out-of-bounds row (killing the
        # batch for one short line) and rejects negative indices —
        # resolve per row with bounds (Beats fails per-event, never
        # per-batch)
        bound = index if index >= 0 else -index - 1
        picked = pa.array(
            [
                None if lst is None or len(lst) <= bound else lst[index]
                for lst in parts.to_pylist()
            ],
            pa.string(),
        )
        return set_col(t, target, picked)

    return run


@register("append")
def append_proc(cfg: dict):
    """Append values/fields to a target (comma-joined) field
    (actions/append.go:77)."""
    target = cfg["target_field"]
    values = [str(v) for v in cfg.get("values", [])]
    src_fields = cfg.get("fields", [])

    @_named("append")
    def run(t: pa.Table) -> pa.Table:
        cur = get_col(t, target)
        if cur is None:
            cur = pa.nulls(t.num_rows, pa.string())
        else:
            cur = pc.cast(cur.combine_chunks(), pa.string())
        pieces: list = [cur]
        for f in src_fields:
            col = get_col(t, f)
            if col is not None:
                pieces.append(pc.cast(col.combine_chunks(), pa.string()))
        if values:
            pieces.append(pa.scalar(",".join(values)))
        joined = pc.binary_join_element_wise(
            *pieces, ",", null_handling="skip"
        )
        return set_col(t, target, joined)

    return run


class _DropEvent:
    """Unconditional drop — meaningful only under ``when:``
    (actions/drop_event.go:28-46). WhenWrapper's drops_rows path runs
    this on the matching rows only."""

    name = "drop_event"
    drops_rows = True

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.slice(0, 0)


@register("drop_event")
def drop_event(cfg: dict):
    return _DropEvent()


@register("decode_base64_field")
def decode_base64_field(cfg: dict):
    """Base64 → string (actions/decode_base64_field.go:76)."""
    field = cfg["field"] if isinstance(cfg.get("field"), str) else cfg["field"]["from"]
    target = (
        cfg["field"].get("to", field) if isinstance(cfg.get("field"), dict) else field
    )
    ignore = cfg.get("ignore_missing", False)
    fail = cfg.get("fail_on_error", True)

    @_named("decode_base64_field")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            if ignore:
                return t
            raise KeyError(f"decode_base64_field: missing {field!r}")
        vals = col.to_pylist()
        out, bad = [], np.zeros(len(vals), dtype=bool)
        for i, v in enumerate(vals):
            if v is None:
                out.append(None)
                continue
            try:
                out.append(base64.b64decode(v, validate=True).decode("utf-8"))
            except (binascii.Error, UnicodeDecodeError, ValueError):
                # decode_base64_field.go failOnError=true RESTORES the
                # backup event — the raw payload is kept, never nulled
                out.append(v if target == field else None)
                bad[i] = True
        t = set_col(t, target, pa.array(out, pa.string()))
        if fail and bad.any():
            # fail_on_error=false tolerates bad input WITHOUT annotating
            # (Beats leaves the event untouched in that mode)
            t = set_error(t, pa.array(bad), "failed to decode base64 field")
        return t

    return run


@register("decompress_gzip_field")
def decompress_gzip_field(cfg: dict):
    """Gunzip a binary/string field (actions/decompress_gzip_field.go:69)."""
    field = cfg["field"]["from"] if isinstance(cfg.get("field"), dict) else cfg["field"]
    target = (
        cfg["field"].get("to", field) if isinstance(cfg.get("field"), dict) else field
    )

    @_named("decompress_gzip_field")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        vals = col.to_pylist()
        out, bad = [], np.zeros(len(vals), dtype=bool)
        for i, v in enumerate(vals):
            if v is None:
                out.append(None)
                continue
            try:
                raw = v if isinstance(v, bytes) else bytes(v, "latin-1")
                out.append(gzip.decompress(raw).decode("utf-8"))
            except (OSError, UnicodeDecodeError, ValueError):
                # restore the original value in-place like the reference
                # (only representable when the payload is a string)
                out.append(v if target == field and isinstance(v, str) else None)
                bad[i] = True
        t = set_col(t, target, pa.array(out, pa.string()))
        if bad.any():
            t = set_error(t, pa.array(bad), "failed to decompress field")
        return t

    return run


@register("urldecode")
def urldecode(cfg: dict):
    """URL-unescape fields (actions/urldecode.go:75)."""
    pairs = [
        (f["from"], f.get("to", f["from"])) for f in cfg.get("fields", [])
    ]

    @_named("urldecode")
    def run(t: pa.Table) -> pa.Table:
        for src, dst in pairs:
            col = get_col(t, src)
            if col is None:
                continue
            vals = col.to_pylist()
            out = [None if v is None else urllib.parse.unquote_plus(v) for v in vals]
            t = set_col(t, dst, pa.array(out, pa.string()))
        return t

    return run


@register("decode_csv_fields")
def decode_csv_fields(cfg: dict):
    """CSV-decode a string field into a list column
    (decode_csv_fields/decode_csv_fields.go:101). Simple comma split with
    quote handling via the csv module per row."""
    import csv as _csv
    import io

    pairs = list(cfg.get("fields", {}).items())
    sep = cfg.get("separator", ",")

    @_named("decode_csv_fields")
    def run(t: pa.Table) -> pa.Table:
        for src, dst in pairs:
            col = get_col(t, src)
            if col is None:
                continue
            vals = col.to_pylist()
            out = []
            for v in vals:
                if v is None:
                    out.append(None)
                else:
                    try:
                        out.append(
                            next(_csv.reader(io.StringIO(v), delimiter=sep))
                        )
                    except StopIteration:
                        out.append([])
            t = set_col(t, dst, pa.array(out, pa.list_(pa.string())))
        return t

    return run


_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")
_DUR_UNIT = {
    "ns": 1e-9,
    "us": 1e-6,
    "µs": 1e-6,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
}


@register("decode_duration")
def decode_duration(cfg: dict):
    """Parse Go duration strings ("1h2m3.5s") to seconds
    (decode_duration/decode_duration.go:48)."""
    field = cfg["field"]
    target = cfg.get("target", field)

    @_named("decode_duration")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        vals = col.to_pylist()
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            sv = str(v).strip()
            # Go time.ParseDuration: one optional leading sign applies
            # to the WHOLE duration ("-1h30m" = -5400 s)
            sign = -1.0 if sv.startswith("-") else 1.0
            parts = _DUR_RE.findall(sv)
            out.append(
                sign * sum(float(n) * _DUR_UNIT[u] for n, u in parts)
                if parts else None
            )
        return set_col(t, target, pa.array(out, pa.float64()))

    return run


@register("detect_mime_type")
def detect_mime_type(cfg: dict):
    """Sniff MIME from content prefix (actions/detect_mime_type.go:53) —
    magic-byte heuristic over the first bytes."""
    field = cfg["field"]
    target = cfg.get("target", "mime_type")
    magics = [
        (b"\x89PNG", "image/png"),
        (b"\xff\xd8\xff", "image/jpeg"),
        (b"GIF8", "image/gif"),
        (b"%PDF", "application/pdf"),
        (b"PK\x03\x04", "application/zip"),
        (b"\x1f\x8b", "application/gzip"),
        (b"{", "application/json"),
        (b"<", "text/html"),
    ]

    @_named("detect_mime_type")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        vals = col.to_pylist()
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            # latin-1 is byte-preserving for str payloads (utf-8 would
            # mangle magic bytes like \x89PNG into \xc2\x89...)
            raw = v if isinstance(v, bytes) else str(v).encode("latin-1", "ignore")
            mime = "text/plain"
            for magic, m in magics:
                if raw.startswith(magic):
                    mime = m
                    break
            out.append(mime)
        return set_col(t, target, pa.array(out, pa.string()))

    return run


@register("move_fields")
def move_fields(cfg: dict):
    """Move columns matching a prefix under a new target prefix
    (move_fields/move_fields.go:52)."""
    frm = cfg.get("from", "")
    to = cfg.get("to", "")
    fields = cfg.get("fields", [])

    @_named("move_fields")
    def run(t: pa.Table) -> pa.Table:
        renames = {}
        for c in t.column_names:
            base = c[len(frm):] if frm and c.startswith(frm) else c
            if fields and base not in fields:
                continue
            if frm and not c.startswith(frm):
                continue
            renames[c] = f"{to}{base}"
        return t.rename_columns([renames.get(c, c) for c in t.column_names])

    return run
