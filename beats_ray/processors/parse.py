"""Parsing processors: dissect, ndjson decode, syslog, multiline stats,
include/exclude line filters.

These model the filestream parser chain (libbeat/reader/parser/
parser.go:142-196) and the parse-class processors
(actions/decode_json_fields.go, processors/syslog/, reader/multiline/)
as vectorized Arrow batch transforms.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dissect import compile_tokenizer, dissect_batch
from .base import _named, add_flag, get_col, register, set_col, set_error


@register("dissect")
def dissect_proc(cfg: dict):
    """Dissect processor (libbeat/processors/dissect/processor.go:75).

    Config: tokenizer, field (default "message" → our "text"),
    target_prefix (default "dissect"), ignore_failure, overwrite_keys,
    trim_values, trim_chars. Failure → flag ``dissect_parsing_error``
    (processor.go:33); the event is left untouched on failure, so a row
    an earlier dissect already populated keeps its values.

    ``overwrite_keys`` (processor.go:143-154, default false): a row
    whose target key already holds a value is an ERROR — the old value
    is kept and the row is flagged ``dissect_key_conflict``; with
    ``overwrite_keys: true`` successful parses replace it."""
    tok = cfg["tokenizer"]
    field = cfg.get("field", "text")
    prefix = cfg.get("target_prefix", "dissect")
    ignore_failure = cfg.get("ignore_failure", False)
    overwrite_keys = cfg.get("overwrite_keys", False)
    trim_values = cfg.get("trim_values", "none")
    trim_chars = cfg.get("trim_chars", " ")
    compiled = compile_tokenizer(tok)

    @_named("dissect")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        fields, ok = dissect_batch(compiled, col, trim_values, trim_chars)
        conflict = None
        for name, arr in fields.items():
            out_name = f"{prefix}.{name}" if prefix else name
            old = get_col(t, out_name)
            if old is not None:
                old_a = old.combine_chunks()
                if old_a.type != arr.type:
                    # mismatched prior column type: merge in STRING
                    # space unconditionally — deciding by whether the
                    # values happen to cast would make the output dtype
                    # value-dependent per batch (mixed block schemas in
                    # one Dataset); string keeps failed-parse rows'
                    # old values ("event untouched on failure") with a
                    # type that depends only on the input schema
                    old_a = pc.cast(old_a, pa.string())
                    arr = pc.cast(arr, pa.string())
                existing = pc.is_valid(old_a)
                use_new = ok if overwrite_keys else pc.and_(
                    ok, pc.invert(existing)
                )
                if not overwrite_keys:
                    c = pc.and_(ok, existing)
                    conflict = c if conflict is None else pc.or_(conflict, c)
                arr = pc.if_else(use_new, arr, old_a)
            t = set_col(t, out_name, arr)
        if conflict is not None:
            t = add_flag(t, conflict, "dissect_key_conflict")
        if not ignore_failure:
            t = add_flag(t, pc.invert(ok), "dissect_parsing_error")
        return t

    return run


@register("decode_json_fields")
def decode_json_fields(cfg: dict):
    """Parse JSON strings into typed columns
    (actions/decode_json_fields.go:50-103).

    Columnar adaptation: instead of open-ended key explosion, the
    ``expected`` map pins which keys become columns (name → arrow type
    string); everything else is ignored (schema-first, SURVEY §1.2).
    Config: fields, target (prefix, default "parsed"), expected,
    add_error_key, document_id."""
    fields = cfg.get("fields", ["text"])
    target = cfg.get("target", "parsed")
    expected: dict[str, str] = cfg.get(
        "expected", {"event": "string", "tool": "string", "duration_ms": "int64"}
    )
    add_error_key = cfg.get("add_error_key", False)
    document_id = cfg.get("document_id")
    types = {
        "string": pa.string(),
        "int64": pa.int64(),
        "float64": pa.float64(),
        "bool": pa.bool_(),
    }

    @_named("decode_json_fields")
    def run(t: pa.Table) -> pa.Table:
        n = t.num_rows
        for field in fields:
            col = get_col(t, field)
            if col is None:
                continue
            col = col.combine_chunks()
            # vectorized pre-filter: only JSON-looking rows leave Arrow
            # (the python json.loads loop touches ~the ndjson fraction,
            # not the whole batch)
            looks = pc.and_(
                pc.fill_null(pc.greater(pc.binary_length(col), 0), False),
                pc.or_(
                    pc.starts_with(pc.fill_null(col, ""), "{"),
                    pc.starts_with(pc.fill_null(col, ""), "["),
                ),
            )
            idx = np.flatnonzero(looks.to_numpy(zero_copy_only=False))
            sub_vals = pc.take(col, pa.array(idx)).to_pylist() if len(idx) else []
            parsed_sub: list[dict | None] = []
            bad = np.zeros(n, dtype=bool)
            for j, v in enumerate(sub_vals):
                try:
                    obj = json.loads(v)
                    if isinstance(obj, dict):
                        parsed_sub.append(obj)
                    else:
                        parsed_sub.append(None)
                        bad[idx[j]] = True
                except (json.JSONDecodeError, TypeError):
                    parsed_sub.append(None)
                    bad[idx[j]] = True
            for key, tname in expected.items():
                typ = types[tname]
                # MERGE with a previous source field's extraction — a
                # second field in `fields` must not null out rows the
                # first field already decoded
                pref0 = f"{target}." if target else ""
                cname = f"{pref0}{key}"
                if cname in t.column_names:
                    out = t[cname].to_pylist()
                else:
                    out = [None] * n
                for j, p in enumerate(parsed_sub):
                    if p is not None:
                        out[idx[j]] = p.get(key)
                try:
                    arr = pc.cast(pa.array(out), typ)
                except (pa.ArrowInvalid, pa.ArrowTypeError,
                        pa.ArrowNotImplementedError):
                    # heterogeneous or uncastable VALUES: coerce per
                    # value so one bad row nulls only itself — the
                    # reference never fails the event set for one value,
                    # and a blanket null would wipe rows a previous
                    # source field already decoded
                    coerced: list = []
                    for v in out:
                        if v is None:
                            coerced.append(None)
                            continue
                        try:
                            coerced.append(pa.scalar(v).cast(typ).as_py())
                        except (pa.ArrowInvalid, pa.ArrowTypeError,
                                pa.ArrowNotImplementedError, OverflowError,
                                ValueError, TypeError):
                            coerced.append(None)
                    arr = pa.array(coerced, typ)
                pref = f"{target}." if target else ""
                t = set_col(t, f"{pref}{key}", arr)
            if document_id:
                ids: list = [None] * n
                for j, p in enumerate(parsed_sub):
                    if p is not None:
                        ids[idx[j]] = str(p.get(document_id, ""))
                t = set_col(t, "meta.doc_id", pa.array(ids, pa.string()))
            if add_error_key and bad.any():
                t = set_error(t, pa.array(bad), "failed to decode json")
        return t

    return run


# RFC3164: "<34>Jan  1 00:00:07 host app[123]: message" — priority math
# pri>>3 = facility, pri&7 = severity (reference: reader/syslog/rfc3164).
_SYSLOG_PATTERN = (
    r"(?s)^<(?P<pri>\d{1,3})>"
    r"(?P<ts3164>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) "
    r"(?P<host>\S+) "
    # the TAG is OPTIONAL (rfc3164_test.go "ok": "<13>... test-host this
    # is the message" parses with no process) — a tagless line keeps
    # pri/ts/host and takes the remainder as msg
    r"(?:(?P<app>[^\[\s:]+)(?:\[(?P<pid>\d+)\])?: )?"
    r"(?P<msg>.*)$"
)

# RFC5424: "<34>1 2026-01-01T00:00:07Z host app 123 MSGID [sd] message"
# (reader/syslog/rfc5424_gen.go re-expressed as one vectorized regex)
_SYSLOG_5424_PATTERN = (
    r"(?s)^<(?P<pri>\d{1,3})>(?P<ver>\d) "
    r"(?P<ts>\S+) (?P<host>\S+) (?P<app>\S+) (?P<pid>\S+) (?P<msgid>\S+) "
    r"(?P<sd>-|\[.*?\])(?: (?P<msg>.*))?$"
)


def _null_if(col: pa.Array, sentinel: str, n: int) -> pa.Array:
    return pc.if_else(pc.equal(col, sentinel), pa.nulls(n, pa.string()), col)


# RFC5424 STRUCTURED-DATA: [SD-ID PARAM-NAME="PARAM-VALUE" ...]+ with
# \" \] \\ escapes inside values (reader/syslog/rfc5424_gen.go SD state
# machine, parser.go mapping). Two compiled regexes replace the ragel
# element/param scanners; unescaping mirrors the reference (only the
# three escapable characters are unescaped).
_SD_ELEM_RE = re.compile(r'\[([^ \]"=]+)((?:\s+[^ =\]"]+="(?:[^"\\]|\\.)*")*)\]')
_SD_PARAM_RE = re.compile(r'([^ =\]"]+)="((?:[^"\\]|\\.)*)"')
_SD_UNESCAPE_RE = re.compile(r'\\(["\\\]])')


def parse_sd_elements(sd: str | None) -> str | None:
    """Parse an SD field into a JSON string
    ``{"sd-id": {"param": "value", ...}, ...}`` (None for ``-``/empty/
    unparseable — matching the reference's nil StructuredData)."""
    if not sd or sd == "-" or sd[0] != "[":
        return None
    out: dict[str, dict[str, str]] = {}
    for m in _SD_ELEM_RE.finditer(sd):
        params: dict[str, str] = {}
        for pm in _SD_PARAM_RE.finditer(m.group(2)):
            params[pm.group(1)] = _SD_UNESCAPE_RE.sub(r"\1", pm.group(2))
        out[m.group(1)] = params
    return json.dumps(out, sort_keys=True) if out else None


@register("syslog")
def syslog_proc(cfg: dict):
    """Parse a syslog message from a field (processors/syslog/
    syslog.go:141; format auto-detect like syslog.go:51,103,173).
    Config ``format``: auto (default) | rfc3164 | rfc5424. Both formats
    are single vectorized regex extractions; auto merges per row
    (5424 wins where its version marker matches)."""
    field = cfg.get("field", "text")
    prefix = cfg.get("target_prefix", "syslog")
    fmt = cfg.get("format", "auto")

    @_named("syslog")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        n = t.num_rows
        arr = pc.fill_null(col.combine_chunks(), "")
        use_3164 = fmt in ("auto", "rfc3164")
        use_5424 = fmt in ("auto", "rfc5424")
        s3 = pc.extract_regex(arr, pattern=_SYSLOG_PATTERN) if use_3164 else None
        s5 = pc.extract_regex(arr, pattern=_SYSLOG_5424_PATTERN) if use_5424 else None
        ok3 = pc.is_valid(s3) if s3 is not None else pa.array([False] * n)
        ok5 = pc.is_valid(s5) if s5 is not None else pa.array([False] * n)
        ok3, ok5 = pc.fill_null(ok3, False), pc.fill_null(ok5, False)

        def pick(name5: str | None, name3: str | None) -> pa.Array:
            v5 = (
                pc.struct_field(s5, name5)
                if (s5 is not None and name5)
                else pa.nulls(n, pa.string())
            )
            v3 = (
                pc.struct_field(s3, name3)
                if (s3 is not None and name3)
                else pa.nulls(n, pa.string())
            )
            return pc.if_else(ok5, v5, v3)

        pri = pc.cast(pick("pri", "pri"), pa.int64(), safe=False)
        t = set_col(t, f"{prefix}.pri", pri)
        t = set_col(t, f"{prefix}.facility", pc.shift_right(pri, 3))
        t = set_col(t, f"{prefix}.severity", pc.bit_wise_and(pri, 7))
        t = set_col(t, f"{prefix}.host", pick("host", "host"))
        # "-" = 5424 NILVALUE; "" = the 3164 optional tag not present
        t = set_col(
            t, f"{prefix}.app",
            _null_if(_null_if(pick("app", "app"), "-", n), "", n),
        )
        pid = _null_if(pick("pid", "pid"), "-", n)
        pid = _null_if(pid, "", n)
        # RFC5424 PROCID may be any PRINTUSASCII token (e.g. "ID47") —
        # only numeric ones become integers, others null (never crash)
        pid = pc.if_else(
            pc.fill_null(pc.match_substring_regex(pid, r"^\d+$"), False),
            pid, pa.nulls(n, pa.string()),
        )
        t = set_col(t, f"{prefix}.pid", pc.cast(pid, pa.int64(), safe=False))
        t = set_col(t, f"{prefix}.msg", pick("msg", "msg"))
        t = set_col(t, f"{prefix}.version",
                    pc.cast(_null_if(pick("ver", None), "", n), pa.int64(),
                            safe=False))
        t = set_col(t, f"{prefix}.msgid", _null_if(pick("msgid", None), "-", n))
        if s5 is not None:
            # SD elements: per-row parse of only the 5424-matched rows
            # (nested key=value structure — not expressible as a single
            # Arrow kernel; the row loop touches syslog rows only)
            sd_raw = pc.struct_field(s5, "sd").to_pylist()
            sd_vals = [
                parse_sd_elements(v) if ok else None
                for v, ok in zip(sd_raw, ok5.to_pylist())
            ]
            t = set_col(t, f"{prefix}.sd", pa.array(sd_vals, pa.string()))
        t = set_col(t, f"{prefix}.ok", pc.or_(ok3, ok5))
        return t

    return run


@register("container")
def container_proc(cfg: dict):
    """Docker/CRI container log JSON ``{"log":..,"stream":..,"time":..}``
    (readjson/docker_json.go): fixed-schema ndjson + optional stream
    filter (stdout/stderr)."""
    field = cfg.get("field", "text")
    prefix = cfg.get("target_prefix", "container")
    stream_filter = cfg.get("stream", "all")

    inner = decode_json_fields(
        {
            "fields": [field],
            "target": prefix,
            "expected": {"log": "string", "stream": "string", "time": "string"},
            "add_error_key": True,
        }
    )

    class _Container:
        name = "container"
        drops_rows = stream_filter != "all"

        def __call__(self, t: pa.Table) -> pa.Table:
            t = inner(t)
            if stream_filter != "all":
                t = t.filter(
                    pc.fill_null(
                        pc.equal(t[f"{prefix}.stream"].combine_chunks(), stream_filter),
                        False,
                    )
                )
            return t

    return _Container()


@register("multiline_stats")
def multiline_stats(cfg: dict):
    """Per-row stats for already-joined multiline events: line count and
    first line (reader/multiline pattern mode produces joined events;
    max_lines default 500, multiline_config.go:28-45). The cross-row JOIN
    operator lives in beats_ray.stages.multiline."""
    field = cfg.get("field", "text")
    prefix = cfg.get("target_prefix", "multiline")
    max_lines = cfg.get("max_lines", 500)

    @_named("multiline_stats")
    def run(t: pa.Table) -> pa.Table:
        src_col = get_col(t, field)
        if src_col is None:
            return t
        col = pc.fill_null(src_col.combine_chunks(), "")
        parts = pc.split_pattern(col, pattern="\n")
        n = pc.list_value_length(parts)
        t = set_col(t, f"{prefix}.n_lines", pc.cast(n, pa.int64()))
        t = set_col(t, f"{prefix}.first_line", pc.list_element(parts, 0))
        # message_buffer.go:122-128: ANY joined event (numLines > 1)
        # carries the 'multiline' flag; exceeding the line cap adds the
        # separate 'truncated' flag
        t = add_flag(t, pc.greater(n, 1), "multiline")
        t = add_flag(t, pc.greater(n, max_lines), "truncated")
        return t

    return run


class _IncludeMessage:
    """Keep only rows whose field matches one of the patterns
    (reader/filter/ include_message parser; also models filebeat
    include_lines/exclude_lines, input.go:800+)."""

    name = "include_message"
    drops_rows = True

    def __init__(self, cfg: dict):
        self.field = cfg.get("field", "text")
        self.include = cfg.get("patterns", cfg.get("include", []))
        self.exclude = cfg.get("exclude", [])

    def keep_mask(self, t: pa.Table) -> pa.Array:
        col = get_col(t, self.field)
        if col is None:
            return pa.array(np.zeros(t.num_rows, dtype=bool))
        arr = pc.fill_null(col.combine_chunks(), "")
        if self.include:
            keep = None
            for p in self.include:
                m = pc.match_substring_regex(arr, p)
                keep = m if keep is None else pc.or_(keep, m)
        else:
            keep = pa.array(np.ones(t.num_rows, dtype=bool))
        for p in self.exclude:
            keep = pc.and_(keep, pc.invert(pc.match_substring_regex(arr, p)))
        return keep

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.filter(self.keep_mask(t))


@register("include_message")
def include_message(cfg: dict):
    return _IncludeMessage(cfg)
