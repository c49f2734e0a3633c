"""Grok processor — Logstash-pattern-syntax regex parse as a
vectorized Arrow stage.

The north star names "grok/regex parse" as the engine's parse
vocabulary alongside dissect (beats itself ships dissect; grok is the
sibling Elastic parse stage — Elasticsearch ingest's grok processor and
Logstash's grok filter share one public pattern syntax, the
logstash-patterns-core vocabulary). This module re-expresses that
surface columnar-first:

- ``%{NAME}`` / ``%{NAME:field}`` / ``%{NAME:field:int|float}``
  pattern references expand recursively against a built-in library
  plus per-processor ``pattern_definitions``.
- Each expanded pattern compiles ONCE (module-level cache keyed by the
  config tuple) to a single RE2-syntax regex with named groups; a
  batch is parsed with ONE ``pc.extract_regex`` call per pattern —
  Arrow's C++ RE2 engine, zero Python per row.
- Multiple ``patterns`` are first-match-wins per row (the ingest-grok
  contract): later patterns only fill rows earlier ones left null.

RE2 note (documented substitution): the upstream pattern library is
written for Oniguruma and uses atomic groups / lookbehind in a handful
of definitions (BASE10NUM, UNIXPATH, QUOTEDSTRING). RE2 has neither —
the library below re-expresses those patterns with plain alternation,
which RE2 matches in guaranteed-linear time (no catastrophic
backtracking class at all, strictly better for a hot ingest path).
Semantics on well-formed inputs are unchanged; the divergences are
corner cases the tests pin (e.g. BASE10NUM may match the digit tail of
``1..2``).

Reference shape: libbeat has no grok processor — parity target is the
public Elasticsearch ingest grok processor config surface (``field``,
``patterns``, ``pattern_definitions``, ``ignore_missing``) mapped onto
this repo's processor conventions (target_prefix + failure flag, like
``dissect`` in parse.py).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .base import _named, add_flag, get_col, register, set_col

# ---------------------------------------------------------------------------
# Built-in pattern library (logstash-patterns-core vocabulary, RE2-safe)
# ---------------------------------------------------------------------------

BUILTIN_PATTERNS: dict[str, str] = {
    # --- base ---
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"[+-]?(?:[0-9]+)",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "NUMBER": r"%{BASE10NUM}",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": (
        r'(?:"(?:\\.|[^"\\])*"|\'(?:\\.|[^\'\\])*\'|`(?:\\.|[^`\\])*`)'
    ),
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    # --- networking ---
    "IPV4": (
        r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    ),
    # upstream IPV6 is lookaround-free already; RE2 alternation is
    # leftmost-FIRST (not longest), so alternatives with trailing
    # hextets must come before the bare-trailing-colon forms or an
    # unanchored extract of "2001:db8::1" stops at "2001:db8::"
    "IPV6": (
        r"(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,5}(?::[0-9A-Fa-f]{1,4}){1,2}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,4}(?::[0-9A-Fa-f]{1,4}){1,3}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,3}(?::[0-9A-Fa-f]{1,4}){1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,2}(?::[0-9A-Fa-f]{1,4}){1,5}"
        r"|[0-9A-Fa-f]{1,4}:(?::[0-9A-Fa-f]{1,4}){1,6}"
        r"|:(?::[0-9A-Fa-f]{1,4}){1,7}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,7}:"
        r"|::"
        r")(?:%[0-9A-Za-z]+)?"
    ),
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": (
        r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
        r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"
    ),
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "EMAILLOCALPART": (
        r"[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,64}"
        r"(?:\.[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,62})*"
    ),
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    # --- paths / URIs ---
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "TTY": r"(?:/dev/(?:pts|tty(?:[pq])?)(?:\w+)?/?(?:[0-9]+))",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+\-.]*",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIQUERY": r"[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPARAM": r"\?%{URIQUERY}",
    "URIPATHPARAM": r"%{URIPATH}(?:\?%{URIQUERY})?",
    "URI": (
        r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?"
        r"(?:%{URIHOST})?(?:%{URIPATHPARAM})?"
    ),
    # --- dates / times ---
    "MONTH": (
        r"\b(?:[Jj]an(?:uary)?|[Ff]eb(?:ruary)?|[Mm]ar(?:ch)?"
        r"|[Aa]pr(?:il)?|[Mm]ay|[Jj]un(?:e)?|[Jj]ul(?:y)?"
        r"|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo]ct(?:ober)?"
        r"|[Nn]ov(?:ember)?|[Dd]ec(?:ember)?)\b"
    ),
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": (
        r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?"
        r"|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)"
    ),
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?:%{HOUR}:%{MINUTE}(?::%{SECOND})?)",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND": r"%{SECOND}",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM2}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "DATE": r"(?:%{DATE_US}|%{DATE_EU})",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    # --- logging ---
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG"
        r"|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO"
        r"|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?"
        r"|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL"
        r"|[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)"
    ),
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG}(?:\[%{POSINT}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT}.%{NONNEGINT}>",
    "HTTPMETHOD": (
        r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)"
    ),
    # Apache/nginx access-log composite, capture-free (compose your own
    # semantics: '%{IPORHOST:clientip} ... "%{HTTPMETHOD:verb} ..."')
    "COMMONAPACHELOG": (
        r'%{IPORHOST} %{USER} %{USER} \[%{HTTPDATE}\] '
        r'"(?:%{HTTPMETHOD} %{NOTSPACE}(?: HTTP/%{NUMBER})?|%{DATA})" '
        r"%{NONNEGINT} (?:%{NONNEGINT}|-)"
    ),
}

_REF_RX = re.compile(
    r"%\{(?P<name>[A-Z0-9_]+)"
    r"(?::(?P<semantic>[A-Za-z0-9_.\-\[\]@]+?)"
    r"(?::(?P<type>int|long|float|double|string|boolean))?)?\}"
)

_GROUP_RX = re.compile(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>")

_MAX_DEPTH = 32


class GrokError(ValueError):
    pass


def expand_pattern(
    pattern: str, definitions: dict[str, str] | None = None
) -> tuple[str, list[tuple[str, str, str]]]:
    """Expand ``%{NAME[:semantic[:type]]}`` references recursively.

    Returns ``(re2_regex, captures)`` where captures is a list of
    ``(group_alias, semantic_name, type)`` in pattern order. Unnamed
    references expand to non-capturing groups; named ones to RE2
    named groups with synthetic aliases (semantic names may contain
    dots/brackets, which RE2 group names cannot).
    """
    library = dict(BUILTIN_PATTERNS)
    if definitions:
        library.update(definitions)
    captures: list[tuple[str, str, str]] = []

    def walk(pat: str, depth: int) -> str:
        if depth > _MAX_DEPTH:
            raise GrokError(
                "grok pattern expansion exceeded depth %d "
                "(circular %%{...} reference?)" % _MAX_DEPTH
            )

        def repl(m: re.Match) -> str:
            name = m.group("name")
            if name not in library:
                raise GrokError(f"unknown grok pattern %{{{name}}}")
            inner = walk(library[name], depth + 1)
            semantic = m.group("semantic")
            if semantic:
                alias = f"g{len(captures)}"
                captures.append((alias, semantic, m.group("type") or "string"))
                return f"(?P<{alias}>{inner})"
            return f"(?:{inner})"

        return _REF_RX.sub(repl, pat)

    expanded = walk(pattern, 0)
    # raw (?P<name>...) groups written directly in the pattern are
    # semantic captures too (Oniguruma-style named groups in logstash)
    for gname in _GROUP_RX.findall(expanded):
        if not gname.startswith("g") or not gname[1:].isdigit():
            captures.append((gname, gname, "string"))
    return expanded, captures


_ARROW_TYPES = {
    "int": pa.int64(),
    "long": pa.int64(),
    "float": pa.float64(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
    "string": pa.string(),
}


def compile_grok(
    patterns: list[str], definitions: dict[str, str] | None = None
) -> list[tuple[str, list[tuple[str, str, str]]]]:
    """Expand + validate each pattern (RE2 compile check via a probe
    ``pc.extract_regex`` / ``pc.match_substring_regex`` call, so config
    errors surface at build time on the driver — the repo's eager-
    validation convention)."""
    compiled = []
    probe = pa.array(["x"], pa.string())
    for pat in patterns:
        rx, caps = expand_pattern(pat, definitions)
        seen: set[str] = set()
        for _, semantic, _ in caps:
            if semantic in seen:
                raise GrokError(
                    f"duplicate semantic name {semantic!r} in one grok "
                    "pattern (RE2 named groups must be unique; use two "
                    "patterns in `patterns:` for alternatives)"
                )
            seen.add(semantic)
        try:
            if caps:
                pc.extract_regex(probe, pattern=rx)
            else:
                pc.match_substring_regex(probe, pattern=rx)
        except pa.ArrowInvalid as exc:
            raise GrokError(f"grok pattern does not compile: {exc}") from exc
        compiled.append((rx, caps))
    return compiled


def grok_batch(
    compiled: list[tuple[str, list[tuple[str, str, str]]]],
    col: pa.ChunkedArray | pa.Array,
) -> tuple[dict[str, pa.Array], pa.Array]:
    """Parse a column: one ``pc.extract_regex`` per pattern,
    first-match-wins per row across patterns. Returns
    ``(semantic_name -> typed array, matched mask)``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    scol = pc.cast(col, pa.string()) if col.type != pa.string() else col
    fields: dict[str, pa.Array] = {}
    types: dict[str, pa.DataType] = {}
    matched = pa.array([False] * n, pa.bool_())
    for rx, caps in compiled:
        if caps:
            st = pc.extract_regex(scol, pattern=rx)
            ok_here = pc.fill_null(pc.is_valid(st), False)
        else:
            st = None
            ok_here = pc.fill_null(
                pc.match_substring_regex(scol, pattern=rx), False
            )
        # first-match-wins: this pattern only claims rows no earlier
        # pattern matched
        take = pc.and_(ok_here, pc.invert(matched))
        matched = pc.or_(matched, ok_here)
        for alias, semantic, typ in caps:
            raw = pc.struct_field(st, alias)
            at = _ARROW_TYPES[typ]
            if typ != "string":
                # a named group inside an alternation/optional that did
                # not participate in the match extracts as "" (RE2 has
                # no per-group null) — for typed captures that means
                # "field not set", never a castable value
                raw = pc.if_else(
                    pc.not_equal(raw, ""), raw, pa.nulls(n, pa.string())
                )
            if typ in ("int", "long"):
                # RE2 already constrained the text; cast is exact
                val = pc.cast(raw, at)
            elif typ in ("float", "double"):
                val = pc.cast(raw, at)
            elif typ == "boolean":
                val = pc.equal(pc.utf8_lower(raw), "true")
            else:
                val = raw
            val = pc.if_else(take, val, pa.nulls(n, at))
            prev = fields.get(semantic)
            if prev is None:
                fields[semantic] = val
                types[semantic] = at
            else:
                if types[semantic] != at:
                    prev = pc.cast(prev, pa.string())
                    val = pc.cast(val, pa.string())
                    types[semantic] = pa.string()
                    fields[semantic] = prev
                fields[semantic] = pc.if_else(take, val, prev)
    return fields, matched


@register("grok")
def grok_proc(cfg: dict):
    """Grok processor (Elasticsearch ingest grok config surface on this
    repo's processor conventions).

    Config: ``patterns`` (list; or ``pattern`` singular), ``field``
    (default "text"), ``pattern_definitions``, ``target_prefix``
    (default "grok"; "" = top level), ``ignore_failure``,
    ``overwrite_keys`` (default false — an existing non-null target
    value survives, like dissect). Failure (no pattern matched) →
    ``grok_parsing_error`` flag unless ignore_failure."""
    pats = cfg.get("patterns") or ([cfg["pattern"]] if "pattern" in cfg else None)
    if not pats:
        raise GrokError("grok: `patterns` is required")
    field = cfg.get("field", "text")
    prefix = cfg.get("target_prefix", "grok")
    ignore_failure = cfg.get("ignore_failure", False)
    overwrite_keys = cfg.get("overwrite_keys", False)
    compiled = compile_grok(list(pats), cfg.get("pattern_definitions"))

    @_named("grok")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        fields, ok = grok_batch(compiled, col)
        for name, arr in fields.items():
            out_name = f"{prefix}.{name}" if prefix else name
            old = get_col(t, out_name)
            if old is not None:
                old_a = old.combine_chunks()
                if old_a.type != arr.type:
                    old_a = pc.cast(old_a, pa.string())
                    arr = pc.cast(arr, pa.string())
                use_new = (
                    pc.is_valid(arr) if overwrite_keys
                    else pc.and_(pc.is_valid(arr), pc.is_null(old_a))
                )
                arr = pc.if_else(use_new, arr, old_a)
            t = set_col(t, out_name, arr)
        if not ignore_failure:
            t = add_flag(t, pc.invert(ok), "grok_parsing_error")
        return t

    return run
