"""Dissect tokenizer compiler — the engine's grok-equivalent parse stage.

Reimplements the semantics of the reference's dissect processor
(libbeat/processors/dissect/, ~2.9k LoC; tokenizer syntax ``"%{key} -
%{key2}"``) as a **compile-to-regex** design: the tokenizer is compiled
once into a single anchored RE2-compatible pattern with named capture
groups, so a whole Arrow batch is parsed with ONE
``pyarrow.compute.extract_regex`` call — no per-row Python regex in the
hot path.

Supported modifiers (reference: libbeat/processors/dissect/const.go:33-41,
field.go):
  ``%{}`` / ``%{?name}``  skip / named skip (named value usable as an
                          indirect target)
  ``%{+key}``             append, optional ordinal ``%{+key/2}``
  ``%{&key}``             indirect value (field name taken from ``%{*key}``
                          or a named skip)
  ``%{*key}``             pointer (captures a field NAME)
  ``%{key->}``            greedy: consume repeated trailing delimiters
  ``%{key#N}``            fixed length (N chars)
  ``%{key|type}``         typed conversion: integer/long/float/double/
                          string/boolean/ip (field.go:62-70)

Semantics matched against the reference golden corpus
(libbeat/processors/dissect/testdata/dissect_tests.json, 27 cases):
  - delimiters are matched left-to-right; a missing delimiter ⇒ failure.
  - content after the FINAL literal delimiter is ignored; but when the
    tokenizer ends with a key, that key consumes to end-of-string (and a
    fixed-length final key must land exactly on end-of-string).
  - append joins pieces in (ordinal, appearance) order; each
    subsequent piece contributes ITS OWN preceding tokenizer delimiter
    as the separator (space when it has none) — exactly
    appendField.previous / JoinString, field.go:221-234.
  - a plain ``%{key}`` contributes to the append group of the same name.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"%\{([^}]*)\}")

# strconv.ParseBool's EXACT accepted set (dissect.go:266) — partially
# case-sensitive: "True" parses but "tRuE" errors. On error the
# reference's convertData (dissect.go:277-285) keeps the RAW STRING,
# which the scalar path mirrors via raise→keep; the Arrow path nulls
# instead (a typed bool column can't hold the raw string per row).
_BOOL_TOKENS = {
    "1": True, "t": True, "T": True, "TRUE": True, "true": True,
    "True": True,
    "0": False, "f": False, "F": False, "FALSE": False, "false": False,
    "False": False,
}


def _parse_bool(v: str) -> bool:
    try:
        return _BOOL_TOKENS[v]
    except KeyError:
        raise ValueError(f"invalid boolean token {v!r}") from None


CONVERTERS = {
    "integer": int,
    "long": int,
    "float": float,
    "double": float,
    "string": str,
    "boolean": _parse_bool,
    "ip": str,  # validated downstream; kept as string
}


class DissectError(ValueError):
    pass


@dataclass
class _Key:
    name: str
    skip: bool = False
    named_skip: bool = False
    append: bool = False
    ordinal: int = 0
    pointer: bool = False  # %{*key}
    indirect: bool = False  # %{&key}
    greedy: bool = False  # ->
    length: int | None = None  # #N fixed length
    dtype: str | None = None  # |type
    next_delim: str = ""  # delimiter FOLLOWING this key
    prev_delim: str = ""  # delimiter PRECEDING this key (append join sep,
    #                       reference: appendField.previous, field.go:230)


@dataclass
class CompiledDissect:
    tokenizer: str
    pattern: str  # RE2- and re-compatible, ^-anchored, DOTALL
    keys: list[_Key] = field(default_factory=list)
    out_fields: list[str] = field(default_factory=list)
    simple: bool = True  # no append/indirect/pointer → pure-Arrow resolve

    _rx: re.Pattern | None = None

    def regex(self) -> re.Pattern:
        if self._rx is None:
            self._rx = re.compile(self.pattern)
        return self._rx

    # ---- single-string API (conformance corpus tests) ----
    def apply(self, s: str) -> dict[str, object] | None:
        m = self.regex().match(s)
        if m is None:
            return None
        return self._resolve(m.groups())

    def _resolve(self, groups: tuple[str | None, ...],
                 convert: bool = True,
                 typed_out: dict | None = None) -> dict[str, object]:
        out: dict[str, object] = {}
        append_names = {k.name for k in self.keys if k.append}
        appends: dict[str, list[tuple[int, int, str, str]]] = {}
        pointers: dict[str, str] = {}
        indirects: list[tuple[str, str]] = []
        for pos, (k, v) in enumerate(zip(self.keys, groups)):
            if v is None:
                v = ""
            if k.skip:
                if k.named_skip and k.name:
                    pointers[k.name] = v
                continue
            if k.pointer:
                pointers[k.name] = v
                continue
            if k.indirect:
                indirects.append((k, v))
                continue
            if k.name in append_names:
                appends.setdefault(k.name, []).append(
                    (k.ordinal, pos, v, k.prev_delim)
                )
                continue
            out[k.name] = v
        for name, parts in appends.items():
            # reference semantics (field.go:221-234): apply in
            # (ordinal, appearance) order; each subsequent piece joins
            # with ITS OWN preceding tokenizer delimiter (space when the
            # piece is at the start of the pattern)
            parts.sort(key=lambda t: (t[0], t[1]))
            buf = parts[0][2]
            for _, _, val, prev_delim in parts[1:]:
                buf += (prev_delim if prev_delim else " ") + val
            out[name] = buf
        for ik, v in indirects:
            target = pointers.get(ik.name)
            if target is None:
                target = str(out.get(ik.name, ik.name))
            out[target] = v
            # typed indirect key (%{&k|integer}): the conversion
            # applies at the DYNAMIC target name — the generic loop
            # below only sees static names and silently skipped it
            if ik.dtype:
                if convert:
                    try:
                        out[target] = CONVERTERS[ik.dtype](v)
                    except (ValueError, AttributeError):
                        pass
                elif typed_out is not None:
                    prev = typed_out.get(target)
                    typed_out[target] = (
                        ik.dtype if prev in (None, ik.dtype) else "__mixed__"
                    )
        if convert:
            for k in self.keys:
                if (k.dtype and not k.skip and not k.indirect
                        and k.name in out):
                    try:
                        out[k.name] = CONVERTERS[k.dtype](out[k.name])  # type: ignore[arg-type]
                    except (ValueError, AttributeError):
                        pass
        return out


def _parse_key(raw: str) -> _Key:
    k = _Key(name=raw)
    body = raw
    if body.endswith("->"):
        k.greedy = True
        body = body[:-2]
    if "|" in body:
        body, t = body.rsplit("|", 1)
        if t not in CONVERTERS:
            raise DissectError(f"unknown type {t!r} in %{{{raw}}}")
        k.dtype = t
    if "#" in body:
        body, n = body.rsplit("#", 1)
        try:
            k.length = int(n)
        except ValueError as e:
            raise DissectError(f"bad length in %{{{raw}}}") from e
    if body.startswith("+"):
        k.append = True
        body = body[1:]
        if "/" in body:
            body, o = body.rsplit("/", 1)
            try:
                k.ordinal = int(o)
            except ValueError as e:
                raise DissectError(f"bad ordinal in %{{{raw}}}") from e
    elif body.startswith("?"):
        k.skip = True
        k.named_skip = True
        body = body[1:]
    elif body.startswith("*"):
        k.pointer = True
        body = body[1:]
    elif body.startswith("&"):
        k.indirect = True
        body = body[1:]
    if body == "":
        k.skip = True
        k.named_skip = False
    k.name = body
    return k


def compile_tokenizer(tok: str) -> CompiledDissect:
    """Compile a dissect tokenizer into one anchored regex + key plan."""
    matches = list(TOKEN_RE.finditer(tok))
    if not matches:
        raise DissectError("tokenizer contains no %{} fields")
    keys: list[_Key] = []
    parts: list[str] = ["(?s)^", re.escape(tok[: matches[0].start()])]
    prev_end = 0
    for i, m in enumerate(matches):
        key = _parse_key(m.group(1))
        nxt = matches[i + 1].start() if i + 1 < len(matches) else len(tok)
        delim = tok[m.end() : nxt]
        key.next_delim = delim
        # the preceding delimiter node: text between the previous key's
        # end and this key's start (for i=0: the leading literal —
        # reference passes that delimiter node as `previous` too)
        key.prev_delim = tok[prev_end : m.start()]
        prev_end = m.end()
        keys.append(key)
        gname = f"g{len(keys) - 1}"
        last = i + 1 == len(matches)
        if key.length is not None:
            cap = f"(?P<{gname}>.{{{key.length}}})"
        elif delim == "" and last:
            cap = f"(?P<{gname}>.*)"  # final key: consume to end
        elif delim == "":
            # two adjacent variable-width keys (%{a}%{b}): the first
            # lazy capture would ALWAYS match empty — the reference
            # rejects zero-width delimiters between keys (fixed-length
            # keys excepted: their width disambiguates)
            raise DissectError(
                f"zero-width delimiter between keys in {tok!r}"
            )
        else:
            cap = f"(?P<{gname}>.*?)"
        parts.append(cap)
        if delim:
            esc = re.escape(delim)
            # greedy `->` collapses repeated delimiter runs
            parts.append(f"(?:{esc})+" if key.greedy else esc)
        elif last:
            # tokenizer ends with a key → must consume to end-of-string
            # (a trailing fixed-length key fails on leftover input);
            # when it ends with a literal, trailing content is ignored.
            parts.append("$")
    pattern = "".join(parts)
    cd = CompiledDissect(tokenizer=tok, pattern=pattern, keys=keys)
    cd.simple = not any(k.append or k.indirect or k.pointer for k in keys)
    seen: list[str] = []
    for k in keys:
        if not k.skip and not k.pointer and not k.indirect and k.name not in seen:
            seen.append(k.name)
    cd.out_fields = seen
    return cd


def dissect_batch(
    compiled: CompiledDissect,
    arr: pa.Array | pa.ChunkedArray,
    trim_values: str = "none",
    trim_chars: str = " ",
) -> tuple[dict[str, pa.Array], pa.Array]:
    """Vectorized dissect over a string column.

    Returns (field arrays keyed by output name, ok-mask). Rows that fail
    to parse get null fields — the caller records the failure flag
    (reference: ``dissect_parsing_error``, dissect/processor.go:33).

    Fast path: tokenizers without append/indirect/pointer are resolved
    entirely with Arrow kernels (extract_regex → struct_field). Modifier
    tokenizers still run the regex vectorized, then resolve captured
    groups per matched row in Python.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    n = len(arr)
    struct = pc.extract_regex(arr, pattern=compiled.pattern)
    ok = pc.is_valid(struct)
    out: dict[str, pa.Array] = {}
    if compiled.simple:
        for gi, k in enumerate(compiled.keys):
            if k.skip:
                continue
            col = pc.struct_field(struct, f"g{gi}")
            col = _trim(col, trim_values, trim_chars)
            out[k.name] = _convert_arr(col, k.dtype)
        return out, ok
    ok_np = ok.to_numpy(zero_copy_only=False)
    group_cols = [
        pc.struct_field(struct, f"g{gi}").to_pylist()
        for gi in range(len(compiled.keys))
    ]
    # resolve WITHOUT per-row typed conversion: mixed per-row types
    # (some rows unconvertible) would break pa.array; conversion happens
    # column-wise below with the same null-on-garbage masking as the
    # simple path
    typed_dynamic: dict[str, str] = {}
    rows: list[dict[str, object] | None] = [
        compiled._resolve(tuple(c[ri] for c in group_cols), convert=False,
                          typed_out=typed_dynamic)
        if ok_np[ri]
        else None
        for ri in range(n)
    ]
    names: list[str] = []
    for r in rows:
        if r:
            for name in r:
                if name not in names:
                    names.append(name)
    dtypes = {k.name: k.dtype for k in compiled.keys if k.dtype and not k.skip}
    # typed INDIRECT keys convert at their dynamic target column; a
    # column fed by conflicting dtypes across rows stays string
    dtypes.update({name: dt for name, dt in typed_dynamic.items()
                   if dt != "__mixed__"})
    for name in names:
        col = pa.array([None if r is None else r.get(name) for r in rows])
        if col.type == pa.null():
            col = col.cast(pa.string())
        col = _trim(col, trim_values, trim_chars)
        out[name] = _convert_arr(col, dtypes.get(name))
    return out, ok


def _trim(col: pa.Array, mode: str, chars: str) -> pa.Array:
    if mode == "none" or not pa.types.is_string(col.type):
        return col
    if mode == "left":
        return pc.utf8_ltrim(col, characters=chars)
    if mode == "right":
        return pc.utf8_rtrim(col, characters=chars)
    if mode == "all":
        return pc.utf8_trim(col, characters=chars)
    raise DissectError(f"unknown trim mode {mode!r}")


_INT_RX = r"^[+-]?\d+$"
_FLOAT_RX = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def _masked_cast(col: pa.Array, rx: str, typ: pa.DataType) -> pa.Array:
    # validate-then-cast: unparseable captures become null instead of
    # crashing the batch (tag-and-keep; the single-string path already
    # falls back per row)
    ok = pc.fill_null(pc.match_substring_regex(col, rx), False)
    safe = pc.if_else(ok, col, pa.nulls(len(col), pa.string()))
    return pc.cast(safe, typ)


def _convert_arr(col: pa.Array, dtype: str | None) -> pa.Array:
    if dtype in (None, "string", "ip"):
        return col
    if dtype in ("integer", "long"):
        return _masked_cast(col, _INT_RX, pa.int64())
    if dtype in ("float", "double"):
        return _masked_cast(col, _FLOAT_RX, pa.float64())
    if dtype == "boolean":
        # strconv.ParseBool's exact token set; tokens outside it become
        # null (validate-then-cast, same tag-and-keep policy as the
        # numeric paths) instead of silently collapsing to false
        valid = pc.is_in(col, value_set=pa.array(list(_BOOL_TOKENS)))
        truev = pc.is_in(
            col,
            value_set=pa.array([k for k, b in _BOOL_TOKENS.items() if b]),
        )
        return pc.if_else(valid, truev, pa.scalar(None, pa.bool_()))
    return col
