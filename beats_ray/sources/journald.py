"""journald input re-expressed over Ray Data.

The reference's journald input (filebeat/input/journald/input.go:176-250)
shells out to ``journalctl`` and converts journal fields to ECS through a
conversion table (pkg/journalfield/default.go:7-80, conv.go:37-66 + the
ECS enrichment conv.go:92-160).  There is no live systemd in a batch
engine, so the Ray-native seam is the journal's *interchange* formats:

- ``journalctl -o export`` files — the Journal Export Format
  (KEY=value text lines; ``KEY\\n<le64 size><bytes>\\n`` for binary
  values; entries separated by a blank line).  Parsed here by
  :func:`read_journal_export`, file-parallel like the harvester pool.
- ``journalctl -o json`` ndjson — the very stream the reference parses
  (pkg/journalctl/reader.go); handled by the existing ndjson source.

Conversion (:func:`journald_conv`) is a vectorized map_batches stage:
the per-entry field map rides through the Dataset as ONE json string
column, each batch is re-hydrated with pyarrow's C++ JSON reader, and
every conversion/enrichment is an Arrow/pandas column kernel — no
per-row Python in the hot path (the only per-row work runs over
dictionary-encoded *unique* values: cmdline arg splitting and
capability-mask expansion, both tiny).
"""

from __future__ import annotations

import bisect
import io
import json
import struct

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import json as pajson

__all__ = [
    "read_journal_export",
    "parse_journal_export",
    "journald_conv",
    "JOURNALD_FIELDS",
]


# ---------------------------------------------------------------------------
# Field conversion table (journalfield/default.go:7-80, verbatim mapping).
# journal key -> (ecs names, is_integer).  Dropped keys are handled by the
# reader (cursor/timestamps) or omitted entirely.
# ---------------------------------------------------------------------------

def _t(*names):
    return (names, False)


def _i(*names):
    return (names, True)


JOURNALD_FIELDS: dict[str, tuple[tuple[str, ...], bool]] = {
    "COREDUMP_UNIT": _t("journald.coredump.unit"),
    "COREDUMP_USER_UNIT": _t("journald.coredump.user_unit"),
    "MESSAGE_ID": _t("message_id"),
    "OBJECT_AUDIT_LOGINUID": _i("journald.object.audit.login_uid"),
    "OBJECT_AUDIT_SESSION": _i("journald.object.audit.session"),
    "OBJECT_CMDLINE": _t("journald.object.process.command_line"),
    "OBJECT_COMM": _t("journald.object.process.name"),
    "OBJECT_EXE": _t("journald.object.process.executable"),
    "OBJECT_GID": _i("journald.object.gid"),
    "OBJECT_PID": _i("journald.object.pid"),
    "OBJECT_SYSTEMD_OWNER_UID": _i("journald.object.systemd.owner_uid"),
    "OBJECT_SYSTEMD_SESSION": _t("journald.object.systemd.session"),
    "OBJECT_SYSTEMD_UNIT": _t("journald.object.systemd.unit"),
    "OBJECT_SYSTEMD_USER_UNIT": _t("journald.object.systemd.user_unit"),
    "OBJECT_UID": _i("journald.object.uid"),
    "PRIORITY": _i("log.syslog.priority"),
    "SYSLOG_FACILITY": _i("log.syslog.facility.code"),
    "SYSLOG_IDENTIFIER": _t("log.syslog.appname"),
    "SYSLOG_PID": _i("log.syslog.procid"),
    "UNIT": _t("journald.unit"),
    "_AUDIT_LOGINUID": _i("journald.audit.login_uid"),
    "_AUDIT_SESSION": _t("journald.audit.session"),
    "_BOOT_ID": _t("journald.host.boot_id"),
    "_CAP_EFFECTIVE": _t("journald.process.capabilities"),
    "_CMDLINE": _t("journald.process.command_line"),
    "CODE_FILE": _t("journald.code.file"),
    "CODE_FUNC": _t("journald.code.func"),
    "CODE_LINE": _i("journald.code.line"),
    "_COMM": _t("journald.process.name"),
    "_EXE": _t("journald.process.executable"),
    "_GID": _i("journald.gid"),
    "_HOSTNAME": _t("host.hostname"),
    "_KERNEL_DEVICE": _t("journald.kernel.device"),
    "_KERNEL_SUBSYSTEM": _t("journald.kernel.subsystem"),
    "_MACHINE_ID": _t("host.id"),
    "_PID": _i("journald.pid"),
    "_SYSTEMD_CGROUP": _t("systemd.cgroup"),
    "_SYSTEMD_INVOCATION_ID": _t("systemd.invocation_id"),
    "_SYSTEMD_OWNER_UID": _i("systemd.owner_uid"),
    "_SYSTEMD_SESSION": _t("systemd.session"),
    "_SYSTEMD_SLICE": _t("systemd.slice"),
    "_SYSTEMD_UNIT": _t("systemd.unit"),
    "_SYSTEMD_USER_SLICE": _t("systemd.user_slice"),
    "_SYSTEMD_USER_UNIT": _t("systemd.user_unit"),
    "_TRANSPORT": _t("systemd.transport"),
    "_UDEV_DEVLINK": _t("journald.kernel.device_symlinks"),
    "_UDEV_DEVNODE": _t("journald.kernel.device_node_path"),
    "_UDEV_SYSNAME": _t("journald.kernel.device_name"),
    "_UID": _i("journald.uid"),
    # docker journald fields
    "CONTAINER_ID_FULL": _t("container.id"),
    "CONTAINER_NAME": _t("container.name"),
    "CONTAINER_PARTIAL_MESSAGE": _t("container.partial"),
    "IMAGE_NAME": _t("container.image.name"),
}

# Dropped outright (default.go:68-75); MESSAGE + the registry/timestamp
# keys are consumed by the reader itself.
_DROPPED = {
    "CONTAINER_ID",
    "CONTAINER_TAG",
    "_SOURCE_MONOTONIC_TIMESTAMP",
    "_SOURCE_REALTIME_TIMESTAMP",
    "__CURSOR",
    "__MONOTONIC_TIMESTAMP",
    "__REALTIME_TIMESTAMP",
    "MESSAGE",
}

# ECS field name -> journal key (matcher.go Build: include_matches given
# in ECS vocabulary are translated back to journal keys).
_ECS_TO_JOURNAL = {
    name: jkey for jkey, (names, _isint) in JOURNALD_FIELDS.items()
    for name in names
}


# ---------------------------------------------------------------------------
# Journal Export Format scanner
# ---------------------------------------------------------------------------

def parse_journal_export(data: bytes, path: str = "",
                         keys=None) -> pa.Table:
    """Parse one exported journal (``journalctl -o export``) into a table
    with one row per entry: ``fields_json`` (the entry's field map as a
    JSON object of strings), ``ts`` (timestamp[us] from
    __REALTIME_TIMESTAMP), ``cursor``, ``monotonic_us``, ``log.file.path``.

    Format (systemd Journal Export Format): entries are separated by an
    empty line; a text field is ``NAME=value\\n``; a binary-safe field is
    ``NAME\\n`` + 8-byte little-endian size + payload + ``\\n`` (the
    encoding journald uses whenever the value contains a newline —
    reference golden: input/journald/testdata/binary.export).  Binary
    payloads are decoded as UTF-8 (errors replaced), matching the
    reference's []byte -> string conversion (input.go:300-345).

    Fast path: a vectorized numpy/Arrow structure scan whose only Python
    loop is over binary-framed fields; inputs it cannot represent
    byte-identically (non-UTF8 text fields, non-ASCII keys, raw control
    chars, duplicate keys within an entry) fall back to the scalar
    scanner, which replays the format definition line by line.

    ``keys`` (optional) is the projection pushdown — the journald
    analogue of ``read_parquet(columns=...)``: only the named field
    keys (plus the cursor/timestamp specials, always kept) survive into
    ``fields_json``, shrinking every downstream stage. An entry whose
    every field is pruned and that carries no special is dropped.
    """
    try:
        return _parse_export_arrow(data, path, keys)
    except _FallbackParse:
        return _parse_export_python(data, path, keys)


class _FallbackParse(Exception):
    """Raised by the vectorized scanner on inputs only the scalar path
    represents exactly (it is the semantics oracle, not an error)."""


_SPECIAL_KEYS = ("__REALTIME_TIMESTAMP", "__MONOTONIC_TIMESTAMP",
                 "__CURSOR")


def _parse_export_python(data: bytes, path: str = "",
                         keys=None) -> pa.Table:
    """Scalar reference scanner — the format definition, line by line.
    ``keys`` (optional) is the projection pushdown: only these field
    names (plus the cursor/timestamp specials, always kept) survive
    into ``fields_json``; an entry whose every field is pruned and that
    carries no special vanishes entirely."""
    wanted = None if keys is None else set(keys) | set(_SPECIAL_KEYS)
    find = data.find
    n = len(data)
    pos = 0
    cur_fields: dict[str, str] = {}
    out_json: list[str] = []
    out_ts: list[int | None] = []
    out_cursor: list[str | None] = []
    out_mono: list[int | None] = []

    def flush():
        if not cur_fields:
            return
        rt = cur_fields.pop("__REALTIME_TIMESTAMP", None)
        mono = cur_fields.pop("__MONOTONIC_TIMESTAMP", None)
        cursor = cur_fields.pop("__CURSOR", None)
        out_ts.append(int(rt) if rt and rt.isdigit() else None)
        out_mono.append(int(mono) if mono and mono.isdigit() else None)
        out_cursor.append(cursor)
        out_json.append(json.dumps(cur_fields, ensure_ascii=False))
        cur_fields.clear()

    while pos < n:
        nl = find(b"\n", pos)
        if nl < 0:
            nl = n  # tolerate a missing final newline
        line = data[pos:nl]
        pos = nl + 1
        if not line:  # blank line = entry boundary
            flush()
            continue
        eq = line.find(b"=")
        if eq >= 0:
            name = line[:eq].decode("ascii", "replace")
            if wanted is None or name in wanted:
                cur_fields[name] = line[eq + 1:].decode("utf-8", "replace")
        else:
            # binary field: NAME\n<le64 size><payload>\n
            name = line.decode("ascii", "replace")
            if pos + 8 > n:
                break  # truncated trailer: drop the partial field
            (size,) = struct.unpack_from("<Q", data, pos)
            pos += 8
            if pos + size > n:
                break
            if wanted is None or name in wanted:
                cur_fields[name] = (
                    data[pos:pos + size].decode("utf-8", "replace"))
            pos += size + 1  # skip the trailing \n
    flush()

    cols = {
        "fields_json": pa.array(out_json, pa.string()),
        "ts": pa.array(out_ts, pa.timestamp("us")),
        "cursor": pa.array(out_cursor, pa.string()),
        "monotonic_us": pa.array(out_mono, pa.int64()),
    }
    if path:
        cols["log.file.path"] = pa.array([path] * len(out_json), pa.string())
    return pa.table(cols)


def _parse_export_arrow(data: bytes, path: str = "",
                        keys=None) -> pa.Table:
    """Vectorized export scanner: one numpy pass finds the line/entry
    structure, Arrow C++ kernels split KEY=value and assemble the JSON
    field maps (byte-identical to ``json.dumps(..., ensure_ascii=False)``
    for the inputs it accepts). The only Python loop runs over
    binary-framed fields — the payload length prefix makes those
    inherently sequential; everything between them is array work.
    Raises :class:`_FallbackParse` on inputs whose exact semantics need
    the scalar path (non-UTF8, non-printable-ASCII keys, raw control
    chars in values, duplicate keys within one entry)."""
    import numpy as np

    wanted = None if keys is None else set(keys) | set(_SPECIAL_KEYS)
    del keys  # the name is reused for the Arrow key array below

    n = len(data)
    if n == 0:
        raise _FallbackParse  # scalar path emits the canonical empty table

    buf = np.frombuffer(data, np.uint8)
    nl = np.flatnonzero(buf == 0x0A).astype(np.int64)
    starts = np.concatenate([np.zeros(1, np.int64), nl + 1])
    ends = np.concatenate([nl, np.array([n], np.int64)])
    if starts[-1] >= n:  # file ends with \n: no trailing partial line
        starts, ends = starts[:-1], ends[:-1]
    nlines = len(starts)

    eqs = np.flatnonzero(buf == 0x3D).astype(np.int64)
    if len(eqs):
        k = np.searchsorted(eqs, starts)
        first_eq = np.where(k < len(eqs), eqs[np.minimum(k, len(eqs) - 1)], n)
    else:
        first_eq = np.full(nlines, n, np.int64)
    has_eq = first_eq < ends
    blank = starts == ends

    # --- sequential walk over binary-framed fields ONLY ---------------
    # a candidate is a non-blank line without '='; after consuming a
    # payload the walk JUMPS past it with a searchsorted (payload bytes
    # split into many bogus candidate lines), so the loop length is the
    # number of real binary fields, not lines
    bin_pos: list[int] = []
    bin_fields: list[tuple[str, str]] = []
    region_end: list[int] = []
    truncated_at = n + 1
    cand = np.flatnonzero(~has_eq & ~blank)
    cand_starts = starts[cand].tolist()  # bisect beats np.searchsorted
    cand_ends = ends[cand].tolist()      # for single lookups in a loop
    ci = 0
    while ci < len(cand_starts):
        s, e = cand_starts[ci], cand_ends[ci]
        p = e + 1  # first byte after the name line's newline
        if p + 8 > n:
            truncated_at = s  # cut mid-size-header: drop the field,
            break             # keep the entry's completed fields
        size = int.from_bytes(data[p:p + 8], "little")
        if p + 8 + size > n:
            truncated_at = s  # cut mid-payload: same contract
            break
        bin_pos.append(s)
        bin_fields.append((
            data[s:e].decode("ascii", "replace"),
            data[p + 8:p + 8 + size].decode("utf-8", "replace"),
        ))
        resume = p + 8 + size + 1  # past the payload's trailing \n
        region_end.append(resume)
        ci = bisect.bisect_left(cand_starts, resume)

    keep = starts < truncated_at
    if bin_pos:
        rs = np.array(bin_pos, np.int64)
        re_ = np.array(region_end, np.int64)
        j = np.searchsorted(rs, starts, side="right") - 1
        keep &= ~((j >= 0) & (starts < re_[np.maximum(j, 0)]))
    vstarts = starts[keep]
    vblank = blank[keep]
    if np.any(~vblank & ~has_eq[keep]):
        raise _FallbackParse  # structure the walk didn't account for
    # entry index of each valid line = blank separators before it
    ent_line = np.cumsum(vblank) - vblank

    # --- Arrow side: split lines / keys / values in C++ ---------------
    lines = pc.list_flatten(
        pc.split_pattern(pa.array([data], pa.large_binary()), pattern="\n")
    )  # piece count == len(nl)+1, aligned with the pre-trim line grid
    mask_full = np.zeros(len(lines), bool)
    mask_full[:nlines] = keep & ~blank
    try:
        kv_lines = pc.cast(lines.filter(pa.array(mask_full)),
                           pa.large_string())
    except pa.ArrowInvalid:
        raise _FallbackParse  # non-UTF8 text field: scalar 'replace' path
    parts = pc.split_pattern(kv_lines, pattern="=", max_splits=1)
    keys = pc.list_element(parts, 0)
    vals = pc.list_element(parts, 1)

    # byte-class checks on the raw buffer: find the few bytes that could
    # matter (controls, quote, backslash), classify each by key/value
    # span membership with a searchsorted — O(occurrences), and it also
    # decides which escape passes are needed at all
    if len(keys) and not pc.all(pc.string_is_ascii(keys)).as_py():
        raise _FallbackParse  # scalar path's ascii-replace key decode
    kv_mask = keep & ~blank
    kstarts, keq = starts[kv_mask], first_eq[kv_mask]
    kends = ends[kv_mask]
    ent_kv = ent_line[~vblank]
    pos_kv = vstarts[~vblank]
    if wanted is not None:
        # projection pushdown: drop pruned kv lines before any further
        # work — byte checks, escapes, joins all shrink with them
        m_want = pc.is_in(
            keys,
            value_set=pa.array(sorted(wanted), pa.large_string()),
        )
        w_np = m_want.to_numpy(zero_copy_only=False).astype(bool)
        keys = keys.filter(m_want)
        vals = vals.filter(m_want)
        kstarts, keq, kends = kstarts[w_np], keq[w_np], kends[w_np]
        ent_kv, pos_kv = ent_kv[w_np], pos_kv[w_np]
    m = buf < 0x20
    m &= buf != 0x0A
    m |= buf == 0x22
    m |= buf == 0x5C
    q = np.flatnonzero(m)
    keys_dirty = False
    esc_pats: list[tuple[str, str]] = []
    if len(q) and len(kstarts):
        j = np.maximum(np.searchsorted(kstarts, q, side="right") - 1, 0)
        qb = buf[q]
        in_key = (q >= kstarts[j]) & (q < keq[j])
        in_val = (q > keq[j]) & (q < kends[j])
        if np.any(in_key & (qb < 0x20)):
            raise _FallbackParse  # json.dumps escapes controls in keys
        keys_dirty = bool(np.any(in_key))  # survivors are " or \
        vb = qb[in_val]
        if np.any((vb < 0x20) & (vb != 0x0D) & (vb != 0x09)):
            raise _FallbackParse  # json.dumps would \u-escape these
        if np.any((vb == 0x22) | (vb == 0x5C)):
            esc_pats += [("\\", "\\\\"), ('"', '\\"')]
        if np.any(vb < 0x20):
            esc_pats += [("\r", "\\r"), ("\t", "\\t")]

    # --- specials (__CURSOR / timestamps) ride out of band ------------
    _SPECIAL = _SPECIAL_KEYS
    # a binary-framed special key is structurally possible but never
    # happens (their values cannot contain newlines); the scalar path
    # owns that corner so the vectorized merge stays simple
    if any(name in _SPECIAL for name, _ in bin_fields):
        raise _FallbackParse
    if wanted is not None:
        # projection pushdown: regions were already consumed above, so
        # pruning a binary field is just not emitting it
        prune = [i for i, (nm, _) in enumerate(bin_fields)
                 if nm not in wanted]
        for i in reversed(prune):
            del bin_fields[i], bin_pos[i]
    m_rt = pc.equal(keys, "__REALTIME_TIMESTAMP")
    m_mono = pc.equal(keys, "__MONOTONIC_TIMESTAMP")
    m_cur = pc.equal(keys, "__CURSOR")
    m_special = pc.or_(pc.or_(m_rt, m_mono), m_cur)
    special_np = m_special.to_numpy(zero_copy_only=False).astype(bool)

    ent_bin = (np.searchsorted(vstarts[vblank], np.array(bin_pos, np.int64))
               if bin_pos else np.zeros(0, np.int64))

    # --- normal fields -> JSON, byte-identical to json.dumps ----------
    # kv lines cannot contain \n (they are newline-split pieces), so the
    # escape set is \ " \r \t — and only the passes the byte scan above
    # proved necessary actually run
    def esc(a):
        for pat, rep in (("\\", "\\\\"), ('"', '\\"'),
                         ("\r", "\\r"), ("\t", "\\t")):
            a = pc.replace_substring(a, pattern=pat, replacement=rep)
        return a

    m_norm = pc.invert(m_special)
    keys_n = keys.filter(m_norm)
    keys_n_esc = esc(keys_n) if keys_dirty else keys_n
    vals_n = vals.filter(m_norm)
    for pat, rep in esc_pats:
        vals_n = pc.replace_substring(vals_n, pattern=pat, replacement=rep)
    lq = pa.scalar('"', pa.large_string())
    kv_str = pc.binary_join_element_wise(
        lq, keys_n_esc, pa.scalar('": "', pa.large_string()), vals_n, lq,
        pa.scalar("", pa.large_string()),
    )
    ent_n = ent_kv[~special_np]
    pos_n = pos_kv[~special_np]

    # duplicate keys within an entry: the scalar dict keeps the last
    # value; JSON with duplicates is ambiguous downstream -> fallback.
    # One int64 sort over entry*(D+1)+code replaces a lexsort.
    codes = np.zeros(0, np.int64)
    key_code: dict[str, int] = {}
    if len(keys_n):
        enc = pc.dictionary_encode(keys_n)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = len(enc.dictionary)
        combined = np.sort(ent_n * (d + 1) + codes)
        if np.any(combined[1:] == combined[:-1]):
            raise _FallbackParse
        key_code = {k: i for i, k in enumerate(enc.dictionary.to_pylist())}

    bin_norm = [
        (bin_pos[i], int(ent_bin[i]), name, val)
        for i, (name, val) in enumerate(bin_fields)
    ]
    if bin_norm:
        if any(ch < " " or ord(ch) > 0x7e for _, _, nm, _ in bin_norm
               for ch in nm):
            raise _FallbackParse
        seen_bin = set()
        d1 = len(key_code) + 1
        for _, e, nm, _ in bin_norm:
            if (e, nm) in seen_bin:
                raise _FallbackParse  # dup within the binary framing
            seen_bin.add((e, nm))
            code = key_code.get(nm)
            if code is not None and len(codes):
                at = np.searchsorted(combined, e * d1 + code)
                if at < len(combined) and combined[at] == e * d1 + code:
                    raise _FallbackParse  # dup across framings
        bin_json = pa.array(
            [f"{json.dumps(nm, ensure_ascii=False)}: "
             f"{json.dumps(v, ensure_ascii=False)}"
             for _, _, nm, v in bin_norm],
            pa.large_string(),
        )

    # --- assemble rows -------------------------------------------------
    # an entry exists iff it carried at least one field (incl. specials)
    present = np.unique(np.concatenate([ent_kv, ent_bin]))
    nrows = len(present)

    if bin_norm:
        # merge two position-sorted runs (kv fields, binary fields)
        # directly into take indices — no argsort over the full volume
        bpos = np.array([p for p, _, _, _ in bin_norm], np.int64)
        bent = np.array([e for _, e, _, _ in bin_norm], np.int64)
        total = len(pos_n) + len(bpos)
        take_idx = np.empty(total, np.int64)
        take_idx[np.arange(len(pos_n))
                 + np.searchsorted(bpos, pos_n, side="left")] = (
            np.arange(len(pos_n)))
        take_idx[np.arange(len(bpos))
                 + np.searchsorted(pos_n, bpos, side="right")] = (
            len(pos_n) + np.arange(len(bpos)))
        ent_sorted = np.concatenate([ent_n, bent])[take_idx]
        kv_sorted = pa.concat_arrays([kv_str, bin_json]).take(
            pa.array(take_idx))
    else:
        ent_sorted = ent_n
        kv_sorted = kv_str

    rows_sorted = np.searchsorted(present, ent_sorted)
    counts = np.bincount(rows_sorted, minlength=nrows)
    offsets = np.concatenate(
        [np.zeros(1, np.int64), np.cumsum(counts, dtype=np.int64)])
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                      kv_sorted),
        pa.scalar(", ", pa.large_string()),
    )
    fields_json = pc.cast(
        pc.binary_join_element_wise(
            pa.scalar("{", pa.large_string()), joined,
            pa.scalar("}", pa.large_string()),
            pa.scalar("", pa.large_string()),
        ),
        pa.string(),
    )

    def fill_int(mask):
        """Integer special (timestamps): ``int(v) if v.isdigit()`` in
        Arrow — digits-regex + cast; rows where the regex and isdigit
        could disagree (non-ASCII digits) fall back."""
        mnp = mask.to_numpy(zero_copy_only=False).astype(bool)
        sel = vals.filter(mask)
        ok = pc.match_substring_regex(sel, r"^[0-9]+$")
        bad = pc.filter(sel, pc.invert(ok))
        if len(bad) and any(v.isdigit() for v in bad.to_pylist()):
            raise _FallbackParse  # unicode digits: scalar semantics
        try:
            ints = pc.cast(
                pc.if_else(ok, sel, pa.scalar(None, pa.large_string())),
                pa.int64(),
            )
        except pa.ArrowInvalid:
            raise _FallbackParse  # out-of-int64 digits
        out = np.zeros(nrows, np.int64)
        okr = np.zeros(nrows, bool)
        rows = np.searchsorted(present, ent_kv[mnp])
        # plain assignment: later occurrences overwrite (dict semantics)
        out[rows] = pc.fill_null(ints, 0).to_numpy(zero_copy_only=False)
        okr[rows] = pc.is_valid(ints).to_numpy(zero_copy_only=False)
        return pa.array(out, pa.int64(), mask=~okr)

    ts_i = fill_int(m_rt)
    mono_i = fill_int(m_mono)
    m_cur_np = m_cur.to_numpy(zero_copy_only=False).astype(bool)
    cur = np.full(nrows, None, object)
    cur[np.searchsorted(present, ent_kv[m_cur_np])] = (
        vals.filter(m_cur).to_pylist())
    cols = {
        "fields_json": fields_json,
        "ts": pc.cast(ts_i, pa.timestamp("us")),
        "cursor": pa.array(cur, pa.string()),
        "monotonic_us": mono_i,
    }
    if path:
        cols["log.file.path"] = pa.array([path] * nrows, pa.string())
    return pa.table(cols)


def read_journal_export(paths: list[str] | str, include_path: bool = True,
                        keys: list[str] | None = None):
    """Read exported journal files as a Dataset of journal entries —
    file-parallel (one scanner task per file, the harvester model;
    input.go:186 runs one journalctl per journal path). ``keys`` is the
    projection pushdown (see :func:`parse_journal_export`): pass the
    journal field names a downstream conversion actually consumes —
    including any keys its journalctl-style filters match on — and
    everything else is dropped at the scan."""
    import ray.data

    if isinstance(paths, str):
        paths = [paths]

    def parse(batch: dict) -> pa.Table:
        tables = [
            parse_journal_export(
                bytes(data), path if include_path else "", keys=keys
            )
            for data, path in zip(batch["bytes"], batch["path"])
        ]
        if not tables:  # schema-stable empty table ("-" names no rows)
            return parse_journal_export(b"", "-" if include_path else "")
        return pa.concat_tables(tables)

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse, batch_format="numpy")


# ---------------------------------------------------------------------------
# include_matches / units / identifiers / ... filters
# (journalctl arg semantics: same-field matches OR, different fields AND,
#  '+' separates disjunction groups — man systemd.journal-fields; the
#  reference forwards these as journalctl args, journalctl/journalctl.go)
# ---------------------------------------------------------------------------

def _build_match_groups(include_matches):
    """'FIELD=value' strings (ECS names auto-translated to journal keys,
    matcher.go:56-79) -> list of OR-groups, each {journal_key: {values}}."""
    groups: list[dict[str, set]] = [{}]
    for m in include_matches or ():
        if m == "+":
            groups.append({})
            continue
        key, sep, val = m.partition("=")
        if not sep or not key:
            raise ValueError(
                f"'{m}' is invalid, expression must be '+' or 'field=value'"
            )
        key = _ECS_TO_JOURNAL.get(key, key)
        groups[-1].setdefault(key, set()).add(val)
    return [g for g in groups if g]


def _entry_mask(fields: pa.Table, groups, units, identifiers, transports,
                facilities) -> pa.Array | None:
    """Vectorized journalctl-style filter over the re-hydrated field
    columns.  Returns None when unfiltered."""
    n = fields.num_rows

    def col(jkey: str) -> pa.ChunkedArray:
        if jkey in fields.column_names:
            return fields[jkey]
        return pa.chunked_array([pa.nulls(n, pa.string())])

    def is_in(jkey: str, values) -> pa.ChunkedArray:
        return pc.fill_null(
            pc.is_in(col(jkey), value_set=pa.array(sorted(values), pa.string())),
            False,
        )

    mask = None

    def and_(m, extra):
        return extra if m is None else pc.and_(m, extra)

    if units:
        mask = and_(mask, is_in("_SYSTEMD_UNIT", units))
    if identifiers:
        mask = and_(mask, is_in("SYSLOG_IDENTIFIER", identifiers))
    if transports:
        mask = and_(mask, is_in("_TRANSPORT", transports))
    if facilities:
        mask = and_(mask, is_in("SYSLOG_FACILITY", {str(int(f)) for f in facilities}))
    if groups:
        any_group = None
        for g in groups:
            gm = None
            for jkey, values in g.items():
                gm = and_(gm, is_in(jkey, values))
            any_group = gm if any_group is None else pc.or_(any_group, gm)
        mask = and_(mask, any_group)
    return mask


# ---------------------------------------------------------------------------
# Vectorized per-unique helpers (conv.go:127-171)
# ---------------------------------------------------------------------------

_CMDLINE_ARG = r'"(\\"|[^"])*?"|[^\s]+'

# Canonical Linux capability names, bit order (uapi/linux/capability.h —
# the table capabilities_linux.go renders via cap.Value(i).String()).
_CAP_NAMES = [
    "CAP_CHOWN", "CAP_DAC_OVERRIDE", "CAP_DAC_READ_SEARCH", "CAP_FOWNER",
    "CAP_FSETID", "CAP_KILL", "CAP_SETGID", "CAP_SETUID", "CAP_SETPCAP",
    "CAP_LINUX_IMMUTABLE", "CAP_NET_BIND_SERVICE", "CAP_NET_BROADCAST",
    "CAP_NET_ADMIN", "CAP_NET_RAW", "CAP_IPC_LOCK", "CAP_IPC_OWNER",
    "CAP_SYS_MODULE", "CAP_SYS_RAWIO", "CAP_SYS_CHROOT", "CAP_SYS_PTRACE",
    "CAP_SYS_PACCT", "CAP_SYS_ADMIN", "CAP_SYS_BOOT", "CAP_SYS_NICE",
    "CAP_SYS_RESOURCE", "CAP_SYS_TIME", "CAP_SYS_TTY_CONFIG", "CAP_MKNOD",
    "CAP_LEASE", "CAP_AUDIT_WRITE", "CAP_AUDIT_CONTROL", "CAP_SETFCAP",
    "CAP_MAC_OVERRIDE", "CAP_MAC_ADMIN", "CAP_SYSLOG", "CAP_WAKE_ALARM",
    "CAP_BLOCK_SUSPEND", "CAP_AUDIT_READ", "CAP_PERFMON", "CAP_BPF",
    "CAP_CHECKPOINT_RESTORE",
]


def _expand_caps_unique(hexstr: str | None):
    """capabilities.FromString equivalent (capabilities_linux.go:88-115):
    hex mask -> ECS cap-name list; unknown-but-valid bits -> CAP_<n>;
    zero/unparsable/empty -> None (the reference skips the Put)."""
    if not hexstr:
        return None
    try:
        w = int(hexstr, 16)
    except ValueError:
        return None
    if w <= 0 or w >= (1 << 64):
        return None
    out = []
    i = 0
    while w:
        if w & 1:
            out.append(_CAP_NAMES[i] if i < len(_CAP_NAMES) else f"CAP_{i}")
        w >>= 1
        i += 1
    return out


def _split_args_unique(cmdline: str | None):
    import re

    if not cmdline:
        return None
    args = re.findall(r'"(?:\\"|[^"])*?"|[^\s]+', cmdline)
    return args or None


def _per_unique(arr: pa.ChunkedArray, fn, out_type) -> pa.Array:
    """Apply a Python fn over the *unique* values of a column and gather
    back — the cost is O(distinct), not O(rows) (cmdlines and capability
    masks repeat massively in real journals)."""
    flat = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if flat.null_count == len(flat):
        return pa.nulls(len(flat), out_type)
    darr = pc.dictionary_encode(flat)
    if isinstance(darr, pa.ChunkedArray):
        darr = darr.combine_chunks()
    dictionary = darr.dictionary.to_pylist()
    mapped = pa.array([fn(v) for v in dictionary], out_type)
    idx = darr.indices
    if idx.null_count == 0:
        return mapped.take(idx)
    return pc.if_else(pc.is_valid(idx), mapped.take(pc.fill_null(idx, 0)),
                      pa.nulls(len(darr), out_type))


# ---------------------------------------------------------------------------
# The converter stage
# ---------------------------------------------------------------------------

def journald_conv(ds, *, include_matches=None, units=None, identifiers=None,
                  transports=None, facilities=None,
                  save_remote_hostname: bool = False,
                  custom_columns: list[str] | None = None,
                  custom_json: bool = True):
    """Journal fields -> ECS event columns, as one vectorized map_batches
    stage (journalfield conv.go Convert + withECSEnrichment, input.go
    readerAdapter.Next).

    Output schema is FIXED (every mapped ECS name emitted, absent fields
    null) so blocks union cleanly.  Unmapped fields land in
    ``journald.custom`` as a JSON object keyed by the lowered,
    underscore-trimmed name (conv.go:44-47); pass ``custom_columns`` to
    additionally surface chosen custom keys as real typed columns.

    Filters mirror the journalctl args the reference forwards
    (units/identifiers/transports/facilities + include_matches with the
    '+' disjunction syntax; ECS field names in matches are translated
    back to journal keys exactly like matcher.go Build).
    """
    groups = _build_match_groups(include_matches)
    custom_columns = list(custom_columns or ())

    known = set(JOURNALD_FIELDS) | _DROPPED

    def conv(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # Re-hydrate the field maps with the C++ JSON reader: one column
        # per key present in this batch, all string-typed (the export
        # scanner serialized every value as a JSON string).
        if n:
            blob = ("\n".join(t["fields_json"].to_pylist())).encode()
            fields = pajson.read_json(io.BytesIO(blob))
        else:
            fields = t.select([])

        mask = _entry_mask(fields, groups, units, identifiers, transports,
                           facilities) if n else None
        if mask is not None:
            fields = fields.filter(mask)
            t = t.filter(mask)
            n = t.num_rows

        def raw(jkey: str) -> pa.ChunkedArray:
            if jkey in fields.column_names:
                return fields[jkey]
            return pa.chunked_array([pa.nulls(n, pa.string())])

        out: dict[str, object] = {}
        # --- table-driven rename + integer conversion ---
        for jkey, (names, isint) in JOURNALD_FIELDS.items():
            if jkey not in fields.column_names:
                # absent key (possibly projection-pruned at the scan):
                # emit typed nulls without a pandas round-trip
                arr = pa.nulls(n, pa.int64() if isint else pa.string())
                for name in names:
                    out[name] = arr
                continue
            col = raw(jkey)
            if isint:
                # strconv.ParseInt with the ',username' fallback
                # (conv.go:69-88): the whole value must parse as an
                # integer, else the part before the first ','.
                # Unparsable -> null (the reference keeps the raw
                # string; a typed column can't, so the raw value stays
                # findable in fields_json).
                s = pd.Series(col.to_pandas(), dtype="string")
                first = s.str.split(",", n=1).str[0]
                ok = first.str.match(r"^[+-]?\d+$", na=False)
                vals = pd.to_numeric(first.where(ok), errors="coerce")
                arr = pa.Array.from_pandas(
                    vals.astype("Int64"), type=pa.int64()
                )
            else:
                arr = col.combine_chunks()
            for name in names:
                out[name] = arr

        # --- custom fields (unknown keys -> journald.custom) ---
        custom_keys = [c for c in fields.column_names if c not in known]
        if custom_json:
            if custom_keys:
                sub = fields.select(custom_keys).rename_columns(
                    [k.lstrip("_").lower() for k in custom_keys]
                )
                pdf = sub.to_pandas()
                out["journald.custom"] = pa.array(
                    [
                        json.dumps(
                            {k: v for k, v in row.items() if v is not None},
                            ensure_ascii=False, sort_keys=True,
                        )
                        for row in pdf.to_dict("records")
                    ],
                    pa.string(),
                )
            else:
                out["journald.custom"] = pa.nulls(n, pa.string())
        for want in custom_columns:
            src = next(
                (k for k in custom_keys if k.lstrip("_").lower() == want), None
            )
            out[f"journald.custom.{want}"] = (
                fields[src].combine_chunks() if src else pa.nulls(n, pa.string())
            )

        # --- MESSAGE -> message (binary decode already done upstream) ---
        out["message"] = raw("MESSAGE").combine_chunks()

        # --- ECS enrichment (conv.go:92-125) ---
        for prefix in ("journald", "journald.object"):
            _set_gid_uid(out, prefix, n)
        for prefix in ("journald", "journald.object"):
            _set_process(out, prefix, n)

        caps = out.get("journald.process.capabilities")
        if caps is not None:
            out["process.thread.capabilities.effective"] = _per_unique(
                pa.chunked_array([caps]), _expand_caps_unique,
                pa.list_(pa.string()),
            )

        # --- container.partial -> tags (input.go:357-369) ---
        partial = pc.fill_null(
            pc.is_in(pc.utf8_lower(pc.cast(out.pop("container.partial"),
                                           pa.string())),
                     value_set=pa.array(["true", "1", "t"])),
            False,
        )
        out["tags"] = pc.if_else(
            partial,
            pa.array([["partial_message"]] * n, pa.list_(pa.string())),
            pa.nulls(n, pa.list_(pa.string())),
        )

        if save_remote_hostname:
            out["log.source.address"] = out["host.hostname"]

        out["event.kind"] = pa.array(["event"] * n, pa.string())

        # --- reader-carried columns (@timestamp = RealtimeTimestamp) ---
        for keep in ("ts", "cursor", "monotonic_us", "log.file.path"):
            if keep in t.column_names:
                out[keep] = t[keep].combine_chunks()

        return pa.table(out)

    return ds.map_batches(conv, batch_format="pyarrow")


def _as_str(arr) -> pa.Array:
    return pc.cast(arr, pa.string())


def _set_gid_uid(out: dict, prefix: str, n: int) -> None:
    """setGidUidFields (conv.go:104-125), vectorized.  Applied for
    'journald' then 'journald.object' — the object pass overwrites where
    its fields are present (withECSEnrichment ordering)."""
    audit = out.get(f"{prefix}.audit.login_uid")
    uid = out.get(f"{prefix}.uid")
    gid = out.get(f"{prefix}.gid")
    audit = pa.nulls(n, pa.int64()) if audit is None else audit
    uid = pa.nulls(n, pa.int64()) if uid is None else uid
    gid = pa.nulls(n, pa.int64()) if gid is None else gid

    has_audit = pc.is_valid(audit)
    has_uid = pc.is_valid(uid)
    audit_s = _as_str(pc.fill_null(audit, 0))
    # getIntegerFromFields returns 0 for missing -> fmt.Sprint gives "0"
    uid_s = _as_str(pc.fill_null(uid, 0))
    gid_s = _as_str(pc.fill_null(gid, 0))

    prev_user = out.get("user.id", pa.nulls(n, pa.string()))
    prev_group = out.get("user.group.id", pa.nulls(n, pa.string()))
    prev_euser = out.get("user.effective.id", pa.nulls(n, pa.string()))
    prev_egroup = out.get("user.effective.group.id", pa.nulls(n, pa.string()))

    # audit login uid present -> user.id = audit
    user_id = pc.if_else(has_audit, audit_s, prev_user)
    # uid present:
    #   audit present and != uid -> effective.id/group.id = uid/gid
    #   else                     -> user.id/group.id = uid/gid
    differs = pc.and_(has_audit, pc.fill_null(
        pc.not_equal(audit_s, uid_s), False))
    eff_branch = pc.and_(has_uid, differs)
    std_branch = pc.and_(has_uid, pc.invert(differs))
    user_id = pc.if_else(std_branch, uid_s, user_id)
    group_id = pc.if_else(std_branch, gid_s, prev_group)
    euser = pc.if_else(eff_branch, uid_s, prev_euser)
    egroup = pc.if_else(eff_branch, gid_s, prev_egroup)

    out["user.id"] = user_id
    out["user.group.id"] = group_id
    out["user.effective.id"] = euser
    out["user.effective.group.id"] = egroup


def _set_process(out: dict, prefix: str, n: int) -> None:
    """setProcessFields (conv.go:129-157), vectorized; the object pass
    overwrites where present."""
    pid = out.get(f"{prefix}.pid")
    name_key = ("journald.process.name" if prefix == "journald"
                else "journald.object.process.name")
    exe_key = ("journald.process.executable" if prefix == "journald"
               else "journald.object.process.executable")
    cmd_key = f"{prefix}.process.command_line"
    name = out.get(name_key, pa.nulls(n, pa.string()))
    exe = out.get(exe_key, pa.nulls(n, pa.string()))
    cmd = out.get(cmd_key, pa.nulls(n, pa.string()))
    pid = pa.nulls(n, pa.int64()) if pid is None else pid

    def overlay(dst: str, src, valid):
        prev = out.get(dst)
        if prev is None:
            prev_type = src.type if hasattr(src, "type") else pa.string()
            prev = pa.nulls(n, prev_type)
        out[dst] = pc.if_else(valid, src, prev)

    overlay("process.pid", pid, pc.is_valid(pid))
    nonempty = pc.and_(pc.is_valid(name), pc.fill_null(
        pc.not_equal(name, ""), False))
    overlay("process.name", name, nonempty)
    nonempty_exe = pc.and_(pc.is_valid(exe), pc.fill_null(
        pc.not_equal(exe, ""), False))
    overlay("process.executable", exe, nonempty_exe)
    has_cmd = pc.and_(pc.is_valid(cmd), pc.fill_null(
        pc.not_equal(cmd, ""), False))
    overlay("process.command_line", cmd, has_cmd)
    if isinstance(cmd, pa.ChunkedArray):
        cmd = cmd.combine_chunks()
    args = _per_unique(pa.chunked_array([cmd]), _split_args_unique,
                       pa.list_(pa.string()))
    overlay("process.args", args, pc.is_valid(args))
    counts = pc.list_value_length(args)
    overlay("process.args_count", pc.cast(counts, pa.int64()),
            pc.is_valid(counts))


# ---------------------------------------------------------------------------
# Deterministic fixture: the transcript corpus as exported journals
# ---------------------------------------------------------------------------

def write_journal_export_fixture(sf: float,
                                 root: str = "/tmp/beats_ray_fixtures") -> str:
    """Materialize the transcript corpus as ``journalctl -o export`` files
    (one per hash partition — each exported journal plays the role of one
    journal path, input.go:108-117).  Deterministic & cached; the mapping
    below is replayed 1:1 by the journald oracle SQL:

    - MESSAGE        = text          (binary framing iff text contains \\n,
                                      the condition journald itself uses)
    - PRIORITY       = role: user 6, assistant 5, tool 4, system 3
    - SYSLOG_FACILITY= 16 if role='tool' else 1
    - SYSLOG_IDENTIFIER = tool;  _SYSTEMD_UNIT = tool || '.service'
    - _TRANSPORT     = 'stdout' if role='tool' else 'journal'
    - _HOSTNAME      = 'host-' || (turn_idx % 4);  _PID = 1000 + turn_idx
    - CONV_ID / TURN_IDX = conv_id / turn_idx      (custom-field path)
    - __REALTIME_TIMESTAMP = epoch microseconds of ts
    """
    import pyarrow.parquet as pq

    from ..fixtures import ensure_transcripts

    src_dir = ensure_transcripts(sf, root)
    out = __import__("pathlib").Path(root) / f"sf{sf:g}" / "journal_export"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    tmp = out.with_name(out.name + f".tmp-{__import__('os').getpid()}")
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True, exist_ok=True)

    prio = {"user": 6, "assistant": 5, "tool": 4, "system": 3}
    files = sorted(__import__("glob").glob(src_dir + "/part-*.parquet"))
    for f in files:
        tbl = pq.read_table(
            f, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        stem = __import__("pathlib").Path(f).stem
        # epoch µs via Arrow (timezone-naive ts = UTC; .timestamp() on a
        # naive datetime would apply the host TZ)
        epoch_us = pc.cast(tbl["ts"], pa.int64()).to_pylist()
        buf = bytearray()
        for i, r in enumerate(tbl.to_pylist()):
            role, tool, text = r["role"], r["tool"], r["text"] or ""
            ts_us = epoch_us[i]
            buf += f"__CURSOR=s=beatsray;p={stem};i={i}\n".encode()
            buf += f"__REALTIME_TIMESTAMP={ts_us}\n".encode()
            buf += f"__MONOTONIC_TIMESTAMP={r['turn_idx'] * 1_000_000}\n".encode()
            buf += f"PRIORITY={prio[role]}\n".encode()
            buf += f"SYSLOG_FACILITY={16 if role == 'tool' else 1}\n".encode()
            buf += f"SYSLOG_IDENTIFIER={tool}\n".encode()
            buf += f"_SYSTEMD_UNIT={tool}.service\n".encode()
            buf += f"_TRANSPORT={'stdout' if role == 'tool' else 'journal'}\n".encode()
            buf += f"_HOSTNAME=host-{r['turn_idx'] % 4}\n".encode()
            buf += f"_PID={1000 + r['turn_idx']}\n".encode()
            buf += f"CONV_ID={r['conv_id']}\n".encode()
            buf += f"TURN_IDX={r['turn_idx']}\n".encode()
            raw = text.encode("utf-8")
            if b"\n" in raw:
                buf += b"MESSAGE\n" + struct.pack("<Q", len(raw)) + raw + b"\n"
            else:
                buf += b"MESSAGE=" + raw + b"\n"
            buf += b"\n"
        (tmp / f"{stem}.export").write_bytes(bytes(buf))
    (tmp / "_DONE").write_text("ok")
    import os
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent writer won
    return str(out)
