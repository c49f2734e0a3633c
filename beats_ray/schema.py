"""Arrow schemas for the transcript engine.

The event model of the reference is a schemaless nested document
(``beat.Event``, libbeat/beat/event.go:52-62) addressed by dot-paths.
Here the namespace is flat: every field is a top-level Arrow column and
dot-paths are simply column names containing dots (``parsed.event``,
``error.message``, ``log.flags``).  That keeps every operator a pure
columnar kernel while preserving Beats' addressing semantics
(GetValue/PutValue on "a.b.c", event.go:84-104).
"""

from __future__ import annotations

import pyarrow as pa

# Input schema — authoritative shape from BASELINE.json input_hint.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Derived columns the flagship parse stage adds. Mirrors Beats' in-band
# error/flag recording (SetErrorWithOption → error.*, event.go:303-316;
# log.flags, event.go:38). Flags are a comma-joined string (deterministic
# order) rather than list<string> so every downstream engine (pandas,
# DuckDB value-hash) sees the same scalar value.
PARSED_COLUMNS: dict[str, pa.DataType] = {
    "parsed.kind": pa.string(),  # dissect | ndjson | syslog | multiline | none
    "parsed.level": pa.string(),
    "parsed.ts": pa.string(),
    "parsed.tool": pa.string(),
    "parsed.status": pa.string(),
    "parsed.msg": pa.string(),
    "parsed.event": pa.string(),
    "parsed.duration_ms": pa.int64(),
    "parsed.pri": pa.int64(),
    "parsed.facility": pa.int64(),
    "parsed.severity": pa.int64(),
    "parsed.host": pa.string(),
    "parsed.app": pa.string(),
    "parsed.pid": pa.int64(),
    "parsed.n_lines": pa.int64(),
    "error.message": pa.string(),
    "log.flags": pa.string(),
}

# Routing / sink metadata columns (Beats @metadata analogue, event.go:40-46).
META_COLUMNS: dict[str, pa.DataType] = {
    "sink": pa.string(),
    "part_id": pa.int32(),
}


def empty_strings(n: int) -> pa.Array:
    return pa.nulls(n, pa.string())
