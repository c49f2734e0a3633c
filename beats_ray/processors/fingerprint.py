"""Fingerprint / add_id / timeseries-hash processors
(libbeat/processors/fingerprint/, add_id/, timeseries/).

The fingerprint is also the engine's exact-dedup / doc-id key (the
reference routes it to ES ``_id`` for duplicate-create detection,
elasticsearch/client.go:509-516).
"""

from __future__ import annotations

import base64
import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .base import _named, get_col, register, set_col

_HASHES = {
    "md5": hashlib.md5,
    "sha1": hashlib.sha1,
    "sha256": hashlib.sha256,
    "sha384": hashlib.sha384,
    "sha512": hashlib.sha512,
}


def concat_fields(t: pa.Table, fields: list[str], sep: str = "|") -> pa.Array:
    """Deterministic ordered concatenation of field values
    (fingerprint hashes fields in config order, fingerprint.go:72).

    Each value is encoded as a LENGTH-PREFIXED unit ``<bytelen>:<value>``
    (null → ``-:``, distinct from empty ``0:``) before joining — the
    encoding is prefix-free, so two DIFFERENT field tuples can never
    concatenate to the same string (a raw '|' join let
    ('x|y', 'z') and ('x', 'y|z') collide — and fingerprint/add_id
    outputs are the engine's exact-dedup keys)."""
    if not fields:
        raise ValueError("fingerprint/add_id/timeseries need >= 1 field")
    cols = []
    for f in fields:
        col = get_col(t, f)
        if col is None:
            col = pa.nulls(t.num_rows, pa.string())
        else:
            col = col.combine_chunks()
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
        cols.append(col)
    if len(cols) == 1:
        # a single field has no concatenation ambiguity: hash the raw
        # value (oracle parity: md5(text))
        return pc.fill_null(cols[0], "")
    pieces = [
        pc.binary_join_element_wise(
            pc.fill_null(pc.cast(pc.binary_length(col), pa.string()), "-"),
            pc.fill_null(col, ""),
            ":",
        )
        for col in cols
    ]
    return pc.binary_join_element_wise(*pieces, sep)


def hash_column(arr: pa.Array, method: str = "sha256", encoding: str = "hex") -> pa.Array:
    """Hash a string column row-wise. (Cryptographic hashes have no Arrow
    kernel; the Python loop is per-batch and amortized across workers.)"""
    hasher = _HASHES[method]
    vals = arr.to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        digest = hasher(v.encode("utf-8")).digest()
        if encoding == "hex":
            out.append(digest.hex())
        elif encoding == "base32":
            out.append(base64.b32encode(digest).decode())
        elif encoding == "base64":
            out.append(base64.b64encode(digest).decode())
        else:
            raise ValueError(f"unknown encoding {encoding!r}")
    return pa.array(out, pa.string())


@register("fingerprint")
def fingerprint(cfg: dict):
    """Hash of ordered field values → target (default "fingerprint");
    methods md5/sha1/sha256/sha384/sha512 (fingerprint/hash.go), encodings
    hex/base32/base64 (config.go:23-36)."""
    fields = cfg.get("fields", [])
    if not fields:
        # fail at BUILD time (checks.go behaviour), not inside a worker
        raise ValueError("fingerprint: 'fields' must list >= 1 field")
    method = cfg.get("method", "sha256")
    encoding = cfg.get("encoding", "hex")
    target = cfg.get("target_field", "fingerprint")

    @_named("fingerprint")
    def run(t: pa.Table) -> pa.Table:
        concat = concat_fields(t, fields)
        return set_col(t, target, hash_column(concat, method, encoding))

    return run


@register("add_id")
def add_id(cfg: dict):
    """Unique per-event id (add_id/add_id.go:64). Deterministic variant:
    sha1 of the row's natural key (conv_id, turn_idx) so tests and
    re-runs are reproducible (idempotent at-least-once writes)."""
    target = cfg.get("target_field", "meta.doc_id")
    key_fields = cfg.get("key_fields", ["conv_id", "turn_idx"])

    @_named("add_id")
    def run(t: pa.Table) -> pa.Table:
        concat = concat_fields(t, key_fields)
        return set_col(t, target, hash_column(concat, "sha1", "hex"))

    return run


@register("timeseries")
def timeseries(cfg: dict):
    """timeseries.instance hash from dimension fields
    (timeseries/timeseries.go:68)."""
    fields = cfg.get("fields", [])
    if not fields:
        raise ValueError("timeseries: 'fields' must list >= 1 field")

    @_named("timeseries")
    def run(t: pa.Table) -> pa.Table:
        concat = concat_fields(t, fields, sep="\x00")
        return set_col(t, "timeseries.instance", hash_column(concat, "md5", "hex"))

    return run
